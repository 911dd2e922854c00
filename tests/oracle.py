"""NumPy decision oracle for FrameFusion semantics.

An independent, straight-line NumPy statement of the behavior specified by
/root/reference/framefusion/main.py (patch-major similarity, threshold/top-k
merge gating, run merging into the preceding token, importance pruning, and
the cost schedule). The JAX implementation in framefusion_tpu/core must make
bit-identical *decisions* (which tokens merge into which, which survive the
prune) and numerically-close merged values (the oracle accumulates at fp32,
as does the JAX path).

Tie policy pinned here and implemented by ``core.merge.descending_rank``:
stable descending sort, lower index wins ties.
"""

from __future__ import annotations

import numpy as np

TEXT_TOKEN = -1
IGNORE_TOKEN = -2


def order_by_patch(patch_type: np.ndarray, patch_num: int) -> np.ndarray:
    """Original indices of image tokens in (patch, position) order."""
    out = []
    for p in range(patch_num):
        out.extend(np.nonzero(patch_type == p)[0].tolist())
    return np.asarray(out, dtype=np.int64)


def similarity_by_patch(hidden: np.ndarray, patch_type: np.ndarray, patch_num: int):
    """(sim, order) over image tokens only, patch-major, fp32."""
    order = order_by_patch(patch_type, patch_num)
    h = hidden[order].astype(np.float32)
    sim = np.empty(len(order), dtype=np.float32)
    sim[0] = IGNORE_TOKEN
    for i in range(1, len(order)):
        if patch_type[order[i]] != patch_type[order[i - 1]]:
            sim[i] = -2.0
        else:
            a, b = h[i - 1], h[i]
            sim[i] = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    return sim, order


def topk_indices(scores: np.ndarray, k: int) -> np.ndarray:
    """Top-k indices, stable descending (lower index wins ties), sorted ascending."""
    order_desc = np.argsort(-scores, kind="stable")
    return np.sort(order_desc[:k])


def merge_tokens(hidden: np.ndarray, sim: np.ndarray, order: np.ndarray, marked_positions: np.ndarray):
    """Merge marked patch-major positions into their run heads.

    Returns (merged_hidden, keep_mask_original_order).
    """
    s = hidden.shape[0]
    merged = hidden.astype(np.float32).copy()
    keep = np.ones(s, dtype=bool)
    marked = np.zeros(len(order), dtype=bool)
    marked[marked_positions] = True

    i = 0
    while i < len(order):
        if marked[i]:
            run_start = i
            while i < len(order) and marked[i]:
                i += 1
            run = list(range(run_start, i))
            head = order[run_start - 1]
            acc = merged[head].copy()
            for r in run:
                acc += hidden[order[r]].astype(np.float32)
                keep[order[r]] = False
            merged[head] = acc / (len(run) + 1)
        else:
            i += 1
    return merged, keep


def merge_event(hidden, patch_type, s_th, budget, frame_token_num):
    """One full merge event. Returns dict with decisions and outputs.

    Mirrors the threshold/top-k branch in the reference forward
    (main.py:113-127): measure the above-threshold ratio; if it fits within
    the budget record it as this event's sparsity (and stop merging when it
    drops below ratio_lower_bound — the caller checks that); otherwise cap at
    the top ``int(budget * frame_token_num)`` similarities and finish both
    stages.
    """
    sim, order = similarity_by_patch(hidden, patch_type, int(patch_type.max()) + 1)
    above = np.nonzero(sim >= s_th)[0]
    above_ratio = len(above) / frame_token_num
    if above_ratio < budget:
        marked_positions = above
        capped = False
    else:
        k = int(budget * frame_token_num)
        marked_positions = topk_indices(sim, k)
        capped = True
    merged, keep = merge_tokens(hidden, sim, order, marked_positions)
    return dict(
        sim=sim,
        order=order,
        marked_positions=marked_positions,
        above_ratio=above_ratio,
        capped=capped,
        merged=merged,
        keep=keep,
    )


def prune_keep_indices(importance: np.ndarray, image_start: int, image_len: int, k_keep: int) -> np.ndarray:
    """Surviving original indices after importance pruning (sorted)."""
    window = importance[image_start : image_start + image_len]
    kept_in_window = topk_indices(window, k_keep) + image_start
    pre = np.arange(image_start)
    post = np.arange(image_start + image_len, len(importance))
    return np.sort(np.concatenate([pre, kept_in_window, post]))


def compute_pruning_ratio(sparsity_list, cost, num_layers=28):
    # fp32 arithmetic to match the framework's host/device twins (the TPU has
    # no fp64; see framefusion_tpu/core/schedule.py).
    f = np.float32
    density = f(1.0)
    spent = f(0.0)
    for s_ in sparsity_list:
        density = f(density * (f(1.0) - f(s_)))
        spent = f(spent + density)
    remaining = f(f(num_layers) * f(cost) - spent)
    assert remaining >= 0, "cost too small"
    frac = f(remaining / f(f(num_layers - len(sparsity_list)) * density))
    if frac > 1:
        return 0.0
    return float(f(f(1.0) - frac))
