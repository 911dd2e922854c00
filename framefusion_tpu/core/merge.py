"""Run-length token merging with static shapes.

Parity: ``FrameFusion.merge_tokens_and_get_mask`` and
``find_contigious_latter_index`` (/root/reference/framefusion/main.py:243-319,
351-380), plus the threshold-vs-topk branch of ``FrameFusion.forward``
(main.py:113-127).

Semantics being matched:
  * A patch-major position ``i`` is *marked* when its similarity passes the
    gate. Runs of consecutive marked positions merge into the unmarked token
    immediately before the run (the run head). The head's new value is the
    mean of itself and all run members. Marked tokens are dropped.
  * Threshold gate: marked = (sim >= similarity_lower_bound).
  * Budget gate (when the threshold would over-merge): the top
    ``k = int(budget * frame_token_num)`` positions by similarity.

TPU-native formulation (deliberately scatter-free — XLA lowers row scatters
to serial loops on TPU, which measured ~100x slower than the sort/gather
formulation below at 12k tokens):
  * Both gates reduce to ``rank(sim, descending, stable) < k`` with a *traced*
    scalar ``k`` — for the threshold gate ``k`` is the count of positions
    ``>= threshold`` (rank < count selects exactly the set ``sim >= t``
    because every such element outranks every element below ``t``), and for
    the budget gate ``k`` is the budget itself. One compiled program serves
    both branches, and ties resolve to the lowest patch-major index — the
    same policy the oracle pins down. Ranks are inverse permutations computed
    by double argsort (bitonic sorts vectorize on the VPU).
  * Run extents come from a reversed running minimum over unmarked positions
    (``associative_scan``); per-run member sums are differences of an fp32
    prefix sum, and the write-back to original order is a gather through the
    inverse permutation — no scatter anywhere.
  * Averaging matches the reference's ``index_add_``-then-divide semantics
    (main.py:304-317) at fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inverse_permutation(perm: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a permutation via argsort (scatter-free)."""
    return jnp.argsort(perm).astype(jnp.int32)


def descending_rank(scores: jnp.ndarray) -> jnp.ndarray:
    """Rank of each element under a stable descending sort (0 = largest).

    Ties rank lower indices first, matching the decision policy used by the
    oracle for both merge selection and importance pruning.
    """
    order_desc = jnp.argsort(-scores, stable=True)
    return inverse_permutation(order_desc)


def mark_topk(sim: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask of the ``k`` highest-similarity patch-major positions."""
    return descending_rank(sim) < k


def apply_merge(hidden: jnp.ndarray, marked_pm: jnp.ndarray, order: jnp.ndarray):
    """Average marked tokens into their run heads; return merged states + keep mask.

    Args:
        hidden: (S, D) activations.
        marked_pm: (S,) bool in patch-major positions. Construction guarantees
            position 0 is unmarked (similarity there is IGNORE).
        order: (S,) int32 patch-major permutation.

    Returns:
        merged: (S, D) activations with run heads replaced by run means
            (same dtype as ``hidden``; accumulation in fp32).
        keep: (S,) bool in *original* positions; False for merged-away tokens.
    """
    s, d = hidden.shape
    pos = jnp.arange(s, dtype=jnp.int32)
    inv_order = inverse_permutation(order)

    h_pm = hidden[order].astype(jnp.float32)
    contrib = jnp.where(marked_pm[:, None], h_pm, 0.0)
    csum = jnp.cumsum(contrib, axis=0)  # (S, D) fp32 prefix sums

    # Next unmarked position strictly after each position (reversed running
    # minimum). For an unmarked head p, the marked run it absorbs is
    # (p, next_unmarked(p) - 1].
    unmarked_pos = jnp.where(marked_pm, jnp.int32(s), pos)
    nu_at_or_after = jax.lax.associative_scan(jnp.minimum, unmarked_pos[::-1])[::-1]
    nu_after = jnp.concatenate([nu_at_or_after[1:], jnp.full((1,), s, jnp.int32)])
    run_end = jnp.clip(nu_after - 1, 0, s - 1)

    count = (run_end - pos).astype(jnp.float32)
    csum_pad = jnp.concatenate([jnp.zeros((1, d), jnp.float32), csum], axis=0)
    seg_sum = csum_pad[run_end + 1] - csum_pad[pos + 1]

    merged_pm = (h_pm + seg_sum) / (1.0 + count)[:, None]
    merged_pm = jnp.where(marked_pm[:, None], h_pm, merged_pm)

    merged = merged_pm[inv_order].astype(hidden.dtype)
    keep = (~marked_pm)[inv_order]
    return merged, keep


def apply_merge_weighted(hidden: jnp.ndarray, weights: jnp.ndarray, marked_pm: jnp.ndarray, order: jnp.ndarray):
    """Mass-weighted run merging (the merge->FastV baseline's
    ``token_merge_scale`` accounting, reference
    models/qwen2/modeling_qwen2_baseline.py:1598,1714-1731): each token
    carries the number of original tokens it represents; a run head's new
    value is the mass-weighted mean and its mass becomes the run's total.

    Args:
        hidden: (S, D); weights: (S,) fp32 per-token mass (original order).

    Returns:
        (merged, new_weights, keep) — all original order.
    """
    s, d = hidden.shape
    pos = jnp.arange(s, dtype=jnp.int32)
    inv_order = inverse_permutation(order)

    h_pm = hidden[order].astype(jnp.float32)
    w_pm = weights[order].astype(jnp.float32)
    contrib = jnp.where(marked_pm[:, None], h_pm * w_pm[:, None], 0.0)
    wsum = jnp.where(marked_pm, w_pm, 0.0)
    csum = jnp.cumsum(contrib, axis=0)
    wcsum = jnp.cumsum(wsum)

    unmarked_pos = jnp.where(marked_pm, jnp.int32(s), pos)
    nu_at_or_after = jax.lax.associative_scan(jnp.minimum, unmarked_pos[::-1])[::-1]
    nu_after = jnp.concatenate([nu_at_or_after[1:], jnp.full((1,), s, jnp.int32)])
    run_end = jnp.clip(nu_after - 1, 0, s - 1)

    csum_pad = jnp.concatenate([jnp.zeros((1, d), jnp.float32), csum], axis=0)
    wcsum_pad = jnp.concatenate([jnp.zeros((1,), jnp.float32), wcsum])
    seg_sum = csum_pad[run_end + 1] - csum_pad[pos + 1]
    seg_w = wcsum_pad[run_end + 1] - wcsum_pad[pos + 1]

    total_w = w_pm + seg_w
    merged_pm = (h_pm * w_pm[:, None] + seg_sum) / total_w[:, None]
    merged_pm = jnp.where(marked_pm[:, None], h_pm, merged_pm)
    w_new_pm = jnp.where(marked_pm, w_pm, total_w)

    merged = merged_pm[inv_order].astype(hidden.dtype)
    new_weights = w_new_pm[inv_order]
    keep = (~marked_pm)[inv_order]
    return merged, new_weights, keep
