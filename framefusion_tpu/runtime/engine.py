"""Compressed-prefill executor.

TPU-native replacement for the reference's monkey-patched forward stack
(/root/reference/framefusion/main.py:40-140 dispatched inside the
models/qwen2/modeling_qwen2.py layer loop). The reference mutates tensor
shapes layer-by-layer — recompile poison under XLA. Two executors share the
same core numerics:

**Fused mode (default).** The entire compression phase — layer-0
pre-attention merge (reference modeling_qwen2.py:44-47), per-layer
post-attention merge events, importance capture, and the prune — runs as ONE
jitted ``lax.while_loop`` program with mask-only state at the full (bucketed)
sequence length: merged/pruned tokens are killed in a live-mask instead of
gathered out, event decisions (threshold-vs-budget branch, finish flags,
fp32 cost schedule — core/schedule.py) are made on-device, and per-layer KV
goes into a pool with per-layer live masks (the reference's ragged
DynamicCache, as masks). One host sync then reads the surviving-token count,
one gather compacts to the bucketed compressed length, and a ``fori_loop``
tail program runs every remaining layer at the small shape — where the
wall-clock win lives. Host round-trips per prefill: exactly one.

**Planned mode** (``prefill(..., mode="planned")`` / ``prefill_planned``).
The same phase program composed with compaction to a STATIC plan bucket and
the tail — zero host reads on the logits' critical path; for serving
pipelines that cannot tolerate mid-request host round-trips. Falls back to
fused when the plan bucket proves too tight.

**Segmented mode** (``prefill(..., mode="segmented")``). One jitted
layer-program per compression layer with a scalar readback per merge event,
compacting to a fresh bucket after every event. Matches the reference's
shrinking-shape behavior most literally; useful for debugging and when
host<->device latency is negligible.

``compact_pre_event=True`` additionally handles the layer-0 pre-attention
merge segmented-style in fused mode (hybrid), shrinking every phase layer —
profitable when host syncs are cheap (see DEVNOTES).

All jitted programs are module-level with hashable static arguments, so they
are compiled once per shape bucket and shared across prompts and layers.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FrameFusionConfig, LLMConfig
from ..core import (
    PAD_TOKEN,
    TEXT_TOKEN,
    apply_merge,
    bucket_length,
    compact_tokens,
    compute_pruning_ratio,
    mark_topk,
    order_by_patch,
    prune_keep_mask,
    similarity_by_patch,
)
from ..core.merge import descending_rank
from ..core.schedule import CostInfeasibleError, compute_pruning_ratio_device
from ..models import qwen2
from .telemetry import CompressionEvent, PrefillTelemetry


def _round_half_even(x: float) -> int:
    """Python round() semantics (banker's rounding) used by the reference for
    the prune keep-count (main.py:76)."""
    return int(round(x))


def plan_length(orig_len: int, image_len: int, ff: FrameFusionConfig, assumed_events: int = 4, margin: float = 1.05) -> int:
    """Static post-compression bucket for ``prefill_planned``: the cost
    schedule bounds the post-prune density by
    ``cost * L / (L - n_events)`` — assume ``assumed_events`` compression
    events plus a safety margin. Too-tight plans fall back to adaptive mode
    at runtime."""
    import math

    layers = ff.schedule_num_layers
    d_max = min(1.0, ff.cost * layers / max(layers - assumed_events, 1) * margin)
    return bucket_length(orig_len - image_len + math.ceil(image_len * d_max), ff.bucket)


class SegmentedEventState:
    """Host-side merge/prune decision arithmetic for the segmented-style
    executors — ONE implementation shared by ``_prefill_segmented`` and
    ``parallel.seq_shard.seq_sharded_prefill`` so the fp32 schedule twins
    stay in lockstep (CLAUDE.md decision-parity rule): budget vs
    above-threshold branch, capped-merge finish semantics, and the
    banker's-rounded prune keep count (reference main.py:40-140, 61-101).
    Program invocation stays with the caller; this class only decides."""

    def __init__(self, ff: FrameFusionConfig):
        self.ff = ff
        self.sparsity: list[float] = []
        self.finish_merging = False
        self.finish_pruning = False

    @property
    def done(self) -> bool:
        return self.finish_merging and self.finish_pruning

    def merge_decision(self, count: int, frame_tok: int):
        """-> (k_marked, kind, above_ratio, budget); updates flags/history."""
        budget = compute_pruning_ratio(self.sparsity, self.ff.cost, self.ff.schedule_num_layers)
        above_ratio = int(count) / frame_tok
        if above_ratio < budget:
            k_marked = int(count)
            self.sparsity.append(above_ratio)
            kind = "merge"
            if above_ratio < self.ff.ratio_lower_bound:
                self.finish_merging = True
        else:
            k_marked = int(budget * frame_tok)
            self.finish_merging = True
            self.finish_pruning = True
            kind = "merge_capped"
        return k_marked, kind, above_ratio, budget

    def prune_decision(self, image_token_length: int, orig_len: int, valid: int):
        """-> (ratio, cur_img_len, k_keep, removed); sets finish_pruning."""
        ratio = compute_pruning_ratio(self.sparsity, self.ff.cost, self.ff.schedule_num_layers)
        cur_img_len = image_token_length - (orig_len - valid)
        # fp32 product before rounding — keeps the host twin bit-identical
        # to the fused executor's jnp.round(fp32) at half-way ties.
        k_keep = _round_half_even(
            float(np.float32(cur_img_len) * (np.float32(1.0) - np.float32(ratio)))
        )
        self.finish_pruning = True
        return ratio, cur_img_len, k_keep, cur_img_len - k_keep


def plan_length_measured(
    orig_len: int, frame_token_num: int, first_merge_count: int, ff: FrameFusionConfig
) -> tuple[int, int]:
    """Tight ``(pre_plan_len, plan_len)`` buckets from a MEASURED first-merge
    count — the cold-start planner.

    The layer "-1" merge is a pure function of the input embeddings (the
    reference runs it pre-attention at layer 0, main.py:104-139), so its
    above-threshold count can be measured with one cheap similarity pre-pass
    before any bucket is chosen. Given that count:

    * ``pre_plan_len`` is EXACT: the first merge removes exactly ``count``
      tokens (or ``int(budget0 * frame_tok)`` if capped).
    * ``plan_len`` is a PROVABLE upper bound on the final survivor count.
      The cost schedule (core/schedule.py) makes the final image density
      after the last event ``D_n = (L*cost - spent_n) / (L - n)`` where
      ``spent_n`` is the cumulative density over the ``n`` non-final events.
      Every continuation event applies sparsity strictly below its budget,
      which forces ``dens_{n+1} > D_n`` and hence ``D_{n+1} < D_n`` — the
      maximum over ALL trajectories is finishing at the very next event:
      ``D_max = (L*cost - (1 - s1)) / (L - 1)``. An fp32-tie trajectory that
      still overflows falls back to the adaptive executor (never truncates).
    """
    import math

    L = ff.schedule_num_layers
    budget0 = compute_pruning_ratio([], ff.cost, L)
    s1 = first_merge_count / frame_token_num
    if s1 >= budget0:
        # Capped first merge: compression finishes in one event — exact.
        k = int(np.float32(budget0) * np.float32(frame_token_num))
        b = bucket_length(orig_len - k, ff.bucket)
        return b, b
    pre = orig_len - first_merge_count
    d1 = 1.0 - s1
    d_max = (L * ff.cost - d1) / (L - 1)
    if d_max < 0:
        # The real prefill will raise CostInfeasibleError; any bucket works.
        d_max = 0.0
    # min(d_max, d1): a zero budget means the next event removes nothing
    # (merge_capped with k=0) and the pre-merge state IS final. +2 absorbs
    # the prune's banker's rounding and fp32-order slop vs the twins.
    img_max = min(math.ceil(frame_token_num * min(d_max, d1)) + 2, frame_token_num)
    final_max = (orig_len - frame_token_num) + img_max
    return bucket_length(pre, ff.bucket), bucket_length(min(final_max, pre), ff.bucket)


def plan_length_analytic(orig_len: int, frame_token_num: int, ff: FrameFusionConfig,
                         expected_reduction: float = 0.45) -> int:
    """Static bucket for the FINAL compacted state when no history exists.
    At the default knobs the merge+prune trajectory removes ~70% of the
    vision tokens (README headline); ``expected_reduction`` is deliberately
    conservative — an under-compressing prompt overflows the bucket and
    falls back to the adaptive executor (correct, just slower), it never
    truncates. Tighter than the old plan==pre_plan default, whose tail ran
    at the post-first-merge bucket (~3x the compute at 64f)."""
    return bucket_length(orig_len - int(expected_reduction * frame_token_num), ff.bucket)


def pre_plan_length(orig_len: int, frame_token_num: int, ff: FrameFusionConfig,
                    expected_first_merge: float = 0.25) -> int:
    """Static bucket for the post-first-merge state in two-stage planned
    mode. The layer-0 pre-attention merge typically removes 40-50% of the
    image tokens at the default S_th (the paper's ~70% total reduction is
    front-loaded there); ``expected_first_merge`` is deliberately
    conservative — an under-coherent video whose first merge removes less
    overflows the bucket and falls back to the adaptive executor (correct,
    just slower), it never truncates silently."""
    return bucket_length(orig_len - int(expected_first_merge * frame_token_num), ff.bucket)


def _pos_axes(pos_tok: jnp.ndarray) -> jnp.ndarray:
    """(S, P) token-major positions -> positions_cos_sin layout."""
    return pos_tok[:, 0] if pos_tok.shape[1] == 1 else pos_tok.T


# ---------------------------------------------------------------------------
# Jitted programs (static args: cfg geometry, shape buckets, feature flags)


@functools.partial(jax.jit, static_argnames=("patch_num",))
def _sim_program(h, patch_type, valid_len, s_th, *, patch_num):
    """Similarity scoring only — the layer-0 pre-attention merge event."""
    s = h.shape[0]
    valid = jnp.arange(s, dtype=jnp.int32) < valid_len
    order, n_img = order_by_patch(patch_type, valid, patch_num)
    sim = similarity_by_patch(h, patch_type, order, n_img)
    count = jnp.sum(sim >= s_th).astype(jnp.int32)
    return sim, order, count


@functools.partial(
    jax.jit, static_argnames=("cfg", "attn_impl", "capture_num", "need_sim", "patch_num")
)
def _layer_attn_program(
    params, layer_idx, h, pos_tok, patch_type, valid_len, s_th,
    *, cfg: LLMConfig, attn_impl: str, capture_num: int, need_sim: bool, patch_num: int,
):
    """One decoder layer's attention half, fused with the compression scoring
    the post-attention event will need (similarity while merging, last-rows
    importance when the prune is pending)."""
    cos, sin = qwen2.positions_cos_sin(_pos_axes(pos_tok), cfg)
    lp = qwen2.layer_slice(params["layers"], layer_idx)
    h_mid, k, v, importance = qwen2.layer_attention(
        lp, h, cos, sin, cfg, attn_impl=attn_impl, capture_num=capture_num, valid_len=valid_len
    )
    sim = order = count = None
    if need_sim:
        s = h.shape[0]
        valid = jnp.arange(s, dtype=jnp.int32) < valid_len
        order, n_img = order_by_patch(patch_type, valid, patch_num)
        sim = similarity_by_patch(h_mid, patch_type, order, n_img)
        count = jnp.sum(sim >= s_th).astype(jnp.int32)
    return h_mid, k, v, sim, order, count, importance


@functools.partial(jax.jit, static_argnames=("cfg", "new_len", "do_mlp"))
def _merge_compact_program(
    params, layer_idx, h, sim, order, k_marked, pos_tok, patch_type, new_valid,
    *, cfg: LLMConfig, new_len: int, do_mlp: bool,
):
    """Apply a merge decision, compact to the new bucket, optionally run the
    layer's MLP half on the compacted (smaller) activations."""
    marked = mark_topk(sim, k_marked)
    merged, keep = apply_merge(h, marked, order)
    out, _ = compact_tokens(
        keep, new_len, new_valid, {"h": merged, "pos": pos_tok, "patch_type": patch_type}
    )
    h_new = out["h"]
    if do_mlp:
        lp = qwen2.layer_slice(params["layers"], layer_idx)
        live = jnp.arange(new_len, dtype=jnp.int32) < new_valid
        h_new = qwen2.layer_mlp(lp, h_new, cfg, live=live)
    return h_new, out["pos"], out["patch_type"]


@functools.partial(jax.jit, static_argnames=("cfg", "new_len"))
def _prune_compact_program(
    params, layer_idx, h, importance, image_start, image_len, k_keep, pos_tok, patch_type,
    valid_len, new_valid, *, cfg: LLMConfig, new_len: int,
):
    s = h.shape[0]
    valid = jnp.arange(s, dtype=jnp.int32) < valid_len
    keep = prune_keep_mask(importance, image_start, image_len, k_keep, valid)
    out, _ = compact_tokens(
        keep, new_len, new_valid, {"h": h, "pos": pos_tok, "patch_type": patch_type}
    )
    lp = qwen2.layer_slice(params["layers"], layer_idx)
    live_new = jnp.arange(new_len, dtype=jnp.int32) < new_valid
    h_new = qwen2.layer_mlp(lp, out["h"], cfg, live=live_new)
    return h_new, out["pos"], out["patch_type"]


@functools.partial(
    jax.jit, static_argnames=("cfg", "attn_impl", "w8a8", "with_pending_mlp"))
def _tail_program(params, start_layer, h, pos_tok, valid_len,
                  pending_mlp_layer=None, *, cfg: LLMConfig, attn_impl: str,
                  w8a8: bool = False, with_pending_mlp: bool = False):
    if with_pending_mlp:
        # The phase deferred its compression-finishing layer's MLP
        # (defer_final_mlp): apply it here at the COMPACTED bucket — pointwise
        # per token, so value-identical to running it in-phase, at roughly
        # half the rows. bf16 like the in-phase MLP would have been (the
        # w8a8 flag governs only the tail layers proper).
        live = jnp.arange(h.shape[0], dtype=jnp.int32) < valid_len

        def apply_mlp(hh):
            lp = qwen2.layer_slice(params["layers"],
                                   jnp.maximum(pending_mlp_layer, 0))
            return qwen2.layer_mlp(lp, hh, cfg, live=live)

        h = jax.lax.cond(pending_mlp_layer >= 0, apply_mlp, lambda hh: hh, h)
    cos, sin = qwen2.positions_cos_sin(_pos_axes(pos_tok), cfg)
    h, k_all, v_all = qwen2.run_layers(
        params, h, cos, sin, cfg, start_layer=start_layer, attn_impl=attn_impl,
        w8a8=w8a8, valid_len=valid_len,
    )
    last = jax.lax.dynamic_slice_in_dim(h, valid_len - 1, 1, axis=0)
    logits = qwen2.final_logits(params, last, cfg)[0]
    return logits, k_all, v_all


@functools.partial(jax.jit, static_argnames=("cfg", "attn_impl"))
def _dense_prefill_program(params, embeds, pos_tok, cfg: LLMConfig, attn_impl: str):
    return qwen2.dense_prefill(params, embeds, _pos_axes(pos_tok), cfg, attn_impl=attn_impl)


_decode_program = jax.jit(
    qwen2.decode_step, static_argnames=("cfg", "attn_impl", "tail_split"))


def best_tail_split(layer_lens, s_pool: int, new_tokens: int, bucket: int):
    """Static ``(P, tail_s)`` decode split, or ``None`` if it saves nothing.

    The decode pool is padded to the longest layer — the phase layers'
    full-prompt caches (reference DynamicCache semantics: layer 0 runs
    before any merge, modeling_qwen2.py:44-47). Layers >= P never hold more
    than ``tail_s`` live rows (their prefill caches are post-compression +
    ``new_tokens`` appends), so attending only the pool's first ``tail_s``
    rows is mathematically identical and skips the dominant padded read.
    P minimizes total pool rows read per step; ``tail_s`` is bucketed so
    repeat prompts share the compiled loop.
    """
    n = len(layer_lens)
    best, best_cost = None, n * s_pool
    for p in range(1, n):
        tail_s = min(bucket_length(max(layer_lens[p:]) + new_tokens, bucket), s_pool)
        if tail_s >= s_pool:
            continue
        cost = p * s_pool + (n - p) * tail_s
        if cost < best_cost:
            best, best_cost = (p, tail_s), cost
    return best


def best_tail_split_batch(layer_lens_by_seq, s_pool: int, region_start: int, bucket: int):
    """Static ``(P, tail_s, region_start)`` batched-decode split, or ``None``.

    Batched pools write new K/V at a COMMON offset past every ragged prefix
    (decode_step_batch), so tail layers only ever hold live rows in
    ``[0, tail_s) ∪ [region_start, S_pool)`` — the gap is dead padding for
    them. Unlike the solo split, ``tail_s`` needs no new-token headroom (the
    decode region is the pool suffix) but must not cross ``region_start``.
    P minimizes total rows read per step across the two segments.
    """
    n = len(layer_lens_by_seq[0])
    region = s_pool - region_start
    maxlens = [max(seq[l] for seq in layer_lens_by_seq) for l in range(n)]
    best, best_cost = None, n * s_pool
    for p in range(1, n):
        tail_s = min(bucket_length(max(maxlens[p:]), bucket), region_start)
        cost = p * s_pool + (n - p) * (tail_s + region)
        if cost < best_cost:
            best, best_cost = (p, tail_s, region_start), cost
    return best


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "attn_impl", "n_steps", "pos_dims", "sampler", "tail_split"),
    donate_argnums=(2, 3),
)
def _decode_loop(
    params, first_logits, k_pool, v_pool, cache_lens, pos_base, rng_key,
    *, cfg: LLMConfig, attn_impl: str, n_steps: int, pos_dims: int, sampler,
    tail_split=None,
):
    """Whole decode as ONE program (lax.scan): the sampled token feeds back
    in-graph, pools are donated (updated in place), and the host reads the
    finished token array once — per-token host syncs would otherwise dominate
    decode latency on relay-attached runners."""
    from ..ops.sampling import sample_token

    def body(carry, inputs):
        tok, k_pool, v_pool, lens = carry
        step, key = inputs
        te = qwen2.embed(params, tok, cfg)
        pos = pos_base + step
        pos_id = jnp.full((3,), pos, jnp.int32) if pos_dims == 3 else pos
        logits, k_pool, v_pool, lens = qwen2.decode_step(
            params, te, pos_id, k_pool, v_pool, lens, cfg, attn_impl=attn_impl,
            tail_split=tail_split,
        )
        new_tok = sample_token(logits, sampler, key)
        return (new_tok, k_pool, v_pool, lens), new_tok

    keys = jax.random.split(rng_key, n_steps + 1)
    tok0 = sample_token(first_logits, sampler, keys[0])
    (_, k_pool, v_pool, cache_lens), toks = jax.lax.scan(
        body, (tok0, k_pool, v_pool, cache_lens),
        (jnp.arange(n_steps, dtype=jnp.int32), keys[1:]),
    )
    return jnp.concatenate([tok0[None], toks]), k_pool, v_pool, cache_lens


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "attn_impl", "n_steps", "pos_dims", "sampler", "tail_split"),
    donate_argnums=(2, 3),
)
def _decode_chunk(
    params, tok0, k_pool, v_pool, cache_lens, pos_base, start_step, keys,
    *, cfg: LLMConfig, attn_impl: str, n_steps: int, pos_dims: int, sampler,
    tail_split=None,
):
    """``_decode_loop``'s resumable sibling: one CHUNK of the decode scan,
    starting from an already-sampled carry token at step offset
    ``start_step`` and returning the carried state so the next chunk can
    continue in place. Powers ``generate_stream`` (partial-result streaming,
    one host sync per chunk) — same body, same per-token math."""
    from ..ops.sampling import sample_token

    def body(carry, inputs):
        tok, k_pool, v_pool, lens = carry
        step, key = inputs
        te = qwen2.embed(params, tok, cfg)
        pos = pos_base + start_step + step
        pos_id = jnp.full((3,), pos, jnp.int32) if pos_dims == 3 else pos
        logits, k_pool, v_pool, lens = qwen2.decode_step(
            params, te, pos_id, k_pool, v_pool, lens, cfg, attn_impl=attn_impl,
            tail_split=tail_split,
        )
        new_tok = sample_token(logits, sampler, key)
        return (new_tok, k_pool, v_pool, lens), new_tok

    (tok_last, k_pool, v_pool, cache_lens), toks = jax.lax.scan(
        body, (tok0, k_pool, v_pool, cache_lens),
        (jnp.arange(n_steps, dtype=jnp.int32), keys),
    )
    return toks, tok_last, k_pool, v_pool, cache_lens


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "pos_dims", "sampler", "attn_impl", "tail_split"),
    donate_argnums=(2, 3),
)
def _decode_loop_batch(
    params, first_logits, k_pools, v_pools, cache_lens, pos_bases, write_pos, rng_key,
    *, cfg: LLMConfig, n_steps: int, pos_dims: int, sampler, attn_impl: str = "jax",
    tail_split=None,
):
    """Batched decode: one ``lax.scan`` over ``decode_step_batch``. Decode is
    weight-bandwidth-bound (every step streams the full decoder weights from
    HBM), so serving B sequences in one scan costs nearly the same wall-clock
    per step as one — token throughput scales ~linearly with B. This is a
    capability the reference's bsz==1 contract (main.py:203, asserted in
    every embedding hook) structurally rules out.

    Shapes: first_logits (B, V); k_pools/v_pools (L, B, S_pool, Hk, hd);
    cache_lens (L, B) ragged prefix lengths; pos_bases (B,); write_pos
    scalar — the common decode-region offset (see decode_step_batch: common
    offsets keep the cache updates scatter-free). Returns tokens (B, n+1).
    """
    from ..ops.sampling import sample_token

    sample_b = jax.vmap(lambda lg, key: sample_token(lg, sampler, key))

    def body(carry, inputs):
        toks, k_pools, v_pools = carry
        step, keys = inputs
        te = qwen2.embed(params, toks, cfg)  # (B, D)
        pos = pos_bases + step
        pos_id = jnp.tile(pos[None], (3, 1)) if pos_dims == 3 else pos
        logits, k_pools, v_pools = qwen2.decode_step_batch(
            params, te, pos_id, k_pools, v_pools, cache_lens, write_pos, step, cfg,
            attn_impl=attn_impl, tail_split=tail_split,
        )
        new_toks = sample_b(logits, keys)
        return (new_toks, k_pools, v_pools), new_toks

    keys = jax.random.split(rng_key, (n_steps + 1, first_logits.shape[0]))
    tok0 = sample_b(first_logits, keys[0])
    (_, k_pools, v_pools), toks = jax.lax.scan(
        body, (tok0, k_pools, v_pools),
        (jnp.arange(n_steps, dtype=jnp.int32), keys[1:]),
    )
    return jnp.concatenate([tok0[None], toks]).T, k_pools, v_pools


# ---------------------------------------------------------------------------
# Fused compression phase: the whole merge/prune stage as ONE on-device
# lax.while_loop program (see module docstring). Event kind codes for the
# device-side telemetry log:
EV_MERGE, EV_MERGE_CAPPED, EV_PRUNE = 1, 2, 3


def _merge_event_step(
    st, h_mid, layer_for_log, patch_type, cost, s_th, r_min,
    *, patch_num, schedule_num_layers, collect_similarities=False,
):
    """One merge event on a single sequence's phase state (shared by the
    single-sequence and the lockstep-batched phase programs — one source of
    truth for decision parity with reference main.py:104-139)."""
    budget, infeas = compute_pruning_ratio_device(
        st["sparsity"], st["n_events"], cost, schedule_num_layers
    )
    order, n_img = order_by_patch(patch_type, st["live"], patch_num)
    sim = similarity_by_patch(h_mid, patch_type, order, n_img)
    count = jnp.sum(sim >= s_th).astype(jnp.int32)
    ftok = st["frame_tok"].astype(jnp.float32)
    above = count.astype(jnp.float32) / ftok
    threshold_branch = above < budget
    k_capped = jnp.floor(budget * ftok).astype(jnp.int32)
    k_marked = jnp.where(threshold_branch, count, k_capped)
    marked = mark_topk(sim, k_marked)
    merged, keep = apply_merge(h_mid, marked, order)

    i = st["ev_n"]
    kind = jnp.where(threshold_branch, EV_MERGE, EV_MERGE_CAPPED)
    if collect_similarities:
        # Research introspection parity: the reference's baselines log the
        # per-layer similarity tensors to ``model.similarities``
        # (modeling_qwen2_baseline.py:994-998).
        st = dict(st, sim_log=st["sim_log"].at[i].set(sim))
    return dict(
        st,
        h=merged,
        live=st["live"] & keep,
        n_live=st["n_live"] - k_marked,
        frame_tok=st["frame_tok"] - k_marked,
        sparsity=jnp.where(
            threshold_branch, st["sparsity"].at[st["n_events"]].set(above), st["sparsity"]
        ),
        n_events=st["n_events"] + threshold_branch.astype(jnp.int32),
        fm=st["fm"] | (threshold_branch & (above < r_min)) | ~threshold_branch,
        fp=st["fp"] | ~threshold_branch,
        infeasible=st["infeasible"] | infeas,
        ev_layer=st["ev_layer"].at[i].set(layer_for_log),
        ev_kind=st["ev_kind"].at[i].set(kind),
        ev_removed=st["ev_removed"].at[i].set(k_marked),
        ev_ratio=st["ev_ratio"].at[i].set(above),
        ev_budget=st["ev_budget"].at[i].set(budget),
        ev_n=i + 1,
    )


def _prune_event_step(
    st, h_mid, importance, layer_for_log, valid0, image_start, image_len, cost,
    *, schedule_num_layers,
):
    """One prune event on a single sequence's phase state (reference
    main.py:61-101; shared between the phase-program variants)."""
    ratio, infeas = compute_pruning_ratio_device(
        st["sparsity"], st["n_events"], cost, schedule_num_layers
    )
    cur_img_len = image_len - (valid0 - st["n_live"])
    # Banker's rounding = python round() used by the reference (main.py:76).
    k_keep = jnp.round(cur_img_len.astype(jnp.float32) * (1.0 - ratio)).astype(jnp.int32)
    live_rank = jnp.cumsum(st["live"].astype(jnp.int32)) - 1
    in_window = (
        st["live"] & (live_rank >= image_start) & (live_rank < image_start + cur_img_len)
    )
    score = jnp.where(in_window, importance, -jnp.inf)
    keep = (st["live"] & ~in_window) | (in_window & (descending_rank(score) < k_keep))
    removed = cur_img_len - k_keep

    i = st["ev_n"]
    return dict(
        st,
        h=h_mid,
        live=keep,
        n_live=st["n_live"] - removed,
        fp=jnp.bool_(True),
        infeasible=st["infeasible"] | infeas,
        ev_layer=st["ev_layer"].at[i].set(layer_for_log),
        ev_kind=st["ev_kind"].at[i].set(EV_PRUNE),
        ev_removed=st["ev_removed"].at[i].set(removed),
        ev_ratio=st["ev_ratio"].at[i].set(-1.0),
        ev_budget=st["ev_budget"].at[i].set(ratio),
        ev_n=i + 1,
    )


def _pack_control_vector(st):
    """All host-needed control state as ONE fp32 vector — the device->host
    relay costs a round trip per array, so the single sync per prefill must
    be a single transfer. fp32 holds every field exactly (ints < 2^24)."""
    head = jnp.stack(
        [
            st["layer"].astype(jnp.float32),
            st["fm"].astype(jnp.float32),
            st["fp"].astype(jnp.float32),
            st["n_live"].astype(jnp.float32),
            st["infeasible"].astype(jnp.float32),
            st["ev_n"].astype(jnp.float32),
            st["n_events"].astype(jnp.float32),
        ]
    )
    return jnp.concatenate(
        [
            head,
            st["sparsity"],
            st["ev_layer"].astype(jnp.float32),
            st["ev_kind"].astype(jnp.float32),
            st["ev_removed"].astype(jnp.float32),
            st["ev_ratio"],
            st["ev_budget"],
        ]
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "attn_impl", "capture_num", "patch_num", "max_events",
        "pool_layers", "include_pre_event", "schedule_num_layers",
        "collect_similarities", "defer_final_mlp",
    ),
)
def _phase_program(
    params, h, pos_tok, patch_type, live, n_live, frame_tok, valid0,
    capture_end, image_start, image_len, sparsity, n_events, fm, fp, start_layer,
    cost, s_th, r_min,
    *, cfg: LLMConfig, attn_impl: str, capture_num: int, patch_num: int,
    max_events: int, pool_layers: int, include_pre_event: bool,
    schedule_num_layers: int, collect_similarities: bool = False,
    defer_final_mlp: bool = False,
):
    """Run decoder layers with in-place (mask-only) compression until both
    merging and pruning finish, the stack ends, or the KV pool fills.

    ``defer_final_mlp``: when the event that FINISHES compression fires, skip
    that layer's MLP and record the layer in ``st["mlp_pending"]`` — the
    caller applies it after compaction (layer_mlp is pointwise per token, so
    post-compaction application is value-identical for live tokens and runs
    at the compacted bucket instead of the phase bucket: at bench geometry
    the prune layer's MLP drops from 6528 to 3328 rows, ~7 ms of pure MXU
    time). Only the planned path opts in; ``mlp_pending`` is -1 when every
    MLP ran in-phase (e.g. the pool filled before compression finished).

    Decision parity: FrameFusion.forward (reference main.py:40-140) with the
    fp32 schedule twin. All shapes static; merged/pruned tokens are masked
    dead, not removed; the single post-phase compaction happens outside.

    ``valid0`` is the ORIGINAL prompt length (the prune's
    ``image_len - (original - current)`` arithmetic, reference main.py:66);
    ``capture_end`` is the position after the last live token in THIS
    program's coordinates — they differ when the engine pre-compacted after
    the layer-0 pre-attention event (hybrid mode). Trailing text never dies,
    so the importance-capture rows sit at ``capture_end - num``.

    Returns the full carried state plus per-layer KV pools, live masks, and
    the device-side event log.
    """
    s = h.shape[0]
    hd = cfg.head_dim_
    cos, sin = qwen2.positions_cos_sin(_pos_axes(pos_tok), cfg)
    n_ev_slots = max_events + 2
    layer_stop = jnp.minimum(start_layer + pool_layers, cfg.num_layers)

    def merge_event(st, h_mid, layer_for_log):
        return _merge_event_step(
            st, h_mid, layer_for_log, patch_type, cost, s_th, r_min,
            patch_num=patch_num, schedule_num_layers=schedule_num_layers,
            collect_similarities=collect_similarities,
        )

    def prune_event(st, h_mid, importance, layer_for_log):
        return _prune_event_step(
            st, h_mid, importance, layer_for_log, valid0, image_start, image_len,
            cost, schedule_num_layers=schedule_num_layers,
        )

    st = dict(
        h=h,
        live=live,
        n_live=n_live,
        frame_tok=frame_tok,
        sparsity=sparsity,
        n_events=n_events,
        fm=fm,
        fp=fp,
        layer=start_layer,
        infeasible=jnp.bool_(False),
        k_pool=jnp.zeros((pool_layers, s, cfg.num_kv_heads, hd), cfg.dtype),
        v_pool=jnp.zeros((pool_layers, s, cfg.num_kv_heads, hd), cfg.dtype),
        cache_live=jnp.zeros((pool_layers, s), bool),
        ev_layer=jnp.full((n_ev_slots,), -100, jnp.int32),
        ev_kind=jnp.zeros((n_ev_slots,), jnp.int32),
        ev_removed=jnp.zeros((n_ev_slots,), jnp.int32),
        ev_ratio=jnp.zeros((n_ev_slots,), jnp.float32),
        ev_budget=jnp.zeros((n_ev_slots,), jnp.float32),
        ev_n=jnp.int32(0),
    )
    if collect_similarities:
        st["sim_log"] = jnp.zeros((n_ev_slots, s), jnp.float32)
    if defer_final_mlp:
        st["mlp_pending"] = jnp.int32(-1)

    if include_pre_event:
        # Layer-0 pre-attention merge (reference modeling_qwen2.py:44-47) —
        # prepare() always starts with merging unfinished, so this is
        # unconditionally a merge event.
        st = merge_event(st, st["h"], jnp.int32(-1))

    def cond(st):
        return (st["layer"] < layer_stop) & ~(st["fm"] & st["fp"])

    pack_control = _pack_control_vector

    def body(st):
        l = st["layer"]
        lp = qwen2.layer_slice(params["layers"], l)
        h_mid, k, v, importance = qwen2.layer_attention(
            lp, st["h"], cos, sin, cfg, attn_impl=attn_impl,
            capture_num=capture_num, valid_len=capture_end, key_valid=st["live"],
        )
        pool_idx = l - start_layer
        st = dict(
            st,
            k_pool=jax.lax.dynamic_update_index_in_dim(st["k_pool"], k.astype(cfg.dtype), pool_idx, 0),
            v_pool=jax.lax.dynamic_update_index_in_dim(st["v_pool"], v.astype(cfg.dtype), pool_idx, 0),
            cache_live=jax.lax.dynamic_update_index_in_dim(st["cache_live"], st["live"], pool_idx, 0),
        )
        # Exactly one of the two events fires per iteration: merging while it
        # is unfinished, otherwise the prune (loop cond guarantees ~(fm&fp)).
        st = jax.lax.cond(
            ~st["fm"],
            lambda s_: merge_event(s_, h_mid, l),
            lambda s_: prune_event(s_, h_mid, importance, l),
            st,
        )
        if defer_final_mlp:
            done_now = st["fm"] & st["fp"]
            st["mlp_pending"] = jnp.where(done_now, l, st["mlp_pending"])
            st["h"] = jax.lax.cond(
                done_now,
                lambda hh: hh,
                lambda hh: qwen2.layer_mlp(lp, hh, cfg, live=st["live"]),
                st["h"],
            )
        else:
            st["h"] = qwen2.layer_mlp(lp, st["h"], cfg, live=st["live"])
        st["layer"] = l + 1
        return st

    st = jax.lax.while_loop(cond, body, st)
    st["control"] = pack_control(st)
    return st


@functools.partial(
    jax.jit, static_argnames=("patch_num", "max_events", "schedule_num_layers", "plan_len")
)
def _pre_event_program(
    h, pos_tok, patch_type, n_live, frame_tok, budget0, s_th, r_min,
    *, patch_num: int, max_events: int, schedule_num_layers: int, plan_len: int,
):
    """Device-side layer-0 pre-attention merge event + compaction to a STATIC
    plan bucket — the sync-free twin of the hybrid ``compact_pre_event`` path.

    The first merge is typically the largest single shrink (reference
    modeling_qwen2.py:44-47 fires it before any attention mixes frames), so
    compacting here lets every phase layer run at the post-merge bucket with
    no host read: the merge decision (threshold-vs-budget branch, fp32
    schedule — reference main.py:113-127) and the schedule state the phase
    program needs (sparsity/n_events/finish flags) are all computed on
    device. If the surviving count exceeds ``plan_len`` the compaction would
    truncate live tokens — the caller detects that post-hoc via the control
    vector and falls back to the adaptive executor.

    ``budget0`` is the first event's schedule budget, computed by the HOST
    fp32 twin (the empty-sparsity-list case needs no device state): passing
    the value in keeps the threshold-vs-cap decision bit-identical to the
    other executors — recomputing it here let XLA reassociate the fp32 chain
    differently across programs (observed: 0.59999996 vs 0.59999998 for
    cost=0.4/L=6, flipping floor(budget*60) between 35 and 36).

    Returns (h, pos, patch_type) compacted to ``plan_len``, the phase-entry
    scalars, and a 6-float control vector
    (k_marked, kind, above_ratio, budget, infeasible, n_after).
    """
    s = h.shape[0]
    live = jnp.arange(s, dtype=jnp.int32) < n_live
    budget = budget0
    infeas = jnp.bool_(False)  # empty sparsity list: remaining = L*cost >= 0
    order, n_img = order_by_patch(patch_type, live, patch_num)
    sim = similarity_by_patch(h, patch_type, order, n_img)
    count = jnp.sum(sim >= s_th).astype(jnp.int32)
    ftok = frame_tok.astype(jnp.float32)
    above = count.astype(jnp.float32) / ftok
    threshold_branch = above < budget
    k_capped = jnp.floor(budget * ftok).astype(jnp.int32)
    k_marked = jnp.where(threshold_branch, count, k_capped)
    marked = mark_topk(sim, k_marked)
    merged, keep = apply_merge(h, marked, order)
    keep = keep & live
    n_new = n_live - k_marked
    out, _ = compact_tokens(
        keep, plan_len, n_new, {"h": merged, "pos": pos_tok, "patch_type": patch_type}
    )
    sparsity = jnp.where(
        threshold_branch,
        jnp.zeros((max_events,), jnp.float32).at[0].set(above),
        jnp.zeros((max_events,), jnp.float32),
    )
    n_events = threshold_branch.astype(jnp.int32)
    fm = (threshold_branch & (above < r_min)) | ~threshold_branch
    fp = ~threshold_branch
    kind = jnp.where(threshold_branch, EV_MERGE, EV_MERGE_CAPPED)
    control = jnp.stack([
        k_marked.astype(jnp.float32), kind.astype(jnp.float32), above, budget,
        infeas.astype(jnp.float32), n_new.astype(jnp.float32),
    ])
    return (
        out["h"], out["pos"], out["patch_type"],
        n_new, frame_tok - k_marked, sparsity, n_events, fm, fp, control,
    )


@functools.partial(jax.jit, static_argnames=("new_len",))
def _compact_state_program(h, pos_tok, patch_type, live, new_valid, *, new_len: int):
    """Single post-phase compaction: pack live tokens, slice to the bucket."""
    out, _ = compact_tokens(
        live, new_len, new_valid, {"h": h, "pos": pos_tok, "patch_type": patch_type}
    )
    return out["h"], out["pos"], out["patch_type"]


@jax.jit
def _pack_caches_program(k_pool, v_pool, cache_live):
    """Pack each phase layer's masked KV rows to the front (per-layer ragged
    lengths, the reference's DynamicCache shape after compression)."""

    def pack_one(k, v, live_row):
        order = jnp.argsort(jnp.logical_not(live_row), stable=True)
        return jnp.take(k, order, axis=0), jnp.take(v, order, axis=0)

    k_packed, v_packed = jax.vmap(pack_one)(k_pool, v_pool, cache_live)
    return k_packed, v_packed, jnp.sum(cache_live, axis=1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "attn_impl", "capture_num", "patch_num", "max_events",
        "pool_layers", "schedule_num_layers", "pre_plan_len",
    ),
)
def _planned_front_program(
    params, h, pos_tok, patch_type, orig_len, frame_tok0, budget0,
    image_start, image_len, cost, s_th, r_min,
    *, cfg: LLMConfig, attn_impl: str, capture_num: int, patch_num: int,
    max_events: int, pool_layers: int, schedule_num_layers: int,
    pre_plan_len: int,
):
    """Two-stage planned prefill's FRONT half as one program: pre-event merge
    + compact to the pre-plan bucket + mask-only phase. The phase control
    vector is an output HERE, one dispatch before the tail — so the caller's
    post-hoc host read of it overlaps the back program's execution (through
    a high-latency relay that read costs ~35-130 ms; hidden behind the
    ~285 ms tail, it costs nothing — the single-program pipeline measured
    +75-90 ms per prefill for exactly this reason)."""
    (h1, pos1, pt1, n_live_d, frame_tok_d, sparsity_d, n_events_d, fm_d,
     fp_d, pre_ctl) = _pre_event_program(
        h, pos_tok, patch_type, orig_len, frame_tok0, budget0, s_th, r_min,
        patch_num=patch_num, max_events=max_events,
        schedule_num_layers=schedule_num_layers, plan_len=pre_plan_len,
    )
    live1 = jnp.arange(pre_plan_len, dtype=jnp.int32) < n_live_d
    st = _phase_program(
        params, h1, pos1, pt1, live1, n_live_d, frame_tok_d, orig_len,
        n_live_d, image_start, image_len, sparsity_d, n_events_d, fm_d,
        fp_d, jnp.int32(0), cost, s_th, r_min,
        cfg=cfg, attn_impl=attn_impl, capture_num=capture_num,
        patch_num=patch_num, max_events=max_events, pool_layers=pool_layers,
        schedule_num_layers=schedule_num_layers,
        include_pre_event=False, defer_final_mlp=True,
    )
    return st, pos1, pt1, pre_ctl


@functools.partial(
    jax.jit, static_argnames=("cfg", "attn_impl", "w8a8", "plan_len"))
def _planned_back_program(
    params, start_layer, h, pos_tok, patch_type, live, n_live, mlp_pending,
    k_pool, v_pool, cache_live,
    *, cfg: LLMConfig, attn_impl: str, w8a8: bool, plan_len: int,
):
    """Planned prefill's BACK half as one program: post-phase compaction +
    tail (pending MLP first) + phase-cache pack. Fusing these lets XLA feed
    the compaction gather straight into the first tail layer's consumers and
    drops two relay dispatches; the control vector already left with the
    front program, so the caller's host read overlaps all of this."""
    h2, pos2, _ = _compact_state_program(
        h, pos_tok, patch_type, live, n_live, new_len=plan_len)
    logits, k_tail, v_tail = _tail_program(
        params, start_layer, h2, pos2, n_live, mlp_pending,
        cfg=cfg, attn_impl=attn_impl, w8a8=w8a8, with_pending_mlp=True)
    k_packed, v_packed, _ = _pack_caches_program(k_pool, v_pool, cache_live)
    return logits, k_tail, v_tail, k_packed, v_packed


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "attn_impl", "capture_num", "patch_num", "max_events",
        "pool_layers", "schedule_num_layers", "pre_plan_len", "plan_len",
        "two_stage", "w8a8",
    ),
)
def _planned_pipeline_program(
    params, h, pos_tok, patch_type, orig_len, frame_tok0, budget0,
    image_start, image_len, cost, s_th, r_min,
    *, cfg: LLMConfig, attn_impl: str, capture_num: int, patch_num: int,
    max_events: int, pool_layers: int, schedule_num_layers: int,
    pre_plan_len: int, plan_len: int, two_stage: bool, w8a8: bool,
):
    """The planned prefill's ENTIRE sync-free critical path as ONE XLA
    program: [pre-event merge + compact to the pre-plan bucket ->] mask-only
    phase -> post-phase compaction -> tail (pending MLP first) -> phase-cache
    pack.

    One relay dispatch per prefill instead of five. Beyond the dispatch
    round trips, a single module lets XLA fuse the post-phase compaction
    gather into the first tail layer's consumers and keeps the UNPACKED
    phase pools internal — only the packed caches leave the program. The
    composed sub-programs are the exact jitted functions the staged path
    runs (same HLO subgraphs, so fp32 decision arithmetic is unchanged);
    the control vectors come back as device arrays for the caller's
    post-hoc (tail-overlapped) host read.
    """
    phase_common = dict(
        cfg=cfg, attn_impl=attn_impl, capture_num=capture_num,
        patch_num=patch_num, max_events=max_events, pool_layers=pool_layers,
        schedule_num_layers=schedule_num_layers,
    )
    if two_stage:
        (h1, pos1, pt1, n_live_d, frame_tok_d, sparsity_d, n_events_d, fm_d,
         fp_d, pre_ctl) = _pre_event_program(
            h, pos_tok, patch_type, orig_len, frame_tok0, budget0, s_th, r_min,
            patch_num=patch_num, max_events=max_events,
            schedule_num_layers=schedule_num_layers, plan_len=pre_plan_len,
        )
        live1 = jnp.arange(pre_plan_len, dtype=jnp.int32) < n_live_d
        st = _phase_program(
            params, h1, pos1, pt1, live1, n_live_d, frame_tok_d, orig_len,
            n_live_d, image_start, image_len, sparsity_d, n_events_d, fm_d,
            fp_d, jnp.int32(0), cost, s_th, r_min,
            include_pre_event=False, defer_final_mlp=True, **phase_common,
        )
        pos_c, pt_c = pos1, pt1
    else:
        pre_ctl = jnp.zeros((6,), jnp.float32)
        live = jnp.arange(h.shape[0], dtype=jnp.int32) < orig_len
        st = _phase_program(
            params, h, pos_tok, patch_type, live, orig_len, frame_tok0,
            orig_len, orig_len, image_start, image_len,
            jnp.zeros((max_events,), jnp.float32), jnp.int32(0),
            jnp.bool_(False), jnp.bool_(False), jnp.int32(0),
            cost, s_th, r_min,
            include_pre_event=True, defer_final_mlp=True, **phase_common,
        )
        pos_c, pt_c = pos_tok, patch_type
    h2, pos2, _ = _compact_state_program(
        st["h"], pos_c, pt_c, st["live"], st["n_live"], new_len=plan_len)
    logits, k_tail, v_tail = _tail_program(
        params, st["layer"], h2, pos2, st["n_live"], st["mlp_pending"],
        cfg=cfg, attn_impl=attn_impl, w8a8=w8a8, with_pending_mlp=True)
    k_packed, v_packed, _ = _pack_caches_program(
        st["k_pool"], st["v_pool"], st["cache_live"])
    return logits, k_tail, v_tail, k_packed, v_packed, st["control"], pre_ctl


# ---------------------------------------------------------------------------
# Lockstep-batched phase + tail (batched serving prefill)


def _attn_core_batch(lp, h, cos, sin, cfg: LLMConfig, attn_impl: str,
                     capture_num: int, capture_end, key_valid):
    """Batched decoder attention half: norms/projections/rope run as BATCHED
    matmuls (one weight read for the whole batch — (B, S, D) lhs), the
    attention kernel itself runs per sequence under ``lax.map`` (the pallas
    grids are single-sequence; sequential kernel launches pipeline fine).
    The kernel/capture dispatch is qwen2.attention_kernel_dispatch — the
    SAME function the solo executors use."""
    b, s, _ = h.shape
    hd = cfg.head_dim_
    x = qwen2.rmsnorm(h, lp["ln1"], cfg.rms_norm_eps)
    q = qwen2.mm(x, lp["wq"])
    k = qwen2.mm(x, lp["wk"])
    v = qwen2.mm(x, lp["wv"])
    if cfg.qkv_bias:
        q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
    q = q.reshape(b, s, cfg.num_heads, hd)
    k = k.reshape(b, s, cfg.num_kv_heads, hd)
    v = v.reshape(b, s, cfg.num_kv_heads, hd)
    q, k = jax.vmap(qwen2.apply_rope)(q, k, cos, sin)

    def one(args):
        qb, kb, vb, ce, lv = args
        attn, imp = qwen2.attention_kernel_dispatch(
            qb, kb, vb, attn_impl, capture_num, ce, lv
        )
        if imp is None:
            imp = jnp.zeros((s,), jnp.float32)
        return attn, imp

    attn, importance = jax.lax.map(one, (q, k, v, capture_end, key_valid))
    h_out = h + qwen2.mm(attn.reshape(b, s, -1), lp["wo"])
    return h_out, k, v, importance


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "attn_impl", "capture_num", "patch_num", "max_events",
        "pool_layers", "schedule_num_layers",
    ),
)
def _phase_program_batch(
    params, h, pos_tok, patch_type, live, n_live, frame_tok, valid0,
    capture_end, image_start, image_len, sparsity, n_events, fm, fp,
    cost, s_th, r_min,
    *, cfg: LLMConfig, attn_impl: str, capture_num: int, patch_num: int,
    max_events: int, pool_layers: int, schedule_num_layers: int,
):
    """LOCKSTEP-batched compression phase: ONE shared layer counter, B
    independent per-sequence event states. Each iteration runs the layer for
    the whole batch (batched matmuls, per-sequence attention kernels) and
    dispatches each sequence's merge/prune event with the SAME
    ``_merge_event_step``/``_prune_event_step`` code as the single-sequence
    program — per-sequence decisions are identical to their solo runs. The
    loop exits when EVERY sequence finished compression (or the pool fills);
    sequences that finish early keep running layers event-free, which
    computes exactly what their solo tail would (mask-only, same rope), just
    at the phase bucket.

    Batched leading dims: h (B,S,D), pos_tok (B,S,P), patch_type (B,S),
    live (B,S), scalars->(B,). Pools are (pool_layers, B, S, Hk, hd).
    Returns the batched state; control is (B, ctl_len).
    """
    b, s = h.shape[:2]
    hd = cfg.head_dim_
    cos, sin = jax.vmap(lambda p: qwen2.positions_cos_sin(_pos_axes(p), cfg))(pos_tok)
    n_ev_slots = max_events + 2
    layer_stop = min(pool_layers, cfg.num_layers)

    st = dict(
        h=h,
        live=live,
        n_live=n_live,
        frame_tok=frame_tok,
        sparsity=sparsity,
        n_events=n_events,
        fm=fm,
        fp=fp,
        infeasible=jnp.zeros((b,), bool),
        k_pool=jnp.zeros((pool_layers, b, s, cfg.num_kv_heads, hd), cfg.dtype),
        v_pool=jnp.zeros((pool_layers, b, s, cfg.num_kv_heads, hd), cfg.dtype),
        cache_live=jnp.zeros((pool_layers, b, s), bool),
        ev_layer=jnp.full((b, n_ev_slots), -100, jnp.int32),
        ev_kind=jnp.zeros((b, n_ev_slots), jnp.int32),
        ev_removed=jnp.zeros((b, n_ev_slots), jnp.int32),
        ev_ratio=jnp.zeros((b, n_ev_slots), jnp.float32),
        ev_budget=jnp.zeros((b, n_ev_slots), jnp.float32),
        ev_n=jnp.zeros((b,), jnp.int32),
    )
    SEQ_KEYS = ("h", "live", "n_live", "frame_tok", "sparsity", "n_events", "fm",
                "fp", "infeasible", "ev_layer", "ev_kind", "ev_removed",
                "ev_ratio", "ev_budget", "ev_n")

    def event_dispatch(st_seq, h_mid_seq, imp_seq, pt_seq, v0_seq, img_s_seq, img_l_seq, l):
        def no_event(s_):
            return dict(s_, h=h_mid_seq)

        def with_event(s_):
            return jax.lax.cond(
                ~s_["fm"],
                lambda ss: _merge_event_step(
                    ss, h_mid_seq, l, pt_seq, cost, s_th, r_min,
                    patch_num=patch_num, schedule_num_layers=schedule_num_layers,
                ),
                lambda ss: _prune_event_step(
                    ss, h_mid_seq, imp_seq, l, v0_seq, img_s_seq, img_l_seq, cost,
                    schedule_num_layers=schedule_num_layers,
                ),
                s_,
            )

        return jax.lax.cond(st_seq["fm"] & st_seq["fp"], no_event, with_event, st_seq)

    def cond(carry):
        l, st = carry
        return (l < layer_stop) & ~jnp.all(st["fm"] & st["fp"])

    def body(carry):
        l, st = carry
        lp = qwen2.layer_slice(params["layers"], l)
        h_mid, k, v, importance = _attn_core_batch(
            lp, st["h"], cos, sin, cfg, attn_impl, capture_num, capture_end, st["live"]
        )
        st = dict(
            st,
            k_pool=jax.lax.dynamic_update_index_in_dim(st["k_pool"], k.astype(cfg.dtype), l, 0),
            v_pool=jax.lax.dynamic_update_index_in_dim(st["v_pool"], v.astype(cfg.dtype), l, 0),
            cache_live=jax.lax.dynamic_update_index_in_dim(st["cache_live"], st["live"], l, 0),
        )
        seq_st = {key: st[key] for key in SEQ_KEYS}
        new_seq = jax.vmap(event_dispatch, in_axes=(0, 0, 0, 0, 0, 0, 0, None))(
            seq_st, h_mid, importance, patch_type, valid0, image_start, image_len, l
        )
        st.update(new_seq)
        # Defer the loop-ending iteration's MLP (every sequence is done, so
        # the loop exits next cond): the caller applies it after compaction
        # at the plan bucket — pointwise per token, value-identical (the
        # batched twin of the solo defer_final_mlp).
        done_all = jnp.all(st["fm"] & st["fp"])
        st["mlp_pending"] = jnp.where(done_all, l, jnp.int32(-1))
        st["h"] = jax.lax.cond(
            done_all,
            lambda hh: hh,
            lambda hh: qwen2.layer_mlp(lp, hh, cfg, live=st["live"]),
            st["h"],
        )
        return l + 1, st

    st["mlp_pending"] = jnp.int32(-1)
    layer, st = jax.lax.while_loop(cond, body, (jnp.int32(0), st))
    st["layer"] = layer  # shared exit layer (= tail start for every sequence)
    pack_seq = {key: st[key] for key in SEQ_KEYS}
    pack_seq["layer"] = jnp.full((b,), layer)
    st["control"] = jax.vmap(_pack_control_vector)(pack_seq)
    return st


@functools.partial(
    jax.jit, static_argnames=("cfg", "attn_impl", "with_pending_mlp"))
def _tail_program_batch(params, start_layer, h, pos_tok, valid_len,
                        pending_mlp_layer=None, *, cfg: LLMConfig,
                        attn_impl: str, with_pending_mlp: bool = False):
    """Batched tail: every remaining layer at the (shared) plan bucket.
    Matmuls batched, attention per sequence (see _attn_core_batch)."""
    b, sp = h.shape[:2]
    cos, sin = jax.vmap(lambda p: qwen2.positions_cos_sin(_pos_axes(p), cfg))(pos_tok)
    hd = cfg.head_dim_
    k_all = jnp.zeros((cfg.num_layers, b, sp, cfg.num_kv_heads, hd), cfg.dtype)
    v_all = jnp.zeros_like(k_all)
    no_capture = jnp.zeros((b,), jnp.int32)
    all_live = jnp.ones((b, sp), bool)

    live_rows = jnp.arange(sp, dtype=jnp.int32)[None, :] < valid_len[:, None]  # (B, S)

    if with_pending_mlp:
        # The batched phase deferred its final iteration's MLP (see
        # _phase_program_batch): apply it here at the compacted bucket.
        def apply_mlp(hh):
            lp = qwen2.layer_slice(params["layers"],
                                   jnp.maximum(pending_mlp_layer, 0))
            return qwen2.layer_mlp(lp, hh, cfg, live=live_rows)

        h = jax.lax.cond(pending_mlp_layer >= 0, apply_mlp, lambda hh: hh, h)

    def body(l, carry):
        h, k_all, v_all = carry
        lp = qwen2.layer_slice(params["layers"], l)
        h, k, v, _ = _attn_core_batch(lp, h, cos, sin, cfg, attn_impl, 0, no_capture, all_live)
        h = qwen2.layer_mlp(lp, h, cfg, live=live_rows)
        k_all = jax.lax.dynamic_update_index_in_dim(k_all, k.astype(cfg.dtype), l, 0)
        v_all = jax.lax.dynamic_update_index_in_dim(v_all, v.astype(cfg.dtype), l, 0)
        return h, k_all, v_all

    h, k_all, v_all = jax.lax.fori_loop(start_layer, cfg.num_layers, body, (h, k_all, v_all))
    last = jax.vmap(lambda hb, vl: jax.lax.dynamic_slice_in_dim(hb, vl - 1, 1, axis=0)[0])(
        h, valid_len
    )
    logits = qwen2.final_logits(params, last, cfg)  # (B, V)
    return logits, k_all, v_all


# ---------------------------------------------------------------------------
# Results


@dataclasses.dataclass
class PrefillResult:
    logits: jnp.ndarray  # (V,) last-token logits
    layer_caches: list  # per layer: (k, v, length) — ragged bucketed shapes
    valid_len: int  # live tokens at stack output
    decode_pos_base: int  # first decode rotary position (= layer-0 cache len)
    telemetry: Optional[PrefillTelemetry]
    pos_dims: int  # 1 or 3 (mRoPE)
    # Executor that actually produced this result. Serving callers using
    # "planned" can detect degradation: a too-tight plan bucket or a phase
    # that outruns its KV pool falls back to the adaptive fused executor and
    # reports "planned_fallback_fused" here.
    mode: str = "fused"
    # Where the planned executor's shape buckets came from:
    # "explicit" (caller-provided), "history" (PlanHistory of earlier
    # prompts with the same geometry), or "analytic" (pre_plan_length's
    # conservative bound). None for non-planned executors.
    plan_source: Optional[str] = None


class PlanHistory:
    """In-process LRU of observed survivor counts, keyed by prompt geometry.

    A serving deployment tunes its planned-mode shape buckets from recent
    traffic, not from a probe run of the very prompt being served (the
    round-2 bench did the latter — circular). Every successful prefill
    records (post-first-merge survivors, final survivors) under
    (patch_num, n_frames, S_th, cost, r_min, bucket); later prompts with the
    same geometry plan from the MAX observed counts (maxima can only make
    the bucket safer — an unprecedented under-merger still falls back to the
    adaptive executor, slower but never wrong).
    """

    def __init__(self, capacity: int = 64):
        from collections import OrderedDict

        self._stats: "OrderedDict[tuple, tuple[int, int]]" = OrderedDict()
        self._capacity = capacity

    @staticmethod
    def key(patch_num: int, n_frames: int, ff: FrameFusionConfig) -> tuple:
        return (
            patch_num, n_frames,
            round(ff.similarity_lower_bound, 6), round(ff.cost, 6),
            round(ff.ratio_lower_bound, 6), ff.bucket,
        )

    def record(self, key: tuple, n_after_pre: int, n_final: int) -> None:
        prev = self._stats.pop(key, (0, 0))
        self._stats[key] = (max(prev[0], n_after_pre), max(prev[1], n_final))
        while len(self._stats) > self._capacity:
            self._stats.popitem(last=False)

    def suggest(self, key: tuple, bucket: int) -> Optional[tuple[int, int]]:
        """(pre_plan_len, plan_len) buckets, or None if the geometry is new."""
        stats = self._stats.get(key)
        if stats is None:
            return None
        self._stats.move_to_end(key)
        return bucket_length(stats[0], bucket), bucket_length(stats[1], bucket)


class CompressionEngine:
    """FrameFusion compressed prefill + decode for a Qwen2-family stack."""

    def __init__(
        self,
        params: dict,
        cfg: LLMConfig,
        ff: FrameFusionConfig,
        *,
        attn_impl: str = "chunked",
        pool_layers: int = 8,
        compact_pre_event="auto",
        tail_w8a8: bool = False,
    ):
        self.params = params
        self.cfg = cfg
        self.ff = ff
        self.attn_impl = attn_impl
        # KV-pool depth per fused-phase dispatch; the phase re-dispatches with
        # a fresh pool in the (rare) case compression runs deeper than this.
        self.pool_layers = min(pool_layers, cfg.num_layers)
        # Hybrid: handle the layer-0 pre-attention merge segmented-style and
        # compact before the fused phase, so every phase layer runs at the
        # post-first-merge bucket (usually the largest shrink). Saves
        # ~2x half-a-layer of full-length compute per prefill at the cost of
        # one extra mid-prefill host sync — a win on directly-attached hosts
        # (sync ~0.3 ms), a loss through high-latency relays (measured +65 ms
        # on this runner). Default "auto" (VERDICT r4 item 7): measure the
        # device->host round trip once and enable only when it is cheap
        # (<5 ms — true on attached hosts, never through this relay).
        # Decisions are identical either way (it IS the segmented merge
        # event; pinned by test_engine::test_hybrid_pre_event_compaction).
        self.compact_pre_event = compact_pre_event
        self._sync_cost_s: Optional[float] = None
        # Research introspection: record each merge event's similarity vector
        # into telemetry (reference ``model.similarities``).
        self.debug_similarities = False
        # Survivor-count stats from completed prefills; feeds planned-mode
        # bucket selection for later same-geometry prompts (plan_source
        # "history").
        self.plan_history = PlanHistory()
        # W8A8 tail: run the post-compression tail's matmuls int8 x int8 on
        # the MXU (~1.5x at v5e; models/qwen2.mm docstring). Requires
        # int8-quantized params (ops/quant.quantize_params_int8); every
        # merge/prune decision happens BEFORE the tail, so this perturbs
        # logits only (solo executors; the batched tail stays weight-only).
        self.tail_w8a8 = tail_w8a8
        # Planned-prefill dispatch granularity (decisions identical in all
        # three — same traced subgraphs; pinned by
        # test_engine::test_planned_dispatch_modes_match):
        #   "staged" (default): five chained dispatches, one per stage. The
        #     relay queues them back-to-back (device-side cost identical to
        #     the fused forms), and the control vector materialises after the
        #     PHASE dispatch, so its host read overlaps the tail — measured
        #     343-355 ms, tied-or-better vs "split" and 75-90 ms better than
        #     "one" through this relay.
        #   "split": TWO programs — front (pre-event+phase, control out)
        #     then back (compact+tail+pack fused). Same read-overlap
        #     property; XLA fuses the compaction gather into the tail but it
        #     measured a wash (353-355 ms).
        #   "one": the whole critical path as ONE program — for directly-
        #     attached hosts (sub-ms reads) where dispatch round trips, not
        #     read landing, dominate; through this relay the control read
        #     can only land after the ENTIRE program finishes (+75-90 ms).
        # Env override: FF_PLANNED_DISPATCH=staged|split|one.
        self.planned_dispatch = os.environ.get("FF_PLANNED_DISPATCH", "staged")

    # -- prefill -----------------------------------------------------------

    def _use_pre_compact(self) -> bool:
        """Resolve ``compact_pre_event``: True/False pass through; "auto"
        measures the device->host scalar round trip ONCE (warm read then a
        timed read of a distinct tiny dispatch) and enables the hybrid only
        when a mid-prefill sync is cheap (<5 ms: attached hosts ~0.3 ms,
        this relay 35-75+ ms)."""
        if self.compact_pre_event != "auto":
            return bool(self.compact_pre_event)
        if self._sync_cost_s is None:
            import time as _time

            x = jnp.zeros((4,), jnp.float32)
            float(jnp.sum(x))  # warm: compile + drain the queue
            t0 = _time.perf_counter()
            float(jnp.sum(x + jnp.float32(1.0)))  # distinct dispatch (no elision)
            self._sync_cost_s = _time.perf_counter() - t0
        return self._sync_cost_s < 0.005

    def _record_plan_stats(self, patch_num: int, patch_type, telemetry) -> None:
        """Feed PlanHistory from a finished prefill's telemetry."""
        if telemetry is None or not telemetry.events:
            return
        frame_tok = int(np.sum(np.asarray(patch_type) != TEXT_TOKEN))
        if patch_num <= 0 or not frame_tok or frame_tok % patch_num:
            return
        ev0 = telemetry.events[0]
        n_after_pre = (
            ev0.tokens_after if ev0.layer == -1 else telemetry.original_length
        )
        self.plan_history.record(
            PlanHistory.key(patch_num, frame_tok // patch_num, self.ff),
            n_after_pre, telemetry.final_length,
        )

    @staticmethod
    def _mrope_decode_base(position_ids) -> Optional[int]:
        """First decode rotary position for the mRoPE (Qwen2-VL) family.

        The reference's patched wrapper decodes at ``cache_position +
        rope_deltas`` (qwenvl/modeling_qwen2_vl.py:141-163): HF generate's
        ``cache_position`` advances from the ORIGINAL prompt length, and
        ``rope_deltas = max(prefill positions) + 1 - original_length``, so
        the first decoded token's rotary position is ``max(positions) + 1``
        regardless of compression (compression only drops vision tokens,
        whose positions never exceed the text tail's). The 1D families
        instead derive decode positions from DynamicCache.get_seq_length()
        — the compressed layer-0 cache length (cache_position is None in
        the LLaVA-package call chain, modeling_qwen2.py:248-254) — signalled
        here by returning None.
        """
        arr = np.asarray(position_ids)
        if arr.ndim == 2 and arr.shape[0] == 3:
            return int(arr.max()) + 1
        return None

    def _prep_inputs(self, input_embeds, patch_type, position_ids):
        """Pad (embeds, patch_type, positions) to the initial bucket."""
        cfg, ff = self.cfg, self.ff
        orig_len = int(input_embeds.shape[0])
        pos_tok = (
            jnp.asarray(position_ids).reshape(1, -1).T
            if jnp.asarray(position_ids).ndim == 1
            else jnp.asarray(position_ids).T
        ).astype(jnp.int32)  # (S, P)
        s_b = bucket_length(orig_len, ff.bucket)
        pad = s_b - orig_len
        h = jnp.pad(jnp.asarray(input_embeds, cfg.dtype), ((0, pad), (0, 0)))
        pt = jnp.pad(jnp.asarray(patch_type, jnp.int32), (0, pad), constant_values=PAD_TOKEN)
        pos_tok = jnp.pad(pos_tok, ((0, pad), (0, 0)))
        return h, pt, pos_tok, orig_len

    def prefill(
        self,
        input_embeds,
        patch_type,
        position_ids,
        patch_num: int,
        image_token_start: int,
        image_token_length: int,
        mode: str = "fused",
    ) -> PrefillResult:
        """Run the compressed prefill.

        Args:
            input_embeds: (S, D) fused text+vision embeddings.
            patch_type: (S,) int32 patch ids / sentinels.
            position_ids: (S,) int32 or (3, S) for mRoPE.
            patch_num: spatial patches per frame.
            image_token_start: first image-token index.
            image_token_length: number of image tokens at S.
            mode: "fused" (single-program phase, one host sync),
                "planned" (sync-free serving path, static plan bucket),
                "segmented" (per-layer programs, one sync per merge event), or
                "auto" (serving policy: planned from PlanHistory once this
                prompt geometry has been seen; a never-seen geometry rides
                ``prefill_measured`` — the similarity pre-pass costs one
                cheap scalar sync and buys near-history buckets, vs the
                fused executor's one sync with every phase layer at FULL S
                and the analytic plan's ~2x over-provisioned tail).
        """
        if mode == "auto":
            frame_tok = int(np.sum(np.asarray(patch_type) != TEXT_TOKEN))
            suggestion = None
            if patch_num > 0 and frame_tok and frame_tok % patch_num == 0:
                suggestion = self.plan_history.suggest(
                    PlanHistory.key(patch_num, frame_tok // patch_num, self.ff),
                    self.ff.bucket,
                )
            if suggestion is None:
                return self.prefill_measured(
                    input_embeds, patch_type, position_ids, patch_num,
                    image_token_start, image_token_length,
                )
            # prefill_planned re-derives the same suggestion and labels the
            # result plan_source="history".
            return self.prefill_planned(
                input_embeds, patch_type, position_ids, patch_num,
                image_token_start, image_token_length,
            )
        if mode == "measured":
            return self.prefill_measured(
                input_embeds, patch_type, position_ids, patch_num,
                image_token_start, image_token_length,
            )
        if mode == "dense":
            # Uncompressed passthrough: lets compression-agnostic callers
            # (e.g. a ServingLoop A/B baseline) ride the same entry point.
            return self.dense_prefill(input_embeds, position_ids)
        if mode == "fused":
            return self._prefill_fused(
                input_embeds, patch_type, position_ids, patch_num,
                image_token_start, image_token_length,
            )
        if mode == "planned":
            # No explicit buckets: prefill_planned resolves them itself —
            # survivor-count history when this geometry has been seen, else
            # the measured similarity pre-pass (one scalar sync; never the
            # ~2x over-provisioned analytic tail bound).
            return self.prefill_planned(
                input_embeds, patch_type, position_ids, patch_num,
                image_token_start, image_token_length,
            )
        assert mode == "segmented", mode
        return self._prefill_segmented(
            input_embeds, patch_type, position_ids, patch_num,
            image_token_start, image_token_length,
        )

    def prefill_measured(
        self, input_embeds, patch_type, position_ids, patch_num: int,
        image_token_start: int, image_token_length: int,
    ) -> PrefillResult:
        """Cold-start planned prefill: measure, then plan.

        A similarity pre-pass on the RAW input embeddings (O(S*D) — no
        weights, no attention; it is the same scoring the layer "-1" merge
        event will run, reference main.py:104-139 fires that merge
        pre-attention) plus ONE scalar host read yields the exact
        first-merge count before any shape bucket is chosen. From it,
        ``plan_length_measured`` derives an EXACT post-first-merge bucket
        and a provably-sufficient final bucket, so a never-seen prompt
        geometry runs the same two-stage planned program a history-warmed
        prompt would — no probe run, no PlanHistory required. Total host
        round-trips: one cheap scalar (the fused executor also pays one
        sync, but with every phase layer at full S and a ~100-float
        transfer).

        Decision parity: the pre-pass only sizes buckets; every actual
        merge/prune decision is re-made by the planned executor's device
        programs, so events match the fused executor bit-for-bit (pinned in
        tests/test_engine.py). An fp32 near-tie that makes the real count
        exceed the measured plan falls back to the adaptive executor —
        slower, never wrong.
        """
        ff = self.ff
        frame_tok0 = int(np.sum(np.asarray(patch_type) != TEXT_TOKEN))
        if patch_num <= 0 or frame_tok0 == 0:
            res = self._prefill_fused(
                input_embeds, patch_type, position_ids, patch_num,
                image_token_start, image_token_length,
            )
            res.plan_source = "cold"
            return res
        h, pt, _, orig_len = self._prep_inputs(input_embeds, patch_type, position_ids)
        _, _, count = _sim_program(
            h, pt, jnp.int32(orig_len), jnp.float32(ff.similarity_lower_bound),
            patch_num=patch_num,
        )
        count = int(np.asarray(count))  # the one host read
        pre_plan_len, plan_len = plan_length_measured(orig_len, frame_tok0, count, ff)
        res = self.prefill_planned(
            input_embeds, patch_type, position_ids, patch_num,
            image_token_start, image_token_length,
            plan_len=plan_len, pre_plan_len=pre_plan_len,
        )
        res.plan_source = "measured"
        return res

    def _prefill_fused(
        self, input_embeds, patch_type, position_ids, patch_num: int,
        image_token_start: int, image_token_length: int,
    ) -> PrefillResult:
        cfg, ff = self.cfg, self.ff
        h, pt, pos_tok, orig_len = self._prep_inputs(input_embeds, patch_type, position_ids)
        s_b = h.shape[0]
        telemetry = PrefillTelemetry(original_length=orig_len, image_token_length=image_token_length)

        live = jnp.arange(s_b, dtype=jnp.int32) < orig_len
        frame_tok0 = int(np.sum(np.asarray(patch_type) != TEXT_TOKEN))
        max_events = ff.schedule_num_layers
        common = dict(
            cfg=cfg, attn_impl=self.attn_impl, capture_num=ff.num_importance_queries,
            patch_num=patch_num, max_events=max_events, pool_layers=self.pool_layers,
            schedule_num_layers=ff.schedule_num_layers,
            collect_similarities=self.debug_similarities,
        )

        # Hybrid pre-event compaction: the layer-0 pre-attention merge is
        # typically the largest single event (no attention has mixed frames
        # yet), so handling it segmented-style — score, ONE whole-array count
        # read, merge+compact to the smaller bucket — lets every phase layer
        # run compacted. The extra sync transfers ~a hundred floats (cheap);
        # the decision logic is identical (it IS the segmented merge event).
        valid = orig_len
        frame_tok_host = frame_tok0
        sparsity_host: list[float] = []
        sim_logs: list = []
        finish_m = finish_p = False
        include_pre = True
        if frame_tok0 > 0 and patch_num > 0 and self._use_pre_compact():
            sim, order, count = _sim_program(
                h, pt, jnp.int32(valid), jnp.float32(ff.similarity_lower_bound),
                patch_num=patch_num,
            )
            count = int(np.asarray(count))
            budget = compute_pruning_ratio(sparsity_host, ff.cost, ff.schedule_num_layers)
            above_ratio = count / frame_tok_host
            if above_ratio < budget:
                k_marked, kind = count, "merge"
                sparsity_host.append(above_ratio)
                if above_ratio < ff.ratio_lower_bound:
                    finish_m = True
            else:
                k_marked = int(np.float32(budget) * np.float32(frame_tok_host))
                finish_m = finish_p = True
                kind = "merge_capped"
            new_valid = valid - k_marked
            new_len = bucket_length(new_valid, ff.bucket)
            h, pos_tok, pt = _merge_compact_program(
                self.params, jnp.int32(0), h, sim, order, jnp.int32(k_marked),
                pos_tok, pt, jnp.int32(new_valid), cfg=cfg, new_len=new_len, do_mlp=False,
            )
            telemetry.events.append(CompressionEvent(
                layer=-1, kind=kind, tokens_removed=k_marked, tokens_after=new_valid,
                above_ratio=above_ratio, budget=budget, bucket=new_len,
            ))
            if self.debug_similarities:
                # keep similarities aligned 1:1 with telemetry.events — the
                # phase program only logs ITS events, not this host-side one
                sim_logs.append(np.asarray(sim))
            valid = new_valid
            frame_tok_host -= k_marked
            s_b = new_len
            live = jnp.arange(s_b, dtype=jnp.int32) < valid
            include_pre = False

        st = None
        pools = []  # (start_layer, k_pool, v_pool, cache_live)
        # Event log accumulated ACROSS phase dispatches: each _phase_program
        # call starts a fresh on-device ev_* log, so when compression spans
        # more layers than pool_layers the earlier dispatches' events must be
        # merged host-side — per-layer cache lengths and telemetry both
        # derive from the full log.
        ev_rows: list[tuple] = []  # (layer, kind, removed, ratio, budget)
        start_layer = 0
        n_live = jnp.int32(valid)
        frame_tok = jnp.int32(frame_tok_host)
        sparsity = jnp.zeros((max_events,), jnp.float32)
        sparsity = sparsity.at[: len(sparsity_host)].set(jnp.asarray(sparsity_host, jnp.float32)) if sparsity_host else sparsity
        n_events = jnp.int32(len(sparsity_host))
        fm = jnp.bool_(finish_m)
        fp = jnp.bool_(finish_p)
        while True:
            st = _phase_program(
                self.params, h, pos_tok, pt, live, n_live, frame_tok,
                jnp.int32(orig_len), jnp.int32(valid), jnp.int32(image_token_start),
                jnp.int32(image_token_length), sparsity, n_events, fm, fp,
                jnp.int32(start_layer), jnp.float32(ff.cost),
                jnp.float32(ff.similarity_lower_bound), jnp.float32(ff.ratio_lower_bound),
                include_pre_event=(start_layer == 0 and include_pre), **common,
            )
            pools.append((start_layer, st["k_pool"], st["v_pool"], st["cache_live"]))
            # THE host sync: the packed control vector, one transfer.
            packed = np.asarray(st["control"])
            n_ev_slots = max_events + 2
            ctl = {
                "layer": packed[0], "fm": packed[1], "fp": packed[2],
                "n_live": packed[3], "infeasible": packed[4], "ev_n": packed[5],
                "n_events": packed[6],
            }
            off = 7
            ctl["sparsity"] = packed[off : off + max_events]; off += max_events
            for name in ("ev_layer", "ev_kind", "ev_removed", "ev_ratio", "ev_budget"):
                ctl[name] = packed[off : off + n_ev_slots]; off += n_ev_slots
            n_ev_d = int(ctl["ev_n"])
            for i in range(n_ev_d):
                ev_rows.append((
                    int(ctl["ev_layer"][i]), int(ctl["ev_kind"][i]),
                    int(ctl["ev_removed"][i]), float(ctl["ev_ratio"][i]),
                    float(ctl["ev_budget"][i]),
                ))
            if self.debug_similarities:
                sim_logs += [np.asarray(st["sim_log"][i]) for i in range(n_ev_d)]
            layer_end = int(ctl["layer"])
            finished = bool(ctl["fm"]) and bool(ctl["fp"])
            if finished or layer_end >= cfg.num_layers:
                break
            # Pool exhausted with compression still active: continue mid-stack.
            h, live = st["h"], st["live"]
            n_live, frame_tok = st["n_live"], st["frame_tok"]
            sparsity, n_events, fm, fp = st["sparsity"], st["n_events"], st["fm"], st["fp"]
            start_layer = layer_end

        if bool(ctl["infeasible"]):
            raise CostInfeasibleError("The cost is too small")

        n_live_final = int(ctl["n_live"])
        kind_names = {EV_MERGE: "merge", EV_MERGE_CAPPED: "merge_capped", EV_PRUNE: "prune"}
        # Device events start from the post-pre-event count (== orig_len
        # unless the hybrid pre-compaction already removed tokens).
        tokens_after = valid
        for lay, kind, removed, ratio, budget in ev_rows:
            tokens_after -= removed
            telemetry.events.append(
                CompressionEvent(
                    layer=lay, kind=kind_names[kind],
                    tokens_removed=removed, tokens_after=tokens_after,
                    above_ratio=ratio if ratio >= 0 else None,
                    budget=budget, bucket=s_b,
                )
            )
        telemetry.sparsity_list = [float(x) for x in ctl["sparsity"][: int(ctl["n_events"])]]
        if self.debug_similarities:
            telemetry.similarities = sim_logs

        # Single compaction to the compressed bucket, then the fori_loop tail.
        s_small = bucket_length(n_live_final, ff.bucket)
        h2, pos2, pt2 = _compact_state_program(
            st["h"], pos_tok, pt, st["live"], jnp.int32(n_live_final), new_len=s_small
        )
        logits, k_tail, v_tail = _tail_program(
            self.params, jnp.int32(layer_end), h2, pos2, jnp.int32(n_live_final),
            cfg=cfg, attn_impl=self.attn_impl, w8a8=self.tail_w8a8,
        )

        # Per-layer cache lengths come from the event log (no extra sync):
        # layer l's cache holds the tokens live at its attention time, i.e.
        # original length minus removals from all events strictly before l
        # (a merge/prune event at layer l fires post-attention; the hybrid
        # pre-event removal is accounted separately).
        def phase_cache_len(l: int) -> int:
            return valid - sum(r for lay, _, r, _, _ in ev_rows if lay < l)

        layer_caches: list = [None] * cfg.num_layers
        for pool_start, k_pool, v_pool, cache_live in pools:
            k_packed, v_packed, _ = _pack_caches_program(k_pool, v_pool, cache_live)
            for i in range(self.pool_layers):
                l = pool_start + i
                if l < layer_end and layer_caches[l] is None:
                    layer_caches[l] = (k_packed[i], v_packed[i], phase_cache_len(l))
        for j in range(layer_end, cfg.num_layers):
            layer_caches[j] = (k_tail[j], v_tail[j], n_live_final)

        telemetry.final_length = n_live_final
        telemetry.final_image_tokens = image_token_length - (orig_len - n_live_final)
        telemetry.tail_start_layer = layer_end
        result = PrefillResult(
            logits=logits,
            layer_caches=layer_caches,
            valid_len=n_live_final,
            decode_pos_base=self._mrope_decode_base(position_ids) or layer_caches[0][2],
            telemetry=telemetry,
            pos_dims=pos_tok.shape[1],
        )
        self._record_plan_stats(patch_num, patch_type, telemetry)
        return result

    def prefill_planned(
        self,
        input_embeds,
        patch_type,
        position_ids,
        patch_num: int,
        image_token_start: int,
        image_token_length: int,
        plan_len: Optional[int] = None,
        pre_plan_len: Optional[int] = None,
    ) -> PrefillResult:
        """Sync-free compressed prefill for serving pipelines: [pre-event
        merge + compaction to a STATIC pre-plan bucket +] phase + compaction
        to a STATIC plan bucket + tail, composed into device-side dispatches
        with no host read on the critical path (logits are computable without
        any host decision). The control reads happen afterwards, for
        telemetry/caches, overlapping the tail.

        ``plan_len`` defaults to the full input bucket (always sufficient;
        the tail then runs at the uncompressed bucket length, trading tail
        FLOPs for zero adaptivity). Pass a tighter plan (e.g. from
        ``plan_length``) to recover the compressed-tail speed.

        ``pre_plan_len`` (e.g. from ``pre_plan_length``) additionally runs
        the layer-0 pre-attention merge as its own device program and
        compacts to that bucket BEFORE the phase — every phase layer then
        runs at the post-first-merge length instead of full S, still with
        zero host reads (the sync-free twin of ``compact_pre_event``).

        If any actual survivor count exceeds its plan bucket, or the phase
        exits with compression unfinished, this falls back to the fused
        adaptive path (result.mode == "planned_fallback_fused").
        """
        cfg, ff = self.cfg, self.ff
        h, pt, pos_tok, orig_len = self._prep_inputs(input_embeds, patch_type, position_ids)
        s_b = h.shape[0]
        plan_was_none = plan_len is None
        plan_len = s_b if plan_len is None else max(plan_len, ff.bucket)
        telemetry = PrefillTelemetry(original_length=orig_len, image_token_length=image_token_length)

        frame_tok0 = int(np.sum(np.asarray(patch_type) != TEXT_TOKEN))

        # Bucket selection when the caller gives none: survivor-count history
        # of earlier same-geometry prompts first (the way a deployment tunes
        # from recent traffic), else the measured similarity pre-pass (one
        # scalar sync, exact first-merge bucket). Either way a too-tight
        # bucket falls back to the adaptive executor — slower, never wrong.
        plan_source = "explicit"
        if pre_plan_len is None:
            suggestion = None
            if patch_num > 0 and frame_tok0 and frame_tok0 % patch_num == 0:
                suggestion = self.plan_history.suggest(
                    PlanHistory.key(patch_num, frame_tok0 // patch_num, ff), ff.bucket
                )
            if suggestion is not None:
                pre_plan_len, hist_plan = suggestion
                if plan_was_none:
                    plan_len = hist_plan
                plan_source = "history"
            elif patch_num > 0 and frame_tok0 > 0:
                # No history for this geometry: measure the exact first-merge
                # count with the similarity pre-pass (one cheap scalar host
                # read; the layer "-1" merge is a pure function of the raw
                # embeddings, reference main.py:104-139) and derive both
                # buckets from it — the analytic bound over-provisioned the
                # tail ~2x at the 64f headline geometry (VERDICT r4 weak #6).
                _, _, count = _sim_program(
                    h, pt, jnp.int32(orig_len),
                    jnp.float32(ff.similarity_lower_bound), patch_num=patch_num,
                )
                pre_plan_len, measured_plan = plan_length_measured(
                    orig_len, frame_tok0, int(np.asarray(count)), ff
                )
                if plan_was_none:
                    plan_len = measured_plan
                plan_source = "measured"
            else:
                # Promptless geometry (no frame tokens): nothing to measure —
                # the analytic bounds degenerate to the input bucket.
                pre_plan_len = pre_plan_length(orig_len, frame_tok0, ff)
                if plan_was_none:
                    plan_len = plan_length_analytic(orig_len, frame_tok0, ff)
                plan_source = "analytic"

        max_events = ff.schedule_num_layers
        phase_common = dict(
            cfg=cfg, attn_impl=self.attn_impl, capture_num=ff.num_importance_queries,
            patch_num=patch_num, max_events=max_events,
            pool_layers=min(self.pool_layers, cfg.num_layers),
            schedule_num_layers=ff.schedule_num_layers,
        )

        def fallback():
            res = self._prefill_fused(
                input_embeds, patch_type, position_ids, patch_num,
                image_token_start, image_token_length,
            )
            res.mode = "planned_fallback_fused"
            res.plan_source = plan_source
            return res

        pre_ctl = None
        two_stage = pre_plan_len is not None and ff.bucket <= pre_plan_len < s_b
        if two_stage:
            # The phase runs at the pre-plan bucket; survivors only shrink
            # from there, so the final compaction never needs to be larger.
            plan_len = min(plan_len, pre_plan_len)
        budget0 = compute_pruning_ratio([], ff.cost, ff.schedule_num_layers)
        if self.planned_dispatch == "one":
            (logits, k_tail, v_tail, k_packed, v_packed, control_dev,
             pre_ctl_dev) = _planned_pipeline_program(
                self.params, h, pos_tok, pt, jnp.int32(orig_len),
                jnp.int32(frame_tok0), jnp.float32(budget0),
                jnp.int32(image_token_start), jnp.int32(image_token_length),
                jnp.float32(ff.cost), jnp.float32(ff.similarity_lower_bound),
                jnp.float32(ff.ratio_lower_bound),
                pre_plan_len=pre_plan_len if two_stage else 0,
                plan_len=plan_len, two_stage=two_stage, w8a8=self.tail_w8a8,
                **phase_common,
            )
        else:
            split = self.planned_dispatch == "split"
            if two_stage and split:
                st, pos_for_compact, pt_for_compact, pre_ctl_dev = _planned_front_program(
                    self.params, h, pos_tok, pt, jnp.int32(orig_len),
                    jnp.int32(frame_tok0), jnp.float32(budget0),
                    jnp.int32(image_token_start), jnp.int32(image_token_length),
                    jnp.float32(ff.cost), jnp.float32(ff.similarity_lower_bound),
                    jnp.float32(ff.ratio_lower_bound),
                    pre_plan_len=pre_plan_len, **phase_common,
                )
            elif two_stage:
                (h1, pos1, pt1, n_live_d, frame_tok_d, sparsity_d, n_events_d,
                 fm_d, fp_d, pre_ctl_dev) = _pre_event_program(
                    h, pos_tok, pt, jnp.int32(orig_len), jnp.int32(frame_tok0),
                    jnp.float32(budget0), jnp.float32(ff.similarity_lower_bound),
                    jnp.float32(ff.ratio_lower_bound),
                    patch_num=patch_num, max_events=max_events,
                    schedule_num_layers=ff.schedule_num_layers, plan_len=pre_plan_len,
                )
                live1 = jnp.arange(pre_plan_len, dtype=jnp.int32) < n_live_d
                st = _phase_program(
                    self.params, h1, pos1, pt1, live1, n_live_d, frame_tok_d,
                    jnp.int32(orig_len), n_live_d, jnp.int32(image_token_start),
                    jnp.int32(image_token_length), sparsity_d, n_events_d, fm_d, fp_d,
                    jnp.int32(0), jnp.float32(ff.cost),
                    jnp.float32(ff.similarity_lower_bound), jnp.float32(ff.ratio_lower_bound),
                    include_pre_event=False, defer_final_mlp=True, **phase_common,
                )
                pos_for_compact, pt_for_compact = pos1, pt1
            else:
                pre_ctl_dev = None
                live = jnp.arange(s_b, dtype=jnp.int32) < orig_len
                st = _phase_program(
                    self.params, h, pos_tok, pt, live, jnp.int32(orig_len),
                    jnp.int32(frame_tok0), jnp.int32(orig_len), jnp.int32(orig_len),
                    jnp.int32(image_token_start),
                    jnp.int32(image_token_length), jnp.zeros((max_events,), jnp.float32),
                    jnp.int32(0), jnp.bool_(False), jnp.bool_(False), jnp.int32(0),
                    jnp.float32(ff.cost), jnp.float32(ff.similarity_lower_bound),
                    jnp.float32(ff.ratio_lower_bound),
                    include_pre_event=True, defer_final_mlp=True, **phase_common,
                )
                pos_for_compact, pt_for_compact = pos_tok, pt

            # Device-side composition: no host values needed below this line.
            # The compression-finishing layer's MLP was deferred by the phase
            # (defer_final_mlp) and runs inside the tail program at the
            # compacted bucket — value-identical, roughly half the rows.
            control_dev = st["control"]
            if split:
                logits, k_tail, v_tail, k_packed, v_packed = _planned_back_program(
                    self.params, st["layer"], st["h"], pos_for_compact,
                    pt_for_compact, st["live"], st["n_live"], st["mlp_pending"],
                    st["k_pool"], st["v_pool"], st["cache_live"],
                    cfg=cfg, attn_impl=self.attn_impl, w8a8=self.tail_w8a8,
                    plan_len=plan_len,
                )
            else:
                h2, pos2, pt2 = _compact_state_program(
                    st["h"], pos_for_compact, pt_for_compact, st["live"], st["n_live"], new_len=plan_len
                )
                logits, k_tail, v_tail = _tail_program(
                    self.params, st["layer"], h2, pos2, st["n_live"], st["mlp_pending"],
                    cfg=cfg, attn_impl=self.attn_impl, w8a8=self.tail_w8a8,
                    with_pending_mlp=True,
                )
                k_packed, v_packed, _ = _pack_caches_program(
                    st["k_pool"], st["v_pool"], st["cache_live"]
                )

        # Post-hoc control reads (telemetry + cache bookkeeping), off the
        # logits' critical path — they overlap the tail's execution.
        kind_names = {EV_MERGE: "merge", EV_MERGE_CAPPED: "merge_capped", EV_PRUNE: "prune"}
        valid = orig_len  # live count entering the phase program
        if two_stage:
            pre_ctl = np.asarray(pre_ctl_dev)
            if bool(pre_ctl[4]):
                # Structurally unreachable today: _pre_event_program hard-
                # codes infeas=False (the empty-sparsity budget L*cost/L >= 0
                # cannot be infeasible). Kept as a defensive check so the
                # control-vector layout stays uniform with the phase program.
                raise CostInfeasibleError("The cost is too small")
            n_after_pre = int(pre_ctl[5])
            if n_after_pre > pre_plan_len:
                return fallback()  # pre-plan too tight: compaction would truncate
            pre_removed = int(pre_ctl[0])
            telemetry.events.append(CompressionEvent(
                layer=-1, kind=kind_names[int(pre_ctl[1])], tokens_removed=pre_removed,
                tokens_after=orig_len - pre_removed, above_ratio=float(pre_ctl[2]),
                budget=float(pre_ctl[3]), bucket=pre_plan_len,
            ))
            valid = n_after_pre

        packed = np.asarray(control_dev)
        n_ev_slots = max_events + 2
        layer_end = int(packed[0])
        n_live_final = int(packed[3])
        if bool(packed[4]):
            raise CostInfeasibleError("The cost is too small")
        finished = bool(packed[1]) and bool(packed[2])
        if n_live_final > plan_len or (not finished and layer_end < cfg.num_layers):
            # Plan too tight, or the phase exhausted its single KV pool with
            # compression unfinished (fm/fp not both set — the remaining
            # merge/prune events would be silently skipped): adaptive fallback.
            return fallback()
        off = 7 + max_events
        ev_layer = packed[off : off + n_ev_slots]
        ev_kind = packed[off + n_ev_slots : off + 2 * n_ev_slots]
        ev_removed = packed[off + 2 * n_ev_slots : off + 3 * n_ev_slots]
        n_ev = int(packed[5])
        tokens_after = valid
        for i in range(n_ev):
            tokens_after -= int(ev_removed[i])
            telemetry.events.append(CompressionEvent(
                layer=int(ev_layer[i]), kind=kind_names[int(ev_kind[i])],
                tokens_removed=int(ev_removed[i]), tokens_after=tokens_after, bucket=plan_len,
            ))
        telemetry.sparsity_list = [float(x) for x in packed[7 : 7 + int(packed[6])]]

        def phase_cache_len(l: int) -> int:
            return valid - int(sum(int(r) for lay, r in zip(ev_layer[:n_ev], ev_removed[:n_ev]) if lay < l))

        layer_caches: list = [None] * cfg.num_layers
        for i in range(min(self.pool_layers, cfg.num_layers)):
            if i < layer_end:
                layer_caches[i] = (k_packed[i], v_packed[i], phase_cache_len(i))
        for j in range(layer_end, cfg.num_layers):
            layer_caches[j] = (k_tail[j], v_tail[j], n_live_final)

        telemetry.final_length = n_live_final
        telemetry.final_image_tokens = image_token_length - (orig_len - n_live_final)
        telemetry.tail_start_layer = layer_end
        self._record_plan_stats(patch_num, patch_type, telemetry)
        return PrefillResult(
            logits=logits, layer_caches=layer_caches, valid_len=n_live_final,
            decode_pos_base=self._mrope_decode_base(position_ids) or layer_caches[0][2],
            telemetry=telemetry,
            pos_dims=pos_tok.shape[1], mode="planned", plan_source=plan_source,
        )

    def prefill_planned_batch(
        self,
        batch,
        patch_num: int,
        plan_len: Optional[int] = None,
        pre_plan_len: Optional[int] = None,
    ) -> list:
        """Batched sync-free compressed prefill: B prompts run through ONE
        batched pre-event program, ONE lockstep-batched phase program
        (shared layer counter, per-sequence event state — see
        _phase_program_batch), ONE batched compaction and ONE batched tail.
        Host syncs for the whole batch: two (pre-event controls + phase
        controls, each one (B, ctl) transfer).

        ``batch``: list of ``(input_embeds, patch_type, position_ids,
        image_token_start, image_token_length)``; prompts share ``patch_num``
        (one model family per batch — the serving norm). Per-sequence
        decisions match each prompt's solo run up to fp numerics: the
        (B, S, D) batched matmuls may reassociate fp32/bf16 reductions
        differently from the solo (S, D) programs, so a sim >= s_th or
        budget-threshold TIE can flip (the same sensitivity documented for
        budget0 in _pre_event_program); parity is pinned exactly on the
        CPU/einsum suite. A sequence whose
        survivor count overflows a plan bucket (or a phase that outruns the
        KV pool) falls back to its own adaptive fused prefill
        (mode="planned_fallback_fused") without disturbing the others. An
        infeasible cost schedule, by contrast, raises CostInfeasibleError
        for the WHOLE batch — it is a configuration error (the solo paths
        raise it too, reference main.py:339-340), not a per-request
        degradation.

        Returns a list of PrefillResult (mode="planned_batch"), ready for
        ``generate_batch``. Beyond the reference's surface — it is bsz==1
        end to end (main.py:203).
        """
        cfg, ff = self.cfg, self.ff
        assert batch, "empty batch"
        preps = [self._prep_inputs(e, pt, pos) for (e, pt, pos, _, _) in batch]
        s_b = max(p[0].shape[0] for p in preps)
        pos_dims = preps[0][2].shape[1]
        assert all(p[2].shape[1] == pos_dims for p in preps), "mixed rope layouts in one batch"

        def pad_to(h, pt, pos_tok):
            pad = s_b - h.shape[0]
            if pad == 0:
                return h, pt, pos_tok
            return (
                jnp.pad(h, ((0, pad), (0, 0))),
                jnp.pad(pt, (0, pad), constant_values=PAD_TOKEN),
                jnp.pad(pos_tok, ((0, pad), (0, 0))),
            )

        padded = [pad_to(h, pt, pos_tok) for (h, pt, pos_tok, _) in preps]
        h_b = jnp.stack([p[0] for p in padded])
        pt_b = jnp.stack([p[1] for p in padded])
        pos_b = jnp.stack([p[2] for p in padded])
        orig_lens = [p[3] for p in preps]
        n_live_b = jnp.asarray(orig_lens, jnp.int32)
        frame_toks = [int(np.sum(np.asarray(pt) != TEXT_TOKEN)) for (_, pt, _, _, _) in batch]
        ftok_b = jnp.asarray(frame_toks, jnp.int32)
        img_start_b = jnp.asarray([b_[3] for b_ in batch], jnp.int32)
        img_len_b = jnp.asarray([b_[4] for b_ in batch], jnp.int32)

        plan_source = "explicit"
        if pre_plan_len is None:
            suggestions = [
                self.plan_history.suggest(
                    PlanHistory.key(patch_num, ft // patch_num, ff), ff.bucket
                ) if patch_num > 0 and ft and ft % patch_num == 0 else None
                for ft in frame_toks
            ]
            if suggestions and all(s is not None for s in suggestions):
                pre_plan_len = max(s[0] for s in suggestions)
                if plan_len is None:
                    plan_len = max(s[1] for s in suggestions)
                plan_source = "history"
            else:
                pre_plan_len = max(
                    pre_plan_length(orig_lens[i], frame_toks[i], ff) for i in range(len(batch))
                )
                plan_source = "analytic"
        pre_plan_len = min(max(pre_plan_len, ff.bucket), s_b)
        plan_len = pre_plan_len if plan_len is None else min(max(plan_len, ff.bucket), pre_plan_len)

        max_events = ff.schedule_num_layers
        budget0 = compute_pruning_ratio([], ff.cost, ff.schedule_num_layers)

        def pre_one(h, pos_tok, pt, nl, ft):
            return _pre_event_program(
                h, pos_tok, pt, nl, ft, jnp.float32(budget0),
                jnp.float32(ff.similarity_lower_bound), jnp.float32(ff.ratio_lower_bound),
                patch_num=patch_num, max_events=max_events,
                schedule_num_layers=ff.schedule_num_layers, plan_len=pre_plan_len,
            )

        (h1, pos1, pt1, n_live_d, frame_tok_d, sparsity_d, n_events_d, fm_d, fp_d,
         pre_ctl_dev) = jax.vmap(pre_one)(h_b, pos_b, pt_b, n_live_b, ftok_b)

        live1 = jnp.arange(pre_plan_len, dtype=jnp.int32)[None, :] < n_live_d[:, None]
        st = _phase_program_batch(
            self.params, h1, pos1, pt1, live1, n_live_d, frame_tok_d,
            n_live_b, n_live_d, img_start_b, img_len_b,
            sparsity_d, n_events_d, fm_d, fp_d,
            jnp.float32(ff.cost), jnp.float32(ff.similarity_lower_bound),
            jnp.float32(ff.ratio_lower_bound),
            cfg=cfg, attn_impl=self.attn_impl, capture_num=ff.num_importance_queries,
            patch_num=patch_num, max_events=max_events,
            pool_layers=min(self.pool_layers, cfg.num_layers),
            schedule_num_layers=ff.schedule_num_layers,
        )

        h2, pos2, pt2 = jax.vmap(
            functools.partial(_compact_state_program, new_len=plan_len)
        )(st["h"], pos1, pt1, st["live"], st["n_live"])
        logits_b, k_tail, v_tail = _tail_program_batch(
            self.params, st["layer"], h2, pos2, st["n_live"], st["mlp_pending"],
            cfg=cfg, attn_impl=self.attn_impl, with_pending_mlp=True,
        )

        # Packed caches for the phase layers, per sequence.
        kp = jnp.moveaxis(st["k_pool"], 1, 0)  # (B, pool, S1, Hk, hd)
        vp = jnp.moveaxis(st["v_pool"], 1, 0)
        cl = jnp.moveaxis(st["cache_live"], 1, 0)
        k_packed_b, v_packed_b, _ = jax.vmap(_pack_caches_program)(kp, vp, cl)

        pre_ctl = np.asarray(pre_ctl_dev)  # (B, 6)
        ctl = np.asarray(st["control"])  # (B, ctl_len)
        n_ev_slots = max_events + 2
        kind_names = {EV_MERGE: "merge", EV_MERGE_CAPPED: "merge_capped", EV_PRUNE: "prune"}
        results = []
        for bi, (embeds, patch_type, position_ids, img_s, img_l) in enumerate(batch):
            packed = ctl[bi]
            if bool(pre_ctl[bi][4]):
                # Pre-event infeasibility is computed on the untruncated
                # state, so it is a real configuration error for the batch
                # (structurally unreachable today — see the solo path).
                raise CostInfeasibleError(f"The cost is too small (batch index {bi})")
            n_after_pre = int(pre_ctl[bi][5])
            if n_after_pre > pre_plan_len:
                # Pre-plan overflow: the lockstep phase ran on a TRUNCATED
                # state for this sequence, so its control vector (including
                # the infeasible flag) is unreliable — fall back BEFORE
                # reading it, mirroring the solo ordering (prefill_planned).
                res = self._prefill_fused(embeds, patch_type, position_ids, patch_num, img_s, img_l)
                res.mode = "planned_fallback_fused"
                res.plan_source = plan_source
                results.append(res)
                continue
            if bool(packed[4]):
                raise CostInfeasibleError(f"The cost is too small (batch index {bi})")
            layer_end = int(packed[0])
            n_live_final = int(packed[3])
            finished = bool(packed[1]) and bool(packed[2])
            if n_live_final > plan_len or (not finished and layer_end < cfg.num_layers):
                res = self._prefill_fused(embeds, patch_type, position_ids, patch_num, img_s, img_l)
                res.mode = "planned_fallback_fused"
                res.plan_source = plan_source
                results.append(res)
                continue

            orig_len = orig_lens[bi]
            telemetry = PrefillTelemetry(original_length=orig_len, image_token_length=img_l)
            pre_removed = int(pre_ctl[bi][0])
            telemetry.events.append(CompressionEvent(
                layer=-1, kind=kind_names[int(pre_ctl[bi][1])], tokens_removed=pre_removed,
                tokens_after=orig_len - pre_removed, above_ratio=float(pre_ctl[bi][2]),
                budget=float(pre_ctl[bi][3]), bucket=pre_plan_len,
            ))
            valid = n_after_pre
            off = 7 + max_events
            ev_layer = packed[off : off + n_ev_slots]
            ev_kind = packed[off + n_ev_slots : off + 2 * n_ev_slots]
            ev_removed = packed[off + 2 * n_ev_slots : off + 3 * n_ev_slots]
            n_ev = int(packed[5])
            tokens_after = valid
            for i in range(n_ev):
                tokens_after -= int(ev_removed[i])
                telemetry.events.append(CompressionEvent(
                    layer=int(ev_layer[i]), kind=kind_names[int(ev_kind[i])],
                    tokens_removed=int(ev_removed[i]), tokens_after=tokens_after,
                    bucket=plan_len,
                ))
            telemetry.sparsity_list = [float(x) for x in packed[7 : 7 + int(packed[6])]]

            def phase_cache_len(l: int, _valid=valid, _ev_layer=ev_layer,
                                _ev_removed=ev_removed, _n_ev=n_ev) -> int:
                return _valid - int(sum(
                    int(r) for lay, r in zip(_ev_layer[:_n_ev], _ev_removed[:_n_ev]) if lay < l
                ))

            layer_caches: list = [None] * cfg.num_layers
            for i in range(min(self.pool_layers, cfg.num_layers)):
                if i < layer_end:
                    layer_caches[i] = (k_packed_b[bi][i], v_packed_b[bi][i], phase_cache_len(i))
            for j in range(layer_end, cfg.num_layers):
                layer_caches[j] = (k_tail[j, bi], v_tail[j, bi], n_live_final)

            telemetry.final_length = n_live_final
            telemetry.final_image_tokens = img_l - (orig_len - n_live_final)
            telemetry.tail_start_layer = layer_end
            self._record_plan_stats(patch_num, patch_type, telemetry)
            results.append(PrefillResult(
                logits=logits_b[bi], layer_caches=layer_caches, valid_len=n_live_final,
                decode_pos_base=self._mrope_decode_base(position_ids) or layer_caches[0][2],
                telemetry=telemetry,
                pos_dims=pos_dims, mode="planned_batch", plan_source=plan_source,
            ))
        return results

    def _prefill_segmented(
        self,
        input_embeds,
        patch_type,
        position_ids,
        patch_num: int,
        image_token_start: int,
        image_token_length: int,
    ) -> PrefillResult:
        cfg, ff = self.cfg, self.ff
        h, pt, pos_tok, orig_len = self._prep_inputs(input_embeds, patch_type, position_ids)
        telemetry = PrefillTelemetry(original_length=orig_len, image_token_length=image_token_length)
        valid = orig_len

        state = SegmentedEventState(ff)
        frame_tok = int(np.sum(np.asarray(patch_type) != TEXT_TOKEN))
        s_th = jnp.float32(ff.similarity_lower_bound)
        layer_caches: list = [None] * cfg.num_layers

        def merge_event(h, pt, pos_tok, valid, frame_tok, scored, layer_idx, do_mlp):
            """One merge event at the current point. Returns updated state.

            ``scored`` is the (sim, order, count) triple produced either by the
            standalone similarity program (layer-0 pre-attention event) or
            fused into the preceding layer-attention program.
            """
            sim, order, count = scored
            k_marked, kind, above_ratio, budget = state.merge_decision(count, frame_tok)

            new_valid = valid - k_marked
            new_len = bucket_length(new_valid, ff.bucket)
            if k_marked > 0 or new_len != h.shape[0] or do_mlp:
                h, pos_tok, pt = _merge_compact_program(
                    self.params, jnp.int32(max(layer_idx, 0)), h, sim, order,
                    jnp.int32(k_marked), pos_tok, pt, jnp.int32(new_valid),
                    cfg=cfg, new_len=new_len, do_mlp=do_mlp,
                )
            telemetry.events.append(
                CompressionEvent(
                    layer=layer_idx, kind=kind, tokens_removed=k_marked,
                    tokens_after=new_valid, above_ratio=above_ratio, budget=budget,
                    bucket=new_len,
                )
            )
            return h, pt, pos_tok, new_valid, frame_tok - k_marked

        # Layer-0 pre-attention merge (reference modeling_qwen2.py:44-47).
        scored = _sim_program(h, pt, jnp.int32(valid), s_th, patch_num=patch_num)
        h, pt, pos_tok, valid, frame_tok = merge_event(
            h, pt, pos_tok, valid, frame_tok, scored, layer_idx=-1, do_mlp=False
        )

        layer = 0
        while layer < cfg.num_layers and not state.done:
            capture = ff.num_importance_queries if (state.finish_merging and not state.finish_pruning) else 0
            need_sim = not state.finish_merging
            h_mid, k, v, sim, order, count, importance = _layer_attn_program(
                self.params, jnp.int32(layer), h, pos_tok, pt, jnp.int32(valid), s_th,
                cfg=cfg, attn_impl=self.attn_impl, capture_num=capture,
                need_sim=need_sim, patch_num=patch_num,
            )
            layer_caches[layer] = (k, v, valid)

            if need_sim:
                h, pt, pos_tok, valid, frame_tok = merge_event(
                    h_mid, pt, pos_tok, valid, frame_tok, (sim, order, count),
                    layer_idx=layer, do_mlp=True,
                )
            else:
                # Prune (reference main.py:61-101): keep top-k image tokens by
                # the captured importance, then run this layer's MLP.
                ratio, cur_img_len, k_keep, removed = state.prune_decision(
                    image_token_length, orig_len, valid
                )
                new_valid = valid - removed
                new_len = bucket_length(new_valid, ff.bucket)
                h, pos_tok, pt = _prune_compact_program(
                    self.params, jnp.int32(layer), h_mid, importance,
                    jnp.int32(image_token_start), jnp.int32(cur_img_len), jnp.int32(k_keep),
                    pos_tok, pt, jnp.int32(valid), jnp.int32(new_valid),
                    cfg=cfg, new_len=new_len,
                )
                telemetry.events.append(
                    CompressionEvent(
                        layer=layer, kind="prune", tokens_removed=removed,
                        tokens_after=new_valid, budget=ratio, bucket=new_len,
                    )
                )
                valid = new_valid
            layer += 1

        # Tail: every remaining layer at the final bucket, one program.
        logits, k_tail, v_tail = _tail_program(
            self.params, jnp.int32(layer), h, pos_tok, jnp.int32(valid),
            cfg=cfg, attn_impl=self.attn_impl, w8a8=self.tail_w8a8,
        )
        for j in range(layer, cfg.num_layers):
            layer_caches[j] = (k_tail[j], v_tail[j], valid)

        telemetry.sparsity_list = list(state.sparsity)
        telemetry.final_length = valid
        telemetry.final_image_tokens = image_token_length - (orig_len - valid)
        telemetry.tail_start_layer = layer
        return PrefillResult(
            logits=logits,
            layer_caches=layer_caches,
            valid_len=valid,
            decode_pos_base=self._mrope_decode_base(position_ids) or layer_caches[0][2],
            telemetry=telemetry,
            pos_dims=pos_tok.shape[1],
            mode="segmented",
        )

    # -- dense path (A/B baseline) ------------------------------------------

    def dense_prefill(self, input_embeds, position_ids) -> PrefillResult:
        pos_tok = (
            jnp.asarray(position_ids).reshape(1, -1).T
            if jnp.asarray(position_ids).ndim == 1
            else jnp.asarray(position_ids).T
        ).astype(jnp.int32)
        logits, k_all, v_all = _dense_prefill_program(
            self.params, jnp.asarray(input_embeds, self.cfg.dtype), pos_tok, self.cfg, self.attn_impl
        )
        s = int(input_embeds.shape[0])
        caches = [(k_all[l], v_all[l], s) for l in range(self.cfg.num_layers)]
        return PrefillResult(
            logits=logits, layer_caches=caches, valid_len=s,
            decode_pos_base=self._mrope_decode_base(position_ids) or s,
            telemetry=None, pos_dims=pos_tok.shape[1], mode="dense",
        )

    # -- decode --------------------------------------------------------------

    def make_decode_state(self, result: PrefillResult, max_new_tokens: int, s_pool: Optional[int] = None):
        """Assemble the ragged per-layer caches into one padded pool."""
        cfg = self.cfg
        max_len = max(c[2] for c in result.layer_caches)
        s_pool = s_pool or bucket_length(max_len + max_new_tokens, self.ff.bucket)
        hd = cfg.head_dim_
        k_pool = jnp.zeros((cfg.num_layers, s_pool, cfg.num_kv_heads, hd), cfg.dtype)
        v_pool = jnp.zeros_like(k_pool)
        lens = []
        for l, (k, v, length) in enumerate(result.layer_caches):
            # Phase-layer caches are bucketed at the full prompt length, which
            # can exceed the pool when the pre-layer-0 merge shrank every
            # layer's valid region below it — slice to the pool (rows past
            # ``length`` are dead padding either way).
            rows = min(k.shape[0], s_pool)
            k_pool = jax.lax.dynamic_update_slice(
                k_pool, k[:rows].astype(cfg.dtype)[None], (l, 0, 0, 0)
            )
            v_pool = jax.lax.dynamic_update_slice(
                v_pool, v[:rows].astype(cfg.dtype)[None], (l, 0, 0, 0)
            )
            lens.append(length)
        cache_lens = jnp.asarray(lens, jnp.int32)
        return k_pool, v_pool, cache_lens

    def generate(
        self,
        result: PrefillResult,
        max_new_tokens: int,
        eos_token_id: Optional[int] = None,
        sampler=None,
        rng_key=None,
    ):
        """Decode loop (greedy by default, or a SamplerConfig). Returns a
        python list of generated token ids.

        Runs the full loop as one on-device scan (single host sync);
        ``eos_token_id`` truncates host-side afterwards — the reference
        generates to length in its timed A/Bs too.
        """
        toks = self.generate_device(result, max_new_tokens, sampler=sampler,
                                    rng_key=rng_key)
        out = [int(t) for t in np.asarray(toks)]
        if eos_token_id is not None and eos_token_id in out:
            out = out[: out.index(eos_token_id) + 1]
        return out

    def generate_device(
        self,
        result: PrefillResult,
        max_new_tokens: int,
        sampler=None,
        rng_key=None,
    ):
        """``generate`` minus the host sync: returns the generated token ids
        as an on-device int32 array of length ``max_new_tokens`` without
        materialising them host-side. Lets callers pipeline/chain decode
        dispatches (serving, dependency-chained timing) and defer the one
        device->host read to wherever they consume the tokens."""
        from ..ops.sampling import SamplerConfig

        cfg = self.cfg
        sampler = sampler or SamplerConfig()
        rng_key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
        k_pool, v_pool, cache_lens = self.make_decode_state(result, max_new_tokens)
        split = best_tail_split(
            [c[2] for c in result.layer_caches], int(k_pool.shape[1]),
            max_new_tokens, self.ff.bucket)
        toks, _, _, _ = _decode_loop(
            self.params, result.logits, k_pool, v_pool, cache_lens,
            jnp.asarray(result.decode_pos_base, jnp.int32), rng_key,
            # mv-jax: streamed-matvec weights + masked-XLA attention on the
            # tail-split view — measured best-or-tied across both decode
            # geometries (kernel_bench --what decodestep r5: 9.55-9.71 ms/step
            # vs 9.61-13.32 for the ragged pallas kernel; the clamped-grid
            # kernel's fixed overhead loses once the split trims dead rows).
            cfg=cfg, attn_impl="mv-jax" if self.attn_impl == "pallas" else "jax",
            n_steps=max_new_tokens - 1, pos_dims=result.pos_dims, sampler=sampler,
            tail_split=split,
        )
        return toks

    def generate_greedy(self, result: PrefillResult, max_new_tokens: int, eos_token_id: Optional[int] = None):
        return self.generate(result, max_new_tokens, eos_token_id=eos_token_id)

    def generate_stream(
        self,
        result: PrefillResult,
        max_new_tokens: int,
        chunk: int = 4,
        eos_token_id: Optional[int] = None,
        sampler=None,
        rng_key=None,
    ):
        """Streaming decode: yields the CUMULATIVE token list after every
        ``chunk`` decoded tokens (one host sync per chunk, pools carried on
        device between chunks). The partial-results surface for UIs/SSE
        endpoints — the reference demo streams partial generations during
        decode (/root/reference/script/demo/llava_video_compare.py:309-331).

        Greedy streams emit exactly ``generate_greedy``'s tokens (pinned in
        tests). Stochastic samplers draw one pre-split key per token, so a
        stream is a valid sample but not bitwise ``generate``'s (which
        splits keys per-dispatch).
        """
        from ..ops.sampling import SamplerConfig, sample_token

        cfg = self.cfg
        sampler = sampler or SamplerConfig()
        rng_key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
        keys = jax.random.split(rng_key, max_new_tokens)
        k_pool, v_pool, cache_lens = self.make_decode_state(result, max_new_tokens)
        split = best_tail_split(
            [c[2] for c in result.layer_caches], int(k_pool.shape[1]),
            max_new_tokens, self.ff.bucket)
        attn = "mv-jax" if self.attn_impl == "pallas" else "jax"
        tok_last = jax.jit(sample_token, static_argnums=(1,))(
            result.logits, sampler, keys[0]
        )
        out: list[int] = [int(np.asarray(tok_last))]
        emitted = 1
        done = eos_token_id is not None and out[-1] == eos_token_id
        if done or emitted >= max_new_tokens:
            yield list(out)
            return
        yield list(out)
        while emitted < max_new_tokens:
            n = min(chunk, max_new_tokens - emitted)
            toks, tok_last, k_pool, v_pool, cache_lens = _decode_chunk(
                self.params, tok_last, k_pool, v_pool, cache_lens,
                jnp.asarray(result.decode_pos_base, jnp.int32),
                jnp.int32(emitted - 1), keys[emitted : emitted + n],
                cfg=cfg, attn_impl=attn, n_steps=n, pos_dims=result.pos_dims,
                sampler=sampler, tail_split=split,
            )
            out += [int(t) for t in np.asarray(toks)]
            emitted += n
            if eos_token_id is not None and eos_token_id in out:
                yield list(out[: out.index(eos_token_id) + 1])
                return
            yield list(out)

    def generate_spec(
        self,
        result: PrefillResult,
        max_new_tokens: int,
        draft_len: int = 4,
        prompt_ids=None,
        eos_token_id: Optional[int] = None,
        return_stats: bool = False,
    ):
        """Greedy decode via speculative draft-and-verify (one jitted
        while_loop; prompt-lookup drafts, exact greedy output — see
        runtime/spec_decode.py). ``prompt_ids`` optionally seeds the lookup
        history with the prompt's text token ids; ``return_stats`` adds a
        dict with macro_steps / acceptance counters."""
        from .spec_decode import generate_spec

        return generate_spec(
            self, result, max_new_tokens, draft_len=draft_len,
            prompt_ids=prompt_ids, eos_token_id=eos_token_id,
            return_stats=return_stats,
        )

    def generate_spec_batch(
        self,
        results: list,
        max_new_tokens: int,
        draft_len: int = 4,
        prompt_ids=None,
        eos_token_id: Optional[int] = None,
        return_stats: bool = False,
    ):
        """Batched speculative greedy decode: per-sequence prompt-lookup
        drafts, all B sequences' K candidate rows verified in ONE weight
        pass per macro step (qwen2.verify_step_batch) — same tokens as
        ``generate_batch`` greedy, fewer weight passes. ``prompt_ids``: list
        of per-sequence text id lists seeding each lookup history."""
        from .spec_decode import generate_spec_batch

        return generate_spec_batch(
            self, results, max_new_tokens, draft_len=draft_len,
            prompt_ids=prompt_ids, eos_token_id=eos_token_id,
            return_stats=return_stats,
        )

    # -- batched serving ------------------------------------------------------

    def generate_batch(
        self,
        results: list,
        max_new_tokens: int,
        eos_token_id: Optional[int] = None,
        sampler=None,
        rng_key=None,
    ):
        """Decode a batch of prefill results in ONE scanned program.

        Prefills run per-sequence (they are MXU-compute-bound — batching
        buys little); decode is HBM-bandwidth-bound on the weights, so this
        shares each step's weight stream across the whole batch for ~B×
        token throughput. The reference cannot express this: its contract is
        bsz==1 end to end (main.py:203 and every embedding hook).

        Per-sequence raggedness (different compressed lengths, per-layer
        cache lengths, decode position bases) is carried as batched arrays;
        all sequences decode ``max_new_tokens`` and are truncated host-side
        at ``eos_token_id``, like the single-sequence loop.

        Returns a list of per-sequence python token lists.
        """
        from ..ops.sampling import SamplerConfig

        assert results, "empty batch"
        pos_dims = results[0].pos_dims
        assert all(r.pos_dims == pos_dims for r in results), "mixed rope layouts in one batch"
        cfg = self.cfg
        sampler = sampler or SamplerConfig()
        rng_key = rng_key if rng_key is not None else jax.random.PRNGKey(0)

        # One pool bucket for the whole batch (static shape across B); the
        # decode region sits at a COMMON offset past every ragged prefix so
        # cache writes stay scatter-free (see qwen2.decode_step_batch).
        # Sequences are written into the batched pools ONE at a time — B
        # per-sequence pools followed by a stack would transiently hold both
        # copies (~1.6 GB at 7B/B=4).
        max_prefix = max(max(c[2] for c in r.layer_caches) for r in results)
        s_pool = bucket_length(max_prefix + max_new_tokens, self.ff.bucket)
        write_pos = s_pool - max_new_tokens
        b = len(results)
        shape = (cfg.num_layers, b, s_pool, cfg.num_kv_heads, cfg.head_dim_)
        k_pools = jnp.zeros(shape, cfg.dtype)
        v_pools = jnp.zeros_like(k_pools)
        lens_cols = []
        for bi, r in enumerate(results):
            k_one, v_one, lens_one = self.make_decode_state(r, max_new_tokens, s_pool=s_pool)
            k_pools = jax.lax.dynamic_update_slice(k_pools, k_one[:, None], (0, bi, 0, 0, 0))
            v_pools = jax.lax.dynamic_update_slice(v_pools, v_one[:, None], (0, bi, 0, 0, 0))
            lens_cols.append(lens_one)
            del k_one, v_one
        cache_lens = jnp.stack(lens_cols, axis=1)  # (L, B)
        first_logits = jnp.stack([r.logits for r in results])
        pos_bases = jnp.asarray([r.decode_pos_base for r in results], jnp.int32)

        split = best_tail_split_batch(
            [[c[2] for c in r.layer_caches] for r in results],
            s_pool, write_pos, self.ff.bucket)
        toks, _, _ = _decode_loop_batch(
            self.params, first_logits, k_pools, v_pools, cache_lens, pos_bases,
            jnp.int32(write_pos), rng_key,
            cfg=cfg, n_steps=max_new_tokens - 1,
            pos_dims=pos_dims, sampler=sampler,
            attn_impl="pallas" if self.attn_impl == "pallas" else "jax",
            tail_split=split,
        )
        rows = np.asarray(toks)
        out = []
        for row in rows:
            ids = [int(t) for t in row]
            if eos_token_id is not None and eos_token_id in ids:
                ids = ids[: ids.index(eos_token_id) + 1]
            out.append(ids)
        return out
