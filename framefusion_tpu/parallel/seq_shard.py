"""Sequence-sharded compressed prefill — the 72B / 256-frame stretch path.

Why: at the stretch config (BASELINE.json configs[4]: Qwen2.5-VL-72B,
256 frames ≈ 46.6k tokens) the phase layers' O(S²) attention dominates and a
single chip's share of a TP-only mesh still sees the FULL sequence. This
module shards the SEQUENCE axis across a ``seq`` mesh axis for the per-layer
compute while keeping the compression DECISIONS replicated — merge/prune
operate on (S,)-sized scores and masks, which are cheap to hold everywhere
(SURVEY §7 "hard parts": merge decisions are global over the sequence).

Design (shard_map, explicit collectives):
  * Each device owns a contiguous row block of the hidden states
    (``P("seq", None)``) and computes q/k/v for its rows; K/V are
    all-gathered per layer (for GQA stacks K+V are Hk/Hq of the activation
    width — 8/64ths at 72B — so the gather moves far less than resharding
    activations would).
  * Causal + validity masking uses each row's GLOBAL position
    (``axis_index("seq")`` offset), so per-shard softmax rows equal the
    unsharded program's.
  * The prune importance capture psums per-shard partial row sums — each
    device contributes the captured rows it owns — reproducing
    ``last_rows_importance`` exactly (rows ``[valid-num, valid)`` of the
    compacted state).
  * Between layers, the EXISTING segmented-executor event programs
    (`_sim_program`, `_merge_compact_program`, `_prune_compact_program`,
    fp32 schedule) run on the global arrays — decisions and event
    trajectories are the engine's own, bit for bit. Event layers are rare
    (≤3 per prefill at the default knobs); their event machinery runs under
    GSPMD rather than shard_map.

Memory at the stretch config (per device; see DEVNOTES for the full
estimate): activations 46.6k x 8192 bf16 = 764 MB replicated-equivalent
shrink to 95 MB/device at seq=8; the per-layer K/V all-gather transient is
2 x 46.6k x 8 x 128 bf16 = 191 MB; attention walks K/V blockwise with an
online softmax, so live fp32 score tensors are (Hk, G, S/n, block_k) —
~1.5 GB per block at the stretch shapes. Parameters ride an orthogonal
``tensor`` axis in a real deployment (this prototype's mesh is 1D ``seq``
— compose with sharding.make_mesh for 2D).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import FrameFusionConfig, LLMConfig
from ..core import bucket_length
from ..core.constants import PAD_TOKEN, TEXT_TOKEN
from ..models import qwen2
from ..runtime.engine import (
    CompressionEvent,
    PrefillTelemetry,
    SegmentedEventState,
    _merge_compact_program,
    _pos_axes,
    _prune_compact_program,
    _sim_program,
)


def make_seq_mesh(devices=None, seq: int | None = None) -> Mesh:
    """1D sequence-parallel mesh (compose with tensor/data meshes for 2D)."""
    devices = jax.devices() if devices is None else devices
    seq = len(devices) if seq is None else seq
    return Mesh(np.asarray(devices[:seq]), ("seq",))


@functools.lru_cache(maxsize=32)
def _sharded_layer_fn(mesh: Mesh, cfg: LLMConfig, do_mlp: bool, capture_num: int,
                      ring: bool = False):
    """One decoder layer, sequence-sharded: local q/k/v, globally-positioned
    causal mask, optional importance capture. Two K/V movement strategies:

    * gather (default): K/V all-gathered per layer, then walked blockwise
      with an online softmax — the live fp32 score tensor is
      (Hk, G, S_local, block_k) (~1.5 GB per block at the stretch shapes
      instead of the ~69 GB a full (S_local, S) materialisation would need).
      The gathered (S, Hk, hd) transient is small under GQA (K+V are Hk/Hq
      of the activation width).
    * ring (``ring=True``): NO gathered transient — each device keeps only
      its own (S/n, Hk, hd) K/V block and the blocks rotate around the
      ``seq`` axis via ``lax.ppermute`` (n-1 neighbor hops on the ICI ring),
      each visit folded into the same online softmax. Peak K/V memory drops
      from S to 2·S/n rows per device, and each hop's transfer overlaps the
      previous block's attention compute — the scaling shape for contexts
      where even the GQA gather is too big. Capture layers (``capture_num >
      0``) keep the gather path: importance needs full-row softmax
      probabilities, which would otherwise need a second online pass.
    """
    n_seq = mesh.shape["seq"]
    hd = cfg.head_dim_
    hk = cfg.num_kv_heads
    g = cfg.num_heads // hk
    scale = jnp.float32(1.0 / hd ** 0.5)
    assert not (ring and capture_num), "ring mode has no importance capture"

    def shard(lp, h_l, cos_l, sin_l, valid_len):
        from ..ops.attention import NEG_INF

        s_local = h_l.shape[0]
        s_full = s_local * n_seq
        q_off = jax.lax.axis_index("seq") * s_local

        x = qwen2.rmsnorm(h_l, lp["ln1"], cfg.rms_norm_eps)
        q, k, v = qwen2._project_qkv(lp, x, cfg)
        q, k = qwen2.apply_rope(q, k, cos_l, sin_l)

        qg = q.reshape(s_local, hk, g, hd).transpose(1, 2, 0, 3)  # (Hk,G,S/n,hd)
        q_pos = q_off + jnp.arange(s_local, dtype=jnp.int32)

        def kv_step(carry, inputs):
            m, l, acc = carry
            k_blk, v_blk, kp = inputs
            s = jnp.einsum("hgsd,htd->hgst", qg, k_blk,
                           preferred_element_type=jnp.float32) * scale
            mask = (kp[None, :] <= q_pos[:, None]) & (kp[None, :] < valid_len)
            s = jnp.where(mask[None, None], s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jnp.einsum("hgst,htd->hgsd", p.astype(v_blk.dtype), v_blk,
                            preferred_element_type=jnp.float32)
            return (m_new, l_new, acc * alpha + pv), None

        m0 = jnp.full((hk, g, s_local, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((hk, g, s_local, 1), jnp.float32)
        acc0 = jnp.zeros((hk, g, s_local, hd), jnp.float32)

        if ring:
            # Rotate the K/V blocks around the seq ring; fold each visiting
            # block (sub-blocked to bound the score transient) into the
            # online softmax. After t hops device i holds the block that
            # started at device (i - t) mod n.
            sub = next(bk for bk in (1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1)
                       if s_local % bk == 0)
            nsub = s_local // sub
            perm = [(i, (i + 1) % n_seq) for i in range(n_seq)]
            my = jax.lax.axis_index("seq")

            def fold(m, l, acc, kc, vc, t):
                blk_off = (jnp.mod(my - t, n_seq) * s_local).astype(jnp.int32)
                kb = kc.reshape(nsub, sub, hk, hd).transpose(0, 2, 1, 3)
                vb = vc.reshape(nsub, sub, hk, hd).transpose(0, 2, 1, 3)
                kp = blk_off + jnp.arange(s_local, dtype=jnp.int32).reshape(nsub, sub)
                (m, l, acc), _ = jax.lax.scan(kv_step, (m, l, acc), (kb, vb, kp))
                return m, l, acc

            def ring_step(carry, t):
                # Fold the currently-held block, THEN rotate: the send can
                # overlap the fold (both only read kc/vc), and the final
                # iteration's rotation is peeled off entirely — n-1 hops
                # total, not n (the last arriving block is folded below,
                # outside the scan, with no rotation after it).
                m, l, acc, kc, vc = carry
                m, l, acc = fold(m, l, acc, kc, vc, t)
                kc = jax.lax.ppermute(kc, "seq", perm)
                vc = jax.lax.ppermute(vc, "seq", perm)
                return (m, l, acc, kc, vc), None

            (m, l, acc, kc, vc), _ = jax.lax.scan(
                ring_step, (m0, l0, acc0, k, v),
                jnp.arange(n_seq - 1, dtype=jnp.int32),
            )
            m, l, acc = fold(m, l, acc, kc, vc, jnp.int32(n_seq - 1))
            k_all = None
        else:
            k_all = jax.lax.all_gather(k, "seq", axis=0, tiled=True)  # (S, Hk, hd)
            v_all = jax.lax.all_gather(v, "seq", axis=0, tiled=True)
            block_k = next(bk for bk in (1024, 512, 256, 128, 64, 32, 16, 8)
                           if s_full % bk == 0)
            nk = s_full // block_k
            kb = k_all.reshape(nk, block_k, hk, hd).transpose(0, 2, 1, 3)
            vb = v_all.reshape(nk, block_k, hk, hd).transpose(0, 2, 1, 3)
            k_pos = jnp.arange(s_full, dtype=jnp.int32).reshape(nk, block_k)
            (m, l, acc), _ = jax.lax.scan(kv_step, (m0, l0, acc0), (kb, vb, k_pos))
        out = acc / jnp.maximum(l, 1e-30)
        out = out.transpose(2, 0, 1, 3).reshape(s_local, cfg.num_heads * hd).astype(h_l.dtype)
        h_mid = h_l + qwen2.mm(out, lp["wo"])

        if capture_num:
            # Importance from the captured rows (global positions
            # [valid-num, valid) of the compacted state): each shard
            # contributes the rows it OWNS — a (num, S) computation, tiny
            # next to the attention — and psum assembles the full
            # last_rows_importance vector.
            row_pos = valid_len - capture_num + jnp.arange(capture_num, dtype=jnp.int32)
            owned = (row_pos >= q_off) & (row_pos < q_off + s_local)
            local_idx = jnp.clip(row_pos - q_off, 0, s_local - 1)
            q_rows = jnp.take(q, local_idx, axis=0).astype(jnp.float32)  # (num,Hq,hd)
            q_rows = q_rows.reshape(capture_num, hk, g, hd).transpose(1, 2, 0, 3)
            s_r = jnp.einsum("hgnd,thd->hgnt", q_rows,
                             k_all.astype(jnp.float32)) * scale  # (Hk,G,num,S)
            kmask = jnp.arange(s_full, dtype=jnp.int32)[None, :] <= row_pos[:, None]
            s_r = jnp.where(kmask[None, None], s_r, NEG_INF)
            probs_r = jax.nn.softmax(s_r, axis=-1).mean(axis=(0, 1))  # (num, S)
            partial = jnp.sum(jnp.where(owned[:, None], probs_r, 0.0), axis=0)
            importance = jax.lax.psum(partial, "seq") / jnp.float32(capture_num)
        else:
            importance = jnp.zeros((s_full,), jnp.float32)

        h_out = qwen2.layer_mlp(lp, h_mid, cfg) if do_mlp else h_mid
        return h_out, importance

    mapped = jax.shard_map(
        shard, mesh=mesh,
        in_specs=(P(), P("seq", None), P("seq", None), P("seq", None), P()),
        out_specs=(P("seq", None), P()),
        check_vma=False,
    )

    @jax.jit
    def prog(params, layer_idx, h, pos_tok, valid_len):
        cos, sin = qwen2.positions_cos_sin(_pos_axes(pos_tok), cfg)
        lp = qwen2.layer_slice(params["layers"], layer_idx)
        return mapped(lp, h, cos.astype(jnp.float32), sin.astype(jnp.float32), valid_len)

    return prog


@functools.partial(jax.jit, static_argnames=("cfg",))
def _logits_at(params, h, idx, *, cfg: LLMConfig):
    last = jax.lax.dynamic_slice_in_dim(h, idx, 1, axis=0)
    return qwen2.final_logits(params, last, cfg)[0]


def seq_sharded_prefill(
    params: dict,
    cfg: LLMConfig,
    ff: FrameFusionConfig,
    input_embeds,
    patch_type,
    position_ids,
    patch_num: int,
    image_token_start: int,
    image_token_length: int,
    mesh: Mesh,
    ring: bool = False,
):
    """Compressed prefill with sequence-sharded layer compute.

    ``ring=True`` rotates K/V blocks around the seq axis via ppermute
    instead of all-gathering them (ring attention) for every layer except
    the rare importance-capture layers — see _sharded_layer_fn.

    Segmented-executor control flow (reference dispatcher semantics,
    main.py:40-140) with every layer's attention+MLP sharded over
    ``mesh["seq"]``; decisions replicated. Returns (logits, telemetry,
    valid_len) — a compute prototype for the stretch config; decode caches
    ride the standard engine paths.
    """
    n_seq = mesh.shape["seq"]
    assert ff.bucket % n_seq == 0, "bucket must divide evenly across the seq axis"
    orig_len = int(input_embeds.shape[0])
    s_b = bucket_length(orig_len, ff.bucket)
    pad = s_b - orig_len

    h = jnp.pad(jnp.asarray(input_embeds, cfg.dtype), ((0, pad), (0, 0)))
    pt = jnp.pad(jnp.asarray(patch_type, jnp.int32), (0, pad), constant_values=PAD_TOKEN)
    pos_tok = (
        jnp.asarray(position_ids).reshape(1, -1).T
        if jnp.asarray(position_ids).ndim == 1
        else jnp.asarray(position_ids).T
    ).astype(jnp.int32)
    pos_tok = jnp.pad(pos_tok, ((0, pad), (0, 0)))

    seq_sharding = NamedSharding(mesh, P("seq", None))
    h = jax.device_put(h, seq_sharding)

    telemetry = PrefillTelemetry(original_length=orig_len, image_token_length=image_token_length)
    valid = orig_len
    frame_tok = int(np.sum(np.asarray(patch_type) != TEXT_TOKEN))
    # ONE decision-arithmetic implementation shared with _prefill_segmented
    # (fp32 schedule twins' lockstep rule) — this module only invokes
    # programs and shards compute.
    state = SegmentedEventState(ff)
    s_th = jnp.float32(ff.similarity_lower_bound)

    def merge_event(h, pt, pos_tok, valid, frame_tok, scored, layer_idx, do_mlp):
        sim, order, count = scored
        k_marked, kind, above_ratio, budget = state.merge_decision(count, frame_tok)

        new_valid = valid - k_marked
        new_len = bucket_length(new_valid, ff.bucket)
        if k_marked > 0 or new_len != h.shape[0] or do_mlp:
            h, pos_tok, pt = _merge_compact_program(
                params, jnp.int32(max(layer_idx, 0)), h, sim, order,
                jnp.int32(k_marked), pos_tok, pt, jnp.int32(new_valid),
                cfg=cfg, new_len=new_len, do_mlp=do_mlp,
            )
            h = jax.device_put(h, seq_sharding)
        telemetry.events.append(CompressionEvent(
            layer=layer_idx, kind=kind, tokens_removed=k_marked,
            tokens_after=new_valid, above_ratio=above_ratio, budget=budget,
            bucket=new_len,
        ))
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
        layer_fn = _sharded_layer_fn(mesh, cfg, do_mlp=False, capture_num=capture,
                                     ring=ring and not capture)
        h_mid, importance = layer_fn(params, jnp.int32(layer), h, pos_tok, jnp.int32(valid))

        if need_sim:
            scored = _sim_program(h_mid, pt, jnp.int32(valid), s_th, patch_num=patch_num)
            h, pt, pos_tok, valid, frame_tok = merge_event(
                h_mid, pt, pos_tok, valid, frame_tok, scored, layer_idx=layer, do_mlp=True,
            )
        else:
            ratio, cur_img_len, k_keep, removed = state.prune_decision(
                image_token_length, orig_len, valid
            )
            new_valid = valid - removed
            new_len = bucket_length(new_valid, ff.bucket)
            h, pos_tok, pt = _prune_compact_program(
                params, jnp.int32(layer), h_mid, importance,
                jnp.int32(image_token_start), jnp.int32(cur_img_len), jnp.int32(k_keep),
                pos_tok, pt, jnp.int32(valid), jnp.int32(new_valid),
                cfg=cfg, new_len=new_len,
            )
            h = jax.device_put(h, seq_sharding)
            telemetry.events.append(CompressionEvent(
                layer=layer, kind="prune", tokens_removed=removed,
                tokens_after=new_valid, budget=ratio, bucket=new_len,
            ))
            valid = new_valid
        layer += 1

    # Tail: remaining layers, still sequence-sharded, at the compacted bucket.
    tail_fn = _sharded_layer_fn(mesh, cfg, do_mlp=True, capture_num=0, ring=ring)
    while layer < cfg.num_layers:
        h, _ = tail_fn(params, jnp.int32(layer), h, pos_tok, jnp.int32(valid))
        layer += 1

    logits = _logits_at(params, h, jnp.int32(valid - 1), cfg=cfg)

    telemetry.sparsity_list = list(state.sparsity)
    telemetry.final_length = valid
    telemetry.final_image_tokens = image_token_length - (orig_len - valid)
    return logits, telemetry, valid
