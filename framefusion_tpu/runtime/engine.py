"""Segmented compressed-prefill executor.

This is the TPU-native replacement for the reference's monkey-patched forward
stack (/root/reference/framefusion/main.py:40-140 dispatch inside
models/qwen2/modeling_qwen2.py layer loop). The reference mutates tensor
shapes layer-by-layer — recompile poison under XLA. Here prefill runs as a
small number of jitted programs with *static, bucketed* shapes, orchestrated
by a host loop that reads back exactly one scalar per compression event (the
above-threshold count) to drive the cost schedule and pick the next bucket:

  1. layer-0 pre-attention merge event (reference modeling_qwen2.py:44-47);
  2. per-layer programs while compression is active: fused
     attention(+similarity scoring | +last-rows importance capture), then a
     merge/prune + compact + MLP program at the post-attention point
     (reference modeling_qwen2.py:66-68);
  3. one ``fori_loop`` tail program running every remaining layer at the
     final compressed bucket — where the wall-clock win lives.

Event decisions (threshold-vs-budget branch, ratio bookkeeping, finish flags)
replicate FrameFusion.forward (main.py:104-139) exactly; the per-event
sparsity list and schedule run on the host (core/schedule.py).

All jitted programs are module-level with hashable static arguments, so they
are compiled once per shape bucket and shared across prompts and layers.
"""

from __future__ import annotations

import dataclasses
import functools
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
from ..models import qwen2
from .telemetry import CompressionEvent, PrefillTelemetry


def _round_half_even(x: float) -> int:
    """Python round() semantics (banker's rounding) used by the reference for
    the prune keep-count (main.py:76)."""
    return int(round(x))


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
        h_new = qwen2.layer_mlp(lp, h_new, cfg)
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
    h_new = qwen2.layer_mlp(lp, out["h"], cfg)
    return h_new, out["pos"], out["patch_type"]


@functools.partial(jax.jit, static_argnames=("cfg",))
def _mlp_program(params, layer_idx, h, *, cfg: LLMConfig):
    lp = qwen2.layer_slice(params["layers"], layer_idx)
    return qwen2.layer_mlp(lp, h, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "attn_impl"))
def _tail_program(params, start_layer, h, pos_tok, valid_len, *, cfg: LLMConfig, attn_impl: str):
    cos, sin = qwen2.positions_cos_sin(_pos_axes(pos_tok), cfg)
    h, k_all, v_all = qwen2.run_layers(
        params, h, cos, sin, cfg, start_layer=start_layer, attn_impl=attn_impl
    )
    last = jax.lax.dynamic_slice_in_dim(h, valid_len - 1, 1, axis=0)
    logits = qwen2.final_logits(params, last, cfg)[0]
    return logits, k_all, v_all


@functools.partial(jax.jit, static_argnames=("cfg", "attn_impl"))
def _dense_prefill_program(params, embeds, pos_tok, cfg: LLMConfig, attn_impl: str):
    return qwen2.dense_prefill(params, embeds, _pos_axes(pos_tok), cfg, attn_impl=attn_impl)


_decode_program = jax.jit(qwen2.decode_step, static_argnames=("cfg",))


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


class CompressionEngine:
    """FrameFusion compressed prefill + decode for a Qwen2-family stack."""

    def __init__(
        self,
        params: dict,
        cfg: LLMConfig,
        ff: FrameFusionConfig,
        *,
        attn_impl: str = "chunked",
    ):
        self.params = params
        self.cfg = cfg
        self.ff = ff
        self.attn_impl = attn_impl

    # -- prefill -----------------------------------------------------------

    def prefill(
        self,
        input_embeds,
        patch_type,
        position_ids,
        patch_num: int,
        image_token_start: int,
        image_token_length: int,
    ) -> PrefillResult:
        """Run the compressed prefill.

        Args:
            input_embeds: (S, D) fused text+vision embeddings.
            patch_type: (S,) int32 patch ids / sentinels.
            position_ids: (S,) int32 or (3, S) for mRoPE.
            patch_num: spatial patches per frame.
            image_token_start: first image-token index.
            image_token_length: number of image tokens at S.
        """
        cfg, ff = self.cfg, self.ff
        orig_len = int(input_embeds.shape[0])
        pos_tok = (
            jnp.asarray(position_ids).reshape(1, -1).T
            if jnp.asarray(position_ids).ndim == 1
            else jnp.asarray(position_ids).T
        ).astype(jnp.int32)  # (S, P)

        telemetry = PrefillTelemetry(original_length=orig_len, image_token_length=image_token_length)

        # Pad the initial sequence to its bucket.
        valid = orig_len
        s_b = bucket_length(valid, ff.bucket)
        pad = s_b - valid
        h = jnp.pad(jnp.asarray(input_embeds, cfg.dtype), ((0, pad), (0, 0)))
        pt = jnp.pad(jnp.asarray(patch_type, jnp.int32), (0, pad), constant_values=PAD_TOKEN)
        pos_tok = jnp.pad(pos_tok, ((0, pad), (0, 0)))

        sparsity: list[float] = []
        finish_merging = False
        finish_pruning = False
        frame_tok = int(np.sum(np.asarray(patch_type) != TEXT_TOKEN))
        s_th = jnp.float32(ff.similarity_lower_bound)
        layer_caches: list = [None] * cfg.num_layers

        def merge_event(h, pt, pos_tok, valid, frame_tok, scored, layer_idx, do_mlp):
            """One merge event at the current point. Returns updated state.

            ``scored`` is the (sim, order, count) triple produced either by the
            standalone similarity program (layer-0 pre-attention event) or
            fused into the preceding layer-attention program.
            """
            nonlocal finish_merging, finish_pruning
            budget = compute_pruning_ratio(sparsity, ff.cost, ff.schedule_num_layers)
            sim, order, count = scored
            count = int(count)
            above_ratio = count / frame_tok
            if above_ratio < budget:
                k_marked = count
                sparsity.append(above_ratio)
                kind = "merge"
                if above_ratio < ff.ratio_lower_bound:
                    finish_merging = True
            else:
                k_marked = int(budget * frame_tok)
                finish_merging = True
                finish_pruning = True
                kind = "merge_capped"

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
        while layer < cfg.num_layers and not (finish_merging and finish_pruning):
            capture = ff.num_importance_queries if (finish_merging and not finish_pruning) else 0
            need_sim = not finish_merging
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
                ratio = compute_pruning_ratio(sparsity, ff.cost, ff.schedule_num_layers)
                cur_img_len = image_token_length - (orig_len - valid)
                k_keep = _round_half_even(cur_img_len * (1.0 - ratio))
                removed = cur_img_len - k_keep
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
                finish_pruning = True
            layer += 1

        # Tail: every remaining layer at the final bucket, one program.
        logits, k_tail, v_tail = _tail_program(
            self.params, jnp.int32(layer), h, pos_tok, jnp.int32(valid),
            cfg=cfg, attn_impl=self.attn_impl,
        )
        for j in range(layer, cfg.num_layers):
            layer_caches[j] = (k_tail[j], v_tail[j], valid)

        telemetry.sparsity_list = list(sparsity)
        telemetry.final_length = valid
        telemetry.final_image_tokens = image_token_length - (orig_len - valid)
        telemetry.tail_start_layer = layer
        return PrefillResult(
            logits=logits,
            layer_caches=layer_caches,
            valid_len=valid,
            decode_pos_base=layer_caches[0][2],
            telemetry=telemetry,
            pos_dims=pos_tok.shape[1],
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
            logits=logits, layer_caches=caches, valid_len=s, decode_pos_base=s,
            telemetry=None, pos_dims=pos_tok.shape[1],
        )

    # -- decode --------------------------------------------------------------

    def make_decode_state(self, result: PrefillResult, max_new_tokens: int):
        """Assemble the ragged per-layer caches into one padded pool."""
        cfg = self.cfg
        max_len = max(c[2] for c in result.layer_caches)
        s_pool = bucket_length(max_len + max_new_tokens, self.ff.bucket)
        hd = cfg.head_dim_
        k_pool = jnp.zeros((cfg.num_layers, s_pool, cfg.num_kv_heads, hd), cfg.dtype)
        v_pool = jnp.zeros_like(k_pool)
        lens = []
        for l, (k, v, length) in enumerate(result.layer_caches):
            k_pool = jax.lax.dynamic_update_slice(
                k_pool, k[: k.shape[0]].astype(cfg.dtype)[None], (l, 0, 0, 0)
            )
            v_pool = jax.lax.dynamic_update_slice(
                v_pool, v[: v.shape[0]].astype(cfg.dtype)[None], (l, 0, 0, 0)
            )
            lens.append(length)
        cache_lens = jnp.asarray(lens, jnp.int32)
        return k_pool, v_pool, cache_lens

    def generate_greedy(self, result: PrefillResult, max_new_tokens: int, eos_token_id: Optional[int] = None):
        """Greedy decode loop. Returns a python list of generated token ids."""
        cfg = self.cfg
        k_pool, v_pool, cache_lens = self.make_decode_state(result, max_new_tokens)
        out = []
        tok = int(jnp.argmax(result.logits))
        out.append(tok)
        pos = int(result.decode_pos_base)
        for step in range(max_new_tokens - 1):
            if eos_token_id is not None and tok == eos_token_id:
                break
            te = qwen2.embed(self.params, jnp.asarray(tok, jnp.int32), cfg)
            pos_id = (
                jnp.full((3,), pos + step, jnp.int32)
                if result.pos_dims == 3
                else jnp.asarray(pos + step, jnp.int32)
            )
            logits, k_pool, v_pool, cache_lens = _decode_program(
                self.params, te, pos_id, k_pool, v_pool, cache_lens, cfg=cfg
            )
            tok = int(jnp.argmax(logits))
            out.append(tok)
        return out
