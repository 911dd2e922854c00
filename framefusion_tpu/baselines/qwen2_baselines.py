"""Paper-comparison baselines: FastV, StreamingLLM, fixed-schedule prefill
merging, merge->FastV, FastV->merge.

Parity surface: the reference's baseline-methods library
(/root/reference/framefusion/models/qwen2/modeling_qwen2_baseline.py and
modeling_qwen2_vl_baseline.py), a sibling experimental surface with its own
``replace_Qwen2_forward(model, mode=...)`` entry points (:45-109) that is NOT
reachable from apply_framefusion.

TPU-native observation: unlike FrameFusion (whose merge counts are
data-dependent), every baseline's compression counts are knowable from config
and prompt shape alone — FastV keeps ``round(L*(1-r))`` image tokens at the
static layer ``k``; the fixed merge schedule removes ``int(s_l * frame_l)``
tokens at layer ``l``; StreamingLLM's sink/window are constants. So each
baseline compiles to exactly ONE sync-free XLA program (dead tokens masked,
one static compaction where the shape actually shrinks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FrameFusionConfig, LLMConfig
from ..core import bucket_length, compact_tokens, mark_topk, order_by_patch, similarity_by_patch
from ..core.merge import apply_merge, apply_merge_weighted, descending_rank
from ..models import qwen2
from ..ops.attention import causal_attention_chunked
from ..ops.rope import apply_rope
from ..runtime.engine import CompressionEngine, PrefillResult, _pack_caches_program, _pos_axes
from ..runtime.telemetry import CompressionEvent, PrefillTelemetry


def _round(x: float) -> int:
    return int(round(x))


def compute_density_overhead(sparsity_list) -> tuple:
    """(normalised cost, remaining density) of a fixed per-layer sparsity
    schedule — the reference's schedule-inspection helper
    (modeling_qwen2_baseline.py:26-43), used when configuring prefill_merge.
    """
    cost = 0.0
    remaining_density = 1.0
    for s in sparsity_list:
        remaining_density *= 1.0 - s
        cost += remaining_density
    return cost / len(sparsity_list), remaining_density


# ---------------------------------------------------------------------------
# FastV (reference modeling_qwen2_baseline.py:221-578): at static layer k,
# prune image tokens by the last query row's head-averaged attention from
# layer k-1, keeping the top round(L*(1-r)).


@functools.partial(jax.jit, static_argnames=("cfg", "attn_impl", "fastv_k", "img_start", "img_len", "keep_img", "new_len", "valid0"))
def _fastv_program(params, h, pos_tok, *, cfg: LLMConfig, attn_impl, fastv_k, img_start, img_len, keep_img, new_len, valid0):
    s = h.shape[0]
    cos, sin = qwen2.positions_cos_sin(_pos_axes(pos_tok), cfg)

    # Layers 0..k-2 dense; layer k-1 also captures the last-row importance
    # (the reference threads layer k-1's full attention probs to layer k,
    # :318-343 — here only the needed row is produced).
    h, k_pre, v_pre = qwen2.run_layers(params, h, cos, sin, cfg, stop_layer=fastv_k - 1, attn_impl=attn_impl)
    lp = qwen2.layer_slice(params["layers"], fastv_k - 1)
    h, kk, vv, importance = qwen2.layer_attention(
        lp, h, cos, sin, cfg, attn_impl=attn_impl, capture_num=1, valid_len=jnp.int32(valid0)
    )
    h = qwen2.layer_mlp(lp, h, cfg)
    k_pre = jax.lax.dynamic_update_index_in_dim(k_pre, kk.astype(cfg.dtype), fastv_k - 1, 0)
    v_pre = jax.lax.dynamic_update_index_in_dim(v_pre, vv.astype(cfg.dtype), fastv_k - 1, 0)

    # Static top-k prune over the image window; keep set sorted (gathered in
    # original order by the stable compaction).
    pos = jnp.arange(s, dtype=jnp.int32)
    in_window = (pos >= img_start) & (pos < img_start + img_len)
    score = jnp.where(in_window, importance, -jnp.inf)
    keep = (~in_window & (pos < valid0)) | (descending_rank(score) < keep_img)
    new_valid = valid0 - img_len + keep_img
    out, _ = compact_tokens(keep, new_len, jnp.int32(new_valid), {"h": h, "pos": pos_tok})
    h2, pos2 = out["h"], out["pos"]

    cos2, sin2 = qwen2.positions_cos_sin(_pos_axes(pos2), cfg)
    h2, k_post, v_post = qwen2.run_layers(params, h2, cos2, sin2, cfg, start_layer=fastv_k, attn_impl=attn_impl)
    logits = qwen2.final_logits(params, h2[new_valid - 1 : new_valid], cfg)[0]
    return logits, k_pre, v_pre, k_post, v_post


# ---------------------------------------------------------------------------
# StreamingLLM (reference :579-859): prefill attention restricted to
# ``init_num`` sink tokens + a trailing window of length_rate*S - init_num;
# decode unchanged (the Qwen2 variant decodes over the full cache, :695-705).


@functools.partial(jax.jit, static_argnames=("cfg", "init_num", "window"))
def _streamingllm_program(params, h, pos_tok, *, cfg: LLMConfig, init_num, window):
    s = h.shape[0]
    cos, sin = qwen2.positions_cos_sin(_pos_axes(pos_tok), cfg)
    hd = cfg.head_dim_
    k_all = jnp.zeros((cfg.num_layers, s, cfg.num_kv_heads, hd), cfg.dtype)
    v_all = jnp.zeros_like(k_all)

    def body(l, carry):
        h, k_all, v_all = carry
        lp = qwen2.layer_slice(params["layers"], l)
        x = qwen2.rmsnorm(h, lp["ln1"], cfg.rms_norm_eps)
        q, k, v = qwen2._project_qkv(lp, x, cfg)
        q, k = apply_rope(q, k, cos, sin)
        attn = causal_attention_chunked(q, k, v, sink=(init_num, window))
        h = h + qwen2.mm(attn.reshape(s, -1), lp["wo"])
        h = qwen2.layer_mlp(lp, h, cfg)
        k_all = jax.lax.dynamic_update_index_in_dim(k_all, k.astype(cfg.dtype), l, 0)
        v_all = jax.lax.dynamic_update_index_in_dim(v_all, v.astype(cfg.dtype), l, 0)
        return h, k_all, v_all

    h, k_all, v_all = jax.lax.fori_loop(0, cfg.num_layers, body, (h, k_all, v_all))
    logits = qwen2.final_logits(params, h[-1:], cfg)[0]
    return logits, k_all, v_all


@functools.partial(jax.jit, static_argnames=("cfg", "init_num", "window"))
def _streamingllm_program_pallas(params, h, pos_tok, *, cfg: LLMConfig, init_num, window):
    """TPU-kernel StreamingLLM prefill: the O(S*window) sink kernel
    (ops/kernels/sink_prefill — the minference.streaming_forward equivalent,
    reference modeling_qwen2_baseline.py:691-705) inside a lax.scan over
    layers. scan stacks the per-layer caches as outputs — carrying
    preallocated (L, S, Hk, hd) stacks through a fori_loop costs real copies
    (measured on the dense path; see bench.py want_caches note)."""
    from ..ops.kernels.sink_prefill import sink_flash_attention

    s = h.shape[0]
    cos, sin = qwen2.positions_cos_sin(_pos_axes(pos_tok), cfg)

    def body(hh, lp):
        x = qwen2.rmsnorm(hh, lp["ln1"], cfg.rms_norm_eps)
        q, k, v = qwen2._project_qkv(lp, x, cfg)
        q, k = apply_rope(q, k, cos, sin)
        attn = sink_flash_attention(q, k, v, init_num, window)
        hh = hh + qwen2.mm(attn.reshape(s, -1), lp["wo"])
        hh = qwen2.layer_mlp(lp, hh, cfg)
        return hh, (k.astype(cfg.dtype), v.astype(cfg.dtype))

    h, (k_all, v_all) = jax.lax.scan(body, h, params["layers"])
    logits = qwen2.final_logits(params, h[-1:], cfg)[0]
    return logits, k_all, v_all


# ---------------------------------------------------------------------------
# Fixed-schedule prefill merging (reference :860-1335): before each layer's
# attention, merge the top int(sparsity_l * frame_tokens_l) most-similar
# adjacent-frame pairs (FrameFusion's merge core with fixed counts). Weighted
# variant carries token mass for merge->FastV (:1598,1714-1731).


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "attn_impl", "patch_num", "weighted", "fastv_k", "keep_img_static",
        "start_layer", "seg_len", "capture",
    ),
)
def _merging_segment_program(
    params, h, pos_tok, patch_type, weights, live, k_seg, n_entry, valid0,
    img_start, img_len,
    *, cfg: LLMConfig, attn_impl, patch_num, weighted: bool, fastv_k: int,
    keep_img_static: int, start_layer: int, seg_len: int, capture: bool,
):
    """One SEGMENT of the fixed-schedule merging stack: layers
    [start_layer, start_layer+seg_len) at the current (compacted) bucket,
    with KV pools sized (seg_len, bucket) instead of the whole stack at full
    S. The fixed schedule makes every removal count static, so the host
    compacts between segments with zero device syncs and per-layer cache
    lengths are known ahead of time — this is the engine's phase-pool +
    compacted-tail memory shape applied to the reference's
    prefill_merge/merge->FastV/FastV->merge family
    (modeling_qwen2_baseline.py:860-1335, :1339-2054, :2055-2618), which this
    executor previously ran as one all-layer full-S program (3.4 GB of pools
    at 7B/64f — round-1 OOM).

    ``n_entry`` is the live count at segment entry (== the last live row's
    index + 1: compaction packs live tokens to the front and trailing text
    never dies), used for the importance-capture rows. ``fastv_k`` is the
    ABSOLUTE layer index of the FastV prune (-1: none).
    """
    s = h.shape[0]
    cos, sin = qwen2.positions_cos_sin(_pos_axes(pos_tok), cfg)
    hd = cfg.head_dim_
    k_pool = jnp.zeros((seg_len, s, cfg.num_kv_heads, hd), cfg.dtype)
    v_pool = jnp.zeros_like(k_pool)
    cache_live = jnp.zeros((seg_len, s), bool)

    def body(i, carry):
        h, live, weights, k_pool, v_pool, cache_live = carry
        l = start_layer + i
        order, n_img = order_by_patch(patch_type, live, patch_num)
        sim = similarity_by_patch(h, patch_type, order, n_img)
        marked = mark_topk(sim, k_seg[i])
        if weighted:
            h, weights, keep = apply_merge_weighted(h, weights, marked, order)
        else:
            h, keep = apply_merge(h, marked, order)
        live = live & keep

        lp = qwen2.layer_slice(params["layers"], jnp.int32(l))
        h, k, v, importance = qwen2.layer_attention(
            lp, h, cos, sin, cfg, attn_impl=attn_impl,
            capture_num=1 if capture else 0, valid_len=n_entry, key_valid=live,
        )
        k_pool = jax.lax.dynamic_update_index_in_dim(k_pool, k.astype(cfg.dtype), i, 0)
        v_pool = jax.lax.dynamic_update_index_in_dim(v_pool, v.astype(cfg.dtype), i, 0)
        cache_live = jax.lax.dynamic_update_index_in_dim(cache_live, live, i, 0)

        if capture and fastv_k >= 0:
            def prune(live):
                live_rank = jnp.cumsum(live.astype(jnp.int32)) - 1
                cur_img = img_len - (valid0 - jnp.sum(live))
                in_window = live & (live_rank >= img_start) & (live_rank < img_start + cur_img)
                score = jnp.where(in_window, importance, -jnp.inf)
                return (live & ~in_window) | (
                    in_window & (descending_rank(score) < jnp.int32(keep_img_static))
                )

            live = jax.lax.cond(l == fastv_k, prune, lambda x: x, live)
        h = qwen2.layer_mlp(lp, h, cfg)
        return h, live, weights, k_pool, v_pool, cache_live

    weights = weights if weighted else jnp.ones((s,), jnp.float32)
    h, live, weights, k_pool, v_pool, cache_live = jax.lax.fori_loop(
        0, seg_len, body, (h, live, weights, k_pool, v_pool, cache_live)
    )
    return h, live, weights, k_pool, v_pool, cache_live


@functools.partial(jax.jit, static_argnames=("new_len",))
def _compact_merging_state(h, pos_tok, patch_type, weights, live, new_valid, *, new_len: int):
    out, _ = compact_tokens(
        live, new_len, new_valid,
        {"h": h, "pos": pos_tok, "patch_type": patch_type, "weights": weights},
    )
    return out["h"], out["pos"], out["patch_type"], out["weights"]


@functools.partial(jax.jit, static_argnames=("cfg",))
def _final_logits_at(params, h, idx, *, cfg: LLMConfig):
    last = jax.lax.dynamic_slice_in_dim(h, idx, 1, axis=0)
    return qwen2.final_logits(params, last, cfg)[0]


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_steps", "window_length", "num_sink_tokens"),
    donate_argnums=(2, 3),
)
def _sink_cache_decode_loop(
    params, first_logits, k_pool, v_pool, cache_lens, pos_base,
    *, cfg: LLMConfig, n_steps: int, window_length: int, num_sink_tokens: int,
):
    """Greedy decode with SinkCache-style attention: each step attends only
    the ``num_sink_tokens`` initial cache entries plus the trailing
    ``window_length - num_sink_tokens`` entries — the Qwen2-VL StreamingLLM
    decode variant (reference modeling_qwen2_vl_baseline.py:460-476 swaps in
    ``SinkCache(window_length, num_sink_tokens)``). The cache itself is kept
    whole (memory is not the constraint here); eviction is expressed as the
    attention mask, which is what determines the outputs.
    """
    from ..ops.attention import NEG_INF

    s_pool = k_pool.shape[1]
    hd = cfg.head_dim_

    def attend(q, k_cache, v_cache, length):
        hq = q.shape[0]
        hk = k_cache.shape[1]
        g = hq // hk
        qf = q.reshape(hk, g, hd).astype(jnp.float32)
        kf = k_cache.transpose(1, 0, 2).astype(jnp.float32)
        vf = v_cache.transpose(1, 0, 2).astype(jnp.float32)
        scores = jnp.einsum("hgd,hkd->hgk", qf, kf) / jnp.sqrt(hd).astype(jnp.float32)
        pos = jnp.arange(s_pool)
        local_start = length - (window_length - num_sink_tokens)
        mask = (pos < length) & ((pos < num_sink_tokens) | (pos >= local_start))
        scores = jnp.where(mask[None, None], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("hgk,hkd->hgd", probs, vf).reshape(hq, hd)

    def body(carry, step):
        tok, k_pool, v_pool, lens = carry
        te = qwen2.embed(params, tok, cfg)
        pos_id = (pos_base + step).reshape(1)
        cos, sin = qwen2.positions_cos_sin(pos_id, cfg)
        h = te[None, :]

        def layer(l, c):
            h, k_pool, v_pool = c
            lp = qwen2.layer_slice(params["layers"], l)
            x = qwen2.rmsnorm(h, lp["ln1"], cfg.rms_norm_eps)
            q, k, v = qwen2._project_qkv(lp, x, cfg)
            q, k = apply_rope(q, k, cos, sin)
            length = lens[l]
            k_pool = jax.lax.dynamic_update_slice(k_pool, k.astype(cfg.dtype)[None], (l, length, 0, 0))
            v_pool = jax.lax.dynamic_update_slice(v_pool, v.astype(cfg.dtype)[None], (l, length, 0, 0))
            attn = attend(q[0], k_pool[l], v_pool[l], length + 1)
            h = h + qwen2.mm(attn.reshape(1, -1), lp["wo"])
            h = qwen2.layer_mlp(lp, h, cfg)
            return h, k_pool, v_pool

        h, k_pool, v_pool = jax.lax.fori_loop(0, cfg.num_layers, layer, (h, k_pool, v_pool))
        logits = qwen2.final_logits(params, h, cfg)[0]
        new_tok = jnp.argmax(logits).astype(jnp.int32)
        return (new_tok, k_pool, v_pool, lens + 1), new_tok

    tok0 = jnp.argmax(first_logits).astype(jnp.int32)
    (_, k_pool, v_pool, cache_lens), toks = jax.lax.scan(
        body, (tok0, k_pool, v_pool, cache_lens), jnp.arange(n_steps, dtype=jnp.int32)
    )
    return jnp.concatenate([tok0[None], toks])


class BaselineEngine(CompressionEngine):
    """Prefill executor for one baseline mode; decode inherited (except the
    StreamingLLM ``sink_cache_decode`` variant below)."""

    def __init__(self, params, cfg, mode: str, kwargs: dict, *, attn_impl: str = "chunked", bucket: int = 128):
        if cfg.is_moe:
            # The baseline programs are mask-only throughout (dead rows stay
            # physically present without a live mask on the MLP), which would
            # let dropped tokens claim MoE expert-capacity slots. Gate until
            # live-threading lands here like it did in the main executors.
            raise NotImplementedError("baseline methods do not support MoE stacks yet")
        super().__init__(params, cfg, FrameFusionConfig(), attn_impl=attn_impl)
        self.mode = mode
        self.kwargs = kwargs
        self.bucket = bucket

    def generate_greedy(self, result, max_new_tokens, eos_token_id=None):
        if self.mode == "streamingllm" and self.kwargs.get("sink_cache_decode"):
            # Qwen2-VL StreamingLLM variant: windowed sink attention during
            # decode too (reference modeling_qwen2_vl_baseline.py:460-476).
            window = self.kwargs.get(
                "window_length",
                int(self.kwargs.get("length_rate", 0.3) * result.valid_len),
            )
            sinks = self.kwargs.get("num_sink_tokens", self.kwargs.get("init_num", 8))
            k_pool, v_pool, cache_lens = self.make_decode_state(result, max_new_tokens)
            toks = _sink_cache_decode_loop(
                self.params, result.logits, k_pool, v_pool, cache_lens,
                jnp.asarray(result.decode_pos_base, jnp.int32),
                cfg=self.cfg, n_steps=max_new_tokens - 1,
                window_length=window, num_sink_tokens=sinks,
            )
            out = [int(t) for t in np.asarray(toks)]
            if eos_token_id is not None and eos_token_id in out:
                out = out[: out.index(eos_token_id) + 1]
            return out
        return super().generate_greedy(result, max_new_tokens, eos_token_id=eos_token_id)

    def generate_batch(self, results, max_new_tokens, eos_token_id=None,
                       sampler=None, rng_key=None):
        if self.mode == "streamingllm" and self.kwargs.get("sink_cache_decode"):
            # The shared batched decode loop attends the FULL cache; this
            # variant's semantics are windowed sink attention per step, so
            # batching through it would silently diverge from the solo
            # decode. Fall back to per-sequence sink-windowed loops.
            if sampler is not None and getattr(sampler, "temperature", 0.0):
                raise NotImplementedError(
                    "sink_cache_decode batched sampling not supported; greedy only"
                )
            return [
                self.generate_greedy(r, max_new_tokens, eos_token_id=eos_token_id)
                for r in results
            ]
        return super().generate_batch(
            results, max_new_tokens, eos_token_id=eos_token_id,
            sampler=sampler, rng_key=rng_key,
        )

    def _guard_spec_sink(self):
        if self.mode == "streamingllm" and self.kwargs.get("sink_cache_decode"):
            # The verify pass attends the FULL cache; this variant's decode
            # semantics are windowed sink attention, so speculation would
            # silently produce the full-attention tokens instead.
            raise NotImplementedError(
                "speculative decoding not supported for the sink_cache_decode "
                "StreamingLLM variant (windowed decode attention)"
            )

    def generate_spec(self, *args, **kwargs):
        self._guard_spec_sink()
        return super().generate_spec(*args, **kwargs)

    def generate_spec_batch(self, *args, **kwargs):
        self._guard_spec_sink()
        return super().generate_spec_batch(*args, **kwargs)

    def prefill(self, input_embeds, patch_type, position_ids, patch_num, image_token_start, image_token_length, mode=None):
        cfg = self.cfg
        h, pt, pos_tok, orig_len = self._prep_inputs(input_embeds, patch_type, position_ids)
        s = h.shape[0]
        telemetry = PrefillTelemetry(original_length=orig_len, image_token_length=image_token_length)

        if self.mode == "fastv":
            fastv_k = self.kwargs.get("fastv_k", 3)
            fastv_r = self.kwargs.get("fastv_r", 0.5)
            keep_img = _round(image_token_length * (1 - fastv_r))
            new_valid = orig_len - image_token_length + keep_img
            new_len = bucket_length(new_valid, self.bucket)
            logits, k_pre, v_pre, k_post, v_post = _fastv_program(
                self.params, h, pos_tok, cfg=cfg, attn_impl=self.attn_impl,
                fastv_k=fastv_k, img_start=image_token_start,
                img_len=image_token_length, keep_img=keep_img, new_len=new_len,
                valid0=orig_len,
            )
            caches = [
                (k_pre[l], v_pre[l], orig_len) if l < fastv_k else (k_post[l], v_post[l], new_valid)
                for l in range(cfg.num_layers)
            ]
            telemetry.events.append(CompressionEvent(
                layer=fastv_k, kind="fastv_prune",
                tokens_removed=image_token_length - keep_img, tokens_after=new_valid,
            ))
            final_valid = new_valid

        elif self.mode == "streamingllm":
            init_num = self.kwargs.get("init_num", 8)
            length_rate = self.kwargs.get("length_rate", 0.3)
            window = int(length_rate * orig_len) - init_num
            program = (
                _streamingllm_program_pallas if self.attn_impl == "pallas"
                else _streamingllm_program
            )
            logits, k_all, v_all = program(
                self.params, h, pos_tok, cfg=cfg, init_num=init_num, window=window,
            )
            caches = [(k_all[l], v_all[l], orig_len) for l in range(cfg.num_layers)]
            telemetry.events.append(CompressionEvent(
                layer=-1, kind="streaming_sink", tokens_removed=0, tokens_after=orig_len,
            ))
            final_valid = orig_len

        elif self.mode in ("prefill_merge", "merge_then_fastv", "fastv_then_merge"):
            logits, caches, final_valid = self._run_merging_family(
                h, pt, pos_tok, orig_len, patch_num, image_token_start,
                image_token_length, telemetry,
            )
        else:
            raise NotImplementedError(f"Mode {self.mode} is not implemented yet.")

        telemetry.final_length = final_valid
        telemetry.final_image_tokens = image_token_length - (orig_len - final_valid)
        return PrefillResult(
            logits=logits, layer_caches=caches, valid_len=final_valid,
            # mRoPE (Qwen2-VL baselines): decode at max(prefill pos)+1, like
            # the product path (see CompressionEngine._mrope_decode_base).
            decode_pos_base=self._mrope_decode_base(position_ids) or caches[0][2],
            telemetry=telemetry, pos_dims=pos_tok.shape[1],
        )

    def _run_merging_family(self, h, pt, pos_tok, orig_len, patch_num, img_start, img_len, telemetry):
        cfg = self.cfg
        s = h.shape[0]
        frame_tok = img_len

        if self.mode == "prefill_merge":
            sparsity = self.kwargs.get("sparsity", [0.0] * cfg.num_layers)
            weighted, fastv_k, fastv_r = False, -1, 0.0
        elif self.mode == "merge_then_fastv":
            sparsity = self.kwargs.get("sparsity", [0.1] * cfg.num_layers)
            weighted = True
            fastv_k = self.kwargs.get("fastv_k", 3)
            fastv_r = self.kwargs.get("fastv_r", 0.5)
        else:  # fastv_then_merge: no merging before k; one merge after
            fastv_k = self.kwargs.get("fastv_k", 2)
            fastv_r = self.kwargs.get("fastv_r", 0.75)
            merging_sparsity = self.kwargs.get("merging_sparsity", 0.3)
            sparsity = [0.0] * cfg.num_layers
            weighted = False

        # Static per-layer merge counts (and the token budget trajectory).
        # Every removal count is host-known, so the per-layer cache lengths
        # and all compaction buckets are too — the executor below never syncs.
        k_list, remaining = [], frame_tok
        cache_len_at = []  # layer l's cache length: post-merge, pre-prune
        len_end_of_layer = []  # live count once layer l is fully done
        cur_total = orig_len
        for l in range(cfg.num_layers):
            if self.mode == "fastv_then_merge":
                k_l = int(merging_sparsity * remaining) if l == fastv_k + 1 else 0
            else:
                k_l = int(sparsity[l] * remaining)
            k_list.append(k_l)
            remaining -= k_l
            cur_total -= k_l
            if k_l:
                telemetry.events.append(CompressionEvent(
                    layer=l, kind="merge_fixed", tokens_removed=k_l,
                    tokens_after=cur_total,
                ))
            cache_len_at.append(cur_total)
            if self.mode in ("merge_then_fastv", "fastv_then_merge") and l == fastv_k:
                keep_img = _round(remaining * (1 - fastv_r))
                removed = remaining - keep_img
                remaining = keep_img
                cur_total -= removed
                telemetry.events.append(CompressionEvent(
                    layer=l, kind="fastv_prune", tokens_removed=removed,
                    tokens_after=cur_total,
                ))
            len_end_of_layer.append(cur_total)

        final_valid = cur_total
        keep_img_static = keep_img if self.mode in ("merge_then_fastv", "fastv_then_merge") else -1
        use_fastv = keep_img_static >= 0

        # Segmented execution: pool_layers-deep KV pools at the CURRENT
        # bucket, compaction between segments (static schedule -> static
        # buckets, no host reads). Segment boundaries are placed wherever the
        # live count drops a bucket quantum, so the layers AFTER a big
        # merge/prune run at the shrunken bucket immediately instead of
        # waiting out a fixed-depth segment.
        s_cur = h.shape[0]
        bounds = []
        cur_start, cur_bucket = 0, s_cur
        for l in range(cfg.num_layers):
            end_bucket = bucket_length(len_end_of_layer[l], self.ff.bucket)
            if end_bucket < cur_bucket or (l - cur_start + 1) >= self.pool_layers:
                bounds.append((cur_start, l + 1))
                cur_start, cur_bucket = l + 1, end_bucket
        if cur_start < cfg.num_layers:
            bounds.append((cur_start, cfg.num_layers))

        caches: list = [None] * cfg.num_layers
        live = jnp.arange(s_cur, dtype=jnp.int32) < orig_len
        weights = jnp.ones((s_cur,), jnp.float32)
        n_entry = orig_len  # live count at segment entry (== last live row + 1)
        logits = None
        for seg_start, seg_end in bounds:
            capture = use_fastv and seg_start <= fastv_k < seg_end
            h, live, weights, k_pool, v_pool, cache_live = _merging_segment_program(
                self.params, h, pos_tok, pt, weights, live,
                jnp.asarray(k_list[seg_start:seg_end], jnp.int32),
                jnp.int32(n_entry), jnp.int32(orig_len),
                jnp.int32(img_start), jnp.int32(img_len),
                cfg=cfg, attn_impl=self.attn_impl, patch_num=patch_num,
                weighted=weighted, fastv_k=fastv_k if capture else -1,
                keep_img_static=keep_img_static, start_layer=seg_start,
                seg_len=seg_end - seg_start, capture=capture,
            )
            k_packed, v_packed, _ = _pack_caches_program(k_pool, v_pool, cache_live)
            for i, l in enumerate(range(seg_start, seg_end)):
                caches[l] = (k_packed[i], v_packed[i], cache_len_at[l])

            n_after = len_end_of_layer[seg_end - 1]
            if seg_end >= cfg.num_layers:
                logits = _final_logits_at(self.params, h, jnp.int32(n_entry - 1), cfg=cfg)
                break
            new_bucket = bucket_length(n_after, self.ff.bucket)
            if new_bucket < s_cur:
                h, pos_tok, pt, weights = _compact_merging_state(
                    h, pos_tok, pt, weights, live, jnp.int32(n_after), new_len=new_bucket
                )
                s_cur = new_bucket
                live = jnp.arange(s_cur, dtype=jnp.int32) < n_after
                n_entry = n_after

        return logits, caches, final_valid


def replace_forward(model, mode="fastv", **kwargs):
    """Baseline entry point mirroring ``replace_Qwen2_forward``
    (reference modeling_qwen2_baseline.py:45-109). Returns a copy of the
    model whose engine runs the requested baseline."""
    import dataclasses

    from ..interface import FrameFusionModel

    assert isinstance(model, FrameFusionModel)
    engine = BaselineEngine(
        model.params, model.cfg, mode, kwargs, attn_impl=model._resolved_attn_impl()
    )
    return dataclasses.replace(model, ff=None, _engine=engine)


# Reference per-family aliases (modeling_qwen2_baseline.py:45,111,138;
# modeling_qwen2_vl_baseline.py:21) — all families ride the same backbone
# here, so these are the same dispatcher.
replace_qwen2_forward = replace_forward
replace_minicpmv_forward = replace_forward
replace_nvila_forward = replace_forward
replace_qwenvl_forward = replace_forward
