"""Functional Qwen2-family decoder stack.

TPU-native counterpart of the HF Qwen2 modeling stack the reference
monkey-patches (/root/reference/framefusion/models/qwen2/modeling_qwen2.py):
a pure function over a pytree of parameters, no modules, no patching. The
compression executor (runtime/engine.py) composes the exported pieces
(``layer_attention`` / ``layer_mlp``) around the merge/prune events; the dense
paths here run the whole stack as single XLA programs.

Architecture (Qwen2 / Qwen2-VL / LLaVA-Video backbone): RMSNorm, GQA
attention with q/k/v bias, rotary embeddings, SwiGLU MLP, optional tied
embeddings. Layer parameters are stored *stacked* (leading axis = layer) so
both ``lax.scan``/``fori_loop`` whole-stack programs and per-layer programs
(via in-jit dynamic indexing) share one pytree with no per-layer copies.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..config import LLMConfig
from ..ops.attention import (
    causal_attention,
    decode_attention,
    last_rows_importance,
    verify_attention,
)
from ..ops.rope import apply_rope, mrope_cos_sin, rope_cos_sin


# ---------------------------------------------------------------------------
# Parameters


def init_params(cfg: LLMConfig, key: jax.Array) -> dict:
    """Random-normal initialisation (inference framework: used for tests/bench)."""
    hd = cfg.head_dim_
    keys = iter(jax.random.split(key, 24))

    def norm(*shape, scale=0.02):
        # Generate directly in the target dtype: a 7B init must not allocate
        # fp32 transients (w_down alone would be 7.6 GB at fp32).
        return jax.random.normal(next(keys), shape, cfg.dtype) * jnp.asarray(scale, cfg.dtype)

    n_l, d, i = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    hq, hk = cfg.num_heads, cfg.num_kv_heads
    layers = {
        "ln1": jnp.ones((n_l, d), cfg.dtype),
        "ln2": jnp.ones((n_l, d), cfg.dtype),
        "wq": norm(n_l, d, hq * hd),
        "wk": norm(n_l, d, hk * hd),
        "wv": norm(n_l, d, hk * hd),
        "wo": norm(n_l, hq * hd, d),
    }
    if cfg.is_moe:
        # Qwen2-MoE: per-layer router + expert stacks (layer axis first, then
        # expert axis — the expert axis is the ep sharding axis) + shared
        # expert with its sigmoid gate (HF Qwen2MoeSparseMoeBlock).
        e, mi, si = cfg.num_experts, cfg.moe_intermediate_size, cfg.shared_expert_intermediate_size
        layers.update({
            "router": norm(n_l, d, e),
            "w_gate": norm(n_l, e, d, mi),
            "w_up": norm(n_l, e, d, mi),
            "w_down": norm(n_l, e, mi, d),
            "sw_gate": norm(n_l, d, si),
            "sw_up": norm(n_l, d, si),
            "sw_down": norm(n_l, si, d),
            "shared_gate": norm(n_l, d, 1),
        })
    else:
        layers.update({
            "w_gate": norm(n_l, d, i),
            "w_up": norm(n_l, d, i),
            "w_down": norm(n_l, i, d),
        })
    if cfg.qkv_bias:
        layers["bq"] = jnp.zeros((n_l, hq * hd), cfg.dtype)
        layers["bk"] = jnp.zeros((n_l, hk * hd), cfg.dtype)
        layers["bv"] = jnp.zeros((n_l, hk * hd), cfg.dtype)
    params = {
        "embed": norm(cfg.vocab_size, d),
        "layers": layers,
        "final_norm": jnp.ones((d,), cfg.dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = norm(d, cfg.vocab_size)
    return params


def layer_slice(layers: dict, idx) -> dict:
    """Select one layer's parameters; ``idx`` may be a traced scalar."""
    return jax.tree.map(lambda a: jax.lax.dynamic_index_in_dim(a, idx, 0, keepdims=False), layers)


# ---------------------------------------------------------------------------
# Blocks


def rmsnorm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def positions_cos_sin(position_ids: jnp.ndarray, cfg: LLMConfig):
    """cos/sin from integer positions: (S,) -> standard RoPE, (3,S) -> mRoPE."""
    if position_ids.ndim == 2:
        assert cfg.mrope_section is not None, "3D positions require mrope_section"
        return mrope_cos_sin(position_ids, cfg.head_dim_, cfg.rope_theta, cfg.mrope_section)
    return rope_cos_sin(position_ids, cfg.head_dim_, cfg.rope_theta)


def mm(x: jnp.ndarray, w, w8a8: bool = False) -> jnp.ndarray:
    """x @ w, where ``w`` is a dense (K, O) array or an int8 weight-only
    quant pair {"q8": int8 (K, O), "scale": f32 (O,)} (ops/quant.py). The
    per-output-channel scale factors out of the contraction exactly; the
    int8->compute-dtype convert fuses into the matmul tiles, so HBM reads
    stay int8.

    ``w8a8=True`` (requires quantized ``w``) additionally quantizes the
    ACTIVATIONS per row (symmetric int8, dynamic scale = rowmax/127) and
    runs the contraction int8 x int8 -> int32 — the v5e MXU's int8 path
    measures ~341 TOP/s vs ~185 TF/s bf16 (kernel_bench --what quant), so
    compute-bound matmuls run ~1.5x faster after the descale epilogue. The
    engine enables this only for the post-compression TAIL, where every
    merge/prune decision is already made — quantization error perturbs
    logits (reported by bench first_token_kl/top1), never decisions."""
    if isinstance(w, dict):
        if w8a8:
            s_x = jnp.max(jnp.abs(x).astype(jnp.float32), axis=-1, keepdims=True) / 127.0
            s_x = jnp.maximum(s_x, 1e-12)
            x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127).astype(jnp.int8)
            acc = jnp.dot(x_q, w["q8"], preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * s_x * w["scale"]).astype(x.dtype)
        y = jnp.dot(x, w["q8"].astype(x.dtype), preferred_element_type=jnp.float32)
        return (y * w["scale"]).astype(x.dtype)
    return x @ w


def mv_stacked(x: jnp.ndarray, w_stack, l) -> jnp.ndarray:
    """Decode matvec straight from the (L, K, N) layer stack (int8 pair or
    bf16) via the pallas streaming kernel — see ops/kernels/matvec_q8.py for
    why the stack + scalar-prefetched layer index (and not a sliced weight)
    is the right operand shape. Per-channel scales factor out exactly, as in
    ``mm``."""
    from ..ops.kernels.matvec_q8 import matvec_stacked

    interp = jax.default_backend() == "cpu"  # pallas on CPU = interpret only
    if isinstance(w_stack, dict):
        y = matvec_stacked(x, w_stack["q8"], l, interpret=interp)
        s = jax.lax.dynamic_index_in_dim(w_stack["scale"], l, 0, keepdims=False)
        return (y * s).astype(x.dtype)
    return matvec_stacked(x, w_stack, l, interpret=interp).astype(x.dtype)


def _decode_fused_enabled() -> bool:
    # Kill switch for the fused decode kernels (qkv + gate-up): they change
    # launch structure, not math — but a relay remote-compile regression
    # must be routable around without a code change.
    return os.environ.get("FF_DECODE_FUSED", "1") != "0"


def _verify_use_mv() -> bool:
    """Should the speculative-verify / serving-chunk weight pass stream its
    projections through the pallas matvec kernels? Default: yes on TPU (the
    pass is weight-bandwidth-bound like decode — K<=32 activation rows
    share one stream; XLA's dequant matmul caps at ~185 GB/s on the small
    projections, kernel_bench --what decode). Off on CPU so the suite's
    exact-parity pins keep one canonical reduction order; FF_VERIFY_MV
    overrides either way."""
    env = os.environ.get("FF_VERIFY_MV")
    if env is not None:
        return env != "0"
    return jax.default_backend() == "tpu"


def mv_stacked_qkv(x: jnp.ndarray, wq, wk, wv, l):
    """q/k/v decode matvecs in ONE pallas launch (shared activation row,
    three weight streams — ops/kernels/matvec_q8.matvec_stacked_qkv); falls
    back to three mv_stacked calls when fused decode is disabled or the
    stacks mix quantization states."""
    from ..ops.kernels.matvec_q8 import matvec_stacked_qkv

    interp = jax.default_backend() == "cpu"
    quantized = isinstance(wq, dict)
    if not _decode_fused_enabled() or any(
        isinstance(w, dict) != quantized for w in (wk, wv)
    ):
        return mv_stacked(x, wq, l), mv_stacked(x, wk, l), mv_stacked(x, wv, l)
    if quantized:
        q, k, v = matvec_stacked_qkv(x, wq["q8"], wk["q8"], wv["q8"], l,
                                     interpret=interp)
        outs = []
        for y, w in ((q, wq), (k, wk), (v, wv)):
            s = jax.lax.dynamic_index_in_dim(w["scale"], l, 0, keepdims=False)
            outs.append((y * s).astype(x.dtype))
        return tuple(outs)
    q, k, v = matvec_stacked_qkv(x, wq, wk, wv, l, interpret=interp)
    return q.astype(x.dtype), k.astype(x.dtype), v.astype(x.dtype)


def mv_stacked_gateup(x: jnp.ndarray, wg, wu, l) -> jnp.ndarray:
    """Fused SwiGLU gate for decode: silu(x@wg)*(x@wu) with both MLP stacks
    streamed in one pallas launch and the dequant+silu epilogue in VMEM
    (matvec_stacked_gateup). Same math as silu(mv(wg))*mv(wu) — the
    per-channel scales multiply before the nonlinearity, exactly as ``mm``
    orders them."""
    from ..ops.kernels.matvec_q8 import matvec_stacked_gateup

    interp = jax.default_backend() == "cpu"
    quantized = isinstance(wg, dict)
    if not _decode_fused_enabled() or isinstance(wu, dict) != quantized:
        return (jax.nn.silu(mv_stacked(x, wg, l)) * mv_stacked(x, wu, l)).astype(x.dtype)
    if quantized:
        y = matvec_stacked_gateup(x, wg["q8"], wu["q8"], wg["scale"], wu["scale"], l,
                                  interpret=interp)
    else:
        ones = jnp.ones((1, wg.shape[2]), jnp.float32)
        y = matvec_stacked_gateup(x, wg, wu, ones, ones, l, interpret=interp)
    return y.astype(x.dtype)


def _project_qkv(lp: dict, x: jnp.ndarray, cfg: LLMConfig, w8a8: bool = False):
    s = x.shape[0]
    hd = cfg.head_dim_
    q = mm(x, lp["wq"], w8a8)
    k = mm(x, lp["wk"], w8a8)
    v = mm(x, lp["wv"], w8a8)
    if cfg.qkv_bias:
        q = q + lp["bq"]
        k = k + lp["bk"]
        v = v + lp["bv"]
    return (
        q.reshape(s, cfg.num_heads, hd),
        k.reshape(s, cfg.num_kv_heads, hd),
        v.reshape(s, cfg.num_kv_heads, hd),
    )


def layer_attention(
    lp: dict,
    h: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cfg: LLMConfig,
    *,
    attn_impl: str = "chunked",
    capture_num: int = 0,
    valid_len=None,
    key_valid=None,
    w8a8: bool = False,
):
    """Pre-norm attention block with residual.

    Returns (h_out, k_cache, v_cache, importance-or-None). ``capture_num > 0``
    additionally emits the prune importance vector — the mean softmax mass the
    last ``capture_num`` valid rows pay to each key (the reference recomputes
    a full manual softmax for this, models/qwen2/modeling_qwen2.py:166-188).
    On the pallas path in the resident-KV regime the capture is fused into
    the flash kernel's epilogue (one kernel, zero extra HBM traffic); other
    impls / the long-sequence blocked path compute only those rows as a
    separate O(num·S·D) einsum (ops.attention.last_rows_importance).
    ``key_valid`` masks dead keys in the mask-only fused compression phase.
    """
    x = rmsnorm(h, lp["ln1"], cfg.rms_norm_eps)
    q, k, v = _project_qkv(lp, x, cfg, w8a8)
    q, k = apply_rope(q, k, cos, sin)
    attn, importance = attention_kernel_dispatch(
        q, k, v, attn_impl, capture_num, valid_len, key_valid
    )
    s = h.shape[0]
    h_out = h + mm(attn.reshape(s, -1), lp["wo"], w8a8)
    return h_out, k, v, importance


def attention_kernel_dispatch(q, k, v, attn_impl, capture_num, valid_len, key_valid):
    """Single-sequence attention-kernel + importance-capture dispatch —
    shared by layer_attention and the batched phase/tail programs
    (runtime.engine._attn_core_batch maps it per sequence) so regime
    thresholds and capture rules can never desynchronise between the solo
    and batched executors. Returns (attn (S, Hq, D), importance-or-None)."""
    importance = None
    if capture_num and attn_impl == "pallas":
        from ..ops.kernels.flash_prefill import (
            RESIDENT_KV_MAX_S,
            flash_causal_attention_importance,
        )

        if q.shape[0] <= RESIDENT_KV_MAX_S:
            return flash_causal_attention_importance(
                q, k, v, valid_len, capture_num, key_valid=key_valid
            )
        attn = causal_attention(q, k, v, impl=attn_impl, key_valid=key_valid)
        importance = last_rows_importance(q, k, capture_num, valid_len, key_valid=key_valid)
        return attn, importance
    attn = causal_attention(q, k, v, impl=attn_impl, key_valid=key_valid)
    if capture_num:
        importance = last_rows_importance(q, k, capture_num, valid_len, key_valid=key_valid)
    return attn, importance


def layer_mlp(
    lp: dict,
    h: jnp.ndarray,
    cfg: LLMConfig,
    w8a8: bool = False,
    live: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Pre-norm MLP block with residual; dispatches to the Qwen2-MoE sparse
    block when the layer slice carries router params (cfg.is_moe stacks).

    ``live`` (bool (S,), mask-only executors) excludes dead rows from expert
    routing so they cannot claim capacity slots — live tokens then route
    identically whether dead rows are physically present (fused phase) or
    compacted away (planned/tail), keeping cross-executor decision parity.
    Dense MLP is per-token, so ``live`` is irrelevant there."""
    if "router" in lp:
        if w8a8:
            raise NotImplementedError("w8a8 tail is not supported on MoE stacks")
        from .moe import moe_prefill_capacity, sparse_mlp

        if h.ndim == 3:  # batched executors: route each sequence independently
            if live is None:
                return jax.vmap(lambda hs: layer_mlp(lp, hs, cfg))(h)
            return jax.vmap(lambda hs, lv: layer_mlp(lp, hs, cfg, live=lv))(h, live)
        x = rmsnorm(h, lp["ln2"], cfg.rms_norm_eps)
        y, _ = sparse_mlp(
            lp, x,
            num_experts=cfg.num_experts,
            top_k=cfg.num_experts_per_tok,
            norm_topk_prob=cfg.norm_topk_prob,
            capacity=moe_prefill_capacity(x.shape[0], cfg),
            live=live,
        )
        return h + y
    x = rmsnorm(h, lp["ln2"], cfg.rms_norm_eps)
    gated = jax.nn.silu(mm(x, lp["w_gate"], w8a8)) * mm(x, lp["w_up"], w8a8)
    return h + mm(gated, lp["w_down"], w8a8)


def _gather_expert(w, e):
    """Index one expert's weight out of an (E, K, O) stack — or out of both
    members of an int8 weight-only pair (q8 (E, K, O), scale (E, O))."""
    if isinstance(w, dict):
        return {
            "q8": jax.lax.dynamic_index_in_dim(w["q8"], e, 0, keepdims=False),
            "scale": jax.lax.dynamic_index_in_dim(w["scale"], e, 0, keepdims=False),
        }
    return jax.lax.dynamic_index_in_dim(w, e, 0, keepdims=False)


def moe_decode_mlp(lp: dict, h: jnp.ndarray, cfg: LLMConfig) -> jnp.ndarray:
    """Single-row MoE MLP for decode: gather the top-k experts' WEIGHTS by
    index instead of dispatching the token — exact (no capacity), and the
    HBM traffic is k experts + the shared expert instead of all E. This is
    the activated-parameter decode win (A14B reads ~14B of 57B params/step);
    int8 weight pairs (ops/quant.py) halve it again. ``h``: (1, D) or (D,)."""
    x1 = h.reshape(-1)[None, :]  # (1, D)
    x = rmsnorm(x1, lp["ln2"], cfg.rms_norm_eps)
    logits = (x @ lp["router"]).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    weights, idx = jax.lax.top_k(probs[0], cfg.num_experts_per_tok)
    if cfg.norm_topk_prob:
        weights = weights / jnp.sum(weights)
    weights = weights.astype(x.dtype)

    def one_expert(e):
        wg = _gather_expert(lp["w_gate"], e)
        wu = _gather_expert(lp["w_up"], e)
        wd = _gather_expert(lp["w_down"], e)
        return mm(jax.nn.silu(mm(x, wg)) * mm(x, wu), wd)  # (1, D)

    ye = jax.vmap(one_expert)(idx)  # (k, 1, D)
    y = jnp.sum(ye[:, 0] * weights[:, None], axis=0, keepdims=True)

    shared = mm(jax.nn.silu(mm(x, lp["sw_gate"])) * mm(x, lp["sw_up"]), lp["sw_down"])
    y = y + jax.nn.sigmoid(x @ lp["shared_gate"]) * shared
    return (h.reshape(1, -1) + y).reshape(h.shape)


def embed(params: dict, input_ids: jnp.ndarray, cfg: LLMConfig) -> jnp.ndarray:
    return jnp.take(params["embed"], input_ids, axis=0)


def final_logits(params: dict, h: jnp.ndarray, cfg: LLMConfig) -> jnp.ndarray:
    x = rmsnorm(h, params["final_norm"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings:
        return (x @ params["embed"].T).astype(jnp.float32)
    return mm(x, params["lm_head"]).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Whole-stack programs (dense path; also the tail of the compressed prefill)


def run_layers(
    params: dict,
    h: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cfg: LLMConfig,
    *,
    start_layer=0,
    stop_layer=None,
    attn_impl: str = "chunked",
    want_caches: bool = True,
    w8a8: bool = False,
    valid_len=None,
):
    """Run layers [start_layer, stop_layer) over ``h``; returns (h, k_all, v_all).

    ``valid_len`` marks trailing PAD rows (compacted-bucket callers); only
    MoE stacks consume it — pad rows must not claim expert capacity slots.

    ``start_layer``/``stop_layer`` may be traced: a ``fori_loop`` with dynamic
    bounds lets the compressed prefill resume mid-stack at the
    post-compression bucket without one compiled program per resume depth.
    Cache entries for layers outside the range are zeros (unused).

    ``want_caches=False`` (static) carries only the activations — the KV
    stacks are loop carry and XLA cannot DCE them, so a logits-only caller
    (e.g. bench timing of the dense path) must opt out explicitly to avoid
    the L*S*Hk*hd*2 allocation; returns (h, None, None).
    """
    s = h.shape[0]
    hd = cfg.head_dim_
    stop_layer = cfg.num_layers if stop_layer is None else stop_layer
    live = None
    if cfg.is_moe and valid_len is not None:
        live = jnp.arange(s, dtype=jnp.int32) < valid_len

    if not want_caches:
        def body_h(l, h):
            lp = layer_slice(params["layers"], l)
            h, _, _, _ = layer_attention(lp, h, cos, sin, cfg, attn_impl=attn_impl, w8a8=w8a8)
            return layer_mlp(lp, h, cfg, w8a8, live=live)

        h = jax.lax.fori_loop(start_layer, stop_layer, body_h, h)
        return h, None, None

    k_all = jnp.zeros((cfg.num_layers, s, cfg.num_kv_heads, hd), cfg.dtype)
    v_all = jnp.zeros_like(k_all)

    def body(l, carry):
        h, k_all, v_all = carry
        lp = layer_slice(params["layers"], l)
        h, k, v, _ = layer_attention(lp, h, cos, sin, cfg, attn_impl=attn_impl, w8a8=w8a8)
        h = layer_mlp(lp, h, cfg, w8a8, live=live)
        k_all = jax.lax.dynamic_update_index_in_dim(k_all, k.astype(cfg.dtype), l, 0)
        v_all = jax.lax.dynamic_update_index_in_dim(v_all, v.astype(cfg.dtype), l, 0)
        return h, k_all, v_all

    h, k_all, v_all = jax.lax.fori_loop(start_layer, stop_layer, body, (h, k_all, v_all))
    return h, k_all, v_all


def dense_prefill(params: dict, input_embeds: jnp.ndarray, position_ids: jnp.ndarray, cfg: LLMConfig, *, attn_impl: str = "chunked", want_caches: bool = True):
    """Full dense prefill. Returns (logits_last, k_all, v_all);
    ``want_caches=False`` returns (logits_last, None, None) without
    allocating the KV stacks (see run_layers)."""
    cos, sin = positions_cos_sin(position_ids, cfg)
    h, k_all, v_all = run_layers(params, input_embeds, cos, sin, cfg, attn_impl=attn_impl, want_caches=want_caches)
    logits = final_logits(params, h[-1:], cfg)
    return logits[0], k_all, v_all


def _pool_view(pool, l, s_view):
    """Layer ``l``'s cache restricted to the first ``s_view`` (static) rows.

    The decode pool is padded to the LONGEST layer — the phase layers'
    full-prompt caches (reference DynamicCache semantics: layer 0 runs
    before any merge, so its cache keeps every original token). Tail layers'
    ragged lengths never exceed the post-compression bucket, so reading only
    a static prefix of the pool is mathematically identical (rows past a
    layer's ragged length are masked either way) and skips the dominant
    padded read — measured 10.1 -> ~9 ms/step at the 64f/7B int8 geometry
    (kernel_bench --what decodestep, ragged geometry).
    """
    size = (1, s_view) + pool.shape[2:]
    return jax.lax.dynamic_slice(pool, (l,) + (0,) * (pool.ndim - 1), size)[0]


def _normalize_batch_split(tail_split, n_layers: int, s_pool: int):
    """Enforce _split_fori's documented caller contract at the batched entry
    points: a degenerate ``(P, tail_s, region_start)`` whose two-segment view
    would not narrow the pool read (``tail_s >= region_start``), or whose P
    leaves no layer on either side, silently compiles the COSTLIER
    two-segment program — normalize it to ``None`` instead.
    ``best_tail_split_batch`` never emits one (its cost test is strict), so
    this only guards hand-constructed splits."""
    if tail_split is None:
        return None
    p, tail_s, region_start = tail_split
    assert region_start <= s_pool, (tail_split, s_pool)
    if not 0 < p < n_layers or tail_s >= region_start:
        return None
    return tail_split


def _split_fori(n_layers, make_body, carry, tail_split, full_arg, tail_arg):
    """Run the layer loop in one or two static segments.

    With ``tail_split=(p, ...)`` layers ``< p`` run ``make_body(full_arg)``
    and layers ``>= p`` run ``make_body(tail_arg)`` — identical math at a
    narrower static pool view. ``tail_split=None`` runs every layer on
    ``full_arg``. Callers normalize degenerate splits (tail view >= full
    view, stub attention) to ``None`` BEFORE this dispatch so the two-loop
    program is only compiled when it actually narrows a read.
    """
    if tail_split is None:
        return jax.lax.fori_loop(0, n_layers, make_body(full_arg), carry)
    p = tail_split[0]
    carry = jax.lax.fori_loop(0, p, make_body(full_arg), carry)
    return jax.lax.fori_loop(p, n_layers, make_body(tail_arg), carry)


def decode_step(
    params: dict,
    token_embed: jnp.ndarray,
    position_id: jnp.ndarray,
    k_pool: jnp.ndarray,
    v_pool: jnp.ndarray,
    cache_lens: jnp.ndarray,
    cfg: LLMConfig,
    attn_impl: str = "jax",
    tail_split=None,
):
    """One decode step against a padded per-layer cache pool.

    Args:
        token_embed: (D,) current-token embedding.
        position_id: scalar int32 (or (3,) for mRoPE) — rotary position.
        k_pool, v_pool: (L, S_pad, Hk, hd) padded caches.
        cache_lens: (L,) int32 valid entries per layer *excluding* this token.
        tail_split: optional static ``(P, tail_s)`` — layers >= P attend only
            the pool's first ``tail_s`` rows (see :func:`_pool_view`; the
            caller guarantees those layers' lengths incl. new tokens stay
            below ``tail_s``, e.g. ``engine.best_tail_split``).

    Returns:
        (logits, k_pool, v_pool, cache_lens) with the new token appended to
        every layer's cache at its own offset — per-layer ragged lengths are
        exactly the reference's DynamicCache behavior after mid-stack
        compression (each layer keeps the keys of the tokens that were live
        when it ran).
    """
    pos = position_id.reshape(3, 1) if position_id.size == 3 else position_id.reshape(1)
    cos, sin = positions_cos_sin(pos, cfg)
    h = token_embed[None, :]  # (1, D)
    # The pallas path streams each weight matvec straight from the layer
    # stack (matvec_q8.matvec_stacked): XLA's own matvec rides HBM bandwidth
    # on the big MLP weights but caps at ~185G elements/s on the small
    # projections (wq/wk/wv/wo) — measured, kernel_bench --what decode.
    # "stub" keeps the pallas matvecs and stubs out only the attention.
    # "mv-jax" also keeps the streamed matvecs but pairs them with the
    # masked XLA attention (the batched path's combination): at the padded
    # ragged 64f geometry the clamped-grid pallas kernel pays ~6 grid steps
    # x 28 layers of fixed overhead, while the XLA read on a tail-split view
    # is mostly live rows — measure with kernel_bench --what decodestep.
    use_mv = attn_impl in ("pallas", "stub", "mv-jax")
    layers = params["layers"]
    hd = cfg.head_dim_

    def make_body(s_view):
        def body(l, carry):
            h, k_pool, v_pool = carry
            lp = layer_slice(layers, l)
            x = rmsnorm(h, lp["ln1"], cfg.rms_norm_eps)
            if use_mv:
                q, k, v = mv_stacked_qkv(x, layers["wq"], layers["wk"],
                                         layers["wv"], l)
                if cfg.qkv_bias:
                    q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
                q = q.reshape(1, cfg.num_heads, hd)
                k = k.reshape(1, cfg.num_kv_heads, hd)
                v = v.reshape(1, cfg.num_kv_heads, hd)
            else:
                q, k, v = _project_qkv(lp, x, cfg)
            q, k = apply_rope(q, k, cos, sin)
            length = cache_lens[l]
            k_pool = jax.lax.dynamic_update_slice(k_pool, k.astype(cfg.dtype)[None], (l, length, 0, 0))
            v_pool = jax.lax.dynamic_update_slice(v_pool, v.astype(cfg.dtype)[None], (l, length, 0, 0))
            if attn_impl == "pallas":
                from ..ops.kernels.decode_attention import ragged_decode_attention

                attn = ragged_decode_attention(
                    q[0], _pool_view(k_pool, l, s_view), _pool_view(v_pool, l, s_view),
                    length + 1)
            elif attn_impl == "stub":
                # Microbenchmark knob ONLY (kernel_bench --what decodestep):
                # NOT attention — replaces the cache read/softmax with the
                # current token's own v, isolating the weight-stream +
                # projection cost of a decode step from its attention cost.
                attn = jnp.broadcast_to(
                    v[:, :, None, :], (1, cfg.num_kv_heads, cfg.num_heads // cfg.num_kv_heads, hd)
                ).reshape(cfg.num_heads, hd).astype(q.dtype)
            else:
                attn = decode_attention(
                    q[0], _pool_view(k_pool, l, s_view), _pool_view(v_pool, l, s_view),
                    length + 1)
            if use_mv:
                h = h + mv_stacked(attn.reshape(1, -1), layers["wo"], l)
            else:
                h = h + mm(attn.reshape(1, -1), lp["wo"])
            if cfg.is_moe:
                # Weight-gather decode: HBM reads only the k routed experts +
                # shared expert — the activated-parameter bandwidth win.
                h = moe_decode_mlp(lp, h, cfg)
            elif use_mv:
                x2 = rmsnorm(h, lp["ln2"], cfg.rms_norm_eps)
                gated = mv_stacked_gateup(x2, layers["w_gate"], layers["w_up"], l)
                h = h + mv_stacked(gated.astype(h.dtype), layers["w_down"], l)
            else:
                h = layer_mlp(lp, h, cfg)
            return h, k_pool, v_pool
        return body

    s_full = k_pool.shape[1]
    carry = (h, k_pool, v_pool)
    if tail_split is not None and tail_split[1] >= s_full:
        tail_split = None
    h, k_pool, v_pool = _split_fori(
        cfg.num_layers, make_body, carry, tail_split, s_full,
        tail_split and tail_split[1])
    logits = final_logits(params, h, cfg)[0]
    return logits, k_pool, v_pool, cache_lens + 1


def verify_step(
    params: dict,
    token_embeds: jnp.ndarray,
    position_ids: jnp.ndarray,
    k_pool: jnp.ndarray,
    v_pool: jnp.ndarray,
    cache_lens: jnp.ndarray,
    cfg: LLMConfig,
    tail_split=None,
):
    """Speculative-verify step: K candidate rows through the stack in ONE
    weight pass.

    Decode is HBM-bandwidth-bound on the weights, so verifying K drafted
    tokens costs nearly the same wall-clock as one :func:`decode_step` —
    that asymmetry is the entire speculative-decoding win. Row 0 is the last
    committed token; rows 1..K-1 are draft continuations. All K rows' K/V
    are written to the pool at each layer's own ragged offset (the caller
    rolls ``cache_lens`` forward by ``accepted+1`` only, so rejected rows'
    entries are dead padding that the next verify overwrites in place).

    Args:
        token_embeds: (K, D) candidate-row embeddings.
        position_ids: (K,) int32 (or (3, K) for mRoPE) rotary positions.
        k_pool, v_pool: (L, S_pad, Hk, hd); the caller must leave >= K rows
            of headroom past every layer's ``cache_lens`` entry.
        cache_lens: (L,) valid entries per layer excluding these rows.
        tail_split: optional static ``(P, tail_s)`` — layers >= P attend only
            the pool's first ``tail_s`` rows (see :func:`_pool_view`); the
            caller guarantees headroom for the K rows below ``tail_s``.

    Returns:
        (logits (K, V), k_pool, v_pool) — logits[i] scores the token AFTER
        row i, exactly what plain greedy decode would produce given rows
        0..i committed.
    """
    kq = token_embeds.shape[0]
    pos = position_ids.reshape(3, kq) if position_ids.size == 3 * kq else position_ids.reshape(kq)
    cos, sin = positions_cos_sin(pos, cfg)
    h = token_embeds  # (K, D)

    use_mv = _verify_use_mv() and not cfg.is_moe
    layers = params["layers"]
    hd = cfg.head_dim_

    def make_body(s_view):
        def body(l, carry):
            h, k_pool, v_pool = carry
            lp = layer_slice(layers, l)
            x = rmsnorm(h, lp["ln1"], cfg.rms_norm_eps)
            if use_mv:
                # Streamed-matvec weight pass (K<=32 rows share one weight
                # stream — the same bandwidth argument as decode_step).
                q, k, v = mv_stacked_qkv(x, layers["wq"], layers["wk"],
                                         layers["wv"], l)
                if cfg.qkv_bias:
                    q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
                q = q.reshape(kq, cfg.num_heads, hd)
                k = k.reshape(kq, cfg.num_kv_heads, hd)
                v = v.reshape(kq, cfg.num_kv_heads, hd)
            else:
                q, k, v = _project_qkv(lp, x, cfg)
            q, k = apply_rope(q, k, cos, sin)
            length = cache_lens[l]
            k_pool = jax.lax.dynamic_update_slice(k_pool, k.astype(cfg.dtype)[None], (l, length, 0, 0))
            v_pool = jax.lax.dynamic_update_slice(v_pool, v.astype(cfg.dtype)[None], (l, length, 0, 0))
            attn = verify_attention(
                q, _pool_view(k_pool, l, s_view), _pool_view(v_pool, l, s_view), length)
            if use_mv:
                h = h + mv_stacked(attn.reshape(kq, -1).astype(h.dtype), layers["wo"], l)
                x2 = rmsnorm(h, lp["ln2"], cfg.rms_norm_eps)
                gated = mv_stacked_gateup(x2, layers["w_gate"], layers["w_up"], l)
                h = h + mv_stacked(gated.astype(h.dtype), layers["w_down"], l)
            else:
                h = h + mm(attn.reshape(kq, -1), lp["wo"])
                if cfg.is_moe:
                    # Row-wise exact expert gather — same math as decode's
                    # moe_decode_mlp, so accepted rows match plain decode.
                    h = jax.vmap(lambda row: moe_decode_mlp(lp, row, cfg))(h)
                else:
                    h = layer_mlp(lp, h, cfg)
            return h, k_pool, v_pool
        return body

    s_full = k_pool.shape[1]
    carry = (h, k_pool, v_pool)
    if tail_split is not None and tail_split[1] >= s_full:
        tail_split = None
    h, k_pool, v_pool = _split_fori(
        cfg.num_layers, make_body, carry, tail_split, s_full,
        tail_split and tail_split[1])
    logits = final_logits(params, h, cfg)  # (K, V)
    return logits, k_pool, v_pool


def decode_step_batch(
    params: dict,
    token_embeds: jnp.ndarray,
    position_ids: jnp.ndarray,
    k_pool: jnp.ndarray,
    v_pool: jnp.ndarray,
    cache_lens: jnp.ndarray,
    write_pos,
    step,
    cfg: LLMConfig,
    attn_impl: str = "jax",
    tail_split=None,
):
    """One decode step for a BATCH of sequences — scatter-free by design.

    A vmapped ``decode_step`` writes each sequence's new K/V at its own
    per-(batch, layer) ragged offset, which lowers to a scatter — and row
    scatters serialize on TPU (the same pathology core/merge.py avoids). Here
    every (batch, layer) writes at the COMMON offset ``write_pos + step``
    (``write_pos`` = the pool's prefix region size), so each layer's update is
    one unbatched dynamic_update_slice; attention masks the two-interval
    valid set ``[0, cache_lens[l,b]) ∪ [write_pos, write_pos+step]``. The gap
    rows between a sequence's ragged prefix and the common decode region are
    dead padding (the pool is already sized by the longest prefix).

    Args:
        token_embeds: (B, D). position_ids: (B,) or (3, B) for mRoPE.
        k_pool/v_pool: (L, B, S_pool, Hk, hd). cache_lens: (L, B) prefix
        lengths (constant across decode). write_pos: scalar int32, start of
        the decode region. step: scalar int32, 0-based decode step index.
        attn_impl: "jax" | "pallas" (streaming weight matvecs) | "stub"
            (microbench knob ONLY — replaces attention with the token's own
            v, isolating weight-stream + projection cost; see decode_step).
        tail_split: optional static ``(P, tail_s, region_start)`` — layers
            >= P read only pool rows ``[0, tail_s) ∪ [region_start, S_pool)``
            (two static slices + a 3-way online-softmax merge) instead of the
            full padded pool. The caller guarantees those layers' prefix
            lengths stay < ``tail_s`` and ``tail_s <= region_start <=
            write_pos`` (``engine.best_tail_split_batch``); rows outside the
            two segments are dead padding for them, so the math is identical.
    Returns (logits (B, V), k_pool, v_pool).
    """
    cos, sin = positions_cos_sin(position_ids, cfg)  # (B, hd) each
    b = token_embeds.shape[0]
    s_pool = k_pool.shape[2]
    hk = cfg.num_kv_heads
    g = cfg.num_heads // hk
    hd = cfg.head_dim_
    pos_iota = jnp.arange(s_pool, dtype=jnp.int32)
    # Previously-decoded region only; the CURRENT token is an explicit extra
    # attention column so the pools stay READ-ONLY through the layer loop
    # (scan xs) and get exactly ONE (L, B, 1, Hk, hd) write per step — pools
    # carried through a layer loop get copied by the loop machinery, which
    # dominated the per-step cost at batch size > 1.
    in_decode = (pos_iota >= write_pos) & (pos_iota < write_pos + step)  # (S,)
    scale = jnp.float32(1.0 / (hd ** 0.5))

    # fori + layer_slice rather than scan-over-xs: with int8 weights, XLA
    # fuses the int8->bf16 convert into the matmul for fori's dynamic layer
    # slice (the single-sequence loop's measured behavior) but materialized
    # full dequantized weights for scan's auto-sliced xs (measured 110 ms/
    # step at B=4 vs ~24 at B=1). Pools stay read-only closures either way.
    # attn_impl=="pallas" streams the matvecs from the layer stacks, exactly
    # as in decode_step (the weight stream is shared across the B rows).
    use_mv = attn_impl == "pallas"
    layers = params["layers"]

    def make_body(seg):
        def body(l, carry):
            h, k_new, v_new = carry
            lp = layer_slice(layers, l)
            k_l = jax.lax.dynamic_index_in_dim(k_pool, l, 0, keepdims=False)  # (B, S, Hk, hd)
            v_l = jax.lax.dynamic_index_in_dim(v_pool, l, 0, keepdims=False)
            len_l = cache_lens[l]  # (B,)
            x = rmsnorm(h, lp["ln1"], cfg.rms_norm_eps)
            if use_mv:
                q, k, v = mv_stacked_qkv(x, layers["wq"], layers["wk"],
                                         layers["wv"], l)
                if cfg.qkv_bias:
                    q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
                q = q.reshape(b, cfg.num_heads, hd)
                k = k.reshape(b, cfg.num_kv_heads, hd)
                v = v.reshape(b, cfg.num_kv_heads, hd)
            else:
                q, k, v = _project_qkv(lp, x, cfg)  # (B, H, hd)
            q, k = apply_rope(q, k, cos, sin)
            qf = q.reshape(b, hk, g, hd).astype(jnp.float32)
            kf_cur = k.astype(jnp.float32).reshape(b, hk, 1, hd)
            s_cur = jnp.sum(qf * kf_cur, axis=-1, keepdims=True) * scale  # (B, Hk, g, 1)
            if attn_impl == "stub":
                out = jnp.broadcast_to(
                    v.astype(jnp.float32)[:, :, None], (b, hk, g, hd))
            elif seg is None:
                scores = jnp.einsum("bhgd,bshd->bhgs", qf, k_l.astype(jnp.float32)) * scale
                valid = (pos_iota[None, :] < len_l[:, None]) | in_decode[None, :]  # (B, S)
                scores = jnp.where(valid[:, None, None, :], scores, jnp.float32(-1e30))
                m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), s_cur)
                p = jnp.exp(scores - m)
                p_cur = jnp.exp(s_cur - m)
                denom = jnp.sum(p, axis=-1, keepdims=True) + p_cur
                out = jnp.einsum("bhgs,bshd->bhgd", p, v_l.astype(jnp.float32))
                out = (out + p_cur * v.astype(jnp.float32).reshape(b, hk, 1, hd)) / denom
            else:
                # Two-segment read: ragged prefix rows [0, tail_s) + common
                # decode region [region_start, S_pool); everything between is
                # dead padding for layers >= P (3-way online-softmax merge).
                tail_s, rs = seg
                ka, va = k_l[:, :tail_s], v_l[:, :tail_s]
                kb, vb = k_l[:, rs:], v_l[:, rs:]
                sa = jnp.einsum("bhgd,bshd->bhgs", qf, ka.astype(jnp.float32)) * scale
                va_mask = pos_iota[None, :tail_s] < len_l[:, None]  # (B, tail_s)
                sa = jnp.where(va_mask[:, None, None, :], sa, jnp.float32(-1e30))
                sb = jnp.einsum("bhgd,bshd->bhgs", qf, kb.astype(jnp.float32)) * scale
                gpos = rs + pos_iota[None, : s_pool - rs]
                vb_mask = (gpos >= write_pos) & (gpos < write_pos + step)  # (B', S-rs)
                sb = jnp.where(vb_mask[:, None, None, :], sb, jnp.float32(-1e30))
                m = jnp.maximum(
                    jnp.maximum(jnp.max(sa, axis=-1, keepdims=True),
                                jnp.max(sb, axis=-1, keepdims=True)),
                    s_cur,
                )
                pa, pb = jnp.exp(sa - m), jnp.exp(sb - m)
                p_cur = jnp.exp(s_cur - m)
                denom = (jnp.sum(pa, axis=-1, keepdims=True)
                         + jnp.sum(pb, axis=-1, keepdims=True) + p_cur)
                out = (jnp.einsum("bhgs,bshd->bhgd", pa, va.astype(jnp.float32))
                       + jnp.einsum("bhgs,bshd->bhgd", pb, vb.astype(jnp.float32))
                       + p_cur * v.astype(jnp.float32).reshape(b, hk, 1, hd)) / denom
            if use_mv:
                h = h + mv_stacked(out.reshape(b, -1).astype(h.dtype), layers["wo"], l)
            else:
                h = h + mm(out.reshape(b, -1).astype(h.dtype), lp["wo"])
            if cfg.is_moe:
                h = jax.vmap(lambda row: moe_decode_mlp(lp, row, cfg))(h)  # (B, D)
            elif use_mv:
                x2 = rmsnorm(h, lp["ln2"], cfg.rms_norm_eps)
                gated = mv_stacked_gateup(x2, layers["w_gate"], layers["w_up"], l)
                h = h + mv_stacked(gated.astype(h.dtype), layers["w_down"], l)
            else:
                h = layer_mlp(lp, h, cfg)
            k_new = jax.lax.dynamic_update_index_in_dim(k_new, k.astype(cfg.dtype), l, 0)
            v_new = jax.lax.dynamic_update_index_in_dim(v_new, v.astype(cfg.dtype), l, 0)
            return h, k_new, v_new
        return body

    nl = k_pool.shape[0]
    k_acc = jnp.zeros((nl, b, hk, hd), cfg.dtype)
    carry = (token_embeds, k_acc, jnp.zeros_like(k_acc))
    if attn_impl == "stub":
        tail_split = None
    tail_split = _normalize_batch_split(tail_split, nl, s_pool)
    h, k_new, v_new = _split_fori(
        nl, make_body, carry, tail_split, None,
        tail_split and tail_split[1:])
    k_pool = jax.lax.dynamic_update_slice(
        k_pool, k_new[:, :, None], (0, 0, write_pos + step, 0, 0)
    )
    v_pool = jax.lax.dynamic_update_slice(
        v_pool, v_new[:, :, None], (0, 0, write_pos + step, 0, 0)
    )
    logits = final_logits(params, h, cfg)
    return logits, k_pool, v_pool


def verify_step_batch(
    params: dict,
    token_embeds: jnp.ndarray,
    position_ids: jnp.ndarray,
    k_pool: jnp.ndarray,
    v_pool: jnp.ndarray,
    cache_lens: jnp.ndarray,
    decode_mask: jnp.ndarray,
    write_pos,
    step,
    cfg: LLMConfig,
    tail_split=None,
    k_tail=None,
    v_tail=None,
    phys=None,
):
    """Speculative-verify for a BATCH: (B, K) candidate rows through the
    stack in ONE weight pass — :func:`verify_step` with
    :func:`decode_step_batch`'s scatter-free cache discipline.

    Each macro step writes every sequence's K rows at the COMMON offset
    ``write_pos + step*K`` (one ``(L, B, K, Hk, hd)`` pool update per step;
    per-sequence ragged offsets would lower to row scatters, which serialize
    on TPU). Rows a sequence later rejects are left in place as dead padding
    — ``decode_mask`` marks only COMMITTED decode-region rows, so they are
    invisible to attention, exactly like the solo path's overwritten rows.

    Args:
        token_embeds: (B, K, D) candidate-row embeddings (row 0 = each
            sequence's last committed token).
        position_ids: (B, K) int32, or (3, B, K) for mRoPE.
        k_pool, v_pool: (L, B, S_pool, Hk, hd) — READ-ONLY through the layer
            loop (the K current rows ride explicit attention columns).
        cache_lens: (L, B) ragged prefix lengths (constant across decode).
        decode_mask: (B, S_pool) bool — committed decode-region rows from
            earlier macro steps.
        write_pos: scalar int32 — start of the decode region.
        step: scalar int32 — 0-based macro-step index.
        tail_split: optional static ``(P, tail_s, region_start)`` — layers
            >= P read only pool rows ``[0, tail_s) ∪ [region_start, S_pool)``
            (two static slices, 3-way online-softmax merge; see
            :func:`decode_step_batch`). Caller contract:
            ``engine.best_tail_split_batch``.
        k_tail, v_tail: optional PHYSICALLY SPLIT tail pools
            ``(L - P, B, S_tail, Hk, hd)``. With ``phys=(P, tail_rs, rs)``
            set, ``k_pool``/``v_pool`` hold only the first ``P`` layers at
            full ``S_pool`` and layers >= P live in these smaller arrays:
            rows ``[0, tail_rs)`` mirror the head pool's prefix region and
            rows ``[tail_rs, S_tail)`` mirror its decode region
            ``[rs, S_pool)`` row-for-row (``S_tail - tail_rs ==
            S_pool - rs``). Same math as the ``tail_split`` VIEW — the
            in-between rows the view skips are simply never allocated —
            so post-compression serving pools stop paying full-prompt HBM
            (runtime/serving.ServingLoop ``tail_pool=``). ``decode_mask``,
            ``write_pos`` and ``step`` stay in HEAD coordinates; tail
            writes land at ``write_pos + step*K - rs + tail_rs``.
            ``phys`` replaces ``tail_split`` (callers pass one or the
            other); caller guarantees layers >= P never hold live prefix
            rows at or past ``tail_rs - committed-row headroom`` (the
            serving loop asserts this at admission).

    Returns:
        (logits (B, K, V), k_pool, v_pool, k_tail, v_tail); ``logits[b, i]``
        scores the token after row i given rows 0..i committed, per
        sequence. ``k_tail``/``v_tail`` are returned as given (``None``
        without ``phys``).
    """
    b, kq, _ = token_embeds.shape
    flat_pos = (
        position_ids.reshape(3, b * kq)
        if position_ids.ndim == 3
        else position_ids.reshape(b * kq)
    )
    cos, sin = positions_cos_sin(flat_pos, cfg)  # (B*K, hd)
    cos = cos.reshape(b, kq, -1)
    sin = sin.reshape(b, kq, -1)
    s_pool = k_pool.shape[2]
    hk = cfg.num_kv_heads
    g = cfg.num_heads // hk
    hd = cfg.head_dim_
    pos_iota = jnp.arange(s_pool, dtype=jnp.int32)
    scale = jnp.float32(1.0 / (hd ** 0.5))
    # tril[i, j] = row i may attend current-block row j (causal within K)
    tril = jnp.tril(jnp.ones((kq, kq), bool))
    rope_b = jax.vmap(apply_rope)  # over B: (K,H,hd) x (K,hd)
    layers = params["layers"]

    use_mv = _verify_use_mv() and not cfg.is_moe and b * kq <= 64

    def make_body(spec):
        k_src, v_src, l_off, seg = spec

        def body(l, carry):
            h, k_new, v_new = carry  # h (B,K,D)
            lp = layer_slice(layers, l)
            k_l = jax.lax.dynamic_index_in_dim(k_src, l - l_off, 0, keepdims=False)  # (B,S,Hk,hd)
            v_l = jax.lax.dynamic_index_in_dim(v_src, l - l_off, 0, keepdims=False)
            len_l = cache_lens[l]  # (B,)
            x = rmsnorm(h, lp["ln1"], cfg.rms_norm_eps)
            if use_mv:
                # Streamed weight pass: all B*K candidate rows share one
                # weight stream (the serving chunk's bandwidth term).
                q, k, v = mv_stacked_qkv(x.reshape(b * kq, -1), layers["wq"],
                                         layers["wk"], layers["wv"], l)
                if cfg.qkv_bias:
                    q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
            else:
                q, k, v = _project_qkv(lp, x.reshape(b * kq, -1), cfg)
            q = q.reshape(b, kq, cfg.num_heads, hd)
            k = k.reshape(b, kq, hk, hd)
            v = v.reshape(b, kq, hk, hd)
            q, k = rope_b(q, k, cos, sin)
            qf = q.reshape(b, kq, hk, g, hd).astype(jnp.float32)
            kf_cur = k.astype(jnp.float32)
            s_cur = jnp.einsum("bnhgd,bmhd->bhgnm", qf, kf_cur) * scale  # (B,Hk,g,K,K)
            s_cur = jnp.where(tril[None, None, None], s_cur, jnp.float32(-1e30))
            m_cur = jnp.max(s_cur, axis=-1, keepdims=True)
            if seg is None:
                scores = jnp.einsum("bnhgd,bshd->bhgns", qf, k_l.astype(jnp.float32)) * scale
                valid = (pos_iota[None, :] < len_l[:, None]) | decode_mask  # (B,S)
                scores = jnp.where(valid[:, None, None, None, :], scores, jnp.float32(-1e30))
                m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), m_cur)
                p = jnp.exp(scores - m)
                p_cur = jnp.exp(s_cur - m)
                denom = (jnp.sum(p, axis=-1, keepdims=True)
                         + jnp.sum(p_cur, axis=-1, keepdims=True))
                out = jnp.einsum("bhgns,bshd->bhgnd", p, v_l.astype(jnp.float32))
                out = out + jnp.einsum("bhgnm,bmhd->bhgnd", p_cur, v.astype(jnp.float32))
                out = out / denom
            else:
                # Two-segment read (see decode_step_batch): ragged prefix
                # rows [0, tail_s) + common decode region. ``pool_rs`` is
                # the decode region's start IN THIS POOL's coordinates
                # (== mask_rs for the view split; the physical split's
                # smaller tail pool starts its decode region at tail_rs
                # while decode_mask stays in head coordinates).
                tail_s, pool_rs, mask_rs = seg
                ka, va_ = k_l[:, :tail_s], v_l[:, :tail_s]
                kb, vb_ = k_l[:, pool_rs:], v_l[:, pool_rs:]
                sa = jnp.einsum("bnhgd,bshd->bhgns", qf, ka.astype(jnp.float32)) * scale
                va_mask = (pos_iota[None, :tail_s] < len_l[:, None]) | decode_mask[:, :tail_s]
                sa = jnp.where(va_mask[:, None, None, None, :], sa, jnp.float32(-1e30))
                sb = jnp.einsum("bnhgd,bshd->bhgns", qf, kb.astype(jnp.float32)) * scale
                vb_mask = decode_mask[:, mask_rs:]
                sb = jnp.where(vb_mask[:, None, None, None, :], sb, jnp.float32(-1e30))
                m = jnp.maximum(
                    jnp.maximum(jnp.max(sa, axis=-1, keepdims=True),
                                jnp.max(sb, axis=-1, keepdims=True)),
                    m_cur,
                )
                pa, pb = jnp.exp(sa - m), jnp.exp(sb - m)
                p_cur = jnp.exp(s_cur - m)
                denom = (jnp.sum(pa, axis=-1, keepdims=True)
                         + jnp.sum(pb, axis=-1, keepdims=True)
                         + jnp.sum(p_cur, axis=-1, keepdims=True))
                out = (jnp.einsum("bhgns,bshd->bhgnd", pa, va_.astype(jnp.float32))
                       + jnp.einsum("bhgns,bshd->bhgnd", pb, vb_.astype(jnp.float32))
                       + jnp.einsum("bhgnm,bmhd->bhgnd", p_cur, v.astype(jnp.float32)))
                out = out / denom
            out = out.transpose(0, 3, 1, 2, 4).reshape(b, kq, hk * g * hd)
            if use_mv:
                h = h + mv_stacked(out.reshape(b * kq, -1).astype(h.dtype),
                                   layers["wo"], l).reshape(b, kq, -1)
                x2 = rmsnorm(h, lp["ln2"], cfg.rms_norm_eps)
                gated = mv_stacked_gateup(x2.reshape(b * kq, -1),
                                          layers["w_gate"], layers["w_up"], l)
                h = h + mv_stacked(gated.astype(h.dtype),
                                   layers["w_down"], l).reshape(b, kq, -1)
            elif cfg.is_moe:
                h = h + mm(out.astype(h.dtype), lp["wo"])
                # Row-exact expert gather, flattened over (B, K) — accepted rows
                # match plain decode (see verify_step).
                h = jax.vmap(lambda row: moe_decode_mlp(lp, row, cfg))(
                    h.reshape(b * kq, -1)
                ).reshape(b, kq, -1)
            else:
                h = h + mm(out.astype(h.dtype), lp["wo"])
                h = layer_mlp(lp, h, cfg)
            k_new = jax.lax.dynamic_update_index_in_dim(k_new, k.astype(cfg.dtype), l, 0)
            v_new = jax.lax.dynamic_update_index_in_dim(v_new, v.astype(cfg.dtype), l, 0)
            return h, k_new, v_new
        return body

    nl = cfg.num_layers
    acc = jnp.zeros((nl, b, kq, hk, hd), cfg.dtype)
    carry = (token_embeds, acc, jnp.zeros_like(acc))
    base = write_pos + step * kq
    if phys is not None:
        p, tail_rs, rs = phys
        assert k_tail is not None and k_pool.shape[0] == p, (phys, k_pool.shape)
        assert k_tail.shape[2] - tail_rs == s_pool - rs, (phys, k_tail.shape, s_pool)
        h, k_new, v_new = _split_fori(
            nl, make_body, carry, (p,),
            (k_pool, v_pool, 0, None),
            (k_tail, v_tail, p, (tail_rs, tail_rs, rs)))
        k_pool = jax.lax.dynamic_update_slice(k_pool, k_new[:p], (0, 0, base, 0, 0))
        v_pool = jax.lax.dynamic_update_slice(v_pool, v_new[:p], (0, 0, base, 0, 0))
        tbase = base - rs + tail_rs
        k_tail = jax.lax.dynamic_update_slice(k_tail, k_new[p:], (0, 0, tbase, 0, 0))
        v_tail = jax.lax.dynamic_update_slice(v_tail, v_new[p:], (0, 0, tbase, 0, 0))
    else:
        tail_split = _normalize_batch_split(tail_split, nl, s_pool)
        h, k_new, v_new = _split_fori(
            nl, make_body, carry, tail_split,
            (k_pool, v_pool, 0, None),
            tail_split and (k_pool, v_pool, 0,
                            (tail_split[1], tail_split[2], tail_split[2])))
        k_pool = jax.lax.dynamic_update_slice(k_pool, k_new, (0, 0, base, 0, 0))
        v_pool = jax.lax.dynamic_update_slice(v_pool, v_new, (0, 0, base, 0, 0))
    logits = final_logits(params, h.reshape(b * kq, -1), cfg).reshape(b, kq, -1)
    return logits, k_pool, v_pool, k_tail, v_tail
