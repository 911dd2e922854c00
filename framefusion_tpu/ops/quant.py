"""Weight-only int8 quantization for the decoder matmuls.

Purpose: fit long-video configs on one chip — the 128-frame LLaVA-Video
capability (reference demo caps at 128 frames,
/root/reference/script/demo/llava_video_compare.py:366-371) needs full
Qwen2-7B weights plus ~23k-token activations/KV in 16 GB HBM; bf16 weights
alone are ~13.4 GB. Per-output-channel symmetric int8 halves that to ~7 GB
with near-lossless accuracy (weight-only, activations stay bf16, matmul
accumulation fp32 on the MXU).

Math: y = (x @ q8) * scale, with scale_o = max_k |w[k, o]| / 127 — the
per-column scale factors out of the contraction exactly, so the only error
is the int8 rounding of w. The int8->bf16 convert fuses into the matmul's
VMEM tiles; HBM traffic is int8.

A quantized weight is the pytree leaf-pair {"q8": int8 (..., K, O),
"scale": f32 (..., O)}; models/qwen2.mm() dispatches on it, and
layer_slice's tree.map slices both members of stacked layer weights.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# w_gate/w_up/w_down are the dense MLP stacks (L, K, O) on dense models and
# the expert stacks (L, E, K, O) on MoE models; sw_* are the MoE shared
# expert (dense-shaped). The router and shared_gate stay bf16 (tiny, and the
# router's fp32 softmax decides expert assignment — not worth perturbing).
QUANTIZED_LAYER_WEIGHTS = (
    "wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
    "sw_gate", "sw_up", "sw_down",
)


@functools.partial(jax.jit, donate_argnums=0)
def quantize_weight(w: jnp.ndarray) -> dict:
    """Symmetric per-output-channel int8: w (..., K, O) -> {"q8", "scale"}.

    Memory discipline: quantizing happens beside a nearly-full HBM (the bf16
    7B params are ~13.4 of 16 GB), so fp32 transients must stay PER-LAYER —
    an fp32 upcast of a whole stacked MLP weight is 7.6 GB and OOMs even
    when nominally fusable (XLA may schedule the max-reduction's and the
    round-chain's upcasts concurrently). ``lax.map`` over the leading layer
    dim caps transients at one layer's fp32 copy (~0.3 GB)."""

    def one(wl: jnp.ndarray):
        scale = jnp.max(jnp.abs(wl).astype(jnp.float32), axis=-2, keepdims=True) / 127.0
        scale = jnp.maximum(scale, 1e-12)
        q8 = jnp.clip(jnp.round(wl.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
        return q8, scale.squeeze(-2)

    if w.ndim == 4:  # MoE expert stacks (L, E, K, O): per-(layer, expert) map
        l, e = w.shape[:2]
        q8, scale = jax.lax.map(one, w.reshape(l * e, *w.shape[2:]))
        q8 = q8.reshape(l, e, *q8.shape[1:])
        scale = scale.reshape(l, e, *scale.shape[1:])
    elif w.ndim == 3:
        q8, scale = jax.lax.map(one, w)
    else:
        q8, scale = one(w)
    return {"q8": q8, "scale": scale}


def dequantize_weight(wq: dict, dtype=jnp.float32) -> jnp.ndarray:
    return (wq["q8"].astype(jnp.float32) * wq["scale"][..., None, :]).astype(dtype)


def quantize_weight_host(w) -> dict:
    """Host (numpy) twin of :func:`quantize_weight` for quantize-on-load.

    Quantizing DURING checkpoint import means the device never materializes
    the bf16 originals at all — peak HBM for a 7B load drops from ~13.4 GB
    (bf16 params, barely fitting 16 GB next to activations) to ~7 GB. Same
    math as the device path (fp32 max/127 per output channel, round-half-even,
    clip to ±127), so an int8-on-load model equals quantize_params_int8 on a
    bf16-loaded one. Returns numpy {"q8", "scale"}; the caller uploads."""
    import numpy as np

    w32 = np.asarray(w, dtype=np.float32)
    scale = np.maximum(np.max(np.abs(w32), axis=-2, keepdims=True) / 127.0, 1e-12)
    q8 = np.clip(np.rint(w32 / scale), -127, 127).astype(np.int8)
    return {"q8": q8, "scale": scale.squeeze(-2).astype(np.float32)}


def quantize_params_int8(params: dict, quantize_lm_head: bool = False) -> dict:
    """Quantize the decoder matmul weights of a qwen2-layout param pytree.

    CONSUMES ``params``: the input pytree's weight entries are replaced in
    place and the bf16 originals are donated/freed one tensor at a time —
    peak HBM = original params + one tensor's int8 output. A non-consuming
    version would hold every bf16 original (13.4 GB at 7B) PLUS the
    accumulated int8 copies until return, which OOMs a 16 GB chip. Callers
    must rebind: ``params = quantize_params_int8(params)``.

    Embeddings, norms, and biases stay in their original dtype; ``lm_head``
    optionally (it dominates logits accuracy, and at benchmark vocab sizes
    it is small).
    """
    layers = params["layers"]  # mutated in place — entries are consumed
    for name in QUANTIZED_LAYER_WEIGHTS:
        w = layers.get(name)
        if w is not None and not isinstance(w, dict):
            layers[name] = None  # drop the pytree's reference before donating
            layers[name] = quantize_weight(w)
            del w
            # Relay-attached runners free buffers lazily; a tiny device->host
            # read drains the queue so the bf16 original is actually gone
            # before the next (multi-GB) tensor is processed.
            float(jnp.sum(layers[name]["scale"][..., :1]))
    if quantize_lm_head and "lm_head" in params and not isinstance(params["lm_head"], dict):
        w = params["lm_head"]
        params["lm_head"] = quantize_weight(w)
        del w
    return params
