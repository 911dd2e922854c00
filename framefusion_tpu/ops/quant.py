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

QUANTIZED_LAYER_WEIGHTS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


@functools.partial(jax.jit, donate_argnums=0)
def quantize_weight(w: jnp.ndarray) -> dict:
    """Symmetric per-output-channel int8: w (..., K, O) -> {"q8", "scale"}."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q8 = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q8": q8, "scale": scale.squeeze(-2)}


def dequantize_weight(wq: dict, dtype=jnp.float32) -> jnp.ndarray:
    return (wq["q8"].astype(jnp.float32) * wq["scale"][..., None, :]).astype(dtype)


def quantize_params_int8(params: dict, quantize_lm_head: bool = False) -> dict:
    """Quantize the decoder matmul weights of a qwen2-layout param pytree.

    Processes one stacked tensor at a time with buffer donation so the bf16
    original is freed before the next — peak HBM = original params + one
    tensor's transient, never both full copies.

    Embeddings, norms, and biases stay in their original dtype; ``lm_head``
    optionally (it dominates logits accuracy, and at benchmark vocab sizes
    it is small).
    """
    layers = dict(params["layers"])
    for name in QUANTIZED_LAYER_WEIGHTS:
        if name in layers and not isinstance(layers[name], dict):
            layers[name] = quantize_weight(layers[name])
    out = dict(params)
    out["layers"] = layers
    if quantize_lm_head and "lm_head" in out and not isinstance(out["lm_head"], dict):
        out["lm_head"] = quantize_weight(out["lm_head"])
    return out
