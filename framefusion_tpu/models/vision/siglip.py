"""SigLIP-style vision transformer (LLaVA-Video's tower: siglip-so400m@384/14).

The reference delegates vision encoding to external model packages
(SURVEY.md §2: LLaVA-NeXT's vision_tower, reference
modeling_llava_video.py:47-56 calls ``encode_images``); a standalone TPU
framework needs its own. This is a functional ViT: conv patch embedding +
learned position embeddings (no CLS token — SigLIP), pre-LN encoder blocks
with bidirectional MHA and GELU-tanh MLP, final layernorm. Verified against
HF ``SiglipVisionModel`` in tests/test_vision.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..qwen2 import mm
from ...weights import to_numpy


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 384
    patch_size: int = 14
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_layers: int = 27
    num_heads: int = 16
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @property
    def patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.patches_per_side ** 2


def tiny_vit_config(**kw) -> ViTConfig:
    base = dict(image_size=28, patch_size=7, hidden_size=64, intermediate_size=128,
                num_layers=2, num_heads=4)
    base.update(kw)
    return ViTConfig(**base)


def init_params(cfg: ViTConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 8))

    def norm(*shape, scale=0.02):
        return jax.random.normal(next(keys), shape, cfg.dtype) * jnp.asarray(scale, cfg.dtype)

    d, i, n_l = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    layers = {
        "ln1_w": jnp.ones((n_l, d), cfg.dtype), "ln1_b": jnp.zeros((n_l, d), cfg.dtype),
        "ln2_w": jnp.ones((n_l, d), cfg.dtype), "ln2_b": jnp.zeros((n_l, d), cfg.dtype),
        "wq": norm(n_l, d, d), "bq": jnp.zeros((n_l, d), cfg.dtype),
        "wk": norm(n_l, d, d), "bk": jnp.zeros((n_l, d), cfg.dtype),
        "wv": norm(n_l, d, d), "bv": jnp.zeros((n_l, d), cfg.dtype),
        "wo": norm(n_l, d, d), "bo": jnp.zeros((n_l, d), cfg.dtype),
        "w_fc1": norm(n_l, d, i), "b_fc1": jnp.zeros((n_l, i), cfg.dtype),
        "w_fc2": norm(n_l, i, d), "b_fc2": jnp.zeros((n_l, d), cfg.dtype),
    }
    return {
        "patch_kernel": norm(cfg.patch_size, cfg.patch_size, 3, d),
        "patch_bias": jnp.zeros((d,), cfg.dtype),
        "pos_embed": norm(cfg.num_patches, d),
        "layers": layers,
        "post_ln_w": jnp.ones((d,), cfg.dtype),
        "post_ln_b": jnp.zeros((d,), cfg.dtype),
    }


def params_from_hf(state_dict, cfg: ViTConfig, prefix: str = "vision_model."):
    """Import HF ``SiglipVisionModel`` weights (also the layout inside
    LLaVA-Video hub checkpoints under
    ``model.vision_tower.vision_tower.vision_model.``)."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}

    def stack(fmt, transpose=False):
        arrs = [to_numpy(sd[fmt.format(i)]) for i in range(cfg.num_layers)]
        arrs = [a.T if transpose else a for a in arrs]
        return jnp.asarray(np.stack(arrs), cfg.dtype)

    layers = {
        "ln1_w": stack("encoder.layers.{}.layer_norm1.weight"),
        "ln1_b": stack("encoder.layers.{}.layer_norm1.bias"),
        "ln2_w": stack("encoder.layers.{}.layer_norm2.weight"),
        "ln2_b": stack("encoder.layers.{}.layer_norm2.bias"),
        "wq": stack("encoder.layers.{}.self_attn.q_proj.weight", True),
        "bq": stack("encoder.layers.{}.self_attn.q_proj.bias"),
        "wk": stack("encoder.layers.{}.self_attn.k_proj.weight", True),
        "bk": stack("encoder.layers.{}.self_attn.k_proj.bias"),
        "wv": stack("encoder.layers.{}.self_attn.v_proj.weight", True),
        "bv": stack("encoder.layers.{}.self_attn.v_proj.bias"),
        "wo": stack("encoder.layers.{}.self_attn.out_proj.weight", True),
        "bo": stack("encoder.layers.{}.self_attn.out_proj.bias"),
        "w_fc1": stack("encoder.layers.{}.mlp.fc1.weight", True),
        "b_fc1": stack("encoder.layers.{}.mlp.fc1.bias"),
        "w_fc2": stack("encoder.layers.{}.mlp.fc2.weight", True),
        "b_fc2": stack("encoder.layers.{}.mlp.fc2.bias"),
    }
    # HF conv kernel: (D, 3, k, k) -> HWIO
    kernel = to_numpy(sd["embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0)
    return {
        "patch_kernel": jnp.asarray(kernel, cfg.dtype),
        "patch_bias": jnp.asarray(to_numpy(sd["embeddings.patch_embedding.bias"]), cfg.dtype),
        "pos_embed": jnp.asarray(to_numpy(sd["embeddings.position_embedding.weight"]), cfg.dtype),
        "layers": layers,
        "post_ln_w": jnp.asarray(to_numpy(sd["post_layernorm.weight"]), cfg.dtype),
        "post_ln_b": jnp.asarray(to_numpy(sd["post_layernorm.bias"]), cfg.dtype),
    }


#: Stacked (L, K, O) encoder matmul weights eligible for int8 quantization.
#: Norms, biases, the patch embedding, and the position table stay bf16
#: (tiny, and the patch embed's K=3·ps² is narrow — no MXU win).
QUANTIZED_TOWER_WEIGHTS = ("wq", "wk", "wv", "wo", "w_fc1", "w_fc2")


def quantize_tower_int8(params: dict) -> dict:
    """Quantize the encoder matmul stacks to per-output-channel int8.

    Same math/leaf-pair convention as the LLM path (ops/quant.quantize_weight:
    ``{"q8", "scale"}``; models/qwen2.mm dispatches on it). CONSUMES ``params``
    like quantize_params_int8 — the so400m tower is ~0.8 GB bf16 and is
    quantized while a 13 GB LLM is resident, so bf16 originals are dropped
    per tensor. ViT encoders are int8-robust: both A/B sides share the
    encoder, so tower quantization never skews the dense-vs-FF comparison.
    """
    from ...ops.quant import quantize_weight

    layers = params["layers"]
    for name in QUANTIZED_TOWER_WEIGHTS:
        w = layers.get(name)
        if w is not None and not isinstance(w, dict):
            layers[name] = None
            layers[name] = quantize_weight(w)
            del w
            float(jnp.sum(layers[name]["scale"][..., :1]))  # drain the free queue
    return params


def _layernorm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


def _mha(lp, x, num_heads, attn_impl="einsum", w8a8=False):
    """Batched bidirectional MHA: x (B, N, D) -> (B, N, D).

    ``attn_impl="pallas"`` rides the fused non-causal kernel
    (ops/kernels/bidir_attention.py): the einsum path materialises the
    (B·H, N, N) fp32 scores AND probabilities in HBM every layer — ~2x the
    tower's matmul floor at so400m/64-frame geometry (DEVNOTES r4).
    ``"interpret"`` runs the same kernel interpreted (CPU parity tests).

    Weights may be int8 pairs (quantize_tower_int8); ``w8a8=True``
    additionally quantizes activations per row and contracts int8·int8 on
    the MXU (models/qwen2.mm semantics — the tower is compute-bound, so the
    ~1.5x int8 matmul rate is a real encode win)."""
    b, n, d = x.shape
    hd = d // num_heads
    q = (mm(x, lp["wq"], w8a8) + lp["bq"]).reshape(b, n, num_heads, hd)
    k = (mm(x, lp["wk"], w8a8) + lp["bk"]).reshape(b, n, num_heads, hd)
    v = (mm(x, lp["wv"], w8a8) + lp["bv"]).reshape(b, n, num_heads, hd)
    if attn_impl in ("pallas", "interpret"):
        from ...ops.kernels.bidir_attention import flash_bidir_attention

        out = flash_bidir_attention(q, k, v, interpret=attn_impl == "interpret")
    else:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores / jnp.sqrt(hd).astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
    return mm(out.reshape(b, n, d).astype(x.dtype), lp["wo"], w8a8) + lp["bo"]


def encode(params: dict, pixels: jnp.ndarray, cfg: ViTConfig, feature_layer: int = -1,
           attn_impl: str = "auto", w8a8: bool = False):
    """Encode images.

    Args:
        pixels: (B, H, W, 3) in [-1, 1].
        feature_layer: which encoder layer's output to return (-1 = after the
            last block; -2 = penultimate — LLaVA's default vision feature).
            The final ``post_layernorm`` is NOT applied to intermediate
            features, matching HF hidden_states semantics.
        attn_impl: "auto" (fused Pallas kernel on TPU, einsum elsewhere),
            "pallas", "einsum", or "interpret" (kernel in interpreter mode,
            for CPU parity tests).
        w8a8: int8·int8 MXU matmuls (requires quantize_tower_int8 params).

    Returns:
        (B, num_patches, D) features.
    """
    if attn_impl == "auto":
        attn_impl = "pallas" if jax.default_backend() == "tpu" else "einsum"
    b = pixels.shape[0]
    # Patch embedding as unfold + matmul — mathematically identical to the
    # stride-14 VALID conv (same 0..side*ps-1 coverage, same HWIO flatten
    # order), but it lowers straight onto the MXU; the conv form made the
    # relay's remote compiler hang/crash at so400m geometry (r4 bench).
    ps, side = cfg.patch_size, cfg.patches_per_side
    crop = pixels[:, : side * ps, : side * ps, :].astype(cfg.dtype)
    px = crop.reshape(b, side, ps, side, ps, 3).transpose(0, 1, 3, 2, 4, 5)
    px = px.reshape(b, cfg.num_patches, ps * ps * 3)
    w = params["patch_kernel"].reshape(ps * ps * 3, cfg.hidden_size)
    x = px @ w + params["patch_bias"]
    x = x + params["pos_embed"][None]

    n_keep = cfg.num_layers + feature_layer + 1 if feature_layer < 0 else feature_layer

    def block(x, lp):
        h = x + _mha(lp, _layernorm(x, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps),
                     cfg.num_heads, attn_impl, w8a8)
        z = _layernorm(h, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        z = jax.nn.gelu(mm(z, lp["w_fc1"], w8a8) + lp["b_fc1"], approximate=True)
        return h + mm(z, lp["w_fc2"], w8a8) + lp["b_fc2"], None

    sliced = jax.tree.map(lambda a: a[:n_keep], params["layers"])
    x, _ = jax.lax.scan(block, x, sliced)
    if feature_layer == -1:
        x = _layernorm(x, params["post_ln_w"], params["post_ln_b"], cfg.layer_norm_eps)
    return x
