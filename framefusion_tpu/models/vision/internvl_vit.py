"""InternViT vision tower + pixel-shuffle projector (InternVL family).

The reference's InternVL hook consumes ``vit_embeds`` from the remote-code
``extract_feature`` (reference models/internvl/modeling_internvl_chat.py:19-33:
InternViT encode -> drop CLS -> pixel-shuffle downsample -> mlp1 projector);
a standalone TPU framework needs the tower itself. Architecture follows the
HF-format InternVL port (``InternVLVisionModel`` in transformers — the
offline-testable oracle, tests/test_vision.py::TestInternVLViTVsHF):

  * Conv2D patch embedding (+bias), CLS token, learned absolute position
    embeddings over (CLS + patches);
  * pre-LN blocks with LAYER-SCALE residuals: x + lambda_1 * attn(ln1(x)),
    then x + lambda_2 * mlp(ln2(x)); attention is full (non-causal) MHA with
    separate q/k/v projections (bias and qk-norm per config);
  * final layernorm is identity for the InternVL checkpoints
    (use_mean_pooling=True);
  * features: drop CLS, reshape to the (side, side) grid, pixel-shuffle by
    0.5 (2x2 spatial -> 4x channels), LayerNorm -> Linear -> GELU -> Linear
    into the LLM hidden size.

TPU notes: everything is dense matmuls + one batched softmax einsum per
layer; the pixel shuffle is pure reshape/transpose (free at the XLA level —
it fuses into the following LayerNorm's reads).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ...weights import to_numpy


@dataclasses.dataclass(frozen=True)
class InternViTConfig:
    image_size: int = 448
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    layer_norm_eps: float = 1e-6
    attention_bias: bool = False
    use_qk_norm: bool = False
    text_hidden_size: int = 4096  # projector output (LLM hidden)
    downsample_ratio: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @property
    def patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.patches_per_side ** 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def shuffle_unit(self) -> int:
        return int(1 / self.downsample_ratio) ** 2

    @property
    def tokens_per_image(self) -> int:
        side = int(self.patches_per_side * self.downsample_ratio)
        return side * side


def tiny_internvit_config(**kw) -> InternViTConfig:
    base = dict(image_size=28, patch_size=7, hidden_size=64, intermediate_size=128,
                num_layers=2, num_heads=4, text_hidden_size=32)
    base.update(kw)
    return InternViTConfig(**base)


def init_params(cfg: InternViTConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 12))

    def norm(*shape, scale=0.02):
        return jax.random.normal(next(keys), shape, cfg.dtype) * jnp.asarray(scale, cfg.dtype)

    d, i, n_l = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    layers = {
        "ln1_w": jnp.ones((n_l, d), cfg.dtype), "ln1_b": jnp.zeros((n_l, d), cfg.dtype),
        "ln2_w": jnp.ones((n_l, d), cfg.dtype), "ln2_b": jnp.zeros((n_l, d), cfg.dtype),
        "wq": norm(n_l, d, d), "wk": norm(n_l, d, d), "wv": norm(n_l, d, d),
        "wo": norm(n_l, d, d), "bo": jnp.zeros((n_l, d), cfg.dtype),
        "w_fc1": norm(n_l, d, i), "b_fc1": jnp.zeros((n_l, i), cfg.dtype),
        "w_fc2": norm(n_l, i, d), "b_fc2": jnp.zeros((n_l, d), cfg.dtype),
        "lambda1": jnp.full((n_l, d), 0.1, cfg.dtype),
        "lambda2": jnp.full((n_l, d), 0.1, cfg.dtype),
    }
    if cfg.attention_bias:
        layers["bq"] = jnp.zeros((n_l, d), cfg.dtype)
        layers["bk"] = jnp.zeros((n_l, d), cfg.dtype)
        layers["bv"] = jnp.zeros((n_l, d), cfg.dtype)
    if cfg.use_qk_norm:
        layers["qnorm_w"] = jnp.ones((n_l, d), cfg.dtype)
        layers["knorm_w"] = jnp.ones((n_l, d), cfg.dtype)
    return {
        "patch_kernel": norm(cfg.patch_size, cfg.patch_size, 3, d),
        "patch_bias": jnp.zeros((d,), cfg.dtype),
        "cls_token": jnp.zeros((d,), cfg.dtype),
        "pos_embed": norm(cfg.num_patches + 1, d),
        "layers": layers,
    }


def init_projector(cfg: InternViTConfig, key: jax.Array) -> dict:
    k1, k2 = jax.random.split(key)
    din = cfg.hidden_size * cfg.shuffle_unit
    t = cfg.text_hidden_size
    return {
        "ln_w": jnp.ones((din,), cfg.dtype), "ln_b": jnp.zeros((din,), cfg.dtype),
        "w1": jax.random.normal(k1, (din, t), cfg.dtype) * 0.02,
        "b1": jnp.zeros((t,), cfg.dtype),
        "w2": jax.random.normal(k2, (t, t), cfg.dtype) * 0.02,
        "b2": jnp.zeros((t,), cfg.dtype),
    }


def params_from_hf(state_dict, cfg: InternViTConfig, prefix: str = "vision_tower."):
    """Import HF-format ``InternVLVisionModel`` weights (tower only)."""

    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}

    def stack(fmt, transpose=False):
        arrs = [to_numpy(sd[fmt.format(i)]) for i in range(cfg.num_layers)]
        arrs = [a.T if transpose else a for a in arrs]
        return jnp.asarray(np.stack(arrs), cfg.dtype)

    layers = {
        "ln1_w": stack("encoder.layer.{}.layernorm_before.weight"),
        "ln1_b": stack("encoder.layer.{}.layernorm_before.bias"),
        "ln2_w": stack("encoder.layer.{}.layernorm_after.weight"),
        "ln2_b": stack("encoder.layer.{}.layernorm_after.bias"),
        "wq": stack("encoder.layer.{}.attention.q_proj.weight", True),
        "wk": stack("encoder.layer.{}.attention.k_proj.weight", True),
        "wv": stack("encoder.layer.{}.attention.v_proj.weight", True),
        "wo": stack("encoder.layer.{}.attention.projection_layer.weight", True),
        "bo": stack("encoder.layer.{}.attention.projection_layer.bias"),
        "w_fc1": stack("encoder.layer.{}.mlp.fc1.weight", True),
        "b_fc1": stack("encoder.layer.{}.mlp.fc1.bias"),
        "w_fc2": stack("encoder.layer.{}.mlp.fc2.weight", True),
        "b_fc2": stack("encoder.layer.{}.mlp.fc2.bias"),
        "lambda1": stack("encoder.layer.{}.lambda_1"),
        "lambda2": stack("encoder.layer.{}.lambda_2"),
    }
    if cfg.attention_bias:
        layers["bq"] = stack("encoder.layer.{}.attention.q_proj.bias")
        layers["bk"] = stack("encoder.layer.{}.attention.k_proj.bias")
        layers["bv"] = stack("encoder.layer.{}.attention.v_proj.bias")
    if cfg.use_qk_norm:
        layers["qnorm_w"] = stack("encoder.layer.{}.attention.q_norm.weight")
        layers["knorm_w"] = stack("encoder.layer.{}.attention.k_norm.weight")
    # HF conv kernel (D, 3, k, k) -> HWIO
    kernel = to_numpy(sd["embeddings.patch_embeddings.projection.weight"]).transpose(2, 3, 1, 0)
    return {
        "patch_kernel": jnp.asarray(kernel, cfg.dtype),
        "patch_bias": jnp.asarray(to_numpy(sd["embeddings.patch_embeddings.projection.bias"]), cfg.dtype),
        "cls_token": jnp.asarray(to_numpy(sd["embeddings.cls_token"]).reshape(-1), cfg.dtype),
        "pos_embed": jnp.asarray(to_numpy(sd["embeddings.position_embeddings"])[0], cfg.dtype),
        "layers": layers,
    }


def params_from_remote(state_dict, cfg: InternViTConfig, prefix: str = "vision_model."):
    """Import the HUB checkpoint layout (remote-code ``InternVisionModel``,
    what InternVL2_5-* checkpoints actually ship: fused ``attn.qkv``,
    ``ls1``/``ls2`` layer scales, ``embeddings.position_embedding``).
    Validated against the HF-format importer by renaming in tests."""

    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}
    d = cfg.hidden_size

    def stack(fmt, transpose=False):
        arrs = [to_numpy(sd[fmt.format(i)]) for i in range(cfg.num_layers)]
        arrs = [a.T if transpose else a for a in arrs]
        return jnp.asarray(np.stack(arrs), cfg.dtype)

    wq, wk, wv, bq, bk, bv = [], [], [], [], [], []
    for i in range(cfg.num_layers):
        fused = to_numpy(sd[f"encoder.layers.{i}.attn.qkv.weight"])  # (3D, D)
        wq.append(fused[:d].T)
        wk.append(fused[d : 2 * d].T)
        wv.append(fused[2 * d :].T)
        if cfg.attention_bias:
            fb = to_numpy(sd[f"encoder.layers.{i}.attn.qkv.bias"])
            bq.append(fb[:d])
            bk.append(fb[d : 2 * d])
            bv.append(fb[2 * d :])

    layers = {
        "ln1_w": stack("encoder.layers.{}.norm1.weight"),
        "ln1_b": stack("encoder.layers.{}.norm1.bias"),
        "ln2_w": stack("encoder.layers.{}.norm2.weight"),
        "ln2_b": stack("encoder.layers.{}.norm2.bias"),
        "wq": jnp.asarray(np.stack(wq), cfg.dtype),
        "wk": jnp.asarray(np.stack(wk), cfg.dtype),
        "wv": jnp.asarray(np.stack(wv), cfg.dtype),
        "wo": stack("encoder.layers.{}.attn.proj.weight", True),
        "bo": stack("encoder.layers.{}.attn.proj.bias"),
        "w_fc1": stack("encoder.layers.{}.mlp.fc1.weight", True),
        "b_fc1": stack("encoder.layers.{}.mlp.fc1.bias"),
        "w_fc2": stack("encoder.layers.{}.mlp.fc2.weight", True),
        "b_fc2": stack("encoder.layers.{}.mlp.fc2.bias"),
        "lambda1": stack("encoder.layers.{}.ls1"),
        "lambda2": stack("encoder.layers.{}.ls2"),
    }
    if cfg.attention_bias:
        layers["bq"] = jnp.asarray(np.stack(bq), cfg.dtype)
        layers["bk"] = jnp.asarray(np.stack(bk), cfg.dtype)
        layers["bv"] = jnp.asarray(np.stack(bv), cfg.dtype)
    if cfg.use_qk_norm:
        layers["qnorm_w"] = stack("encoder.layers.{}.attn.q_norm.weight")
        layers["knorm_w"] = stack("encoder.layers.{}.attn.k_norm.weight")
    kernel = to_numpy(sd["embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0)
    return {
        "patch_kernel": jnp.asarray(kernel, cfg.dtype),
        "patch_bias": jnp.asarray(to_numpy(sd["embeddings.patch_embedding.bias"]), cfg.dtype),
        "cls_token": jnp.asarray(to_numpy(sd["embeddings.class_embedding"]).reshape(-1), cfg.dtype),
        "pos_embed": jnp.asarray(to_numpy(sd["embeddings.position_embedding"])[0], cfg.dtype),
        "layers": layers,
    }


def projector_from_remote(state_dict, cfg: InternViTConfig, prefix: str = "mlp1."):
    """Hub-layout projector: ``mlp1`` = Sequential(LayerNorm, Linear, GELU,
    Linear) — the reference's ``extract_feature`` applies it after pixel
    shuffle (modeling_internvl_chat.py:19-33)."""

    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}
    return {
        "ln_w": jnp.asarray(to_numpy(sd["0.weight"]), cfg.dtype),
        "ln_b": jnp.asarray(to_numpy(sd["0.bias"]), cfg.dtype),
        "w1": jnp.asarray(to_numpy(sd["1.weight"]).T, cfg.dtype),
        "b1": jnp.asarray(to_numpy(sd["1.bias"]), cfg.dtype),
        "w2": jnp.asarray(to_numpy(sd["3.weight"]).T, cfg.dtype),
        "b2": jnp.asarray(to_numpy(sd["3.bias"]), cfg.dtype),
    }


def projector_from_hf(state_dict, cfg: InternViTConfig, prefix: str = "multi_modal_projector."):

    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}
    return {
        "ln_w": jnp.asarray(to_numpy(sd["layer_norm.weight"]), cfg.dtype),
        "ln_b": jnp.asarray(to_numpy(sd["layer_norm.bias"]), cfg.dtype),
        "w1": jnp.asarray(to_numpy(sd["linear_1.weight"]).T, cfg.dtype),
        "b1": jnp.asarray(to_numpy(sd["linear_1.bias"]), cfg.dtype),
        "w2": jnp.asarray(to_numpy(sd["linear_2.weight"]).T, cfg.dtype),
        "b2": jnp.asarray(to_numpy(sd["linear_2.bias"]), cfg.dtype),
    }


def _layernorm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


def _rmsnorm(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def encode(params: dict, pixels: jnp.ndarray, cfg: InternViTConfig,
           attn_impl: str = "auto") -> jnp.ndarray:
    """Encode images to last hidden states (CLS + patches).

    Args:
        pixels: (B, H, W, 3).
        attn_impl: "auto" (fused Pallas bidirectional kernel on TPU, einsum
            elsewhere), "pallas", "einsum", or "interpret" — the einsum path
            round-trips the (B·H, N, N) fp32 scores/probs through HBM every
            layer (see ops/kernels/bidir_attention.py).
    Returns:
        (B, num_patches + 1, D).
    """
    if attn_impl == "auto":
        attn_impl = "pallas" if jax.default_backend() == "tpu" else "einsum"
    b = pixels.shape[0]
    patches = jax.lax.conv_general_dilated(
        pixels.astype(cfg.dtype),
        params["patch_kernel"],
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = patches.reshape(b, cfg.num_patches, cfg.hidden_size) + params["patch_bias"]
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"][None]

    nh, hd = cfg.num_heads, cfg.head_dim
    n = x.shape[1]
    scale = 1.0 / hd ** 0.5  # python float: stays static under jit

    def block(x, lp):
        z = _layernorm(x, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        q = z @ lp["wq"] + (lp["bq"] if cfg.attention_bias else 0.0)
        k = z @ lp["wk"] + (lp["bk"] if cfg.attention_bias else 0.0)
        v = z @ lp["wv"] + (lp["bv"] if cfg.attention_bias else 0.0)
        if cfg.use_qk_norm:
            # HF normalizes over the FULL embed dim before the head split.
            q = _rmsnorm(q, lp["qnorm_w"])
            k = _rmsnorm(k, lp["knorm_w"])
        q = q.reshape(b, n, nh, hd)
        k = k.reshape(b, n, nh, hd)
        v = v.reshape(b, n, nh, hd)
        if attn_impl in ("pallas", "interpret"):
            from ...ops.kernels.bidir_attention import flash_bidir_attention

            out = flash_bidir_attention(q, k, v, scale=scale,
                                        interpret=attn_impl == "interpret")
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * jnp.float32(scale)
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
        out = out.reshape(b, n, cfg.hidden_size).astype(x.dtype)
        x = x + lp["lambda1"] * (out @ lp["wo"] + lp["bo"])
        z = _layernorm(x, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        z = jax.nn.gelu(z @ lp["w_fc1"] + lp["b_fc1"], approximate=False)
        return x + lp["lambda2"] * (z @ lp["w_fc2"] + lp["b_fc2"]), None

    x, _ = jax.lax.scan(block, x, params["layers"])
    return x  # final layernorm is identity (use_mean_pooling checkpoints)


def pixel_shuffle(x: jnp.ndarray, scale_factor: float = 0.5) -> jnp.ndarray:
    """HF InternVLModel.pixel_shuffle parity: (B, W, H, C) ->
    (B, W*sf, H*sf, C/sf^2) via the same view/permute sequence."""
    b, w, h, c = x.shape
    x = x.reshape(b, w, int(h * scale_factor), int(c / scale_factor))
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(b, int(h * scale_factor), int(w * scale_factor), int(c / (scale_factor ** 2)))
    return x.transpose(0, 2, 1, 3)


def extract_features(vit_params: dict, proj_params: dict, pixels: jnp.ndarray,
                     cfg: InternViTConfig) -> jnp.ndarray:
    """Pixels -> per-image LLM embedding rows (the reference's
    ``extract_feature``, modeling_internvl_chat.py:19-33 / HF
    InternVLModel.get_image_features): encode, drop CLS, reshape to the
    patch grid, pixel-shuffle by downsample_ratio, project.

    Returns: (B, tokens_per_image, text_hidden_size).
    """
    feats = encode(vit_params, pixels, cfg)[:, 1:, :]  # drop CLS
    b = feats.shape[0]
    side = cfg.patches_per_side
    feats = feats.reshape(b, side, side, cfg.hidden_size)
    feats = pixel_shuffle(feats, cfg.downsample_ratio)
    feats = feats.reshape(b, -1, feats.shape[-1])
    z = _layernorm(feats, proj_params["ln_w"], proj_params["ln_b"], 1e-5)
    z = jax.nn.gelu(z @ proj_params["w1"] + proj_params["b1"], approximate=False)
    return z @ proj_params["w2"] + proj_params["b2"]
