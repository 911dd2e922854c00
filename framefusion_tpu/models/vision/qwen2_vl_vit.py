"""Qwen2-VL vision transformer (the ``visual`` tower) — TPU-native.

The reference delegates vision to HF's ``Qwen2VisionTransformerPretrainedModel``
(reference models/qwenvl/modeling_qwen2_vl.py:95-111 calls ``self.visual``);
a standalone TPU framework needs its own. Architecture (HF parity, verified
in tests/test_vision.py::TestQwen2VLViTVsHF):

  * patch embed: Conv3D (temporal_patch x patch x patch, no bias) over
    flattened pixel patches — here ONE matmul, since stride == kernel;
  * 2D rotary position embedding over (h, w) patch coordinates, head_dim/4
    frequencies per axis, applied to q and k (non-causal);
  * ``depth`` pre-LN blocks: LayerNorm -> full attention within each frame
    (HF splits by cu_seqlens per temporal frame) -> LayerNorm -> MLP
    (quick_gelu);
  * PatchMerger: LayerNorm, then each 2x2 spatial block (contiguous rows —
    the processor emits patches in merge-block order) through
    Linear(4D -> 4D) -> GELU -> Linear(4D -> llm_hidden).

TPU design notes: the per-frame attention is a single batched einsum over a
static (t, h*w) reshape — no masks, no raggedness (one jitted program per
grid shape, and video grids are fixed per deployment). The patch embedding
is a dense (N, C*tp*p*p) x (C*tp*p*p, D) matmul that XLA tiles onto the MXU
directly, unlike a strided conv3d lowering.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...weights import to_numpy


@dataclasses.dataclass(frozen=True)
class Qwen2VLViTConfig:
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    patch_size: int = 14
    temporal_patch_size: int = 2
    in_channels: int = 3
    spatial_merge_size: int = 2
    mlp_ratio: float = 4.0
    hidden_size: int = 3584  # LLM hidden (merger output)
    layer_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    dtype: jnp.dtype = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2

    @property
    def mlp_hidden(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size ** 2


def tiny_qwen2vl_vit_config(**kw) -> Qwen2VLViTConfig:
    base = dict(embed_dim=64, depth=2, num_heads=4, patch_size=7,
                temporal_patch_size=2, mlp_ratio=2.0, hidden_size=32)
    base.update(kw)
    return Qwen2VLViTConfig(**base)


def init_params(cfg: Qwen2VLViTConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 8))

    def norm(*shape, scale=0.02):
        return jax.random.normal(next(keys), shape, cfg.dtype) * jnp.asarray(scale, cfg.dtype)

    d, i, n_l = cfg.embed_dim, cfg.mlp_hidden, cfg.depth
    mu = cfg.merge_unit
    layers = {
        "ln1_w": jnp.ones((n_l, d), cfg.dtype), "ln1_b": jnp.zeros((n_l, d), cfg.dtype),
        "ln2_w": jnp.ones((n_l, d), cfg.dtype), "ln2_b": jnp.zeros((n_l, d), cfg.dtype),
        "w_qkv": norm(n_l, d, 3 * d), "b_qkv": jnp.zeros((n_l, 3 * d), cfg.dtype),
        "wo": norm(n_l, d, d), "bo": jnp.zeros((n_l, d), cfg.dtype),
        "w_fc1": norm(n_l, d, i), "b_fc1": jnp.zeros((n_l, i), cfg.dtype),
        "w_fc2": norm(n_l, i, d), "b_fc2": jnp.zeros((n_l, d), cfg.dtype),
    }
    return {
        "patch_proj": norm(cfg.patch_dim, d),
        "layers": layers,
        "merger_ln_w": jnp.ones((d,), cfg.dtype),
        "merger_ln_b": jnp.zeros((d,), cfg.dtype),
        "merger_w0": norm(mu * d, mu * d),
        "merger_b0": jnp.zeros((mu * d,), cfg.dtype),
        "merger_w1": norm(mu * d, cfg.hidden_size),
        "merger_b1": jnp.zeros((cfg.hidden_size,), cfg.dtype),
    }


def params_from_hf(state_dict, cfg: Qwen2VLViTConfig, prefix: str = "visual.") -> dict:
    """Import HF ``Qwen2VisionTransformerPretrainedModel`` weights.

    ``state_dict``: name -> numpy/torch tensor; ``prefix`` is the tower's path
    inside the checkpoint (``"visual."`` at Qwen2VLModel scope,
    ``"model.visual."`` from a full Qwen2VLForConditionalGeneration dict).
    """

    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}

    def stack(fmt, transpose=False):
        arrs = [to_numpy(sd[fmt.format(i)]) for i in range(cfg.depth)]
        arrs = [a.T if transpose else a for a in arrs]
        return jnp.asarray(np.stack(arrs), cfg.dtype)

    layers = {
        "ln1_w": stack("blocks.{}.norm1.weight"), "ln1_b": stack("blocks.{}.norm1.bias"),
        "ln2_w": stack("blocks.{}.norm2.weight"), "ln2_b": stack("blocks.{}.norm2.bias"),
        "w_qkv": stack("blocks.{}.attn.qkv.weight", True),
        "b_qkv": stack("blocks.{}.attn.qkv.bias"),
        "wo": stack("blocks.{}.attn.proj.weight", True),
        "bo": stack("blocks.{}.attn.proj.bias"),
        "w_fc1": stack("blocks.{}.mlp.fc1.weight", True),
        "b_fc1": stack("blocks.{}.mlp.fc1.bias"),
        "w_fc2": stack("blocks.{}.mlp.fc2.weight", True),
        "b_fc2": stack("blocks.{}.mlp.fc2.bias"),
    }
    # Conv3d kernel (D, C, tp, p, p): stride == kernel, so it is exactly a
    # (C*tp*p*p -> D) matmul over the processor's flattened patch rows.
    kernel = to_numpy(sd["patch_embed.proj.weight"]).reshape(cfg.embed_dim, cfg.patch_dim).T
    return {
        "patch_proj": jnp.asarray(kernel, cfg.dtype),
        "layers": layers,
        "merger_ln_w": jnp.asarray(to_numpy(sd["merger.ln_q.weight"]), cfg.dtype),
        "merger_ln_b": jnp.asarray(to_numpy(sd["merger.ln_q.bias"]), cfg.dtype),
        "merger_w0": jnp.asarray(to_numpy(sd["merger.mlp.0.weight"]).T, cfg.dtype),
        "merger_b0": jnp.asarray(to_numpy(sd["merger.mlp.0.bias"]), cfg.dtype),
        "merger_w1": jnp.asarray(to_numpy(sd["merger.mlp.2.weight"]).T, cfg.dtype),
        "merger_b1": jnp.asarray(to_numpy(sd["merger.mlp.2.bias"]), cfg.dtype),
    }


def _layernorm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def vision_rope_cos_sin(grid_h: int, grid_w: int, cfg: Qwen2VLViTConfig):
    """(h*w, head_dim) cos/sin for one frame, in the processor's merge-block
    patch order (HF ``rot_pos_emb``: block-major (hb, wb), then (mh, mw)
    within each spatial_merge_size^2 block). head_dim/4 frequencies per axis,
    h-freqs then w-freqs, duplicated to both halves."""
    m = cfg.spatial_merge_size
    dim = cfg.head_dim // 2  # VisionRotaryEmbedding dim
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))

    hb, wb = grid_h // m, grid_w // m
    hpos = np.arange(grid_h).reshape(hb, m, 1, 1) + np.zeros((1, 1, wb, m), np.int64)
    wpos = np.arange(grid_w).reshape(1, 1, wb, m) + np.zeros((hb, m, 1, 1), np.int64)
    # block order: (hb, wb, mh, mw)
    hpos = hpos.transpose(0, 2, 1, 3).reshape(-1)
    wpos = wpos.transpose(0, 2, 1, 3).reshape(-1)
    freqs = np.concatenate(
        [hpos[:, None] * inv_freq[None, :], wpos[:, None] * inv_freq[None, :]], axis=-1
    )  # (hw, head_dim/2)
    emb = np.concatenate([freqs, freqs], axis=-1)  # (hw, head_dim)
    return jnp.asarray(np.cos(emb), jnp.float32), jnp.asarray(np.sin(emb), jnp.float32)


def _apply_vision_rope(x, cos, sin):
    """x: (t, hw, H, hd); cos/sin: (hw, hd)."""
    xf = x.astype(jnp.float32)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (xf * c + _rotate_half(xf) * s).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("grid_t", "grid_h", "grid_w", "cfg", "attn_impl"))
def encode_video(params: dict, patches: jnp.ndarray, grid_t: int, grid_h: int,
                 grid_w: int, cfg: Qwen2VLViTConfig, attn_impl: str = "auto") -> jnp.ndarray:
    """Encode one video's pixel patches to LLM embedding rows.

    Args:
        patches: (grid_t*grid_h*grid_w, C*tp*p*p) flattened pixel patches in
            the HF processor layout (t-major, merge-block order, each row
            (C, tp, p, p)-flattened).
        attn_impl: "auto" (fused Pallas bidirectional kernel on TPU, einsum
            elsewhere), "pallas", "einsum", or "interpret" — per-frame
            non-causal attention maps onto ops/kernels/bidir_attention.py
            with B = grid_t, N = grid_h*grid_w.
    Returns:
        (grid_t * grid_h * grid_w / merge^2, hidden_size) — one row per
        merged 2x2 patch, the layout ``masked_scatter``'d into the prompt by
        the reference (qwenvl/modeling_qwen2_vl.py:95-111).
    """
    if attn_impl == "auto":
        attn_impl = "pallas" if jax.default_backend() == "tpu" else "einsum"
    n = grid_t * grid_h * grid_w
    assert patches.shape == (n, cfg.patch_dim), patches.shape
    hw = grid_h * grid_w
    hd = cfg.head_dim
    nh = cfg.num_heads
    scale = 1.0 / hd ** 0.5  # python float: stays static under jit

    x = patches.astype(cfg.dtype) @ params["patch_proj"]  # (N, D)
    cos, sin = vision_rope_cos_sin(grid_h, grid_w, cfg)

    def block(x, lp):
        z = _layernorm(x, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        qkv = (z @ lp["w_qkv"] + lp["b_qkv"]).reshape(n, 3, nh, hd)
        q = qkv[:, 0].reshape(grid_t, hw, nh, hd)
        k = qkv[:, 1].reshape(grid_t, hw, nh, hd)
        v = qkv[:, 2].reshape(grid_t, hw, nh, hd)
        q = _apply_vision_rope(q, cos, sin)
        k = _apply_vision_rope(k, cos, sin)
        # Full (non-causal) attention within each frame: HF splits the
        # sequence at cu_seqlens = multiples of h*w (one chunk per frame).
        if attn_impl in ("pallas", "interpret"):
            from ...ops.kernels.bidir_attention import flash_bidir_attention

            out = flash_bidir_attention(q, k, v, scale=scale,
                                        interpret=attn_impl == "interpret")
        else:
            scores = jnp.einsum("tqhd,tkhd->thqk", q, k, preferred_element_type=jnp.float32) * jnp.float32(scale)
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("thqk,tkhd->tqhd", probs.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
        out = out.reshape(n, cfg.embed_dim).astype(x.dtype)
        x = x + (out @ lp["wo"] + lp["bo"])
        z = _layernorm(x, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        z = z @ lp["w_fc1"] + lp["b_fc1"]
        z = z * jax.nn.sigmoid(1.702 * z)  # quick_gelu
        return x + (z @ lp["w_fc2"] + lp["b_fc2"]), None

    x, _ = jax.lax.scan(block, x, params["layers"])

    z = _layernorm(x, params["merger_ln_w"], params["merger_ln_b"], cfg.layer_norm_eps)
    z = z.reshape(n // cfg.merge_unit, cfg.merge_unit * cfg.embed_dim)
    z = jax.nn.gelu(z @ params["merger_w0"] + params["merger_b0"], approximate=False)
    return z @ params["merger_w1"] + params["merger_b1"]


def pixels_to_patches(frames: np.ndarray, cfg: Qwen2VLViTConfig):
    """Raw video frames -> (flattened patches, (grid_t, grid_h, grid_w)).

    Mirrors the HF ``Qwen2VLImageProcessor`` patch layout (temporal pairing
    with last-frame repeat for odd counts; merge-block ordering) — minus the
    resize/normalize, which live in the caller's preprocessing.

    Args:
        frames: (T, H, W, C) float pixels, H/W multiples of
            patch_size * spatial_merge_size.
    """
    t, h, w, c = frames.shape
    p, tp, m = cfg.patch_size, cfg.temporal_patch_size, cfg.spatial_merge_size
    assert h % (p * m) == 0 and w % (p * m) == 0, (h, w)
    if t % tp:
        frames = np.concatenate([frames, np.repeat(frames[-1:], tp - t % tp, axis=0)])
        t = frames.shape[0]
    grid_t, grid_h, grid_w = t // tp, h // p, w // p
    x = frames.transpose(0, 3, 1, 2)  # (T, C, H, W)
    x = x.reshape(grid_t, tp, c, grid_h // m, m, p, grid_w // m, m, p)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return (
        x.reshape(grid_t * grid_h * grid_w, cfg.patch_dim),
        (grid_t, grid_h, grid_w),
    )
