"""NVILA vision frontend: SigLIP features -> space-to-channel downsampled
video tokens.

The reference's NVILA hook consumes features produced by the VILA package's
tower + ``mlp_downsample`` projector (reference models/nvila/llava_arch.py:
40-51 derives ``patch_num = tokens/frames`` after the pool scaling). The
VILA package is not importable offline; this implements its documented
``mlp_downsample`` connector — 2x2 spatial neighbors concatenated
channel-wise (space-to-channel), LayerNorm, then a 2-layer GELU MLP into
LLM width — pinned by behavioral tests (no external oracle, unlike the
SigLIP tower underneath, which is HF-parity tested).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NvilaProjectorConfig:
    vision_dim: int = 1152
    llm_dim: int = 3584
    pool: int = 2  # space-to-channel factor
    dtype: jnp.dtype = jnp.float32


def init_projector(cfg: NvilaProjectorConfig, key: jax.Array) -> dict:
    k1, k2 = jax.random.split(key)
    din = cfg.vision_dim * cfg.pool * cfg.pool
    return {
        "ln_w": jnp.ones((din,), cfg.dtype), "ln_b": jnp.zeros((din,), cfg.dtype),
        "w1": jax.random.normal(k1, (din, cfg.llm_dim), cfg.dtype) * 0.02,
        "b1": jnp.zeros((cfg.llm_dim,), cfg.dtype),
        "w2": jax.random.normal(k2, (cfg.llm_dim, cfg.llm_dim), cfg.dtype) * 0.02,
        "b2": jnp.zeros((cfg.llm_dim,), cfg.dtype),
    }


def _layernorm(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


def space_to_channel(feats: jnp.ndarray, side: int, pool: int) -> jnp.ndarray:
    """(B, side*side, D) -> (B, (side/pool)^2, D*pool^2): each pool x pool
    spatial block's features concatenate along channels (VILA
    mlp_downsample's flatten order: row-major within the block)."""
    b, n, d = feats.shape
    assert n == side * side and side % pool == 0
    ps = side // pool
    grid = feats.reshape(b, ps, pool, ps, pool, d)
    grid = grid.transpose(0, 1, 3, 2, 4, 5)  # (B, ps, ps, pool, pool, D)
    return grid.reshape(b, ps * ps, pool * pool * d)


def encode_video(vit_params: dict, vit_cfg, proj: dict, cfg: NvilaProjectorConfig,
                 frames: jnp.ndarray, frame_batch: int = 16) -> jnp.ndarray:
    """(n_frames, H, W, 3) -> (n_frames * patch_num, llm_dim) with
    patch_num = (patches_per_side/pool)^2 — the geometry the NVILA adapter's
    ``patch_num = tokens/frames`` expects (llava_arch.py:41-51)."""
    from . import siglip

    side = vit_cfg.patches_per_side
    outs = []
    for i in range(0, frames.shape[0], frame_batch):
        feats = siglip.encode(vit_params, frames[i:i + frame_batch], vit_cfg,
                              feature_layer=-2)
        z = space_to_channel(feats, side, cfg.pool)
        z = _layernorm(z, proj["ln_w"], proj["ln_b"])
        z = jax.nn.gelu(z @ proj["w1"] + proj["b1"], approximate=False)
        z = z @ proj["w2"] + proj["b2"]
        outs.append(z.reshape(-1, cfg.llm_dim))
    return jnp.concatenate(outs, axis=0)
