"""LLaVA-Video vision frontend: ViT features -> LLM-ready video tokens.

The reference pipeline (reference modeling_llava_video.py:47-56 + the
LLaVA-NeXT package internals it calls): encode frames with the vision tower
(penultimate layer), project to LLM width with a 2-layer GELU MLP, 2x2
average-pool the spatial grid (``mm_spatial_pool_mode='average'``,
``mm_spatial_pool_stride=2``), and append one learned ``image_newline`` token
per pooled row — yielding ``patch_size*(patch_size+1)`` tokens per frame, the
``patch_num`` the adapter expects (modeling_llava_video.py:322-326).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import siglip


def init_projector(key, vision_dim: int, llm_dim: int, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    scale = jnp.asarray(0.02, dtype)
    return {
        "w1": jax.random.normal(k1, (vision_dim, llm_dim), dtype) * scale,
        "b1": jnp.zeros((llm_dim,), dtype),
        "w2": jax.random.normal(k2, (llm_dim, llm_dim), dtype) * scale,
        "b2": jnp.zeros((llm_dim,), dtype),
        "image_newline": jax.random.normal(k3, (llm_dim,), dtype) * scale,
    }


def project(proj: dict, feats: jnp.ndarray) -> jnp.ndarray:
    x = feats @ proj["w1"] + proj["b1"]
    return jax.nn.gelu(x, approximate=False) @ proj["w2"] + proj["b2"]


def pool_2d(feats: jnp.ndarray, side: int, stride: int = 2) -> jnp.ndarray:
    """(B, side*side, D) -> (B, (side//stride)^2, D) average pooling."""
    b, n, d = feats.shape
    assert n == side * side
    grid = feats.reshape(b, side, side, d)
    pooled_side = side // stride
    grid = grid[:, : pooled_side * stride, : pooled_side * stride]
    grid = grid.reshape(b, pooled_side, stride, pooled_side, stride, d).mean(axis=(2, 4))
    return grid, pooled_side


def encode_video(
    vit_params: dict,
    vit_cfg: siglip.ViTConfig,
    proj: dict,
    frames: jnp.ndarray,
    feature_layer: int = -2,
    pool_stride: int = 2,
    frame_batch: int = 16,
    attn_impl: str = "auto",
    w8a8: bool = False,
) -> jnp.ndarray:
    """(n_frames, H, W, 3) pixels -> (n_frames * patch_num, llm_dim) tokens.

    patch_num = pooled_side * (pooled_side + 1): each pooled row is followed
    by the learned newline token. Frames are encoded in batches of
    ``frame_batch`` — the ViT's full-attention activations for 64 frames at
    384px would not fit next to a resident 7B LLM. ``w8a8`` rides int8
    encoder matmuls (siglip.quantize_tower_int8 params required).
    """

    def encode_batch(batch):
        feats = siglip.encode(vit_params, batch, vit_cfg, feature_layer=feature_layer,
                              attn_impl=attn_impl, w8a8=w8a8)
        feats = project(proj, feats)
        grid, pooled_side = pool_2d(feats, vit_cfg.patches_per_side, pool_stride)
        b, ps, d = grid.shape[0], pooled_side, grid.shape[-1]
        newline = jnp.broadcast_to(proj["image_newline"], (b, ps, 1, d)).astype(grid.dtype)
        with_newline = jnp.concatenate([grid, newline], axis=2)  # (B, ps, ps+1, D)
        return with_newline.reshape(b * ps * (ps + 1), d)

    n = frames.shape[0]
    if n <= frame_batch:
        return encode_batch(frames)
    chunks = [
        encode_batch(frames[i : i + frame_batch]) for i in range(0, n, frame_batch)
    ]
    return jnp.concatenate(chunks, axis=0)
