"""MiniCPM-V vision frontend: SigLIP features -> 64 resampled tokens/frame.

The reference's hook consumes ``self.vpm`` (a SigLIP tower) + a perceiver
``self.resampler`` from the MiniCPM-V remote package
(reference models/minicpmv/modeling_minicpmv.py:36-47: vpm last_hidden_state
-> resampler(vision_embedding, tgt_sizes) -> 64 tokens per frame scattered
at the image bounds). The remote package is not importable offline, so
unlike the SigLIP/Qwen2-VL/InternViT towers this resampler has NO external
parity oracle — it implements the published architecture (learned queries,
2D sincos position embedding over the variable patch grid, single
cross-attention block) and is pinned by its own behavioral tests
(tests/test_vision.py::TestMiniCPMVFrontend).

Architecture (MiniCPM-V 2.6 Resampler):
  * ``num_queries`` learned query vectors in LLM width;
  * keys/values = Linear(vision_dim -> llm_dim) of the ViT features, keys
    additionally carry a non-learned 2D sin-cos position embedding built
    for the frame's (h, w) patch grid;
  * one multi-head cross-attention (queries x keys), then LayerNorm and an
    output projection matrix.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    num_queries: int = 64
    embed_dim: int = 3584  # LLM hidden
    num_heads: int = 28
    kv_dim: int = 1152  # SigLIP width
    max_size: int = 70  # max patches per side for the pos-embed table
    dtype: jnp.dtype = jnp.float32


def tiny_resampler_config(**kw) -> ResamplerConfig:
    base = dict(num_queries=8, embed_dim=64, num_heads=4, kv_dim=64, max_size=16)
    base.update(kw)
    return ResamplerConfig(**base)


def sincos_pos_embed_2d(h: int, w: int, dim: int) -> np.ndarray:
    """(h*w, dim) 2D sin-cos position embedding (half the channels encode
    the row coordinate, half the column; the standard ViT/MAE construction
    the MiniCPM resampler uses)."""
    assert dim % 4 == 0
    quarter = dim // 4
    omega = 1.0 / (10000 ** (np.arange(quarter, dtype=np.float64) / quarter))

    def axis(pos):
        out = pos[:, None] * omega[None, :]
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)  # (n, dim/2)

    gh = np.repeat(np.arange(h, dtype=np.float64), w)
    gw = np.tile(np.arange(w, dtype=np.float64), h)
    return np.concatenate([axis(gh), axis(gw)], axis=1).astype(np.float32)


def init_params(cfg: ResamplerConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 8))

    def norm(*shape, scale=0.02):
        return jax.random.normal(next(keys), shape, cfg.dtype) * jnp.asarray(scale, cfg.dtype)

    d = cfg.embed_dim
    return {
        "query": norm(cfg.num_queries, d),
        "w_kv": norm(cfg.kv_dim, d),  # kv_proj (no bias)
        "ln_q_w": jnp.ones((d,), cfg.dtype), "ln_q_b": jnp.zeros((d,), cfg.dtype),
        "ln_kv_w": jnp.ones((d,), cfg.dtype), "ln_kv_b": jnp.zeros((d,), cfg.dtype),
        "w_q": norm(d, d), "b_q": jnp.zeros((d,), cfg.dtype),
        "w_k": norm(d, d), "b_k": jnp.zeros((d,), cfg.dtype),
        "w_v": norm(d, d), "b_v": jnp.zeros((d,), cfg.dtype),
        "w_o": norm(d, d), "b_o": jnp.zeros((d,), cfg.dtype),
        "ln_post_w": jnp.ones((d,), cfg.dtype), "ln_post_b": jnp.zeros((d,), cfg.dtype),
        "proj": norm(d, d),
    }


def params_from_remote(state_dict, cfg: ResamplerConfig, prefix: str = "resampler."):
    """Import the hub checkpoint layout (MiniCPM-V remote ``Resampler``):
    fused ``attn.in_proj_*`` (torch MultiheadAttention packing q|k|v),
    ``kv_proj`` (no bias), ``ln_q``/``ln_kv``/``ln_post``, the raw ``proj``
    parameter matrix (applied as x @ proj) and the learned ``query``."""
    from ...weights import to_numpy

    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}
    d = cfg.embed_dim
    in_w = to_numpy(sd["attn.in_proj_weight"])  # (3D, D)
    in_b = to_numpy(sd["attn.in_proj_bias"])
    return {
        "query": jnp.asarray(to_numpy(sd["query"]), cfg.dtype),
        "w_kv": jnp.asarray(to_numpy(sd["kv_proj.weight"]).T, cfg.dtype),
        "ln_q_w": jnp.asarray(to_numpy(sd["ln_q.weight"]), cfg.dtype),
        "ln_q_b": jnp.asarray(to_numpy(sd["ln_q.bias"]), cfg.dtype),
        "ln_kv_w": jnp.asarray(to_numpy(sd["ln_kv.weight"]), cfg.dtype),
        "ln_kv_b": jnp.asarray(to_numpy(sd["ln_kv.bias"]), cfg.dtype),
        "w_q": jnp.asarray(in_w[:d].T, cfg.dtype),
        "b_q": jnp.asarray(in_b[:d], cfg.dtype),
        "w_k": jnp.asarray(in_w[d:2 * d].T, cfg.dtype),
        "b_k": jnp.asarray(in_b[d:2 * d], cfg.dtype),
        "w_v": jnp.asarray(in_w[2 * d:].T, cfg.dtype),
        "b_v": jnp.asarray(in_b[2 * d:], cfg.dtype),
        "w_o": jnp.asarray(to_numpy(sd["attn.out_proj.weight"]).T, cfg.dtype),
        "b_o": jnp.asarray(to_numpy(sd["attn.out_proj.bias"]), cfg.dtype),
        "ln_post_w": jnp.asarray(to_numpy(sd["ln_post.weight"]), cfg.dtype),
        "ln_post_b": jnp.asarray(to_numpy(sd["ln_post.bias"]), cfg.dtype),
        "proj": jnp.asarray(to_numpy(sd["proj"]), cfg.dtype),
    }


def _layernorm(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


def resample(params: dict, features: jnp.ndarray, grid_h: int, grid_w: int,
             cfg: ResamplerConfig) -> jnp.ndarray:
    """(B, h*w, kv_dim) ViT features -> (B, num_queries, embed_dim)."""
    b = features.shape[0]
    d, nh = cfg.embed_dim, cfg.num_heads
    hd = d // nh

    kv = features @ params["w_kv"]  # (B, N, D)
    kv = _layernorm(kv, params["ln_kv_w"], params["ln_kv_b"])
    pos = jnp.asarray(sincos_pos_embed_2d(grid_h, grid_w, d))  # (N, D)
    q = _layernorm(params["query"], params["ln_q_w"], params["ln_q_b"])  # (Q, D)

    qh = (q @ params["w_q"] + params["b_q"]).reshape(cfg.num_queries, nh, hd)
    kh = ((kv + pos[None]) @ params["w_k"] + params["b_k"]).reshape(b, -1, nh, hd)
    vh = (kv @ params["w_v"] + params["b_v"]).reshape(b, -1, nh, hd)
    scores = jnp.einsum("qhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores / jnp.sqrt(hd).astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(vh.dtype), vh,
                     preferred_element_type=jnp.float32)
    out = out.reshape(b, cfg.num_queries, d).astype(features.dtype)
    out = out @ params["w_o"] + params["b_o"]
    out = _layernorm(out, params["ln_post_w"], params["ln_post_b"])
    return out @ params["proj"]


def encode_video(vit_params: dict, vit_cfg, res_params: dict, res_cfg: ResamplerConfig,
                 frames: jnp.ndarray, frame_batch: int = 16) -> jnp.ndarray:
    """(n_frames, H, W, 3) pixels -> (n_frames, num_queries, embed_dim):
    SigLIP encode (last hidden state, like ``self.vpm(...).last_hidden_state``)
    then perceiver resampling per frame."""
    from . import siglip

    side = vit_cfg.patches_per_side
    outs = []
    for i in range(0, frames.shape[0], frame_batch):
        feats = siglip.encode(vit_params, frames[i:i + frame_batch], vit_cfg,
                              feature_layer=-1)
        outs.append(resample(res_params, feats, side, side, res_cfg))
    return jnp.concatenate(outs, axis=0)
