"""Rotary position embeddings: standard RoPE and Qwen2-VL mRoPE.

Design note (SURVEY.md §7): the reference carries mutable cos/sin tables
through the layer stack and gathers them under keep masks every compression
event (/root/reference/framefusion/main.py:142-178). Here the carried object
is the integer ``position_ids`` (1D, or 3xS for mRoPE); cos/sin are recomputed
from them inside each jitted segment — cheaper than gathering two (S, head_dim)
tables per event and shape-stable under compaction.

Parity:
  * Standard RoPE as in HF Qwen2 (half-rotation layout: rotate_half).
  * mRoPE as in HF Qwen2-VL ``apply_multimodal_rotary_pos_emb`` with
    ``mrope_section`` (reference models/qwen2/modeling_qwen2_vl.py:261-264):
    the head_dim/2 frequency slots are partitioned into sections, each taking
    cos/sin from one of the 3 position streams (temporal, height, width).
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(position_ids: jnp.ndarray, head_dim: int, theta: float):
    """cos/sin tables for given integer positions.

    Args:
        position_ids: (..., S) int32.
        head_dim: static head dimension (even).
    Returns:
        (cos, sin): each (..., S, head_dim) fp32, duplicated half layout
        (freqs concatenated with themselves, as in HF).
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq  # (..., S, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Apply rotary embedding.

    Args:
        q: (S, Hq, D), k: (S, Hk, D); cos/sin: (S, D) fp32.
    """
    c = cos[:, None, :]
    s = sin[:, None, :]
    q_out = q.astype(jnp.float32) * c + _rotate_half(q.astype(jnp.float32)) * s
    k_out = k.astype(jnp.float32) * c + _rotate_half(k.astype(jnp.float32)) * s
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def mrope_cos_sin(position_ids_3d: jnp.ndarray, head_dim: int, theta: float, mrope_section: tuple[int, ...]):
    """Multimodal RoPE cos/sin from 3 position streams.

    Args:
        position_ids_3d: (3, S) int32 — (temporal, height, width) positions.
        mrope_section: per-stream section sizes over the head_dim/2 frequency
            slots; sums to head_dim/2. Stream assignment cycles t,h,w over the
            sections (HF semantics: section i uses stream i % 3).

    Returns:
        (cos, sin): (S, head_dim) fp32 assembled across sections.
    """
    cos3, sin3 = rope_cos_sin(position_ids_3d, head_dim, theta)  # (3, S, D)
    half = head_dim // 2
    assert sum(mrope_section) == half, "mrope_section must sum to head_dim/2"
    # Build a per-frequency-slot stream selector, duplicated to both halves.
    sel = []
    for i, sec in enumerate(mrope_section):
        sel.extend([i % 3] * sec)
    sel = jnp.asarray(sel + sel, dtype=jnp.int32)  # (head_dim,)
    cos = jnp.take_along_axis(cos3, sel[None, None, :].repeat(cos3.shape[1], axis=1), axis=0)[0]
    sin = jnp.take_along_axis(sin3, sel[None, None, :].repeat(sin3.shape[1], axis=1), axis=0)[0]
    return cos, sin
