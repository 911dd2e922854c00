"""Pallas TPU fused bidirectional attention for vision towers.

The reference's vision encoders ride external packages' SDPA
(/root/reference/framefusion/models/llava_video.py delegates to LLaVA-NeXT's
``vision_tower``; SURVEY.md §2), so tower attention perf is someone else's
problem there. Here the towers are in-repo, and the XLA einsum path
materialises the (B·H, N, N) fp32 score and probability tensors in HBM every
layer — at so400m/64-frame geometry (N=729, 27 layers) that is ~200 GB of
pure softmax traffic, which measured ~2x over the tower's matmul floor
(DEVNOTES r4). ViT sequences are short enough that a whole (N, N) fp32 score
tile fits VMEM, so no online softmax is needed: one grid step loads a few
heads' Q/K/V, computes exact softmax rows in-register, and writes only the
(N, hd) outputs — zero HBM intermediates.

Grid: (B, H / heads_per_step). Head loop INSIDE the kernel (fori_loop) so the
fp32 score tile is live for one head at a time while Q/K/V DMAs amortise over
the step (the ~14 us fixed per-grid-step overhead dominates small-tile
kernels otherwise — same design as flash_prefill's grouped-multi kernel).

Padding: N to a lane multiple (128) with masked keys, head_dim to 128 with
zeros (zero-padding the contraction dim leaves q.k unchanged; the scale uses
the REAL head_dim). Padded query rows produce garbage and are sliced off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _bidir_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid, heads):
    n_pad = q_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    key_ok = col < n_valid

    def one_head(i, _):
        q = q_ref[0, i]  # (N_pad, hd_pad)
        k = k_ref[0, i]
        v = v_ref[0, i]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = jnp.where(key_ok, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            (p / l).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, i] = pv.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, heads, one_head, 0)


def _pad_to(x, axis, mult):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_bidir_attention(q, k, v, *, scale=None, heads_per_step: int = 4,
                          interpret: bool = False):
    """Fused non-causal attention: q/k/v (B, N, H, hd) -> (B, N, H, hd).

    All N keys attend to all N queries (ViT encoder semantics). ``scale``
    defaults to 1/sqrt(real hd). VMEM per grid step at so400m geometry
    (N=729->768, hd=72->128, heads_per_step=4, bf16): Q/K/V 2.4 MB + one
    fp32 (768, 768) score tile 2.4 MB + exp rows ~2.4 MB + out ~0.8 MB,
    comfortably under the 16 MB scoped limit with the >=3 MB margin rule
    (DEVNOTES).
    """
    b, n, h, hd = q.shape
    if scale is None:
        scale = 1.0 / float(hd) ** 0.5
    hb = min(heads_per_step, h)
    # VMEM budget per grid step (bytes): Q/K/V + out blocks for hb heads,
    # plus one fp32 (N, N) score tile and its exp (live together in the
    # worst case). Shrink hb until it fits 12 MB — the 16 MB scoped limit
    # minus the >=3 MB margin DEVNOTES calls for (AOT-composed kernels have
    # overflowed with less) and slack for fori_loop temporaries.
    n_pad_est = -(-n // 128) * 128
    hd_pad_est = -(-hd // 128) * 128
    itemsize = jnp.dtype(q.dtype).itemsize
    score_bytes = 2 * n_pad_est * n_pad_est * 4
    per_head = 4 * n_pad_est * hd_pad_est * itemsize
    while hb > 1 and score_bytes + hb * per_head > 12 * 2**20:
        hb -= 1
    while h % hb:
        hb -= 1

    def prep(x):
        x = x.transpose(0, 2, 1, 3)  # (B, H, N, hd)
        x = _pad_to(x, 2, 128)
        return _pad_to(x, 3, 128)

    q_p, k_p, v_p = prep(q), prep(k), prep(v)
    n_pad, hd_pad = q_p.shape[2], q_p.shape[3]
    out = pl.pallas_call(
        functools.partial(_bidir_kernel, scale=scale, n_valid=n, heads=hb),
        grid=(b, h // hb),
        in_specs=[
            pl.BlockSpec((1, hb, n_pad, hd_pad), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=pl.BlockSpec((1, hb, n_pad, hd_pad), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, n_pad, hd_pad), q.dtype),
        interpret=interpret,
    )(q_p, k_p, v_p)
    return out[:, :, :n, :hd].transpose(0, 2, 1, 3)
