"""Pallas TPU ragged decode attention.

Decode after a compressed prefill attends per-layer caches of *different*
lengths (the reference's post-compression DynamicCache raggedness). The JAX
fallback (ops.attention.decode_attention) masks a padded pool and pays full
padded HBM bandwidth; this kernel walks only the valid KV blocks: the block
index_map clamps to the last valid block (consecutive identical indices skip
the re-DMA — the standard ragged-attention trick, cf. the ragged paged
attention literature) and computation is predicated off beyond the ragged
length.

Layout: the caches stay in their natural (S_pad, Hk, D) pool layout — an
earlier revision took (Hk, S, D) and paid a full materialized transpose of
the pool per layer per step (~0.9 ms/step at the 7B serving geometry,
measured via kernel_bench --what decodestep: the pallas path cost MORE than
the masked XLA fallback). Each grid step DMAs one (block_k, Hk, D) block
once and folds ALL KV heads from it (static in-kernel head loop), the same
lesson as the blocked-grouped prefill kernel.

Shapes (one token, one chip): q (Hq, D); caches (S_pad, Hk, D);
``cache_len`` scalar (scalar-prefetched so index_maps can use it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _decode_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                   *, block_k, scale, hk, g, d):
    j = pl.program_id(0)
    length = len_ref[0]
    n_blocks = pl.cdiv(length, block_k)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(j < n_blocks)
    def _():
        kb = k_ref[...].reshape(block_k, hk * d)
        vb = v_ref[...].reshape(block_k, hk * d)
        k_pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (g, block_k), 1)
        live = k_pos < length
        for h in range(hk):  # static unroll: every head folds the SAME block
            kh = kb[:, h * d:(h + 1) * d]  # (block_k, D) — aligned lane slice
            vh = vb[:, h * d:(h + 1) * d]
            s = jax.lax.dot_general(
                q_ref[h], kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (G, block_k)
            s = jnp.where(live, s, NEG_INF)
            m_prev, l_prev, acc_prev = m_scr[h], l_scr[h], acc_scr[h]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            m_scr[h] = m_new
            l_scr[h] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_scr[h] = acc_prev * alpha + jax.lax.dot_general(
                p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = (acc_scr[...] / jnp.maximum(l_scr[...], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def ragged_decode_attention(q, k_cache, v_cache, cache_len, block_k: int | None = None,
                            interpret: bool = False):
    """One-token GQA decode attention over a ragged cache. Returns (Hq, D)."""
    hq, d = q.shape
    s, hk, _ = k_cache.shape
    g = hq // hk
    scale = 1.0 / (d ** 0.5)

    if block_k is None:
        # Per-grid-step fixed overhead (~14 µs) dominates this kernel at
        # decode pool sizes — the whole K+V read at S=3328 is ~8 µs of DMA.
        # One block up to 4096 keys (grid=1: (4096, Hk, D) bf16 = 4 MB per
        # cache, 8 MB total, inside the scoped-VMEM margin), 2048 beyond.
        block_k = max(((s + 127) // 128) * 128, 128) if s <= 4096 else 2048
    block_k = min(block_k, max(((s + 127) // 128) * 128, 128))
    pad = (-s) % block_k
    if pad:
        k_cache = jnp.pad(k_cache, ((0, pad), (0, 0), (0, 0)))
        v_cache = jnp.pad(v_cache, ((0, pad), (0, 0), (0, 0)))
    sp = k_cache.shape[0]
    n_blocks = sp // block_k

    q_g = q.reshape(hk, g, d)
    len_arr = jnp.reshape(cache_len, (1,)).astype(jnp.int32)

    def kv_index(j, len_ref):
        # Clamp to the last valid block: repeated indices skip the DMA.
        last = jnp.maximum(pl.cdiv(len_ref[0], block_k) - 1, 0)
        return (jnp.minimum(j, last), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((hk, g, d), lambda j, len_ref: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, hk, d), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, hk, d), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hk, g, d), lambda j, len_ref: (0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hk, g, 1), jnp.float32),
            pltpu.VMEM((hk, g, 1), jnp.float32),
            pltpu.VMEM((hk, g, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel, block_k=block_k, scale=scale, hk=hk, g=g, d=d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hk, g, d), q.dtype),
        interpret=interpret,
    )(len_arr, q_g, k_cache, v_cache)
    return out.reshape(hq, d)
