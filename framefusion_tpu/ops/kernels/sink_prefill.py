"""Pallas TPU attention-sink (StreamingLLM) prefill kernel.

TPU-native replacement for ``minference.streaming_forward``, which the
reference's StreamingLLM baseline calls for its prefill attention
(/root/reference/framefusion/models/qwen2/modeling_qwen2_baseline.py:691-705:
each query attends the ``init_num`` sink keys plus its trailing
``local_window_num`` keys).

The XLA fallback (ops/attention.causal_attention_chunked(sink=...)) walks
every KV block and masks — O(S^2) work for an O(S*window) method, which made
the baseline slower than dense (round-1 DEVNOTES). This kernel visits ONLY
the sink blocks and the window blocks of each query block:

  * Grid (num_q_heads, S/block_q); the GQA group's whole K/V is VMEM-resident
    per head (same layout as flash_prefill's resident kernel), so the
    in-kernel dynamic-start block reads cost no extra DMA.
  * Inner loop: ``n_sink`` static sink blocks with mask ``k < init_num``,
    then ``n_win`` window blocks starting at floor((q_start - window)/bk)
    with mask ``k >= init_num and k > q - window and k <= q`` — the
    ``>= init_num`` term makes sink/window overlap count once.
  * Work per query block is O(init_num + window + block) instead of O(S).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _sink_kernel(q_ref, k_ref, v_ref, o_ref, *, block_q, block_k, scale,
                 init_num, window, n_sink, n_win, nk):
    iq = pl.program_id(1)
    q = q_ref[0]  # (block_q, D)
    d = q.shape[-1]
    q_start = iq * block_q

    q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    k_off = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    diag_blk = (q_start + block_q - 1) // block_k
    win_lo_blk = jnp.maximum(q_start - window, 0) // block_k

    def step(blk_idx, carry, window_mask: bool, block_ok=None):
        m, l, acc = carry
        k_start = blk_idx * block_k
        kb = k_ref[0, pl.ds(k_start, block_k), :]
        vb = v_ref[0, pl.ds(k_start, block_k), :]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        k_pos = k_start + k_off
        mask = k_pos <= q_pos
        if window_mask:
            mask &= (k_pos >= init_num) & (k_pos > q_pos - window)
        else:
            mask &= k_pos < init_num
        if block_ok is not None:
            mask &= block_ok
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc * alpha + pv

    carry = (
        jnp.full((block_q, 1), NEG_INF, jnp.float32),
        jnp.zeros((block_q, 1), jnp.float32),
        jnp.zeros((block_q, d), jnp.float32),
    )
    # Sink blocks (static count, indices 0..n_sink-1).
    carry = jax.lax.fori_loop(
        0, n_sink, lambda j, c: step(j, c, window_mask=False), carry
    )

    # Window blocks: intended index win_lo+j; blocks past the diagonal are
    # fully masked via block_ok, NOT clamped onto the diagonal — a clamped
    # revisit would carry the same live mask and double-count those keys.
    def win_step(j, c):
        intended = win_lo_blk + j
        ok = intended <= jnp.minimum(diag_blk, nk - 1)
        idx = jnp.minimum(intended, nk - 1)  # keep the dynamic slice in-bounds
        return step(idx, c, window_mask=True, block_ok=ok)

    carry = jax.lax.fori_loop(0, n_win, win_step, carry)
    m, l, acc = carry
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("init_num", "window", "block_q", "block_k", "interpret")
)
def sink_flash_attention(q, k, v, init_num: int, window: int,
                         block_q: int = 512, block_k: int = 512,
                         interpret: bool = False):
    """StreamingLLM prefill attention. q: (S, Hq, D); k, v: (S, Hk, D).

    Each query at position i attends keys {j : j <= i and (j < init_num or
    j > i - window)} — ``window`` includes the query itself (reference
    minference semantics via modeling_qwen2_baseline.py:693-705; identical
    mask to ops/attention.causal_attention_chunked(sink=...)).
    """
    s, hq, d = q.shape
    hk = k.shape[1]
    g = hq // hk
    scale = 1.0 / (d ** 0.5)
    window = max(int(window), 1)
    init_num = max(int(init_num), 0)

    pad = (-s) % max(block_q, block_k)
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
    sp = q.shape[0]
    nk = sp // block_k
    n_sink = -(-init_num // block_k) if init_num else 0
    # Window span for a query block: (q_start - window, q_start + block_q - 1]
    # -> at most cdiv(window + block_q, block_k) + 1 KV blocks.
    n_win = min(-(-(window + block_q) // block_k) + 1, nk)

    q_t = q.transpose(1, 0, 2)
    k_t = k.transpose(1, 0, 2)
    v_t = v.transpose(1, 0, 2)

    out = pl.pallas_call(
        functools.partial(_sink_kernel, block_q=block_q, block_k=block_k, scale=scale,
                          init_num=init_num, window=window, n_sink=n_sink,
                          n_win=n_win, nk=nk),
        grid=(hq, sp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda h, i: (h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda h, i: (h // g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda h, i: (h // g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda h, i: (h, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hq, sp, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * hq * sp * (init_num + window + block_q) * d,
            bytes_accessed=(hq + 2 * hk) * sp * d * q.dtype.itemsize
            + hq * sp * d * q.dtype.itemsize,
            transcendentals=hq * sp * (init_num + window + block_q),
        ),
        interpret=interpret,
    )(q_t, k_t, v_t)
    return out.transpose(1, 0, 2)[:s]
