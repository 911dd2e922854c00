"""Pallas TPU flash attention for prefill (causal, GQA, key-validity mask).

Replaces the external SDPA/flash kernels the reference leans on
(/root/reference/framefusion/models/qwen2/modeling_qwen2.py:181-188,
models/internvl/modeling_internlm2.py:360-368) with an in-repo TPU kernel.

Design (one chip, bsz=1, prefill):
  * Grid (num_q_heads, S/block_q). For each query head, the whole K/V of its
    GQA group head is staged in VMEM once (S ≤ ~16k · head_dim 128 · bf16 =
    ≤4 MB each) and reused across that head's query blocks — the index_map
    only changes on head boundaries, so Pallas skips the re-DMA.
  * Inside the kernel an online-softmax ``fori_loop`` walks KV blocks up to
    the causal diagonal only (the loop bound is computed from the query-block
    id), fp32 running max / denominator / accumulator, bf16 MXU matmuls.
  * ``key_valid`` masks dead keys — the fused compression phase keeps
    merged/pruned tokens in place (mask-only) until the single post-phase
    compaction, and bucket padding is masked the same way. Rows whose keys
    are all masked produce zeros (they are dead padding by construction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_kernel(q_ref, k_ref, v_ref, kvalid_ref, o_ref, *, block_q, block_k, scale):
    iq = pl.program_id(1)
    q = q_ref[0]  # (block_q, D) storage dtype
    d = q.shape[-1]
    q_start = iq * block_q
    n_kv = (q_start + block_q + block_k - 1) // block_k

    q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    k_off = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    def body(j, carry):
        m, l, acc = carry
        k_start = j * block_k
        kb = k_ref[0, pl.ds(k_start, block_k), :]  # (block_k, D)
        vb = v_ref[0, pl.ds(k_start, block_k), :]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (block_q, block_k) fp32
        kv_ok = kvalid_ref[0, pl.ds(k_start, block_k)] > 0  # (block_k,)
        mask = (k_start + k_off <= q_pos) & kv_ok[None, :]
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * alpha + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kv, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_kernel_blocked(q_ref, k_ref, v_ref, kvalid_ref, o_ref, m_scr, l_scr, acc_scr, *, block_q, block_k, scale):
    """KV-blocked variant: grid (H, nq, nk) with the online-softmax state in
    scratch persisted across the nk dimension — K/V arrive one block at a
    time, so sequence length is bounded by HBM, not VMEM (needed for the
    128-256-frame long-video configs where a whole head's K/V exceeds VMEM).
    The k-block index_map clamps above the causal diagonal, so out-of-range
    blocks repeat the previous index and skip their DMA entirely.
    """
    iq = pl.program_id(1)
    jk = pl.program_id(2)
    q_start = iq * block_q
    n_kv = (q_start + block_q + block_k - 1) // block_k  # blocks up to diagonal

    @pl.when(jk == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(jk < n_kv)
    def _():
        q = q_ref[0]
        kb = k_ref[0]
        vb = v_ref[0]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        k_pos = jk * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        kv_ok = kvalid_ref[0] > 0
        s = jnp.where((k_pos <= q_pos) & kv_ok[None, :], s, NEG_INF)
        m_prev, l_prev, acc_prev = m_scr[:], l_scr[:], acc_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        m_scr[:] = m_new
        l_scr[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_prev * alpha + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(jk == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)


def _flash_blocked(q_t, k_t, v_t, kv_mask, block_q, block_k, interpret, scale):
    hq, sp, d = q_t.shape
    hk = k_t.shape[0]
    g = hq // hk
    nk = sp // block_k

    def k_index(h, i, j):
        diag = ((i + 1) * block_q + block_k - 1) // block_k - 1
        return (h // g, jnp.minimum(j, diag), 0)

    def mask_index(h, i, j):
        diag = ((i + 1) * block_q + block_k - 1) // block_k - 1
        return (0, jnp.minimum(j, diag))

    return pl.pallas_call(
        functools.partial(_flash_kernel_blocked, block_q=block_q, block_k=block_k, scale=scale),
        grid=(hq, sp // block_q, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), k_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), k_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k), mask_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hq, sp, d), q_t.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(q_t, k_t, v_t, kv_mask)


def _flash_kernel_blocked_grouped(q_ref, k_ref, v_ref, kvalid_ref, o_ref,
                                  m_scr, l_scr, acc_scr, *, block_q, block_k, scale, group):
    """KV-blocked grid with the GQA group looped INSIDE each step: grid
    (Hk, nq, nk) — every K/V block is DMA'd ONCE per kv head and reused by
    all ``group`` query heads (the per-qhead blocked grid re-streams it
    ``group`` times: ~7x the HBM traffic at Qwen2-7B geometry). Online-softmax
    state for the whole group lives in (group*block_q) scratch persisted
    across the nk dimension; the k-block index_map clamps above the causal
    diagonal so out-of-range blocks skip their DMA (same as _flash_blocked).
    This is the long-video (S beyond VMEM residency) regime's kernel."""
    iq = pl.program_id(1)
    jk = pl.program_id(2)
    q_start = iq * block_q
    n_kv = (q_start + block_q + block_k - 1) // block_k

    @pl.when(jk == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(jk < n_kv)
    def _():
        kb = k_ref[0]
        vb = v_ref[0]
        kv_ok = kvalid_ref[0] > 0
        q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_pos = jk * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = (k_pos <= q_pos) & kv_ok[None, :]

        def head_body(gh, _):
            qh = q_ref[0, gh]  # (block_q, D)
            s = jax.lax.dot_general(
                qh, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            s = jnp.where(mask, s, NEG_INF)
            row = pl.ds(gh * block_q, block_q)
            m_prev, l_prev, acc_prev = m_scr[row], l_scr[row], acc_scr[row]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            m_scr[row] = m_new
            l_scr[row] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_scr[row] = acc_prev * alpha + jax.lax.dot_general(
                p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return 0

        jax.lax.fori_loop(0, group, head_body, 0)

    @pl.when(jk == pl.num_programs(2) - 1)
    def _():
        d = q_ref.shape[-1]
        o_ref[0] = (
            acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)
        ).reshape(group, block_q, d).astype(o_ref.dtype)


def _flash_blocked_grouped(q, k, v, kv_mask, block_q, block_k, interpret, scale):
    """q: (S, Hq, D) padded; k/v: (S, Hk, D) padded; kv_mask (1, S)."""
    sp, hq, d = q.shape
    hk = k.shape[1]
    g = hq // hk
    nk = sp // block_k
    q_g = q.reshape(sp, hk, g, d).transpose(1, 2, 0, 3)  # (Hk, G, S, D)
    k_t = k.transpose(1, 0, 2)
    v_t = v.transpose(1, 0, 2)

    def k_index(h, i, j):
        diag = ((i + 1) * block_q + block_k - 1) // block_k - 1
        return (h, jnp.minimum(j, diag), 0)

    def mask_index(h, i, j):
        diag = ((i + 1) * block_q + block_k - 1) // block_k - 1
        return (0, jnp.minimum(j, diag))

    out = pl.pallas_call(
        functools.partial(_flash_kernel_blocked_grouped, block_q=block_q,
                          block_k=block_k, scale=scale, group=g),
        grid=(hk, sp // block_q, nk),
        in_specs=[
            pl.BlockSpec((1, g, block_q, d), lambda h, i, j: (h, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), k_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), k_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k), mask_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, block_q, d), lambda h, i, j: (h, 0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hk, g, sp, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((g * block_q, 1), jnp.float32),
            pltpu.VMEM((g * block_q, 1), jnp.float32),
            pltpu.VMEM((g * block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(q_g, k_t, v_t, kv_mask)
    return out.transpose(2, 0, 1, 3).reshape(sp, hq, d)


def _flash_kernel_grouped(q_ref, k_ref, v_ref, kvalid_ref, o_ref, *, block_q, block_k, scale, group):
    """Grouped-GQA variant: one grid step computes ALL ``group`` query heads
    sharing a KV head, stacked as rows of one MXU matmul — amortising the
    ~14 us fixed per-grid-step cost that dominates small sequences (the
    compressed tail's regime). fp32 score tiles are (group*block_q, block_k),
    so this only fits VMEM next to resident K/V for moderate S (see
    GROUPED_MAX_S)."""
    iq = pl.program_id(1)
    q = q_ref[0].reshape(group * block_q, q_ref.shape[-1])  # (G*Bq, D)
    d = q.shape[-1]
    rows = group * block_q
    q_start = iq * block_q
    n_kv = (q_start + block_q + block_k - 1) // block_k

    # Row r of the stacked block is query position q_start + (r % block_q).
    row_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 0) % block_q
    k_off = jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 1)

    def body(j, carry):
        m, l, acc = carry
        k_start = j * block_k
        kb = k_ref[0, pl.ds(k_start, block_k), :]
        vb = v_ref[0, pl.ds(k_start, block_k), :]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (G*Bq, block_k)
        kv_ok = kvalid_ref[0, pl.ds(k_start, block_k)] > 0
        mask = (k_start + k_off <= row_pos) & kv_ok[None, :]
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * alpha + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((rows, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((rows, 1), jnp.float32)
    acc0 = jnp.zeros((rows, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kv, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).reshape(group, block_q, d).astype(o_ref.dtype)


def _flash_grouped(q, k, v, kv_mask, block_q, block_k, interpret, scale):
    """q: (S, Hq, D) padded; k/v: (S, Hk, D) padded. Query heads for KV head
    j are [j*g, (j+1)*g) — HF repeat_kv convention."""
    sp, hq, d = q.shape
    hk = k.shape[1]
    g = hq // hk
    q_g = q.reshape(sp, hk, g, d).transpose(1, 2, 0, 3)  # (Hk, G, S, D)
    k_t = k.transpose(1, 0, 2)
    v_t = v.transpose(1, 0, 2)
    out = pl.pallas_call(
        functools.partial(_flash_kernel_grouped, block_q=block_q, block_k=block_k, scale=scale, group=g),
        grid=(hk, sp // block_q),
        in_specs=[
            pl.BlockSpec((1, g, block_q, d), lambda h, i: (h, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda h, i: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda h, i: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp), lambda h, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, block_q, d), lambda h, i: (h, 0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hk, g, sp, d), q.dtype),
        interpret=interpret,
    )(q_g, k_t, v_t, kv_mask)
    return out.transpose(2, 0, 1, 3).reshape(sp, hq, d)


def _flash_kernel_grouped_multi(q_ref, k_ref, v_ref, kvalid_ref, o_ref,
                                *, block_q, block_k, sub_q, scale, group):
    """Grouped-GQA variant with the head and query-sub-block loops INSIDE the
    kernel: one grid step covers all ``group`` query heads × ``block_q`` query
    rows of one KV head, walking them in (sub_q, block_k) score tiles. K/V are
    VMEM-resident for the whole step, so the inner loops pay no DMA or
    grid-step cost — this amortises the ~14 µs fixed per-step overhead that
    dominates the compressed tail's small-S regime (DEVNOTES), while keeping
    the live fp32 score tile small (sub_q·block_k) so ``block_q`` can be large.
    Each sub-block walks KV only to its own causal diagonal — no wasted MXU
    work above the diagonal."""
    iq = pl.program_id(1)
    d = q_ref.shape[-1]
    q_start = iq * block_q
    n_sub = block_q // sub_q

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (sub_q, block_k), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (sub_q, block_k), 1)

    def outer(idx, _):
        gh = idx // n_sub
        c = idx % n_sub
        qc = q_ref[0, gh, pl.ds(c * sub_q, sub_q), :]  # (sub_q, D)
        sub_start = q_start + c * sub_q
        n_kv = (sub_start + sub_q + block_k - 1) // block_k
        row_pos = sub_start + row_iota

        def body(j, carry):
            m, l, acc = carry
            ks = j * block_k
            kb = k_ref[0, pl.ds(ks, block_k), :]
            vb = v_ref[0, pl.ds(ks, block_k), :]
            s = jax.lax.dot_general(
                qc, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            kv_ok = kvalid_ref[0, pl.ds(ks, block_k)] > 0
            s = jnp.where((ks + col_iota <= row_pos) & kv_ok[None, :], s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc * alpha + pv

        m0 = jnp.full((sub_q, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((sub_q, 1), jnp.float32)
        acc0 = jnp.zeros((sub_q, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_kv, body, (m0, l0, acc0))
        o_ref[0, gh, pl.ds(c * sub_q, sub_q), :] = (
            acc / jnp.maximum(l, 1e-30)
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, group * n_sub, outer, 0)


def _flash_grouped_multi(q, k, v, kv_mask, block_q, block_k, sub_q, interpret, scale):
    """q: (S, Hq, D) padded to a block_q multiple; k/v: (S, Hk, D)."""
    sp, hq, d = q.shape
    hk = k.shape[1]
    g = hq // hk
    q_g = q.reshape(sp, hk, g, d).transpose(1, 2, 0, 3)  # (Hk, G, S, D)
    k_t = k.transpose(1, 0, 2)
    v_t = v.transpose(1, 0, 2)
    out = pl.pallas_call(
        functools.partial(_flash_kernel_grouped_multi, block_q=block_q, block_k=block_k,
                          sub_q=sub_q, scale=scale, group=g),
        grid=(hk, sp // block_q),
        in_specs=[
            pl.BlockSpec((1, g, block_q, d), lambda h, i: (h, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda h, i: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda h, i: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp), lambda h, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, block_q, d), lambda h, i: (h, 0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hk, g, sp, d), q.dtype),
        interpret=interpret,
    )(q_g, k_t, v_t, kv_mask)
    return out.transpose(2, 0, 1, 3).reshape(sp, hq, d)


def _flash_kernel_gm_imp(q_ref, k_ref, v_ref, kvalid_ref, cap_ref, o_ref, imp_ref,
                         *, block_q, block_k, sub_q, scale, group, num):
    """Grouped-multi flash kernel WITH the prune-importance capture fused as
    a per-sub-block epilogue (the grouped-multi twin of _flash_kernel_imp):
    after a sub-block's online-softmax walk, if it contains capture rows
    (``cap_ref`` marks the last ``num`` LIVE rows — by live-rank, because in
    the mask-only layout the trailing window can contain dead tokens), the
    KV walk replays from VMEM-resident K and the exact softmax rows
    accumulate into the shared importance block."""
    iq = pl.program_id(1)
    d = q_ref.shape[-1]
    q_start = iq * block_q
    n_sub = block_q // sub_q

    @pl.when((pl.program_id(0) == 0) & (iq == 0))
    def _():
        imp_ref[:] = jnp.zeros_like(imp_ref)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (sub_q, block_k), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (sub_q, block_k), 1)

    def outer(idx, _):
        gh = idx // n_sub
        c = idx % n_sub
        qc = q_ref[0, gh, pl.ds(c * sub_q, sub_q), :]
        sub_start = q_start + c * sub_q
        n_kv = (sub_start + sub_q + block_k - 1) // block_k
        row_pos = sub_start + row_iota

        def scores(j):
            ks = j * block_k
            kb = k_ref[0, pl.ds(ks, block_k), :]
            s = jax.lax.dot_general(
                qc, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            kv_ok = kvalid_ref[0, pl.ds(ks, block_k)] > 0
            return jnp.where((ks + col_iota <= row_pos) & kv_ok[None, :], s, NEG_INF)

        def body(j, carry):
            m, l, acc = carry
            s = scores(j)
            vb = v_ref[0, pl.ds(j * block_k, block_k), :]
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc * alpha + pv

        m0 = jnp.full((sub_q, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((sub_q, 1), jnp.float32)
        acc0 = jnp.zeros((sub_q, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_kv, body, (m0, l0, acc0))
        o_ref[0, gh, pl.ds(c * sub_q, sub_q), :] = (
            acc / jnp.maximum(l, 1e-30)
        ).astype(o_ref.dtype)

        # Capture-row selection as a (1, sub_q) x (sub_q, block_k) matvec —
        # the 0/1 row vector loads in its native lane layout (a (sub_q, 1)
        # column mask would need a sublane relayout Mosaic rejects).
        cap_row = cap_ref[0:1, pl.ds(sub_start, sub_q)].astype(jnp.float32)

        @pl.when(jnp.max(cap_row) > 0)
        def _():
            inv_l = 1.0 / jnp.maximum(l, 1e-30)

            def imp_body(j, _):
                p = jnp.exp(scores(j) - m) * inv_l
                contrib = jax.lax.dot_general(
                    cap_row, p, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (1, block_k): sum of p over capture rows
                ks = j * block_k
                imp_ref[0:1, pl.ds(ks, block_k)] = imp_ref[0:1, pl.ds(ks, block_k)] + contrib
                return 0

            jax.lax.fori_loop(0, n_kv, imp_body, 0)

        return 0

    jax.lax.fori_loop(0, group * n_sub, outer, 0)


def _imp_grouped_multi(q_g, k_t, v_t, kv_mask, cap_mask, block_q, block_k, sub_q, num, interpret, scale):
    """q_g: (Hk, G, Sp, D); k_t/v_t: (Hk, Sp, D); kv_mask/cap_mask (1, Sp).
    Returns (out (Hk, G, Sp, D), imp (8, Sp))."""
    hk, g, sp, d = q_g.shape
    return pl.pallas_call(
        functools.partial(_flash_kernel_gm_imp, block_q=block_q, block_k=block_k,
                          sub_q=sub_q, scale=scale, group=g, num=num),
        grid=(hk, sp // block_q),
        in_specs=[
            pl.BlockSpec((1, g, block_q, d), lambda h, i: (h, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda h, i: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda h, i: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp), lambda h, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp), lambda h, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, g, block_q, d), lambda h, i: (h, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, sp), lambda h, i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((hk, g, sp, d), q_g.dtype),
            jax.ShapeDtypeStruct((8, sp), jnp.float32),
        ),
        interpret=interpret,
    )(q_g, k_t, v_t, kv_mask, cap_mask)


def _flash_kernel_imp(q_ref, k_ref, v_ref, kvalid_ref, cap_ref, o_ref, imp_ref,
                      *, block_q, block_k, scale, num):
    """Resident-KV flash kernel with the prune-importance capture fused as a
    true epilogue: after the online-softmax main loop, a query block that
    contains capture rows (``cap_ref`` marks the last ``num`` LIVE rows —
    live-rank-selected, because in the mask-only layout the trailing window
    can contain dead tokens) replays its KV walk — K is already
    VMEM-resident, zero extra HBM traffic — and writes those rows' exact
    softmax probabilities exp(s - m_final)/l_final into a per-head
    importance row. Replaces the reference's double-computed manual softmax
    (/root/reference/framefusion/utils.py:27-57 +
    models/qwen2/modeling_qwen2.py:166-188) with one kernel pass."""
    iq = pl.program_id(1)
    q = q_ref[0]
    d = q.shape[-1]
    q_start = iq * block_q
    n_kv = (q_start + block_q + block_k - 1) // block_k

    q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    k_off = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    def scores(j):
        k_start = j * block_k
        kb = k_ref[0, pl.ds(k_start, block_k), :]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        kv_ok = kvalid_ref[0, pl.ds(k_start, block_k)] > 0
        mask = (k_start + k_off <= q_pos) & kv_ok[None, :]
        return jnp.where(mask, s, NEG_INF)

    def body(j, carry):
        m, l, acc = carry
        s = scores(j)
        vb = v_ref[0, pl.ds(j * block_k, block_k), :]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc * alpha + pv

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kv, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    # --- importance epilogue -------------------------------------------------
    # The (8, S) accumulator block is constant across the whole grid (Pallas
    # keeps it VMEM-resident, one writeback at the end), so contributions sum
    # over heads in place; row 0 carries the data, rows 1-7 are tile padding
    # (TPU block shapes need a sublane-multiple second-to-last dim).
    @pl.when((pl.program_id(0) == 0) & (iq == 0))
    def _():
        imp_ref[:] = jnp.zeros_like(imp_ref)

    # (1, block_q) 0/1 row vector in native lane layout; selection + row-sum
    # happen as one matvec (a (block_q, 1) column mask would need a sublane
    # relayout Mosaic rejects).
    cap_row = cap_ref[0:1, pl.ds(q_start, block_q)].astype(jnp.float32)

    @pl.when(jnp.max(cap_row) > 0)
    def _():
        inv_l = 1.0 / jnp.maximum(l, 1e-30)

        def imp_body(j, _):
            p = jnp.exp(scores(j) - m) * inv_l  # exact softmax probs
            contrib = jax.lax.dot_general(
                cap_row, p, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (1, block_k): sum of p over capture rows
            ks = j * block_k
            imp_ref[0:1, pl.ds(ks, block_k)] = imp_ref[0:1, pl.ds(ks, block_k)] + contrib
            return 0

        jax.lax.fori_loop(0, n_kv, imp_body, 0)


@functools.partial(jax.jit, static_argnames=("num", "block_q", "block_k", "interpret"))
def flash_causal_attention_importance(
    q, k, v, valid_len, num: int, key_valid=None,
    block_q: int = 256, block_k: int = 1024, interpret: bool = False,
):
    """Causal GQA flash attention that ALSO returns the prune importance —
    the mean softmax mass the last ``num`` LIVE query rows pay to each key
    (fused epilogue; see _flash_kernel_imp). With ``key_valid`` (mask-only
    compression layout) the capture rows are live-rank-selected — the
    reference captures the last rows of its COMPACTED states (utils.py:29),
    and in the masked layout the trailing positions can be dead tokens when
    fewer than ``num`` text tokens trail the video span. Resident-KV regime
    only (S <= RESIDENT_KV_MAX_S); longer sequences use the separate
    ops.attention.last_rows_importance computation (same selection rule).

    Returns (out (S, Hq, D), importance (S,) fp32).
    """
    s, hq, d = q.shape
    hk = k.shape[1]
    g = hq // hk
    scale = 1.0 / (d ** 0.5)
    positions = jnp.arange(s, dtype=jnp.int32)
    vl = jnp.asarray(valid_len, jnp.int32)

    if g > 1 and GROUPED_MAX_S < s <= RESIDENT_KV_MAX_S:
        # Mid regime: ride the blocked-grouped attention kernel (same
        # dispatch as flash_causal_attention) and compute the 1-4 capture
        # rows as the separate O(num*S*D) einsum — those rows cost ~0.2 GF
        # at the 64-frame buckets, noise next to the ~17 TF main attention,
        # and last_rows_importance implements the identical live-rank
        # selection rule (key_valid=None -> trailing [vl-num, vl) window).
        from ...ops.attention import last_rows_importance

        out = flash_causal_attention(q, k, v, key_valid=key_valid, interpret=interpret)
        importance = last_rows_importance(q, k, num, vl, key_valid=key_valid)
        return out, importance

    if key_valid is None:
        key_valid = jnp.ones((s,), bool)
        capture = (positions >= vl - num) & (positions < vl)
    else:
        live_rank = jnp.cumsum(key_valid.astype(jnp.int32))
        capture = key_valid & (live_rank > live_rank[-1] - num)

    if g > 1 and s <= GROUPED_MAX_S:
        # Grouped-multi regime (same thresholds as flash_causal_attention):
        # ~45x fewer grid steps than the per-qhead grid at the phase buckets.
        bq = 512
        bk = min(block_k, 512)
        pad = (-s) % max(bq, bk)
        if pad:
            q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
            k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
            v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
            key_valid = jnp.pad(key_valid, (0, pad), constant_values=False)
            capture = jnp.pad(capture, (0, pad), constant_values=False)
        sp = q.shape[0]
        q_g = q.reshape(sp, hk, g, d).transpose(1, 2, 0, 3)
        out, imp = _imp_grouped_multi(
            q_g, k.transpose(1, 0, 2), v.transpose(1, 0, 2),
            key_valid.astype(jnp.int32)[None, :],
            capture.astype(jnp.int32)[None, :],
            bq, bk, 256, num, interpret, scale,
        )
        importance = imp[0] / (hq * num)
        return out.transpose(2, 0, 1, 3).reshape(sp, hq, d)[:s], importance[:s]

    pad = (-s) % max(block_q, block_k)
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
        key_valid = jnp.pad(key_valid, (0, pad), constant_values=False)
        capture = jnp.pad(capture, (0, pad), constant_values=False)
    sp = q.shape[0]

    q_t = q.transpose(1, 0, 2)
    k_t = k.transpose(1, 0, 2)
    v_t = v.transpose(1, 0, 2)
    kv_mask = key_valid.astype(jnp.int32)[None, :]
    cap_mask = capture.astype(jnp.int32)[None, :]

    out, imp = pl.pallas_call(
        functools.partial(_flash_kernel_imp, block_q=block_q, block_k=block_k,
                          scale=scale, num=num),
        grid=(hq, sp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda h, i: (h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda h, i: (h // g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda h, i: (h // g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp), lambda h, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp), lambda h, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda h, i: (h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, sp), lambda h, i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((hq, sp, d), q.dtype),
            jax.ShapeDtypeStruct((8, sp), jnp.float32),
        ),
        interpret=interpret,
    )(q_t, k_t, v_t, kv_mask, cap_mask)
    importance = imp[0] / (hq * num)  # mean over all heads and the num rows
    return out.transpose(1, 0, 2)[:s], importance[:s]


# Above this sequence length a whole head's K/V (2 * S * D * 2 bytes) no
# longer comfortably fits VMEM alongside the working set; switch to the
# KV-blocked grid.
RESIDENT_KV_MAX_S = 16384
# Grouped-head path: fp32 score tiles of (G*block_q, block_k) must coexist
# with resident K/V — safe up to moderate sequence lengths.
GROUPED_MAX_S = 8192


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_causal_attention(q, k, v, key_valid=None, block_q: int = 256, block_k: int = 1024, interpret: bool = False):
    """Causal GQA flash attention. q: (S, Hq, D); k, v: (S, Hk, D) -> (S, Hq, D)."""
    s, hq, d = q.shape
    hk = k.shape[1]
    g = hq // hk
    scale = 1.0 / (d ** 0.5)

    if key_valid is None:
        key_valid = jnp.ones((s,), bool)

    pad = (-s) % max(block_q, block_k)
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
        key_valid = jnp.pad(key_valid, (0, pad), constant_values=False)
    sp = q.shape[0]

    q_t = q.transpose(1, 0, 2)  # (Hq, S, D)
    k_t = k.transpose(1, 0, 2)  # (Hk, S, D)
    v_t = v.transpose(1, 0, 2)
    kv_mask = key_valid.astype(jnp.int32)[None, :]  # (1, S)

    if g > 1 and GROUPED_MAX_S < sp <= RESIDENT_KV_MAX_S:
        # Mid regime (the 64-frame phase buckets, S ≈ 8.2k-16k): the
        # KV-blocked GROUPED kernel — each K/V block DMA'd once per KV head,
        # small (bq, bk) score tiles, softmax state in scratch. Measured
        # faster than the per-qhead resident grid here (which tops out at
        # ~83 TF/s at S=11776; the blocked-grouped kernel reaches
        # ~100 TF/s at 23.5k and holds the advantage down through this
        # range — kernel_bench --what attn). bq=256/bk=1024 is the
        # VMEM-safe tile (DEVNOTES).
        pad2 = (-sp) % 1024
        if pad2:
            q = jnp.pad(q, ((0, pad2), (0, 0), (0, 0)))
            k = jnp.pad(k, ((0, pad2), (0, 0), (0, 0)))
            v = jnp.pad(v, ((0, pad2), (0, 0), (0, 0)))
            kv_mask = jnp.pad(kv_mask, ((0, 0), (0, pad2)))
        return _flash_blocked_grouped(q, k, v, kv_mask, 256, 1024, interpret, scale)[:s]

    if sp > RESIDENT_KV_MAX_S:
        # Long-video regime: K/V stream one block per grid step. With a GQA
        # group, loop the group inside the step so each K/V block is DMA'd
        # once per KV head instead of once per query head (~G x less HBM
        # traffic — see _flash_kernel_blocked_grouped). Grouped tiles must be
        # small: the whole group's (g*bq) fp32 softmax state lives in scratch
        # beside double-buffered q/out/k/v blocks (bq=512/bk=2048 overflowed
        # scoped VMEM by 2.6 MB at S=24576 with g=7).
        if g > 1:
            bq, bk = max(block_q, 256), max(block_k, 1024)
            pad2 = (-sp) % max(bq, bk)
            if pad2:
                q = jnp.pad(q, ((0, pad2), (0, 0), (0, 0)))
                k = jnp.pad(k, ((0, pad2), (0, 0), (0, 0)))
                v = jnp.pad(v, ((0, pad2), (0, 0), (0, 0)))
                kv_mask = jnp.pad(kv_mask, ((0, 0), (0, pad2)))
            return _flash_blocked_grouped(q, k, v, kv_mask, bq, bk, interpret, scale)[:s]
        bq, bk = max(block_q, 512), max(block_k, 2048)
        pad2 = (-sp) % max(bq, bk)
        if pad2:
            q_t = jnp.pad(q_t, ((0, 0), (0, pad2), (0, 0)))
            k_t = jnp.pad(k_t, ((0, 0), (0, pad2), (0, 0)))
            v_t = jnp.pad(v_t, ((0, 0), (0, pad2), (0, 0)))
            kv_mask = jnp.pad(kv_mask, ((0, 0), (0, pad2)))
        out = _flash_blocked(q_t, k_t, v_t, kv_mask, bq, bk, interpret, scale)
        return out.transpose(1, 0, 2)[:s]

    if g > 1 and sp <= GROUPED_MAX_S:
        # Small/medium-sequence regime (compressed tail + phase buckets):
        # amortize the ~14 us fixed grid-step cost with the head and query
        # sub-block loops INSIDE the kernel (_flash_kernel_grouped_multi) —
        # K/V stay VMEM-resident across a large query block, score tiles stay
        # (sub_q, block_k) so VMEM never blows up. Measured (kernel_bench,
        # v5e): S=3456 1.1-1.3 ms; S=6656 4.16 ms at bq=512 vs 4.96 at
        # bq=1024 (within-process, r3 sweep) — one bq tier for the whole
        # range. Above 8k keys the blocked-grouped kernel wins (84.6 TF/s
        # at S=11776); bq=1792 is VMEM-borderline at sp=7168 (19.3M scoped,
        # compiles or not depending on context).
        bq = 512
        pad2 = (-sp) % bq
        if pad2:
            q = jnp.pad(q, ((0, pad2), (0, 0), (0, 0)))
            k = jnp.pad(k, ((0, pad2), (0, 0), (0, 0)))
            v = jnp.pad(v, ((0, pad2), (0, 0), (0, 0)))
            kv_mask = jnp.pad(kv_mask, ((0, 0), (0, pad2)))
        return _flash_grouped_multi(q, k, v, kv_mask, bq, min(block_k, 512), 256, interpret, scale)[:s]

    grid = (hq, sp // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_q=block_q, block_k=block_k, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda h, i: (h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda h, i: (h // g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda h, i: (h // g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp), lambda h, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda h, i: (h, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hq, sp, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * hq * sp * sp * d // 2,  # QK^T + PV over the causal half
            bytes_accessed=(hq + 2 * hk) * sp * d * q.dtype.itemsize + hq * sp * d * q.dtype.itemsize,
            transcendentals=hq * sp * sp // 2,
        ),
        interpret=interpret,
    )(q_t, k_t, v_t, kv_mask)

    return out.transpose(1, 0, 2)[:s]
