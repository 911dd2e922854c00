"""Attention ops: causal prefill, last-rows importance capture, decode.

Three prefill implementations behind one interface:
  * ``einsum`` — full score materialisation; reference semantics for tests.
  * ``chunked`` — online-softmax over KV blocks (flash-style in pure JAX/XLA);
    memory O(blk^2) instead of O(S^2); portable to CPU.
  * ``pallas`` — fused TPU kernel (ops/kernels/flash_prefill.py).

Compression interplay: compaction (core/compact.py) packs live tokens to the
front, so inside prefill a plain causal mask is sufficient — a valid query at
position i only attends j <= i, which are all valid. Padding rows produce
well-defined garbage that is masked at the next event. The KV entries of
padding slots are excluded from decode by per-layer cache lengths
(runtime/engine.make_decode_state packs them into a padded pool with a
per-layer ``cache_lens`` vector).

Importance capture parity: the reference recomputes a manual softmax for the
last ``num`` query rows when the prune layer is reached
(/root/reference/framefusion/utils.py:27-57, models/qwen2/modeling_qwen2.py:
166-188) — attention runs twice there. Here ``last_rows_importance`` computes
only those rows (O(num * S * D)); on the pallas path in the resident-KV
regime the rows are instead computed inside the flash kernel's epilogue
(ops/kernels/flash_prefill.flash_causal_attention_importance, selected by
models/qwen2.layer_attention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _gqa_expand(q: jnp.ndarray, num_kv_heads: int):
    """(S, Hq, D) -> (Hk, G, S, D) grouped layout."""
    s, hq, d = q.shape
    g = hq // num_kv_heads
    return q.reshape(s, num_kv_heads, g, d).transpose(1, 2, 0, 3)


def causal_attention_einsum(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, key_valid=None) -> jnp.ndarray:
    """Reference attention. q: (S, Hq, D); k, v: (S, Hk, D). Returns (S, Hq, D).

    ``key_valid`` (S,) bool masks out dead keys — used by the fused
    compression phase, where merged/pruned tokens stay in place (mask-only)
    until the single post-phase compaction.
    """
    s, hq, d = q.shape
    hk = k.shape[1]
    qg = _gqa_expand(q, hk).astype(jnp.float32)  # (Hk, G, S, D)
    kf = k.transpose(1, 0, 2).astype(jnp.float32)  # (Hk, S, D)
    vf = v.transpose(1, 0, 2).astype(jnp.float32)
    scores = jnp.einsum("hgsd,htd->hgst", qg, kf) / jnp.sqrt(d).astype(jnp.float32)
    causal = jnp.tril(jnp.ones((s, s), bool))
    if key_valid is not None:
        causal = causal & key_valid[None, :]
    scores = jnp.where(causal[None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hgst,htd->hgsd", probs, vf)
    return out.transpose(2, 0, 1, 3).reshape(s, hq, d).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "sink"))
def causal_attention_chunked(q, k, v, key_valid=None, block_q: int = 256, block_k: int = 256, sink=None):
    """Online-softmax causal attention, O(block^2) memory. Shapes as einsum.

    ``sink=(init_num, window)`` restricts each query to the first ``init_num``
    keys plus its trailing ``window`` keys — the StreamingLLM attention-sink
    pattern (reference models/qwen2/modeling_qwen2_baseline.py:691-705, which
    delegates to minference.streaming_forward; here it is just a mask in the
    same online-softmax loop).
    """
    s, hq, d = q.shape
    hk = k.shape[1]
    g = hq // hk
    scale = 1.0 / jnp.sqrt(d).astype(jnp.float32)

    if key_valid is None:
        key_valid = jnp.ones((s,), bool)

    # Pad sequence to block multiples (keys padded with NEG_INF scores).
    pad = (-s) % block_q
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
    pad_k = (-s) % block_k
    if pad_k:
        k = jnp.pad(k, ((0, pad_k), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad_k), (0, 0), (0, 0)))
    key_valid = jnp.pad(key_valid, (0, pad_k), constant_values=False)
    sq, sk = q.shape[0], k.shape[0]
    nq, nk = sq // block_q, sk // block_k

    # Keep q/k/v in their storage dtype (bf16 on TPU): the MXU runs bf16 at
    # full rate; accumulation is forced to fp32 via preferred_element_type.
    qg = q.reshape(nq, block_q, hk, g, d).transpose(0, 2, 3, 1, 4)  # (nq,Hk,G,bq,D)
    kg = k.reshape(nk, block_k, hk, d).transpose(0, 2, 1, 3)  # (nk,Hk,bk,D)
    vg = v.reshape(nk, block_k, hk, d).transpose(0, 2, 1, 3)

    q_pos = jnp.arange(sq).reshape(nq, block_q)
    k_pos = jnp.arange(sk).reshape(nk, block_k)
    k_valid = key_valid.reshape(nk, block_k)

    def q_block(qi, qb, qp):
        def kv_step(carry, inputs):
            m, l, acc = carry
            kb, vb, kp, kval = inputs
            scores = jnp.einsum("hgqd,hkd->hgqk", qb, kb, preferred_element_type=jnp.float32) * scale
            mask = (kp[None, :] <= qp[:, None]) & kval[None, :]
            if sink is not None:
                init_num, window = sink
                mask = mask & ((kp[None, :] < init_num) | (kp[None, :] > qp[:, None] - window))
            scores = jnp.where(mask[None, None], scores, NEG_INF)
            m_new = jnp.maximum(m, scores.max(axis=-1))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(scores - m_new[..., None])
            l_new = l * alpha + p.sum(axis=-1)
            pv = jnp.einsum("hgqk,hkd->hgqd", p.astype(vb.dtype), vb, preferred_element_type=jnp.float32)
            acc_new = acc * alpha[..., None] + pv
            return (m_new, l_new, acc_new), None

        init = (
            jnp.full((hk, g, block_q), NEG_INF, jnp.float32),
            jnp.zeros((hk, g, block_q), jnp.float32),
            jnp.zeros((hk, g, block_q, d), jnp.float32),
        )
        # Only KV blocks up to the diagonal contribute; lax.scan over all of
        # them keeps a single program, masking handles the rest. XLA cannot
        # skip blocks; the Pallas kernel does (grid pruning).
        (m, l, acc), _ = jax.lax.scan(kv_step, init, (kg, vg, k_pos, k_valid))
        return acc / l[..., None]

    out = jax.vmap(q_block)(jnp.arange(nq), qg, q_pos)  # (nq,Hk,G,bq,D)
    out = out.transpose(0, 3, 1, 2, 4).reshape(sq, hq, d)
    return out[:s].astype(q.dtype)


def last_rows_importance(q, k, num: int, valid_len, scale=None, key_valid=None):
    """Mean attention mass of the last ``num`` LIVE query rows over all keys.

    The reference captures ``query[:, :, -num:, :]`` of its COMPACTED hidden
    states (utils.py:29) — the last ``num`` surviving tokens. In the
    mask-only (uncompacted) layout those are NOT the last ``num`` positions
    whenever fewer than ``num`` trailing text tokens exist (Qwen2-VL's num=4
    with a short suffix): dead image rows sit inside the trailing window. So
    with ``key_valid`` given, rows are selected by live-rank; without it the
    layout is compacted and the trailing window is exact.

    Args:
        q: (S, Hq, D); k: (S, Hk, D); valid_len: scalar int32 (<= S).
        num: static number of trailing query rows (1 for Qwen2, 4 for Qwen2-VL).

    Returns:
        importance: (S,) fp32 — softmax probs averaged over heads and the
        ``num`` rows; zero beyond each row's causal horizon and at padding.
    """
    s, hq, d = q.shape
    hk = k.shape[1]
    g = hq // hk
    scale = (1.0 / jnp.sqrt(d).astype(jnp.float32)) if scale is None else scale

    if key_valid is not None:
        positions = jnp.arange(s, dtype=jnp.int32)
        live_rank = jnp.cumsum(key_valid.astype(jnp.int32))
        n_live = live_rank[-1]
        wanted = key_valid & (live_rank > n_live - num)  # the last <=num live rows
        sorted_pos = jnp.sort(jnp.where(wanted, positions, -1))[-num:]
        # n_live < num leaves -1 sentinels: such rows contribute ZERO (the
        # fused kernels' capture mask has only the live rows; normalization
        # stays /num either way, keeping the two paths bit-consistent).
        row_live = sorted_pos >= 0  # (num,)
        row_pos = jnp.maximum(sorted_pos, 0)
    else:
        row_pos = valid_len - num + jnp.arange(num, dtype=jnp.int32)  # (num,)
        row_live = jnp.ones((num,), bool)
    q_rows = jnp.take(q, row_pos, axis=0).astype(jnp.float32)  # (num, Hq, D)
    kf = k.transpose(1, 0, 2).astype(jnp.float32)  # (Hk, S, D)
    q_rows = q_rows.reshape(num, hk, g, d).transpose(1, 2, 0, 3)  # (Hk,G,num,D)
    scores = jnp.einsum("hgnd,hkd->hgnk", q_rows, kf) * scale
    key_pos = jnp.arange(s, dtype=jnp.int32)
    mask = key_pos[None, :] <= row_pos[:, None]  # causal within last rows; subsumes padding
    if key_valid is not None:
        mask = mask & key_valid[None, :]
    scores = jnp.where(mask[None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(row_live[None, None, :, None], probs, 0.0)
    return probs.sum(axis=2).mean(axis=(0, 1)) / num


def decode_attention(q, k_cache, v_cache, cache_len):
    """Single-token decode attention against a padded cache.

    Args:
        q: (Hq, D); k_cache, v_cache: (S_pad, Hk, D); cache_len: scalar int32
            — number of valid entries (includes the current token, already
            written to the cache by the caller).
    Returns:
        (Hq, D) in q.dtype.
    """
    s_pad, hk, d = k_cache.shape
    hq = q.shape[0]
    g = hq // hk
    qf = q.reshape(hk, g, d).astype(jnp.float32)
    kf = k_cache.transpose(1, 0, 2).astype(jnp.float32)
    vf = v_cache.transpose(1, 0, 2).astype(jnp.float32)
    scores = jnp.einsum("hgd,hkd->hgk", qf, kf) / jnp.sqrt(d).astype(jnp.float32)
    mask = jnp.arange(s_pad) < cache_len
    scores = jnp.where(mask[None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hgk,hkd->hgd", probs, vf)
    return out.reshape(hq, d).astype(q.dtype)


def verify_attention(q, k_cache, v_cache, base_len):
    """Multi-row decode attention for speculative verification.

    The caller has appended the K rows' keys/values to the cache at
    positions ``base_len .. base_len+K``; row ``i`` attends the prefix plus
    rows ``0..i`` (standard causal continuation). Row 0's computation is the
    same masked fp32 softmax/einsum as :func:`decode_attention`, so a
    verify step with zero accepted drafts reproduces the plain decode step.

    Args:
        q: (K, Hq, D) query rows; k_cache, v_cache: (S_pad, Hk, D);
        base_len: scalar int32 — valid entries *before* these K rows.
    Returns:
        (K, Hq, D) in q.dtype.
    """
    s_pad, hk, d = k_cache.shape
    kq, hq = q.shape[0], q.shape[1]
    g = hq // hk
    qf = q.reshape(kq, hk, g, d).astype(jnp.float32)
    kf = k_cache.transpose(1, 0, 2).astype(jnp.float32)
    vf = v_cache.transpose(1, 0, 2).astype(jnp.float32)
    scores = jnp.einsum("nhgd,hkd->nhgk", qf, kf) / jnp.sqrt(d).astype(jnp.float32)
    horizon = base_len + 1 + jnp.arange(kq, dtype=jnp.int32)  # (K,)
    mask = jnp.arange(s_pad)[None, :] < horizon[:, None]
    scores = jnp.where(mask[:, None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("nhgk,hkd->nhgd", probs, vf)
    return out.reshape(kq, hq, d).astype(q.dtype)


def causal_attention(q, k, v, impl: str = "chunked", key_valid=None):
    if impl == "einsum":
        return causal_attention_einsum(q, k, v, key_valid=key_valid)
    if impl == "chunked":
        return causal_attention_chunked(q, k, v, key_valid=key_valid)
    if impl == "pallas":
        from .kernels.flash_prefill import flash_causal_attention

        return flash_causal_attention(q, k, v, key_valid=key_valid)
    raise ValueError(f"unknown attention impl: {impl}")
