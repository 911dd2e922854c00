"""Speculative greedy decoding with prompt-lookup drafting — one device program.

Decode streams every decoder weight from HBM per emitted token; a verify
pass over K candidate rows streams them ONCE for up to K committed tokens
(qwen2.verify_step). This module supplies the drafts and the accept/commit
loop, entirely in-graph:

- **Drafting** is prompt-lookup (n-gram) over the token history: find the
  most recent earlier occurrence of the last two committed tokens and
  propose the ``draft_len`` tokens that followed it. No draft model, no
  extra weights — the right fit for video QA, where answers echo the
  prompt's phrasing and decode repeats itself (the reference never drafts;
  its decode is HF ``generate`` one token at a time, e.g. the timed A/B at
  /root/reference/script/playground/example_llava.py:129-167).
- **Verification** commits the longest prefix of drafts that equals the
  model's own greedy continuation, plus one bonus token — so the output is
  *exactly* the plain greedy sequence (correctness never depends on draft
  quality; a bad draft only costs speed). Rejected rows' K/V entries stay
  in the pool as dead padding past ``cache_lens`` and are overwritten in
  place by the next verify — rollback is free because the per-layer ragged
  cache already masks by length.
- **The whole loop is one jitted ``lax.while_loop``** (single host sync at
  the end), matching the engine's `_decode_loop` contract: pools donated,
  tokens read once.

Greedy-parity caveat: verify row 0 reuses decode_attention's exact masked
fp32 softmax, so CPU/fp32 runs reproduce plain decode bitwise; on-chip bf16
matmul tiling for K rows vs 1 can reassociate reductions and flip argmax
ties — the same fp-numerics caveat the engine documents for batched decode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LLMConfig
from ..core.compact import bucket_length
from ..models import qwen2

__all__ = ["spec_decode_loop", "spec_decode_loop_batch", "draft_lookup"]


def draft_lookup(hist: jnp.ndarray, hist_len: jnp.ndarray, draft_len: int):
    """Prompt-lookup drafts: most recent earlier bigram match, vectorized.

    Finds the largest p < hist_len-1 with hist[p-1] == hist[hist_len-2] and
    hist[p] == hist[hist_len-1], and proposes hist[p+1 .. p+draft_len].
    Returns (drafts (draft_len,) int32, found bool). With no match (or
    hist_len < 3) the drafts are the buffer's padding — harmless, because
    acceptance compares drafts against the model's own greedy tokens, never
    against the draft source.
    """
    cap = hist.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    prev = jnp.concatenate([hist[:1], hist[:-1]])  # prev[p] = hist[p-1]
    last1 = hist[hist_len - 1]
    last0 = hist[hist_len - 2]
    m = (
        (hist == last1)
        & (prev == last0)
        & (idx >= 1)
        & (idx < hist_len - 1)
        & (hist_len >= 3)
    )
    p = jnp.max(jnp.where(m, idx, -1))
    gather = jnp.clip(p + 1 + jnp.arange(draft_len, dtype=jnp.int32), 0, cap - 1)
    return jnp.take(hist, gather), p >= 0


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new", "pos_dims", "draft_len", "tail_split"),
    donate_argnums=(1, 2),
)
def spec_decode_loop(
    params,
    k_pool,
    v_pool,
    cache_lens,
    first_logits,
    pos_base,
    hist0,
    hist_len0,
    *,
    cfg: LLMConfig,
    max_new: int,
    pos_dims: int,
    draft_len: int,
    tail_split=None,
):
    """Greedy decode of ``max_new`` tokens via draft-and-verify macro steps.

    Args:
        k_pool, v_pool: (L, S_pad, Hk, hd) with >= max_new + draft_len rows
            of headroom past every layer's length (donated, updated in place).
        cache_lens: (L,) ragged valid lengths.
        first_logits: (V,) prefill logits — token 0 comes from these, as in
            the plain `_decode_loop`.
        pos_base: scalar int32 — rotary position of the first new token.
        hist0: (H,) int32 token history seed (e.g. the prompt's text ids),
            zero-padded; H must be >= hist_len0 + max_new + draft_len.
        hist_len0: scalar int32 valid prefix of ``hist0``.

    Returns:
        (tokens (max_new,), macro_steps, drafted, accepted, k_pool, v_pool,
        cache_lens) — all device arrays; ``accepted / max(drafted, 1)`` is
        the acceptance rate and ``(max_new-1) / macro_steps`` the
        tokens-per-weight-pass multiplier (1.0 = plain decode,
        draft_len+1 = perfect speculation). The returned pools alias the
        donated inputs and carry the committed tokens' K/V (positions past
        each layer's final length are dead padding).
    """
    kq = draft_len + 1
    hist_cap = hist0.shape[0]
    tok0 = jnp.argmax(first_logits).astype(jnp.int32)
    out = jnp.zeros((max_new + draft_len,), jnp.int32)
    out = out.at[0].set(tok0)
    hist = jax.lax.dynamic_update_slice(hist0, tok0[None], (hist_len0,))

    # carry: emitted, last committed token, out buffer, history, hist_len,
    # pools, ragged lens, stats (macro steps, drafted, accepted)
    state = (
        jnp.int32(1), tok0, out, hist, hist_len0 + 1,
        k_pool, v_pool, cache_lens,
        jnp.int32(0), jnp.int32(0), jnp.int32(0),
    )

    def cond(st):
        return st[0] < max_new

    def body(st):
        emitted, last, out, hist, hl, k_pool, v_pool, lens, steps, drafted, accepted = st
        drafts, found = draft_lookup(hist, hl, draft_len)
        rows = jnp.concatenate([last[None], drafts])  # (K,)
        te = qwen2.embed(params, rows, cfg)
        pos = pos_base + (emitted - 1) + jnp.arange(kq, dtype=jnp.int32)
        pos_ids = jnp.tile(pos[None], (3, 1)) if pos_dims == 3 else pos
        logits, k_pool, v_pool = qwen2.verify_step(
            params, te, pos_ids, k_pool, v_pool, lens, cfg, tail_split=tail_split
        )
        t = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (K,)
        # Accept drafts while they equal the model's own greedy continuation.
        ok = drafts == t[:-1]
        acc = jnp.cumprod(ok.astype(jnp.int32))
        a = jnp.sum(acc)  # 0..draft_len accepted drafts
        n_new = a + 1  # plus the bonus token t[a]
        out = jax.lax.dynamic_update_slice(out, t, (emitted,))
        hist = jax.lax.dynamic_update_slice(hist, t, (hl,))
        return (
            emitted + n_new,
            jnp.take(t, a),
            out,
            hist,
            hl + n_new,
            k_pool,
            v_pool,
            lens + n_new,
            steps + 1,
            drafted + jnp.where(found, draft_len, 0),
            accepted + a,
        )

    st = jax.lax.while_loop(cond, body, state)
    return st[2][:max_new], st[8], st[9], st[10], st[5], st[6], st[7]


def spec_macro_step(
    params, last, emitted, hist, hist_len, pos_bases,
    k_pool, v_pool, cache_lens, dmask, base,
    *, cfg: LLMConfig, pos_dims: int, draft_len: int, tail_split=None,
    k_tail=None, v_tail=None, phys=None,
):
    """One batched draft-and-verify macro step — the shared core of
    :func:`spec_decode_loop_batch` and the serving chunk program
    (runtime/serving._serve_chunk). Per-sequence prompt-lookup drafts
    (skipped entirely at ``draft_len == 0``, where this is plain batched
    greedy decode with per-sequence validity bitmaps), ONE
    ``qwen2.verify_step_batch`` weight pass writing at common offset
    ``base``, then the model's own argmax and the longest-accepted-prefix
    counts. Commit bookkeeping (budget/eos clamps, output buffers) stays
    with the caller.

    ``k_tail``/``v_tail``/``phys`` select the physically split pool layout
    (layers >= P in a smaller array; see qwen2.verify_step_batch) — the
    serving loop's ``tail_pool=`` option rides this.

    Returns (t (B, K) greedy tokens, a (B,) accepted draft counts,
    found (B,) draft-source hits, k_pool, v_pool, k_tail, v_tail).
    """
    kq = draft_len + 1
    if draft_len > 0:
        drafts, found = jax.vmap(draft_lookup, in_axes=(0, 0, None))(
            hist, hist_len, draft_len)
        rows = jnp.concatenate([last[:, None], drafts], axis=1)  # (B, K)
    else:
        found = jnp.zeros(last.shape, bool)
        rows = last[:, None]
    te = qwen2.embed(params, rows, cfg)
    pos = pos_bases[:, None] + (emitted[:, None] - 1) + jnp.arange(kq, dtype=jnp.int32)[None]
    pos_ids = jnp.tile(pos[None], (3, 1, 1)) if pos_dims == 3 else pos
    logits, k_pool, v_pool, k_tail, v_tail = qwen2.verify_step_batch(
        params, te, pos_ids, k_pool, v_pool, cache_lens, dmask,
        base, jnp.int32(0), cfg, tail_split=tail_split,
        k_tail=k_tail, v_tail=v_tail, phys=phys,
    )
    t = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, K)
    if draft_len > 0:
        ok = drafts == t[:, :-1]
        a = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1)
    else:
        a = jnp.zeros(last.shape, jnp.int32)
    return t, a, found, k_pool, v_pool, k_tail, v_tail


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new", "pos_dims", "draft_len", "tail_split"),
    donate_argnums=(1, 2),
)
def spec_decode_loop_batch(
    params,
    k_pool,
    v_pool,
    cache_lens,
    first_logits,
    pos_bases,
    write_pos,
    hist0,
    hist_len0,
    *,
    cfg: LLMConfig,
    max_new: int,
    pos_dims: int,
    draft_len: int,
    tail_split=None,
):
    """Batched speculative greedy decode: every macro step drafts per
    sequence (vmapped prompt-lookup) and verifies all B sequences' K rows in
    ONE weight pass (qwen2.verify_step_batch) — the weight stream is shared
    across both the batch AND the candidate rows, compounding the two
    bandwidth wins (batched decode shares it across B; speculation shares it
    across K).

    Per-sequence acceptance diverges, so each sequence commits its own
    ``a_b + 1`` tokens per macro step; a sequence that reaches ``max_new``
    keeps riding the loop with ``n_new = 0`` (its writes land in dead
    padding) until the slowest sequence finishes — the loop is bounded by
    ``max_new - 1`` macro steps because every unfinished sequence commits at
    least one token per step.

    Args:
        k_pool, v_pool: (L, B, S_pool, Hk, hd) batched pools (donated). The
            decode region needs ``K*(max_new-1)`` rows past ``write_pos``:
            the common-offset discipline burns K rows per macro step whether
            or not drafts are accepted (memory traded for scatter-free
            writes; acceptance compresses wall-clock, not the region).
        cache_lens: (L, B) ragged prefix lengths.
        first_logits: (B, V) prefill logits.
        pos_bases: (B,) rotary position of each sequence's first new token.
        write_pos: scalar int32 — decode-region start (common across B).
        hist0: (B, H) per-sequence token-history seeds, zero-padded;
            H >= max(hist_len0) + max_new + draft_len + 1.
        hist_len0: (B,) valid history prefixes.

    Returns:
        (tokens (B, max_new), macro_steps, drafted (B,), accepted (B,),
        k_pool, v_pool) — per-sequence tokens are EXACTLY the plain batched
        greedy sequences (same fp caveat as the solo loop).
    """
    kq = draft_len + 1
    b = first_logits.shape[0]
    s_pool = k_pool.shape[2]
    tok0 = jnp.argmax(first_logits, axis=-1).astype(jnp.int32)  # (B,)
    out = jnp.zeros((b, max_new + kq), jnp.int32)
    out = out.at[:, 0].set(tok0)
    upd_row = jax.vmap(lambda buf, val, at: jax.lax.dynamic_update_slice(buf, val, (at,)))
    hist = upd_row(hist0, tok0[:, None], hist_len0)
    pos_iota = jnp.arange(s_pool, dtype=jnp.int32)

    state = (
        jnp.full((b,), 1, jnp.int32),  # emitted
        tok0,  # last committed token
        out,
        hist,
        hist_len0 + 1,
        k_pool,
        v_pool,
        jnp.zeros((b, s_pool), bool),  # committed decode-region rows
        jnp.int32(0),  # macro steps
        jnp.zeros((b,), jnp.int32),  # drafted
        jnp.zeros((b,), jnp.int32),  # accepted
    )

    def cond(st):
        return jnp.min(st[0]) < max_new

    def body(st):
        (emitted, last, out, hist, hl, k_pool, v_pool, dmask,
         steps, drafted, accepted) = st
        t, a, found, k_pool, v_pool, _, _ = spec_macro_step(
            params, last, emitted, hist, hl, pos_bases,
            k_pool, v_pool, cache_lens, dmask, write_pos + steps * kq,
            cfg=cfg, pos_dims=pos_dims, draft_len=draft_len, tail_split=tail_split,
        )
        active = emitted < max_new
        n_new = jnp.where(active, a + 1, 0)
        # Finished sequences re-write their padding slots in place — harmless.
        out = upd_row(out, t, emitted)
        hist = upd_row(hist, t, hl)
        base = write_pos + steps * kq
        dmask = dmask | (
            (pos_iota[None, :] >= base) & (pos_iota[None, :] < base + n_new[:, None])
        )
        return (
            emitted + n_new,
            jnp.where(active, jnp.take_along_axis(t, a[:, None], axis=1)[:, 0], last),
            out,
            hist,
            hl + n_new,
            k_pool,
            v_pool,
            dmask,
            steps + 1,
            drafted + jnp.where(active & found, draft_len, 0),
            accepted + jnp.where(active, a, 0),
        )

    st = jax.lax.while_loop(cond, body, state)
    return st[2][:, :max_new], st[8], st[9], st[10], st[5], st[6]


def generate_spec_batch(
    engine,
    results,
    max_new_tokens: int,
    draft_len: int = 4,
    prompt_ids=None,
    eos_token_id=None,
    return_stats: bool = False,
):
    """Engine-facing wrapper for :func:`spec_decode_loop_batch` — the
    speculative sibling of ``CompressionEngine.generate_batch``. Pools are
    assembled exactly like the plain batched decode, with a
    ``draft_len+1``-rows-per-macro-step decode region (see the loop's
    docstring for the memory tradeoff). ``prompt_ids``: optional list of
    per-sequence text token id lists seeding each prompt-lookup history.
    Output is exactly the plain batched greedy tokens.
    """
    cfg = engine.cfg
    kq = draft_len + 1
    b = len(results)
    region = kq * max(max_new_tokens - 1, 1) + 1
    max_prefix = max(max(c[2] for c in r.layer_caches) for r in results)
    s_pool = bucket_length(max_prefix + region, engine.ff.bucket)
    write_pos = s_pool - region
    shape = (cfg.num_layers, b, s_pool, cfg.num_kv_heads, cfg.head_dim_)
    k_pools = jnp.zeros(shape, cfg.dtype)
    v_pools = jnp.zeros_like(k_pools)
    lens_cols = []
    for bi, r in enumerate(results):
        k_one, v_one, lens_one = engine.make_decode_state(r, region, s_pool=s_pool)
        k_pools = jax.lax.dynamic_update_slice(k_pools, k_one[:, None], (0, bi, 0, 0, 0))
        v_pools = jax.lax.dynamic_update_slice(v_pools, v_one[:, None], (0, bi, 0, 0, 0))
        lens_cols.append(lens_one)
        del k_one, v_one
    cache_lens = jnp.stack(lens_cols, axis=1)  # (L, B)
    first_logits = jnp.stack([r.logits for r in results])
    pos_bases = jnp.asarray([r.decode_pos_base for r in results], jnp.int32)
    pos_dims = results[0].pos_dims
    assert all(r.pos_dims == pos_dims for r in results), "mixed rope layouts in one batch"

    seqs = [
        np.asarray(p, np.int32).reshape(-1) if p is not None else np.zeros((0,), np.int32)
        for p in (prompt_ids if prompt_ids is not None else [None] * b)
    ]
    assert len(seqs) == b, "prompt_ids must have one entry per sequence"
    longest = max((len(s) for s in seqs), default=0)
    seed_cap = max(64, int(2 ** np.ceil(np.log2(max(1, longest)))))
    hist_cap = seed_cap + max_new_tokens + draft_len + 1
    hist0 = np.zeros((b, hist_cap), np.int32)
    for bi, s in enumerate(seqs):
        hist0[bi, : len(s)] = s
    hist_len0 = np.asarray([len(s) for s in seqs], np.int32)

    from .engine import best_tail_split_batch

    split = best_tail_split_batch(
        [[c[2] for c in r.layer_caches] for r in results],
        s_pool, write_pos, engine.ff.bucket)
    toks, steps, drafted, accepted, _, _ = spec_decode_loop_batch(
        engine.params,
        k_pools,
        v_pools,
        cache_lens,
        first_logits,
        pos_bases,
        jnp.int32(write_pos),
        jnp.asarray(hist0),
        jnp.asarray(hist_len0),
        cfg=cfg,
        max_new=max_new_tokens,
        pos_dims=pos_dims,
        draft_len=draft_len,
        tail_split=split,
    )
    rows = np.asarray(toks)
    out = []
    for row in rows:
        ids = [int(x) for x in row]
        if eos_token_id is not None and eos_token_id in ids:
            ids = ids[: ids.index(eos_token_id) + 1]
        out.append(ids)
    if return_stats:
        stats = {
            "macro_steps": int(steps),
            "drafted": [int(x) for x in np.asarray(drafted)],
            "accepted": [int(x) for x in np.asarray(accepted)],
            "tokens_per_pass": (max_new_tokens - 1) / max(int(steps), 1),
        }
        return out, stats
    return out


def generate_spec(
    engine,
    result,
    max_new_tokens: int,
    draft_len: int = 4,
    prompt_ids=None,
    eos_token_id=None,
    return_stats: bool = False,
):
    """Engine-facing wrapper: pools from ``make_decode_state`` (with
    ``draft_len`` rows of verify headroom), history seeded from the prompt's
    TEXT token ids if the caller has them (video embeddings have no ids to
    look up), one host sync for the finished tokens.

    Output is exactly ``generate_greedy`` (see module docstring for the fp
    caveat); drafting only changes how many weight passes it takes.
    """
    cfg = engine.cfg
    k_pool, v_pool, cache_lens = engine.make_decode_state(
        result, max_new_tokens + draft_len
    )
    from .engine import best_tail_split

    split = best_tail_split(
        [c[2] for c in result.layer_caches], int(k_pool.shape[1]),
        max_new_tokens + draft_len, engine.ff.bucket)
    pids = np.asarray(prompt_ids, np.int32).reshape(-1) if prompt_ids is not None else np.zeros((0,), np.int32)
    # Pad the history seed to a small set of buckets so repeat calls with
    # different prompt lengths don't each compile a fresh loop.
    seed_cap = max(64, int(2 ** np.ceil(np.log2(max(1, len(pids))))))
    hist_cap = seed_cap + max_new_tokens + draft_len + 1
    hist0 = np.zeros((hist_cap,), np.int32)
    hist0[: len(pids)] = pids
    toks, steps, drafted, accepted, _, _, _ = spec_decode_loop(
        engine.params,
        k_pool,
        v_pool,
        cache_lens,
        result.logits,
        jnp.asarray(result.decode_pos_base, jnp.int32),
        jnp.asarray(hist0),
        jnp.int32(len(pids)),
        cfg=cfg,
        max_new=max_new_tokens,
        pos_dims=result.pos_dims,
        draft_len=draft_len,
        tail_split=split,
    )
    out = [int(x) for x in np.asarray(toks)]
    if eos_token_id is not None and eos_token_id in out:
        out = out[: out.index(eos_token_id) + 1]
    if return_stats:
        stats = {
            "macro_steps": int(steps),
            "drafted": int(drafted),
            "accepted": int(accepted),
            # token 0 is free (prefill logits) in the plain loop too, so the
            # fair multiplier is (max_new-1) emitted-by-decode tokens / passes
            "tokens_per_pass": (max_new_tokens - 1) / max(int(steps), 1),
        }
        return out, stats
    return out
