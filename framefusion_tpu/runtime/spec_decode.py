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
from ..models import qwen2

__all__ = ["spec_decode_loop", "draft_lookup"]


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
    static_argnames=("cfg", "max_new", "pos_dims", "draft_len"),
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
            params, te, pos_ids, k_pool, v_pool, lens, cfg
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
