"""Speculative decoding (runtime/spec_decode.py): prompt-lookup drafts +
one-weight-pass verification.

The load-bearing invariant is EXACT greedy parity: whatever the drafts are,
``generate_spec`` must emit the same token sequence as ``generate_greedy``
(the reference's decode is HF ``generate`` one token at a time,
/root/reference/script/playground/example_llava.py:146 — speculation is a
beyond-reference serving capability, so its oracle is our own plain loop).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framefusion_tpu.config import FrameFusionConfig, tiny_llm_config, tiny_moe_llm_config
from framefusion_tpu.models import qwen2
from framefusion_tpu.runtime.engine import CompressionEngine
from framefusion_tpu.runtime.spec_decode import draft_lookup

from test_engine import build_inputs


def np_draft_lookup(hist, hl, draft_len):
    """Independent numpy oracle for the bigram prompt-lookup."""
    if hl < 3:
        return None
    last0, last1 = hist[hl - 2], hist[hl - 1]
    best = -1
    for p in range(1, hl - 1):
        if hist[p - 1] == last0 and hist[p] == last1:
            best = p
    if best < 0:
        return None
    idx = np.clip(best + 1 + np.arange(draft_len), 0, len(hist) - 1)
    return hist[idx]


class TestDraftLookup:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        for trial in range(50):
            cap = 64
            hl = int(rng.integers(1, cap - 8))
            hist = np.zeros(cap, np.int32)
            # small alphabet => plenty of bigram repeats
            hist[:hl] = rng.integers(0, 5, hl)
            drafts, found = draft_lookup(jnp.asarray(hist), jnp.int32(hl), 4)
            want = np_draft_lookup(hist, hl, 4)
            if want is None:
                assert not bool(found)
            else:
                assert bool(found)
                np.testing.assert_array_equal(np.asarray(drafts), want)

    def test_no_history_no_match(self):
        hist = jnp.zeros((32,), jnp.int32)
        _, found = draft_lookup(hist, jnp.int32(1), 4)
        assert not bool(found)


@pytest.fixture(scope="module")
def engine_setup():
    cfg = tiny_llm_config(num_layers=6)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.75, ratio_lower_bound=0.05,
                           schedule_num_layers=6, bucket=32)
    return cfg, params, ff


def _prefill(engine, seed=0, coherent=0.3):
    h, pt, pos, img_start, n_img = build_inputs(seed=seed, coherent=coherent)
    return engine.prefill(h, pt, pos, 6, img_start, n_img)


class TestGreedyParity:
    @pytest.mark.parametrize("draft_len", [1, 3, 4, 7])
    def test_matches_plain_greedy(self, engine_setup, draft_len):
        cfg, params, ff = engine_setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        plain = engine.generate_greedy(_prefill(engine), 24)
        spec, stats = engine.generate_spec(
            _prefill(engine), 24, draft_len=draft_len, return_stats=True
        )
        assert spec == plain
        assert stats["macro_steps"] <= 23  # never worse than one pass/token

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_parity_across_seeds(self, engine_setup, seed):
        cfg, params, ff = engine_setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        plain = engine.generate_greedy(_prefill(engine, seed=seed), 16)
        spec = engine.generate_spec(_prefill(engine, seed=seed), 16, draft_len=4)
        assert spec == plain

    def test_eos_truncation(self, engine_setup):
        cfg, params, ff = engine_setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        plain = engine.generate_greedy(_prefill(engine), 16)
        eos = plain[5]  # force a cut mid-sequence
        spec = engine.generate_spec(_prefill(engine), 16, draft_len=4, eos_token_id=eos)
        assert spec == plain[: plain.index(eos) + 1]

    def test_oracle_prompt_accelerates(self, engine_setup):
        """Seeding the lookup history with the plain continuation makes the
        drafts near-perfect: fewer weight passes, same tokens. This pins the
        prompt_ids path AND demonstrates the speedup mechanism."""
        cfg, params, ff = engine_setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        plain = engine.generate_greedy(_prefill(engine), 32)
        spec, stats = engine.generate_spec(
            _prefill(engine), 32, draft_len=4,
            prompt_ids=np.asarray(plain, np.int32), return_stats=True,
        )
        assert spec == plain
        assert stats["tokens_per_pass"] > 1.5, stats
        # and the no-hint run, for comparison, must also be correct
        spec2 = engine.generate_spec(_prefill(engine), 32, draft_len=4)
        assert spec2 == plain


class TestVerifyStepUnit:
    def test_k1_matches_decode_step(self, engine_setup):
        """A 1-row verify is exactly one decode step (same masked softmax)."""
        cfg, params, ff = engine_setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        res = _prefill(engine)
        k_pool, v_pool, lens = engine.make_decode_state(res, 8)
        tok = jnp.int32(7)
        te = qwen2.embed(params, tok[None], cfg)
        pos = jnp.asarray(res.decode_pos_base, jnp.int32)
        lg_d, kd, vd, lens_d = qwen2.decode_step(
            params, te[0], pos, k_pool, v_pool, lens, cfg
        )
        k_pool2, v_pool2, lens2 = engine.make_decode_state(res, 8)
        lg_v, kv, vv = qwen2.verify_step(
            params, te, pos[None], k_pool2, v_pool2, lens2, cfg
        )
        # The K-row program compiles different contraction layouts than the
        # 1-row one, so parity is numerical (1e-7-level), not bitwise.
        np.testing.assert_allclose(np.asarray(lg_v[0]), np.asarray(lg_d), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(kv), np.asarray(kd), rtol=1e-5, atol=1e-6)


class TestSpecOnVariantStacks:
    def test_mrope_stack(self, engine_setup):
        cfg1, params, _ = engine_setup
        cfg = cfg1.replace(mrope_section=(4, 6, 6))
        ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.75, ratio_lower_bound=0.05,
                               schedule_num_layers=6, bucket=32, num_importance_queries=4)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        h, pt, pos, img_start, n_img = build_inputs(seed=0, coherent=0.3)
        pos3d = np.tile(pos, (3, 1))
        plain = engine.generate_greedy(engine.prefill(h, pt, pos3d, 6, img_start, n_img), 16)
        spec = engine.generate_spec(engine.prefill(h, pt, pos3d, 6, img_start, n_img), 16, draft_len=4)
        assert spec == plain

    def test_moe_stack(self):
        cfg = tiny_moe_llm_config(num_layers=4)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(1))
        ff = FrameFusionConfig(cost=0.5, similarity_lower_bound=0.8, ratio_lower_bound=0.05,
                               schedule_num_layers=4, bucket=32)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        plain = engine.generate_greedy(_prefill(engine), 12)
        spec = engine.generate_spec(_prefill(engine), 12, draft_len=3)
        assert spec == plain
