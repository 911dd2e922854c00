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


class TestBatchedSpec:
    """Batched speculative decode (spec_decode_loop_batch): per-sequence
    tokens must be EXACTLY the plain greedy sequences — per-sequence
    acceptance diverges, finished sequences idle in the loop, and rejected
    rows stay invisible dead padding in the common-offset decode region."""

    def _prefill_batch(self, engine, seeds=(0, 1, 2), coherent=(0.3, 0.45, 0.8)):
        out = []
        for s, c in zip(seeds, coherent):
            h, pt, pos, img_start, n_img = build_inputs(seed=s, coherent=c)
            out.append(engine.prefill(h, pt, pos, 6, img_start, n_img))
        return out

    def test_matches_solo_plain_greedy(self, engine_setup):
        cfg, params, ff = engine_setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        results = self._prefill_batch(engine)
        plain = [engine.generate_greedy(r, 16) for r in self._prefill_batch(engine)]
        spec, stats = engine.generate_spec_batch(results, 16, draft_len=4,
                                                 return_stats=True)
        assert spec == plain
        assert stats["macro_steps"] <= 15

    def test_matches_plain_batched_greedy(self, engine_setup):
        cfg, params, ff = engine_setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        plain = engine.generate_batch(self._prefill_batch(engine), 20)
        spec = engine.generate_spec_batch(self._prefill_batch(engine), 20, draft_len=3)
        assert spec == plain

    def test_oracle_hints_accelerate(self, engine_setup):
        """Per-sequence oracle histories -> near-perfect drafts for every
        sequence; the batch finishes in far fewer macro steps, same tokens."""
        cfg, params, ff = engine_setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        plain = [engine.generate_greedy(r, 24) for r in self._prefill_batch(engine)]
        spec, stats = engine.generate_spec_batch(
            self._prefill_batch(engine), 24, draft_len=4,
            prompt_ids=[np.asarray(p, np.int32) for p in plain],
            return_stats=True,
        )
        assert spec == plain
        assert stats["tokens_per_pass"] > 1.5, stats
        assert len(stats["accepted"]) == 3

    def test_eos_truncation(self, engine_setup):
        cfg, params, ff = engine_setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        plain = [engine.generate_greedy(r, 16) for r in self._prefill_batch(engine)]
        eos = plain[1][4]
        spec = engine.generate_spec_batch(self._prefill_batch(engine), 16,
                                          draft_len=4, eos_token_id=eos)
        for got, want in zip(spec, plain):
            if eos in want:
                want = want[: want.index(eos) + 1]
            assert got == want

    def test_mrope_batch(self, engine_setup):
        cfg1, params, _ = engine_setup
        cfg = cfg1.replace(mrope_section=(4, 6, 6))
        ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.75, ratio_lower_bound=0.05,
                               schedule_num_layers=6, bucket=32, num_importance_queries=4)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")

        def prefills():
            out = []
            for seed in (0, 2):
                h, pt, pos, img_start, n_img = build_inputs(seed=seed, coherent=0.35)
                out.append(engine.prefill(h, pt, np.tile(pos, (3, 1)), 6, img_start, n_img))
            return out

        plain = [engine.generate_greedy(r, 12) for r in prefills()]
        spec = engine.generate_spec_batch(prefills(), 12, draft_len=4)
        assert spec == plain

    def test_moe_batch(self):
        cfg = tiny_moe_llm_config(num_layers=4)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(1))
        ff = FrameFusionConfig(cost=0.5, similarity_lower_bound=0.8, ratio_lower_bound=0.05,
                               schedule_num_layers=4, bucket=32)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")

        def prefills():
            return [_prefill(engine, seed=s) for s in (0, 3)]

        plain = [engine.generate_greedy(r, 10) for r in prefills()]
        spec = engine.generate_spec_batch(prefills(), 10, draft_len=3)
        assert spec == plain

    def test_interface_generate_batch_speculative(self, engine_setup):
        from framefusion_tpu.interface import FrameFusionModel, apply_framefusion
        from framefusion_tpu.models.adapters.common import PrefillInputs

        cfg, params, ff = engine_setup
        model = apply_framefusion(
            FrameFusionModel(family="llava_video", cfg=cfg, params=params,
                             attn_impl="einsum"),
            cost=ff.cost, similarity_lower_bound=ff.similarity_lower_bound,
            ratio_lower_bound=ff.ratio_lower_bound,
        )

        def inputs():
            out = []
            for seed in (0, 1):
                h, pt, pos, img_start, n_img = build_inputs(seed=seed, coherent=0.4)
                out.append(PrefillInputs(input_embeds=h, patch_type=pt,
                                         position_ids=pos, patch_num=6,
                                         image_token_start=img_start,
                                         image_token_length=n_img))
            return out

        plain, _ = model.generate_batch(inputs(), max_new_tokens=12)
        spec, _ = model.generate_batch(inputs(), max_new_tokens=12, speculative=True)
        assert spec == plain

    def test_sink_cache_baseline_guarded(self, engine_setup):
        from framefusion_tpu.baselines.qwen2_baselines import BaselineEngine

        cfg, params, _ = engine_setup
        eng = BaselineEngine(params, cfg, "streamingllm",
                             {"length_rate": 0.4, "sink_cache_decode": True},
                             attn_impl="einsum", bucket=32)
        res = _prefill(eng)
        with pytest.raises(NotImplementedError):
            eng.generate_spec(res, 8)
        with pytest.raises(NotImplementedError):
            eng.generate_spec_batch([res], 8)
