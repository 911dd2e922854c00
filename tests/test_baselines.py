"""Baseline-methods tests (FastV / StreamingLLM / fixed merge / hybrids)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framefusion_tpu.config import FrameFusionConfig, tiny_llm_config
from framefusion_tpu.core.merge import apply_merge_weighted
from framefusion_tpu.core import mark_topk, order_by_patch, similarity_by_patch
from framefusion_tpu.models import qwen2
from framefusion_tpu.baselines import BaselineEngine
from framefusion_tpu.ops.attention import causal_attention_chunked, causal_attention_einsum

import oracle
import ref_pipeline
from test_core import make_sequence


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_llm_config(num_layers=6)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    h, pt, img_start, n_img = make_sequence(rng, 4, 6, 10, 3, hidden=128, coherent=0.7)
    h = (h * 0.05).astype(np.float32)
    pos = np.arange(len(pt), dtype=np.int32)
    return cfg, params, h, pt, pos, img_start, n_img


def ref_fastv(params, cfg, h, pos, img_start, img_len, k, r):
    """NumPy FastV: prune at layer k using layer k-1's last-row attention."""
    model = ref_pipeline.RefModel(params, cfg)
    hh = np.asarray(h, np.float32)
    pp = np.asarray(pos)
    for l in range(k):
        capture = 1 if l == k - 1 else 0
        hh, _, _, imp = model.layer_attn(l, hh, pp, capture_num=capture)
        hh = model.layer_mlp(l, hh)
    keep_img = int(round(img_len * (1 - r)))
    kept = oracle.prune_keep_indices(imp, img_start, img_len, keep_img)
    hh, pp = hh[kept], pp[kept]
    for l in range(k, cfg.num_layers):
        hh, _, _, _ = model.layer_attn(l, hh, pp)
        hh = model.layer_mlp(l, hh)
    return model.logits(hh[-1:])[0], kept


class TestFastV:
    def test_matches_numpy_reference(self, setup):
        cfg, params, h, pt, pos, img_start, n_img = setup
        eng = BaselineEngine(params, cfg, "fastv", {"fastv_k": 2, "fastv_r": 0.5},
                             attn_impl="einsum", bucket=32)
        res = eng.prefill(h, pt, pos, 6, img_start, n_img)
        ref_logits, kept = ref_fastv(params, cfg, h, pos, img_start, n_img, k=2, r=0.5)
        assert res.valid_len == len(kept)
        np.testing.assert_allclose(np.asarray(res.logits), ref_logits, rtol=2e-3, atol=2e-3)
        # cache raggedness: full length below k, pruned length at/after k
        assert res.layer_caches[0][2] == len(pt)
        assert res.layer_caches[1][2] == len(pt)
        assert res.layer_caches[2][2] == len(kept)

    def test_greedy_decode_runs(self, setup):
        cfg, params, h, pt, pos, img_start, n_img = setup
        eng = BaselineEngine(params, cfg, "fastv", {"fastv_k": 2, "fastv_r": 0.5},
                             attn_impl="einsum", bucket=32)
        res = eng.prefill(h, pt, pos, 6, img_start, n_img)
        toks = eng.generate_greedy(res, max_new_tokens=4)
        assert len(toks) == 4


class TestStreamingLLM:
    def test_sink_mask_matches_manual(self):
        rng = np.random.default_rng(1)
        s, hq, hk, d = 96, 4, 2, 16
        q = jnp.asarray(rng.standard_normal((s, hq, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((s, hk, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((s, hk, d)), jnp.float32)
        init, window = 8, 24
        got = causal_attention_chunked(q, k, v, sink=(init, window), block_q=32, block_k=32)

        # manual: mask then full softmax
        g = hq // hk
        kf = np.repeat(np.asarray(k), g, axis=1)
        vf = np.repeat(np.asarray(v), g, axis=1)
        scores = np.einsum("shd,thd->hst", np.asarray(q), kf) / np.sqrt(d)
        qp = np.arange(s)[:, None]
        kp = np.arange(s)[None, :]
        mask = (kp <= qp) & ((kp < init) | (kp > qp - window))
        scores = np.where(mask[None], scores, -1e30)
        e = np.exp(scores - scores.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        ref = np.einsum("hst,thd->shd", probs, vf)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)

    def test_program_runs_and_keeps_length(self, setup):
        cfg, params, h, pt, pos, img_start, n_img = setup
        eng = BaselineEngine(params, cfg, "streamingllm",
                             {"init_num": 4, "length_rate": 0.5},
                             attn_impl="einsum", bucket=32)
        res = eng.prefill(h, pt, pos, 6, img_start, n_img)
        assert res.valid_len == len(pt)
        assert np.isfinite(np.asarray(res.logits)).all()


def ref_prefill_merge(params, cfg, h, pt, pos, patch_num, sparsity):
    """NumPy fixed-schedule merging: per-layer top-k merge at the layer input."""
    model = ref_pipeline.RefModel(params, cfg)
    hh = np.asarray(h, np.float32)
    ptc = np.asarray(pt).copy()
    pp = np.asarray(pos)
    remaining = int((ptc >= 0).sum())
    events = []
    for l in range(cfg.num_layers):
        k_l = int(sparsity[l] * remaining)
        if k_l:
            sim, order = oracle.similarity_by_patch(hh, ptc, patch_num)
            marked = oracle.topk_indices(sim, k_l)
            merged, keep = oracle.merge_tokens(hh, sim, order, marked)
            hh, ptc, pp = merged[keep], ptc[keep], pp[keep]
            remaining -= k_l
            events.append((l, k_l))
        hh, _, _, _ = model.layer_attn(l, hh, pp)
        hh = model.layer_mlp(l, hh)
    return model.logits(hh[-1:])[0], hh.shape[0], events


class TestPrefillMerge:
    def test_matches_numpy_reference(self, setup):
        cfg, params, h, pt, pos, img_start, n_img = setup
        sparsity = [0.3, 0.2, 0.0, 0.1, 0.0, 0.0]
        eng = BaselineEngine(params, cfg, "prefill_merge", {"sparsity": sparsity},
                             attn_impl="einsum", bucket=32)
        res = eng.prefill(h, pt, pos, 6, img_start, n_img)
        ref_logits, ref_len, ref_events = ref_prefill_merge(params, cfg, h, pt, pos, 6, sparsity)
        got_events = [(e.layer, e.tokens_removed) for e in res.telemetry.events]
        assert got_events == ref_events
        assert res.valid_len == ref_len
        np.testing.assert_allclose(np.asarray(res.logits), ref_logits, rtol=3e-3, atol=3e-3)


class TestWeightedMerge:
    def test_mass_weighted_average(self):
        # 4 tokens of one patch across 4 frames; merge positions 1,2 into 0,
        # with token 0 already carrying mass 2.
        h = np.array([[2.0, 0.0], [4.0, 0.0], [6.0, 0.0], [100.0, 1.0]], np.float32)
        w = np.array([2.0, 1.0, 1.0, 1.0], np.float32)
        order = jnp.arange(4, dtype=jnp.int32)
        marked = jnp.asarray([False, True, True, False])
        merged, new_w, keep = apply_merge_weighted(jnp.asarray(h), jnp.asarray(w), marked, order)
        # head value = (2*2 + 4 + 6) / 4 = 3.5; mass 4
        np.testing.assert_allclose(np.asarray(merged)[0], [3.5, 0.0], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(new_w), [4.0, 1.0, 1.0, 1.0])
        np.testing.assert_array_equal(np.asarray(keep), [True, False, False, True])


class TestHybrids:
    def test_merge_then_fastv_trajectory(self, setup):
        cfg, params, h, pt, pos, img_start, n_img = setup
        eng = BaselineEngine(params, cfg, "merge_then_fastv",
                             {"sparsity": [0.1] * cfg.num_layers, "fastv_k": 2, "fastv_r": 0.5},
                             attn_impl="einsum", bucket=32)
        res = eng.prefill(h, pt, pos, 6, img_start, n_img)
        kinds = [e.kind for e in res.telemetry.events]
        assert "fastv_prune" in kinds and "merge_fixed" in kinds
        assert res.valid_len < len(pt)
        assert np.isfinite(np.asarray(res.logits)).all()
        # budget bookkeeping consistent with telemetry
        removed = sum(e.tokens_removed for e in res.telemetry.events)
        assert res.valid_len == len(pt) - removed

    def test_fastv_then_merge_trajectory(self, setup):
        cfg, params, h, pt, pos, img_start, n_img = setup
        eng = BaselineEngine(params, cfg, "fastv_then_merge",
                             {"fastv_k": 2, "fastv_r": 0.75, "merging_sparsity": 0.3},
                             attn_impl="einsum", bucket=32)
        res = eng.prefill(h, pt, pos, 6, img_start, n_img)
        ev = [(e.layer, e.kind) for e in res.telemetry.events]
        assert (2, "fastv_prune") in ev
        assert any(k == "merge_fixed" and l == 3 for l, k in ev)
        removed = sum(e.tokens_removed for e in res.telemetry.events)
        assert res.valid_len == len(pt) - removed

    def test_unknown_mode_raises(self, setup):
        cfg, params, h, pt, pos, img_start, n_img = setup
        eng = BaselineEngine(params, cfg, "nope", {}, attn_impl="einsum")
        with pytest.raises(NotImplementedError):
            eng.prefill(h, pt, pos, 6, img_start, n_img)


class TestSinkCacheDecode:
    def test_windowed_decode_runs_and_differs_from_full(self, setup):
        cfg, params, h, pt, pos, img_start, n_img = setup
        eng = BaselineEngine(params, cfg, "streamingllm",
                             {"init_num": 4, "length_rate": 0.5, "sink_cache_decode": True,
                              "window_length": 24, "num_sink_tokens": 4},
                             attn_impl="einsum", bucket=32)
        res = eng.prefill(h, pt, pos, 6, img_start, n_img)
        toks_windowed = eng.generate_greedy(res, max_new_tokens=6)
        assert len(toks_windowed) == 6

        eng_full = BaselineEngine(params, cfg, "streamingllm",
                                  {"init_num": 4, "length_rate": 0.5},
                                  attn_impl="einsum", bucket=32)
        res2 = eng_full.prefill(h, pt, pos, 6, img_start, n_img)
        toks_full = eng_full.generate_greedy(res2, max_new_tokens=6)
        assert len(toks_full) == 6

    def test_window_covering_everything_matches_full_decode(self, setup):
        cfg, params, h, pt, pos, img_start, n_img = setup
        base_kwargs = {"init_num": 4, "length_rate": 0.5}
        eng_full = BaselineEngine(params, cfg, "streamingllm", base_kwargs,
                                  attn_impl="einsum", bucket=32)
        res = eng_full.prefill(h, pt, pos, 6, img_start, n_img)
        toks_full = eng_full.generate_greedy(res, max_new_tokens=5)

        # window larger than the whole cache => mask is all-true => identical
        eng_win = BaselineEngine(params, cfg, "streamingllm",
                                 {**base_kwargs, "sink_cache_decode": True,
                                  "window_length": 10_000, "num_sink_tokens": 4},
                                 attn_impl="einsum", bucket=32)
        res2 = eng_win.prefill(h, pt, pos, 6, img_start, n_img)
        toks_win = eng_win.generate_greedy(res2, max_new_tokens=5)
        assert toks_win == toks_full

    def test_generate_batch_uses_windowed_decode(self, setup):
        """generate_batch on the sink_cache_decode variant must reproduce the
        per-sequence windowed decode, not the inherited full-attention
        batched loop (which would silently drop the window semantics)."""
        cfg, params, h, pt, pos, img_start, n_img = setup
        eng = BaselineEngine(params, cfg, "streamingllm",
                             {"init_num": 4, "length_rate": 0.5, "sink_cache_decode": True,
                              "window_length": 24, "num_sink_tokens": 4},
                             attn_impl="einsum", bucket=32)
        res = eng.prefill(h, pt, pos, 6, img_start, n_img)
        solo = eng.generate_greedy(res, max_new_tokens=6)
        res2 = eng.prefill(h, pt, pos, 6, img_start, n_img)
        batch = eng.generate_batch([res, res2], max_new_tokens=6)
        assert batch == [solo, solo]


def test_compute_density_overhead():
    from framefusion_tpu.baselines.qwen2_baselines import compute_density_overhead

    cost, rem = compute_density_overhead([0.0, 0.0, 0.0, 0.0])
    assert cost == pytest.approx(1.0) and rem == pytest.approx(1.0)
    cost, rem = compute_density_overhead([0.5, 0.5])
    assert rem == pytest.approx(0.25)
    assert cost == pytest.approx((0.5 + 0.25) / 2)
