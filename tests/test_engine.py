"""Integration tests: segmented compressed-prefill executor vs the NumPy
reference pipeline (dynamic shapes, oracle decisions)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framefusion_tpu.config import FrameFusionConfig, tiny_llm_config
from framefusion_tpu.models import qwen2
from framefusion_tpu.runtime.engine import CompressionEngine

import oracle
import ref_pipeline
from test_core import make_sequence


def build_inputs(seed=0, n_pre=4, patch_num=6, n_frames=10, n_post=3, hidden=128, coherent=0.8):  # noqa: kwargs used by fuzz
    rng = np.random.default_rng(seed)
    h, pt, img_start, n_img = make_sequence(rng, n_pre, patch_num, n_frames, n_post, hidden=hidden, coherent=coherent)
    # Scale down: raw N(0,1) embeddings explode through random layers; keep
    # activations tame so fp32 comparisons stay tight.
    h = (h * 0.05).astype(np.float32)
    pos = np.arange(len(pt), dtype=np.int32)
    return h, pt, pos, img_start, n_img


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_llm_config(num_layers=6)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    # schedule_num_layers must match the stack depth for a sensible test
    # budget; bucket=32 exercises repeated re-bucketing on small sequences.
    ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.75, ratio_lower_bound=0.05,
                           schedule_num_layers=6, bucket=32)
    return cfg, params, ff


def run_both(setup, seed, coherent, n_frames=10, ff_override=None, mode="fused", pool_layers=8):
    cfg, params, ff = setup
    ff = ff_override or ff
    h, pt, pos, img_start, n_img = build_inputs(seed=seed, coherent=coherent, n_frames=n_frames)
    engine = CompressionEngine(params, cfg, ff, attn_impl="einsum", pool_layers=pool_layers)
    res = engine.prefill(h, pt, pos, patch_num=6, image_token_start=img_start,
                         image_token_length=n_img, mode=mode)
    ref = ref_pipeline.ref_compressed_prefill(params, cfg, ff, h, pt, pos, 6, img_start, n_img)
    return engine, res, ref


@pytest.fixture(params=["fused", "segmented"])
def mode(request):
    return request.param


class TestCompressedPrefill:
    def test_event_sequence_matches(self, setup, mode):
        _, res, ref = run_both(setup, seed=0, coherent=0.8, mode=mode)
        got = [(e.layer, e.kind, e.tokens_removed) for e in res.telemetry.events]
        assert got == ref["events"]
        assert res.telemetry.sparsity_list == pytest.approx(ref["sparsity"], abs=1e-9)

    def test_final_length_and_logits_match(self, setup, mode):
        _, res, ref = run_both(setup, seed=0, coherent=0.8, mode=mode)
        assert res.valid_len == ref["final_len"]
        assert res.telemetry.tail_start_layer == ref["tail_start"]
        np.testing.assert_allclose(np.asarray(res.logits), ref["logits"], rtol=2e-3, atol=2e-3)
        assert int(np.argmax(np.asarray(res.logits))) == int(ref["logits"].argmax())

    def test_cache_lengths_match_reference_raggedness(self, setup, mode):
        cfg, _, _ = setup
        _, res, ref = run_both(setup, seed=0, coherent=0.8, mode=mode)
        for l in range(cfg.num_layers):
            k_ref, _ = ref["caches"][l]
            _, _, length = res.layer_caches[l]
            assert length == k_ref.shape[0], f"layer {l}"

    def test_cache_contents_match(self, setup, mode):
        cfg, _, _ = setup
        _, res, ref = run_both(setup, seed=0, coherent=0.8, mode=mode)
        for l in range(cfg.num_layers):
            k_ref, v_ref = ref["caches"][l]
            k, v, length = res.layer_caches[l]
            np.testing.assert_allclose(
                np.asarray(k[:length], np.float32), k_ref, rtol=2e-3, atol=2e-3, err_msg=f"k layer {l}"
            )

    def test_greedy_decode_matches(self, setup, mode):
        cfg, params, _ = setup
        engine, res, ref = run_both(setup, seed=0, coherent=0.8, mode=mode)
        ours = engine.generate_greedy(res, max_new_tokens=6)
        theirs = ref_pipeline.ref_greedy_decode(ref, params, cfg, n_new=6)
        assert ours == theirs

    def test_incoherent_video_finishes_fast(self, setup, mode):
        # Low frame coherence: almost nothing passes the similarity gate, the
        # ratio drops below ratio_lower_bound immediately, and pruning carries
        # the full budget.
        _, res, ref = run_both(setup, seed=1, coherent=0.0, mode=mode)
        got = [(e.layer, e.kind, e.tokens_removed) for e in res.telemetry.events]
        assert got == ref["events"]
        assert any(e.kind == "prune" for e in res.telemetry.events)
        assert res.valid_len == ref["final_len"]
        np.testing.assert_allclose(np.asarray(res.logits), ref["logits"], rtol=2e-3, atol=2e-3)

    def test_highly_coherent_video_hits_budget_cap(self, setup, mode):
        cfg, params, ff = setup
        ff2 = ff.replace(cost=0.25, similarity_lower_bound=0.5)
        _, res, ref = run_both(setup, seed=2, coherent=1.0, ff_override=ff2, mode=mode)
        got = [(e.layer, e.kind, e.tokens_removed) for e in res.telemetry.events]
        assert got == ref["events"]
        assert any(e.kind == "merge_capped" for e in res.telemetry.events)
        assert not any(e.kind == "prune" for e in res.telemetry.events)
        assert res.valid_len == ref["final_len"]
        np.testing.assert_allclose(np.asarray(res.logits), ref["logits"], rtol=2e-3, atol=2e-3)

    def test_fuzz_seeds(self, setup, mode):
        cfg, params, ff = setup
        for seed in range(3, 7):
            rng = np.random.default_rng(seed)
            ff2 = ff.replace(
                cost=float(rng.uniform(0.25, 0.6)),
                similarity_lower_bound=float(rng.uniform(0.5, 0.9)),
            )
            _, res, ref = run_both(setup, seed=seed, coherent=float(rng.uniform(0.1, 1.0)), ff_override=ff2, mode=mode)
            got = [(e.layer, e.kind, e.tokens_removed) for e in res.telemetry.events]
            assert got == ref["events"], f"seed={seed}"
            assert res.valid_len == ref["final_len"], f"seed={seed}"
            np.testing.assert_allclose(
                np.asarray(res.logits), ref["logits"], rtol=5e-3, atol=5e-3, err_msg=f"seed={seed}"
            )

    def test_vision_token_reduction_telemetry(self, setup):
        _, res, ref = run_both(setup, seed=0, coherent=0.9)
        t = res.telemetry
        removed = t.original_length - t.final_length
        assert t.final_image_tokens == t.image_token_length - removed
        assert 0.0 < t.vision_token_reduction <= 1.0
        summary = t.summary()
        assert summary["final_length"] == ref["final_len"]


class TestDensePath:
    def test_dense_matches_ref(self, setup):
        cfg, params, ff = setup
        h, pt, pos, img_start, n_img = build_inputs(seed=0)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        res = engine.dense_prefill(h, pos)
        model = ref_pipeline.RefModel(params, cfg)
        hh = np.asarray(h, np.float32)
        for l in range(cfg.num_layers):
            hh, _, _, _ = model.layer_attn(l, hh, np.asarray(pos))
            hh = model.layer_mlp(l, hh)
        ref_logits = model.logits(hh[-1:])[0]
        np.testing.assert_allclose(np.asarray(res.logits), ref_logits, rtol=2e-3, atol=2e-3)

    def test_dense_greedy_decode(self, setup):
        cfg, params, ff = setup
        h, pt, pos, *_ = build_inputs(seed=4)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        res = engine.dense_prefill(h, pos)
        toks = engine.generate_greedy(res, max_new_tokens=4)
        assert len(toks) == 4


    def test_fused_pool_redispatch(self, setup):
        # pool_layers=1 forces a phase-program re-dispatch per decoder layer.
        # The scenario must span >=2 decoder layers so the host actually
        # merges event logs across dispatches — with a single-dispatch
        # trajectory this test cannot catch the event-log/cache-length bug it
        # exists for (cost=0.5/S_th=0.8/coherent=0.3 yields events at layers
        # -1, 0 and 1).
        cfg, _, _ = setup
        ff = FrameFusionConfig(cost=0.5, similarity_lower_bound=0.8, ratio_lower_bound=0.05,
                               schedule_num_layers=6, bucket=32)
        engine, res, ref = run_both(setup, seed=0, coherent=0.3, mode="fused",
                                    pool_layers=1, ff_override=ff)
        got = [(e.layer, e.kind, e.tokens_removed) for e in res.telemetry.events]
        assert got == ref["events"]
        decoder_event_layers = {lay for lay, _, _ in ref["events"] if lay >= 0}
        assert len(decoder_event_layers) >= 2, "scenario no longer spans multiple dispatches"
        assert res.valid_len == ref["final_len"]
        # Per-layer cache raggedness: earlier-pool layers must reflect the
        # FULL accumulated event log, not just the last dispatch's.
        for l in range(cfg.num_layers):
            k_ref, _ = ref["caches"][l]
            assert res.layer_caches[l][2] == k_ref.shape[0], f"layer {l}"
        np.testing.assert_allclose(np.asarray(res.logits), ref["logits"], rtol=2e-3, atol=2e-3)
        got_toks = engine.generate_greedy(res, max_new_tokens=4)
        ref_toks = ref_pipeline.ref_greedy_decode(ref, None, cfg, 4)
        assert got_toks == ref_toks


class TestSampling:
    def test_temperature_sampling_runs_and_greedy_matches(self, setup):
        from framefusion_tpu.ops.sampling import SamplerConfig
        import jax as _jax

        cfg, params, ff = setup
        h, pt, pos, img_start, n_img = build_inputs(seed=0)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        res = engine.prefill(h, pt, pos, 6, img_start, n_img)
        greedy = engine.generate_greedy(res, max_new_tokens=5)
        res2 = engine.prefill(h, pt, pos, 6, img_start, n_img)
        zero_temp = engine.generate(res2, 5, sampler=SamplerConfig(temperature=0.0))
        assert greedy == zero_temp
        res3 = engine.prefill(h, pt, pos, 6, img_start, n_img)
        sampled = engine.generate(res3, 5, sampler=SamplerConfig(temperature=1.0, top_p=0.9),
                                  rng_key=_jax.random.PRNGKey(7))
        assert len(sampled) == 5

    def test_eos_truncation(self, setup):
        cfg, params, ff = setup
        h, pt, pos, img_start, n_img = build_inputs(seed=0)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        res = engine.prefill(h, pt, pos, 6, img_start, n_img)
        full = engine.generate_greedy(res, max_new_tokens=6)
        res2 = engine.prefill(h, pt, pos, 6, img_start, n_img)
        trunc = engine.generate_greedy(res2, max_new_tokens=6, eos_token_id=full[2])
        assert trunc == full[: full.index(full[2]) + 1]

    def test_generate_device_matches_generate(self, setup):
        """generate_device is generate minus the host sync: same tokens, on
        device (int dtype, length max_new_tokens), no eos truncation."""
        cfg, params, ff = setup
        h, pt, pos, img_start, n_img = build_inputs(seed=0)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        res = engine.prefill(h, pt, pos, 6, img_start, n_img)
        host = engine.generate_greedy(res, max_new_tokens=6)
        res2 = engine.prefill(h, pt, pos, 6, img_start, n_img)
        dev = engine.generate_device(res2, max_new_tokens=6)
        assert jnp.issubdtype(dev.dtype, jnp.integer) and dev.shape == (6,)
        assert [int(t) for t in np.asarray(dev)] == host


class TestPlannedMode:
    def test_planned_matches_fused(self, setup):
        _, res_f, ref = run_both(setup, seed=0, coherent=0.8, mode="fused")
        engine, res_p, _ = run_both(setup, seed=0, coherent=0.8, mode="planned")
        assert res_p.valid_len == res_f.valid_len == ref["final_len"]
        got = [(e.layer, e.kind, e.tokens_removed) for e in res_p.telemetry.events]
        assert got == ref["events"]
        np.testing.assert_allclose(
            np.asarray(res_p.logits), np.asarray(res_f.logits), rtol=2e-3, atol=2e-3
        )
        for l, ((k_p, _, len_p), (k_f, _, len_f)) in enumerate(
            zip(res_p.layer_caches, res_f.layer_caches)
        ):
            assert len_p == len_f, f"layer {l}"
            np.testing.assert_allclose(
                np.asarray(k_p[:len_p], np.float32), np.asarray(k_f[:len_f], np.float32),
                rtol=2e-3, atol=2e-3, err_msg=f"layer {l}",
            )

    def test_planned_dispatch_modes_match(self, setup):
        """All three planned dispatch granularities — "split" (front/back,
        default), "one" (single program), "staged" (five dispatches) — make
        identical decisions and produce matching logits/caches: they trace
        the same jitted subgraphs."""
        cfg, params, ff = setup
        h, pt, pos, img_start, n_img = build_inputs(seed=0, coherent=0.8)
        results = {}
        for mode in ("staged", "split", "one"):
            eng = CompressionEngine(params, cfg, ff, attn_impl="einsum")
            if mode == "split":
                assert eng.planned_dispatch == "staged"  # the default
            eng.planned_dispatch = mode
            results[mode] = eng.prefill_planned(h, pt, pos, 6, img_start, n_img)
        base = results["staged"]
        assert base.mode == "planned"
        ev_base = [(e.layer, e.kind, e.tokens_removed) for e in base.telemetry.events]
        for mode in ("one", "split"):
            res = results[mode]
            assert res.mode == "planned", mode
            assert res.valid_len == base.valid_len, mode
            got = [(e.layer, e.kind, e.tokens_removed) for e in res.telemetry.events]
            assert got == ev_base, mode
            np.testing.assert_allclose(
                np.asarray(res.logits), np.asarray(base.logits), rtol=2e-3, atol=2e-3
            )
            for l, (c_m, c_b) in enumerate(zip(res.layer_caches, base.layer_caches)):
                assert c_m[2] == c_b[2], f"{mode} layer {l}"
                np.testing.assert_allclose(
                    np.asarray(c_m[0][: c_m[2]], np.float32),
                    np.asarray(c_b[0][: c_b[2]], np.float32),
                    rtol=2e-3, atol=2e-3, err_msg=f"{mode} layer {l}",
                )

    def test_planned_decode_matches(self, setup):
        cfg, params, _ = setup
        engine, res, ref = run_both(setup, seed=0, coherent=0.8, mode="planned")
        ours = engine.generate_greedy(res, max_new_tokens=6)
        theirs = ref_pipeline.ref_greedy_decode(ref, params, cfg, n_new=6)
        assert ours == theirs

    def test_too_tight_plan_falls_back(self, setup):
        cfg, params, _ = setup
        # bucket=16 so a 16-token plan is genuinely below the survivor count
        # (the compressed length here is 32) — the fallback must fire.
        ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.75, ratio_lower_bound=0.05,
                               schedule_num_layers=6, bucket=16)
        h, pt, pos, img_start, n_img = build_inputs(seed=0)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        res = engine.prefill_planned(h, pt, pos, 6, img_start, n_img, plan_len=ff.bucket)
        ref = ref_pipeline.ref_compressed_prefill(params, cfg, ff, h, pt, pos, 6, img_start, n_img)
        assert res.valid_len > ff.bucket, "scenario no longer overflows the plan"
        assert res.mode == "planned_fallback_fused"
        assert res.valid_len == ref["final_len"]
        np.testing.assert_allclose(np.asarray(res.logits), ref["logits"], rtol=2e-3, atol=2e-3)

    def test_deep_phase_falls_back(self, setup):
        # A phase that exhausts its single KV pool with compression unfinished
        # must fall back to the fused executor (the planned program would
        # silently skip the remaining merge/prune events otherwise).
        cfg, params, _ = setup
        ff = FrameFusionConfig(cost=0.5, similarity_lower_bound=0.8, ratio_lower_bound=0.05,
                               schedule_num_layers=6, bucket=32)
        h, pt, pos, img_start, n_img = build_inputs(seed=0, coherent=0.3)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum", pool_layers=1)
        res = engine.prefill(h, pt, pos, 6, img_start, n_img, mode="planned")
        ref = ref_pipeline.ref_compressed_prefill(params, cfg, ff, h, pt, pos, 6, img_start, n_img)
        assert res.mode == "planned_fallback_fused"
        assert res.valid_len == ref["final_len"]
        got = [(e.layer, e.kind, e.tokens_removed) for e in res.telemetry.events]
        assert got == ref["events"]
        np.testing.assert_allclose(np.asarray(res.logits), ref["logits"], rtol=2e-3, atol=2e-3)

    def test_planned_mode_reported(self, setup):
        _, res_p, _ = run_both(setup, seed=0, coherent=0.8, mode="planned")
        assert res_p.mode == "planned"

    def test_two_stage_pre_plan_matches_fused(self, setup):
        # Explicit pre_plan_len: pre-event merge + compaction to a static
        # bucket on device (no host sync), then the phase at that bucket.
        # Multi-event trajectory so phase events run on pre-compacted state.
        cfg, params, _ = setup
        ff = FrameFusionConfig(cost=0.5, similarity_lower_bound=0.8, ratio_lower_bound=0.05,
                               schedule_num_layers=6, bucket=32)
        h, pt, pos, img_start, n_img = build_inputs(seed=0, coherent=0.3)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        res_f = engine.prefill(h, pt, pos, 6, img_start, n_img, mode="fused")
        res_p = engine.prefill_planned(h, pt, pos, 6, img_start, n_img,
                                       plan_len=64, pre_plan_len=64)
        assert res_p.mode == "planned"
        assert res_p.valid_len == res_f.valid_len
        got = [(e.layer, e.kind, e.tokens_removed) for e in res_p.telemetry.events]
        want = [(e.layer, e.kind, e.tokens_removed) for e in res_f.telemetry.events]
        assert got == want
        np.testing.assert_allclose(np.asarray(res_p.logits), np.asarray(res_f.logits),
                                   rtol=2e-3, atol=2e-3)
        for l, ((k_p, _, len_p), (k_f, _, len_f)) in enumerate(
            zip(res_p.layer_caches, res_f.layer_caches)
        ):
            assert len_p == len_f, f"layer {l}"
        ours = engine.generate_greedy(res_p, max_new_tokens=5)
        res_f2 = engine.prefill(h, pt, pos, 6, img_start, n_img, mode="fused")
        theirs = engine.generate_greedy(res_f2, max_new_tokens=5)
        assert ours == theirs

    def test_two_stage_pre_plan_overflow_falls_back(self, setup):
        # A pre-plan bucket below the post-first-merge count must fall back
        # (compaction would silently truncate live tokens otherwise).
        cfg, params, _ = setup
        ff = FrameFusionConfig(cost=0.5, similarity_lower_bound=0.8, ratio_lower_bound=0.05,
                               schedule_num_layers=6, bucket=32)
        h, pt, pos, img_start, n_img = build_inputs(seed=0, coherent=0.3)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        res_f = engine.prefill(h, pt, pos, 6, img_start, n_img, mode="fused")
        # first merge removes 20 of 67 -> 47 survivors; bucket 32 overflows
        res_p = engine.prefill_planned(h, pt, pos, 6, img_start, n_img,
                                       plan_len=96, pre_plan_len=32)
        assert res_p.mode == "planned_fallback_fused"
        assert res_p.valid_len == res_f.valid_len
        np.testing.assert_allclose(np.asarray(res_p.logits), np.asarray(res_f.logits),
                                   rtol=2e-3, atol=2e-3)


class TestHybridPreCompaction:
    def test_auto_resolution(self, setup):
        """compact_pre_event="auto" (the r5 default) measures the sync cost
        once and enables the hybrid where syncs are cheap — true on CPU; the
        explicit booleans pass through untouched."""
        cfg, params, ff = setup
        e = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        assert e.compact_pre_event == "auto"
        e._use_pre_compact()  # measures once (value depends on host load)
        assert e._sync_cost_s is not None
        e._sync_cost_s = 0.0003  # attached-host-priced sync -> hybrid on
        assert e._use_pre_compact() is True
        e._sync_cost_s = 0.05  # relay-priced sync -> hybrid off
        assert e._use_pre_compact() is False
        e_off = CompressionEngine(params, cfg, ff, attn_impl="einsum",
                                  compact_pre_event=False)
        assert e_off._use_pre_compact() is False  # explicit bool passes through
        assert e_off._sync_cost_s is None  # ...without measuring anything

    def test_hybrid_matches_default(self, setup):
        cfg, params, ff = setup
        h, pt, pos, img_start, n_img = build_inputs(seed=0, coherent=0.8)
        e_default = CompressionEngine(params, cfg, ff, attn_impl="einsum",
                                      compact_pre_event=False)
        e_hybrid = CompressionEngine(params, cfg, ff, attn_impl="einsum", compact_pre_event=True)
        r0 = e_default.prefill(h, pt, pos, 6, img_start, n_img)
        r1 = e_hybrid.prefill(h, pt, pos, 6, img_start, n_img)
        assert r1.valid_len == r0.valid_len
        assert [(e.layer, e.kind, e.tokens_removed) for e in r1.telemetry.events] == \
               [(e.layer, e.kind, e.tokens_removed) for e in r0.telemetry.events]
        np.testing.assert_allclose(np.asarray(r1.logits), np.asarray(r0.logits), rtol=2e-3, atol=2e-3)
        for l, ((k1, _, l1), (k0, _, l0)) in enumerate(zip(r1.layer_caches, r0.layer_caches)):
            assert l1 == l0, f"layer {l}"
            np.testing.assert_allclose(np.asarray(k1[:l1], np.float32), np.asarray(k0[:l0], np.float32),
                                       rtol=2e-3, atol=2e-3, err_msg=f"layer {l}")
        assert e_hybrid.generate_greedy(r1, 5) == e_default.generate_greedy(r0, 5)


class TestInterleavedLayout:
    """InternVL-style interleaved FrameN:<image> prompts through the engine:
    merging must only pair same-patch tokens across frame blocks, and the
    prune window spans the interleaved text (reference quirk,
    modeling_internvl_chat.py:60)."""

    def _build(self, cfg, seed=0, n_frames=8, tpf=4, coherent=0.9):
        rng = np.random.default_rng(seed)
        chunks, pt = [], []
        chunks.append(rng.standard_normal((5, cfg.hidden_size)) * 0.05); pt += [-1] * 5
        frame = rng.standard_normal((tpf, cfg.hidden_size)) * 0.05
        for f in range(n_frames):
            chunks.append(rng.standard_normal((2, cfg.hidden_size)) * 0.05); pt += [-1] * 2
            scale = rng.uniform(0.05, 0.6)
            frame = frame + (scale if rng.random() < coherent else 5.0) * rng.standard_normal(frame.shape)
            chunks.append(frame.copy()); pt += list(range(tpf))
        chunks.append(rng.standard_normal((4, cfg.hidden_size)) * 0.05); pt += [-1] * 4
        h = np.concatenate(chunks).astype(np.float32)
        pt = np.asarray(pt, np.int32)
        img_idx = np.nonzero(pt >= 0)[0]
        img_start = int(img_idx[0])
        img_len = int(img_idx[-1]) - img_start + 1  # span INCLUDES interleaved text
        return h, pt, np.arange(len(pt), dtype=np.int32), img_start, img_len, tpf

    def test_matches_reference_pipeline(self, setup):
        cfg, params, ff = setup
        h, pt, pos, img_start, img_len, tpf = self._build(cfg)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        res = engine.prefill(h, pt, pos, tpf, img_start, img_len)
        ref = ref_pipeline.ref_compressed_prefill(params, cfg, ff, h, pt, pos, tpf, img_start, img_len)
        assert [(e.layer, e.kind, e.tokens_removed) for e in res.telemetry.events] == ref["events"]
        assert res.valid_len == ref["final_len"]
        np.testing.assert_allclose(np.asarray(res.logits), ref["logits"], rtol=2e-3, atol=2e-3)
        # decode parity too (ragged caches with interleaved survivors)
        ours = engine.generate_greedy(res, max_new_tokens=4)
        theirs = ref_pipeline.ref_greedy_decode(ref, params, cfg, n_new=4)
        assert ours == theirs


class TestSimilarityCollection:
    # Pin compact_pre_event both ways: the 'auto' default resolves by a
    # measured sync cost, so a warm suite and an isolated run take DIFFERENT
    # paths (the hybrid pre-event once dropped its similarity vector —
    # caught only when the suite happened to run warm).
    @pytest.mark.parametrize("pre_compact", [False, True])
    def test_debug_similarities_match_oracle(self, setup, pre_compact):
        cfg, params, ff = setup
        h, pt, pos, img_start, n_img = build_inputs(seed=0, coherent=0.8)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum",
                                   compact_pre_event=pre_compact)
        engine.debug_similarities = True
        res = engine.prefill(h, pt, pos, 6, img_start, n_img)
        sims = res.telemetry.similarities
        assert sims is not None and len(sims) == len(res.telemetry.events)
        # First event = layer-0 pre-attention merge on the raw embeddings:
        # must match the oracle similarity vector exactly.
        ref_sim, _ = oracle.similarity_by_patch(np.asarray(h, np.float32), pt, 6)
        np.testing.assert_allclose(sims[0][: len(ref_sim)], ref_sim, rtol=1e-4, atol=1e-5)


class TestCrossModeFuzz:
    """Broad randomized sweep: random knobs, geometries, and layouts; all
    three executors must agree with the NumPy reference pipeline."""

    def test_fuzz(self, setup):
        cfg, params, _ = setup
        for seed in range(20, 34):
            rng = np.random.default_rng(seed)
            ff = FrameFusionConfig(
                cost=float(rng.uniform(0.25, 0.7)),
                similarity_lower_bound=float(rng.uniform(0.45, 0.9)),
                ratio_lower_bound=float(rng.uniform(0.02, 0.15)),
                schedule_num_layers=6,
                bucket=int(rng.choice([32, 64])),
                num_importance_queries=int(rng.choice([1, 4])),
            )
            patch_num = int(rng.integers(3, 8))
            h, pt, pos, img_start, n_img = build_inputs(
                seed=seed, patch_num=patch_num, n_frames=int(rng.integers(4, 12)),
                n_pre=int(rng.integers(1, 6)), n_post=int(rng.integers(1, 6)),
                coherent=float(rng.uniform(0.2, 1.0)),
            )
            ref = ref_pipeline.ref_compressed_prefill(
                params, cfg, ff, h, pt, pos, patch_num, img_start, n_img
            )
            mode = ["fused", "planned", "segmented", "planned_batch"][seed % 4]
            engine = CompressionEngine(params, cfg, ff, attn_impl="einsum",
                                       compact_pre_event=bool(seed % 2))
            if mode == "segmented":
                engine.compact_pre_event = False
            if mode == "planned_batch":
                # single-prompt batch through the lockstep program (multi-
                # prompt batches are covered by TestBatchedPrefill).
                res = engine.prefill_planned_batch(
                    [(h, pt, pos, img_start, n_img)], patch_num=patch_num
                )[0]
            else:
                res = engine.prefill(h, pt, pos, patch_num, img_start, n_img, mode=mode)
            msg = f"seed={seed} mode={mode} ff={ff}"
            assert [(e.layer, e.kind, e.tokens_removed) for e in res.telemetry.events] == ref["events"], msg
            assert res.valid_len == ref["final_len"], msg
            np.testing.assert_allclose(
                np.asarray(res.logits), ref["logits"], rtol=5e-3, atol=5e-3, err_msg=msg
            )


class TestInfeasibleCost:
    def test_raises_in_all_modes(self, setup):
        from framefusion_tpu.core.schedule import CostInfeasibleError

        cfg, params, ff = setup
        # With zero merging possible (coherent=0 -> sparse sims) and a cost
        # far below what pruning alone can reach within the schedule, the
        # budget goes negative -> the reference raises ValueError
        # (main.py:339-340); CostInfeasibleError is its subclass-equivalent.
        bad_ff = ff.replace(cost=0.01, similarity_lower_bound=0.99)
        h, pt, pos, img_start, n_img = build_inputs(seed=3, coherent=0.0)
        for mode in ("fused", "segmented"):
            engine = CompressionEngine(params, cfg, bad_ff, attn_impl="einsum")
            with pytest.raises((CostInfeasibleError, ValueError)):
                engine.prefill(h, pt, pos, 6, img_start, n_img, mode=mode)


class TestTailSplit:
    """Decode tail-split: layers past P attend only a static pool prefix.

    The decode pool is padded to the phase layers' full-prompt caches
    (reference DynamicCache semantics — layer 0 runs before any merge), so
    tail layers waste most of their padded read; the split must be a pure
    optimization (identical math: rows past a layer's ragged length are
    masked either way)."""

    def test_best_tail_split_picks_phase_boundary(self, setup):
        from framefusion_tpu.runtime.engine import best_tail_split

        lens = [1170, 820] + [330] * 26
        split = best_tail_split(lens, s_pool=1216, new_tokens=32, bucket=64)
        assert split is not None
        p, tail_s = split
        assert p == 2 and tail_s == 384
        # no savings possible -> None
        assert best_tail_split([1170] * 28, 1216, 32, 64) is None
        # a long layer late in the stack forces the boundary past it
        lens2 = [1170] + [330] * 20 + [1170] + [330] * 6
        p2, _ = best_tail_split(lens2, 1216, 32, 64)
        assert p2 == 22

    def test_decode_step_split_matches_unsplit(self, setup):
        cfg, params, _ = setup
        rng = np.random.default_rng(7)
        s_pool, steps = 96, 4
        kp = jnp.asarray(rng.standard_normal((cfg.num_layers, s_pool, cfg.num_kv_heads,
                                              cfg.head_dim_)) * 0.1, cfg.dtype)
        vp = jnp.asarray(rng.standard_normal((cfg.num_layers, s_pool, cfg.num_kv_heads,
                                              cfg.head_dim_)) * 0.1, cfg.dtype)
        lens = jnp.asarray([88, 88, 20, 24, 20, 20], jnp.int32)
        emb = jnp.asarray(rng.standard_normal(cfg.hidden_size) * 0.05, cfg.dtype)
        ref = qwen2.decode_step(params, emb, jnp.int32(88), kp, vp, lens, cfg)
        got = qwen2.decode_step(params, emb, jnp.int32(88), kp, vp, lens, cfg,
                                tail_split=(2, 32))
        np.testing.assert_allclose(np.asarray(got[0], np.float32),
                                   np.asarray(ref[0], np.float32), rtol=1e-5, atol=1e-5)
        for a, b in ((got[1], ref[1]), (got[2], ref[2])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_verify_step_split_matches_unsplit(self, setup):
        cfg, params, _ = setup
        rng = np.random.default_rng(11)
        s_pool, kq = 96, 3
        kp = jnp.asarray(rng.standard_normal((cfg.num_layers, s_pool, cfg.num_kv_heads,
                                              cfg.head_dim_)) * 0.1, cfg.dtype)
        vp = jnp.asarray(rng.standard_normal((cfg.num_layers, s_pool, cfg.num_kv_heads,
                                              cfg.head_dim_)) * 0.1, cfg.dtype)
        lens = jnp.asarray([88, 88, 20, 24, 20, 20], jnp.int32)
        embs = jnp.asarray(rng.standard_normal((kq, cfg.hidden_size)) * 0.05, cfg.dtype)
        pos = jnp.asarray([88, 89, 90], jnp.int32)
        ref = qwen2.verify_step(params, embs, pos, kp, vp, lens, cfg)
        got = qwen2.verify_step(params, embs, pos, kp, vp, lens, cfg, tail_split=(2, 32))
        np.testing.assert_allclose(np.asarray(got[0], np.float32),
                                   np.asarray(ref[0], np.float32), rtol=1e-5, atol=1e-5)

    def test_decode_step_batch_split_matches_unsplit(self, setup):
        # Batched pools: decode region at the pool SUFFIX (common offset), so
        # the split reads two segments [0, tail_s) u [region_start, S_pool).
        cfg, params, _ = setup
        rng = np.random.default_rng(13)
        b, s_pool, rs = 3, 128, 96
        kp = jnp.asarray(rng.standard_normal((cfg.num_layers, b, s_pool, cfg.num_kv_heads,
                                              cfg.head_dim_)) * 0.1, cfg.dtype)
        vp = jnp.asarray(rng.standard_normal((cfg.num_layers, b, s_pool, cfg.num_kv_heads,
                                              cfg.head_dim_)) * 0.1, cfg.dtype)
        lens = jnp.asarray(
            np.stack([[88, 80, 60], [90, 88, 70]] + [[20, 24, 18]] * (cfg.num_layers - 2)),
            jnp.int32)  # (L, B)
        emb = jnp.asarray(rng.standard_normal((b, cfg.hidden_size)) * 0.05, cfg.dtype)
        pos = jnp.asarray([90, 88, 72], jnp.int32)
        args = (params, emb, pos, kp, vp, lens, jnp.int32(rs), jnp.int32(2), cfg)
        ref = qwen2.decode_step_batch(*args)
        got = qwen2.decode_step_batch(*args, tail_split=(2, 32, rs))
        np.testing.assert_allclose(np.asarray(got[0], np.float32),
                                   np.asarray(ref[0], np.float32), rtol=1e-5, atol=1e-5)
        # Written rows: layers >= P re-derive k/v from a hidden state whose
        # attention sums were grouped differently (two segments), so the new
        # bf16 rows can differ in the last bit — allclose, not array_equal.
        for a, r in ((got[1], ref[1]), (got[2], ref[2])):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(r, np.float32), rtol=0.02, atol=5e-3)

    def test_verify_step_batch_split_matches_unsplit(self, setup):
        cfg, params, _ = setup
        rng = np.random.default_rng(17)
        b, kq, s_pool, rs = 2, 3, 128, 96
        kp = jnp.asarray(rng.standard_normal((cfg.num_layers, b, s_pool, cfg.num_kv_heads,
                                              cfg.head_dim_)) * 0.1, cfg.dtype)
        vp = jnp.asarray(rng.standard_normal((cfg.num_layers, b, s_pool, cfg.num_kv_heads,
                                              cfg.head_dim_)) * 0.1, cfg.dtype)
        lens = jnp.asarray(
            np.stack([[88, 80], [90, 88]] + [[20, 24]] * (cfg.num_layers - 2)), jnp.int32)
        embs = jnp.asarray(rng.standard_normal((b, kq, cfg.hidden_size)) * 0.05, cfg.dtype)
        pos = jnp.asarray([[90, 91, 92], [88, 89, 90]], jnp.int32)
        dmask = np.zeros((b, s_pool), bool)
        dmask[:, rs:rs + 2] = True  # two committed rows from an earlier macro step
        args = (params, embs, pos, kp, vp, lens, jnp.asarray(dmask),
                jnp.int32(rs + 2), jnp.int32(0), cfg)
        ref = qwen2.verify_step_batch(*args)
        got = qwen2.verify_step_batch(*args, tail_split=(2, 32, rs))
        np.testing.assert_allclose(np.asarray(got[0], np.float32),
                                   np.asarray(ref[0], np.float32), rtol=1e-5, atol=1e-5)

    def test_generate_batch_rides_split(self, setup):
        # Ragged batch whose geometry engages best_tail_split_batch; tokens
        # must match each sequence's solo greedy run (which splits solo-style).
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        from framefusion_tpu.runtime.engine import best_tail_split_batch
        from framefusion_tpu.core.compact import bucket_length

        results, singles = [], []
        for seed, coh in [(3, 0.3), (7, 0.4)]:
            h, pt, pos, img_start, n_img = build_inputs(seed=seed, coherent=coh)
            res = engine.prefill(h, pt, pos, patch_num=6, image_token_start=img_start,
                                 image_token_length=n_img)
            singles.append(engine.generate_greedy(res, max_new_tokens=5))
            results.append(res)
        max_prefix = max(max(c[2] for c in r.layer_caches) for r in results)
        s_pool = bucket_length(max_prefix + 5, ff.bucket)
        assert best_tail_split_batch(
            [[c[2] for c in r.layer_caches] for r in results],
            s_pool, s_pool - 5, ff.bucket) is not None, "geometry unexpectedly uniform"
        assert engine.generate_batch(results, max_new_tokens=5) == singles

    def test_generate_device_rides_split(self, setup):
        # A coherent prompt leaves phase-layer caches far longer than the
        # compacted tail -> generate_device's split engages; tokens must
        # match ref greedy (the oracle path never splits).
        cfg, params, _ = setup
        engine, res, ref = run_both(setup, seed=3, coherent=0.3)
        from framefusion_tpu.runtime.engine import best_tail_split
        lens = [c[2] for c in res.layer_caches]
        k_pool, _, _ = engine.make_decode_state(res, 6)
        assert best_tail_split(lens, int(k_pool.shape[1]), 6, engine.ff.bucket), \
            f"geometry unexpectedly uniform: lens={lens}"
        ours = engine.generate_greedy(res, max_new_tokens=6)
        theirs = ref_pipeline.ref_greedy_decode(ref, params, cfg, n_new=6)
        assert ours == theirs


class TestBatchedDecode:
    """Batched serving decode: one scanned program for B sequences must
    reproduce each sequence's single-loop greedy decode exactly (the single
    loop is itself pinned to the NumPy reference pipeline above)."""

    def test_batch_matches_per_sequence_greedy(self, setup):
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        results = []
        singles = []
        # Different seeds/coherence -> different compressed lengths, event
        # trajectories, and cache raggedness across the batch.
        for seed, coh, frames in [(0, 0.8, 10), (5, 0.5, 8), (9, 0.9, 12)]:
            h, pt, pos, img_start, n_img = build_inputs(seed=seed, coherent=coh, n_frames=frames)
            res = engine.prefill(h, pt, pos, patch_num=6, image_token_start=img_start,
                                 image_token_length=n_img)
            singles.append(engine.generate_greedy(res, max_new_tokens=5))
            results.append(res)
        batch = engine.generate_batch(results, max_new_tokens=5)
        assert batch == singles

    def test_batch_includes_dense_result(self, setup):
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        h, pt, pos, img_start, n_img = build_inputs(seed=1, coherent=0.7)
        r_ff = engine.prefill(h, pt, pos, patch_num=6, image_token_start=img_start,
                              image_token_length=n_img)
        r_dense = engine.dense_prefill(h, pos)
        singles = [engine.generate_greedy(r, max_new_tokens=4) for r in (r_ff, r_dense)]
        assert engine.generate_batch([r_ff, r_dense], max_new_tokens=4) == singles

    def test_batch_eos_truncation(self, setup):
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        h, pt, pos, img_start, n_img = build_inputs(seed=0, coherent=0.8)
        res = engine.prefill(h, pt, pos, patch_num=6, image_token_start=img_start,
                             image_token_length=n_img)
        full = engine.generate_batch([res], max_new_tokens=6)[0]
        eos = full[2]
        cut = engine.generate_batch([res], max_new_tokens=6, eos_token_id=eos)[0]
        assert cut == full[: full.index(eos) + 1]


class TestStreamingDecode:
    """generate_stream: chunked partial-result decode (the SSE surface;
    reference demo streams partials, llava_video_compare.py:309-331) must
    emit exactly the plain greedy tokens, cumulatively."""

    def test_stream_matches_greedy(self, setup):
        engine, res, _ = run_both(setup, 0, 0.8)
        want = engine.generate_greedy(res, 11)
        chunks = list(engine.generate_stream(res, 11, chunk=4))
        assert chunks[-1] == want
        assert len(chunks) == 4  # tok0, +4, +4, +2
        for a, b in zip(chunks, chunks[1:]):
            assert b[: len(a)] == a  # strictly growing prefixes

    def test_stream_eos_truncates_mid_chunk(self, setup):
        engine, res, _ = run_both(setup, 1, 0.5)
        full = engine.generate_greedy(res, 10)
        eos = full[3]
        chunks = list(engine.generate_stream(res, 10, chunk=4, eos_token_id=eos))
        assert chunks[-1] == full[: full.index(eos) + 1]
        assert all(eos not in c for c in chunks[:-1])


class TestPlanHistory:
    """Planned-mode bucket selection without caller-provided buckets:
    measured similarity pre-pass on a never-seen geometry (VERDICT r4
    weak #6 — the analytic bound over-provisioned the tail ~2x), then
    survivor-count history once the engine has served it (plan_source
    records which one fired)."""

    def test_measured_then_history_source(self, setup):
        from framefusion_tpu.core import bucket_length
        from framefusion_tpu.runtime.engine import PlanHistory

        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        h, pt, pos, img_start, n_img = build_inputs(seed=0, coherent=0.8)

        res1 = engine.prefill_planned(h, pt, pos, 6, img_start, n_img)
        assert res1.plan_source == "measured"

        # The first serve recorded survivor counts; a same-geometry repeat
        # plans from history, with buckets matching the observed telemetry.
        res2 = engine.prefill_planned(h, pt, pos, 6, img_start, n_img)
        assert res2.plan_source == "history"
        assert res2.mode == "planned"
        key = PlanHistory.key(6, n_img // 6, ff)
        ev0 = res1.telemetry.events[0]
        n_after_pre = ev0.tokens_after if ev0.layer == -1 else len(pt)
        assert engine.plan_history.suggest(key, ff.bucket) == (
            bucket_length(n_after_pre, ff.bucket),
            bucket_length(res1.valid_len, ff.bucket),
        )

        # decisions are identical regardless of the bucket source
        fused = engine.prefill(h, pt, pos, 6, img_start, n_img, mode="fused")
        for res in (res1, res2):
            got = [(e.layer, e.kind, e.tokens_removed) for e in res.telemetry.events]
            want = [(e.layer, e.kind, e.tokens_removed) for e in fused.telemetry.events]
            assert got == want
            assert res.valid_len == fused.valid_len
            np.testing.assert_allclose(np.asarray(res.logits), np.asarray(fused.logits),
                                       rtol=2e-3, atol=2e-3)

    def test_fused_run_seeds_history(self, setup):
        """A fused (adaptive) serve also feeds the history, so planned mode
        never needs a planned probe."""
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        h, pt, pos, img_start, n_img = build_inputs(seed=5, coherent=0.5)
        engine.prefill(h, pt, pos, 6, img_start, n_img, mode="fused")
        res = engine.prefill_planned(h, pt, pos, 6, img_start, n_img)
        assert res.plan_source == "history"

    def test_auto_mode_cold_then_history(self, setup):
        """mode="auto" serving policy: a never-seen geometry rides the
        measured cold-start planner (similarity pre-pass, one scalar sync,
        exact pre-plan bucket — and it seeds history); the same-geometry
        repeat rides the sync-free planned path with history buckets.
        Decisions are identical either way."""
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        h, pt, pos, img_start, n_img = build_inputs(seed=3, coherent=0.6)

        cold = engine.prefill(h, pt, pos, 6, img_start, n_img, mode="auto")
        assert cold.plan_source == "measured"
        assert cold.mode == "planned"  # the measured buckets sufficed

        warm = engine.prefill(h, pt, pos, 6, img_start, n_img, mode="auto")
        assert warm.plan_source == "history"
        assert warm.mode == "planned"
        got = [(e.layer, e.kind, e.tokens_removed) for e in warm.telemetry.events]
        want = [(e.layer, e.kind, e.tokens_removed) for e in cold.telemetry.events]
        assert got == want
        assert warm.valid_len == cold.valid_len
        np.testing.assert_allclose(np.asarray(warm.logits), np.asarray(cold.logits),
                                   rtol=2e-3, atol=2e-3)

    def test_cold_measured_matches_fused_decisions(self, setup):
        """VERDICT r3 item 1: the cold measured planner makes the SAME
        merge/prune decisions as the adaptive fused executor (the pre-pass
        only sizes shape buckets), its pre-plan bucket is exact, and its
        final bucket covers the true survivor count."""
        from framefusion_tpu.core import bucket_length
        from framefusion_tpu.runtime.engine import plan_length_measured

        cfg, params, ff = setup
        for seed, coherent in [(3, 0.6), (0, 0.8), (7, 0.3), (11, 0.95)]:
            h, pt, pos, img_start, n_img = build_inputs(seed=seed, coherent=coherent)
            engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
            cold = engine.prefill(h, pt, pos, 6, img_start, n_img, mode="measured")
            assert cold.plan_source == "measured"
            fused = CompressionEngine(params, cfg, ff, attn_impl="einsum").prefill(
                h, pt, pos, 6, img_start, n_img, mode="fused")
            got = [(e.layer, e.kind, e.tokens_removed) for e in cold.telemetry.events]
            want = [(e.layer, e.kind, e.tokens_removed) for e in fused.telemetry.events]
            assert got == want, (seed, coherent)
            assert cold.valid_len == fused.valid_len
            np.testing.assert_allclose(np.asarray(cold.logits), np.asarray(fused.logits),
                                       rtol=2e-3, atol=2e-3)
            # bucket properties, reconstructed from the fused run's events
            ev0 = fused.telemetry.events[0]
            assert ev0.layer == -1
            count = ev0.tokens_removed
            if ev0.kind == "merge":  # count == tokens_removed only when uncapped
                pre_plan, plan = plan_length_measured(len(pt), n_img, count, ff)
                assert pre_plan == bucket_length(ev0.tokens_after, ff.bucket)
                assert plan >= bucket_length(fused.valid_len, ff.bucket)

    def test_measured_plan_bound_brute_force(self):
        """plan_length_measured's survivor bound dominates EVERY reachable
        schedule trajectory: drive SegmentedEventState (the decision twin)
        with randomized above-threshold counts and check the final live
        count never exceeds the measured plan."""
        from framefusion_tpu.core import bucket_length
        from framefusion_tpu.core.schedule import CostInfeasibleError
        from framefusion_tpu.runtime.engine import (
            SegmentedEventState, plan_length_measured)

        rng = np.random.default_rng(0)
        checked = 0
        for trial in range(400):
            ff = FrameFusionConfig(
                cost=float(rng.uniform(0.1, 0.8)),
                similarity_lower_bound=0.6,
                ratio_lower_bound=float(rng.uniform(0.01, 0.2)),
            )  # default 28-layer schedule
            frame_tok = int(rng.integers(100, 12000))
            orig = frame_tok + int(rng.integers(2, 200))
            st = SegmentedEventState(ff)
            valid, img = orig, frame_tok
            count1 = int(rng.integers(0, img + 1))
            try:
                k, kind, _, _ = st.merge_decision(count1, img)
                valid -= k
                img -= k
                pre_plan, plan = plan_length_measured(orig, frame_tok, count1, ff)
                if kind != "merge_capped":
                    assert orig - count1 <= pre_plan
                n_events = 1
                while not st.done and n_events < ff.schedule_num_layers:
                    if st.finish_merging:
                        _, _, _, removed = st.prune_decision(frame_tok, orig, valid)
                        valid -= removed
                        break
                    count = int(rng.integers(0, img + 1))
                    k, _, _, _ = st.merge_decision(count, img)
                    valid -= k
                    img -= k
                    n_events += 1
            except CostInfeasibleError:
                continue  # the real prefill raises too; the plan is moot
            assert valid <= plan, (
                trial, ff.cost, ff.ratio_lower_bound, orig, frame_tok, count1, valid, plan)
            # the exact-capped case pins BOTH buckets
            if kind == "merge_capped":
                assert plan == pre_plan == bucket_length(valid, ff.bucket)
            checked += 1
        assert checked > 200  # the fuzz actually exercised complete trajectories

    def test_auto_mode_text_only_prompt(self, setup):
        """auto on a promptless-geometry (all-text) input must not key
        history (frame count undefined) — it serves via the fused executor."""
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        h, pt, pos, img_start, n_img = build_inputs(seed=2, coherent=0.5)
        pt_text = np.full_like(np.asarray(pt), -1)
        res = engine.prefill(h, pt_text, pos, 6, 0, 0, mode="auto")
        assert res.plan_source == "cold"
        assert not engine.plan_history._stats

    def test_explicit_buckets_reported(self, setup):
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        h, pt, pos, img_start, n_img = build_inputs(seed=0, coherent=0.8)
        probe = engine.prefill(h, pt, pos, 6, img_start, n_img)
        from framefusion_tpu.core import bucket_length
        plan = bucket_length(probe.valid_len, ff.bucket)
        res = engine.prefill_planned(h, pt, pos, 6, img_start, n_img,
                                     plan_len=plan, pre_plan_len=plan)
        assert res.plan_source == "explicit"


class TestBatchedPrefill:
    """Lockstep-batched planned prefill: per-sequence decisions must equal
    each prompt's SOLO fused run (events, lengths, logits, cache
    raggedness), and batched decode on the results must reproduce solo
    greedy decode."""

    def _prompts(self):
        out = []
        for seed, coh, frames in [(0, 0.8, 10), (5, 0.5, 8), (9, 0.9, 12)]:
            h, pt, pos, img_start, n_img = build_inputs(seed=seed, coherent=coh, n_frames=frames)
            out.append((h, pt, pos, img_start, n_img))
        return out

    def test_matches_solo_fused(self, setup):
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        prompts = self._prompts()
        batch_res = engine.prefill_planned_batch(prompts, patch_num=6)
        for (h, pt, pos, img_start, n_img), res in zip(prompts, batch_res):
            solo = engine.prefill(h, pt, pos, patch_num=6, image_token_start=img_start,
                                  image_token_length=n_img)
            assert res.mode == "planned_batch"
            got = [(e.layer, e.kind, e.tokens_removed) for e in res.telemetry.events]
            want = [(e.layer, e.kind, e.tokens_removed) for e in solo.telemetry.events]
            assert got == want
            assert res.valid_len == solo.valid_len
            np.testing.assert_allclose(np.asarray(res.logits), np.asarray(solo.logits),
                                       rtol=2e-3, atol=2e-3)
            for l in range(cfg.num_layers):
                assert res.layer_caches[l][2] == solo.layer_caches[l][2], f"layer {l}"

    def test_batch_prefill_then_batch_decode(self, setup):
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        prompts = self._prompts()
        batch_res = engine.prefill_planned_batch(prompts, patch_num=6)
        singles = []
        for (h, pt, pos, img_start, n_img) in prompts:
            solo = engine.prefill(h, pt, pos, patch_num=6, image_token_start=img_start,
                                  image_token_length=n_img)
            singles.append(engine.generate_greedy(solo, max_new_tokens=4))
        assert engine.generate_batch(batch_res, max_new_tokens=4) == singles

    def test_overflowing_sequence_falls_back_alone(self, setup):
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        prompts = self._prompts()
        # plan bucket so tight that at least the least-compressible prompt
        # overflows; overflowers fall back per-sequence, the rest stay planned.
        batch_res = engine.prefill_planned_batch(prompts, patch_num=6,
                                                 plan_len=ff.bucket, pre_plan_len=ff.bucket)
        modes = {r.mode for r in batch_res}
        assert modes <= {"planned_batch", "planned_fallback_fused"}
        assert "planned_fallback_fused" in modes
        for (h, pt, pos, img_start, n_img), res in zip(prompts, batch_res):
            solo = engine.prefill(h, pt, pos, patch_num=6, image_token_start=img_start,
                                  image_token_length=n_img)
            assert res.valid_len == solo.valid_len
