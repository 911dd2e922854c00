"""Weight-only int8 quantization (ops/quant.py + qwen2.mm dispatch)."""

import numpy as np

import jax
import jax.numpy as jnp

from framefusion_tpu.config import FrameFusionConfig, tiny_llm_config
from framefusion_tpu.models import qwen2
from framefusion_tpu.ops.quant import dequantize_weight, quantize_params_int8, quantize_weight
from framefusion_tpu.runtime.engine import CompressionEngine

import ref_pipeline
from test_engine import build_inputs


class TestQuantizeWeight:
    def test_roundtrip_error_bounded_by_half_step(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32) * 0.1
        wq = quantize_weight(w.copy())
        back = dequantize_weight(wq)
        step = np.asarray(wq["scale"])  # per-output-channel quantization step
        err = np.abs(np.asarray(back) - np.asarray(w))
        assert (err <= 0.5 * step[None, :] + 1e-7).all()

    def test_mm_matches_dequantized_matmul_exactly(self):
        # y = (x @ q8) * scale is algebraically identical to x @ (q8 * scale).
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32) * 0.05
        wq = quantize_weight(w.copy())
        got = qwen2.mm(x, wq)
        want = x @ dequantize_weight(wq)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

    def test_stacked_layer_weights_slice_through_tree_map(self):
        rng = np.random.default_rng(2)
        w = jnp.asarray(rng.standard_normal((3, 16, 8)), jnp.float32)
        wq = quantize_weight(w.copy())
        lp = qwen2.layer_slice({"w": wq}, jnp.int32(1))
        assert lp["w"]["q8"].shape == (16, 8)
        assert lp["w"]["scale"].shape == (8,)
        np.testing.assert_allclose(
            np.asarray(qwen2.mm(jnp.eye(16), lp["w"])),
            np.asarray(dequantize_weight(wq)[1]), rtol=1e-5, atol=1e-6,
        )


class TestQuantizedEngine:
    def test_compressed_prefill_decisions_survive_quantization(self):
        cfg = tiny_llm_config(num_layers=6)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
        ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.75, ratio_lower_bound=0.05,
                               schedule_num_layers=6, bucket=32)
        h, pt, pos, img_start, n_img = build_inputs(seed=0, coherent=0.8)

        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        res = engine.prefill(h, pt, pos, 6, img_start, n_img)

        qparams = quantize_params_int8(jax.tree.map(jnp.copy, params))
        engine_q = CompressionEngine(qparams, cfg, ff, attn_impl="einsum")
        res_q = engine_q.prefill(h, pt, pos, 6, img_start, n_img)

        # int8 weights perturb activations slightly; with the test data's
        # spread similarity/importance distributions the DECISIONS must hold.
        assert res_q.valid_len == res.valid_len
        got = [(e.layer, e.kind, e.tokens_removed) for e in res_q.telemetry.events]
        want = [(e.layer, e.kind, e.tokens_removed) for e in res.telemetry.events]
        assert got == want
        # Logits close at a quantization-appropriate tolerance.
        a, b = np.asarray(res_q.logits), np.asarray(res.logits)
        cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.999

    def test_quantized_greedy_decode_runs(self):
        cfg = tiny_llm_config(num_layers=4)
        params = quantize_params_int8(qwen2.init_params(cfg, jax.random.PRNGKey(1)))
        ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.75, ratio_lower_bound=0.05,
                               schedule_num_layers=4, bucket=32)
        h, pt, pos, img_start, n_img = build_inputs(seed=1)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        res = engine.prefill(h, pt, pos, 6, img_start, n_img)
        toks = engine.generate_greedy(res, max_new_tokens=4)
        assert len(toks) == 4


class TestW8A8Tail:
    """W8A8 (int8 activations x int8 weights) for the post-compression tail:
    decisions are made before the tail, so event trajectories must be
    IDENTICAL to the weight-only int8 run; logits shift only by activation
    quantization error."""

    def test_mm_w8a8_matches_manual(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32) * 0.1
        wq = quantize_weight(w.copy())
        got = qwen2.mm(x, wq, True)
        # manual: per-row activation quant, int32 accumulate, descale
        s_x = np.max(np.abs(np.asarray(x)), axis=-1, keepdims=True) / 127.0
        x_q = np.clip(np.round(np.asarray(x) / s_x), -127, 127).astype(np.int32)
        acc = x_q @ np.asarray(wq["q8"], np.int32)
        want = acc.astype(np.float32) * s_x * np.asarray(wq["scale"])
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
        # and close to the exact product (bounded quantization error)
        exact = np.asarray(x) @ np.asarray(w)
        assert np.max(np.abs(np.asarray(got) - exact)) < 0.05

    def test_tail_w8a8_same_decisions_close_logits(self):
        cfg = tiny_llm_config(num_layers=6)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
        params_q = quantize_params_int8(jax.tree.map(jnp.array, params))
        ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.75,
                               ratio_lower_bound=0.05, schedule_num_layers=6, bucket=32)
        # coherent=0.5 -> multi-layer event trajectory, so a real phase
        # precedes the tail (tail_start > 0)
        h, pt, pos, img_start, n_img = build_inputs(seed=0, coherent=0.5)

        e_wo = CompressionEngine(params_q, cfg, ff, attn_impl="einsum")
        e_w8 = CompressionEngine(params_q, cfg, ff, attn_impl="einsum", tail_w8a8=True)
        for mode in ("fused", "planned", "segmented"):
            r_wo = e_wo.prefill(h, pt, pos, 6, img_start, n_img, mode=mode)
            r_w8 = e_w8.prefill(h, pt, pos, 6, img_start, n_img, mode=mode)
            assert [(e.layer, e.kind, e.tokens_removed) for e in r_w8.telemetry.events] == \
                   [(e.layer, e.kind, e.tokens_removed) for e in r_wo.telemetry.events], mode
            assert r_w8.valid_len == r_wo.valid_len, mode
            lo, l8 = np.asarray(r_wo.logits), np.asarray(r_w8.logits)
            # activations stay bounded at this scale; w8a8 error is small
            assert np.max(np.abs(lo - l8)) < 0.35 * max(np.max(np.abs(lo)), 1.0), mode
            # PHASE-layer caches (before the tail) are untouched by the tail
            # dtype — the w8a8 region starts at tail_start_layer.
            ts = r_wo.telemetry.tail_start_layer
            assert ts and ts > 0, "want a real phase for this check"
            for l in range(ts):
                np.testing.assert_allclose(
                    np.asarray(r_w8.layer_caches[l][0]),
                    np.asarray(r_wo.layer_caches[l][0]), rtol=1e-6, atol=1e-6,
                    err_msg=f"{mode} layer {l}",
                )
