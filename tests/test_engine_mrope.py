"""Engine coverage for Qwen2-VL specifics: 3D mRoPE positions and the
4-row importance capture (reference models/qwen2/modeling_qwen2_vl.py:
261-264, 289-301)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framefusion_tpu.config import FrameFusionConfig, tiny_llm_config
from framefusion_tpu.models import qwen2
from framefusion_tpu.runtime.engine import CompressionEngine

import ref_pipeline
from test_core import make_sequence


def test_identical_streams_equal_1d_rope():
    """mRoPE with all three position streams equal must reproduce plain RoPE
    (section selection picks identical values), so the whole compressed
    prefill must match the 1D-position run bit for bit."""
    cfg_1d = tiny_llm_config(num_layers=4)
    cfg_3d = cfg_1d.replace(mrope_section=(8, 12, 12))  # head_dim 32 -> half 16... adjust below
    # head_dim = 128//4 = 32 -> half=16: sections must sum to 16
    cfg_3d = cfg_1d.replace(mrope_section=(4, 6, 6))
    params = qwen2.init_params(cfg_1d, jax.random.PRNGKey(0))
    ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.75, ratio_lower_bound=0.05,
                           schedule_num_layers=4, bucket=32)

    rng = np.random.default_rng(0)
    h, pt, img_start, n_img = make_sequence(rng, 4, 6, 8, 3, hidden=cfg_1d.hidden_size, coherent=0.8)
    h = (h * 0.05).astype(np.float32)
    pos1d = np.arange(len(pt), dtype=np.int32)
    pos3d = np.tile(pos1d, (3, 1))

    e1 = CompressionEngine(params, cfg_1d, ff, attn_impl="einsum")
    r1 = e1.prefill(h, pt, pos1d, 6, img_start, n_img)
    e3 = CompressionEngine(params, cfg_3d, ff.replace(num_importance_queries=4), attn_impl="einsum")
    r3 = e3.prefill(h, pt, pos3d, 6, img_start, n_img)

    # merge decisions are attention-independent at matching hidden states, so
    # the full event trajectories must agree; logits agree because identical
    # positions => identical rotary embedding.
    assert [(e.layer, e.kind, e.tokens_removed) for e in r1.telemetry.events] == \
           [(e.layer, e.kind, e.tokens_removed) for e in r3.telemetry.events]
    np.testing.assert_allclose(np.asarray(r1.logits), np.asarray(r3.logits), rtol=1e-4, atol=1e-4)

    # Decode bases are family-specific (reference semantics): the 1D LLaVA
    # path decodes from the compressed layer-0 cache length
    # (DynamicCache.get_seq_length), the mRoPE path from max(prefill pos)+1
    # (cache_position + rope_deltas, qwenvl/modeling_qwen2_vl.py:141-163) —
    # here max+1 == the original length.
    assert r1.decode_pos_base == r1.layer_caches[0][2]
    assert r3.decode_pos_base == len(pt)
    # With the decode base equalized, 3D decode must still reproduce 1D.
    import dataclasses
    r1_shift = dataclasses.replace(r1, decode_pos_base=len(pt))
    t1 = e1.generate_greedy(r1_shift, max_new_tokens=4)
    t3 = e3.generate_greedy(r3, max_new_tokens=4)
    assert t1 == t3


def test_num4_importance_matches_reference_pipeline():
    """num_importance_queries=4 (Qwen2-VL capture) against the NumPy pipeline
    with the same 4-row head-averaged importance."""
    cfg = tiny_llm_config(num_layers=5)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(1))
    ff = FrameFusionConfig(cost=0.35, similarity_lower_bound=0.8, ratio_lower_bound=0.05,
                           schedule_num_layers=5, bucket=32, num_importance_queries=4)
    rng = np.random.default_rng(1)
    h, pt, img_start, n_img = make_sequence(rng, 5, 4, 10, 6, hidden=cfg.hidden_size, coherent=0.6)
    h = (h * 0.05).astype(np.float32)
    pos = np.arange(len(pt), dtype=np.int32)

    engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
    res = engine.prefill(h, pt, pos, 4, img_start, n_img)

    ff_ref = ff
    ref = ref_pipeline.ref_compressed_prefill(params, cfg, ff_ref, h, pt, pos, 4, img_start, n_img)
    assert [(e.layer, e.kind, e.tokens_removed) for e in res.telemetry.events] == ref["events"]
    assert res.valid_len == ref["final_len"]
    np.testing.assert_allclose(np.asarray(res.logits), ref["logits"], rtol=2e-3, atol=2e-3)


def test_distinct_streams_smoke():
    """Genuinely distinct (t,h,w) streams through fused prefill + decode."""
    cfg = tiny_llm_config(num_layers=3).replace(mrope_section=(4, 6, 6))
    params = qwen2.init_params(cfg, jax.random.PRNGKey(2))
    ff = FrameFusionConfig(cost=0.5, similarity_lower_bound=0.8, ratio_lower_bound=0.05,
                           schedule_num_layers=3, bucket=32, num_importance_queries=4)

    from framefusion_tpu.models.adapters.qwen2_vl import build_prefill_inputs

    rng = np.random.default_rng(2)
    grid_t, grid_h, grid_w = 6, 4, 4
    patch_num = 4
    video = np.empty((grid_t * patch_num, cfg.hidden_size), np.float32)
    frame = rng.standard_normal((patch_num, cfg.hidden_size)) * 0.05
    for t in range(grid_t):
        frame = frame + 0.02 * rng.standard_normal(frame.shape)
        video[t * patch_num : (t + 1) * patch_num] = frame
    text = (rng.standard_normal((8, cfg.hidden_size)) * 0.05).astype(np.float32)
    inputs = build_prefill_inputs(text, video, 6, grid_t, grid_h, grid_w)

    engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
    res = engine.prefill(inputs.input_embeds, inputs.patch_type, inputs.position_ids,
                         inputs.patch_num, inputs.image_token_start, inputs.image_token_length)
    assert res.valid_len < inputs.input_embeds.shape[0]
    assert np.isfinite(np.asarray(res.logits)).all()
    toks = engine.generate_greedy(res, max_new_tokens=3)
    assert len(toks) == 3


def test_batched_decode_mrope_matches_single():
    """generate_batch with 3D mRoPE positions (pos_dims=3 decode path) must
    reproduce each sequence's single-loop greedy decode."""
    cfg = tiny_llm_config(num_layers=4).replace(mrope_section=(4, 6, 6))
    params = qwen2.init_params(cfg, jax.random.PRNGKey(2))
    ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.75, ratio_lower_bound=0.05,
                           schedule_num_layers=4, bucket=32, num_importance_queries=4)
    engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")

    results, singles = [], []
    for seed, coh in [(0, 0.8), (4, 0.5)]:
        rng = np.random.default_rng(seed)
        h, pt, img_start, n_img = make_sequence(rng, 4, 6, 8, 3, hidden=cfg.hidden_size,
                                                coherent=coh)
        h = (h * 0.05).astype(np.float32)
        pos3d = np.tile(np.arange(len(pt), dtype=np.int32), (3, 1))
        res = engine.prefill(h, pt, pos3d, 6, img_start, n_img)
        assert res.pos_dims == 3
        singles.append(engine.generate_greedy(res, max_new_tokens=4))
        results.append(res)
    assert engine.generate_batch(results, max_new_tokens=4) == singles


def test_num4_capture_with_short_text_suffix_all_modes():
    """Regression: with num_importance_queries=4 and fewer than 4 trailing
    text tokens, the capture rows in the MASK-ONLY executors (fused without
    pre-compaction, planned, planned_batch) must be the last 4 LIVE tokens —
    the reference captures ``query[:, :, -4:, :]`` of its COMPACTED states
    (utils.py:29), and the trailing window of the uncompacted layout contains
    dead/merged image rows. Caught by the cross-mode fuzz (seed 20): events
    matched but the prune kept a different token set, diverging logits by
    ~0.28."""
    cfg = tiny_llm_config(num_layers=6)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    ff = FrameFusionConfig(cost=0.376, similarity_lower_bound=0.657,
                           ratio_lower_bound=0.036, num_importance_queries=4,
                           schedule_num_layers=6, bucket=32)
    rng = np.random.default_rng(20)
    h, pt, img_start, n_img = make_sequence(rng, 2, 4, 7, 1,  # n_post=1 < num=4
                                            hidden=cfg.hidden_size, coherent=0.56)
    h = (h * 0.05).astype(np.float32)
    pos = np.arange(len(pt), dtype=np.int32)
    ref = ref_pipeline.ref_compressed_prefill(params, cfg, ff, h, pt, pos, 4, img_start, n_img)

    for mode, cpe in [("fused", False), ("fused", True), ("planned", False),
                      ("segmented", False)]:
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum", compact_pre_event=cpe)
        res = engine.prefill(h, pt, pos, 4, img_start, n_img, mode=mode)
        msg = f"mode={mode} cpe={cpe}"
        assert [(e.layer, e.kind, e.tokens_removed) for e in res.telemetry.events] == ref["events"], msg
        assert res.valid_len == ref["final_len"], msg
        np.testing.assert_allclose(np.asarray(res.logits), ref["logits"],
                                   rtol=5e-3, atol=5e-3, err_msg=msg)
    engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
    res_b = engine.prefill_planned_batch([(h, pt, pos, img_start, n_img)], patch_num=4)[0]
    np.testing.assert_allclose(np.asarray(res_b.logits), ref["logits"], rtol=5e-3, atol=5e-3)
