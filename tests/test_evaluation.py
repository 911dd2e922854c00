"""Offline accuracy-harness tests."""

import numpy as np
import pytest

import jax

from framefusion_tpu.config import tiny_llm_config
from framefusion_tpu.evaluation.harness import run_offline_eval
from framefusion_tpu.interface import FrameFusionModel, apply_framefusion
from framefusion_tpu.models import qwen2
from framefusion_tpu.models.adapters import llava_video


def build_prompts(cfg, n=3):
    rng = np.random.default_rng(0)
    prompts = []
    for i in range(n):
        patch_num = 6
        video = np.empty((8 * patch_num, cfg.hidden_size), np.float32)
        frame = rng.standard_normal((patch_num, cfg.hidden_size)) * 0.05
        for f in range(8):
            frame = frame + 0.01 * rng.standard_normal(frame.shape)
            video[f * patch_num : (f + 1) * patch_num] = frame
        text = (rng.standard_normal((10, cfg.hidden_size)) * 0.05).astype(np.float32)
        prompts.append(llava_video.build_prefill_inputs(text, video.astype(np.float32), 5, num_patches_per_side=5))
    return prompts


def test_offline_eval_reports(tmp_path):
    cfg = tiny_llm_config(num_layers=4)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    dense = FrameFusionModel(family="llava_video", cfg=cfg, params=params, attn_impl="einsum")
    ff = apply_framefusion(dense, 0.5, 0.7, 0.05)
    ff.ff = ff.ff.replace(schedule_num_layers=cfg.num_layers)

    report = run_offline_eval(dense, ff, build_prompts(cfg), max_new_tokens=6)
    assert report["num_prompts"] == 3
    assert 0.0 < report["mean_reduction"] <= 1.0
    assert 0.0 <= report["mean_greedy_agreement"] <= 1.0
    assert np.isfinite(report["mean_kl_first_token"])
    import json

    json.dumps(report)  # JSON-serialisable end to end


def test_lmms_adapter_gated():
    from framefusion_tpu.evaluation.harness import LmmsEvalAdapter

    with pytest.raises(ImportError):
        LmmsEvalAdapter(None, None, None)
