"""Adapter tests: patch-type builders vs the reference formulas."""

import numpy as np
import pytest

import jax

from framefusion_tpu.core.constants import TEXT_TOKEN
from framefusion_tpu.models.adapters import (
    internvl as a_internvl,
    llava_next_video as a_lnv,
    llava_video as a_llava,
    minicpmv as a_minicpmv,
    nvila as a_nvila,
    qwen2_vl as a_qwen2vl,
)


def text(n, d=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d)).astype(np.float32)


class TestLlavaVideo:
    def test_patch_num_formula(self):
        # 27 patches/side -> 13 pooled -> 13*14=182 (reference
        # modeling_llava_video.py:322-326)
        feats = text(182 * 4, seed=1)
        out = a_llava.build_prefill_inputs(text(10), feats, image_token_pos=5,
                                           num_patches_per_side=27)
        assert out.patch_num == 182
        assert out.image_token_start == 5
        assert out.image_token_length == 182 * 4
        assert out.input_embeds.shape[0] == 9 + 182 * 4
        # bilinear pooling rounds up (ceil(27/2)=14 -> 14*15=210)
        out2 = a_llava.build_prefill_inputs(text(10), text(210 * 2, seed=2), 5,
                                            num_patches_per_side=27,
                                            spatial_pool_mode="bilinear")
        assert out2.patch_num == 210

    def test_patch_type_layout(self):
        out = a_llava.build_prefill_inputs(text(8), text(6 * 3, seed=3), 4,
                                           num_patches_per_side=5)  # 5//2=2 -> 2*3=6
        pt = out.patch_type
        assert (pt[:4] == TEXT_TOKEN).all()
        np.testing.assert_array_equal(pt[4 : 4 + 18], np.tile(np.arange(6), 3))
        assert (pt[22:] == TEXT_TOKEN).all()


class TestQwen2VL:
    def test_patch_num_and_mrope(self):
        grid_t, grid_h, grid_w = 4, 8, 12
        patch_num = (8 * 12) // 4  # 24 (reference qwenvl/modeling_qwen2_vl.py:119)
        feats = text(grid_t * patch_num, seed=4)
        out = a_qwen2vl.build_prefill_inputs(text(12), feats, 6, grid_t, grid_h, grid_w)
        assert out.patch_num == patch_num
        assert out.num_importance_queries == 4
        pos = out.position_ids
        assert pos.shape == (3, out.input_embeds.shape[0])
        # leading text: all three streams equal 0..5
        np.testing.assert_array_equal(pos[:, :6], np.tile(np.arange(6), (3, 1)))
        # first video token: (t,h,w) all at base position 6
        np.testing.assert_array_equal(pos[:, 6], [6, 6, 6])
        # second video token advances w only
        np.testing.assert_array_equal(pos[:, 7], [6, 6, 7])
        # trailing text resumes from max+1 on all streams
        tail0 = pos[:, 6 + grid_t * patch_num]
        assert (tail0 == tail0[0]).all()
        assert tail0[0] == pos[:, : 6 + grid_t * patch_num].max() + 1


class TestInternVL:
    def test_interleaved_layout(self):
        # 3 frames x 4 tokens with 2 text tokens between frames
        s = 5 + (4 + 2) * 3 + 3
        mask = np.zeros(s, bool)
        p = 5
        for f in range(3):
            mask[p : p + 4] = True
            p += 6
        out = a_internvl.build_prefill_inputs(text(s, seed=5), mask, tokens_per_frame=4)
        assert out.patch_num == 4
        idx = np.nonzero(mask)[0]
        np.testing.assert_array_equal(out.patch_type[idx], np.tile(np.arange(4), 3))
        assert (out.patch_type[~mask] == TEXT_TOKEN).all()
        # reference quirk: span length includes interleaved text
        assert out.image_token_start == 5
        assert out.image_token_length == int(idx[-1]) - 5 + 1


class TestMiniCPMV:
    def test_token_per_frame_from_bounds(self):
        # 2 frames, 1 slice each, 10 tokens per slice, +2 separator slots
        # frame starts at 4 and 16 -> token_per_frame = 12 (reference :96-98)
        bounds = np.array([[4, 14], [16, 26]])
        s = 32
        out = a_minicpmv.build_prefill_inputs(text(s, seed=6), bounds, num_frames=2)
        assert out.patch_num == 12
        np.testing.assert_array_equal(
            out.patch_type[4:28], np.arange(24) % 12
        )
        assert out.image_token_start == 4

    def test_span_via_argmax(self):
        bounds = np.array([[3, 7], [8, 12]])
        out = a_minicpmv.build_prefill_inputs(text(20, seed=7), bounds, num_frames=2)
        assert out.image_token_start == 3
        assert out.image_token_length == (12 + 2 - 1) - 3 + 1


class TestNVILA:
    def test_video_pooling(self):
        # 8 frames, pool 2 -> 4 effective frames; 12 tokens -> patch_num 3
        out = a_nvila.build_prefill_inputs_video(text(10), text(12, seed=8), 5,
                                                 num_frames=8, temporal_pool_size=2)
        assert out.patch_num == 3
        np.testing.assert_array_equal(out.patch_type[5:17], np.tile(np.arange(3), 4))

    def test_multi_image_patchnum_one(self):
        imgs = [text(4, seed=9), text(4, seed=10), text(4, seed=11)]
        out = a_nvila.build_prefill_inputs_multi_image(text(9), imgs, 3)
        assert out.patch_num == 1
        assert (out.patch_type[3 : 3 + 12] == 0).all()
        assert out.image_token_length == 12


class TestLlavaNextVideo:
    def test_completed_adapter_and_reference_token_type(self):
        s = 4 + 8 * 2 + 2
        mask = np.zeros(s, bool)
        mask[4 : 4 + 16] = True
        # reference vestigial frame-index types (modeling_llava_next_video.py:226-232)
        tt = a_lnv.frame_index_token_type(mask, token_per_frame=8)
        np.testing.assert_array_equal(tt[4:12], 0)
        np.testing.assert_array_equal(tt[12:20], 1)
        assert (tt[~mask] == TEXT_TOKEN).all()
        # completed adapter: spatial patch ids
        out = a_lnv.build_prefill_inputs(text(s, seed=12), mask, num_vit_patches=32,
                                         pool_kernel_size=2)
        assert out.patch_num == 8
        np.testing.assert_array_equal(out.patch_type[4:20], np.tile(np.arange(8), 2))


class TestInterfaceEndToEnd:
    def test_apply_framefusion_and_generate(self):
        import jax.numpy as jnp
        from framefusion_tpu.config import tiny_llm_config
        from framefusion_tpu.interface import FrameFusionModel, apply_framefusion
        from framefusion_tpu.models import qwen2

        cfg = tiny_llm_config(num_layers=4)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
        model = FrameFusionModel(family="llava_video", cfg=cfg, params=params, attn_impl="einsum")

        rng = np.random.default_rng(0)
        # patch_num = 5//2=2 -> 2*3=6; 4 frames
        feats = (rng.standard_normal((24, cfg.hidden_size)) * 0.05).astype(np.float32)
        txt = (rng.standard_normal((10, cfg.hidden_size)) * 0.05).astype(np.float32)
        inputs = a_llava.build_prefill_inputs(txt, feats, 5, num_patches_per_side=5)

        dense_tokens, dense_res = model.generate(inputs, max_new_tokens=4)
        assert dense_res.telemetry is None

        ff_model = apply_framefusion(model, cost=0.5, similarity_lower_bound=0.7, ratio_lower_bound=0.05)
        ff_model = ff_model.__class__(**{**ff_model.__dict__, "ff": ff_model.ff.replace(schedule_num_layers=4)})
        tokens, res = ff_model.generate(inputs, max_new_tokens=4)
        assert len(tokens) == 4
        assert res.telemetry is not None and res.valid_len <= dense_res.valid_len
        assert model.ff is None  # original untouched

    def test_apply_framefusion_rejects_unknown(self):
        from framefusion_tpu.interface import apply_framefusion

        with pytest.raises(NotImplementedError):
            apply_framefusion(object(), 0.3, 0.6, 0.1)


def test_get_token_type_registry():
    from framefusion_tpu.interface import get_token_type

    for family in ("llava_video", "qwen2_vl", "internvl", "minicpmv", "nvila", "llava_next_video"):
        mod = get_token_type(family)
        assert hasattr(mod, "build_prefill_inputs") or hasattr(mod, "build_prefill_inputs_video")
    with pytest.raises(NotImplementedError):
        get_token_type("nope")
