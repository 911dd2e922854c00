"""Vision tower tests: SigLIP ViT vs HF transformers + LLaVA frontend shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from framefusion_tpu.models.vision import siglip
from framefusion_tpu.models.vision.llava_frontend import encode_video, init_projector


def make_hf_siglip():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    hf_cfg = SiglipVisionConfig(
        image_size=28, patch_size=7, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = SiglipVisionModel(hf_cfg).eval()
    cfg = siglip.tiny_vit_config()
    return model, cfg


def import_hf_vit(model, cfg):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return siglip.params_from_hf(sd, cfg, prefix="vision_model.")


class TestSiglipVsHF:
    def test_final_features_match(self):
        model, cfg = make_hf_siglip()
        params = import_hf_vit(model, cfg)
        rng = np.random.default_rng(0)
        pixels = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
        with torch.no_grad():
            hf = model(torch.tensor(pixels.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
        ours = np.asarray(siglip.encode(params, jnp.asarray(pixels), cfg, feature_layer=-1))
        np.testing.assert_allclose(ours, hf, rtol=2e-4, atol=2e-4)

    def test_penultimate_features_match(self):
        model, cfg = make_hf_siglip()
        params = import_hf_vit(model, cfg)
        rng = np.random.default_rng(1)
        pixels = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)
        with torch.no_grad():
            hs = model(torch.tensor(pixels.transpose(0, 3, 1, 2)), output_hidden_states=True).hidden_states
        ours = np.asarray(siglip.encode(params, jnp.asarray(pixels), cfg, feature_layer=-2))
        np.testing.assert_allclose(ours, hs[-2].numpy(), rtol=2e-4, atol=2e-4)

    def test_pallas_attention_matches_einsum(self):
        """The fused bidirectional kernel (interpret mode) == the einsum tower
        path, at a geometry that exercises BOTH pads (N=16 not a lane
        multiple, hd=16 -> 128) and the in-kernel head loop."""
        model, cfg = make_hf_siglip()
        params = import_hf_vit(model, cfg)
        rng = np.random.default_rng(2)
        pixels = jnp.asarray(rng.standard_normal((3, 28, 28, 3)).astype(np.float32))
        ref = np.asarray(siglip.encode(params, pixels, cfg, attn_impl="einsum"))
        got = np.asarray(siglip.encode(params, pixels, cfg, attn_impl="interpret"))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_int8_tower_close_and_w8a8_runs(self):
        """quantize_tower_int8 + encode(w8a8=): int8 rounding perturbs the
        features slightly (both A/B sides share the encoder, so this never
        skews the dense-vs-FF comparison); the structure must match the LLM
        quant convention ({"q8" int8, "scale" f32} pairs, models/qwen2.mm)."""
        model, cfg = make_hf_siglip()
        params = import_hf_vit(model, cfg)
        rng = np.random.default_rng(3)
        pixels = jnp.asarray(rng.standard_normal((2, 28, 28, 3)).astype(np.float32))
        ref = np.asarray(siglip.encode(params, pixels, cfg, feature_layer=-2))

        qparams = siglip.quantize_tower_int8(jax.tree.map(jnp.asarray, params))
        for name in siglip.QUANTIZED_TOWER_WEIGHTS:
            leaf = qparams["layers"][name]
            assert leaf["q8"].dtype == jnp.int8 and leaf["q8"].shape[0] == cfg.num_layers
        for got_impl in ("einsum", "interpret"):
            got = np.asarray(siglip.encode(qparams, pixels, cfg, feature_layer=-2,
                                           attn_impl=got_impl))
            rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
            assert rel < 0.05, f"weight-only int8 rel err {rel} ({got_impl})"
        got = np.asarray(siglip.encode(qparams, pixels, cfg, feature_layer=-2, w8a8=True))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.10, f"w8a8 rel err {rel}"
        # frontend pass-through: shapes + finite
        proj = init_projector(jax.random.PRNGKey(1), cfg.hidden_size, 32)
        toks = encode_video(qparams, cfg, proj, jnp.asarray(
            np.random.default_rng(4).standard_normal((2, 28, 28, 3)).astype(np.float32)),
            w8a8=True)
        side = cfg.patches_per_side // 2
        assert toks.shape == (2 * side * (side + 1), 32)
        assert bool(jnp.all(jnp.isfinite(toks)))

    def test_bidir_kernel_vs_reference_softmax(self):
        """Kernel (interpret) vs plain softmax attention across head counts
        that hit heads_per_step paths (h=4 one step, h=2 reduced hb)."""
        from framefusion_tpu.ops.kernels.bidir_attention import flash_bidir_attention

        rng = np.random.default_rng(3)
        for b, n, h, hd in [(2, 9, 4, 16), (1, 130, 2, 8)]:
            q = jnp.asarray(rng.standard_normal((b, n, h, hd)).astype(np.float32))
            k = jnp.asarray(rng.standard_normal((b, n, h, hd)).astype(np.float32))
            v = jnp.asarray(rng.standard_normal((b, n, h, hd)).astype(np.float32))
            s = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
            p = jax.nn.softmax(jnp.asarray(s), axis=-1)
            ref = np.einsum("bhqk,bkhd->bqhd", np.asarray(p), v)
            got = np.asarray(flash_bidir_attention(q, k, v, interpret=True))
            np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def make_hf_qwen2vl_tower():
    from transformers import Qwen2VLConfig
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VisionTransformerPretrainedModel,
    )

    from framefusion_tpu.models.vision import qwen2_vl_vit as vit

    vc = Qwen2VLConfig(vision_config=dict(
        depth=2, embed_dim=64, num_heads=4, patch_size=7, temporal_patch_size=2,
        spatial_merge_size=2, mlp_ratio=2, hidden_size=32, in_channels=3,
    )).vision_config
    vc._attn_implementation = "eager"
    torch.manual_seed(0)
    tower = Qwen2VisionTransformerPretrainedModel._from_config(vc).eval()
    cfg = vit.tiny_qwen2vl_vit_config()
    params = vit.params_from_hf(tower.state_dict(), cfg, prefix="")
    return tower, params, cfg


class TestQwen2VLViTVsHF:
    """The Qwen2-VL ``visual`` tower (reference qwenvl/modeling_qwen2_vl.py:
    95-111 delegates to it) vs HF — patch layout, 2D vision rotary, per-frame
    attention, and the 2x2 PatchMerger."""

    def test_video_features_match(self):
        from framefusion_tpu.models.vision import qwen2_vl_vit as vit

        tower, params, cfg = make_hf_qwen2vl_tower()
        rng = np.random.default_rng(0)
        frames = rng.standard_normal((4, 28, 28, 3)).astype(np.float32)
        patches, (gt, gh, gw) = vit.pixels_to_patches(frames, cfg)
        assert (gt, gh, gw) == (2, 4, 4)
        with torch.no_grad():
            hf = tower(torch.tensor(patches), grid_thw=torch.tensor([[gt, gh, gw]])).numpy()
        ours = np.asarray(vit.encode_video(params, jnp.asarray(patches), gt, gh, gw, cfg))
        assert ours.shape == (gt * gh * gw // 4, cfg.hidden_size)
        np.testing.assert_allclose(ours, hf, rtol=2e-4, atol=2e-4)

    def test_non_square_grid_matches(self):
        from framefusion_tpu.models.vision import qwen2_vl_vit as vit

        tower, params, cfg = make_hf_qwen2vl_tower()
        rng = np.random.default_rng(1)
        frames = rng.standard_normal((6, 28, 56, 3)).astype(np.float32)
        patches, (gt, gh, gw) = vit.pixels_to_patches(frames, cfg)
        assert (gt, gh, gw) == (3, 4, 8)
        with torch.no_grad():
            hf = tower(torch.tensor(patches), grid_thw=torch.tensor([[gt, gh, gw]])).numpy()
        ours = np.asarray(vit.encode_video(params, jnp.asarray(patches), gt, gh, gw, cfg))
        np.testing.assert_allclose(ours, hf, rtol=2e-4, atol=2e-4)

    def test_pallas_attention_matches_einsum(self):
        from framefusion_tpu.models.vision import qwen2_vl_vit as vit

        _, params, cfg = make_hf_qwen2vl_tower()
        rng = np.random.default_rng(2)
        frames = rng.standard_normal((4, 28, 28, 3)).astype(np.float32)
        patches, (gt, gh, gw) = vit.pixels_to_patches(frames, cfg)
        ref = np.asarray(vit.encode_video(params, jnp.asarray(patches), gt, gh, gw, cfg,
                                          attn_impl="einsum"))
        got = np.asarray(vit.encode_video(params, jnp.asarray(patches), gt, gh, gw, cfg,
                                          attn_impl="interpret"))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_patch_layout_matches_hf_processor(self):
        """pixels_to_patches must emit the HF Qwen2VLImageProcessor layout
        byte for byte (incl. odd-frame-count last-frame repeat)."""
        from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
            Qwen2VLImageProcessor,
        )

        from framefusion_tpu.models.vision import qwen2_vl_vit as vit

        cfg = vit.tiny_qwen2vl_vit_config()
        rng = np.random.default_rng(2)
        frames = rng.standard_normal((3, 28, 28, 3)).astype(np.float32)  # odd count
        patches, grid = vit.pixels_to_patches(frames, cfg)
        proc = Qwen2VLImageProcessor(
            do_resize=False, do_rescale=False, do_normalize=False,
            do_convert_rgb=False, patch_size=7, temporal_patch_size=2, merge_size=2,
        )
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            out = proc(images=None, videos=[list(frames)], return_tensors="np")
        np.testing.assert_array_equal(out["video_grid_thw"][0], grid)
        np.testing.assert_allclose(out["pixel_values_videos"], patches, rtol=1e-6, atol=1e-6)

    def test_pixels_to_answer_through_pipeline(self):
        """VERDICT r2 item 2 'done' check: qwen2_vl pixels -> answer with no
        precomputed features."""
        import jax

        from framefusion_tpu.config import tiny_llm_config
        from framefusion_tpu.interface import FrameFusionModel, apply_framefusion
        from framefusion_tpu.models import qwen2
        from framefusion_tpu.models.vision import qwen2_vl_vit as vit
        from framefusion_tpu.pipeline import TextPipeline
        from test_pipeline import StubTokenizer

        _, vparams, vcfg = make_hf_qwen2vl_tower()
        llm_cfg = tiny_llm_config(num_layers=3, hidden_size=32, num_heads=4,
                                  intermediate_size=64).replace(mrope_section=(1, 2, 1))
        params = qwen2.init_params(llm_cfg, jax.random.PRNGKey(0))
        m = apply_framefusion(
            FrameFusionModel(family="qwen2_vl", cfg=llm_cfg, params=params,
                             attn_impl="einsum"),
            cost=0.6, similarity_lower_bound=0.9, ratio_lower_bound=0.05,
        )
        pipe = TextPipeline(model=m, tokenizer=StubTokenizer(),
                            vit_params=vparams, vit_cfg=vcfg)
        rng = np.random.default_rng(3)
        base = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)
        frames = np.concatenate([base + 0.01 * rng.standard_normal(base.shape)
                                 for _ in range(4)])
        text = pipe.ask("what happens?", frames=frames, max_new_tokens=3)
        assert isinstance(text, str) and len(text) > 0

        # raw uint8 camera frames: the pipeline smart_resizes to a
        # factor-of-(patch*merge) geometry and applies the CLIP stats
        # in-repo (preprocess.py) before the tower
        raw = rng.integers(0, 256, (4, 45, 61, 3)).astype(np.uint8)
        text2 = pipe.ask("what happens?", frames=raw, max_new_tokens=3)
        assert isinstance(text2, str) and len(text2) > 0


def make_hf_qwen25vl_tower():
    from transformers import Qwen2_5_VLConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )

    from framefusion_tpu.models.vision import qwen25_vl_vit as vit25

    vc = Qwen2_5_VLConfig(vision_config=dict(
        depth=3, hidden_size=64, num_heads=4, intermediate_size=96, patch_size=7,
        temporal_patch_size=2, spatial_merge_size=2, window_size=28,
        fullatt_block_indexes=[1], out_hidden_size=32, in_channels=3,
    )).vision_config
    vc._attn_implementation = "eager"
    torch.manual_seed(0)
    tower = Qwen2_5_VisionTransformerPretrainedModel._from_config(vc).eval()
    cfg = vit25.tiny_qwen25vl_vit_config()
    params = vit25.params_from_hf(tower.state_dict(), cfg, prefix="")
    return tower, params, cfg


class TestQwen25VLViTVsHF:
    """Qwen2.5-VL tower (the stretch config's family): window-permuted
    attention with full-attention blocks at fullatt_block_indexes, RMSNorm,
    SwiGLU, and the inverse-permuted PatchMerger output — vs HF."""

    @pytest.mark.parametrize("shape,grid", [
        ((4, 28, 28, 3), (2, 4, 4)),   # exact windows
        ((6, 42, 56, 3), (3, 6, 8)),   # partial windows at both edges
    ])
    def test_features_match_hf(self, shape, grid):
        from framefusion_tpu.models.vision import qwen25_vl_vit as vit25
        from framefusion_tpu.models.vision.qwen2_vl_vit import pixels_to_patches

        tower, params, cfg = make_hf_qwen25vl_tower()
        rng = np.random.default_rng(shape[0])
        frames = rng.standard_normal(shape).astype(np.float32)
        patches, (gt, gh, gw) = pixels_to_patches(frames, cfg)
        assert (gt, gh, gw) == grid
        with torch.no_grad():
            hf = tower(torch.tensor(patches), grid_thw=torch.tensor([[gt, gh, gw]])).numpy()
        ours = np.asarray(vit25.encode_video(params, jnp.asarray(patches), gt, gh, gw, cfg))
        np.testing.assert_allclose(ours, hf, rtol=3e-4, atol=3e-4)

    def test_windowed_matches_masked_oracle(self):
        """Padded-window batched attention (the production path, incl. the
        full-attention blocks through the interpreted Pallas kernel) ==
        the O(N^2) segment-mask oracle, on a grid with ragged edge windows."""
        from framefusion_tpu.models.vision import qwen25_vl_vit as vit25
        from framefusion_tpu.models.vision.qwen2_vl_vit import pixels_to_patches

        _, params, cfg = make_hf_qwen25vl_tower()
        rng = np.random.default_rng(7)
        frames = rng.standard_normal((6, 42, 56, 3)).astype(np.float32)
        patches, (gt, gh, gw) = pixels_to_patches(frames, cfg)
        ref = np.asarray(vit25.encode_video(params, jnp.asarray(patches), gt, gh, gw, cfg,
                                            attn_impl="masked"))
        for impl in ("windowed", "windowed-interpret"):
            got = np.asarray(vit25.encode_video(params, jnp.asarray(patches), gt, gh, gw,
                                                cfg, attn_impl=impl))
            np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4, err_msg=impl)

    def test_pixels_to_answer_through_pipeline(self):
        import jax

        from framefusion_tpu.config import tiny_llm_config
        from framefusion_tpu.interface import FrameFusionModel, apply_framefusion
        from framefusion_tpu.models import qwen2
        from framefusion_tpu.pipeline import TextPipeline
        from test_pipeline import StubTokenizer

        _, vparams, vcfg = make_hf_qwen25vl_tower()
        llm_cfg = tiny_llm_config(num_layers=3, hidden_size=32, num_heads=4,
                                  intermediate_size=64).replace(mrope_section=(1, 2, 1))
        params = qwen2.init_params(llm_cfg, jax.random.PRNGKey(0))
        m = apply_framefusion(
            FrameFusionModel(family="qwen2_vl", cfg=llm_cfg, params=params,
                             attn_impl="einsum"),
            cost=0.6, similarity_lower_bound=0.9, ratio_lower_bound=0.05,
        )
        pipe = TextPipeline(model=m, tokenizer=StubTokenizer(),
                            vit_params=vparams, vit_cfg=vcfg)
        rng = np.random.default_rng(3)
        base = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)
        frames = np.concatenate([base + 0.01 * rng.standard_normal(base.shape)
                                 for _ in range(4)])
        # Qwen2.5-VL temporal spacing flows through: the temporal stream
        # advances by second_per_grid_ts (1.0 default) * tokens_per_second
        # per grid step, not by 1 (the Qwen2-VL frame index).
        inputs = pipe.build_inputs("what happens?", frames=frames)
        t_stream = inputs.position_ids[0]
        vs, n_img = inputs.image_token_start, inputs.image_token_length
        t_video = np.unique(t_stream[vs : vs + n_img])
        assert np.array_equal(np.diff(t_video), [vcfg.tokens_per_second])
        text = pipe.ask("what happens?", frames=frames, max_new_tokens=3)
        assert isinstance(text, str) and len(text) > 0


def make_hf_internvl_model():
    """Tiny HF-format InternVLModel (InternViT tower + pixel-shuffle
    projector + a 1-layer Qwen2 text stack we ignore)."""
    from transformers import InternVLConfig, InternVLModel

    from framefusion_tpu.models.vision import internvl_vit as ivit

    cfg_hf = InternVLConfig(
        vision_config=dict(image_size=[28, 28], patch_size=[7, 7], hidden_size=64,
                           intermediate_size=128, num_hidden_layers=2,
                           num_attention_heads=4, attention_bias=True,
                           use_qk_norm=False),
        text_config=dict(model_type="qwen2", vocab_size=128, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=1,
                         num_attention_heads=4, num_key_value_heads=2),
        downsample_ratio=0.5,
    )
    cfg_hf.vision_config._attn_implementation = "eager"
    torch.manual_seed(1)
    model = InternVLModel(cfg_hf).eval()
    cfg = ivit.tiny_internvit_config(attention_bias=True)
    vit_params = ivit.params_from_hf(model.state_dict(), cfg, prefix="vision_tower.")
    proj = ivit.projector_from_hf(model.state_dict(), cfg, prefix="multi_modal_projector.")
    return model, vit_params, proj, cfg


class TestInternVLViTVsHF:
    """InternViT + pixel-shuffle feature extraction (the reference's
    ``extract_feature``, modeling_internvl_chat.py:19-33) vs the HF-format
    InternVL port."""

    def test_pallas_attention_matches_einsum(self):
        from framefusion_tpu.models.vision import internvl_vit as ivit

        _, vit_params, _, cfg = make_hf_internvl_model()
        rng = np.random.default_rng(3)
        pixels = jnp.asarray(rng.standard_normal((2, 28, 28, 3)).astype(np.float32))
        ref = np.asarray(ivit.encode(vit_params, pixels, cfg, attn_impl="einsum"))
        got = np.asarray(ivit.encode(vit_params, pixels, cfg, attn_impl="interpret"))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_tower_last_hidden_matches(self):
        from transformers import InternVLVisionConfig
        from transformers.models.internvl.modeling_internvl import InternVLVisionModel

        from framefusion_tpu.models.vision import internvl_vit as ivit

        vc = InternVLVisionConfig(
            image_size=[28, 28], patch_size=[7, 7], hidden_size=64,
            intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
            attention_bias=True, use_qk_norm=True,
        )
        vc._attn_implementation = "eager"
        torch.manual_seed(0)
        tower = InternVLVisionModel(vc).eval()
        cfg = ivit.tiny_internvit_config(attention_bias=True, use_qk_norm=True)
        params = ivit.params_from_hf(tower.state_dict(), cfg, prefix="")
        rng = np.random.default_rng(0)
        pixels = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
        with torch.no_grad():
            hf = tower(torch.tensor(pixels.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
        ours = np.asarray(ivit.encode(params, jnp.asarray(pixels), cfg))
        np.testing.assert_allclose(ours, hf, rtol=3e-4, atol=3e-4)

    def test_extract_features_matches_hf(self):
        from framefusion_tpu.models.vision import internvl_vit as ivit

        model, vit_params, proj, cfg = make_hf_internvl_model()
        rng = np.random.default_rng(0)
        pixels = rng.standard_normal((3, 28, 28, 3)).astype(np.float32)
        with torch.no_grad():
            hf = model.get_image_features(
                torch.tensor(pixels.transpose(0, 3, 1, 2)),
                vision_feature_layer=-1,
                vision_feature_select_strategy="default",
            ).numpy()
        ours = np.asarray(ivit.extract_features(vit_params, proj, jnp.asarray(pixels), cfg))
        assert ours.shape == (3, cfg.tokens_per_image, cfg.text_hidden_size)
        np.testing.assert_allclose(ours, hf, rtol=3e-4, atol=3e-4)

    def test_pixels_to_answer_through_pipeline(self):
        import jax

        from framefusion_tpu.config import tiny_llm_config
        from framefusion_tpu.interface import FrameFusionModel, apply_framefusion
        from framefusion_tpu.models import qwen2
        from framefusion_tpu.pipeline import TextPipeline
        from test_pipeline import StubTokenizer

        _, vit_params, proj, vcfg = make_hf_internvl_model()
        llm_cfg = tiny_llm_config(num_layers=3, hidden_size=32, num_heads=4,
                                  intermediate_size=64, qkv_bias=False)
        params = qwen2.init_params(llm_cfg, jax.random.PRNGKey(0))
        m = apply_framefusion(
            FrameFusionModel(family="internvl", cfg=llm_cfg, params=params,
                             attn_impl="einsum"),
            cost=0.6, similarity_lower_bound=0.9, ratio_lower_bound=0.05,
        )
        pipe = TextPipeline(model=m, tokenizer=StubTokenizer(),
                            vit_params=vit_params, vit_cfg=vcfg, projector=proj)
        rng = np.random.default_rng(3)
        base = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)
        frames = np.concatenate([base + 0.01 * rng.standard_normal(base.shape)
                                 for _ in range(5)])
        text = pipe.ask("what happens?", frames=frames, max_new_tokens=3)
        assert isinstance(text, str) and len(text) > 0


class TestLlavaFrontend:
    def test_video_token_layout(self):
        cfg = siglip.tiny_vit_config()  # 4 patches/side
        vit = siglip.init_params(cfg, jax.random.PRNGKey(0))
        proj = init_projector(jax.random.PRNGKey(1), cfg.hidden_size, 32)
        frames = jax.random.normal(jax.random.PRNGKey(2), (3, 28, 28, 3))
        toks = encode_video(vit, cfg, proj, frames)
        # pooled side = 2 -> patch_num = 2*3 = 6 per frame
        assert toks.shape == (3 * 6, 32)
        # every 3rd token in a row-group is the shared newline projection
        t = np.asarray(toks).reshape(3, 2, 3, 32)
        np.testing.assert_allclose(t[0, 0, 2], t[2, 1, 2], rtol=1e-5)

    def test_e2e_with_adapter_and_engine(self):
        from framefusion_tpu.config import tiny_llm_config, FrameFusionConfig
        from framefusion_tpu.models import qwen2
        from framefusion_tpu.models.adapters import llava_video
        from framefusion_tpu.runtime.engine import CompressionEngine

        vit_cfg = siglip.tiny_vit_config()
        vit = siglip.init_params(vit_cfg, jax.random.PRNGKey(0))
        llm_cfg = tiny_llm_config(num_layers=4)
        proj = init_projector(jax.random.PRNGKey(1), vit_cfg.hidden_size, llm_cfg.hidden_size)
        params = qwen2.init_params(llm_cfg, jax.random.PRNGKey(2))

        # near-identical frames => merging fires
        base = jax.random.normal(jax.random.PRNGKey(3), (1, 28, 28, 3))
        frames = jnp.concatenate([base + 0.01 * jax.random.normal(jax.random.PRNGKey(i), base.shape) for i in range(6)])
        toks = encode_video(vit, vit_cfg, proj, frames) * 0.05
        txt = jax.random.normal(jax.random.PRNGKey(9), (12, llm_cfg.hidden_size)) * 0.05

        inputs = llava_video.build_prefill_inputs(
            np.asarray(txt), np.asarray(toks), 6, num_patches_per_side=vit_cfg.patches_per_side
        )
        assert inputs.patch_num == 6
        ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.8, ratio_lower_bound=0.05,
                               schedule_num_layers=4, bucket=32)
        engine = CompressionEngine(params, llm_cfg, ff, attn_impl="einsum")
        res = engine.prefill(inputs.input_embeds, inputs.patch_type, inputs.position_ids,
                             inputs.patch_num, inputs.image_token_start, inputs.image_token_length)
        assert res.valid_len < inputs.input_embeds.shape[0]
        assert res.telemetry.vision_token_reduction > 0.3
        toks_out = engine.generate_greedy(res, max_new_tokens=3)
        assert len(toks_out) == 3


class TestMiniCPMVFrontend:
    """SigLIP + perceiver resampler (no offline oracle — the MiniCPM remote
    package isn't importable; behavioral pins only, see module docstring)."""

    def test_resampler_shapes_and_pos_sensitivity(self):
        import jax

        from framefusion_tpu.models.vision import minicpmv_frontend as mf

        cfg = mf.tiny_resampler_config()
        params = mf.init_params(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.standard_normal((2, 16, cfg.kv_dim)) * 0.1, jnp.float32)
        out = mf.resample(params, feats, 4, 4, cfg)
        assert out.shape == (2, cfg.num_queries, cfg.embed_dim)
        # permuting the patch order must CHANGE the output (2D sincos key
        # positions break permutation invariance of plain cross-attention)
        perm = rng.permutation(16)
        out_p = mf.resample(params, feats[:, perm], 4, 4, cfg)
        assert not np.allclose(np.asarray(out), np.asarray(out_p), atol=1e-5)

    def test_sincos_embed_properties(self):
        from framefusion_tpu.models.vision.minicpmv_frontend import sincos_pos_embed_2d

        e = sincos_pos_embed_2d(3, 5, 64)
        assert e.shape == (15, 64)
        # row-coordinate half identical within a row, column half within a column
        grid = e.reshape(3, 5, 64)
        np.testing.assert_allclose(grid[1, 0, :32], grid[1, 3, :32], atol=1e-7)
        np.testing.assert_allclose(grid[0, 2, 32:], grid[2, 2, 32:], atol=1e-7)

    def test_pixels_to_answer_through_pipeline(self):
        import jax

        from framefusion_tpu.config import tiny_llm_config
        from framefusion_tpu.interface import FrameFusionModel, apply_framefusion
        from framefusion_tpu.models import qwen2
        from framefusion_tpu.models.vision import minicpmv_frontend as mf
        from framefusion_tpu.pipeline import TextPipeline
        from test_pipeline import StubTokenizer

        llm_cfg = tiny_llm_config(num_layers=3)
        params = qwen2.init_params(llm_cfg, jax.random.PRNGKey(0))
        vit_cfg = siglip.tiny_vit_config()
        vit = siglip.init_params(vit_cfg, jax.random.PRNGKey(1))
        rcfg = mf.tiny_resampler_config(embed_dim=llm_cfg.hidden_size,
                                        kv_dim=vit_cfg.hidden_size, num_heads=4)
        rparams = mf.init_params(rcfg, jax.random.PRNGKey(2))

        m = apply_framefusion(
            FrameFusionModel(family="minicpmv", cfg=llm_cfg, params=params,
                             attn_impl="einsum"),
            cost=0.6, similarity_lower_bound=0.9, ratio_lower_bound=0.05,
        )
        pipe = TextPipeline(model=m, tokenizer=StubTokenizer(), vit_params=vit,
                            vit_cfg=vit_cfg,
                            projector={"params": rparams, "cfg": rcfg})
        rng = np.random.default_rng(3)
        base = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)
        frames = np.concatenate([base + 0.01 * rng.standard_normal(base.shape)
                                 for _ in range(5)])
        text = pipe.ask("what happens?", frames=frames, max_new_tokens=3)
        assert isinstance(text, str) and len(text) > 0
        # adapter geometry: patch_num = resampled tokens + 2 separators
        assert pipe.last_result.telemetry is not None


class TestNvilaFrontend:
    def test_space_to_channel_layout(self):
        from framefusion_tpu.models.vision.nvila_frontend import space_to_channel

        feats = jnp.arange(2 * 16 * 3, dtype=jnp.float32).reshape(2, 16, 3)
        out = space_to_channel(feats, 4, 2)
        assert out.shape == (2, 4, 12)
        # first output token = rows 0-1 x cols 0-1 of the 4x4 grid,
        # row-major within the block
        want = jnp.concatenate([feats[0, 0], feats[0, 1], feats[0, 4], feats[0, 5]])
        np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(want))

    def test_pixels_to_answer_through_pipeline(self):
        import jax

        from framefusion_tpu.config import tiny_llm_config
        from framefusion_tpu.interface import FrameFusionModel, apply_framefusion
        from framefusion_tpu.models import qwen2
        from framefusion_tpu.models.vision import nvila_frontend as nf
        from framefusion_tpu.pipeline import TextPipeline
        from test_pipeline import StubTokenizer

        llm_cfg = tiny_llm_config(num_layers=3)
        params = qwen2.init_params(llm_cfg, jax.random.PRNGKey(0))
        vit_cfg = siglip.tiny_vit_config()  # 4 patches/side -> pooled 2x2
        vit = siglip.init_params(vit_cfg, jax.random.PRNGKey(1))
        pcfg = nf.NvilaProjectorConfig(vision_dim=vit_cfg.hidden_size,
                                       llm_dim=llm_cfg.hidden_size)
        proj = nf.init_projector(pcfg, jax.random.PRNGKey(2))

        m = apply_framefusion(
            FrameFusionModel(family="nvila", cfg=llm_cfg, params=params,
                             attn_impl="einsum"),
            cost=0.6, similarity_lower_bound=0.9, ratio_lower_bound=0.05,
        )
        pipe = TextPipeline(model=m, tokenizer=StubTokenizer(), vit_params=vit,
                            vit_cfg=vit_cfg, projector={"params": proj, "cfg": pcfg})
        rng = np.random.default_rng(3)
        base = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)
        frames = np.concatenate([base + 0.01 * rng.standard_normal(base.shape)
                                 for _ in range(6)])
        text = pipe.ask("what happens?", frames=frames, max_new_tokens=3)
        assert isinstance(text, str) and len(text) > 0
        assert pipe.last_result.telemetry.original_length > 6 * 4
