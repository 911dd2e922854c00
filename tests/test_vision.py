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
    pre = "vision_model."
    n_l = cfg.num_layers
    d = cfg.hidden_size

    def stack(fmt, transpose=False):
        arrs = [sd[pre + fmt.format(i)] for i in range(n_l)]
        arrs = [a.T if transpose else a for a in arrs]
        return jnp.asarray(np.stack(arrs), cfg.dtype)

    layers = {
        "ln1_w": stack("encoder.layers.{}.layer_norm1.weight"),
        "ln1_b": stack("encoder.layers.{}.layer_norm1.bias"),
        "ln2_w": stack("encoder.layers.{}.layer_norm2.weight"),
        "ln2_b": stack("encoder.layers.{}.layer_norm2.bias"),
        "wq": stack("encoder.layers.{}.self_attn.q_proj.weight", True),
        "bq": stack("encoder.layers.{}.self_attn.q_proj.bias"),
        "wk": stack("encoder.layers.{}.self_attn.k_proj.weight", True),
        "bk": stack("encoder.layers.{}.self_attn.k_proj.bias"),
        "wv": stack("encoder.layers.{}.self_attn.v_proj.weight", True),
        "bv": stack("encoder.layers.{}.self_attn.v_proj.bias"),
        "wo": stack("encoder.layers.{}.self_attn.out_proj.weight", True),
        "bo": stack("encoder.layers.{}.self_attn.out_proj.bias"),
        "w_fc1": stack("encoder.layers.{}.mlp.fc1.weight", True),
        "b_fc1": stack("encoder.layers.{}.mlp.fc1.bias"),
        "w_fc2": stack("encoder.layers.{}.mlp.fc2.weight", True),
        "b_fc2": stack("encoder.layers.{}.mlp.fc2.bias"),
    }
    # HF conv kernel: (D, 3, k, k) -> HWIO
    kernel = sd[pre + "embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0)
    return {
        "patch_kernel": jnp.asarray(kernel, cfg.dtype),
        "patch_bias": jnp.asarray(sd[pre + "embeddings.patch_embedding.bias"], cfg.dtype),
        "pos_embed": jnp.asarray(sd[pre + "embeddings.position_embedding.weight"], cfg.dtype),
        "layers": layers,
        "post_ln_w": jnp.asarray(sd[pre + "post_layernorm.weight"], cfg.dtype),
        "post_ln_b": jnp.asarray(sd[pre + "post_layernorm.bias"], cfg.dtype),
    }


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
