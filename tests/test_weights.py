"""Weight-import tests: HF naming, InternLM2 fused-wqkv unpacking, safetensors."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framefusion_tpu.config import tiny_llm_config
from framefusion_tpu.models import qwen2
from framefusion_tpu.utils import get_attr_by_name
from framefusion_tpu.weights import params_from_state_dict, params_from_state_dict_internlm2


def make_internlm2_state_dict(cfg, seed=0, prefix="language_model.model."):
    """Synthesize an InternLM2-style checkpoint and the expected split qkv."""
    rng = np.random.default_rng(seed)
    hd = cfg.head_dim_
    g = cfg.num_heads // cfg.num_kv_heads
    d = cfg.hidden_size
    sd, expect = {}, {"wq": [], "wk": [], "wv": []}
    for i in range(cfg.num_layers):
        # independent per-head weights, fused in [g q, 1 k, 1 v] group layout
        q = rng.standard_normal((cfg.num_kv_heads, g, hd, d)).astype(np.float32)
        k = rng.standard_normal((cfg.num_kv_heads, 1, hd, d)).astype(np.float32)
        v = rng.standard_normal((cfg.num_kv_heads, 1, hd, d)).astype(np.float32)
        fused = np.concatenate([q, k, v], axis=1).reshape(-1, d)
        sd[f"{prefix}layers.{i}.attention.wqkv.weight"] = fused
        expect["wq"].append(q.reshape(-1, d).T)
        expect["wk"].append(k.reshape(-1, d).T)
        expect["wv"].append(v.reshape(-1, d).T)
        sd[f"{prefix}layers.{i}.attention.wo.weight"] = rng.standard_normal((d, cfg.num_heads * hd)).astype(np.float32)
        sd[f"{prefix}layers.{i}.attention_norm.weight"] = np.ones(d, np.float32)
        sd[f"{prefix}layers.{i}.ffn_norm.weight"] = np.ones(d, np.float32)
        sd[f"{prefix}layers.{i}.feed_forward.w1.weight"] = rng.standard_normal((cfg.intermediate_size, d)).astype(np.float32)
        sd[f"{prefix}layers.{i}.feed_forward.w3.weight"] = rng.standard_normal((cfg.intermediate_size, d)).astype(np.float32)
        sd[f"{prefix}layers.{i}.feed_forward.w2.weight"] = rng.standard_normal((d, cfg.intermediate_size)).astype(np.float32)
    sd[prefix + "tok_embeddings.weight"] = rng.standard_normal((cfg.vocab_size, d)).astype(np.float32)
    sd[prefix + "norm.weight"] = np.ones(d, np.float32)
    sd["language_model.output.weight"] = rng.standard_normal((cfg.vocab_size, d)).astype(np.float32)
    return sd, expect


class TestInternLM2Import:
    def test_fused_wqkv_unpacking(self):
        cfg = tiny_llm_config(qkv_bias=False)
        sd, expect = make_internlm2_state_dict(cfg)
        params = params_from_state_dict_internlm2(sd, cfg)
        for name in ("wq", "wk", "wv"):
            got = np.asarray(params["layers"][name])
            want = np.stack(expect[name])
            np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_imported_stack_runs(self):
        cfg = tiny_llm_config(qkv_bias=False, num_layers=2)
        sd, _ = make_internlm2_state_dict(cfg)
        params = params_from_state_dict_internlm2(sd, cfg)
        ids = jnp.arange(8)
        embeds = qwen2.embed(params, ids, cfg) * 0.05
        pos = jnp.arange(8, dtype=jnp.int32)
        logits, _, _ = qwen2.dense_prefill(params, embeds, pos, cfg, attn_impl="einsum")
        assert np.isfinite(np.asarray(logits)).all()


class TestSafetensors:
    def test_sharded_roundtrip(self, tmp_path):
        pytest.importorskip("safetensors")
        from safetensors.numpy import save_file

        from transformers import Qwen2Config, Qwen2ForCausalLM
        import torch

        hf_cfg = Qwen2Config(
            vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
        )
        torch.manual_seed(0)
        model = Qwen2ForCausalLM(hf_cfg)
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        # two shards + index, like HF hub layouts
        keys = sorted(sd)
        half = len(keys) // 2
        save_file({k: sd[k] for k in keys[:half]}, str(tmp_path / "model-00001.safetensors"))
        save_file({k: sd[k] for k in keys[half:]}, str(tmp_path / "model-00002.safetensors"))

        from framefusion_tpu.config import LLMConfig
        from framefusion_tpu.weights import load_safetensors

        cfg = LLMConfig(vocab_size=128, hidden_size=64, intermediate_size=96, num_layers=2,
                        num_heads=4, num_kv_heads=2, dtype=jnp.float32)
        params = load_safetensors(str(tmp_path), cfg)
        direct = params_from_state_dict(sd, cfg)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
            params, direct,
        )


class TestUtils:
    def test_get_attr_by_name_on_pytree(self):
        cfg = tiny_llm_config(num_layers=2)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
        wq = get_attr_by_name(params, "layers.wq")
        assert wq.shape[0] == 2
        row = get_attr_by_name({"a": [{"b": 7}]}, "a.0.b")
        assert row == 7

    def test_frame_dumps(self, tmp_path):
        from framefusion_tpu.utils import save_video_frames, save_video_frames_subfigures

        video = np.random.default_rng(0).uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)
        save_video_frames(video, str(tmp_path / "frames"))
        assert len(list((tmp_path / "frames").glob("*.png"))) == 4
        save_video_frames_subfigures(video, str(tmp_path / "grid.jpg"))
        assert (tmp_path / "grid.jpg").exists()
