"""Golden test: our functional Qwen2 stack vs HuggingFace transformers.

Builds a tiny random HF Qwen2ForCausalLM (fp32, CPU), imports its weights
through framefusion_tpu.weights, and checks dense prefill logits and greedy
decode parity. This pins the whole decoder math (RMSNorm, GQA+bias, RoPE,
SwiGLU, tied/untied head) independently of the compression layer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from framefusion_tpu.config import LLMConfig
from framefusion_tpu.models import qwen2
from framefusion_tpu.weights import params_from_state_dict


def make_hf_model(tie=False, num_layers=3):
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=num_layers,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=tie,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(hf_cfg).eval()
    ours_cfg = LLMConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_layers=num_layers,
        num_heads=4,
        num_kv_heads=2,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=tie,
        dtype=jnp.float32,
    )
    return model, ours_cfg


@pytest.mark.parametrize("tie", [False, True])
def test_prefill_logits_match(tie):
    model, cfg = make_hf_model(tie=tie)
    params = params_from_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=33)
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids[None])).logits[0].numpy()

    embeds = qwen2.embed(params, jnp.asarray(ids), cfg)
    pos = jnp.arange(len(ids), dtype=jnp.int32)
    cos, sin = qwen2.positions_cos_sin(pos, cfg)
    h, _, _ = qwen2.run_layers(params, embeds, cos, sin, cfg, attn_impl="einsum")
    ours = np.asarray(qwen2.final_logits(params, h, cfg))

    np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4)
    # Argmax (greedy decisions) must match everywhere.
    np.testing.assert_array_equal(ours.argmax(-1), hf_logits.argmax(-1))


def test_chunked_attention_matches_einsum():
    model, cfg = make_hf_model()
    params = params_from_state_dict(model.state_dict(), cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=70))
    embeds = qwen2.embed(params, ids, cfg)
    pos = jnp.arange(len(ids), dtype=jnp.int32)
    cos, sin = qwen2.positions_cos_sin(pos, cfg)
    h_e, ke, ve = qwen2.run_layers(params, embeds, cos, sin, cfg, attn_impl="einsum")
    h_c, kc, vc = qwen2.run_layers(params, embeds, cos, sin, cfg, attn_impl="chunked")
    np.testing.assert_allclose(np.asarray(h_c), np.asarray(h_e), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(kc), np.asarray(ke), rtol=1e-5, atol=1e-5)


def test_greedy_decode_matches_hf():
    model, cfg = make_hf_model()
    params = params_from_state_dict(model.state_dict(), cfg)
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, cfg.vocab_size, size=17)
    n_new = 8

    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor(prompt[None]), max_new_tokens=n_new, do_sample=False,
            pad_token_id=0,
        )[0].numpy()
    hf_new = hf_out[len(prompt):]

    # Ours: dense prefill + decode loop against a padded pool.
    ids = jnp.asarray(prompt)
    embeds = qwen2.embed(params, ids, cfg)
    pos = jnp.arange(len(prompt), dtype=jnp.int32)
    cos, sin = qwen2.positions_cos_sin(pos, cfg)
    h, k_all, v_all = qwen2.run_layers(params, embeds, cos, sin, cfg, attn_impl="einsum")
    logits = qwen2.final_logits(params, h[-1:], cfg)[0]

    s_pad = len(prompt) + n_new
    k_pool = jnp.zeros((cfg.num_layers, s_pad, cfg.num_kv_heads, cfg.head_dim_), cfg.dtype)
    v_pool = jnp.zeros_like(k_pool)
    k_pool = k_pool.at[:, : len(prompt)].set(k_all)
    v_pool = v_pool.at[:, : len(prompt)].set(v_all)
    cache_lens = jnp.full((cfg.num_layers,), len(prompt), jnp.int32)

    out = []
    tok = int(jnp.argmax(logits))
    out.append(tok)
    for step in range(n_new - 1):
        te = qwen2.embed(params, jnp.asarray(tok), cfg)
        pos_id = jnp.asarray(len(prompt) + step, jnp.int32)
        logits, k_pool, v_pool, cache_lens = qwen2.decode_step(
            params, te, pos_id, k_pool, v_pool, cache_lens, cfg
        )
        tok = int(jnp.argmax(logits))
        out.append(tok)

    np.testing.assert_array_equal(np.asarray(out), hf_new)
