"""Golden tests: our Qwen2-VL (mRoPE) stack vs HuggingFace transformers.

The 1D-RoPE stack is pinned to HF in test_qwen2_vs_hf.py; this file pins the
multimodal-RoPE family — the exact interleavings that diverge silently:

  * ``mrope_section`` frequency interleaving (ops/rope.mrope_cos_sin) vs HF
    ``apply_multimodal_rotary_pos_emb``
    (reference models/qwen2/modeling_qwen2_vl.py:261-264);
  * the adapter's 3D rope-index builder (adapters/qwen2_vl.mrope_position_ids)
    vs HF ``Qwen2VLModel.get_rope_index``
    (reference models/qwenvl/modeling_qwen2_vl.py:141-163);
  * decode positions: ``cache_position + rope_deltas`` == max(prefill
    positions)+1 (+step) regardless of sequence content;
  * the ``num=4`` last-query importance capture
    (models/qwen2/modeling_qwen2_vl.py:289-301) vs HF eager attention rows.

All on a tiny random HF ``Qwen2VLForConditionalGeneration`` built in-process
(fp32, CPU) — no network, no checkpoints.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from framefusion_tpu.config import FrameFusionConfig, LLMConfig
from framefusion_tpu.models import qwen2
from framefusion_tpu.models.adapters.qwen2_vl import mrope_position_ids
from framefusion_tpu.runtime.engine import CompressionEngine
from framefusion_tpu.weights import params_from_state_dict

# Small sentinel ids inside the tiny vocab (the real ids, 151652/151656,
# would index out of a 256-entry embedding during generate).
VISION_START = 250
VIDEO_TOKEN = 251
IMAGE_TOKEN = 252
MROPE_SECTION = (2, 3, 3)  # head_dim 16 -> half 8


def make_hf_qwen2vl(num_layers=2):
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    hf_cfg = Qwen2VLConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=num_layers,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        rope_scaling={"type": "mrope", "mrope_section": list(MROPE_SECTION)},
        vision_start_token_id=VISION_START,
        video_token_id=VIDEO_TOKEN,
        image_token_id=IMAGE_TOKEN,
        vision_config=dict(
            depth=2, embed_dim=32, hidden_size=64, num_heads=2, patch_size=14,
            spatial_merge_size=2, temporal_patch_size=2, mlp_ratio=2,
        ),
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Qwen2VLForConditionalGeneration(hf_cfg).eval()
    ours_cfg = LLMConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_layers=num_layers,
        num_heads=4,
        num_kv_heads=2,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        mrope_section=MROPE_SECTION,
        dtype=jnp.float32,
    )
    return model, ours_cfg


def video_prompt_ids(rng, video_start, n_video, n_tail):
    """[text..., vision_start, video*n, text...] — the single-video layout the
    adapter models (reference qwenvl/modeling_qwen2_vl.py:119-126)."""
    assert video_start >= 1, "need room for the vision_start marker"
    lead = rng.integers(1, 250, size=video_start - 1).tolist() + [VISION_START]
    tail = rng.integers(1, 250, size=n_tail).tolist()
    return np.asarray(lead + [VIDEO_TOKEN] * n_video + tail, dtype=np.int64)


GRID_CASES = [
    # (grid_t, grid_h, grid_w, video_start, n_tail) — grids in ViT patches,
    # spatial_merge_size=2 halves h and w for LLM tokens.
    (2, 4, 4, 4, 2),
    (1, 2, 2, 1, 5),
    (3, 4, 8, 7, 3),
    (2, 8, 4, 2, 1),
    (4, 6, 6, 5, 4),
]


@pytest.mark.parametrize("grid_t,grid_h,grid_w,video_start,n_tail", GRID_CASES)
def test_rope_index_matches_hf(grid_t, grid_h, grid_w, video_start, n_tail):
    """adapters/qwen2_vl.mrope_position_ids vs HF get_rope_index, plus the
    decode base (max+1) vs HF rope_deltas."""
    model, _ = make_hf_qwen2vl()
    rng = np.random.default_rng(grid_t * 100 + grid_h)
    n_video = grid_t * (grid_h // 2) * (grid_w // 2)
    ids = video_prompt_ids(rng, video_start, n_video, n_tail)
    grid = torch.tensor([[grid_t, grid_h, grid_w]])
    ids_t = torch.tensor(ids[None])
    hf_pos, hf_delta = model.model.get_rope_index(
        ids_t, None, grid, torch.ones_like(ids_t)
    )
    hf_pos = hf_pos[:, 0].numpy()  # (3, S)

    ours = mrope_position_ids(len(ids), video_start, grid_t, grid_h, grid_w)
    np.testing.assert_array_equal(ours, hf_pos)

    # Decode base: HF decodes at cache_position + rope_deltas, i.e.
    # len + (max+1 - len) = max(positions) + 1.
    base = CompressionEngine._mrope_decode_base(ours)
    assert base == int(hf_pos.max()) + 1 == len(ids) + int(hf_delta[0, 0])


def make_hf_qwen25vl():
    from transformers import Qwen2_5_VLConfig, Qwen2_5_VLForConditionalGeneration

    hf_cfg = Qwen2_5_VLConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        vision_start_token_id=VISION_START, video_token_id=VIDEO_TOKEN,
        image_token_id=IMAGE_TOKEN,
        vision_config=dict(depth=2, hidden_size=32, num_heads=2, intermediate_size=48,
                           patch_size=7, spatial_merge_size=2, window_size=28,
                           fullatt_block_indexes=[1], out_hidden_size=64,
                           tokens_per_second=4),
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return Qwen2_5_VLForConditionalGeneration(hf_cfg).eval()


@pytest.mark.parametrize("spgt,grid_t,grid_h,grid_w,video_start,n_tail", [
    (0.5, 2, 4, 4, 4, 2),   # fractional spgt: HF truncates to int64 first
    (1.0, 3, 4, 8, 2, 5),
    (2.0, 4, 8, 4, 6, 3),
])
def test_qwen25_rope_index_matches_hf(spgt, grid_t, grid_h, grid_w, video_start, n_tail):
    """Qwen2.5-VL temporal spacing (second_per_grid_ts * tokens_per_second,
    HF Qwen2_5_VLModel.get_rope_index) vs the adapter, incl. rope_deltas /
    decode base."""
    model = make_hf_qwen25vl()
    rng = np.random.default_rng(int(spgt * 10))
    n_video = grid_t * (grid_h // 2) * (grid_w // 2)
    ids = video_prompt_ids(rng, video_start, n_video, n_tail)
    ids_t = torch.tensor(ids[None])
    hf_pos, hf_delta = model.model.get_rope_index(
        ids_t, None, torch.tensor([[grid_t, grid_h, grid_w]]),
        torch.tensor([spgt]), torch.ones_like(ids_t),
    )
    ours = mrope_position_ids(len(ids), video_start, grid_t, grid_h, grid_w,
                              second_per_grid_ts=spgt, tokens_per_second=4)
    np.testing.assert_array_equal(ours, hf_pos[:, 0].numpy())
    base = CompressionEngine._mrope_decode_base(ours)
    assert base == int(hf_pos.max()) + 1 == len(ids) + int(hf_delta[0, 0])


def _ours_prefill_logits(params, cfg, ids, pos3, attn_impl="einsum"):
    embeds = qwen2.embed(params, jnp.asarray(ids), cfg)
    cos, sin = qwen2.positions_cos_sin(jnp.asarray(pos3, jnp.int32), cfg)
    h, _, _ = qwen2.run_layers(params, embeds, cos, sin, cfg, attn_impl=attn_impl)
    return np.asarray(qwen2.final_logits(params, h, cfg))


def test_mrope_prefill_logits_match_hf():
    """Full-sequence logits with genuinely distinct (t, h, w) streams: pins
    mrope_cos_sin's section interleaving against HF."""
    model, cfg = make_hf_qwen2vl(num_layers=3)
    params = params_from_state_dict(model.state_dict(), cfg, prefix="model.language_model.")

    rng = np.random.default_rng(0)
    grid_t, grid_h, grid_w, video_start, n_tail = 3, 4, 8, 4, 3
    n_video = grid_t * (grid_h // 2) * (grid_w // 2)
    ids = video_prompt_ids(rng, video_start, n_video, n_tail)
    grid = torch.tensor([[grid_t, grid_h, grid_w]])

    with torch.no_grad():
        hf_logits = model(
            input_ids=torch.tensor(ids[None]), video_grid_thw=grid
        ).logits[0].numpy()

    pos3 = mrope_position_ids(len(ids), video_start, grid_t, grid_h, grid_w)
    ours = _ours_prefill_logits(params, cfg, ids, pos3)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(ours.argmax(-1), hf_logits.argmax(-1))


def test_mrope_greedy_decode_matches_hf():
    """Dense prefill + greedy decode through the ENGINE's decode loop vs HF
    generate: pins the decode rotary position base (max(prefill pos)+1, the
    rope_deltas semantics) end to end."""
    model, cfg = make_hf_qwen2vl(num_layers=3)
    params = params_from_state_dict(model.state_dict(), cfg, prefix="model.language_model.")

    rng = np.random.default_rng(1)
    grid_t, grid_h, grid_w, video_start, n_tail = 2, 4, 4, 3, 4
    n_video = grid_t * (grid_h // 2) * (grid_w // 2)
    ids = video_prompt_ids(rng, video_start, n_video, n_tail)
    grid = torch.tensor([[grid_t, grid_h, grid_w]])
    n_new = 8

    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor(ids[None]), video_grid_thw=grid,
            max_new_tokens=n_new, do_sample=False, pad_token_id=0,
        )[0].numpy()
    hf_new = hf_out[len(ids):]

    pos3 = mrope_position_ids(len(ids), video_start, grid_t, grid_h, grid_w)
    engine = CompressionEngine(
        params, cfg, FrameFusionConfig(bucket=32, num_importance_queries=4),
        attn_impl="einsum",
    )
    embeds = np.asarray(qwen2.embed(params, jnp.asarray(ids), cfg))
    res = engine.dense_prefill(embeds, pos3)
    assert res.decode_pos_base == int(pos3.max()) + 1
    ours = engine.generate_greedy(res, max_new_tokens=n_new)
    np.testing.assert_array_equal(np.asarray(ours), hf_new)


def test_num4_importance_capture_matches_hf_attentions():
    """Per-layer importance (mean softmax mass of the last 4 query rows,
    head-averaged) vs HF eager attention probabilities — the Qwen2-VL capture
    (reference models/qwen2/modeling_qwen2_vl.py:289-301 with
    utils.py:27-57's manual softmax, num=4)."""
    model, cfg = make_hf_qwen2vl(num_layers=3)
    params = params_from_state_dict(model.state_dict(), cfg, prefix="model.language_model.")

    rng = np.random.default_rng(2)
    grid_t, grid_h, grid_w, video_start, n_tail = 2, 4, 4, 4, 5
    n_video = grid_t * (grid_h // 2) * (grid_w // 2)
    ids = video_prompt_ids(rng, video_start, n_video, n_tail)
    grid = torch.tensor([[grid_t, grid_h, grid_w]])

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids[None]), video_grid_thw=grid,
            output_attentions=True,
        )

    pos3 = mrope_position_ids(len(ids), video_start, grid_t, grid_h, grid_w)
    cos, sin = qwen2.positions_cos_sin(jnp.asarray(pos3, jnp.int32), cfg)
    h = qwen2.embed(params, jnp.asarray(ids), cfg)
    for l in range(cfg.num_layers):
        lp = qwen2.layer_slice(params["layers"], l)
        h, _, _, importance = qwen2.layer_attention(
            lp, h, cos, sin, cfg, attn_impl="einsum", capture_num=4,
            valid_len=jnp.int32(len(ids)),
        )
        h = qwen2.layer_mlp(lp, h, cfg)
        hf_probs = out.attentions[l][0].numpy()  # (H, S, S)
        want = hf_probs[:, -4:, :].mean(axis=(0, 1))
        np.testing.assert_allclose(np.asarray(importance), want, rtol=1e-4, atol=1e-5,
                                   err_msg=f"layer {l}")
