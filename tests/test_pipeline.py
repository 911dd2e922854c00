"""Text-level pipeline test with a stub tokenizer (no network)."""

import numpy as np
import pytest

import jax

from framefusion_tpu.config import tiny_llm_config
from framefusion_tpu.interface import FrameFusionModel, apply_framefusion
from framefusion_tpu.models import qwen2
from framefusion_tpu.models.vision import siglip
from framefusion_tpu.models.vision.llava_frontend import init_projector
from framefusion_tpu.pipeline import TextPipeline


class StubTokenizer:
    eos_token_id = 7

    def encode(self, text):
        return [ord(c) % 101 for c in text][:40]

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


def test_ask_end_to_end():
    cfg = tiny_llm_config(num_layers=4)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    vit_cfg = siglip.tiny_vit_config()
    vit = siglip.init_params(vit_cfg, jax.random.PRNGKey(1))
    proj = init_projector(jax.random.PRNGKey(2), vit_cfg.hidden_size, cfg.hidden_size)

    model = FrameFusionModel(family="llava_video", cfg=cfg, params=params, attn_impl="einsum")
    model = apply_framefusion(model, 0.5, 0.8, 0.05)
    model.ff = model.ff.replace(schedule_num_layers=cfg.num_layers)

    pipe = TextPipeline(model=model, tokenizer=StubTokenizer(),
                        vit_params=vit, vit_cfg=vit_cfg, projector=proj)
    rng = np.random.default_rng(0)
    base = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)
    frames = np.concatenate([base + 0.01 * rng.standard_normal(base.shape) for _ in range(6)]).astype(np.float32)

    answer = pipe.ask("What happens in the video?", frames=frames, max_new_tokens=6)
    assert isinstance(answer, str) and len(answer) > 0
    assert pipe.last_result.telemetry is not None
    assert pipe.last_result.telemetry.vision_token_reduction > 0


def test_ask_raw_uint8_frames():
    """uint8 frames of an arbitrary camera size ride the in-repo
    preprocessing (resize to the tower's image_size + family normalize,
    preprocess.py) — no HF processor needed."""
    cfg = tiny_llm_config(num_layers=4)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    vit_cfg = siglip.tiny_vit_config()
    vit = siglip.init_params(vit_cfg, jax.random.PRNGKey(1))
    proj = init_projector(jax.random.PRNGKey(2), vit_cfg.hidden_size, cfg.hidden_size)
    model = FrameFusionModel(family="llava_video", cfg=cfg, params=params, attn_impl="einsum")
    model = apply_framefusion(model, 0.5, 0.8, 0.05)
    model.ff = model.ff.replace(schedule_num_layers=cfg.num_layers)
    pipe = TextPipeline(model=model, tokenizer=StubTokenizer(),
                        vit_params=vit, vit_cfg=vit_cfg, projector=proj)
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (6, 45, 61, 3)).astype(np.uint8)  # camera-sized
    answer = pipe.ask("What happens?", frames=frames, max_new_tokens=4)
    assert isinstance(answer, str) and len(answer) > 0
    # the explicit-preprocess path must agree exactly
    from framefusion_tpu import preprocess as pp

    pre = pp.preprocess_frames(frames, "llava_video",
                               target=(vit_cfg.image_size, vit_cfg.image_size))
    answer2 = pipe.ask("What happens?", frames=pre, max_new_tokens=4)
    assert answer2 == answer


def test_ask_speculative_matches_plain():
    """ask(speculative=True) auto-seeds the lookup history from the prompt's
    text ids (last_prompt_ids, placeholders dropped) and returns the same
    text as the plain greedy path."""
    cfg = tiny_llm_config(num_layers=2)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(3))
    model = FrameFusionModel(family="llava_video", cfg=cfg, params=params, attn_impl="einsum")
    vit_cfg = siglip.tiny_vit_config()
    pipe = TextPipeline(model=model, tokenizer=StubTokenizer(), vit_cfg=vit_cfg)
    rng = np.random.default_rng(2)
    feats = (rng.standard_normal((6 * 3, cfg.hidden_size)) * 0.05).astype(np.float32)
    plain = pipe.ask("What is shown?", video_features=feats, max_new_tokens=8)
    ids = pipe.last_prompt_ids
    # Placeholders are excluded by POSITION (PLACEHOLDER_ID sentinel), not by
    # value — a tokenizer may legitimately emit id 0 (StubTokenizer maps 'e'
    # there), and those stay in the lookup history.
    assert ids and all(0 <= i < cfg.vocab_size for i in ids)
    # exactly the text ids: the one placeholder row is dropped by position
    from framefusion_tpu.pipeline import DEFAULT_TEMPLATE

    prompt = DEFAULT_TEMPLATE.format(question="What is shown?")
    before, _, after = prompt.partition("<image>")
    want = list(pipe.tokenizer.encode(before)) + list(pipe.tokenizer.encode(after))
    assert ids == want
    spec = pipe.ask("What is shown?", video_features=feats, max_new_tokens=8,
                    speculative=True)
    assert spec == plain


def test_precomputed_features_path():
    cfg = tiny_llm_config(num_layers=2)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(3))
    model = FrameFusionModel(family="llava_video", cfg=cfg, params=params, attn_impl="einsum")
    vit_cfg = siglip.tiny_vit_config()  # 4 patches/side -> patch_num 6
    pipe = TextPipeline(model=model, tokenizer=StubTokenizer(), vit_cfg=vit_cfg)
    rng = np.random.default_rng(1)
    feats = (rng.standard_normal((6 * 3, cfg.hidden_size)) * 0.05).astype(np.float32)
    answer = pipe.ask("Q?", video_features=feats, max_new_tokens=4)
    assert isinstance(answer, str)


def test_qwen2_vl_pipeline_mrope():
    """Qwen2-VL tokenizer-level path: <|video_pad|> splice + 3D mRoPE ids
    (reference example_qwen2vl.py:49-54 processor path)."""
    from framefusion_tpu.config import tiny_llm_config

    cfg = tiny_llm_config(num_layers=3).replace(mrope_section=(4, 6, 6))
    params = qwen2.init_params(cfg, jax.random.PRNGKey(5))
    model = FrameFusionModel(family="qwen2_vl", cfg=cfg, params=params, attn_impl="einsum")
    model = apply_framefusion(model, 0.5, 0.8, 0.05)
    model.ff = model.ff.replace(schedule_num_layers=cfg.num_layers)

    pipe = TextPipeline(model=model, tokenizer=StubTokenizer())
    rng = np.random.default_rng(2)
    grid_t, grid_h, grid_w, merge = 4, 4, 4, 2
    patch_num = (grid_h * grid_w) // (merge * merge)
    frame = rng.standard_normal((patch_num, cfg.hidden_size)).astype(np.float32) * 0.05
    feats = np.concatenate(
        [frame + 0.01 * rng.standard_normal(frame.shape) for _ in range(grid_t)]
    ).astype(np.float32)

    inputs = pipe.build_inputs("What is shown?", video_features=feats,
                               video_grid_thw=(grid_t, grid_h, grid_w))
    assert inputs.position_ids.shape[0] == 3  # 3D mRoPE
    assert inputs.num_importance_queries == 4  # Qwen2-VL captures 4 rows
    answer = pipe.ask("What is shown?", video_features=feats,
                      video_grid_thw=(grid_t, grid_h, grid_w), max_new_tokens=4)
    assert isinstance(answer, str) and len(answer) > 0
    assert pipe.last_result.pos_dims == 3
    assert pipe.last_result.telemetry.vision_token_reduction > 0


def test_internvl_pipeline_interleaved():
    """InternVL tokenizer-level path: FrameN: <image> prefix, per-frame
    splicing, span-includes-text quirk (reference example_internvl.py:139-141)."""
    from framefusion_tpu.config import tiny_llm_config
    from framefusion_tpu.core.constants import TEXT_TOKEN

    cfg = tiny_llm_config(num_layers=3, qkv_bias=False)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(6))
    model = FrameFusionModel(family="internvl", cfg=cfg, params=params, attn_impl="einsum")
    model = apply_framefusion(model, 0.5, 0.8, 0.05)
    model.ff = model.ff.replace(schedule_num_layers=cfg.num_layers)

    pipe = TextPipeline(model=model, tokenizer=StubTokenizer())
    rng = np.random.default_rng(3)
    n_frames, tpf = 6, 8
    frame = rng.standard_normal((tpf, cfg.hidden_size)).astype(np.float32) * 0.05
    feats = np.stack([frame + 0.01 * rng.standard_normal(frame.shape) for _ in range(n_frames)])

    inputs = pipe.build_inputs("Describe the video", video_features=feats)
    pt = inputs.patch_type
    # Interleaved: text between frame blocks stays TEXT inside the image span.
    span = pt[inputs.image_token_start : inputs.image_token_start + inputs.image_token_length]
    assert (span == TEXT_TOKEN).any(), "interleaved text must sit inside the span (reference quirk)"
    assert (pt != TEXT_TOKEN).sum() == n_frames * tpf
    answer = pipe.ask("Describe the video", video_features=feats, max_new_tokens=4)
    assert isinstance(answer, str) and len(answer) > 0
    assert pipe.last_result.telemetry.vision_token_reduction > 0


def _hf_chat_tokenizer(tmp_path):
    """Tiny real HF fast tokenizer with a tokenizer_config.json-driven
    chat_template (saved + reloaded via AutoTokenizer, like a hub repo)."""
    transformers = pytest.importorskip("transformers")
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import AutoTokenizer, PreTrainedTokenizerFast

    vocab = {"<unk>": 0}
    for i, w in enumerate(
        "what is shown describe the video frame assistant user system n".split(), 1
    ):
        vocab[w] = i
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>")
    fast.add_special_tokens({"additional_special_tokens": [
        "<|im_start|>", "<|im_end|>", "<|vision_start|>", "<|video_pad|>",
        "<|vision_end|>", "<image>",
    ]})
    fast.chat_template = (
        "{% for message in messages %}<|im_start|>{{ message['role'] }}\n"
        "{{ message['content'] }}<|im_end|>\n{% endfor %}"
        "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}"
    )
    d = tmp_path / "tok"
    fast.save_pretrained(str(d))
    return AutoTokenizer.from_pretrained(str(d))


def test_chat_template_from_tokenizer_config(tmp_path):
    """qwen2_vl + internvl prompts render through the tokenizer's OWN
    chat_template (tokenizer_config.json) when one exists — the reference's
    processor.apply_chat_template path (example_qwen2vl.py:49-54) — and the
    pipeline still splices media and generates."""
    from framefusion_tpu.config import tiny_llm_config

    tok = _hf_chat_tokenizer(tmp_path)
    assert tok.chat_template  # survived the save/reload round trip

    # model vocab == tokenizer vocab so every generated id decodes
    cfg = tiny_llm_config(num_layers=3, vocab_size=len(tok)).replace(mrope_section=(4, 6, 6))
    params = qwen2.init_params(cfg, jax.random.PRNGKey(5))
    model = apply_framefusion(
        FrameFusionModel(family="qwen2_vl", cfg=cfg, params=params, attn_impl="einsum"),
        0.5, 0.8, 0.05,
    )
    model.ff = model.ff.replace(schedule_num_layers=cfg.num_layers)
    pipe = TextPipeline(model=model, tokenizer=tok)

    media = "<|vision_start|><|video_pad|><|vision_end|>"
    rendered = pipe._render_prompt(media, "what is shown", "STATIC")
    assert rendered != "STATIC"
    assert rendered == tok.apply_chat_template(
        [{"role": "user", "content": media + "what is shown"}],
        tokenize=False, add_generation_prompt=True,
    )
    assert rendered.endswith("<|im_start|>assistant\n") and media in rendered

    rng = np.random.default_rng(2)
    grid_t, grid_h, grid_w = 4, 4, 4
    frame = rng.standard_normal((4, cfg.hidden_size)).astype(np.float32) * 0.05
    feats = np.concatenate(
        [frame + 0.01 * rng.standard_normal(frame.shape) for _ in range(grid_t)]
    ).astype(np.float32)
    answer = pipe.ask("what is shown", video_features=feats,
                      video_grid_thw=(grid_t, grid_h, grid_w), max_new_tokens=3)
    assert isinstance(answer, str) and len(answer) > 0

    # internvl through the same tokenizer-config template
    cfg2 = tiny_llm_config(num_layers=3, qkv_bias=False, vocab_size=len(tok))
    params2 = qwen2.init_params(cfg2, jax.random.PRNGKey(6))
    model2 = apply_framefusion(
        FrameFusionModel(family="internvl", cfg=cfg2, params=params2, attn_impl="einsum"),
        0.5, 0.8, 0.05,
    )
    model2.ff = model2.ff.replace(schedule_num_layers=cfg2.num_layers)
    pipe2 = TextPipeline(model=model2, tokenizer=tok)
    frame = rng.standard_normal((6, cfg2.hidden_size)).astype(np.float32) * 0.05
    feats2 = np.stack([frame + 0.01 * rng.standard_normal(frame.shape) for _ in range(4)])
    answer2 = pipe2.ask("describe the video", video_features=feats2, max_new_tokens=3)
    assert isinstance(answer2, str) and len(answer2) > 0

    # explicit chat_template=... still overrides the tokenizer's
    pipe3 = TextPipeline(model=model, tokenizer=tok,
                         chat_template="Q: <|video_pad|>{question}\nA:")
    assert pipe3._render_prompt("x", "q", "FALLBACK") == "FALLBACK"
