"""Per-family checkpoint fixtures in the REAL HF hub file layout.

Synthesizes tiny random checkpoints — config.json + bf16 sharded
safetensors + model.safetensors.index.json — with each family's actual
parameter naming (the layouts the reference's example scripts download from
the hub, README.md:183-209):

  * llava_video        — LlavaQwenForCausalLM: ``model.layers.*`` + siglip
                         tower under ``model.vision_tower.vision_tower.
                         vision_model.*`` + ``model.mm_projector.{0,2}``.
  * llava_next_video   — ``language_model.model.layers.*`` (tied embeddings
                         to exercise that path).
  * minicpmv / nvila   — ``llm.model.layers.*`` + ``llm.lm_head``.
  * qwen2_vl           — ``model.layers.*`` + ``visual.*`` tower +
                         ``rope_scaling.mrope_section`` in config.json.
  * internvl           — InternLM2 fused ``wqkv`` under
                         ``language_model.model.*`` + remote-layout InternViT
                         under ``vision_model.*`` + ``mlp1.*`` projector.
"""

from __future__ import annotations

import json

import numpy as np


TINY_TEXT = dict(
    vocab_size=128, hidden_size=64, intermediate_size=96,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0, rms_norm_eps=1e-6,
)


def _qwen2_layer_names(i, prefix, qkv_bias=True):
    base = f"{prefix}layers.{i}."
    names = [
        (base + "input_layernorm.weight", ("d",)),
        (base + "post_attention_layernorm.weight", ("d",)),
        (base + "self_attn.q_proj.weight", ("qd", "d")),
        (base + "self_attn.k_proj.weight", ("kd", "d")),
        (base + "self_attn.v_proj.weight", ("kd", "d")),
        (base + "self_attn.o_proj.weight", ("d", "qd")),
        (base + "mlp.gate_proj.weight", ("i", "d")),
        (base + "mlp.up_proj.weight", ("i", "d")),
        (base + "mlp.down_proj.weight", ("d", "i")),
    ]
    if qkv_bias:
        names += [
            (base + "self_attn.q_proj.bias", ("qd",)),
            (base + "self_attn.k_proj.bias", ("kd",)),
            (base + "self_attn.v_proj.bias", ("kd",)),
        ]
    return names


def _qwen2_state(rng, prefix, tie=False, scale=0.05):
    d = TINY_TEXT["hidden_size"]
    dims = {
        "d": d, "i": TINY_TEXT["intermediate_size"],
        "qd": d,  # heads*hd == hidden for this geometry
        "kd": TINY_TEXT["num_key_value_heads"] * (d // TINY_TEXT["num_attention_heads"]),
        "v": TINY_TEXT["vocab_size"],
    }
    sd = {}
    for i in range(TINY_TEXT["num_hidden_layers"]):
        for name, shape in _qwen2_layer_names(i, prefix):
            dims_t = tuple(dims[s] for s in shape)
            if name.endswith("layernorm.weight"):
                sd[name] = np.ones(dims_t, np.float32)
            else:
                sd[name] = rng.standard_normal(dims_t).astype(np.float32) * scale
    sd[prefix + "embed_tokens.weight"] = rng.standard_normal((dims["v"], d)).astype(np.float32) * scale
    sd[prefix + "norm.weight"] = np.ones((d,), np.float32)
    if not tie:
        head_prefix = prefix[: -len("model.")] if prefix.endswith("model.") else ""
        sd[head_prefix + "lm_head.weight"] = rng.standard_normal((dims["v"], d)).astype(np.float32) * scale
    return sd


def _siglip_state(rng, prefix, scale=0.05):
    """Tiny SigLIP tower (image 28, patch 7, D 64, 2 layers, 4 heads)."""
    d, i, n_l, n_p = 64, 128, 2, 16
    sd = {
        prefix + "embeddings.patch_embedding.weight": rng.standard_normal((d, 3, 7, 7)).astype(np.float32) * scale,
        prefix + "embeddings.patch_embedding.bias": np.zeros((d,), np.float32),
        prefix + "embeddings.position_embedding.weight": rng.standard_normal((n_p, d)).astype(np.float32) * scale,
        prefix + "post_layernorm.weight": np.ones((d,), np.float32),
        prefix + "post_layernorm.bias": np.zeros((d,), np.float32),
    }
    for l in range(n_l):
        base = f"{prefix}encoder.layers.{l}."
        for ln in ("layer_norm1", "layer_norm2"):
            sd[base + ln + ".weight"] = np.ones((d,), np.float32)
            sd[base + ln + ".bias"] = np.zeros((d,), np.float32)
        for p, shape in [("q_proj", (d, d)), ("k_proj", (d, d)), ("v_proj", (d, d)), ("out_proj", (d, d))]:
            sd[base + f"self_attn.{p}.weight"] = rng.standard_normal(shape).astype(np.float32) * scale
            sd[base + f"self_attn.{p}.bias"] = np.zeros((shape[0],), np.float32)
        sd[base + "mlp.fc1.weight"] = rng.standard_normal((i, d)).astype(np.float32) * scale
        sd[base + "mlp.fc1.bias"] = np.zeros((i,), np.float32)
        sd[base + "mlp.fc2.weight"] = rng.standard_normal((d, i)).astype(np.float32) * scale
        sd[base + "mlp.fc2.bias"] = np.zeros((d,), np.float32)
    return sd


SIGLIP_VISION_CONFIG = dict(image_size=28, patch_size=7, hidden_size=64,
                            intermediate_size=128, num_hidden_layers=2,
                            num_attention_heads=16)  # heads unused by import


def _qwen2vl_visual_state(rng, prefix="visual.", scale=0.05):
    """Tiny Qwen2-VL tower matching tiny_qwen2vl_vit_config (embed 64,
    depth 2, heads 4, patch 7, merge 2, mlp_ratio 2, out 64)."""
    d, mlp, depth, out = 64, 128, 2, TINY_TEXT["hidden_size"]
    patch_dim = 3 * 2 * 7 * 7
    sd = {prefix + "patch_embed.proj.weight": rng.standard_normal((d, 3, 2, 7, 7)).astype(np.float32) * scale}
    for l in range(depth):
        base = f"{prefix}blocks.{l}."
        for ln in ("norm1", "norm2"):
            sd[base + ln + ".weight"] = np.ones((d,), np.float32)
            sd[base + ln + ".bias"] = np.zeros((d,), np.float32)
        sd[base + "attn.qkv.weight"] = rng.standard_normal((3 * d, d)).astype(np.float32) * scale
        sd[base + "attn.qkv.bias"] = np.zeros((3 * d,), np.float32)
        sd[base + "attn.proj.weight"] = rng.standard_normal((d, d)).astype(np.float32) * scale
        sd[base + "attn.proj.bias"] = np.zeros((d,), np.float32)
        sd[base + "mlp.fc1.weight"] = rng.standard_normal((mlp, d)).astype(np.float32) * scale
        sd[base + "mlp.fc1.bias"] = np.zeros((mlp,), np.float32)
        sd[base + "mlp.fc2.weight"] = rng.standard_normal((d, mlp)).astype(np.float32) * scale
        sd[base + "mlp.fc2.bias"] = np.zeros((d,), np.float32)
    sd[prefix + "merger.ln_q.weight"] = np.ones((d,), np.float32)
    sd[prefix + "merger.ln_q.bias"] = np.zeros((d,), np.float32)
    sd[prefix + "merger.mlp.0.weight"] = rng.standard_normal((4 * d, 4 * d)).astype(np.float32) * scale
    sd[prefix + "merger.mlp.0.bias"] = np.zeros((4 * d,), np.float32)
    sd[prefix + "merger.mlp.2.weight"] = rng.standard_normal((out, 4 * d)).astype(np.float32) * scale
    sd[prefix + "merger.mlp.2.bias"] = np.zeros((out,), np.float32)
    del patch_dim
    return sd


QWEN2VL_VISION_CONFIG = dict(embed_dim=64, depth=2, num_heads=4, patch_size=7,
                             temporal_patch_size=2, spatial_merge_size=2,
                             mlp_ratio=2, hidden_size=TINY_TEXT["hidden_size"])


def _qwen25vl_visual_state(rng, prefix="visual.", scale=0.05):
    """Tiny Qwen2.5-VL tower (RMSNorm, SwiGLU with biases, window attn)."""
    d, i, depth, out = 64, 96, 3, TINY_TEXT["hidden_size"]
    sd = {prefix + "patch_embed.proj.weight": rng.standard_normal((d, 3, 2, 7, 7)).astype(np.float32) * scale}
    for l in range(depth):
        base = f"{prefix}blocks.{l}."
        sd[base + "norm1.weight"] = np.ones((d,), np.float32)
        sd[base + "norm2.weight"] = np.ones((d,), np.float32)
        sd[base + "attn.qkv.weight"] = rng.standard_normal((3 * d, d)).astype(np.float32) * scale
        sd[base + "attn.qkv.bias"] = np.zeros((3 * d,), np.float32)
        sd[base + "attn.proj.weight"] = rng.standard_normal((d, d)).astype(np.float32) * scale
        sd[base + "attn.proj.bias"] = np.zeros((d,), np.float32)
        for p, shape in [("gate_proj", (i, d)), ("up_proj", (i, d)), ("down_proj", (d, i))]:
            sd[base + f"mlp.{p}.weight"] = rng.standard_normal(shape).astype(np.float32) * scale
            sd[base + f"mlp.{p}.bias"] = np.zeros((shape[0],), np.float32)
    sd[prefix + "merger.ln_q.weight"] = np.ones((d,), np.float32)
    sd[prefix + "merger.mlp.0.weight"] = rng.standard_normal((4 * d, 4 * d)).astype(np.float32) * scale
    sd[prefix + "merger.mlp.0.bias"] = np.zeros((4 * d,), np.float32)
    sd[prefix + "merger.mlp.2.weight"] = rng.standard_normal((out, 4 * d)).astype(np.float32) * scale
    sd[prefix + "merger.mlp.2.bias"] = np.zeros((out,), np.float32)
    return sd


QWEN25VL_VISION_CONFIG = dict(hidden_size=64, depth=3, num_heads=4,
                              intermediate_size=96, patch_size=7,
                              temporal_patch_size=2, spatial_merge_size=2,
                              window_size=28, fullatt_block_indexes=[1],
                              out_hidden_size=TINY_TEXT["hidden_size"],
                              tokens_per_second=4)


def _internvit_remote_state(rng, prefix="vision_model.", scale=0.05):
    """Tiny remote-layout InternViT (image 28, patch 7, D 64, 2 layers)."""
    d, i, n_l, n_p = 64, 128, 2, 16
    sd = {
        prefix + "embeddings.class_embedding": np.zeros((1, 1, d), np.float32),
        prefix + "embeddings.patch_embedding.weight": rng.standard_normal((d, 3, 7, 7)).astype(np.float32) * scale,
        prefix + "embeddings.patch_embedding.bias": np.zeros((d,), np.float32),
        prefix + "embeddings.position_embedding": rng.standard_normal((1, n_p + 1, d)).astype(np.float32) * scale,
    }
    for l in range(n_l):
        base = f"{prefix}encoder.layers.{l}."
        for ln in ("norm1", "norm2"):
            sd[base + ln + ".weight"] = np.ones((d,), np.float32)
            sd[base + ln + ".bias"] = np.zeros((d,), np.float32)
        sd[base + "attn.qkv.weight"] = rng.standard_normal((3 * d, d)).astype(np.float32) * scale
        sd[base + "attn.qkv.bias"] = np.zeros((3 * d,), np.float32)
        sd[base + "attn.proj.weight"] = rng.standard_normal((d, d)).astype(np.float32) * scale
        sd[base + "attn.proj.bias"] = np.zeros((d,), np.float32)
        sd[base + "ls1"] = np.full((d,), 0.1, np.float32)
        sd[base + "ls2"] = np.full((d,), 0.1, np.float32)
        sd[base + "mlp.fc1.weight"] = rng.standard_normal((i, d)).astype(np.float32) * scale
        sd[base + "mlp.fc1.bias"] = np.zeros((i,), np.float32)
        sd[base + "mlp.fc2.weight"] = rng.standard_normal((d, i)).astype(np.float32) * scale
        sd[base + "mlp.fc2.bias"] = np.zeros((d,), np.float32)
    t = TINY_TEXT["hidden_size"]
    sd["mlp1.0.weight"] = np.ones((4 * d,), np.float32)
    sd["mlp1.0.bias"] = np.zeros((4 * d,), np.float32)
    sd["mlp1.1.weight"] = rng.standard_normal((t, 4 * d)).astype(np.float32) * scale
    sd["mlp1.1.bias"] = np.zeros((t,), np.float32)
    sd["mlp1.3.weight"] = rng.standard_normal((t, t)).astype(np.float32) * scale
    sd["mlp1.3.bias"] = np.zeros((t,), np.float32)
    return sd


INTERNVIT_VISION_CONFIG = dict(image_size=28, patch_size=7, hidden_size=64,
                               intermediate_size=128, num_hidden_layers=2,
                               num_attention_heads=4, qkv_bias=True,
                               qk_normalization=False)


def _internlm2_state(rng, prefix="language_model.model.", scale=0.05):
    d = TINY_TEXT["hidden_size"]
    hd = d // TINY_TEXT["num_attention_heads"]
    hk = TINY_TEXT["num_key_value_heads"]
    g = TINY_TEXT["num_attention_heads"] // hk
    i = TINY_TEXT["intermediate_size"]
    v = TINY_TEXT["vocab_size"]
    sd = {}
    for l in range(TINY_TEXT["num_hidden_layers"]):
        base = f"{prefix}layers.{l}."
        sd[base + "attention.wqkv.weight"] = rng.standard_normal((hk * (g + 2) * hd, d)).astype(np.float32) * scale
        sd[base + "attention.wo.weight"] = rng.standard_normal((d, d)).astype(np.float32) * scale
        sd[base + "attention_norm.weight"] = np.ones((d,), np.float32)
        sd[base + "ffn_norm.weight"] = np.ones((d,), np.float32)
        sd[base + "feed_forward.w1.weight"] = rng.standard_normal((i, d)).astype(np.float32) * scale
        sd[base + "feed_forward.w3.weight"] = rng.standard_normal((i, d)).astype(np.float32) * scale
        sd[base + "feed_forward.w2.weight"] = rng.standard_normal((d, i)).astype(np.float32) * scale
    sd[prefix + "tok_embeddings.weight"] = rng.standard_normal((v, d)).astype(np.float32) * scale
    sd[prefix + "norm.weight"] = np.ones((d,), np.float32)
    sd["language_model.output.weight"] = rng.standard_normal((v, d)).astype(np.float32) * scale
    return sd


def _write_tokenizer(path):
    """Tiny character-level fast tokenizer in the hub layout (tokenizer.json +
    tokenizer_config.json) — loads offline via AutoTokenizer, ids < the
    fixtures' vocab_size, chat special tokens atomic."""
    from tokenizers import Regex, Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Split

    import string

    specials = ["<unk>", "<|im_start|>", "<|im_end|>", "<|endoftext|>",
                "<image>", "<|vision_start|>", "<|video_pad|>", "<|vision_end|>"]
    vocab = {s: i for i, s in enumerate(specials)}
    for ch in string.ascii_letters + string.digits + " .,?!:\n<>|_()-/":
        if ch not in vocab and len(vocab) < TINY_TEXT["vocab_size"] - 1:
            vocab[ch] = len(vocab)
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Split(Regex("."), behavior="isolated")
    tok.add_special_tokens(specials)
    tok.save(str(path / "tokenizer.json"))
    with open(path / "tokenizer_config.json", "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "eos_token": "<|im_end|>", "unk_token": "<unk>"}, f)


def _write_checkpoint(path, config: dict, state: dict, shards: int = 2):
    """bf16 sharded safetensors + index json + config.json — the hub layout."""
    import torch
    from safetensors.torch import save_file

    path.mkdir(parents=True, exist_ok=True)
    with open(path / "config.json", "w") as f:
        json.dump(config, f)
    try:
        _write_tokenizer(path)
    except ImportError:
        pass  # tokenizers not installed: checkpoint tests still run
    keys = sorted(state)
    per = -(-len(keys) // shards)
    weight_map = {}
    for si in range(shards):
        chunk = keys[si * per : (si + 1) * per]
        if not chunk:
            continue
        fname = f"model-{si + 1:05d}-of-{shards:05d}.safetensors"
        save_file(
            {k: torch.tensor(state[k]).to(torch.bfloat16) for k in chunk},
            str(path / fname),
        )
        weight_map.update({k: fname for k in chunk})
    with open(path / "model.safetensors.index.json", "w") as f:
        json.dump({"metadata": {}, "weight_map": weight_map}, f)
    return str(path)


def write_fixture(tmp_path, family: str) -> str:
    """Build one family's tiny hub-layout checkpoint; returns the dir."""
    rng = np.random.default_rng(hash(family) % 2 ** 31)
    if family == "llava_video":
        state = _qwen2_state(rng, "model.")
        state.update(_siglip_state(rng, "model.vision_tower.vision_tower.vision_model."))
        d = TINY_TEXT["hidden_size"]
        state["model.mm_projector.0.weight"] = rng.standard_normal((d, 64)).astype(np.float32) * 0.05
        state["model.mm_projector.0.bias"] = np.zeros((d,), np.float32)
        state["model.mm_projector.2.weight"] = rng.standard_normal((d, d)).astype(np.float32) * 0.05
        state["model.mm_projector.2.bias"] = np.zeros((d,), np.float32)
        state["model.image_newline"] = rng.standard_normal((d,)).astype(np.float32) * 0.05
        config = {"architectures": ["LlavaQwenForCausalLM"], **TINY_TEXT,
                  "tie_word_embeddings": False,
                  "vision_config": SIGLIP_VISION_CONFIG}
    elif family == "llava_next_video":
        state = _qwen2_state(rng, "language_model.model.", tie=True)
        config = {"architectures": ["LlavaNextVideoForConditionalGeneration"],
                  "text_config": {**TINY_TEXT, "tie_word_embeddings": True,
                                  "architectures": ["Qwen2ForCausalLM"]}}
    elif family == "minicpmv":
        state = _qwen2_state(rng, "llm.model.")
        state.update(_siglip_state(rng, "vpm."))
        d = TINY_TEXT["hidden_size"]
        # remote Resampler layout: fused MultiheadAttention in_proj + raw proj
        state["resampler.query"] = rng.standard_normal((8, d)).astype(np.float32) * 0.05
        state["resampler.kv_proj.weight"] = rng.standard_normal((d, 64)).astype(np.float32) * 0.05
        state["resampler.attn.in_proj_weight"] = rng.standard_normal((3 * d, d)).astype(np.float32) * 0.05
        state["resampler.attn.in_proj_bias"] = np.zeros((3 * d,), np.float32)
        state["resampler.attn.out_proj.weight"] = rng.standard_normal((d, d)).astype(np.float32) * 0.05
        state["resampler.attn.out_proj.bias"] = np.zeros((d,), np.float32)
        for ln in ("ln_q", "ln_kv", "ln_post"):
            state[f"resampler.{ln}.weight"] = np.ones((d,), np.float32)
            state[f"resampler.{ln}.bias"] = np.zeros((d,), np.float32)
        state["resampler.proj"] = rng.standard_normal((d, d)).astype(np.float32) * 0.05
        config = {"architectures": ["MiniCPMV"], **TINY_TEXT,
                  "tie_word_embeddings": False, "query_num": 8,
                  "vision_config": SIGLIP_VISION_CONFIG}
    elif family == "nvila":
        state = _qwen2_state(rng, "llm.model.")
        config = {"architectures": ["LlavaLlamaModel"], **TINY_TEXT,
                  "tie_word_embeddings": False}
    elif family == "qwen2_vl":
        state = _qwen2_state(rng, "model.")
        state.update(_qwen2vl_visual_state(rng))
        config = {"architectures": ["Qwen2VLForConditionalGeneration"], **TINY_TEXT,
                  "tie_word_embeddings": False,
                  "rope_scaling": {"type": "mrope", "mrope_section": [2, 3, 3]},
                  "vision_config": QWEN2VL_VISION_CONFIG}
    elif family == "qwen25_vl":
        state = _qwen2_state(rng, "model.")
        state.update(_qwen25vl_visual_state(rng))
        config = {"architectures": ["Qwen2_5_VLForConditionalGeneration"], **TINY_TEXT,
                  "tie_word_embeddings": False,
                  "rope_scaling": {"type": "mrope", "mrope_section": [2, 3, 3]},
                  "vision_config": QWEN25VL_VISION_CONFIG}
    elif family == "internvl":
        state = _internlm2_state(rng)
        state.update(_internvit_remote_state(rng))
        config = {"architectures": ["InternVLChatModel"],
                  "llm_config": {**TINY_TEXT, "bias": False,
                                 "architectures": ["InternLM2ForCausalLM"],
                                 "tie_word_embeddings": False},
                  "vision_config": INTERNVIT_VISION_CONFIG,
                  "downsample_ratio": 0.5}
    else:
        raise ValueError(family)
    return _write_checkpoint(tmp_path / family, config, state)
