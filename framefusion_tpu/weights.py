"""Weight import: HuggingFace checkpoints -> framefusion_tpu pytrees.

The reference loads models through HF hub loaders
(/root/reference/script/playground/example_llava.py:94-101); the TPU build's
equivalent is a safetensors -> JAX pytree importer with stacked layer layout
(SURVEY.md §5 "Checkpoint / resume"). Linear weights transpose from HF's
(out, in) to (in, out) so the forward is plain ``x @ w``.

Two entry points:
  * ``params_from_state_dict`` — any mapping name -> numpy/torch tensor
    (used by tests to round-trip tiny HF models built in-process).
  * ``load_safetensors`` — stream *.safetensors shards from a checkpoint dir.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np
import jax.numpy as jnp

from .config import LLMConfig

_QWEN2_LAYER_KEYS = {
    "input_layernorm.weight": ("ln1", False),
    "post_attention_layernorm.weight": ("ln2", False),
    "self_attn.q_proj.weight": ("wq", True),
    "self_attn.k_proj.weight": ("wk", True),
    "self_attn.v_proj.weight": ("wv", True),
    "self_attn.o_proj.weight": ("wo", True),
    "self_attn.q_proj.bias": ("bq", False),
    "self_attn.k_proj.bias": ("bk", False),
    "self_attn.v_proj.bias": ("bv", False),
    "mlp.gate_proj.weight": ("w_gate", True),
    "mlp.up_proj.weight": ("w_up", True),
    "mlp.down_proj.weight": ("w_down", True),
}


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (possibly bf16) without importing torch at module scope
    if hasattr(t, "detach"):
        t = t.detach()
        if str(t.dtype) == "torch.bfloat16":
            t = t.float()
        return t.cpu().numpy()
    return np.asarray(t)


def params_from_state_dict(state_dict, cfg: LLMConfig, prefix: str = "model.") -> dict:
    """Build the stacked-parameter pytree from an HF Qwen2-style state dict.

    Args:
        state_dict: mapping of HF parameter names to tensors.
        prefix: path of the language model inside the checkpoint, e.g.
            ``"model."`` (Qwen2ForCausalLM), ``"language_model.model."``
            (InternVL), ``"llm.model."`` (MiniCPM-V / NVILA).
    """
    sd = {k: v for k, v in state_dict.items()}
    layer_re = re.compile(re.escape(prefix) + r"layers\.(\d+)\.(.+)")

    per_layer: dict[str, dict[int, np.ndarray]] = {}
    for name, tensor in sd.items():
        m = layer_re.match(name)
        if not m:
            continue
        idx, sub = int(m.group(1)), m.group(2)
        if sub not in _QWEN2_LAYER_KEYS:
            continue
        ours, transpose = _QWEN2_LAYER_KEYS[sub]
        arr = _to_numpy(tensor)
        per_layer.setdefault(ours, {})[idx] = arr.T if transpose else arr

    layers = {}
    for ours, by_idx in per_layer.items():
        assert len(by_idx) == cfg.num_layers, f"{ours}: got {len(by_idx)} layers, want {cfg.num_layers}"
        layers[ours] = jnp.asarray(
            np.stack([by_idx[i] for i in range(cfg.num_layers)]), dtype=cfg.dtype
        )

    params = {
        "embed": jnp.asarray(_to_numpy(sd[prefix + "embed_tokens.weight"]), dtype=cfg.dtype),
        "layers": layers,
        "final_norm": jnp.asarray(_to_numpy(sd[prefix + "norm.weight"]), dtype=cfg.dtype),
    }
    lm_head_key = "lm_head.weight"
    if not cfg.tie_word_embeddings:
        # lm_head lives at top level regardless of the LM prefix.
        candidates = [k for k in sd if k.endswith(lm_head_key)]
        assert candidates, "untied config but no lm_head in checkpoint"
        params["lm_head"] = jnp.asarray(_to_numpy(sd[candidates[0]]).T, dtype=cfg.dtype)
    return params


def params_from_state_dict_internlm2(state_dict, cfg: LLMConfig, prefix: str = "language_model.model.") -> dict:
    """InternLM2 (InternVL2.5 backbone) checkpoint -> pytree.

    InternLM2 stores attention as one fused ``wqkv`` with per-KV-group
    interleaving — each group is [g query heads, 1 key head, 1 value head]
    (the reference unpacks it with einops at
    models/internvl/modeling_internlm2.py:309-321). MLP names are
    w1/w3/w2 = gate/up/down; norms are attention_norm/ffn_norm; no qkv bias.
    """
    assert not cfg.qkv_bias, "InternLM2 has no qkv bias"
    sd = dict(state_dict)
    hd = cfg.head_dim_
    g = cfg.num_heads // cfg.num_kv_heads

    wq, wk, wv, rest = [], [], [], {}
    for i in range(cfg.num_layers):
        fused = _to_numpy(sd[f"{prefix}layers.{i}.attention.wqkv.weight"])  # (Hkv*(g+2)*hd, D)
        grouped = fused.reshape(cfg.num_kv_heads, g + 2, hd, cfg.hidden_size)
        q = grouped[:, :g].reshape(cfg.num_heads * hd, cfg.hidden_size)
        k = grouped[:, g].reshape(cfg.num_kv_heads * hd, cfg.hidden_size)
        v = grouped[:, g + 1].reshape(cfg.num_kv_heads * hd, cfg.hidden_size)
        wq.append(q.T)
        wk.append(k.T)
        wv.append(v.T)
        for ours, name, transpose in (
            ("ln1", "attention_norm.weight", False),
            ("ln2", "ffn_norm.weight", False),
            ("wo", "attention.wo.weight", True),
            ("w_gate", "feed_forward.w1.weight", True),
            ("w_up", "feed_forward.w3.weight", True),
            ("w_down", "feed_forward.w2.weight", True),
        ):
            arr = _to_numpy(sd[f"{prefix}layers.{i}.{name}"])
            rest.setdefault(ours, []).append(arr.T if transpose else arr)

    layers = {ours: jnp.asarray(np.stack(v), dtype=cfg.dtype) for ours, v in rest.items()}
    layers["wq"] = jnp.asarray(np.stack(wq), dtype=cfg.dtype)
    layers["wk"] = jnp.asarray(np.stack(wk), dtype=cfg.dtype)
    layers["wv"] = jnp.asarray(np.stack(wv), dtype=cfg.dtype)

    params = {
        "embed": jnp.asarray(_to_numpy(sd[prefix + "tok_embeddings.weight"]), dtype=cfg.dtype),
        "layers": layers,
        "final_norm": jnp.asarray(_to_numpy(sd[prefix + "norm.weight"]), dtype=cfg.dtype),
    }
    if not cfg.tie_word_embeddings:
        head_candidates = [k for k in sd if k.endswith("output.weight") or k.endswith("lm_head.weight")]
        assert head_candidates, "no output head in checkpoint"
        params["lm_head"] = jnp.asarray(_to_numpy(sd[head_candidates[0]]).T, dtype=cfg.dtype)
    return params


def load_safetensors(checkpoint_dir: str, cfg: LLMConfig, prefix: str = "model.") -> dict:
    """Load a (possibly sharded) safetensors checkpoint directory."""
    from safetensors import safe_open  # lazy: optional dependency

    index_path = os.path.join(checkpoint_dir, "model.safetensors.index.json")
    state = {}
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        shards = sorted(set(index["weight_map"].values()))
    else:
        shards = sorted(f for f in os.listdir(checkpoint_dir) if f.endswith(".safetensors"))
    for shard in shards:
        with safe_open(os.path.join(checkpoint_dir, shard), framework="np") as f:
            for name in f.keys():
                state[name] = f.get_tensor(name)
    return params_from_state_dict(state, cfg, prefix=prefix)
