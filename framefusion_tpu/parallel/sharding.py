"""Device mesh + parameter/activation shardings.

The reference has no in-repo parallelism: it delegates layer placement to HF
accelerate hooks and data parallelism to `accelerate launch`
(SURVEY.md §2 "Parallelism strategies", reference interface.py:204-207).
The TPU-native equivalent is single-program XLA: a ``jax.sharding.Mesh``
over ICI with ``NamedSharding`` annotations; GSPMD inserts the collectives.

Axes:
  * ``data``   — batch / data parallel (and FSDP-style optimizer sharding).
  * ``tensor`` — megatron-style tensor parallel: attention heads and the MLP
    inner dimension. KV heads bound the useful tensor size for GQA models
    (Qwen2-7B: 4).

The reference's accelerate device_map (layer placement across GPUs) maps to
``parallel.pipeline``: a real GPipe schedule over a ``stage`` mesh axis,
composable with the axes here. For 7B-class models TP over ICI dominates;
the pipeline axis exists for depth-heavy stretch configs.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import LLMConfig


def make_mesh(devices=None, tensor: int | None = None) -> Mesh:
    """Build a (data, tensor) mesh over the given devices."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if tensor is None:
        tensor = min(4, n)
        while n % tensor:
            tensor //= 2
    assert n % tensor == 0, f"{n} devices not divisible by tensor={tensor}"
    arr = np.asarray(devices).reshape(n // tensor, tensor)
    return Mesh(arr, ("data", "tensor"))


def param_pspecs(cfg: LLMConfig) -> dict:
    """PartitionSpecs matching the ``models.qwen2.init_params`` pytree.

    Attention heads and the MLP inner dimension shard over ``tensor``;
    embeddings shard over the vocab. The layer-stack axis is replicated
    (scanned over, never communicated).
    """
    layers = {
        "ln1": P(None, None),
        "ln2": P(None, None),
        "wq": P(None, None, "tensor"),
        "wk": P(None, None, "tensor"),
        "wv": P(None, None, "tensor"),
        "bq": P(None, "tensor"),
        "bk": P(None, "tensor"),
        "bv": P(None, "tensor"),
        "wo": P(None, "tensor", None),
        "w_gate": P(None, None, "tensor"),
        "w_up": P(None, None, "tensor"),
        "w_down": P(None, "tensor", None),
    }
    specs = {
        "embed": P("tensor", None),
        "layers": layers,
        "final_norm": P(None),
        "lm_head": P(None, "tensor"),
    }
    if not cfg.qkv_bias:
        for k in ("bq", "bk", "bv"):
            layers.pop(k)
    if cfg.is_moe:
        # MoE stacks: the EXPERT axis takes the tensor slot (expert
        # parallelism — each device holds E/tensor experts; the combine
        # einsum contracts over E so GSPMD inserts the psum). The shared
        # expert shards its inner dim like a dense MLP; router replicated.
        for k in ("w_gate", "w_up", "w_down"):
            layers[k] = P(None, "tensor", None, None)
        layers.update({
            "router": P(None, None, None),
            "sw_gate": P(None, None, "tensor"),
            "sw_up": P(None, None, "tensor"),
            "sw_down": P(None, "tensor", None),
            "shared_gate": P(None, None, None),
        })
    if cfg.tie_word_embeddings:
        specs.pop("lm_head")
    return specs


def param_shardings(cfg: LLMConfig, mesh: Mesh) -> dict:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        param_pspecs(cfg),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: dict, cfg: LLMConfig, mesh: Mesh) -> dict:
    shardings = param_shardings(cfg, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
