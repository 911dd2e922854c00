"""Configuration dataclasses.

The reference exposes three knobs through ``apply_framefusion(model, cost,
similarity_lower_bound, ratio_lower_bound)``
(/root/reference/framefusion/interface.py:47). ``FrameFusionConfig`` carries
those plus the TPU-build-specific static planning knobs (shape buckets, the
number of last query rows used for importance, the scheduler's layer count).

``LLMConfig`` describes the decoder stack (Qwen2-family geometry by default —
the backbone of 4 of the 6 supported model families; see
/root/reference/framefusion/interface.py:58-98).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FrameFusionConfig:
    cost: float = 0.3
    similarity_lower_bound: float = 0.6
    ratio_lower_bound: float = 0.1
    # Number of trailing query rows whose attention distribution scores token
    # importance for pruning: 1 for Qwen2-family stacks
    # (reference models/qwen2/modeling_qwen2.py:173), 4 for Qwen2-VL
    # (models/qwen2/modeling_qwen2_vl.py:297).
    num_importance_queries: int = 1
    # Layer count used by the cost scheduler. The reference hard-codes 28
    # (main.py:322) for every model family; keep that default for decision
    # parity and override per-model when exactness vs the paper is not needed.
    schedule_num_layers: int = 28
    # Shape-bucket granularity for compacted sequences (multiple of 128).
    bucket: int = 128

    def replace(self, **kw) -> "FrameFusionConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class LLMConfig:
    """Decoder-stack geometry (Qwen2 / Qwen2-VL / InternLM2 families)."""

    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    head_dim: Optional[int] = None  # defaults to hidden_size // num_heads
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1e6
    tie_word_embeddings: bool = False
    # Qwen2 uses bias on q/k/v projections only; InternLM2 has none.
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    # mRoPE section sizes for Qwen2-VL (None => standard 1D RoPE).
    mrope_section: Optional[tuple[int, ...]] = None
    # Qwen2-MoE sparse-MLP geometry (num_experts == 0 => dense SwiGLU MLP).
    # Matches HF Qwen2MoeConfig: softmax router -> top-k (optionally
    # re-normalised) experts + shared expert with sigmoid gate.
    num_experts: int = 0
    num_experts_per_tok: int = 2
    moe_intermediate_size: int = 0
    shared_expert_intermediate_size: int = 0
    norm_topk_prob: bool = False
    # Per-expert token budget = ceil(S * top_k / E) * factor during prefill
    # (decode gathers the chosen experts' weights directly — no capacity).
    moe_capacity_factor: float = 1.25

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 0

    @property
    def head_dim_(self) -> int:
        return self.head_dim if self.head_dim is not None else self.hidden_size // self.num_heads

    def replace(self, **kw) -> "LLMConfig":
        return dataclasses.replace(self, **kw)


# Small geometry used across the test-suite and the graft entry: real code
# paths, fast compiles.
def tiny_llm_config(**kw) -> LLMConfig:
    base = dict(
        vocab_size=512,
        hidden_size=128,
        intermediate_size=256,
        num_layers=4,
        num_heads=4,
        num_kv_heads=2,
        rope_theta=1e4,
        dtype=jnp.float32,
    )
    base.update(kw)
    return LLMConfig(**base)


def qwen2_7b_config(**kw) -> LLMConfig:
    """Qwen2-7B geometry — the LLaVA-Video-7B-Qwen2 backbone."""
    base = dict(
        vocab_size=152064,
        hidden_size=3584,
        intermediate_size=18944,
        num_layers=28,
        num_heads=28,
        num_kv_heads=4,
        rope_theta=1e6,
    )
    base.update(kw)
    return LLMConfig(**base)


def qwen2_vl_7b_config(**kw) -> LLMConfig:
    """Qwen2-VL-7B-Instruct LLM geometry (mRoPE sections t16/h24/w24 over
    head_dim 128)."""
    base = dict(
        vocab_size=152064,
        hidden_size=3584,
        intermediate_size=18944,
        num_layers=28,
        num_heads=28,
        num_kv_heads=4,
        rope_theta=1e6,
        mrope_section=(16, 24, 24),
    )
    base.update(kw)
    return LLMConfig(**base)


def qwen25_vl_72b_config(**kw) -> LLMConfig:
    """Qwen2.5-VL-72B geometry — the long-video stretch config
    (BASELINE.json configs[4]); shard with parallel.sharding over a v5p mesh
    (num_kv_heads=8 supports tensor=8)."""
    base = dict(
        vocab_size=152064,
        hidden_size=8192,
        intermediate_size=29568,
        num_layers=80,
        num_heads=64,
        num_kv_heads=8,
        rope_theta=1e6,
        mrope_section=(16, 24, 24),
    )
    base.update(kw)
    return LLMConfig(**base)


def internlm2_8b_config(**kw) -> LLMConfig:
    """InternLM2.5-7B/8B geometry (InternVL2.5-8B backbone): 32 layers,
    GQA 32/8, no qkv bias."""
    base = dict(
        vocab_size=92553,
        hidden_size=4096,
        intermediate_size=14336,
        num_layers=32,
        num_heads=32,
        num_kv_heads=8,
        rope_theta=1e6,
        qkv_bias=False,
    )
    base.update(kw)
    return LLMConfig(**base)


def tiny_moe_llm_config(**kw) -> LLMConfig:
    """Tiny Qwen2-MoE-shaped stack for tests: 4 experts, top-2, shared expert."""
    base = dict(
        vocab_size=512,
        hidden_size=128,
        intermediate_size=0,
        num_layers=4,
        num_heads=4,
        num_kv_heads=2,
        rope_theta=1e4,
        dtype=jnp.float32,
        num_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=96,
        shared_expert_intermediate_size=160,
    )
    base.update(kw)
    return LLMConfig(**base)


def qwen2_moe_a14b_config(**kw) -> LLMConfig:
    """Qwen2-57B-A14B geometry (the Qwen2 family's MoE variant): 64 experts,
    top-8 softmax routing + 20k-wide shared expert, GQA 28/4 like Qwen2-7B."""
    base = dict(
        vocab_size=151936,
        hidden_size=3584,
        intermediate_size=0,
        num_layers=28,
        num_heads=28,
        num_kv_heads=4,
        rope_theta=1e6,
        num_experts=64,
        num_experts_per_tok=8,
        moe_intermediate_size=2560,
        shared_expert_intermediate_size=20480,
        norm_topk_prob=False,
    )
    base.update(kw)
    return LLMConfig(**base)


def qwen2_1_5b_config(**kw) -> LLMConfig:
    """Qwen2-1.5B geometry (LLaVA-OneVision-class small backbone)."""
    base = dict(
        vocab_size=151936,
        hidden_size=1536,
        intermediate_size=8960,
        num_layers=28,
        num_heads=12,
        num_kv_heads=2,
        rope_theta=1e6,
        tie_word_embeddings=True,
    )
    base.update(kw)
    return LLMConfig(**base)
