"""framefusion_tpu — TPU-native inference-time video-token compression for LVLMs.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
thu-nics/FrameFusion (reference at /root/reference): progressive
similarity-based merging and attention-importance pruning of vision tokens
during LVLM prefill, reducing vision tokens ~70% with ~3x+ LLM prefill
speedup, behind the same three-knob API.

Public surface:
    apply_framefusion(model, cost, similarity_lower_bound, ratio_lower_bound)
"""

from .config import FrameFusionConfig, LLMConfig, tiny_llm_config, qwen2_7b_config, qwen2_1_5b_config
from . import core

__version__ = "0.1.0"

__all__ = [
    "FrameFusionConfig",
    "LLMConfig",
    "tiny_llm_config",
    "qwen2_7b_config",
    "qwen2_1_5b_config",
    "core",
]


def __getattr__(name):
    # Lazy imports keep `import framefusion_tpu` light for core-only users.
    if name == "apply_framefusion":
        from .interface import apply_framefusion

        return apply_framefusion
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
