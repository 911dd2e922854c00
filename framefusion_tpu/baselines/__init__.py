from .qwen2_baselines import (
    compute_density_overhead,
    BaselineEngine,
    replace_forward,
    replace_qwen2_forward,
    replace_minicpmv_forward,
    replace_nvila_forward,
    replace_qwenvl_forward,
)

__all__ = [
    "compute_density_overhead",
    "BaselineEngine",
    "replace_forward",
    "replace_qwen2_forward",
    "replace_minicpmv_forward",
    "replace_nvila_forward",
    "replace_qwenvl_forward",
]
