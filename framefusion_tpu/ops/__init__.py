from .attention import (
    causal_attention,
    causal_attention_chunked,
    causal_attention_einsum,
    decode_attention,
    last_rows_importance,
)
from .rope import apply_rope, mrope_cos_sin, rope_cos_sin
from .sampling import SamplerConfig, sample_token

__all__ = [
    "causal_attention",
    "causal_attention_chunked",
    "causal_attention_einsum",
    "decode_attention",
    "last_rows_importance",
    "apply_rope",
    "mrope_cos_sin",
    "rope_cos_sin",
    "SamplerConfig",
    "sample_token",
]
