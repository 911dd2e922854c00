"""Token sampling: greedy, temperature, top-k, top-p (nucleus).

The reference delegates sampling to HF ``generate`` (do_sample etc.); a
standalone framework needs its own. All samplers are jit-safe and used by the
on-device decode scan via a static sampler config.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    temperature: float = 0.0  # 0 => greedy
    top_k: Optional[int] = None
    top_p: Optional[float] = None


def sample_token(logits: jnp.ndarray, cfg: SamplerConfig, key: jax.Array) -> jnp.ndarray:
    """Sample one token id from (V,) logits."""
    if cfg.temperature == 0.0:
        return jnp.argmax(logits).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / cfg.temperature
    if cfg.top_k is not None:
        kth = jax.lax.top_k(logits, cfg.top_k)[0][-1]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if cfg.top_p is not None:
        sorted_logits = jnp.sort(logits)[::-1]
        probs = jax.nn.softmax(sorted_logits)
        cum = jnp.cumsum(probs)
        # smallest set with cumulative prob >= top_p; keep at least one token
        cutoff_idx = jnp.sum(cum < cfg.top_p)
        cutoff = sorted_logits[jnp.minimum(cutoff_idx, logits.shape[0] - 1)]
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits).astype(jnp.int32)
