"""Importance-based token pruning.

Parity: the pruning stage of ``FrameFusion.forward``
(/root/reference/framefusion/main.py:61-101): average the attention
probabilities the last query token(s) pay to every key over heads and query
rows, keep the top-k image tokens (k chosen by the cost scheduler), and keep
everything outside the image window untouched.

The attention rows themselves are produced by the attention op: the pallas
resident-KV kernel folds the last-``num_last_queries`` row softmax into its
epilogue (flash_causal_attention_importance), other paths compute just those
rows as a small einsum — either way attention is never re-run in full like
the reference's ``framefusion/utils.py:27-57`` extractor.
"""

from __future__ import annotations

import jax.numpy as jnp

from .merge import descending_rank


def prune_keep_mask(
    importance: jnp.ndarray,
    image_start: jnp.ndarray,
    image_len: jnp.ndarray,
    k_keep: jnp.ndarray,
    valid_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Keep mask after importance pruning (original token order).

    Args:
        importance: (S,) fp32 — attention mass on each current token, already
            averaged over heads and the last query rows.
        image_start: scalar int32 — first image-token position (unchanged by
            merging: merging only removes image tokens).
        image_len: scalar int32 — current image-token count.
        k_keep: scalar int32 — number of image tokens to keep
            (``round(image_len * (1 - pruning_ratio))`` on the host).
        valid_mask: (S,) bool — live (non-padding) tokens.

    Returns:
        keep: (S,) bool — True for tokens surviving the prune. Padding slots
            are False.
    """
    s = importance.shape[0]
    pos = jnp.arange(s, dtype=jnp.int32)
    in_window = (pos >= image_start) & (pos < image_start + image_len) & valid_mask
    score = jnp.where(in_window, importance, -jnp.inf)
    keep_img = in_window & (descending_rank(score) < k_keep)
    return (valid_mask & ~in_window) | keep_img
