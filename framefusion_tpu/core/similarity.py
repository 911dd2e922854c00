"""Adjacent-frame patchwise cosine similarity.

Parity: ``FrameFusion.compute_similarity_and_token_index_by_patch``
(/root/reference/framefusion/main.py:180-241) and ``cosine_similarity``
(main.py:345-349).

In patch-major order, position ``i`` scores the similarity between the token
at patch-major position ``i-1`` and the token at position ``i`` — i.e. the
same spatial patch in consecutive frames. Cross-patch boundaries and the
first position carry the IGNORE sentinel (-2), as do all non-image and
padding positions (the reference's similarity vector only spans image tokens;
ours is padded to the static sequence length with values that can never pass
any similarity threshold in (0, 1]).

Accumulation is fp32 regardless of activation dtype: the reference computes
in model dtype (bf16/fp16) and flags its own merge averaging as numerically
unstable (main.py:303); on TPU the fp32 VPU path costs nothing extra here and
the unit oracle is defined at fp32.
"""

from __future__ import annotations

import jax.numpy as jnp

from .constants import IGNORE_TOKEN


def similarity_by_patch(hidden: jnp.ndarray, patch_type: jnp.ndarray, order: jnp.ndarray, n_img: jnp.ndarray):
    """Cosine similarity of consecutive same-patch tokens, patch-major.

    Args:
        hidden: (S, D) activations (any float dtype; promoted to fp32).
        patch_type: (S,) int32 patch ids / sentinels (original order).
        order: (S,) int32 patch-major permutation from ``order_by_patch``.
        n_img: scalar int32 count of image tokens.

    Returns:
        sim: (S,) fp32 — similarity at each patch-major position; IGNORE (-2)
            at position 0, at patch boundaries, and beyond ``n_img``.
    """
    s = hidden.shape[0]
    h = hidden[order].astype(jnp.float32)
    pt = patch_type[order]

    prev = h[:-1]
    cur = h[1:]
    dot = jnp.sum(prev * cur, axis=-1)
    norm = jnp.linalg.norm(prev, axis=-1) * jnp.linalg.norm(cur, axis=-1)
    sim = dot / norm
    sim = jnp.concatenate([jnp.full((1,), IGNORE_TOKEN, jnp.float32), sim])

    pos = jnp.arange(s, dtype=jnp.int32)
    same_patch = jnp.concatenate([jnp.zeros((1,), bool), pt[1:] == pt[:-1]])
    in_range = (pos >= 1) & (pos < n_img)
    return jnp.where(in_range & same_patch, sim, jnp.float32(IGNORE_TOKEN))
