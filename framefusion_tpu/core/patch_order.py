"""Patch-major reordering of the token sequence.

Parity: the ``torch.where(patch_type == arange(patch_num)[:, None])`` ordering
in ``FrameFusion.compute_similarity_and_token_index_by_patch``
(/root/reference/framefusion/main.py:208-214): all tokens of patch 0 in
sequence order, then all tokens of patch 1, etc. Consecutive entries within a
patch are the same spatial position in consecutive frames — the merge
candidates.

TPU-native formulation: instead of a boolean ``where`` producing a dynamic
shape, we build a composite sort key and take a *stable* argsort over the full
static-length sequence. Image tokens sort to the front in (patch, position)
order; text/special/padding tokens sort to the back in position order. The
result is a permutation of ``[0, S)`` with static shape, plus the scalar count
of image tokens.
"""

from __future__ import annotations

import jax.numpy as jnp


def order_by_patch(patch_type: jnp.ndarray, valid_mask: jnp.ndarray, patch_num: int):
    """Compute the patch-major token permutation.

    Args:
        patch_type: (S,) int32. Patch id in ``[0, patch_num)`` for image
            tokens; negative sentinel otherwise (TEXT/SPECIAL/PAD).
        valid_mask: (S,) bool. False for padding slots introduced by bucketed
            compaction.
        patch_num: static int, number of spatial patches per frame.

    Returns:
        order: (S,) int32 permutation — original index of the token at each
            patch-major position. Positions ``>= n_img`` hold non-image and
            padding tokens (in original order) and must be masked downstream.
        n_img: scalar int32, number of valid image tokens.
    """
    s = patch_type.shape[0]
    idx = jnp.arange(s, dtype=jnp.int32)
    is_img = (patch_type >= 0) & (patch_type < patch_num) & valid_mask
    # Composite key: (patch, position) for image tokens, one patch-id past the
    # end for the rest (kept in original order by sort stability). int32 is
    # ample: patch_num * S stays far below 2^31 for any real prompt.
    key = jnp.where(is_img, patch_type * s + idx, jnp.int32(patch_num) * s + idx)
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    n_img = jnp.sum(is_img).astype(jnp.int32)
    return order, n_img
