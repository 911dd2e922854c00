"""Mask-and-compact repacking to bucketed static lengths.

The reference shrinks tensors with boolean-mask gathers
(/root/reference/framefusion/main.py:94, 132-138), producing a new dynamic
shape per layer — recompile poison under XLA. Here the keep mask becomes a
stable partition: surviving tokens are packed to the front (original order
preserved) and the array is sliced to a *bucketed* static length chosen by the
host executor. Slots past the true survivor count are padding, marked dead via
``valid_mask`` and the PAD patch-type sentinel so they can never attend, merge
or count toward budgets.
"""

from __future__ import annotations

import jax.numpy as jnp

from .constants import PAD_TOKEN

# Bucket granularity. 128 matches the MXU/VPU lane width; every compiled
# program's sequence axis stays hardware-aligned and the number of distinct
# compiled shapes per prompt stays small.
BUCKET = 128


def bucket_length(n: int, bucket: int = BUCKET) -> int:
    """Smallest multiple of ``bucket`` that holds ``n`` tokens (host-side)."""
    return max(bucket, -(-n // bucket) * bucket)


def compaction_order(keep: jnp.ndarray) -> jnp.ndarray:
    """Permutation packing kept tokens first, original order preserved."""
    return jnp.argsort(jnp.logical_not(keep), stable=True).astype(jnp.int32)


def compact_tokens(keep: jnp.ndarray, new_len: int, new_valid: jnp.ndarray, arrays: dict):
    """Pack survivors to the front and slice to a static bucket length.

    Args:
        keep: (S,) bool keep mask (padding slots must already be False).
        new_len: static int — bucketed output length (<= S).
        new_valid: scalar int32 — true survivor count (<= new_len).
        arrays: name -> array whose leading axis is the token axis. The
            special key ``patch_type`` additionally gets PAD-sentinel filling
            in the padding region.

    Returns:
        (out_arrays, valid_mask): compacted arrays of leading length
        ``new_len`` and the (new_len,) bool validity mask.
    """
    order = compaction_order(keep)[:new_len]
    valid = jnp.arange(new_len, dtype=jnp.int32) < new_valid
    out = {}
    for name, arr in arrays.items():
        packed = jnp.take(arr, order, axis=0)
        if name == "patch_type":
            packed = jnp.where(valid, packed, jnp.int32(PAD_TOKEN))
        out[name] = packed
    return out, valid
