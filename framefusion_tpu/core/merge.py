"""Run-length token merging with static shapes.

Parity: ``FrameFusion.merge_tokens_and_get_mask`` and
``find_contigious_latter_index`` (/root/reference/framefusion/main.py:243-319,
351-380), plus the threshold-vs-topk branch of ``FrameFusion.forward``
(main.py:113-127).

Semantics being matched:
  * A patch-major position ``i`` is *marked* when its similarity passes the
    gate. Runs of consecutive marked positions merge into the unmarked token
    immediately before the run (the run head). The head's new value is the
    mean of itself and all run members. Marked tokens are dropped.
  * Threshold gate: marked = (sim >= similarity_lower_bound).
  * Budget gate (when the threshold would over-merge): the top
    ``k = int(budget * frame_token_num)`` positions by similarity.

TPU-native formulation:
  * Both gates reduce to ``rank(sim, descending, stable) < k`` with a *traced*
    scalar ``k`` — for the threshold gate ``k`` is the count of positions
    ``>= threshold`` (rank < count selects exactly the set ``sim >= t``
    because every such element outranks every element below ``t``), and for
    the budget gate ``k`` is the budget itself. One compiled program serves
    both branches, and ties resolve to the lowest patch-major index — the same
    policy the oracle pins down.
  * Run heads come from a running maximum (``associative_scan``) over the
    positions of unmarked tokens — no host-side run enumeration.
  * The merge itself is a scatter-add in fp32 over *original* token indices
    followed by a division by (1 + run length), exactly the reference's
    ``index_add_``-then-divide averaging, but accumulated at fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def descending_rank(scores: jnp.ndarray) -> jnp.ndarray:
    """Rank of each element under a stable descending sort (0 = largest).

    Ties rank lower indices first, matching the decision policy used by the
    oracle for both merge selection and importance pruning.
    """
    s = scores.shape[0]
    order_desc = jnp.argsort(-scores, stable=True)
    return jnp.zeros((s,), jnp.int32).at[order_desc].set(jnp.arange(s, dtype=jnp.int32))


def mark_topk(sim: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask of the ``k`` highest-similarity patch-major positions."""
    return descending_rank(sim) < k


def apply_merge(hidden: jnp.ndarray, marked_pm: jnp.ndarray, order: jnp.ndarray):
    """Average marked tokens into their run heads; return merged states + keep mask.

    Args:
        hidden: (S, D) activations.
        marked_pm: (S,) bool in patch-major positions. Construction guarantees
            position 0 is unmarked (similarity there is IGNORE).
        order: (S,) int32 patch-major permutation.

    Returns:
        merged: (S, D) activations with run heads replaced by run means
            (same dtype as ``hidden``; accumulation in fp32).
        keep: (S,) bool in *original* positions; False for merged-away tokens.
    """
    s, _ = hidden.shape
    pos = jnp.arange(s, dtype=jnp.int32)

    # Nearest unmarked position at or before each patch-major position. For a
    # marked position this is its run head (strictly before it); for an
    # unmarked position it is itself.
    head_pm = jax.lax.associative_scan(jnp.maximum, jnp.where(marked_pm, jnp.int32(-1), pos))
    head_orig = order[head_pm]

    h32 = hidden.astype(jnp.float32)
    contrib = jnp.where(marked_pm[:, None], h32[order], 0.0)
    sums = jnp.zeros_like(h32).at[head_orig].add(contrib)
    counts = jnp.zeros((s,), jnp.float32).at[head_orig].add(marked_pm.astype(jnp.float32))
    merged = ((h32 + sums) / (1.0 + counts)[:, None]).astype(hidden.dtype)

    keep = jnp.ones((s,), bool).at[order].set(~marked_pm)
    return merged, keep
