"""FLOP-budget scheduler for progressive token compression.

Parity: ``FrameFusion._compute_pruning_ratio`` in
/root/reference/framefusion/main.py:321-343.

The model runs ``num_layers`` decoder layers. Each compression event ``i``
(one merge pass, or the final prune) multiplies the live-token density by
``(1 - sparsity_i)``. The cost accounting approximates total FLOPs as the sum
over layers of the token density at that layer, normalised so that the dense
model costs ``num_layers``. Given the sparsities of the events so far, this
returns the sparsity the *next* event must apply for the total to land exactly
on ``num_layers * cost``.

Two implementations with bit-identical fp32 arithmetic:
  * ``compute_pruning_ratio`` — host-side (numpy fp32), used by the segmented
    executor and as the parity oracle.
  * ``compute_pruning_ratio_device`` — traced (jnp fp32), used inside the
    fused on-device compression phase so merge events need no host sync.

All arithmetic is float32 by design (the TPU has no fp64); the reference
computes this in Python float64 (main.py:321-343) — decisions can differ only
on exact representational ties, which the similarity data cannot produce in
practice.

Note the reference hard-codes ``num_layers=28`` (Qwen2-7B) even for model
families with other depths; ``FrameFusionConfig.schedule_num_layers`` exposes
that knob with the same default for decision parity.
"""

from __future__ import annotations

import numpy as np


class CostInfeasibleError(ValueError):
    """The requested cost cannot be reached given compression so far."""


def compute_pruning_ratio(sparsity_list: list[float], cost: float, num_layers: int = 28) -> float:
    """Sparsity required at the next compression event to hit ``cost``.

    Returns a value in ``[0, 1]``; ``0`` means no compression is needed (the
    budget is already satisfiable by running the remaining layers dense).

    Raises:
        CostInfeasibleError: if even pruning everything cannot reach ``cost``.
    """
    f = np.float32
    n_events = len(sparsity_list)
    density = f(1.0)
    spent = f(0.0)
    for s in sparsity_list:
        density = f(density * (f(1.0) - f(s)))
        spent = f(spent + density)
    remaining_budget = f(f(num_layers) * f(cost) - spent)
    if remaining_budget < 0:
        raise CostInfeasibleError("The cost is too small")
    remaining_layers = f(num_layers - n_events)
    frac = f(remaining_budget / f(remaining_layers * density))
    if frac > 1:
        return 0.0
    return float(f(f(1.0) - frac))


def compute_pruning_ratio_device(sparsity_arr, n_events, cost, num_layers: int):
    """Traced fp32 twin of ``compute_pruning_ratio``.

    Args:
        sparsity_arr: (max_events,) fp32 — recorded per-event sparsities.
        n_events: scalar int32 — how many entries are valid.
        cost: scalar fp32.
        num_layers: static int.

    Returns:
        (ratio, infeasible): fp32 scalar in [0, 1] and a bool flag replacing
        the reference's ValueError (main.py:339-340) — the host raises on it
        after the phase program returns.
    """
    import jax
    import jax.numpy as jnp

    max_events = sparsity_arr.shape[0]

    def body(i, carry):
        density, spent = carry
        active = i < n_events
        new_density = jnp.where(active, density * (1.0 - sparsity_arr[i]), density)
        new_spent = jnp.where(active, spent + new_density, spent)
        return new_density, new_spent

    density, spent = jax.lax.fori_loop(0, max_events, body, (jnp.float32(1.0), jnp.float32(0.0)))
    remaining = jnp.float32(num_layers) * cost - spent
    infeasible = remaining < 0
    # Same operation order as the host twin: multiply denominator first.
    frac = remaining / ((jnp.float32(num_layers) - n_events.astype(jnp.float32)) * density)
    ratio = jnp.where(frac > 1, 0.0, 1.0 - frac)
    return ratio, infeasible
