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

This is deliberately host-side Python: the scheduler consumes one scalar per
compression event (the measured merge ratio), which the executor reads back
from the device anyway to pick the next shape bucket. Keeping it out of the
jitted program means the per-layer token budgets stay static inside XLA.

Note the reference hard-codes ``num_layers=28`` (Qwen2-7B) even for model
families with other depths; ``FrameFusionConfig.schedule_num_layers`` exposes
that knob with the same default for decision parity.
"""

from __future__ import annotations


class CostInfeasibleError(ValueError):
    """The requested cost cannot be reached given compression so far."""


def compute_pruning_ratio(sparsity_list: list[float], cost: float, num_layers: int = 28) -> float:
    """Sparsity required at the next compression event to hit ``cost``.

    Returns a value in ``[0, 1]``; ``0`` means no compression is needed (the
    budget is already satisfiable by running the remaining layers dense).

    Raises:
        CostInfeasibleError: if even pruning everything cannot reach ``cost``.
    """
    n_events = len(sparsity_list)
    density = 1.0
    spent = 0.0
    for s in sparsity_list:
        density *= 1.0 - s
        spent += density
    remaining_budget = num_layers * cost - spent
    if remaining_budget < 0:
        raise CostInfeasibleError("The cost is too small")
    remaining_layers = num_layers - n_events
    if remaining_budget / (remaining_layers * density) > 1:
        return 0.0
    return 1.0 - remaining_budget / (remaining_layers * density)
