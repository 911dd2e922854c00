"""Profiling / tracing helpers.

TPU equivalent of the reference's CUDA-event timing
(reference example_llava.py:131-167) per SURVEY.md §5: ``jax.profiler``
traces viewable in Perfetto/TensorBoard, plus wall-clock helpers that force
device completion (a device->host read — ``block_until_ready`` can be a stub
on relay-attached runners).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/framefusion_trace"):
    """Capture a device trace: ``with profiling.trace(): engine.prefill(...)``.

    Open the produced directory with TensorBoard's profile plugin or
    Perfetto (xplane conversion).
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def force(x) -> float:
    """True device barrier: reduce + transfer one scalar."""
    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32)))


def timeit(fn, probe=lambda o: o, reps: int = 3, warmup: bool = True):
    """Wall-clock seconds per call; queues ``reps`` calls and forces once."""
    out = fn()
    if warmup:
        force(probe(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    force(probe(out))
    return (time.perf_counter() - t0) / reps, out
