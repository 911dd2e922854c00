"""Test environment: force CPU with 8 virtual devices for sharding tests.

Must run before the first `import jax` anywhere in the test process.
"""

import os

# FORCE CPU: the runner environment pins JAX_PLATFORMS to the TPU relay and
# its sitecustomize imports jax + registers the plugin before any test code
# runs, so env vars alone are not enough — jax.config.update overrides the
# platform as long as no backend has been initialized yet (true here: the
# plugin registers a factory without touching devices).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Reset XLA:CPU compiler state at module boundaries.

    The full suite compiles many hundreds of programs in one process; past
    ~270 tests the XLA:CPU JIT segfaults inside backend_compile_and_load
    (observed 2026-08-18 at two different tests at the same ordinal — a
    cumulative-state crash, each test passes in isolation). Dropping the
    executable caches between modules keeps the live-compilation count
    bounded; cross-module program reuse is lost, which costs recompiles but
    keeps the one-process suite (the CI driver's `pytest tests/ -x -q`)
    stable. Disable with FF_CLEAR_CACHES_PER_MODULE=0.
    """
    yield
    if os.environ.get("FF_CLEAR_CACHES_PER_MODULE", "1") != "0":
        jax.clear_caches()
        gc.collect()
