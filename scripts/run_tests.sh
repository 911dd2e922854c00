#!/usr/bin/env bash
# Fast test runner: skips the axon PJRT plugin registration (sitecustomize
# hangs ~100s at process exit when it is loaded) and forces the CPU backend
# with 8 virtual devices for sharding tests. Equivalent to what the CI driver
# runs, minus the exit-teardown tax.
set -euo pipefail
cd "$(dirname "$0")/.."
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest tests/ -q "$@"
