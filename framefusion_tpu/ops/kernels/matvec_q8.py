"""Pallas TPU matvec for decode: y = (x @ W) [* scale].

Decode reads every weight byte once per token, so its floor is weight bytes /
HBM rate. Measured on v5e (kernel_bench --what decode): XLA's matvec hits
~730-770 GB/s on the LARGE decode weights (3584x18944) but only ~185G
elements/s on the small ones (3584x512..4608 — wq/wk/wv/wo), and the sum of
per-matmul times reproduces the decode scan's ms/token exactly. This kernel
streams the (K, N) weight in large double-buffered int8/bf16 tiles so the
small projections ride HBM bandwidth too.

``W`` may be int8 (weight-only quant pair from ops/quant.py — per-output-
channel ``scale`` applied outside the contraction, exactly models/qwen2.mm's
semantics) or bf16 (dense serving path).

The reference's decode (torch, HF `generate` over the patched models —
/root/reference/framefusion/models/qwen2/modeling_qwen2.py forward) leans on
cuBLAS GEMV; this is the TPU-native counterpart. Parity is pinned in
tests/test_kernels.py and on-chip by `kernel_bench --check`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _matvec_kernel(x_ref, w_ref, o_ref):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    w = w_ref[...].astype(jnp.bfloat16)  # int8 -> bf16 in-register (no-op for bf16)
    x = x_ref[...]  # (1, bk) bf16
    o_ref[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _pick_block(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return dim


@functools.partial(jax.jit, static_argnames=("block_k", "block_n", "interpret"))
def _matvec(x, w, *, block_k=None, block_n=None, interpret=False):
    (rows, k_dim) = x.shape
    assert rows <= 32, "matvec: few activation rows (decode batch), not a GEMM"
    k_w, n_dim = w.shape
    assert k_w == k_dim
    bk = block_k or _pick_block(k_dim, (4736, 4096, 3584, 2368, 2048, 1024, 512, 256))
    bn = block_n or _pick_block(n_dim, (512, 256, 128))
    assert k_dim % bk == 0 and n_dim % bn == 0, (k_dim, bk, n_dim, bn)

    return pl.pallas_call(
        _matvec_kernel,
        grid=(n_dim // bn, k_dim // bk),
        in_specs=[
            pl.BlockSpec((rows, bk), lambda n, k: (0, k)),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n)),
        ],
        out_specs=pl.BlockSpec((rows, bn), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((rows, n_dim), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), w)


def matvec_q8(
    x: jnp.ndarray,
    w8: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    block_k: int | None = None,
    block_n: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, K) bf16 @ (K, N) int8 -> (B, N) f32, then * scale (N,) f32.

    B is 1 for solo decode, the batch size for serving decode — small either
    way; the weight stream dominates and is shared across rows.

    Blocks must divide K/N exactly (weights are pre-shaped; padding a 200 MB
    weight at dispatch would cost a full copy). Defaults pick the largest
    divisor <= ~4.7k (K) / 512 (N): one (bk, bn) int8 tile tops out ~2.4 MB,
    double-buffered by the pallas pipeline.
    """
    y = _matvec(x, w8, block_k=block_k, block_n=block_n, interpret=interpret)
    return y * scale


def matvec_bf16(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    block_k: int | None = None,
    block_n: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, K) bf16 @ (K, N) bf16 -> (B, N) f32 (dense decode path)."""
    return _matvec(x, w, block_k=block_k, block_n=block_n, interpret=interpret)


def _matvec_stacked_kernel(l_ref, x_ref, w_ref, o_ref):
    del l_ref  # consumed by the index_maps
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    w = w_ref[0].astype(jnp.bfloat16)  # (bk, bn)
    x = x_ref[...]  # (1, bk)
    o_ref[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("block_k", "block_n", "interpret"))
def matvec_stacked(
    x: jnp.ndarray,
    w_stack: jnp.ndarray,
    layer,
    *,
    block_k: int | None = None,
    block_n: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, K) bf16 @ w_stack[layer] -> (B, N) f32, w_stack (L, K, N) int8|bf16.

    The decode loop's form: weights live in per-layer stacks and the loop
    index picks the layer. Handing the WHOLE stack to the kernel with the
    layer index scalar-prefetched into the index_map lets the DMA read the
    layer's tiles straight from the stacked HBM buffer — a
    ``dynamic_index_in_dim`` feeding a pallas_call would materialise a copy
    of the full (K, N) slice first (XLA can't fuse a gather into an opaque
    kernel operand). Per-channel quant scales are applied by the caller
    (models/qwen2.mm_decode) — they factor out of the contraction exactly.
    """
    (rows, k_dim) = x.shape
    assert rows <= 32, "matvec: few activation rows (decode batch), not a GEMM"
    n_layers, k_w, n_dim = w_stack.shape
    assert k_w == k_dim
    bk = block_k or _pick_block(k_dim, (4736, 4096, 3584, 2368, 2048, 1024, 512, 256))
    bn = block_n or _pick_block(n_dim, (512, 256, 128))
    assert k_dim % bk == 0 and n_dim % bn == 0, (k_dim, bk, n_dim, bn)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_dim // bn, k_dim // bk),
        in_specs=[
            pl.BlockSpec((rows, bk), lambda n, k, l_ref: (0, k)),
            pl.BlockSpec((1, bk, bn), lambda n, k, l_ref: (l_ref[0], k, n)),
        ],
        out_specs=pl.BlockSpec((rows, bn), lambda n, k, l_ref: (0, n)),
    )
    return pl.pallas_call(
        _matvec_stacked_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, n_dim), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), x.astype(jnp.bfloat16), w_stack)
