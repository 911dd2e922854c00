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
    assert rows <= 64, "matvec: few activation rows (decode/verify batch), not a GEMM"
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


def _pick_tile(k_dim: int, n_dim: int, itemsize: int, budget: int,
               n_weights: int = 1) -> tuple[int, int]:
    """Largest (bk, bn) dividing (K, N) with n_weights * bk * bn * itemsize
    <= budget, preferring whole-K/whole-N tiles (fewest grid steps). bn must
    stay lane-aligned (multiple of 128); bk sublane-aligned (multiple of 32
    covers every dtype here). Grid-step count is the decode loop's fixed
    overhead (~1 us/step measured via the r4 floor gap), so bigger tiles win
    until the double-buffered pair nears the 16 MB scoped-VMEM limit."""

    def divisors(dim, align):
        # ``dim`` itself is always legal (block == array dim); other
        # candidates must be lane-aligned — bk is the x block's LAST dim and
        # bn every output/weight block's last dim, and the TPU lowering
        # requires last dims divisible by 128 (caught on chip by
        # kernel_bench --check; interpret mode does not enforce it).
        ds = [d for d in range(align, dim + 1, align) if dim % d == 0]
        if dim not in ds:
            ds.append(dim)
        return ds

    bns = divisors(n_dim, 128)
    bks = divisors(k_dim, 128)
    best = (bks[0], bns[0])
    best_steps = (k_dim // best[0]) * (n_dim // best[1])
    best_bytes = n_weights * best[0] * best[1] * itemsize
    for bn in bns:
        for bk in bks:
            if n_weights * bk * bn * itemsize > budget:
                continue
            steps = (k_dim // bk) * (n_dim // bn)
            tile = n_weights * bk * bn * itemsize
            if steps < best_steps or (steps == best_steps and tile < best_bytes):
                best, best_steps, best_bytes = (bk, bn), steps, tile
    return best


# Per-weight tile budget: double-buffered pairs must clear the ~16 MB scoped
# VMEM with >= 3 MB margin (DEVNOTES r2: keep new kernel tiles >= 3 MB under
# the limit; accumulators/x blocks ride alongside).
_TILE_BUDGET = 4_800_000


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
    assert rows <= 64, "matvec: few activation rows (decode/verify batch), not a GEMM"
    n_layers, k_w, n_dim = w_stack.shape
    assert k_w == k_dim
    auto_bk, auto_bn = _pick_tile(k_dim, n_dim, w_stack.dtype.itemsize, _TILE_BUDGET)
    bk = block_k or auto_bk
    bn = block_n or auto_bn
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


def _qkv_stacked_kernel(l_ref, x_ref, wq_ref, wk_ref, wv_ref,
                        oq_ref, ok_ref, ov_ref):
    del l_ref
    ki = pl.program_id(0)

    @pl.when(ki == 0)
    def _():
        oq_ref[...] = jnp.zeros_like(oq_ref)
        ok_ref[...] = jnp.zeros_like(ok_ref)
        ov_ref[...] = jnp.zeros_like(ov_ref)

    x = x_ref[...]  # (rows, bk)
    for w_ref, o_ref in ((wq_ref, oq_ref), (wk_ref, ok_ref), (wv_ref, ov_ref)):
        w = w_ref[0].astype(jnp.bfloat16)
        o_ref[...] += jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def matvec_stacked_qkv(
    x: jnp.ndarray,
    wq_stack: jnp.ndarray,
    wk_stack: jnp.ndarray,
    wv_stack: jnp.ndarray,
    layer,
    *,
    block_k: int | None = None,
    interpret: bool = False,
):
    """Fused q/k/v decode matvecs: ONE pallas launch streaming all three
    weight stacks for ``layer`` (whole-N output blocks, grid over K only).

    The decode step's gap over its weight-stream floor is per-launch +
    per-grid-step fixed cost (~1 us/step x ~3.3k steps/step at r4 tiles ~=
    the measured 3 ms gap); q/k/v share the activation row, so fusing them
    cuts 3 launches to 1 and rides larger DMA tiles. Scales are applied by
    the caller (they factor out of the contraction exactly).
    """
    (rows, k_dim) = x.shape
    assert rows <= 64, "matvec: few activation rows (decode/verify batch), not a GEMM"
    nq, nk, nv = wq_stack.shape[2], wk_stack.shape[2], wv_stack.shape[2]
    assert wq_stack.shape[1] == wk_stack.shape[1] == wv_stack.shape[1] == k_dim
    itemsize = wq_stack.dtype.itemsize
    if block_k is None:
        # one K-slab of all three weights per grid step; bk is the x block's
        # last dim, so candidates must be lane-aligned (multiples of 128) or
        # the whole K.
        per_k = (nq + nk + nv) * itemsize
        cands = [d for d in range(128, k_dim + 1, 128) if k_dim % d == 0] + [k_dim]
        fits = [d for d in cands if d * per_k <= _TILE_BUDGET]
        block_k = max(fits) if fits else min(cands)
    assert k_dim % block_k == 0, (k_dim, block_k)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k_dim // block_k,),
        in_specs=[
            pl.BlockSpec((rows, block_k), lambda k, l_ref: (0, k)),
            pl.BlockSpec((1, block_k, nq), lambda k, l_ref: (l_ref[0], k, 0)),
            pl.BlockSpec((1, block_k, nk), lambda k, l_ref: (l_ref[0], k, 0)),
            pl.BlockSpec((1, block_k, nv), lambda k, l_ref: (l_ref[0], k, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rows, nq), lambda k, l_ref: (0, 0)),
            pl.BlockSpec((rows, nk), lambda k, l_ref: (0, 0)),
            pl.BlockSpec((rows, nv), lambda k, l_ref: (0, 0)),
        ],
    )
    return pl.pallas_call(
        _qkv_stacked_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows, nq), jnp.float32),
            jax.ShapeDtypeStruct((rows, nk), jnp.float32),
            jax.ShapeDtypeStruct((rows, nv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), x.astype(jnp.bfloat16),
      wq_stack, wk_stack, wv_stack)


def _gateup_stacked_kernel(n_k: int, l_ref, x_ref, wg_ref, wu_ref,
                           sg_ref, su_ref, o_ref, g_acc, u_acc):
    del l_ref
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        g_acc[...] = jnp.zeros_like(g_acc)
        u_acc[...] = jnp.zeros_like(u_acc)

    x = x_ref[...]
    g_acc[...] += jax.lax.dot_general(
        x, wg_ref[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    u_acc[...] += jax.lax.dot_general(
        x, wu_ref[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == n_k - 1)
    def _():
        g = g_acc[...] * sg_ref[0, 0][None]
        u = u_acc[...] * su_ref[0, 0][None]
        o_ref[...] = g * jax.lax.logistic(g) * u  # silu(g) * u, f32


@functools.partial(jax.jit, static_argnames=("block_k", "block_n", "interpret"))
def matvec_stacked_gateup(
    x: jnp.ndarray,
    wg_stack: jnp.ndarray,
    wu_stack: jnp.ndarray,
    sg,
    su,
    layer,
    *,
    block_k: int | None = None,
    block_n: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused SwiGLU gate: silu(x @ wg * sg) * (x @ wu * su) in ONE pallas
    launch streaming both MLP stacks for ``layer`` — the two largest decode
    weights (2 x 67.9 MB int8/layer at 7B) ride one grid with the dequant +
    silu epilogue in VMEM. ``sg``/``su`` are the per-output-channel quant
    scales (L, N) f32, or (1, N) ones for bf16 stacks. Returns (rows, N) f32.
    """
    (rows, k_dim) = x.shape
    assert rows <= 64, "matvec: few activation rows (decode/verify batch), not a GEMM"
    n_dim = wg_stack.shape[2]
    assert wg_stack.shape == wu_stack.shape and wg_stack.shape[1] == k_dim
    itemsize = wg_stack.dtype.itemsize
    auto_bk, auto_bn = _pick_tile(k_dim, n_dim, itemsize, _TILE_BUDGET, n_weights=2)
    bk = block_k or auto_bk
    bn = block_n or auto_bn
    assert k_dim % bk == 0 and n_dim % bn == 0, (k_dim, bk, n_dim, bn)
    n_k = k_dim // bk

    # Scales ride as (L_or_1, 1, N) with (1, 1, bn) blocks: a (1, bn) block
    # of a (L, N) array fails the TPU lowering's sublane-divisibility rule
    # (block dim 1 is neither divisible by 8 nor equal to L — caught by
    # kernel_bench --check on chip); the singleton middle axis makes the
    # block's last-two dims (1, bn) match the array's (1, N) exactly.
    def scale_spec(s):
        if s.shape[0] == 1:  # shared (bf16 ones): every layer maps to row 0
            return pl.BlockSpec((1, 1, bn), lambda n, k, l_ref: (0, 0, n))
        return pl.BlockSpec((1, 1, bn), lambda n, k, l_ref: (l_ref[0], 0, n))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_dim // bn, n_k),
        in_specs=[
            pl.BlockSpec((rows, bk), lambda n, k, l_ref: (0, k)),
            pl.BlockSpec((1, bk, bn), lambda n, k, l_ref: (l_ref[0], k, n)),
            pl.BlockSpec((1, bk, bn), lambda n, k, l_ref: (l_ref[0], k, n)),
            scale_spec(sg),
            scale_spec(su),
        ],
        out_specs=pl.BlockSpec((rows, bn), lambda n, k, l_ref: (0, n)),
        scratch_shapes=[
            pltpu.VMEM((rows, bn), jnp.float32),
            pltpu.VMEM((rows, bn), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gateup_stacked_kernel, n_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, n_dim), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), x.astype(jnp.bfloat16),
      wg_stack, wu_stack,
      jnp.asarray(sg, jnp.float32).reshape(sg.shape[0], 1, n_dim),
      jnp.asarray(su, jnp.float32).reshape(su.shape[0], 1, n_dim))
