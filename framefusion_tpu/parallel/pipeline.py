"""Pipeline-parallel (GPipe-style) execution over a ``stage`` mesh axis.

The reference's multi-GPU story is HF accelerate's ``device_map`` layer
placement (reference interface.py:204-207): layers are *placed* across GPUs
and activations hop between them, one request at a time — a pipeline with a
single microbatch. The TPU-native equivalent is a real pipeline: the layer
stack is sharded over a ``stage`` mesh axis (each device owns a contiguous
block of layers), a batch is split into microbatches, and activations move
stage-to-stage over ICI with ``lax.ppermute`` inside one compiled program.

Design (shard_map, explicit collectives — the scaling-book pipelining
recipe):

  * Params: the layer-stacked pytree ``params["layers"]`` (leading axis L)
    is sharded ``P("stage", ...)`` — layer ownership IS array sharding, so
    a stage's weights live only on its device. Embedding / final norm /
    lm_head are replicated (they are small next to the stack).
  * Schedule: classic GPipe fill-drain over ``n_ticks = M + S - 1`` ticks
    (M microbatches, S stages) driven by ``lax.scan``. At tick ``t`` stage
    ``s`` runs microbatch ``t - s``; bubble ticks compute on don't-care
    data (zeros) and their outputs are never read. Per-tick activations are
    passed right with a single ``ppermute``.
  * Backward: ``jax.grad`` differentiates straight through the scan +
    ppermute — the transpose of a right-shift is a left-shift, so the
    backward pass is automatically the reverse pipeline (this is why the
    schedule is a ``scan`` and not a Python loop). ``jax.checkpoint``
    around the per-stage block remats activations instead of storing every
    tick's residuals.
  * Composition: ``data`` parallelism composes by splitting microbatches
    over an outer ``data`` mesh axis (``make_pipe_train_step`` shards the
    batch ``P("data", None)`` and lets every data replica run the same
    pipeline); gradients are psummed over ``data`` by GSPMD as usual.

This module is inference-correct and training-correct at any (M, S) with
``L % S == 0``; wall-clock efficiency is the usual GPipe ``M / (M + S - 1)``
bubble bound, so pick ``M >= 4 * S`` in deployments.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import LLMConfig
from ..models import qwen2


def make_pipe_mesh(devices=None, stages: int | None = None, data: int = 1) -> Mesh:
    """(data, stage) mesh; ``stages`` defaults to all devices / data."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    stages = (n // data) if stages is None else stages
    assert data * stages <= n, (n, data, stages)
    arr = np.asarray(devices[: data * stages]).reshape(data, stages)
    return Mesh(arr, ("data", "stage"))


def pipe_param_pspecs(cfg: LLMConfig) -> dict:
    """Layer stack sharded over ``stage`` (axis 0 = layer); rest replicated."""
    layers = {
        "ln1": P("stage", None),
        "ln2": P("stage", None),
        "wq": P("stage", None, None),
        "wk": P("stage", None, None),
        "wv": P("stage", None, None),
        "bq": P("stage", None),
        "bk": P("stage", None),
        "bv": P("stage", None),
        "wo": P("stage", None, None),
        "w_gate": P("stage", None, None),
        "w_up": P("stage", None, None),
        "w_down": P("stage", None, None),
    }
    if not cfg.qkv_bias:
        for k in ("bq", "bk", "bv"):
            layers.pop(k)
    specs = {
        "embed": P(None, None),
        "layers": layers,
        "final_norm": P(None),
    }
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P(None, None)
    return specs


def shard_params_pipe(params: dict, cfg: LLMConfig, mesh: Mesh) -> dict:
    shardings = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        pipe_param_pspecs(cfg),
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.tree.map(jax.device_put, params, shardings)


def _stage_pipeline(layers_local, h_all, cfg: LLMConfig, n_micro: int, n_stages: int):
    """Per-device GPipe schedule: ``h_all`` (M, mb, T, D) embedded microbatches
    (replicated); returns (M, mb, T, D) final hidden states, valid only on the
    LAST stage (callers psum-select). Runs under shard_map over ``stage``."""
    s = jax.lax.axis_index("stage")
    t_len = h_all.shape[2]
    pos = jnp.arange(t_len, dtype=jnp.int32)
    cos, sin = qwen2.positions_cos_sin(pos, cfg)

    @jax.checkpoint
    def apply_local(h):
        def one_layer(h, lp):
            def single(hs):
                hs, _, _, _ = qwen2.layer_attention(lp, hs, cos, sin, cfg, attn_impl="einsum")
                return qwen2.layer_mlp(lp, hs, cfg)

            return jax.vmap(single)(h), None

        h, _ = jax.lax.scan(one_layer, h, layers_local)
        return h

    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def tick(h_left, t):
        # Stage 0 pulls a fresh microbatch; later stages consume the ppermuted
        # activation from their left neighbour. Bubble ticks see zeros (benign
        # through rmsnorm/softmax) and their outputs are never selected.
        x_t = jax.lax.dynamic_index_in_dim(
            h_all, jnp.minimum(t, n_micro - 1), 0, keepdims=False
        )
        h_in = jnp.where(s == 0, x_t, h_left)
        h_out = apply_local(h_in)
        h_next = jax.lax.ppermute(h_out, "stage", perm)
        return h_next, h_out

    n_ticks = n_micro + n_stages - 1
    # The carry varies per stage once it has been ppermuted; mark the zero
    # init as stage-varying so the scan's carry types agree (shard_map VMA).
    init = jax.lax.pcast(jnp.zeros_like(h_all[0]), ("stage",), to="varying")
    _, ys = jax.lax.scan(tick, init, jnp.arange(n_ticks))
    # Last stage finishes microbatch m at tick m + S - 1.
    return ys[n_stages - 1 :]


def pipeline_forward(
    params: dict, ids: jnp.ndarray, cfg: LLMConfig, mesh: Mesh, n_micro: int
) -> jnp.ndarray:
    """(B, T) ids -> (B, T, V) logits, numerically matching
    ``train.forward_batched`` (same einsum layer path), computed by the
    GPipe schedule over the mesh's ``stage`` axis."""
    b, t = ids.shape
    assert b % n_micro == 0, (b, n_micro)
    n_stages = mesh.shape["stage"]
    assert cfg.num_layers % n_stages == 0, (cfg.num_layers, n_stages)
    mb = b // n_micro

    h = qwen2.embed(params, ids, cfg).reshape(n_micro, mb, t, cfg.hidden_size)

    # data parallelism composes on the MICROBATCH axis: each data replica
    # pipelines its slice of every microbatch; no cross-replica traffic until
    # the loss/grad psum that GSPMD inserts outside this shard_map.
    mb_spec = P(None, "data", None, None) if "data" in mesh.axis_names else P()

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("stage"), params["layers"]), mb_spec),
        out_specs=mb_spec,
    )
    def run(layers, h_all):
        out = _stage_pipeline(layers, h_all, cfg, n_micro, n_stages)
        s = jax.lax.axis_index("stage")
        keep = (s == n_stages - 1).astype(out.dtype)
        # Select the last stage's result (replicates it over ``stage``).
        return jax.lax.psum(out * keep, "stage")

    h_out = run(params["layers"], h).reshape(b, t, cfg.hidden_size)
    return jax.vmap(lambda x: qwen2.final_logits(params, x, cfg))(h_out)


def make_pipe_train_step(cfg: LLMConfig, mesh: Mesh, n_micro: int, optimizer=None):
    """jit'd (params, opt_state, ids) -> (params, opt_state, loss) with the
    forward/backward running the GPipe schedule; batch sharded over ``data``,
    layer stack over ``stage``. The backward pipeline falls out of
    differentiating the scan+ppermute schedule."""
    import optax

    from .train import make_optimizer

    optimizer = optimizer or make_optimizer()
    p_specs = pipe_param_pspecs(cfg)
    p_shard = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), p_specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    batch_shard = NamedSharding(mesh, P("data", None))
    scalar = NamedSharding(mesh, P())

    def loss_fn(params, ids):
        logits = pipeline_forward(params, ids, cfg, mesh, n_micro)
        targets = ids[:, 1:]
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return nll.mean()

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, ids):
        loss, grads = jax.value_and_grad(loss_fn)(params, ids)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init(params):
        params = jax.tree.map(jax.device_put, params, p_shard)
        # Adam moments mirror the param tree: match optimizer-state leaves to
        # param shardings by shape (as parallel.train does), replicate scalars.
        shapes = [l.shape for l in jax.tree.leaves(params)]
        p_flat = jax.tree.leaves(p_shard)

        def assign(leaf):
            try:
                return p_flat[shapes.index(leaf.shape)]
            except ValueError:
                return scalar

        opt_state = jax.jit(
            optimizer.init,
            out_shardings=jax.tree.map(assign, jax.eval_shape(optimizer.init, params)),
        )(params)
        return params, opt_state

    return train_step, init, batch_shard
