"""Sharded training step (next-token LM loss) over the Qwen2 stack.

The reference is inference-only; this exists for two reasons: (a) the
framework's 72B stretch configs need the same TP/DP sharding machinery for
sharded *inference*, and (b) fine-tuning the backbone after token-compression
changes is the natural extension point. The step is a single ``jit`` over a
(data, tensor) mesh: batch sharded over ``data``, heads/MLP over ``tensor``,
gradients reduced by GSPMD automatically, layers scanned with rematerialisation
(``jax.checkpoint``) to trade FLOPs for HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import LLMConfig
from ..models import qwen2


def forward_batched(params: dict, ids: jnp.ndarray, cfg: LLMConfig) -> jnp.ndarray:
    """(B, T) token ids -> (B, T, V) logits; scan over stacked layer params."""
    b, t = ids.shape
    h = jnp.take(params["embed"], ids, axis=0)
    pos = jnp.arange(t, dtype=jnp.int32)
    cos, sin = qwen2.positions_cos_sin(pos, cfg)

    @jax.checkpoint
    def one_layer(h, lp):
        def single(hs):
            hs, _, _, _ = qwen2.layer_attention(lp, hs, cos, sin, cfg, attn_impl="einsum")
            return qwen2.layer_mlp(lp, hs, cfg)

        h = jax.vmap(single)(h)
        h = jax.lax.with_sharding_constraint(h, P("data", None, None))
        return h, None

    h, _ = jax.lax.scan(one_layer, h, params["layers"])
    return jax.vmap(lambda x: qwen2.final_logits(params, x, cfg))(h)


def lm_loss(params: dict, ids: jnp.ndarray, cfg: LLMConfig) -> jnp.ndarray:
    logits = forward_batched(params, ids, cfg)
    targets = ids[:, 1:]
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return nll.mean()


def make_optimizer(lr: float = 1e-4):
    return optax.adamw(lr, weight_decay=0.01)


def make_train_step(cfg: LLMConfig, mesh, optimizer=None):
    """Returns (train_step, init_opt_state) jitted over the mesh.

    Shardings: params per ``param_shardings``; optimizer state mirrors the
    params (FSDP-style sharded moments come free from matching specs); batch
    over ``data``.
    """
    from .sharding import param_shardings

    optimizer = optimizer or make_optimizer()
    p_shard = param_shardings(cfg, mesh)
    batch_shard = NamedSharding(mesh, P("data", None))
    scalar = NamedSharding(mesh, P())

    def opt_shardings(params):
        state_shape = jax.eval_shape(optimizer.init, params)

        def match(leaf_shape):
            # Moments share the param tree structure; anything else replicates.
            return scalar

        # Map param-shaped leaves in the optimizer state to the param shardings.
        flat_params, treedef = jax.tree.flatten(params)
        shapes = [l.shape for l in flat_params]
        p_flat = jax.tree.leaves(p_shard)

        def assign(leaf):
            try:
                idx = shapes.index(leaf.shape)
                return p_flat[idx]
            except ValueError:
                return scalar

        return jax.tree.map(assign, state_shape)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, ids):
        loss, grads = jax.value_and_grad(lm_loss)(params, ids, cfg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init(params):
        params = jax.tree.map(jax.device_put, params, p_shard)
        opt_state = jax.jit(optimizer.init, out_shardings=opt_shardings(params))(params)
        return params, opt_state

    return train_step, init, batch_shard
