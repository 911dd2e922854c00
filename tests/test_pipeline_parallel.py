"""Pipeline parallelism (parallel/pipeline): GPipe schedule over a ``stage``
mesh axis must reproduce the unsharded batched forward exactly, and the
pipelined training step must match the (data, tensor) training step's loss.

Reference parity note: the reference's multi-GPU execution is accelerate
``device_map`` layer placement (reference interface.py:204-207) — a
1-microbatch pipeline. These tests pin that the TPU-native pipeline is
numerically the same program at any (n_micro, n_stages).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framefusion_tpu.config import tiny_llm_config
from framefusion_tpu.models import qwen2
from framefusion_tpu.parallel.pipeline import (
    make_pipe_mesh,
    make_pipe_train_step,
    pipeline_forward,
    shard_params_pipe,
)
from framefusion_tpu.parallel.train import forward_batched, lm_loss


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_llm_config(num_layers=8, vocab_size=256)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (8, 16)), jnp.int32
    )
    return cfg, params, ids


class TestPipelineForward:
    def test_matches_unsharded_stage4(self, setup):
        cfg, params, ids = setup
        mesh = make_pipe_mesh(jax.devices()[:4], stages=4)
        with mesh:
            ref = forward_batched(params, ids, cfg)
            sharded = shard_params_pipe(params, cfg, mesh)
            out = pipeline_forward(sharded, ids, cfg, mesh, n_micro=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)

    def test_matches_unsharded_stage2_data2(self, setup):
        cfg, params, ids = setup
        mesh = make_pipe_mesh(jax.devices()[:4], stages=2, data=2)
        with mesh:
            ref = forward_batched(params, ids, cfg)
            sharded = shard_params_pipe(params, cfg, mesh)
            out = pipeline_forward(sharded, ids, cfg, mesh, n_micro=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)

    def test_more_micro_than_batch_rejected(self, setup):
        cfg, params, ids = setup
        mesh = make_pipe_mesh(jax.devices()[:2], stages=2)
        with pytest.raises(AssertionError):
            pipeline_forward(params, ids[:3], cfg, mesh, n_micro=2)

    def test_layers_must_divide(self, setup):
        cfg, params, ids = setup
        mesh = make_pipe_mesh(jax.devices()[:3], stages=3)
        with pytest.raises(AssertionError):
            pipeline_forward(params, ids, cfg, mesh, n_micro=2)


class TestPipelineTrain:
    def test_loss_matches_unsharded_and_decreases(self, setup):
        cfg, params, ids = setup
        mesh = make_pipe_mesh(jax.devices()[:8], stages=4, data=2)
        train_step, init, batch_shard = make_pipe_train_step(cfg, mesh, n_micro=4)
        with mesh:
            p, opt = init(jax.tree.map(jnp.copy, params))
            batch = jax.device_put(ids, batch_shard)
            p, opt, loss0 = train_step(p, opt, batch)
            _, _, loss1 = train_step(p, opt, batch)
            ref_loss = float(lm_loss(params, ids, cfg))
        assert abs(float(loss0) - ref_loss) < 1e-3, (float(loss0), ref_loss)
        assert float(loss1) < float(loss0)

    def test_param_placement_is_stage_sharded(self, setup):
        cfg, params, _ = setup
        mesh = make_pipe_mesh(jax.devices()[:4], stages=4)
        sharded = shard_params_pipe(params, cfg, mesh)
        wq = sharded["layers"]["wq"]
        # 8 layers over 4 stages: each device holds a (2, D, D) shard.
        shard_shapes = {s.data.shape for s in wq.addressable_shards}
        assert shard_shapes == {(2, cfg.hidden_size, cfg.num_heads * cfg.head_dim_)}
