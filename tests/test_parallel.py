"""Multi-chip tests on the 8-virtual-device CPU mesh: sharded training step
and tensor-parallel compressed inference (the 72B stretch path,
BASELINE.json configs[4])."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from framefusion_tpu.config import FrameFusionConfig, tiny_llm_config
from framefusion_tpu.models import qwen2
from framefusion_tpu.parallel.sharding import make_mesh, param_shardings, shard_params
from framefusion_tpu.parallel.train import make_train_step
from framefusion_tpu.runtime.engine import CompressionEngine

from test_core import make_sequence

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


class TestMesh:
    def test_mesh_factorization(self):
        mesh = make_mesh(jax.devices()[:8], tensor=2)
        assert mesh.shape == {"data": 4, "tensor": 2}
        mesh = make_mesh(jax.devices()[:8])
        assert mesh.shape["data"] * mesh.shape["tensor"] == 8

    def test_param_shardings_cover_pytree(self):
        cfg = tiny_llm_config()
        mesh = make_mesh(jax.devices()[:8], tensor=2)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
        shardings = param_shardings(cfg, mesh)
        assert jax.tree.structure(params) == jax.tree.structure(shardings)


class TestTrainStep:
    def test_loss_decreases(self):
        cfg = tiny_llm_config(num_layers=2, vocab_size=128)
        mesh = make_mesh(jax.devices()[:8], tensor=2)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
        train_step, init, batch_shard = make_train_step(cfg, mesh)
        with mesh:
            params, opt_state = init(params)
            rng = np.random.default_rng(0)
            batch = jax.device_put(jnp.asarray(rng.integers(0, 128, (8, 16))), batch_shard)
            losses = []
            for _ in range(5):
                params, opt_state, loss = train_step(params, opt_state, batch)
                losses.append(float(loss))
        assert losses[-1] < losses[0]


class TestShardedInference:
    """Tensor-parallel compressed prefill: shard the params over the mesh and
    run the SAME engine programs — GSPMD partitions them; results must match
    the unsharded run exactly (same decisions) and numerically closely."""

    def test_fused_prefill_matches_unsharded(self):
        cfg = tiny_llm_config(num_layers=4)
        ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.75,
                               ratio_lower_bound=0.05, schedule_num_layers=4, bucket=32)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        h, pt, img_start, n_img = make_sequence(rng, 4, 6, 10, 3, hidden=cfg.hidden_size, coherent=0.8)
        h = (h * 0.05).astype(np.float32)
        pos = np.arange(len(pt), dtype=np.int32)

        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        res_ref = engine.prefill(h, pt, pos, 6, img_start, n_img)

        mesh = make_mesh(jax.devices()[:8], tensor=2)
        with mesh:
            sharded = shard_params(params, cfg, mesh)
            engine_tp = CompressionEngine(sharded, cfg, ff, attn_impl="einsum")
            res_tp = engine_tp.prefill(h, pt, pos, 6, img_start, n_img)

        assert res_tp.valid_len == res_ref.valid_len
        got = [(e.layer, e.kind, e.tokens_removed) for e in res_tp.telemetry.events]
        want = [(e.layer, e.kind, e.tokens_removed) for e in res_ref.telemetry.events]
        assert got == want
        np.testing.assert_allclose(
            np.asarray(res_tp.logits), np.asarray(res_ref.logits), rtol=2e-3, atol=2e-3
        )

    def test_dense_prefill_and_decode_sharded(self):
        cfg = tiny_llm_config(num_layers=2)
        ff = FrameFusionConfig()
        params = qwen2.init_params(cfg, jax.random.PRNGKey(1))
        rng = np.random.default_rng(1)
        h = (rng.standard_normal((40, cfg.hidden_size)) * 0.05).astype(np.float32)
        pos = np.arange(40, dtype=np.int32)

        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        toks_ref = engine.generate_greedy(engine.dense_prefill(h, pos), max_new_tokens=4)

        mesh = make_mesh(jax.devices()[:8], tensor=2)
        with mesh:
            sharded = shard_params(params, cfg, mesh)
            engine_tp = CompressionEngine(sharded, cfg, ff, attn_impl="einsum")
            toks_tp = engine_tp.generate_greedy(engine_tp.dense_prefill(h, pos), max_new_tokens=4)
        assert toks_tp == toks_ref

    def test_spec_decode_sharded(self):
        """Speculative decode under tensor parallelism: the verify pass is
        the same einsum stack, so GSPMD partitions it like decode — tokens
        must match the unsharded plain greedy run."""
        cfg = tiny_llm_config(num_layers=4)
        ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.75,
                               ratio_lower_bound=0.05, schedule_num_layers=4, bucket=32)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        h, pt, img_start, n_img = make_sequence(rng, 4, 6, 10, 3, hidden=cfg.hidden_size, coherent=0.5)
        h = (h * 0.05).astype(np.float32)
        pos = np.arange(len(pt), dtype=np.int32)

        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        want = engine.generate_greedy(engine.prefill(h, pt, pos, 6, img_start, n_img), 12)

        mesh = make_mesh(jax.devices()[:8], tensor=2)
        with mesh:
            sharded = shard_params(params, cfg, mesh)
            engine_tp = CompressionEngine(sharded, cfg, ff, attn_impl="einsum")
            res = engine_tp.prefill(h, pt, pos, 6, img_start, n_img)
            got = engine_tp.generate_spec(res, 12, draft_len=4)
        assert got == want

    def test_serving_loop_sharded(self):
        """The continuous-batching chunk program partitions under TP too:
        requests served on a sharded engine match the unsharded solo runs."""
        from framefusion_tpu.models.adapters.common import PrefillInputs
        from framefusion_tpu.runtime.serving import ServeRequest, ServingLoop

        cfg = tiny_llm_config(num_layers=4)
        ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.75,
                               ratio_lower_bound=0.05, schedule_num_layers=4, bucket=32)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))

        def inputs(seed):
            rng = np.random.default_rng(seed)
            h, pt, img_start, n_img = make_sequence(rng, 4, 6, 10, 3,
                                                    hidden=cfg.hidden_size, coherent=0.5)
            h = (h * 0.05).astype(np.float32)
            return PrefillInputs(input_embeds=h, patch_type=pt,
                                 position_ids=np.arange(len(pt), dtype=np.int32),
                                 patch_num=6, image_token_start=img_start,
                                 image_token_length=n_img)

        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        want = []
        for seed in (0, 1, 2):
            inp = inputs(seed)
            res = engine.prefill(inp.input_embeds, inp.patch_type, inp.position_ids,
                                 patch_num=6, image_token_start=inp.image_token_start,
                                 image_token_length=inp.image_token_length)
            want.append(engine.generate_greedy(res, 10))

        mesh = make_mesh(jax.devices()[:8], tensor=2)
        with mesh:
            sharded = shard_params(params, cfg, mesh)
            engine_tp = CompressionEngine(sharded, cfg, ff, attn_impl="einsum")
            loop = ServingLoop(engine_tp, max_slots=2, max_new_cap=10,
                               chunk_steps=3, prefix_cap=128)
            ids = [loop.submit(ServeRequest(inputs(s), max_new_tokens=10))
                   for s in (0, 1, 2)]
            results = loop.run()
        assert [results[i].tokens for i in ids] == want


class TestSeqShardedCompression:
    """Sequence-sharded compressed prefill (the 72B/256-frame stretch path,
    SURVEY §7 'hard parts'): per-layer compute sharded over an 8-way seq
    mesh via shard_map, decisions replicated — events, final length and
    logits must match the unsharded engine."""

    def _inputs(self, cfg, seed=0, coherent=0.8, n_frames=12):
        rng = np.random.default_rng(seed)
        h, pt, img_start, n_img = make_sequence(rng, 5, 6, n_frames, 4,
                                                hidden=cfg.hidden_size, coherent=coherent)
        h = (h * 0.05).astype(np.float32)
        pos = np.arange(len(pt), dtype=np.int32)
        return h, pt, pos, img_start, n_img

    def test_matches_unsharded_engine(self):
        from framefusion_tpu.parallel.seq_shard import make_seq_mesh, seq_sharded_prefill

        # 72B-shaped (deep, GQA) scaled down: 8 q heads / 2 kv heads.
        cfg = tiny_llm_config(num_layers=6, num_heads=8, num_kv_heads=2)
        ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.75,
                               ratio_lower_bound=0.05, schedule_num_layers=6, bucket=32)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
        h, pt, pos, img_start, n_img = self._inputs(cfg)

        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        ref = engine.prefill(h, pt, pos, 6, img_start, n_img)

        mesh = make_seq_mesh(jax.devices()[:8])
        logits, telemetry, valid = seq_sharded_prefill(
            params, cfg, ff, h, pt, pos, 6, img_start, n_img, mesh
        )
        got = [(e.layer, e.kind, e.tokens_removed) for e in telemetry.events]
        want = [(e.layer, e.kind, e.tokens_removed) for e in ref.telemetry.events]
        assert got == want
        assert valid == ref.valid_len
        assert telemetry.sparsity_list == pytest.approx(ref.telemetry.sparsity_list, abs=1e-7)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(ref.logits),
                                   rtol=2e-3, atol=2e-3)
        assert int(np.argmax(np.asarray(logits))) == int(np.argmax(np.asarray(ref.logits)))

    def test_ring_attention_matches_unsharded(self):
        """ring=True: K/V blocks rotate via ppermute (no gathered KV
        transient); decisions, final length and logits must still match the
        unsharded engine — including through a capture layer, which falls
        back to the gather path per design."""
        from framefusion_tpu.parallel.seq_shard import make_seq_mesh, seq_sharded_prefill

        cfg = tiny_llm_config(num_layers=6, num_heads=8, num_kv_heads=2)
        ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.75,
                               ratio_lower_bound=0.05, schedule_num_layers=6, bucket=32)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
        h, pt, pos, img_start, n_img = self._inputs(cfg, coherent=0.55)

        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        ref = engine.prefill(h, pt, pos, 6, img_start, n_img)
        assert any(e.kind == "prune" for e in ref.telemetry.events), "want a capture layer"

        mesh = make_seq_mesh(jax.devices()[:8])
        logits, telemetry, valid = seq_sharded_prefill(
            params, cfg, ff, h, pt, pos, 6, img_start, n_img, mesh, ring=True
        )
        got = [(e.layer, e.kind, e.tokens_removed) for e in telemetry.events]
        want = [(e.layer, e.kind, e.tokens_removed) for e in ref.telemetry.events]
        assert got == want
        assert valid == ref.valid_len
        np.testing.assert_allclose(np.asarray(logits), np.asarray(ref.logits),
                                   rtol=2e-3, atol=2e-3)

    def test_mrope_num4_capture(self):
        """The stretch config is Qwen2.5-VL: 3D mRoPE + 4-row capture must
        survive sequence sharding (the psum'd partial-importance path)."""
        from framefusion_tpu.parallel.seq_shard import make_seq_mesh, seq_sharded_prefill

        cfg = tiny_llm_config(num_layers=5, num_heads=8, num_kv_heads=2).replace(
            mrope_section=(2, 3, 3)
        )
        ff = FrameFusionConfig(cost=0.35, similarity_lower_bound=0.7,
                               ratio_lower_bound=0.05, schedule_num_layers=5, bucket=32,
                               num_importance_queries=4)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(1))
        h, pt, pos1d, img_start, n_img = self._inputs(cfg, seed=3, coherent=0.55)
        pos = np.tile(pos1d, (3, 1))

        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        ref = engine.prefill(h, pt, pos, 6, img_start, n_img)
        assert any(e.kind == "prune" for e in ref.telemetry.events), "want a prune event"

        mesh = make_seq_mesh(jax.devices()[:8])
        logits, telemetry, valid = seq_sharded_prefill(
            params, cfg, ff, h, pt, pos, 6, img_start, n_img, mesh
        )
        got = [(e.layer, e.kind, e.tokens_removed) for e in telemetry.events]
        want = [(e.layer, e.kind, e.tokens_removed) for e in ref.telemetry.events]
        assert got == want
        assert valid == ref.valid_len
        np.testing.assert_allclose(np.asarray(logits), np.asarray(ref.logits),
                                   rtol=2e-3, atol=2e-3)


class TestLargeModelSharding:
    """72B-stretch shape checks: Qwen2.5-VL-72B geometry shards cleanly
    (tensor axis divides heads/kv-heads/mlp), and a scaled-down deep variant
    runs the compressed prefill tensor-parallel."""

    def test_72b_config_shards(self):
        from framefusion_tpu.config import qwen25_vl_72b_config
        from framefusion_tpu.parallel.sharding import param_pspecs

        cfg = qwen25_vl_72b_config()
        assert cfg.num_kv_heads % 4 == 0 and cfg.num_heads % 8 == 0
        assert cfg.intermediate_size % 8 == 0
        specs = param_pspecs(cfg)
        assert specs["layers"]["wq"] == jax.sharding.PartitionSpec(None, None, "tensor")

    def test_deep_tp4_compressed_prefill(self):
        from framefusion_tpu.config import qwen25_vl_72b_config

        cfg = qwen25_vl_72b_config(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_layers=6, num_heads=8, num_kv_heads=4, head_dim=16,
            mrope_section=(2, 3, 3), dtype=jnp.float32,
        )
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
        ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.75,
                               ratio_lower_bound=0.05, schedule_num_layers=6,
                               bucket=32, num_importance_queries=4)
        rng = np.random.default_rng(0)
        h, pt, img_start, n_img = make_sequence(rng, 4, 6, 10, 3, hidden=cfg.hidden_size, coherent=0.8)
        h = (h * 0.05).astype(np.float32)
        pos3d = np.tile(np.arange(len(pt), dtype=np.int32), (3, 1))

        mesh = make_mesh(jax.devices()[:8], tensor=4)
        with mesh:
            sharded = shard_params(params, cfg, mesh)
            engine = CompressionEngine(sharded, cfg, ff, attn_impl="einsum")
            res = engine.prefill(h, pt, pos3d, 6, img_start, n_img)
            toks = engine.generate_greedy(res, max_new_tokens=3)
        assert res.valid_len < len(pt)
        assert len(toks) == 3
