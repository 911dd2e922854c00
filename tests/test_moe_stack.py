"""Qwen2-MoE BACKBONE end-to-end: HF full-stack parity (Qwen2MoeForCausalLM)
and FrameFusion compression on a MoE stack with cross-executor parity.

The sparse-MLP block itself is pinned in test_moe.py; here the whole decoder
(attention + router + experts + shared expert), the weight importer, the
weight-gather decode path, and the compression executors run on MoE layer
stacks (cfg.num_experts > 0 -> stacked router/expert params, models/qwen2.py
``layer_mlp`` dispatch)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from framefusion_tpu.config import FrameFusionConfig, LLMConfig, tiny_moe_llm_config
from framefusion_tpu.models import qwen2
from framefusion_tpu.runtime.engine import CompressionEngine
from framefusion_tpu.weights import llm_config_from_hf, params_from_state_dict

from test_engine import build_inputs


def make_hf_moe(num_layers=2):
    from transformers.models.qwen2_moe.configuration_qwen2_moe import Qwen2MoeConfig
    from transformers.models.qwen2_moe.modeling_qwen2_moe import Qwen2MoeForCausalLM

    hf_cfg = Qwen2MoeConfig(
        vocab_size=160,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=num_layers,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        num_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=48,
        shared_expert_intermediate_size=96,
        norm_topk_prob=False,
        decoder_sparse_step=1,
        mlp_only_layers=[],
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Qwen2MoeForCausalLM(hf_cfg).eval()
    ours_cfg = LLMConfig(
        vocab_size=160,
        hidden_size=64,
        intermediate_size=128,
        num_layers=num_layers,
        num_heads=4,
        num_kv_heads=2,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        dtype=jnp.float32,
        num_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=48,
        shared_expert_intermediate_size=96,
        norm_topk_prob=False,
        moe_capacity_factor=4.0,  # lossless at this scale: parity vs HF
    )
    return model, ours_cfg


class TestHFStackParity:
    def test_prefill_logits_match(self):
        model, cfg = make_hf_moe()
        params = params_from_state_dict(model.state_dict(), cfg)
        rng = np.random.default_rng(0)
        ids = rng.integers(0, cfg.vocab_size, size=29)
        with torch.no_grad():
            hf_logits = model(torch.tensor(ids[None])).logits[0].numpy()
        embeds = qwen2.embed(params, jnp.asarray(ids), cfg)
        pos = jnp.arange(len(ids), dtype=jnp.int32)
        cos, sin = qwen2.positions_cos_sin(pos, cfg)
        h, _, _ = qwen2.run_layers(params, embeds, cos, sin, cfg, attn_impl="einsum")
        ours = np.asarray(qwen2.final_logits(params, h, cfg))
        np.testing.assert_allclose(ours, hf_logits, rtol=3e-4, atol=3e-4)
        np.testing.assert_array_equal(ours.argmax(-1), hf_logits.argmax(-1))

    def test_config_import_from_hf_dict(self):
        model, cfg = make_hf_moe()
        d = model.config.to_dict()
        d["architectures"] = ["Qwen2MoeForCausalLM"]
        family, got = llm_config_from_hf(d, dtype=jnp.float32)
        assert got.num_experts == cfg.num_experts
        assert got.moe_intermediate_size == cfg.moe_intermediate_size
        assert got.shared_expert_intermediate_size == cfg.shared_expert_intermediate_size
        assert got.num_experts_per_tok == cfg.num_experts_per_tok

    def test_greedy_decode_matches_hf(self):
        """Pins the weight-gather decode path (moe_decode_mlp): HBM reads only
        the routed experts, results must equal HF's full generate."""
        model, cfg = make_hf_moe()
        params = params_from_state_dict(model.state_dict(), cfg)
        rng = np.random.default_rng(2)
        prompt = rng.integers(0, cfg.vocab_size, size=13)
        n_new = 6
        with torch.no_grad():
            hf_out = model.generate(
                torch.tensor(prompt[None]), max_new_tokens=n_new, do_sample=False,
                pad_token_id=0,
            )[0].numpy()
        hf_new = hf_out[len(prompt):]

        ids = jnp.asarray(prompt)
        embeds = qwen2.embed(params, ids, cfg)
        pos = jnp.arange(len(prompt), dtype=jnp.int32)
        cos, sin = qwen2.positions_cos_sin(pos, cfg)
        h, k_all, v_all = qwen2.run_layers(params, embeds, cos, sin, cfg, attn_impl="einsum")
        logits = qwen2.final_logits(params, h[-1:], cfg)[0]

        s_pad = len(prompt) + n_new
        k_pool = jnp.zeros((cfg.num_layers, s_pad, cfg.num_kv_heads, cfg.head_dim_), cfg.dtype)
        v_pool = jnp.zeros_like(k_pool)
        k_pool = k_pool.at[:, : len(prompt)].set(k_all)
        v_pool = v_pool.at[:, : len(prompt)].set(v_all)
        cache_lens = jnp.full((cfg.num_layers,), len(prompt), jnp.int32)

        out = [int(jnp.argmax(logits))]
        for step in range(n_new - 1):
            te = qwen2.embed(params, jnp.asarray(out[-1]), cfg)
            pos_id = jnp.asarray(len(prompt) + step, jnp.int32)
            logits, k_pool, v_pool, cache_lens = qwen2.decode_step(
                params, te, pos_id, k_pool, v_pool, cache_lens, cfg
            )
            out.append(int(jnp.argmax(logits)))
        np.testing.assert_array_equal(np.asarray(out), hf_new)


@pytest.fixture(scope="module")
def moe_engine_setup():
    cfg = tiny_moe_llm_config(num_layers=6, moe_capacity_factor=4.0)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.75, ratio_lower_bound=0.05,
                           schedule_num_layers=6, bucket=32)
    return cfg, params, ff


class TestCompressionOnMoE:
    """FrameFusion executors on a MoE backbone: the live-masked routing must
    make decisions and logits agree between the mask-only fused phase and the
    compacted planned path (dead/pad rows claim no expert capacity)."""

    def _prefill(self, setup, mode, seed=0, coherent=0.8):
        cfg, params, ff = setup
        h, pt, pos, img_start, n_img = build_inputs(seed=seed, coherent=coherent)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        return engine, engine.prefill(
            h, pt, pos, patch_num=6, image_token_start=img_start,
            image_token_length=n_img, mode=mode,
        )

    def test_cross_executor_parity(self, moe_engine_setup):
        results = {}
        for mode in ("fused", "segmented", "planned"):
            _, res = self._prefill(moe_engine_setup, mode)
            results[mode] = res
        ev = {
            m: [(e.layer, e.kind, e.tokens_removed) for e in r.telemetry.events]
            for m, r in results.items()
        }
        assert ev["fused"] == ev["segmented"] == ev["planned"], ev
        assert len(ev["fused"]) > 0
        base = np.asarray(results["fused"].logits)
        for m in ("segmented", "planned"):
            np.testing.assert_allclose(
                np.asarray(results[m].logits), base, rtol=2e-3, atol=2e-3
            )
            assert results[m].valid_len == results["fused"].valid_len

    def test_greedy_decode_runs(self, moe_engine_setup):
        engine, res = self._prefill(moe_engine_setup, "fused")
        toks = engine.generate_greedy(res, max_new_tokens=4)
        assert len(toks) == 4 and all(0 <= t < moe_engine_setup[0].vocab_size for t in toks)

    def test_w8a8_rejected_on_moe(self, moe_engine_setup):
        cfg, params, _ = moe_engine_setup
        lp = qwen2.layer_slice(params["layers"], 0)
        h = jnp.zeros((8, cfg.hidden_size), jnp.float32)
        with pytest.raises(NotImplementedError):
            qwen2.layer_mlp(lp, h, cfg, w8a8=True)


class TestShardedMoEInference:
    def test_expert_sharded_prefill_matches_unsharded(self, moe_engine_setup):
        """TP mesh on a MoE stack = expert parallelism (the expert axis takes
        the tensor slot, parallel.sharding.param_pspecs): same engine
        programs, same decisions, matching logits."""
        from framefusion_tpu.parallel.sharding import make_mesh, shard_params

        cfg, params, ff = moe_engine_setup
        h, pt, pos, img_start, n_img = build_inputs(seed=0, coherent=0.8)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        res_ref = engine.prefill(h, pt, pos, 6, img_start, n_img)

        mesh = make_mesh(jax.devices()[:4], tensor=2)
        with mesh:
            sharded = shard_params(params, cfg, mesh)
            engine_ep = CompressionEngine(sharded, cfg, ff, attn_impl="einsum")
            res_ep = engine_ep.prefill(h, pt, pos, 6, img_start, n_img)

        assert res_ep.valid_len == res_ref.valid_len
        got = [(e.layer, e.kind, e.tokens_removed) for e in res_ep.telemetry.events]
        want = [(e.layer, e.kind, e.tokens_removed) for e in res_ref.telemetry.events]
        assert got == want
        np.testing.assert_allclose(
            np.asarray(res_ep.logits), np.asarray(res_ref.logits), rtol=2e-3, atol=2e-3
        )
        assert {s.data.shape[1] for s in sharded["layers"]["w_gate"].addressable_shards} == {
            cfg.num_experts // 2
        }


class TestMoeInt8:
    """int8 weight-only quant on MoE stacks: the expert stacks quantize
    per-(layer, expert, out-channel); decode gathers int8 experts (half the
    activated-parameter HBM traffic again)."""

    def test_expert_stack_quantizes_4d(self):
        from framefusion_tpu.ops.quant import dequantize_weight, quantize_weight

        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((3, 4, 16, 8)), jnp.float32)
        wq = quantize_weight(w.copy())
        assert wq["q8"].shape == (3, 4, 16, 8) and wq["scale"].shape == (3, 4, 8)
        err = np.abs(np.asarray(dequantize_weight(wq)) - np.asarray(w))
        halfstep = np.asarray(wq["scale"])[:, :, None, :] / 2 + 1e-7
        assert (err <= halfstep).all()

    def test_moe_engine_int8_decisions_and_decode(self):
        from framefusion_tpu.ops.quant import quantize_params_int8

        cfg = tiny_moe_llm_config(num_layers=4)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
        ff = FrameFusionConfig(cost=0.5, similarity_lower_bound=0.8, ratio_lower_bound=0.05,
                               schedule_num_layers=4, bucket=32)
        h, pt, pos, img_start, n_img = build_inputs(seed=0, coherent=0.8)

        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        res = engine.prefill(h, pt, pos, 6, img_start, n_img)

        qparams = quantize_params_int8(jax.tree.map(jnp.copy, params))
        assert isinstance(qparams["layers"]["w_gate"], dict)  # expert stack went int8
        assert isinstance(qparams["layers"]["sw_up"], dict)   # shared expert too
        assert not isinstance(qparams["layers"]["router"], dict)  # router stays bf16
        engine_q = CompressionEngine(qparams, cfg, ff, attn_impl="einsum")
        res_q = engine_q.prefill(h, pt, pos, 6, img_start, n_img)

        assert res_q.valid_len == res.valid_len
        got = [(e.layer, e.kind, e.tokens_removed) for e in res_q.telemetry.events]
        want = [(e.layer, e.kind, e.tokens_removed) for e in res.telemetry.events]
        assert got == want
        a, b = np.asarray(res_q.logits), np.asarray(res.logits)
        cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.99

        toks = engine_q.generate_greedy(res_q, max_new_tokens=4)
        assert len(toks) == 4
        # spec decode rides the same gathered-int8 weights
        res_q2 = engine_q.prefill(h, pt, pos, 6, img_start, n_img)
        assert engine_q.generate_spec(res_q2, 4, draft_len=2) == toks

    def test_int8_expert_gather_matches_dequantized(self):
        """mm on a gathered int8 expert == matmul against the dequantized
        expert (the scale factors out exactly; only w rounding differs)."""
        from framefusion_tpu.ops.quant import dequantize_weight, quantize_weight

        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.standard_normal((4, 16, 8)), jnp.float32)
        wq = quantize_weight(w.copy())
        e = jnp.int32(2)
        g = qwen2._gather_expert(wq, e)
        x = jnp.asarray(rng.standard_normal((1, 16)), jnp.float32)
        got = qwen2.mm(x, g)
        want = x @ dequantize_weight(wq)[2]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


class TestCapacityDropSemantics:
    def test_tight_capacity_changes_only_overflow_tokens(self):
        """Documented semantics: with factor-limited capacity, overflow
        routing drops to the shared expert; live-masked routing means a
        token's result depends only on live tokens ahead of it in rank
        order."""
        cfg = tiny_moe_llm_config(moe_capacity_factor=4.0)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
        lp = qwen2.layer_slice(params["layers"], 0)
        rng = np.random.default_rng(0)
        h = jnp.asarray(rng.standard_normal((16, cfg.hidden_size)) * 0.05, jnp.float32)
        live = jnp.arange(16) < 12
        y_live = qwen2.layer_mlp(lp, h, cfg, live=live)
        # Same live rows compacted to the front of a smaller buffer: the MoE
        # routing must produce identical outputs for those rows.
        y_compact = qwen2.layer_mlp(lp, h[:12], cfg)
        np.testing.assert_allclose(
            np.asarray(y_live[:12]), np.asarray(y_compact), rtol=1e-5, atol=1e-5
        )
