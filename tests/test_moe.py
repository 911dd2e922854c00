"""Qwen2-MoE sparse block: HF parity, capacity semantics, expert-parallel
sharding (models/moe.py). The HF oracle is transformers'
``Qwen2MoeSparseMoeBlock`` (the exact block in Qwen1.5-MoE / Qwen2-57B-A14B);
with lossless capacity the einsum dispatch must reproduce its loop+index_add_
forward bit-for-bit up to fp tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framefusion_tpu.models.moe import (
    MoeConfig,
    init_moe_params,
    load_balancing_loss,
    make_expert_mesh,
    moe_layer,
    moe_mlp,
    router_probs,
    shard_moe_params,
    tiny_moe_config,
)


@pytest.fixture(scope="module")
def block():
    cfg = tiny_moe_config(num_experts=4, top_k=2)
    params = init_moe_params(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((24, cfg.hidden_size)) * 0.5,
        jnp.float32,
    )
    return cfg, params, x


def _hf_block(cfg: MoeConfig, params: dict, norm_topk: bool):
    torch = pytest.importorskip("torch")
    from transformers.models.qwen2_moe.configuration_qwen2_moe import Qwen2MoeConfig
    from transformers.models.qwen2_moe.modeling_qwen2_moe import Qwen2MoeSparseMoeBlock

    hf_cfg = Qwen2MoeConfig(
        hidden_size=cfg.hidden_size,
        moe_intermediate_size=cfg.moe_intermediate_size,
        shared_expert_intermediate_size=cfg.shared_expert_intermediate_size,
        num_experts=cfg.num_experts,
        num_experts_per_tok=cfg.top_k,
        norm_topk_prob=norm_topk,
    )
    blk = Qwen2MoeSparseMoeBlock(hf_cfg).eval()

    def t(a):
        return torch.from_numpy(np.asarray(a, np.float32))

    with torch.no_grad():
        blk.gate.weight.copy_(t(params["router"]).T)
        for i, ex in enumerate(blk.experts):
            ex.gate_proj.weight.copy_(t(params["w_gate"][i]).T)
            ex.up_proj.weight.copy_(t(params["w_up"][i]).T)
            ex.down_proj.weight.copy_(t(params["w_down"][i]).T)
        blk.shared_expert.gate_proj.weight.copy_(t(params["sw_gate"]).T)
        blk.shared_expert.up_proj.weight.copy_(t(params["sw_up"]).T)
        blk.shared_expert.down_proj.weight.copy_(t(params["sw_down"]).T)
        blk.shared_expert_gate.weight.copy_(t(params["shared_gate"]).T)
    return blk, torch


class TestHFParity:
    @pytest.mark.parametrize("norm_topk", [False, True])
    def test_block_matches_hf(self, block, norm_topk):
        cfg, params, x = block
        cfg = MoeConfig(**{**cfg.__dict__, "norm_topk_prob": norm_topk})
        blk, torch = _hf_block(cfg, params, norm_topk)
        with torch.no_grad():
            ref, ref_logits = blk(torch.from_numpy(np.asarray(x))[None])
        y, probs = moe_mlp(params, x, cfg)  # lossless capacity
        np.testing.assert_allclose(np.asarray(y), ref[0].numpy(), atol=2e-5, rtol=2e-5)
        ref_probs = torch.softmax(ref_logits.float(), dim=-1).numpy()
        np.testing.assert_allclose(np.asarray(probs), ref_probs, atol=1e-5, rtol=1e-5)


class TestCapacity:
    def test_lossless_capacity_equals_default(self, block):
        cfg, params, x = block
        y0, _ = moe_mlp(params, x, cfg)
        y1, _ = moe_mlp(params, x, cfg, capacity=x.shape[0])
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    def test_dropped_tokens_keep_shared_expert_only(self, block):
        cfg, params, x = block
        y, _ = moe_mlp(params, x, cfg, capacity=1)
        assert np.isfinite(np.asarray(y)).all()
        # With C=1, at most E*C routed slots per rank survive; some token must
        # fall back to the shared expert alone — i.e. differ from lossless.
        y_full, _ = moe_mlp(params, x, cfg)
        assert not np.allclose(np.asarray(y), np.asarray(y_full))
        shared = (
            jax.nn.silu(x @ params["sw_gate"]) * (x @ params["sw_up"]) @ params["sw_down"]
        )
        shared = jax.nn.sigmoid(x @ params["shared_gate"]) * shared
        # Rank-major priority: the first token's top-1 choice is never dropped.
        assert not np.allclose(np.asarray(y[0]), np.asarray(shared[0]))

    def test_priority_is_rank_major(self, block):
        """A rank-1 (top) assignment of a later token survives over a rank-2
        assignment of an earlier token when capacity is tight."""
        cfg, params, x = block
        weights, idx, _ = router_probs(params, x, cfg)
        idx = np.asarray(idx)
        # find an expert chosen as rank-2 by an early token and rank-1 later
        e_counts = {}
        for e in range(cfg.num_experts):
            rank1 = np.where(idx[:, 0] == e)[0]
            rank2 = np.where(idx[:, 1] == e)[0]
            if len(rank1) and len(rank2) and rank2[0] < rank1[-1]:
                e_counts[e] = (rank2[0], rank1[-1])
        if not e_counts:
            pytest.skip("routing produced no rank inversion at this seed")
        # capacity equal to the number of rank-1 users: every rank-1 claim
        # fits, so the early rank-2 claim must be the one dropped.
        e, (t2, t1) = next(iter(e_counts.items()))
        c = int((idx[:, 0] == e).sum())
        y_tight, _ = moe_mlp(params, x, cfg, capacity=max(c, 1))
        assert np.isfinite(np.asarray(y_tight)).all()


class TestExpertParallel:
    def test_ep_sharded_matches_unsharded(self, block):
        cfg, params, x = block
        y_ref, probs_ref = moe_mlp(params, x, cfg)
        mesh = make_expert_mesh(jax.devices()[:4], expert=4)
        with jax.set_mesh(mesh):
            sharded = shard_moe_params(params, mesh)
            y, probs = jax.jit(
                lambda p, x: moe_mlp(p, x, cfg, ep=True)
            )(sharded, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(probs), np.asarray(probs_ref), atol=1e-6)
        wg = sharded["w_gate"]
        assert {s.data.shape for s in wg.addressable_shards} == {
            (1, cfg.hidden_size, cfg.moe_intermediate_size)
        }


class TestAuxLossAndLayer:
    def test_balanced_router_gives_unit_loss(self):
        cfg = tiny_moe_config(num_experts=4, top_k=2)
        s = 64
        probs = jnp.full((s, 4), 0.25)
        idx = jnp.stack([jnp.arange(s) % 4, (jnp.arange(s) + 1) % 4], axis=1)
        loss = load_balancing_loss(probs, idx, cfg)
        np.testing.assert_allclose(float(loss), 1.0, atol=1e-6)

    def test_moe_layer_runs(self, block):
        from framefusion_tpu.config import tiny_llm_config
        from framefusion_tpu.models import qwen2

        moe_cfg, mp, _ = block
        cfg = tiny_llm_config(num_layers=1, hidden_size=moe_cfg.hidden_size,
                              num_heads=4, num_kv_heads=2)
        lp = qwen2.layer_slice(qwen2.init_params(cfg, jax.random.PRNGKey(1))["layers"], 0)
        h = jnp.asarray(
            np.random.default_rng(1).standard_normal((16, cfg.hidden_size)) * 0.05,
            jnp.float32,
        )
        cos, sin = qwen2.positions_cos_sin(jnp.arange(16, dtype=jnp.int32), cfg)
        h_out, probs = moe_layer(lp, mp, h, cos, sin, cfg, moe_cfg)
        assert h_out.shape == h.shape and probs.shape == (16, moe_cfg.num_experts)
        assert np.isfinite(np.asarray(h_out)).all()
