"""Qwen2-MoE sparse MLP block + expert-parallel sharding.

The reference's model zoo is dense-only, but the Qwen2 family it builds on
ships MoE variants (Qwen1.5-MoE-A2.7B, Qwen2-57B-A14B) with this exact
block: softmax router -> top-k experts (optionally re-normalised) + a
shared expert scaled by a sigmoid gate (HF
``Qwen2MoeSparseMoeBlock.forward``). Supporting it completes the
serving-scale story: expert parallelism is the ``expert`` mesh axis, the
last of the tp/pp/dp/sp/ep set.

TPU-first formulation: HF loops over experts with data-dependent
``index_add_`` — unjittable and scatter-bound. Here routing is the GShard
capacity dispatch, three einsums with static shapes:

  * position-in-expert by a cumulative sum over the (token, rank)-major
    one-hot choices; tokens beyond ``capacity`` drop (never drops when
    ``capacity >= S``, which is how parity against HF is pinned);
  * ``dispatch``  (S, E, C) one-hot gathers token rows into per-expert
    buffers via ``sec,sd->ecd`` — an MXU matmul, not a scatter;
  * experts run batched over their leading axis (``ecd,edi->eci``), so one
    einsum computes every expert — the axis XLA shards for free;
  * ``combine`` (S, E, C) carries the routing weights back (``sec,ecd->sd``).

Expert parallelism = sharding the expert-stacked weights and the (E, C, D)
buffers over the ``expert`` axis: the dispatch einsum writes each device's
expert slice locally, the combine einsum contracts over E so GSPMD inserts
one psum — the all-to-all pattern without hand-written collectives.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import LLMConfig


@dataclasses.dataclass(frozen=True)
class MoeConfig:
    hidden_size: int
    moe_intermediate_size: int
    shared_expert_intermediate_size: int
    num_experts: int = 4
    top_k: int = 2
    norm_topk_prob: bool = False  # HF qwen2_moe default
    dtype: object = jnp.float32


def tiny_moe_config(**kw) -> MoeConfig:
    base = dict(
        hidden_size=64,
        moe_intermediate_size=96,
        shared_expert_intermediate_size=128,
        num_experts=4,
        top_k=2,
    )
    base.update(kw)
    return MoeConfig(**base)


def init_moe_params(cfg: MoeConfig, key: jax.Array) -> dict:
    """Expert weights stacked on a leading E axis (the ep sharding axis)."""
    ks = jax.random.split(key, 8)
    d, i, si, e = (
        cfg.hidden_size,
        cfg.moe_intermediate_size,
        cfg.shared_expert_intermediate_size,
        cfg.num_experts,
    )

    def norm(k, *shape):
        return (jax.random.normal(k, shape) * 0.02).astype(cfg.dtype)

    return {
        "router": norm(ks[0], d, e),
        "w_gate": norm(ks[1], e, d, i),
        "w_up": norm(ks[2], e, d, i),
        "w_down": norm(ks[3], e, i, d),
        "sw_gate": norm(ks[4], d, si),
        "sw_up": norm(ks[5], d, si),
        "sw_down": norm(ks[6], si, d),
        "shared_gate": norm(ks[7], d, 1),
    }


def moe_pspecs() -> dict:
    """PartitionSpecs for ``init_moe_params``: expert stacks over ``expert``,
    router and shared expert replicated (they are dense per-token work)."""
    rep2, rep3 = P(None, None), P("expert", None, None)
    return {
        "router": rep2,
        "w_gate": rep3,
        "w_up": rep3,
        "w_down": rep3,
        "sw_gate": rep2,
        "sw_up": rep2,
        "sw_down": rep2,
        "shared_gate": rep2,
    }


def make_expert_mesh(devices=None, expert: int | None = None, data: int = 1) -> Mesh:
    import numpy as np

    devices = jax.devices() if devices is None else devices
    expert = (len(devices) // data) if expert is None else expert
    arr = np.asarray(devices[: data * expert]).reshape(data, expert)
    return Mesh(arr, ("data", "expert"))


def shard_moe_params(params: dict, mesh: Mesh) -> dict:
    shardings = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), moe_pspecs(),
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.tree.map(jax.device_put, params, shardings)


def _mm(x: jnp.ndarray, w) -> jnp.ndarray:
    """Dense matmul accepting int8 weight-only pairs (ops/quant.py layout;
    same semantics as qwen2.mm — the per-output-channel scale factors out of
    the contraction exactly, int8->dtype convert fuses into the tiles)."""
    if isinstance(w, dict):
        y = jnp.dot(x, w["q8"].astype(x.dtype), preferred_element_type=jnp.float32)
        return (y * w["scale"]).astype(x.dtype)
    return x @ w


def _expert_einsum(spec: str, a: jnp.ndarray, w) -> jnp.ndarray:
    """Batched-over-experts einsum ``(E, C, in) x (E, in, out) -> (E, C, out)``
    accepting int8 pairs: q8 (E, in, out) int8 + scale (E, out) f32."""
    if isinstance(w, dict):
        y = jnp.einsum(spec, a, w["q8"].astype(a.dtype),
                       preferred_element_type=jnp.float32)
        return (y * w["scale"][:, None, :]).astype(a.dtype)
    return jnp.einsum(spec, a, w)


def router_probs(mp: dict, x: jnp.ndarray, cfg: MoeConfig):
    """fp32 softmax over experts + top-k (HF lines: softmax -> topk ->
    optional renorm). Returns (weights (S,k) in x.dtype, idx (S,k), probs)."""
    logits = (x @ mp["router"]).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    weights, idx = jax.lax.top_k(probs, cfg.top_k)
    if cfg.norm_topk_prob:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights.astype(x.dtype), idx, probs


def sparse_mlp(
    mp: dict,
    x: jnp.ndarray,
    *,
    num_experts: int,
    top_k: int,
    norm_topk_prob: bool,
    capacity: int | None = None,
    live: jnp.ndarray | None = None,
    ep: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(S, D) -> (S, D) sparse MLP + router probs (for the aux loss).

    ``capacity`` is the per-expert token budget C; ``None`` means lossless
    (C = S, exact HF semantics). ``live`` (bool (S,)) excludes dead rows
    from routing entirely — they claim no expert slots, so mask-only
    executors (dead rows still physically present) route live tokens
    identically to compacted executors. ``ep=True`` adds ``expert``-axis
    sharding constraints on the per-expert buffers (requires an active
    mesh). ``mp`` needs keys router/w_gate/w_up/w_down/sw_*/shared_gate
    with the expert stacks' leading axis = E."""
    s, d = x.shape
    e, k = num_experts, top_k
    c = s if capacity is None else min(capacity, s)

    logits = (x @ mp["router"]).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    weights, idx = jax.lax.top_k(probs, k)
    if norm_topk_prob:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    weights = weights.astype(x.dtype)

    # GShard dispatch: rank-major priority — token t's rank-r choice beats
    # token t's rank-(r+1) everywhere (flatten (k, S) so low ranks first).
    oh = jax.nn.one_hot(idx, e, dtype=jnp.int32)  # (S, k, E)
    if live is not None:
        oh = oh * live.astype(jnp.int32)[:, None, None]
    flat = oh.transpose(1, 0, 2).reshape(k * s, e)  # rank-major
    pos_flat = jnp.cumsum(flat, axis=0) - 1  # position within expert
    pos = pos_flat.reshape(k, s, e).transpose(1, 0, 2)  # (S, k, E)
    keep = (pos < c) & (oh > 0)

    pos_oh = jax.nn.one_hot(jnp.where(keep, pos, -1), c, dtype=x.dtype)  # (S,k,E,C)
    dispatch = jnp.einsum("ske,skec->sec", oh.astype(x.dtype), pos_oh)
    combine = jnp.einsum("sk,skec->sec", weights, pos_oh)

    xe = jnp.einsum("sec,sd->ecd", dispatch, x)
    if ep:
        xe = jax.lax.with_sharding_constraint(xe, P("expert", None, None))
    gated = jax.nn.silu(_expert_einsum("ecd,edi->eci", xe, mp["w_gate"]))
    up = _expert_einsum("ecd,edi->eci", xe, mp["w_up"])
    ye = _expert_einsum("eci,eid->ecd", gated * up, mp["w_down"])
    if ep:
        ye = jax.lax.with_sharding_constraint(ye, P("expert", None, None))
    y = jnp.einsum("sec,ecd->sd", combine, ye)

    shared = _mm(jax.nn.silu(_mm(x, mp["sw_gate"])) * _mm(x, mp["sw_up"]), mp["sw_down"])
    y = y + jax.nn.sigmoid(x @ mp["shared_gate"]) * shared
    return y.astype(x.dtype), probs


def moe_prefill_capacity(s: int, cfg) -> int:
    """Per-expert token budget for an (S,)-row prefill call: the balanced
    share ``S * top_k / E`` times ``moe_capacity_factor``, rounded up to a
    lane-friendly multiple of 8 and clamped to lossless (C = S).

    Computed from the PHYSICAL row count at trace time. Cross-executor
    decision parity: dead rows are live-masked out of routing, so for the
    same live set the cumsum positions agree between mask-only and
    compacted layouts; executors can only diverge if a more-compact bucket
    lowers C below an expert's live load (capacity_factor is the headroom
    against that — raise it if telemetry shows drops at your routing
    skew)."""
    import math

    c = math.ceil(s * cfg.num_experts_per_tok / cfg.num_experts * cfg.moe_capacity_factor)
    return min(s, max(8, -(-c // 8) * 8))


def moe_mlp(
    mp: dict,
    x: jnp.ndarray,
    cfg: MoeConfig,
    *,
    capacity: int | None = None,
    ep: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Standalone-block entry point (see ``sparse_mlp`` for semantics)."""
    return sparse_mlp(
        mp, x,
        num_experts=cfg.num_experts, top_k=cfg.top_k,
        norm_topk_prob=cfg.norm_topk_prob, capacity=capacity, ep=ep,
    )


def load_balancing_loss(probs: jnp.ndarray, idx: jnp.ndarray, cfg: MoeConfig) -> jnp.ndarray:
    """Switch/GShard aux loss (HF ``load_balancing_loss_func`` semantics):
    num_experts * sum_e( fraction_tokens_e * mean_prob_e )."""
    oh = jax.nn.one_hot(idx, cfg.num_experts, dtype=jnp.float32)  # (S, k, E)
    tokens_per_expert = jnp.mean(jnp.sum(oh, axis=1), axis=0)  # (E,) in [0, k]
    router_prob = jnp.mean(probs, axis=0)
    return cfg.num_experts * jnp.sum(tokens_per_expert / cfg.top_k * router_prob)


def moe_layer(
    lp: dict,
    mp: dict,
    h: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cfg: LLMConfig,
    moe_cfg: MoeConfig,
    *,
    attn_impl: str = "einsum",
    capacity: int | None = None,
    ep: bool = False,
):
    """One Qwen2-MoE decoder layer: the standard attention block with the
    sparse MLP replacing ``layer_mlp`` (pre-norm + residual, HF
    Qwen2MoeDecoderLayer). Returns (h, router_probs)."""
    from . import qwen2

    h, _, _, _ = qwen2.layer_attention(lp, h, cos, sin, cfg, attn_impl=attn_impl)
    x = qwen2.rmsnorm(h, lp["ln2"], cfg.rms_norm_eps)
    y, probs = moe_mlp(mp, x, moe_cfg, capacity=capacity, ep=ep)
    return h + y, probs
