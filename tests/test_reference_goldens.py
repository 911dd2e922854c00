"""Golden decision tests executed against the ACTUAL reference code.

These tests import and RUN (never copy) ``framefusion.main.FrameFusion`` from
/root/reference — the reference's decision core — on tiny recorded tensors,
driving it exactly the way its patched decoder does (pre-attention call at
layer 0, post-attention call every layer with captured weights at the prune
layer; reference models/qwen2/modeling_qwen2.py:44-47, :66-68). The recorded
decisions (event trajectory, sparsity list, surviving original indices,
merged hidden values) pin our executors to TRUE reference behavior rather
than to tests/oracle.py (our own interpretation).

Known representational deltas (documented, not bugs):
  * The reference computes the cost schedule in Python float64
    (main.py:321-343); ours is fp32 by design (TPU has no fp64; see
    core/schedule.py). Decisions can differ only when a threshold comparison
    or a floor/round lands within one fp32 ulp of a boundary — the scenarios
    here (and real similarity data) stay away from such boundaries, which
    test_boundary_budget_documented demonstrates explicitly.
  * torch.topk's tie order among EQUAL similarity values is unspecified;
    the reference sorts the kept indices afterwards so only the SET matters.
    Scenario ``tie_adjacent`` places exact duplicate similarities inside the
    top-k cut to check set-level agreement.

Scope note: only ``framefusion.main`` (the decision core) is executable
here. The baseline-methods module (models/qwen2/modeling_qwen2_baseline.py)
is a patch of transformers==4.45.2 internals (``Qwen2SdpaAttention``, the
``logger`` re-export, 4.45-era mask/cache helpers) and does not import under
the installed transformers; shimming those names would execute CURRENT HF
internals under 4.45-era assumptions — not the reference's behavior. The
baselines therefore stay pinned to the independent NumPy references in
tests/test_baselines.py.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
ref_main = pytest.importorskip("framefusion.main")

import jax

from framefusion_tpu.config import FrameFusionConfig, tiny_llm_config
from framefusion_tpu.models import qwen2
from framefusion_tpu.runtime.engine import CompressionEngine

import oracle
import ref_pipeline
from test_core import make_sequence


def drive_reference(h0, patch_type, pos_ids, patch_num, img_start, img_len,
                    model, ff_cfg, num_q=1, max_layers=6, mrope=False):
    """Run the reference FrameFusion.prepare/forward through a decoder-shaped
    loop, with hidden states produced by the same NumPy stack our tests use.

    Returns dict(events, sparsity, kept_pos, hidden, layers_run).
    Events are (layer, q_len_after) pairs; layer -1 is the pre-attention call.
    """
    ff = ref_main.FrameFusion(
        cost=ff_cfg.cost,
        similarity_lower_bound=ff_cfg.similarity_lower_bound,
        ratio_lower_bound=ff_cfg.ratio_lower_bound,
    )
    s = h0.shape[0]
    ff.prepare(
        patch_type=torch.tensor(patch_type)[None],
        patch_num=patch_num,
        image_token_start_index=torch.tensor(img_start),
        image_token_end_index=torch.tensor(img_start + img_len),
        image_token_length=torch.tensor(img_len),
        original_length=s,
    )
    h_t = torch.tensor(h0, dtype=torch.float32)[None]
    if mrope:
        # 4D mRoPE branch (main.py:145-147, :165-167): [cos, sin] of shape
        # (3, bsz, S, d_pos); values carry the original position ids so the
        # surviving indices are readable afterwards.
        base = torch.tensor(pos_ids, dtype=torch.float32)
        pos_t = [
            base[None, None, :, None].repeat(3, 1, 1, 2),
            -base[None, None, :, None].repeat(3, 1, 1, 2),
        ]
    else:
        pos_t = torch.tensor(pos_ids, dtype=torch.float32)[None]  # 2D branch

    events = []

    def q_len():
        return h_t.shape[1]

    # Layer-0 pre-attention call (reference modeling_qwen2.py:44-47).
    before = q_len()
    h_t, pos_t, _ = ff(h_t, pos_t, None)
    if q_len() != before:
        events.append((-1, q_len()))

    layer = 0
    while layer < max_layers and not (ff.finish_merging and ff.finish_pruning):
        h_np = np.asarray(h_t[0], dtype=np.float32)
        pos_np = current_pos(pos_t, mrope)
        capture = num_q if (ff.finish_merging and not ff.finish_pruning) else 0
        h_mid, _, _, _ = model.layer_attn(layer, h_np, pos_np, capture_num=capture)
        weights = None
        if capture:
            weights = torch.tensor(model.last_capture_probs, dtype=torch.float32)[None]
        before = h_mid.shape[0]
        h_t, pos_t, _ = ff(torch.tensor(h_mid, dtype=torch.float32)[None], pos_t, None, weights)
        if q_len() != before:
            events.append((layer, q_len()))
        h_np = model.layer_mlp(layer, np.asarray(h_t[0], dtype=np.float32))
        h_t = torch.tensor(h_np, dtype=torch.float32)[None]
        layer += 1

    return dict(
        events=events,
        sparsity=[float(x) for x in ff.sparsity_list],
        kept_pos=current_pos(pos_t, mrope).astype(np.int64).tolist(),
        hidden=np.asarray(h_t[0], dtype=np.float32),
        layers_run=layer,
    )


def current_pos(pos_t, mrope):
    if mrope:
        return np.asarray(pos_t[0][0, 0, :, 0], dtype=np.float32)
    return np.asarray(pos_t[0], dtype=np.float32)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_llm_config(num_layers=6)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    model = ref_pipeline.RefModel(params, cfg)
    return cfg, params, model


def build(seed, coherent, n_frames=10, hidden=128):
    rng = np.random.default_rng(seed)
    h, pt, img_start, n_img = make_sequence(rng, 4, 6, n_frames, 3, hidden=hidden, coherent=coherent)
    h = (h * 0.05).astype(np.float32)
    pos = np.arange(len(pt), dtype=np.int32)
    return h, pt, pos, img_start, n_img


class TestReferenceGoldens:
    """Our executors vs the executed reference, multi-event trajectory."""

    # The reference hard-codes num_layers=28 in its cost schedule even for
    # shallower models (main.py:322, SURVEY §5) — parity requires 28 here.
    FF = FrameFusionConfig(cost=0.5, similarity_lower_bound=0.8, ratio_lower_bound=0.05,
                           schedule_num_layers=28, bucket=32)

    def run_all(self, setup, seed=0, coherent=0.3, num_q=1, ff=None):
        cfg, params, model = setup
        ff = ff or self.FF
        h, pt, pos, img_start, n_img = build(seed, coherent)
        golden = drive_reference(h, pt, pos, 6, img_start, n_img, model, ff,
                                 num_q=num_q, max_layers=cfg.num_layers, mrope=(num_q > 1))
        import dataclasses
        ours_ref = ref_pipeline.ref_compressed_prefill(params, cfg, ff, h, pt, pos, 6, img_start, n_img)
        engine = CompressionEngine(
            params, cfg, dataclasses.replace(ff, num_importance_queries=num_q), attn_impl="einsum")
        res = engine.prefill(h, pt, pos, 6, img_start, n_img)
        return golden, ours_ref, res

    def test_event_trajectory_matches_reference(self, setup):
        golden, ours_ref, res = self.run_all(setup)
        # The reference's observable is q_len shrinking (our telemetry also
        # logs zero-removal merge events the reference cannot see) — compare
        # the shrinking steps as (layer, tokens_after) pairs.
        got = []
        prev = res.telemetry.original_length
        for e in res.telemetry.events:
            if e.tokens_after != prev:
                got.append((e.layer, e.tokens_after))
            prev = e.tokens_after
        assert got == golden["events"]
        assert len(golden["events"]) >= 2, "scenario must span multiple events"

    def test_sparsity_list_matches_reference(self, setup):
        golden, ours_ref, res = self.run_all(setup)
        assert res.telemetry.sparsity_list == pytest.approx(golden["sparsity"], abs=1e-7)
        assert ours_ref["sparsity"] == pytest.approx(golden["sparsity"], abs=1e-7)

    def test_surviving_positions_match_reference(self, setup):
        golden, ours_ref, res = self.run_all(setup)
        assert ours_ref["pos"].tolist() == golden["kept_pos"]

    def test_merged_hidden_values_match_reference(self, setup):
        # The reference's index_add_-then-divide averaging vs our
        # prefix-sum/inverse-permutation formulation: same values.
        cfg, params, model = setup
        ff = self.FF
        h, pt, pos, img_start, n_img = build(0, 0.3)
        golden = drive_reference(h, pt, pos, 6, img_start, n_img, model, ff,
                                 max_layers=0)  # pre-attention event only
        res_e = oracle.merge_event(
            h, pt, ff.similarity_lower_bound,
            oracle.compute_pruning_ratio([], ff.cost, ff.schedule_num_layers), n_img)
        ours = res_e["merged"][res_e["keep"]]
        np.testing.assert_allclose(ours, golden["hidden"], rtol=1e-5, atol=1e-6)

    def test_qwen2vl_num4_and_4d_rope_branch(self, setup):
        golden, ours_ref, res = self.run_all(setup, num_q=4)
        got = []
        prev = res.telemetry.original_length
        for e in res.telemetry.events:
            if e.tokens_after != prev:
                got.append((e.layer, e.tokens_after))
            prev = e.tokens_after
        assert got == golden["events"]

    def test_tie_adjacent_capped_topk_set(self, setup):
        # Exact duplicate similarities straddling the top-k cut: the kept SET
        # must match the reference's torch.topk choice (reference sorts the
        # indices, main.py:122-124, so set equality is the contract).
        cfg, params, model = setup
        rng = np.random.default_rng(3)
        n_pre, patch_num, n_frames, n_post = 4, 6, 10, 3
        h, pt, img_start, n_img = make_sequence(rng, n_pre, patch_num, n_frames, n_post,
                                                hidden=128, coherent=0.0)
        h = (h * 0.05).astype(np.float32)
        # Plant exact duplicates: frames 3..8 of patch 0 identical to frame 2
        # -> runs of similarity exactly 1.0 (ties) among the top candidates.
        for f in range(3, 9):
            h[n_pre + f * patch_num] = h[n_pre + 2 * patch_num]
        pos = np.arange(len(pt), dtype=np.int32)
        ff = FrameFusionConfig(cost=0.8, similarity_lower_bound=0.99, ratio_lower_bound=0.001,
                               schedule_num_layers=28, bucket=32)
        golden = drive_reference(h, pt, pos, patch_num, img_start, n_img, model, ff,
                                 max_layers=cfg.num_layers)
        ours = ref_pipeline.ref_compressed_prefill(params, cfg, ff, h, pt, pos,
                                                   patch_num, img_start, n_img)
        assert sorted(ours["pos"].tolist()) == sorted(golden["kept_pos"])

    def test_boundary_budget_documented_fp32_vs_fp64(self, setup):
        # cost=0.4 over 6 layers puts the first budget at 0.6 whose fp32 and
        # fp64 chains can disagree by one token in floor(budget*frame_tok).
        # Document the actual relationship rather than assuming: both sides
        # must agree on the EVENT trajectory for this scenario (they do — the
        # capped count differs only if the fp32 product crosses an integer,
        # which this asserts it does not).
        cfg, params, model = setup
        ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.75, ratio_lower_bound=0.05,
                               schedule_num_layers=28, bucket=32)
        h, pt, pos, img_start, n_img = build(0, 0.8)
        golden = drive_reference(h, pt, pos, 6, img_start, n_img, model, ff,
                                 max_layers=cfg.num_layers)
        ours = ref_pipeline.ref_compressed_prefill(params, cfg, ff, h, pt, pos, 6, img_start, n_img)
        assert ours["final_len"] == golden["events"][-1][1]
        assert sorted(ours["pos"].tolist()) == sorted(golden["kept_pos"])


class TestReferenceScheduleGoldens:
    """_compute_pruning_ratio executed from the reference vs our fp32 twins."""

    @pytest.mark.parametrize("sparsity,cost", [
        ([], 0.3), ([0.44], 0.3), ([0.44, 0.02], 0.3), ([0.3, 0.2, 0.1], 0.5),
    ])
    def test_ratio_close_and_decisions_equal(self, sparsity, cost):
        from framefusion_tpu.core.schedule import compute_pruning_ratio

        ref_ff = ref_main.FrameFusion(cost=cost)
        want = ref_ff._compute_pruning_ratio(list(sparsity), cost)
        got = compute_pruning_ratio(list(sparsity), cost, 28)
        # fp32 vs the reference's float64: equal to ~1e-7; decision-relevant
        # products (budget * frame_tok for realistic token counts < 2^14)
        # therefore agree away from exact integer boundaries.
        assert got == pytest.approx(want, abs=2e-6)

    def test_infeasible_raises_like_reference(self):
        from framefusion_tpu.core.schedule import CostInfeasibleError, compute_pruning_ratio

        # Infeasible = cumulative density already exceeds the budget
        # (main.py:339-340): e.g. 20 zero-sparsity events under cost=0.01.
        ref_ff = ref_main.FrameFusion(cost=0.01)
        with pytest.raises(ValueError):
            ref_ff._compute_pruning_ratio([0.0] * 20, 0.01)
        with pytest.raises(CostInfeasibleError):
            compute_pruning_ratio([0.0] * 20, 0.01, 28)
