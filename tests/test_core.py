"""Unit tests: framefusion_tpu.core vs the NumPy decision oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from framefusion_tpu.core import (
    PAD_TOKEN,
    TEXT_TOKEN,
    CostInfeasibleError,
    apply_merge,
    bucket_length,
    compact_tokens,
    compute_pruning_ratio,
    mark_topk,
    order_by_patch,
    prune_keep_mask,
    similarity_by_patch,
)

import oracle


def make_sequence(rng, n_pre_text, patch_num, n_frames, n_post_text, hidden=16, coherent=0.7):
    """Synthetic prefill: text + (frames x patches) + text.

    ``coherent`` fraction of (patch, frame-transition) pairs are
    near-duplicates of the previous frame so that the similarity threshold
    actually fires. The perturbation scale varies per pair so similarities
    spread over a wide range instead of clustering at ~0.9999 — decision
    parity between differently-fused fp32 programs is only well-defined when
    the top-k boundary does not fall inside an ulp-scale tie cluster (see
    core/merge.py tie policy).
    """
    n_img = patch_num * n_frames
    s = n_pre_text + n_img + n_post_text
    patch_type = np.full(s, TEXT_TOKEN, dtype=np.int32)
    patch_type[n_pre_text : n_pre_text + n_img] = np.tile(np.arange(patch_num), n_frames)
    h = rng.standard_normal((s, hidden)).astype(np.float32)
    for f in range(1, n_frames):
        for p in range(patch_num):
            if rng.random() < coherent:
                i = n_pre_text + f * patch_num + p
                prev = n_pre_text + (f - 1) * patch_num + p
                scale = rng.uniform(0.05, 0.6)
                h[i] = h[prev] + scale * rng.standard_normal(hidden)
    return h, patch_type, n_pre_text, n_img


class TestSchedule:
    def test_matches_oracle(self):
        for sl in [[], [0.3], [0.25, 0.2], [0.5, 0.1, 0.05]]:
            assert compute_pruning_ratio(sl, 0.3) == pytest.approx(oracle.compute_pruning_ratio(sl, 0.3))

    def test_zero_when_budget_satisfied(self):
        # Heavy early merging => remaining layers can run dense.
        assert compute_pruning_ratio([0.9, 0.9], 0.5) == 0.0

    def test_infeasible_raises(self):
        with pytest.raises(CostInfeasibleError):
            compute_pruning_ratio([0.0] * 20, 0.3)

    def test_dense_first_event(self):
        # No compression yet, cost=1.0 => no sparsity needed.
        assert compute_pruning_ratio([], 1.0) == 0.0


class TestPatchOrder:
    def test_contiguous_layout(self):
        rng = np.random.default_rng(0)
        h, pt, _, n_img = make_sequence(rng, 3, 4, 5, 2)
        ref_order = oracle.order_by_patch(pt, 4)
        order, n = order_by_patch(jnp.asarray(pt), jnp.ones(len(pt), bool), 4)
        assert int(n) == n_img == len(ref_order)
        np.testing.assert_array_equal(np.asarray(order)[:n_img], ref_order)

    def test_interleaved_layout(self):
        # InternVL-style: FrameN: <image> prompts interleave text between frames.
        pt = np.array([-1, 0, 1, 2, -1, -1, 0, 1, 2, -1, 0, 1, 2, -1], dtype=np.int32)
        ref_order = oracle.order_by_patch(pt, 3)
        order, n = order_by_patch(jnp.asarray(pt), jnp.ones(len(pt), bool), 3)
        np.testing.assert_array_equal(np.asarray(order)[: int(n)], ref_order)

    def test_padding_excluded(self):
        pt = np.array([0, 1, 0, 1, PAD_TOKEN, PAD_TOKEN], dtype=np.int32)
        valid = np.array([1, 1, 1, 1, 0, 0], dtype=bool)
        order, n = order_by_patch(jnp.asarray(pt), jnp.asarray(valid), 2)
        assert int(n) == 4
        np.testing.assert_array_equal(np.asarray(order)[:4], [0, 2, 1, 3])


class TestSimilarity:
    def test_matches_oracle(self):
        rng = np.random.default_rng(1)
        h, pt, _, n_img = make_sequence(rng, 2, 3, 6, 2)
        ref_sim, _ = oracle.similarity_by_patch(h, pt, 3)
        order, n = order_by_patch(jnp.asarray(pt), jnp.ones(len(pt), bool), 3)
        sim = similarity_by_patch(jnp.asarray(h), jnp.asarray(pt), order, n)
        got = np.asarray(sim)
        np.testing.assert_allclose(got[:n_img], ref_sim, rtol=1e-5, atol=1e-6)
        # Padding region carries IGNORE.
        assert np.all(got[n_img:] == -2.0)

    def test_boundaries_ignored(self):
        rng = np.random.default_rng(2)
        h, pt, _, _ = make_sequence(rng, 0, 4, 3, 0, coherent=1.0)
        order, n = order_by_patch(jnp.asarray(pt), jnp.ones(len(pt), bool), 4)
        sim = np.asarray(similarity_by_patch(jnp.asarray(h), jnp.asarray(pt), order, n))
        # First position of each patch (every n_frames-th patch-major slot) is IGNORE.
        for p in range(4):
            assert sim[p * 3] == -2.0
        # All intra-patch transitions are near 1 (coherent frames).
        mask = np.ones(12, bool)
        mask[::3] = False
        assert np.all(sim[:12][mask] > 0.9)


class TestMerge:
    def _run_both(self, h, pt, patch_num, s_th, budget):
        frame_token_num = int(np.sum(pt != TEXT_TOKEN))
        ref = oracle.merge_event(h, pt, s_th, budget, frame_token_num)

        order, n = order_by_patch(jnp.asarray(pt), jnp.ones(len(pt), bool), patch_num)
        sim = similarity_by_patch(jnp.asarray(h), jnp.asarray(pt), order, n)
        count = int(jnp.sum(sim >= s_th))
        if count / frame_token_num < budget:
            k = count
        else:
            k = int(budget * frame_token_num)
        marked = mark_topk(sim, jnp.int32(k))
        merged, keep = apply_merge(jnp.asarray(h), marked, order)
        return ref, np.asarray(merged), np.asarray(keep), np.asarray(marked), count

    def test_threshold_branch_matches_oracle(self):
        rng = np.random.default_rng(3)
        h, pt, _, _ = make_sequence(rng, 3, 4, 8, 2)
        ref, merged, keep, marked, count = self._run_both(h, pt, 4, 0.6, budget=0.9)
        assert not ref["capped"]
        assert count == len(ref["marked_positions"])
        np.testing.assert_array_equal(np.nonzero(marked)[0], ref["marked_positions"])
        np.testing.assert_array_equal(keep, ref["keep"])
        np.testing.assert_allclose(merged, ref["merged"], rtol=1e-5, atol=1e-5)

    def test_topk_branch_matches_oracle(self):
        rng = np.random.default_rng(4)
        h, pt, _, _ = make_sequence(rng, 3, 4, 8, 2, coherent=0.95)
        ref, merged, keep, marked, _ = self._run_both(h, pt, 4, 0.5, budget=0.2)
        assert ref["capped"]
        np.testing.assert_array_equal(np.nonzero(marked)[0], ref["marked_positions"])
        np.testing.assert_array_equal(keep, ref["keep"])
        np.testing.assert_allclose(merged, ref["merged"], rtol=1e-5, atol=1e-5)

    def test_run_semantics_docstring_example(self):
        # Reference find_contigious_latter_index doc example (main.py:361-363):
        # marked [0,1,1,1,0,0,1,1] => runs of 3 and 2 merged into preceding heads.
        s, d = 8, 4
        h = np.arange(s * d, dtype=np.float32).reshape(s, d)
        pt = np.zeros(s, dtype=np.int32)  # single patch, 8 "frames"
        order, n = order_by_patch(jnp.asarray(pt), jnp.ones(s, bool), 1)
        marked = jnp.asarray(np.array([0, 1, 1, 1, 0, 0, 1, 1], bool))
        merged, keep = apply_merge(jnp.asarray(h), marked, order)
        merged, keep = np.asarray(merged), np.asarray(keep)
        np.testing.assert_array_equal(keep, [1, 0, 0, 0, 1, 1, 0, 0])
        np.testing.assert_allclose(merged[0], h[:4].mean(axis=0), rtol=1e-6)
        np.testing.assert_allclose(merged[5], h[5:].mean(axis=0), rtol=1e-6)
        np.testing.assert_allclose(merged[4], h[4], rtol=1e-6)

    def test_no_marks_is_identity(self):
        rng = np.random.default_rng(5)
        h, pt, _, _ = make_sequence(rng, 1, 2, 3, 1, coherent=0.0)
        order, n = order_by_patch(jnp.asarray(pt), jnp.ones(len(pt), bool), 2)
        merged, keep = apply_merge(jnp.asarray(h), jnp.zeros(len(pt), bool), order)
        np.testing.assert_allclose(np.asarray(merged), h, rtol=1e-6)
        assert np.asarray(keep).all()

    def test_fuzz_multiple_seeds(self):
        for seed in range(6, 14):
            rng = np.random.default_rng(seed)
            patch_num = int(rng.integers(2, 8))
            n_frames = int(rng.integers(2, 10))
            h, pt, _, _ = make_sequence(
                rng, int(rng.integers(0, 5)), patch_num, n_frames, int(rng.integers(0, 5)),
                coherent=float(rng.uniform(0.2, 1.0)),
            )
            s_th = float(rng.uniform(0.3, 0.9))
            budget = float(rng.uniform(0.05, 0.95))
            ref, merged, keep, marked, _ = self._run_both(h, pt, patch_num, s_th, budget)
            np.testing.assert_array_equal(np.nonzero(marked)[0], ref["marked_positions"], err_msg=f"seed={seed}")
            np.testing.assert_array_equal(keep, ref["keep"], err_msg=f"seed={seed}")
            np.testing.assert_allclose(merged, ref["merged"], rtol=1e-4, atol=1e-5, err_msg=f"seed={seed}")


class TestPrune:
    def test_matches_oracle(self):
        rng = np.random.default_rng(20)
        s, img_start, img_len = 40, 5, 30
        importance = rng.random(s).astype(np.float32)
        k_keep = 12
        ref_kept = oracle.prune_keep_indices(importance, img_start, img_len, k_keep)
        keep = prune_keep_mask(
            jnp.asarray(importance), jnp.int32(img_start), jnp.int32(img_len),
            jnp.int32(k_keep), jnp.ones(s, bool),
        )
        np.testing.assert_array_equal(np.nonzero(np.asarray(keep))[0], ref_kept)

    def test_ties_prefer_lower_index(self):
        importance = np.zeros(10, dtype=np.float32)
        keep = prune_keep_mask(jnp.asarray(importance), jnp.int32(2), jnp.int32(6), jnp.int32(3), jnp.ones(10, bool))
        np.testing.assert_array_equal(np.nonzero(np.asarray(keep))[0], [0, 1, 2, 3, 4, 8, 9])

    def test_padding_never_kept(self):
        importance = np.ones(8, dtype=np.float32)
        valid = np.array([1, 1, 1, 1, 1, 1, 0, 0], bool)
        keep = prune_keep_mask(jnp.asarray(importance), jnp.int32(1), jnp.int32(4), jnp.int32(2), jnp.asarray(valid))
        got = np.asarray(keep)
        assert not got[6] and not got[7]
        assert got[[0, 5]].all()
        assert got[1:5].sum() == 2


class TestCompact:
    def test_roundtrip(self):
        s = 16
        h = np.arange(s * 3, dtype=np.float32).reshape(s, 3)
        pt = np.arange(s, dtype=np.int32) % 4
        keep = np.ones(s, bool)
        keep[[2, 5, 6, 11]] = False
        new_valid = int(keep.sum())
        new_len = bucket_length(new_valid, bucket=8)
        out, valid = compact_tokens(
            jnp.asarray(keep), new_len, jnp.int32(new_valid),
            {"h": jnp.asarray(h), "patch_type": jnp.asarray(pt)},
        )
        assert out["h"].shape[0] == new_len == 16
        np.testing.assert_allclose(np.asarray(out["h"])[:new_valid], h[keep])
        np.testing.assert_array_equal(np.asarray(out["patch_type"])[:new_valid], pt[keep])
        got_valid = np.asarray(valid)
        assert got_valid[:new_valid].all() and not got_valid[new_valid:].any()
        assert (np.asarray(out["patch_type"])[new_valid:] == PAD_TOKEN).all()

    def test_bucket_length(self):
        assert bucket_length(1) == 128
        assert bucket_length(128) == 128
        assert bucket_length(129) == 256
        assert bucket_length(130, bucket=64) == 192
