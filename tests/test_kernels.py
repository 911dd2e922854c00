"""Pallas kernel tests (interpreter mode on CPU; compiled on TPU in bench)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framefusion_tpu.ops.attention import causal_attention_einsum
from framefusion_tpu.ops.kernels.flash_prefill import flash_causal_attention


def make_qkv(rng, s, hq, hk, d, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((s, hq, d)), dtype)
    k = jnp.asarray(rng.standard_normal((s, hk, d)), dtype)
    v = jnp.asarray(rng.standard_normal((s, hk, d)), dtype)
    return q, k, v


class TestFlashPrefill:
    @pytest.mark.parametrize("s,hq,hk", [(512, 4, 2), (640, 8, 8), (1024, 4, 1)])
    def test_matches_einsum(self, s, hq, hk):
        rng = np.random.default_rng(0)
        q, k, v = make_qkv(rng, s, hq, hk, 128)
        ref = causal_attention_einsum(q, k, v)
        got = flash_causal_attention(q, k, v, block_q=128, block_k=256, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_key_valid_mask(self, ):
        rng = np.random.default_rng(1)
        s = 512
        q, k, v = make_qkv(rng, s, 4, 2, 128)
        key_valid = jnp.asarray(rng.random(s) > 0.3)
        key_valid = key_valid.at[0].set(True)
        ref = causal_attention_einsum(q, k, v, key_valid=key_valid)
        got = flash_causal_attention(q, k, v, key_valid=key_valid, block_q=128, block_k=256, interpret=True)
        live = np.asarray(key_valid)
        np.testing.assert_allclose(
            np.asarray(got)[live], np.asarray(ref)[live], rtol=2e-3, atol=2e-3
        )

    def test_unaligned_length_padding(self):
        rng = np.random.default_rng(2)
        s = 384 + 65  # not a multiple of block sizes
        q, k, v = make_qkv(rng, s, 2, 2, 128)
        ref = causal_attention_einsum(q, k, v)
        got = flash_causal_attention(q, k, v, block_q=128, block_k=128, interpret=True)
        assert got.shape == (s, 2, 128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_bf16_storage(self):
        rng = np.random.default_rng(3)
        q, k, v = make_qkv(rng, 256, 4, 2, 128, dtype=jnp.bfloat16)
        ref = causal_attention_einsum(q, k, v)
        got = flash_causal_attention(q, k, v, block_q=128, block_k=128, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
        )


class TestRaggedDecode:
    @pytest.mark.parametrize("cache_len", [5, 256, 300, 512])
    def test_matches_masked_reference(self, cache_len):
        from framefusion_tpu.ops.attention import decode_attention
        from framefusion_tpu.ops.kernels.decode_attention import ragged_decode_attention

        rng = np.random.default_rng(cache_len)
        s_pad, hq, hk, d = 512, 8, 2, 128
        q = jnp.asarray(rng.standard_normal((hq, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((s_pad, hk, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((s_pad, hk, d)), jnp.float32)
        ref = decode_attention(q, k, v, jnp.int32(cache_len))
        got = ragged_decode_attention(q, k, v, jnp.int32(cache_len), block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_unaligned_pad(self):
        from framefusion_tpu.ops.attention import decode_attention
        from framefusion_tpu.ops.kernels.decode_attention import ragged_decode_attention

        rng = np.random.default_rng(0)
        s_pad, hq, hk, d = 320, 4, 4, 128  # not a block multiple
        q = jnp.asarray(rng.standard_normal((hq, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((s_pad, hk, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((s_pad, hk, d)), jnp.float32)
        ref = decode_attention(q, k, v, jnp.int32(200))
        got = ragged_decode_attention(q, k, v, jnp.int32(200), block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


class TestBlockedFlash:
    def test_blocked_matches_resident(self):
        from framefusion_tpu.ops.kernels.flash_prefill import _flash_blocked
        import functools

        rng = np.random.default_rng(5)
        s, hq, hk, d = 768, 4, 2, 128
        q, k, v = make_qkv(rng, s, hq, hk, d)
        ref = causal_attention_einsum(q, k, v)

        q_t, k_t, v_t = (x.transpose(1, 0, 2) for x in (q, k, v))
        kv_mask = jnp.ones((1, s), jnp.int32)
        got = _flash_blocked(q_t, k_t, v_t, kv_mask, 128, 256, True, 1.0 / d ** 0.5)
        got = got.transpose(1, 0, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("s,hq,hk", [(512, 8, 2), (640, 28, 4)])
    def test_blocked_grouped_matches_einsum(self, s, hq, hk):
        from framefusion_tpu.ops.kernels.flash_prefill import _flash_blocked_grouped

        rng = np.random.default_rng(s + hq)
        q, k, v = make_qkv(rng, s, hq, hk, 128)
        ref = causal_attention_einsum(q, k, v)
        kv_mask = jnp.ones((1, s), jnp.int32)
        got = _flash_blocked_grouped(q, k, v, kv_mask, 128, 128, True, 1.0 / 128 ** 0.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_blocked_grouped_key_valid(self):
        from framefusion_tpu.ops.kernels.flash_prefill import _flash_blocked_grouped

        rng = np.random.default_rng(11)
        s = 512
        q, k, v = make_qkv(rng, s, 4, 2, 128)
        key_valid = jnp.asarray(rng.random(s) > 0.4).at[0].set(True)
        ref = causal_attention_einsum(q, k, v, key_valid=key_valid)
        got = _flash_blocked_grouped(q, k, v, key_valid.astype(jnp.int32)[None], 128, 128,
                                     True, 1.0 / 128 ** 0.5)
        live = np.asarray(key_valid)
        np.testing.assert_allclose(np.asarray(got)[live], np.asarray(ref)[live], rtol=2e-3, atol=2e-3)

    def test_blocked_key_valid(self):
        from framefusion_tpu.ops.kernels.flash_prefill import _flash_blocked

        rng = np.random.default_rng(6)
        s, hq, hk, d = 512, 2, 2, 128
        q, k, v = make_qkv(rng, s, hq, hk, d)
        key_valid = jnp.asarray(rng.random(s) > 0.4).at[0].set(True)
        ref = causal_attention_einsum(q, k, v, key_valid=key_valid)
        q_t, k_t, v_t = (x.transpose(1, 0, 2) for x in (q, k, v))
        got = _flash_blocked(q_t, k_t, v_t, key_valid.astype(jnp.int32)[None], 128, 128, True, 1.0 / d ** 0.5)
        got = got.transpose(1, 0, 2)
        live = np.asarray(key_valid)
        np.testing.assert_allclose(np.asarray(got)[live], np.asarray(ref)[live], rtol=2e-3, atol=2e-3)


class TestGroupedFlash:
    @pytest.mark.parametrize("s,hq,hk", [(512, 8, 2), (640, 4, 1), (1024, 28, 4)])
    def test_grouped_matches_einsum(self, s, hq, hk):
        from framefusion_tpu.ops.kernels.flash_prefill import _flash_grouped

        rng = np.random.default_rng(s)
        q, k, v = make_qkv(rng, s, hq, hk, 128)
        ref = causal_attention_einsum(q, k, v)
        kv_mask = jnp.ones((1, s), jnp.int32)
        got = _flash_grouped(q, k, v, kv_mask, 128, 128, True, 1.0 / 128 ** 0.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("s,hq,hk,bq,sq", [(512, 8, 2, 256, 128), (1024, 28, 4, 512, 256),
                                               (768, 6, 2, 384, 128)])
    def test_grouped_multi_matches_einsum(self, s, hq, hk, bq, sq):
        from framefusion_tpu.ops.kernels.flash_prefill import _flash_grouped_multi

        rng = np.random.default_rng(s + bq)
        q, k, v = make_qkv(rng, s, hq, hk, 128)
        ref = causal_attention_einsum(q, k, v)
        kv_mask = jnp.ones((1, s), jnp.int32)
        got = _flash_grouped_multi(q, k, v, kv_mask, bq, 128, sq, True, 1.0 / 128 ** 0.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_grouped_multi_key_valid(self):
        from framefusion_tpu.ops.kernels.flash_prefill import _flash_grouped_multi

        rng = np.random.default_rng(7)
        s = 512
        q, k, v = make_qkv(rng, s, 4, 2, 128)
        key_valid = jnp.asarray(rng.random(s) > 0.3).at[0].set(True)
        ref = causal_attention_einsum(q, k, v, key_valid=key_valid)
        got = _flash_grouped_multi(q, k, v, key_valid.astype(jnp.int32)[None], 256, 128, 128,
                                   True, 1.0 / 128 ** 0.5)
        live = np.asarray(key_valid)
        np.testing.assert_allclose(np.asarray(got)[live], np.asarray(ref)[live], rtol=2e-3, atol=2e-3)

    def test_grouped_key_valid_via_wrapper(self):
        rng = np.random.default_rng(9)
        s = 512
        q, k, v = make_qkv(rng, s, 4, 2, 128)
        key_valid = jnp.asarray(rng.random(s) > 0.3).at[0].set(True)
        ref = causal_attention_einsum(q, k, v, key_valid=key_valid)
        got = flash_causal_attention(q, k, v, key_valid=key_valid, block_q=128, block_k=128, interpret=True)
        live = np.asarray(key_valid)
        np.testing.assert_allclose(np.asarray(got)[live], np.asarray(ref)[live], rtol=2e-3, atol=2e-3)


class TestFusedImportanceEpilogue:
    """flash_causal_attention_importance: attention output AND prune
    importance from one kernel, vs the separate reference computations."""

    # hk=2 routes to the grouped-multi fused kernel, hk=4 (g=1) to the
    # per-qhead kernel — both fused paths stay covered. valid_len=258 with
    # num=4 puts the capture rows across the sub_q=256 sub-block boundary of
    # the grouped-multi kernel.
    @pytest.mark.parametrize("num,valid_len,hk", [(1, 512, 2), (4, 500, 2), (1, 300, 2),
                                                  (4, 258, 2), (1, 512, 4), (4, 500, 4)])
    def test_matches_separate_paths(self, num, valid_len, hk):
        from framefusion_tpu.ops.attention import last_rows_importance
        from framefusion_tpu.ops.kernels.flash_prefill import (
            flash_causal_attention_importance,
        )

        rng = np.random.default_rng(7)
        s = 512
        q, k, v = make_qkv(rng, s, 4, hk, 128)
        out, imp = flash_causal_attention_importance(
            q, k, v, jnp.int32(valid_len), num, block_q=128, block_k=128, interpret=True
        )
        ref_out = causal_attention_einsum(q, k, v)
        ref_imp = last_rows_importance(q, k, num, jnp.int32(valid_len))
        np.testing.assert_allclose(
            np.asarray(out)[:valid_len], np.asarray(ref_out)[:valid_len], rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(np.asarray(imp), np.asarray(ref_imp), rtol=1e-4, atol=1e-6)

    def test_key_valid_and_capture_rows_straddling_blocks(self, ):
        from framefusion_tpu.ops.attention import last_rows_importance
        from framefusion_tpu.ops.kernels.flash_prefill import (
            flash_causal_attention_importance,
        )

        rng = np.random.default_rng(8)
        s = 384
        q, k, v = make_qkv(rng, s, 4, 2, 128)
        key_valid = jnp.asarray(rng.random(s) > 0.3).at[0].set(True)
        # valid_len=130 with num=4 puts capture rows 126..129 across the
        # 128-row query-block boundary.
        out, imp = flash_causal_attention_importance(
            q, k, v, jnp.int32(130), 4, key_valid=key_valid,
            block_q=128, block_k=128, interpret=True,
        )
        ref_imp = last_rows_importance(q, k, 4, jnp.int32(130), key_valid=key_valid)
        np.testing.assert_allclose(np.asarray(imp), np.asarray(ref_imp), rtol=1e-4, atol=1e-6)

    def test_prune_decision_parity(self):
        # The downstream contract: top-k over the fused importance picks the
        # same tokens as over the separate-einsum importance.
        from framefusion_tpu.ops.attention import last_rows_importance
        from framefusion_tpu.ops.kernels.flash_prefill import (
            flash_causal_attention_importance,
        )

        rng = np.random.default_rng(9)
        s, vl = 256, 220
        q, k, v = make_qkv(rng, s, 4, 2, 128)
        _, imp = flash_causal_attention_importance(
            q, k, v, jnp.int32(vl), 1, block_q=128, block_k=128, interpret=True
        )
        ref_imp = last_rows_importance(q, k, 1, jnp.int32(vl))
        got = np.argsort(-np.asarray(imp)[:vl], kind="stable")[:40]
        want = np.argsort(-np.asarray(ref_imp)[:vl], kind="stable")[:40]
        np.testing.assert_array_equal(got, want)


class TestSinkPrefillKernel:
    """sink_flash_attention vs the XLA chunked sink mask (which itself is
    pinned to reference minference semantics in test_baselines)."""

    @pytest.mark.parametrize("s,init,window", [(512, 8, 100), (640, 8, 200), (512, 0, 64), (384, 130, 90)])
    def test_matches_chunked_sink(self, s, init, window):
        from framefusion_tpu.ops.attention import causal_attention_chunked
        from framefusion_tpu.ops.kernels.sink_prefill import sink_flash_attention

        rng = np.random.default_rng(11)
        q, k, v = make_qkv(rng, s, 4, 2, 128)
        ref = causal_attention_chunked(q, k, v, sink=(init, window))
        got = sink_flash_attention(q, k, v, init, window, block_q=128, block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_window_covering_everything_matches_dense(self):
        from framefusion_tpu.ops.kernels.sink_prefill import sink_flash_attention

        rng = np.random.default_rng(12)
        s = 256
        q, k, v = make_qkv(rng, s, 4, 2, 128)
        ref = causal_attention_einsum(q, k, v)
        got = sink_flash_attention(q, k, v, 0, s, block_q=128, block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_sink_window_overlap_counts_once(self):
        # Early queries: (q - window, q] overlaps [0, init) — keys must not
        # be double-counted across the sink and window visit loops.
        from framefusion_tpu.ops.attention import causal_attention_chunked
        from framefusion_tpu.ops.kernels.sink_prefill import sink_flash_attention

        rng = np.random.default_rng(13)
        s = 384
        q, k, v = make_qkv(rng, s, 2, 2, 128)
        ref = causal_attention_chunked(q, k, v, sink=(64, 300))
        got = sink_flash_attention(q, k, v, 64, 300, block_q=128, block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


class TestMidRegimeDispatch:
    """The 8.2k-16k (phase-bucket) regime routes to the blocked-grouped
    kernel with the separate last-rows importance einsum. Exercised here by
    shrinking the dispatch thresholds (unique shapes -> fresh jit traces);
    the on-chip compiled twin is kernel_bench --check."""

    def test_attention_matches_einsum(self, monkeypatch):
        from framefusion_tpu.ops.kernels import flash_prefill as fp

        monkeypatch.setattr(fp, "GROUPED_MAX_S", 256)
        monkeypatch.setattr(fp, "RESIDENT_KV_MAX_S", 2048)
        rng = np.random.default_rng(21)
        s, hq, hk, d = 520, 8, 2, 128
        q, k, v = make_qkv(rng, s, hq, hk, d)
        ref = causal_attention_einsum(q, k, v)
        got = fp.flash_causal_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_importance_matches_oracle(self, monkeypatch):
        from framefusion_tpu.ops.attention import last_rows_importance
        from framefusion_tpu.ops.kernels import flash_prefill as fp

        monkeypatch.setattr(fp, "GROUPED_MAX_S", 256)
        monkeypatch.setattr(fp, "RESIDENT_KV_MAX_S", 2048)
        rng = np.random.default_rng(22)
        s, hq, hk, d = 648, 8, 2, 128
        q, k, v = make_qkv(rng, s, hq, hk, d)
        valid = 600
        key_valid = (jnp.arange(s) < valid)
        out, imp = fp.flash_causal_attention_importance(
            q, k, v, jnp.int32(valid), num=4, key_valid=key_valid, interpret=True
        )
        ref_out = causal_attention_einsum(q, k, v, key_valid=key_valid)
        ref_imp = last_rows_importance(q, k, 4, jnp.int32(valid), key_valid=key_valid)
        live = np.arange(s) < valid
        np.testing.assert_allclose(np.asarray(out)[live], np.asarray(ref_out)[live],
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(imp), np.asarray(ref_imp), rtol=1e-5, atol=1e-6)


class TestMatvecQ8:
    """Decode matvec kernel (ops/kernels/matvec_q8.py) vs the XLA dequant
    matmul it replaces (models/qwen2.mm weight-only path)."""

    @pytest.mark.parametrize("k,n", [(512, 768), (896, 512), (4736, 384)])
    def test_q8_matches_xla(self, k, n):
        from framefusion_tpu.ops.kernels.matvec_q8 import matvec_q8

        rng = np.random.default_rng(30)
        x = jnp.asarray(rng.standard_normal((1, k)) * 0.1, jnp.bfloat16)
        w8 = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        sc = jnp.asarray(rng.random(n).astype(np.float32) * 0.01 + 0.005)
        ref = jnp.dot(x, w8.astype(jnp.bfloat16), preferred_element_type=jnp.float32) * sc
        got = matvec_q8(x, w8, sc, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def test_bf16_matches_xla(self):
        from framefusion_tpu.ops.kernels.matvec_q8 import matvec_bf16

        rng = np.random.default_rng(31)
        k, n = 768, 640
        x = jnp.asarray(rng.standard_normal((1, k)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)) * 0.1, jnp.bfloat16)
        ref = jnp.dot(x, w, preferred_element_type=jnp.float32)
        got = matvec_bf16(x, w, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("rows", [2, 4])
    def test_multirow_matches_xla(self, rows):
        """Serving decode batch: (B, K) rows share one weight stream."""
        from framefusion_tpu.ops.kernels.matvec_q8 import matvec_q8, matvec_stacked

        rng = np.random.default_rng(33)
        k, n = 512, 640
        x = jnp.asarray(rng.standard_normal((rows, k)) * 0.1, jnp.bfloat16)
        w8 = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        sc = jnp.asarray(rng.random(n).astype(np.float32) * 0.01 + 0.005)
        ref = jnp.dot(x, w8.astype(jnp.bfloat16), preferred_element_type=jnp.float32) * sc
        got = matvec_q8(x, w8, sc, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)

        ws = jnp.stack([w8, (-w8).astype(jnp.int8), w8])
        ref_s = jnp.dot(x, ws[1].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        got_s = matvec_stacked(x, ws, 1, interpret=True)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("dtype", [jnp.int8, jnp.bfloat16])
    def test_stacked_picks_the_layer(self, dtype):
        from framefusion_tpu.ops.kernels.matvec_q8 import matvec_stacked

        rng = np.random.default_rng(32)
        L, k, n = 5, 512, 768
        if dtype == jnp.int8:
            ws = jnp.asarray(rng.integers(-127, 128, (L, k, n)), jnp.int8)
        else:
            ws = jnp.asarray(rng.standard_normal((L, k, n)) * 0.1, jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((1, k)) * 0.1, jnp.bfloat16)
        for l in (0, 2, L - 1):
            ref = jnp.dot(x, ws[l].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
            got = matvec_stacked(x, ws, l, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("dtype", [jnp.int8, jnp.bfloat16])
    def test_fused_qkv_matches_separate(self, dtype):
        """matvec_stacked_qkv == three matvec_stacked calls (one launch,
        three weight streams — the decode fusion of VERDICT r4 item 2)."""
        from framefusion_tpu.ops.kernels.matvec_q8 import (
            matvec_stacked, matvec_stacked_qkv)

        rng = np.random.default_rng(34)
        L, k, nq, nkv = 3, 512, 512, 128

        def mk(n):
            if dtype == jnp.int8:
                return jnp.asarray(rng.integers(-127, 128, (L, k, n)), jnp.int8)
            return jnp.asarray(rng.standard_normal((L, k, n)) * 0.1, jnp.bfloat16)

        wq, wk, wv = mk(nq), mk(nkv), mk(nkv)
        for rows in (1, 3):
            x = jnp.asarray(rng.standard_normal((rows, k)) * 0.1, jnp.bfloat16)
            for l in (0, L - 1):
                q, kk, vv = matvec_stacked_qkv(x, wq, wk, wv, l, interpret=True)
                for got, ws in ((q, wq), (kk, wk), (vv, wv)):
                    ref = matvec_stacked(x, ws, l, interpret=True)
                    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                               rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("dtype", [jnp.int8, jnp.bfloat16])
    def test_fused_gateup_matches_separate(self, dtype):
        """matvec_stacked_gateup == silu(x@wg*sg) * (x@wu*su) composed from
        separate matvecs (scales multiply before the nonlinearity, exactly
        models/qwen2.mm's order)."""
        from framefusion_tpu.ops.kernels.matvec_q8 import (
            matvec_stacked, matvec_stacked_gateup)

        rng = np.random.default_rng(35)
        L, k, n = 3, 512, 768
        if dtype == jnp.int8:
            wg = jnp.asarray(rng.integers(-127, 128, (L, k, n)), jnp.int8)
            wu = jnp.asarray(rng.integers(-127, 128, (L, k, n)), jnp.int8)
            sg = jnp.asarray(rng.random((L, n)).astype(np.float32) * 0.01 + 0.005)
            su = jnp.asarray(rng.random((L, n)).astype(np.float32) * 0.01 + 0.005)
        else:
            wg = jnp.asarray(rng.standard_normal((L, k, n)) * 0.1, jnp.bfloat16)
            wu = jnp.asarray(rng.standard_normal((L, k, n)) * 0.1, jnp.bfloat16)
            sg = su = jnp.ones((1, n), jnp.float32)
        for rows in (1, 2):
            x = jnp.asarray(rng.standard_normal((rows, k)) * 0.1, jnp.bfloat16)
            for l in (0, L - 1):
                got = matvec_stacked_gateup(x, wg, wu, sg, su, l, interpret=True)
                g = matvec_stacked(x, wg, l, interpret=True) * (
                    sg[min(l, sg.shape[0] - 1)])
                u = matvec_stacked(x, wu, l, interpret=True) * (
                    su[min(l, su.shape[0] - 1)])
                ref = jax.nn.silu(g) * u
                np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                           rtol=2e-5, atol=1e-6)

    def test_mv_stacked_gateup_wrapper_matches_unfused(self, monkeypatch):
        """qwen2.mv_stacked_gateup (dict + bf16 dispatch) == the unfused
        composition it replaces, and FF_DECODE_FUSED=0 routes around it."""
        from framefusion_tpu.models import qwen2
        from framefusion_tpu.ops.quant import quantize_weight

        rng = np.random.default_rng(36)
        L, k, n = 2, 256, 384
        wg = jnp.asarray(rng.standard_normal((L, k, n)) * 0.1, jnp.bfloat16)
        wu = jnp.asarray(rng.standard_normal((L, k, n)) * 0.1, jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((1, k)) * 0.1, jnp.bfloat16)
        for stacks in (
            (wg, wu),
            (quantize_weight(wg.copy()), quantize_weight(wu.copy())),
        ):
            g, u = stacks
            want = (jax.nn.silu(qwen2.mv_stacked(x, g, 1))
                    * qwen2.mv_stacked(x, u, 1)).astype(x.dtype)
            got = qwen2.mv_stacked_gateup(x, g, u, 1)
            np.testing.assert_allclose(np.asarray(got, np.float32),
                                       np.asarray(want, np.float32),
                                       rtol=2e-2, atol=2e-3)
            monkeypatch.setenv("FF_DECODE_FUSED", "0")
            off = qwen2.mv_stacked_gateup(x, g, u, 1)
            monkeypatch.delenv("FF_DECODE_FUSED")
            np.testing.assert_array_equal(np.asarray(off, np.float32),
                                          np.asarray(want, np.float32))

    def test_mv_stacked_qkv_wrapper_matches_unfused(self):
        from framefusion_tpu.models import qwen2
        from framefusion_tpu.ops.quant import quantize_weight

        rng = np.random.default_rng(37)
        L, k, nq, nkv = 2, 256, 256, 128
        wq = jnp.asarray(rng.standard_normal((L, k, nq)) * 0.1, jnp.bfloat16)
        wk = jnp.asarray(rng.standard_normal((L, k, nkv)) * 0.1, jnp.bfloat16)
        wv = jnp.asarray(rng.standard_normal((L, k, nkv)) * 0.1, jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((2, k)) * 0.1, jnp.bfloat16)
        for stacks in (
            (wq, wk, wv),
            tuple(quantize_weight(w.copy()) for w in (wq, wk, wv)),
        ):
            got = qwen2.mv_stacked_qkv(x, *stacks, 0)
            want = tuple(qwen2.mv_stacked(x, w, 0) for w in stacks)
            for a, b in zip(got, want):
                np.testing.assert_allclose(np.asarray(a, np.float32),
                                           np.asarray(b, np.float32),
                                           rtol=2e-2, atol=2e-3)

    @pytest.mark.parametrize("quantized", [False, True])
    def test_decode_step_mv_path_matches_xla(self, quantized):
        """decode_step's streamed-matvec path (fused qkv + gate-up kernels,
        CPU-interpretable since r5) == the plain XLA path, bf16 and int8."""
        from framefusion_tpu.config import tiny_llm_config
        from framefusion_tpu.models import qwen2
        from framefusion_tpu.ops.quant import quantize_params_int8

        cfg = tiny_llm_config(num_layers=2, dtype=jnp.bfloat16)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(5))
        if quantized:
            params = quantize_params_int8(jax.tree.map(lambda x: x, params))
        rng = np.random.default_rng(40)
        s_pool = 64
        kp = jnp.asarray(rng.standard_normal(
            (cfg.num_layers, s_pool, cfg.num_kv_heads, cfg.head_dim_)) * 0.1,
            cfg.dtype)
        vp = jnp.asarray(rng.standard_normal(kp.shape) * 0.1, cfg.dtype)
        lens = jnp.asarray([17, 13], jnp.int32)
        emb = jnp.asarray(rng.standard_normal(cfg.hidden_size) * 0.1, cfg.dtype)
        pos = jnp.int32(17)
        ref_logits, rk, rv, _ = qwen2.decode_step(
            params, emb, pos, kp, vp, lens, cfg, attn_impl="jax")
        got_logits, gk, gv, _ = qwen2.decode_step(
            params, emb, pos, kp, vp, lens, cfg, attn_impl="mv-jax")
        np.testing.assert_allclose(np.asarray(got_logits, np.float32),
                                   np.asarray(ref_logits, np.float32),
                                   rtol=3e-2, atol=3e-2)
        np.testing.assert_allclose(np.asarray(gk, np.float32),
                                   np.asarray(rk, np.float32),
                                   rtol=3e-2, atol=3e-2)

    @pytest.mark.parametrize("quantized", [False, True])
    def test_verify_step_mv_path_matches_xla(self, quantized, monkeypatch):
        """verify_step / verify_step_batch with the streamed-matvec weight
        pass (FF_VERIFY_MV=1, the TPU serving-chunk default since r5) == the
        XLA projection path."""
        from framefusion_tpu.config import tiny_llm_config
        from framefusion_tpu.models import qwen2
        from framefusion_tpu.ops.quant import quantize_params_int8

        cfg = tiny_llm_config(num_layers=2, dtype=jnp.bfloat16)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(6))
        if quantized:
            params = quantize_params_int8(jax.tree.map(lambda x: x, params))
        rng = np.random.default_rng(41)
        kq, s_pool = 4, 64
        kp = jnp.asarray(rng.standard_normal(
            (cfg.num_layers, s_pool, cfg.num_kv_heads, cfg.head_dim_)) * 0.1, cfg.dtype)
        vp = jnp.asarray(rng.standard_normal(kp.shape) * 0.1, cfg.dtype)
        lens = jnp.asarray([20, 17], jnp.int32)
        embs = jnp.asarray(rng.standard_normal((kq, cfg.hidden_size)) * 0.1, cfg.dtype)
        pos = jnp.int32(20) + jnp.arange(kq, dtype=jnp.int32)

        monkeypatch.setenv("FF_VERIFY_MV", "0")
        ref, rk, _ = qwen2.verify_step(params, embs, pos, kp, vp, lens, cfg)
        monkeypatch.setenv("FF_VERIFY_MV", "1")
        got, gk, _ = qwen2.verify_step(params, embs, pos, kp, vp, lens, cfg)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2)
        np.testing.assert_allclose(np.asarray(gk, np.float32),
                                   np.asarray(rk, np.float32), rtol=3e-2, atol=3e-2)

        # batched form
        bsz = 2
        embsb = jnp.asarray(rng.standard_normal((bsz, kq, cfg.hidden_size)) * 0.1,
                            cfg.dtype)
        kpb = jnp.asarray(rng.standard_normal(
            (cfg.num_layers, bsz, s_pool, cfg.num_kv_heads, cfg.head_dim_)) * 0.1,
            cfg.dtype)
        vpb = jnp.asarray(rng.standard_normal(kpb.shape) * 0.1, cfg.dtype)
        lensb = jnp.asarray([[20, 15], [18, 13]], jnp.int32)
        posb = lensb[0][:, None] + jnp.arange(kq, dtype=jnp.int32)[None]
        dmask = jnp.zeros((bsz, s_pool), bool)
        monkeypatch.setenv("FF_VERIFY_MV", "0")
        refb = qwen2.verify_step_batch(
            params, embsb, posb, kpb, vpb, lensb, dmask, jnp.int32(40),
            jnp.int32(0), cfg)[0]
        monkeypatch.setenv("FF_VERIFY_MV", "1")
        gotb = qwen2.verify_step_batch(
            params, embsb, posb, kpb, vpb, lensb, dmask, jnp.int32(40),
            jnp.int32(0), cfg)[0]
        np.testing.assert_allclose(np.asarray(gotb, np.float32),
                                   np.asarray(refb, np.float32), rtol=3e-2, atol=3e-2)
