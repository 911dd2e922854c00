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
