"""TPU kernel microbenchmarks: attention variants at the compressed-prefill
geometries, plus engine phase/tail breakdown. Run on the chip to guide kernel
tuning (one TPU process at a time — see DEVNOTES.md).

Usage: python scripts/kernel_bench.py [--what attn|engine|all]
"""

from __future__ import annotations

import argparse
import functools
import time

import common  # noqa: F401  (sys.path + compile cache)
import numpy as np

import jax
import jax.numpy as jnp


def force(x):
    return float(jnp.sum(x))


def read_overhead():
    t0 = time.perf_counter()
    force(jnp.zeros((4,), jnp.float32))
    return time.perf_counter() - t0


def timeit(fn, reps=20, rounds=3):
    # CAVEAT: reps here repeat IDENTICAL inputs, which the relay can elide
    # (bench.py chains rep inputs through the previous output to prevent
    # this; that is impractical for arbitrary fn signatures here). Treat
    # suspiciously-fast readings as elided and cross-check against a
    # physical cost model before acting on them — several early "wins" in
    # DEVNOTES turned out to be exactly this artifact.
    fn()  # compile
    force(fn())
    ovh = read_overhead()
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        force(out)
        ts.append(max((time.perf_counter() - t0 - ovh) / reps, 1e-9))
    ts.sort()
    return ts[len(ts) // 2]


def attn_flops(s, hq, d):
    # causal half: QK^T + PV
    return 2 * 2 * hq * s * s * d / 2


def bench_attention():
    from framefusion_tpu.ops.attention import causal_attention_chunked
    from framefusion_tpu.ops.kernels.flash_prefill import (
        _flash_blocked,
        _flash_grouped,
        flash_causal_attention,
    )

    from framefusion_tpu.ops.kernels.flash_prefill import _flash_blocked_grouped

    rng = np.random.default_rng(0)
    hq, hk, d = 28, 4, 128
    for s in (3328, 3456, 6656, 11776, 23552):
        q = jnp.asarray(rng.standard_normal((s, hq, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((s, hk, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((s, hk, d)), jnp.bfloat16)
        fl = attn_flops(s, hq, d)
        print(f"--- S={s} (Hq={hq}, Hk={hk}, D={d}); causal flops={fl/1e9:.1f} GF")

        t = timeit(lambda: flash_causal_attention(q, k, v))
        print(f"  default dispatch            : {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TF/s")

        g = hq // hk
        kv_mask = jnp.ones((1, s), jnp.int32)
        for bq, bk in ((256, 1024), (512, 512), (512, 1024), (256, 2048), (128, 1024)):
            if s % bq or s % bk:
                continue
            try:
                f = jax.jit(functools.partial(_flash_blocked_grouped, block_q=bq, block_k=bk,
                                              interpret=False, scale=1.0 / d ** 0.5))
                t = timeit(lambda: f(q, k, v, kv_mask))
                print(f"  blkgrp bq={bq:4d} bk={bk:4d}     : {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TF/s")
            except Exception as e:
                print(f"  blkgrp bq={bq:4d} bk={bk:4d}     : FAIL {type(e).__name__} {str(e)[:80]}")
        if s <= 8192:
            sweep = ((128, 512), (256, 512), (256, 1024), (512, 512), (512, 1024))
        else:
            sweep = ()
        for bq, bk in sweep:
            if s % bq or s % bk:
                continue
            try:
                f = jax.jit(functools.partial(_flash_grouped, block_q=bq, block_k=bk,
                                              interpret=False, scale=1.0 / d ** 0.5))
                t = timeit(lambda: f(q, k, v, kv_mask))
                print(f"  grouped bq={bq:4d} bk={bk:4d}    : {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TF/s")
            except Exception as e:
                print(f"  grouped bq={bq:4d} bk={bk:4d}    : FAIL {type(e).__name__} {str(e)[:80]}")

        from framefusion_tpu.ops.kernels.flash_prefill import _flash_grouped_multi

        for bq, sq, bk in ((512, 256, 512), (1792, 256, 512), (1792, 512, 512),
                           (896, 128, 512), (3584, 256, 512), (1664, 128, 512)):
            sp = s + ((-s) % bq)
            if sp % bk or s > 16384:
                continue
            qp = jnp.pad(q, ((0, sp - s), (0, 0), (0, 0)))
            kp = jnp.pad(k, ((0, sp - s), (0, 0), (0, 0)))
            vp = jnp.pad(v, ((0, sp - s), (0, 0), (0, 0)))
            kvm = (jnp.arange(sp) < s).astype(jnp.int32)[None]
            try:
                f = jax.jit(functools.partial(_flash_grouped_multi, block_q=bq, block_k=bk,
                                              sub_q=sq, interpret=False, scale=1.0 / d ** 0.5))
                t = timeit(lambda: f(qp, kp, vp, kvm))
                print(f"  gmulti bq={bq:4d} sq={sq:3d} bk={bk:4d} (pad {sp}): {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TF/s")
            except Exception as e:
                print(f"  gmulti bq={bq:4d} sq={sq:3d} bk={bk:4d}: FAIL {type(e).__name__} {str(e)[:80]}")

        q_t = q.transpose(1, 0, 2); k_t = k.transpose(1, 0, 2); v_t = v.transpose(1, 0, 2)
        for bq, bk in ((512, 1024), (512, 2048), (256, 1024)):
            if s % bq or s % bk:
                continue
            try:
                f = jax.jit(functools.partial(_flash_blocked, block_q=bq, block_k=bk,
                                              interpret=False, scale=1.0 / d ** 0.5))
                t = timeit(lambda: f(q_t, k_t, v_t, kv_mask))
                print(f"  kv-blocked bq={bq:4d} bk={bk:4d} : {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TF/s")
            except Exception as e:
                print(f"  kv-blocked bq={bq:4d} bk={bk:4d} : FAIL {type(e).__name__} {str(e)[:80]}")

        t = timeit(lambda: causal_attention_chunked(q, k, v))
        print(f"  xla chunked                 : {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TF/s")


def bench_engine():
    """Breakdown of the FF prefill at bench geometry: phase / compact / tail."""
    import common  # noqa: F401  (repo root on sys.path)
    import bench as benchmod
    from framefusion_tpu.config import FrameFusionConfig, qwen2_7b_config
    from framefusion_tpu.models import qwen2
    from framefusion_tpu.runtime import engine as eng

    cfg = qwen2_7b_config(vocab_size=8192)
    ff = FrameFusionConfig(cost=0.3, similarity_lower_bound=0.6, ratio_lower_bound=0.1)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    h_np, patch_type, img_start, n_img = benchmod.build_video_prompt(rng, cfg.hidden_size, n_frames=64)
    pos = np.arange(len(patch_type), dtype=np.int32)
    e = eng.CompressionEngine(params, cfg, ff, attn_impl="pallas")
    h = jax.device_put(jnp.asarray(h_np, cfg.dtype))

    # --- end-to-end prefill variants. reps=1 and force BOTH logits and a
    # phase-layer cache buffer: chained unforced reps can be elided through
    # the relay (observed: chained fused reps measured below their own tail's
    # cost), so every timing here is a fully-materialised single run.
    def force_res(r):
        # ONE device->host read joining all dependencies — each extra force()
        # costs a full ~35-75 ms relay round trip and inflates single-run
        # timings (this bias produced the phantom "cache-carry penalty",
        # DEVNOTES round-2 notes).
        force(jnp.sum(r.logits) + jnp.sum(r.layer_caches[0][0][:1, 0])
              + jnp.sum(r.layer_caches[-1][0][:1, 0]))
        return r.logits

    t_fused = timeit(lambda: force_res(e.prefill(h, patch_type, pos, 182, img_start, n_img)), reps=1)
    print(f"fused prefill               : {t_fused*1e3:8.1f} ms")
    t_planned1 = timeit(lambda: force_res(e.prefill_planned(h, patch_type, pos, 182, img_start, n_img,
                                                  plan_len=3456)), reps=1)
    print(f"planned (1-stage, plan 3456): {t_planned1*1e3:8.1f} ms")
    for pre in (8832, 7680, 6656):
        t2 = timeit(lambda: force_res(e.prefill_planned(h, patch_type, pos, 182, img_start, n_img,
                                              plan_len=3456, pre_plan_len=pre)), reps=1)
        res = e.prefill_planned(h, patch_type, pos, 182, img_start, n_img,
                                plan_len=3456, pre_plan_len=pre)
        print(f"planned (2-stage, pre {pre}): {t2*1e3:8.1f} ms   mode={res.mode}")

    # dense, single-run, logits-only vs with caches
    import functools as ft

    @ft.partial(jax.jit, static_argnames=("cfg", "attn_impl", "want"))
    def dense_var(params, embeds, pos_t, *, cfg, attn_impl, want):
        lg, ka, va = qwen2.dense_prefill(params, embeds, pos_t, cfg,
                                         attn_impl=attn_impl, want_caches=want)
        return (lg, ka, va) if want else lg

    pos_dev = jnp.asarray(pos)
    t_dl = timeit(lambda: dense_var(params, h, pos_dev, cfg=cfg, attn_impl="pallas", want=False), reps=1)
    print(f"dense logits-only (1 run)   : {t_dl*1e3:8.1f} ms")

    def dense_full():
        lg, ka, va = dense_var(params, h, pos_dev, cfg=cfg, attn_impl="pallas", want=True)
        force(jnp.sum(lg) + jnp.sum(ka[0][:1, 0]) + jnp.sum(ka[-1][:1, 0]))
        return lg
    t_df = timeit(dense_full, reps=1)
    print(f"dense with caches (1 run)   : {t_df*1e3:8.1f} ms")

    res = e.prefill(h, patch_type, pos, 182, img_start, n_img)
    print("events:", [(ev.layer, ev.kind, ev.tokens_removed) for ev in res.telemetry.events],
          "final:", res.valid_len)

    # --- pieces
    hp, ptp, post, orig = e._prep_inputs(h, patch_type, pos)
    frame_tok = int(np.sum(patch_type != -1))
    from framefusion_tpu.core.schedule import compute_pruning_ratio

    budget0 = compute_pruning_ratio([], ff.cost, ff.schedule_num_layers)
    t_pre = timeit(lambda: eng._pre_event_program(
        hp, post, ptp, jnp.int32(orig), jnp.int32(frame_tok), jnp.float32(budget0),
        jnp.float32(ff.similarity_lower_bound), jnp.float32(ff.ratio_lower_bound),
        patch_num=182, max_events=ff.schedule_num_layers,
        schedule_num_layers=ff.schedule_num_layers, plan_len=7680)[0], reps=5)
    print(f"pre-event program (full S)  : {t_pre*1e3:8.1f} ms")

    # tail: dynamic-start fori_loop (current) vs static-start scan (prototype)
    s_small = 3328
    h2 = jnp.zeros((s_small, cfg.hidden_size), cfg.dtype)
    pos2 = jnp.zeros((s_small, 1), jnp.int32)
    def force_tail(out):
        lg, ka, va = out
        force(jnp.sum(lg) + jnp.sum((ka[0] if ka.ndim == 4 else ka)[:1, 0]))
        return lg

    t_tail = timeit(lambda: force_tail(eng._tail_program(params, jnp.int32(2), h2, pos2,
                                              jnp.int32(3314), cfg=cfg, attn_impl="pallas")), reps=1)
    print(f"tail fori dynamic-start     : {t_tail*1e3:8.1f} ms")

    import functools

    @functools.partial(jax.jit, static_argnames=("cfg", "attn_impl", "start_layer"))
    def tail_scan(params, h, pos_tok, valid_len, *, cfg, attn_impl, start_layer):
        # Gather one layer's params per step (tree.map(a[start:]) would COPY
        # 26/28 of the weights — 12 GB); scan ys stack the caches.
        cos, sin = qwen2.positions_cos_sin(eng._pos_axes(pos_tok), cfg)

        def body(hh, l):
            lp = qwen2.layer_slice(params["layers"], l)
            hh, k, v, _ = qwen2.layer_attention(lp, hh, cos, sin, cfg, attn_impl=attn_impl)
            hh = qwen2.layer_mlp(lp, hh, cfg)
            return hh, (k.astype(cfg.dtype), v.astype(cfg.dtype))

        hh, (k_all, v_all) = jax.lax.scan(
            body, h, jnp.arange(start_layer, cfg.num_layers, dtype=jnp.int32))
        last = jax.lax.dynamic_slice_in_dim(hh, valid_len - 1, 1, axis=0)
        return qwen2.final_logits(params, last, cfg)[0], k_all, v_all

    t_tails = timeit(lambda: force_tail(tail_scan(params, h2, pos2, jnp.int32(3314),
                                       cfg=cfg, attn_impl="pallas", start_layer=2)), reps=1)
    print(f"tail scan static-start      : {t_tails*1e3:8.1f} ms")

    @functools.partial(jax.jit, static_argnames=("cfg", "attn_impl"))
    def tail_logits_only(params, h, pos_tok, valid_len, start_layer, *, cfg, attn_impl):
        cos, sin = qwen2.positions_cos_sin(eng._pos_axes(pos_tok), cfg)

        def body(l, hh):
            lp = qwen2.layer_slice(params["layers"], l)
            hh, _, _, _ = qwen2.layer_attention(lp, hh, cos, sin, cfg, attn_impl=attn_impl)
            return qwen2.layer_mlp(lp, hh, cfg)

        hh = jax.lax.fori_loop(start_layer, cfg.num_layers, body, h)
        last = jax.lax.dynamic_slice_in_dim(hh, valid_len - 1, 1, axis=0)
        return qwen2.final_logits(params, last, cfg)[0]

    t_tl = timeit(lambda: tail_logits_only(params, h2, pos2, jnp.int32(3314), jnp.int32(2),
                                           cfg=cfg, attn_impl="pallas"), reps=1)
    print(f"tail logits-only fori       : {t_tl*1e3:8.1f} ms")

    # tail: STATIC-start unrolled python loop, caches as per-layer outputs —
    # no stacked-buffer updates, no loop carry; the k/v tensors that feed the
    # attention kernels are returned as-is (hypothesis: the ~50 ms with-cache
    # penalty is while-loop carry double-buffering of the (L,S,Hk,D) stacks).
    @functools.partial(jax.jit, static_argnames=("cfg", "attn_impl", "start_layer"))
    def tail_unrolled(params, h, pos_tok, valid_len, *, cfg, attn_impl, start_layer):
        cos, sin = qwen2.positions_cos_sin(eng._pos_axes(pos_tok), cfg)
        ks, vs = [], []
        for l in range(start_layer, cfg.num_layers):
            lp = qwen2.layer_slice(params["layers"], l)
            h, k, v, _ = qwen2.layer_attention(lp, h, cos, sin, cfg, attn_impl=attn_impl)
            h = qwen2.layer_mlp(lp, h, cfg)
            ks.append(k.astype(cfg.dtype))
            vs.append(v.astype(cfg.dtype))
        last = jax.lax.dynamic_slice_in_dim(h, valid_len - 1, 1, axis=0)
        return qwen2.final_logits(params, last, cfg)[0], tuple(ks), tuple(vs)

    def force_tail_tuple(out):
        lg, ks, vs = out
        force(jnp.sum(lg) + jnp.sum(ks[0][:1, 0]) + jnp.sum(ks[-1][:1, 0]) + jnp.sum(vs[-1][:1, 0]))
        return lg

    t_tu = timeit(lambda: force_tail_tuple(tail_unrolled(params, h2, pos2, jnp.int32(3314),
                                           cfg=cfg, attn_impl="pallas", start_layer=2)), reps=1)
    print(f"tail unrolled static caches : {t_tu*1e3:8.1f} ms")

    # same but caches stacked in-graph at the end (decode pool layout)
    @functools.partial(jax.jit, static_argnames=("cfg", "attn_impl", "start_layer"))
    def tail_unrolled_stacked(params, h, pos_tok, valid_len, *, cfg, attn_impl, start_layer):
        lg, ks, vs = tail_unrolled.__wrapped__(params, h, pos_tok, valid_len,
                                               cfg=cfg, attn_impl=attn_impl, start_layer=start_layer)
        return lg, jnp.stack(ks), jnp.stack(vs)

    t_tus = timeit(lambda: force_tail(tail_unrolled_stacked(params, h2, pos2, jnp.int32(3314),
                                      cfg=cfg, attn_impl="pallas", start_layer=2)), reps=1)
    print(f"tail unrolled stacked caches: {t_tus*1e3:8.1f} ms")

    # fori with caches stored bf16 in ONE fused (L,S,Hk,2,D) buffer
    @functools.partial(jax.jit, static_argnames=("cfg", "attn_impl"))
    def tail_fori_onebuf(params, h, pos_tok, valid_len, start_layer, *, cfg, attn_impl):
        cos, sin = qwen2.positions_cos_sin(eng._pos_axes(pos_tok), cfg)
        s = h.shape[0]
        kv_all = jnp.zeros((cfg.num_layers, s, cfg.num_kv_heads, 2, cfg.head_dim_), cfg.dtype)

        def body(l, carry):
            hh, kv_all = carry
            lp = qwen2.layer_slice(params["layers"], l)
            hh, k, v, _ = qwen2.layer_attention(lp, hh, cos, sin, cfg, attn_impl=attn_impl)
            hh = qwen2.layer_mlp(lp, hh, cfg)
            kv = jnp.stack([k.astype(cfg.dtype), v.astype(cfg.dtype)], axis=2)
            return hh, jax.lax.dynamic_update_index_in_dim(kv_all, kv, l, 0)

        hh, kv_all = jax.lax.fori_loop(start_layer, cfg.num_layers, body, (h, kv_all))
        last = jax.lax.dynamic_slice_in_dim(hh, valid_len - 1, 1, axis=0)
        return qwen2.final_logits(params, last, cfg)[0], kv_all

    def force_tail2(out):
        lg, kv = out
        force(jnp.sum(lg) + jnp.sum(kv[2, 0, 0]))
        return lg

    t_t1b = timeit(lambda: force_tail2(tail_fori_onebuf(params, h2, pos2, jnp.int32(3314),
                                       jnp.int32(2), cfg=cfg, attn_impl="pallas")), reps=1)
    print(f"tail fori one-buffer caches : {t_t1b*1e3:8.1f} ms")

    # cache pack
    k_pool = jnp.zeros((8, 11776, cfg.num_kv_heads, cfg.head_dim_), cfg.dtype)
    live_rows = jnp.ones((8, 11776), bool)
    t_pack = timeit(lambda: eng._pack_caches_program(k_pool, k_pool, live_rows)[0], reps=5)
    print(f"pack caches (8 layers)      : {t_pack*1e3:8.1f} ms")

    # decode loops: fori-carry single loop (ragged pallas kernel) vs the
    # scan-xs batched loop at B=1 and B=4 — same FF prefill state.
    res = e.prefill(h, patch_type, pos, 182, img_start, n_img)
    n_tok = 32
    def dec_single():
        return jnp.asarray(e.generate_greedy(res, max_new_tokens=n_tok))
    t_d1 = timeit(dec_single, reps=1)
    print(f"decode {n_tok} tok single fori   : {t_d1*1e3:8.1f} ms  ({n_tok/t_d1:6.1f} tok/s)")
    def dec_batch(b):
        return jnp.asarray(e.generate_batch([res] * b, max_new_tokens=n_tok))
    for b in (1, 4):
        try:  # B=4 pools (~0.8 GB) can OOM in this already-crowded process
            t_db = timeit(lambda: dec_batch(b), reps=1)
            print(f"decode {n_tok} tok scan-xs B={b}  : {t_db*1e3:8.1f} ms  ({b*n_tok/t_db:6.1f} tok/s)")
        except Exception as ex:
            print(f"decode scan-xs B={b}: {type(ex).__name__}: {str(ex)[:80]}")


def check_kernels() -> int:
    """On-chip kernel regression gate (VERDICT r2 item 5): COMPILE (not
    interpret) every dispatch regime and assert parity against an
    independent oracle; returns the number of failures (non-zero exit).
    The empirical VMEM-margin constants (GROUPED_MAX_S, bq tiers, the
    '+3 MB margin' rule — DEVNOTES) have shifted before; this catches the
    next shift with one command:

        python scripts/kernel_bench.py --check

    Oracle: ops.attention.causal_attention_chunked (pure-XLA online
    softmax, itself einsum-pinned in the CPU suite — the full einsum would
    materialize O(S^2) scores at the long-S regimes) and the
    last_rows_importance einsum for captures.
    """
    from framefusion_tpu.ops.attention import (
        causal_attention_chunked,
        last_rows_importance,
    )
    from framefusion_tpu.ops.kernels.flash_prefill import (
        GROUPED_MAX_S,
        RESIDENT_KV_MAX_S,
        _flash_grouped,
        flash_causal_attention,
        flash_causal_attention_importance,
    )
    from framefusion_tpu.ops.kernels.sink_prefill import sink_flash_attention

    rng = np.random.default_rng(0)
    failures = []

    def qkv(s, hq, hk, d=128):
        q = jnp.asarray(rng.standard_normal((s, hq, d)) * 0.1, jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((s, hk, d)) * 0.1, jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((s, hk, d)) * 0.1, jnp.bfloat16)
        return q, k, v

    def run(name, fn, ref_fn, atol=2.5e-2, live=None):
        try:
            got = np.asarray(fn(), np.float32)
            want = np.asarray(ref_fn(), np.float32)
            if live is not None:
                got, want = got[live], want[live]
            err = float(np.max(np.abs(got - want)))
            ok = err <= atol
            print(f"  {'PASS' if ok else 'FAIL'}  {name:44s} max|err|={err:.2e}")
            if not ok:
                failures.append(name)
        except Exception as e:  # noqa: BLE001 — compile/VMEM failures are the point
            print(f"  FAIL  {name:44s} {type(e).__name__}: {str(e)[:140]}")
            failures.append(name)

    # Regime matrix: (name, S, Hq, Hk) hitting every dispatch branch at
    # Qwen2-7B-like head geometry. Assertions double-check the branch taken.
    assert GROUPED_MAX_S == 8192 and RESIDENT_KV_MAX_S == 16384, (
        "dispatch thresholds moved; update the regime matrix"
    )
    cases = [
        ("gmulti bq=512 (S<=4096)", 3456, 28, 4),
        ("gmulti bq=1024 (4096<S<=8192)", 6656, 28, 4),
        ("blocked-grouped MID (8192<S<=16384)", 11776, 28, 4),
        ("per-qhead resident (g=1)", 3456, 4, 4),
        ("blocked long (g=1, S>16384)", 18432, 2, 2),
        ("blocked-grouped long (S>16384)", 18432, 28, 4),
    ]
    for name, s, hq, hk in cases:
        q, k, v = qkv(s, hq, hk)
        run(name,
            lambda q=q, k=k, v=v: flash_causal_attention(q, k, v),
            lambda q=q, k=k, v=v: causal_attention_chunked(q, k, v))
        # key_valid (mask-only compression layout) for the compiled regimes
        kv_mask = jnp.asarray(rng.random(s) > 0.3).at[0].set(True)
        live = np.asarray(kv_mask)
        run(name + " +key_valid",
            lambda q=q, k=k, v=v, m=kv_mask: flash_causal_attention(q, k, v, key_valid=m),
            lambda q=q, k=k, v=v, m=kv_mask: causal_attention_chunked(q, k, v, key_valid=m),
            live=live)

    # plain grouped kernel (exported; not in the default dispatch).
    # Block sizes must DIVIDE the (unpadded) direct-call length.
    q, k, v = qkv(3456, 28, 4)
    run("grouped (direct)",
        lambda: _flash_grouped(q, k, v, jnp.ones((1, 3456), jnp.int32), 128, 128,
                               False, 1.0 / 128 ** 0.5),
        lambda: causal_attention_chunked(q, k, v))

    # importance epilogues: gmulti fused, per-qhead fused (g=1), and the
    # mid-regime blocked-grouped + einsum split; each with the live-rank
    # (key_valid) capture case
    for name, s, hq, hk in [
        ("imp gmulti (S<=8192)", 3456, 28, 4),
        ("imp per-qhead fused (g=1)", 3456, 4, 4),
        ("imp MID blkgrp+einsum", 11776, 28, 4),
    ]:
        q, k, v = qkv(s, hq, hk)
        vlen = s - 40
        kv_mask = (jnp.arange(s) < vlen).at[100:140].set(False)
        for label, kwargs in [("", dict(key_valid=None)), ("+key_valid", dict(key_valid=kv_mask))]:
            def got_pair(q=q, k=k, v=v, kw=kwargs):
                return flash_causal_attention_importance(q, k, v, jnp.int32(vlen), num=4, **kw)

            run(name + label + " [out]",
                lambda: got_pair()[0],
                lambda q=q, k=k, v=v, kw=kwargs: causal_attention_chunked(
                    q, k, v, key_valid=kw["key_valid"]),
                live=np.asarray(kwargs["key_valid"]) if kwargs["key_valid"] is not None else np.arange(s) < vlen)
            run(name + label + " [imp]",
                lambda: got_pair()[1],
                lambda q=q, k=k, v=v, kw=kwargs: last_rows_importance(
                    q, k, 4, jnp.int32(vlen), key_valid=kw["key_valid"]),
                atol=2e-3)

    # StreamingLLM sink kernel
    q, k, v = qkv(3456, 28, 4)
    run("sink kernel",
        lambda: sink_flash_attention(q, k, v, 8, 1024),
        lambda: causal_attention_chunked(q, k, v, sink=(8, 1024)))

    # bidirectional vision-tower kernel: so400m geometry (N=729 pads to 768,
    # hd=72 pads to 128, in-kernel head loop) + the InternViT hd=64/N=1025
    # shape that exercises the VMEM-aware heads_per_step reduction
    from framefusion_tpu.ops.kernels.bidir_attention import flash_bidir_attention

    def bidir_ref(q4, k4, v4):
        s = jnp.einsum("bqhd,bkhd->bhqk", q4, k4,
                       preferred_element_type=jnp.float32) / np.sqrt(q4.shape[-1])
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v4.dtype), v4,
                          preferred_element_type=jnp.float32)

    for name, b, nn, hh, dd in [("bidir so400m (729x16x72)", 4, 729, 16, 72),
                                ("bidir internvit (1025x16x64)", 2, 1025, 16, 64)]:
        q4 = jnp.asarray(rng.standard_normal((b, nn, hh, dd)) * 0.1, jnp.bfloat16)
        k4 = jnp.asarray(rng.standard_normal((b, nn, hh, dd)) * 0.1, jnp.bfloat16)
        v4 = jnp.asarray(rng.standard_normal((b, nn, hh, dd)) * 0.1, jnp.bfloat16)
        run(name,
            lambda q4=q4, k4=k4, v4=v4: jax.jit(flash_bidir_attention)(q4, k4, v4),
            lambda q4=q4, k4=k4, v4=v4: bidir_ref(q4, k4, v4))

    # ragged decode kernel
    from framefusion_tpu.ops.attention import decode_attention
    from framefusion_tpu.ops.kernels.decode_attention import ragged_decode_attention

    qd = jnp.asarray(rng.standard_normal((28, 128)) * 0.1, jnp.bfloat16)
    kp = jnp.asarray(rng.standard_normal((2048, 4, 128)) * 0.1, jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((2048, 4, 128)) * 0.1, jnp.bfloat16)
    run("ragged decode",
        lambda: ragged_decode_attention(qd, kp, vp, jnp.int32(1700)),
        lambda: decode_attention(qd, kp, vp, jnp.int32(1700)))

    # decode matvec kernel (int8 pair / bf16 / stacked+scalar-prefetch)
    from framefusion_tpu.ops.kernels.matvec_q8 import (
        matvec_bf16,
        matvec_q8,
        matvec_stacked,
    )

    kdim, n = 3584, 4608
    xv = jnp.asarray(rng.standard_normal((1, kdim)) * 0.1, jnp.bfloat16)
    w8 = jnp.asarray(rng.integers(-127, 128, (kdim, n)), jnp.int8)
    sc = jnp.asarray(rng.random(n).astype(np.float32) * 0.01 + 0.005)
    run("matvec q8", lambda: matvec_q8(xv, w8, sc),
        lambda: jnp.dot(xv, w8.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) * sc,
        atol=1e-3)
    wbf = (w8.astype(jnp.bfloat16) * sc).astype(jnp.bfloat16)
    run("matvec bf16", lambda: matvec_bf16(xv, wbf),
        lambda: jnp.dot(xv, wbf, preferred_element_type=jnp.float32), atol=1e-3)
    ws = jnp.stack([w8, (-w8).astype(jnp.int8)])
    run("matvec stacked l=1", lambda: matvec_stacked(xv, ws, 1),
        lambda: jnp.dot(xv, ws[1].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32), atol=1e-3)
    xb = jnp.asarray(rng.standard_normal((4, kdim)) * 0.1, jnp.bfloat16)
    run("matvec stacked rows=4", lambda: matvec_stacked(xb, ws, 0),
        lambda: jnp.dot(xb, ws[0].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32), atol=1e-3)

    # fused decode kernels (r5): qkv (3 weight streams, 1 launch) and
    # gate-up (2 streams + dequant/silu epilogue) at REAL 7B shapes — these
    # ride larger tiles than the plain stacked kernel, so this row is the
    # VMEM-margin canary for the decode fusion.
    from framefusion_tpu.ops.kernels.matvec_q8 import (
        matvec_stacked_gateup,
        matvec_stacked_qkv,
    )

    wq8 = jnp.asarray(rng.integers(-127, 128, (2, 3584, 3584)), jnp.int8)
    wk8 = jnp.asarray(rng.integers(-127, 128, (2, 3584, 512)), jnp.int8)
    wv8 = jnp.asarray(rng.integers(-127, 128, (2, 3584, 512)), jnp.int8)

    def qkv_ref(l):
        return [jnp.dot(xv, w[l].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
                for w in (wq8, wk8, wv8)]

    run("matvec qkv fused int8 l=1 [q]",
        lambda: matvec_stacked_qkv(xv, wq8, wk8, wv8, 1)[0],
        lambda: qkv_ref(1)[0], atol=1e-3)
    run("matvec qkv fused int8 l=1 [v]",
        lambda: matvec_stacked_qkv(xv, wq8, wk8, wv8, 1)[2],
        lambda: qkv_ref(1)[2], atol=1e-3)
    del wq8, wk8, wv8
    wg8 = jnp.asarray(rng.integers(-127, 128, (2, 3584, 18944)), jnp.int8)
    wu8 = jnp.asarray(rng.integers(-127, 128, (2, 3584, 18944)), jnp.int8)
    sg = jnp.asarray(rng.random((2, 18944)).astype(np.float32) * 0.01 + 0.005)
    su = jnp.asarray(rng.random((2, 18944)).astype(np.float32) * 0.01 + 0.005)

    def gateup_ref():
        g = jnp.dot(xv, wg8[1].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * sg[1]
        u = jnp.dot(xv, wu8[1].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * su[1]
        return jax.nn.silu(g) * u

    run("matvec gateup fused int8 l=1",
        lambda: matvec_stacked_gateup(xv, wg8, wu8, sg, su, 1),
        gateup_ref, atol=1e-3)
    wgb = (wg8.astype(jnp.bfloat16) * 0.01)
    wub = (wu8.astype(jnp.bfloat16) * 0.01)
    ones = jnp.ones((1, 18944), jnp.float32)
    run("matvec gateup fused bf16 l=0",
        lambda: matvec_stacked_gateup(xv, wgb, wub, ones, ones, 0),
        lambda: jax.nn.silu(jnp.dot(xv, wgb[0], preferred_element_type=jnp.float32))
        * jnp.dot(xv, wub[0], preferred_element_type=jnp.float32), atol=1e-3)
    del wg8, wu8, wgb, wub

    # full decode_step: pallas path (matvec kernel + ragged attention) vs
    # the jax path, compiled, at a 7B-geometry 2-layer stack
    from framefusion_tpu.config import qwen2_7b_config
    from framefusion_tpu.models import qwen2 as q2
    from framefusion_tpu.ops.quant import quantize_params_int8

    dcfg = qwen2_7b_config(vocab_size=8192, num_layers=2)
    dparams = q2.init_params(dcfg, jax.random.PRNGKey(3))
    # quantize only AFTER the bf16 run: quantize_params_int8 CONSUMES its
    # input (donation — the leaves alias dparams even through a tree.map
    # container copy), so building it up front deletes the bf16 arrays.
    for tag in ("bf16", "int8"):
        prm = dparams if tag == "bf16" else quantize_params_int8(dparams)
        emb = jnp.asarray(rng.standard_normal(dcfg.hidden_size) * 0.1, jnp.bfloat16)
        kpool = jnp.asarray(rng.standard_normal((2, 512, dcfg.num_kv_heads, 128)) * 0.1,
                            jnp.bfloat16)
        vpool = jnp.asarray(rng.standard_normal((2, 512, dcfg.num_kv_heads, 128)) * 0.1,
                            jnp.bfloat16)
        lens = jnp.asarray([400, 380], jnp.int32)
        step = jax.jit(functools.partial(q2.decode_step, cfg=dcfg), static_argnames="attn_impl")
        # Cross-IMPLEMENTATION tolerance (like the verify_step_batch solo-rows
        # check): pallas keeps attention p in bf16 for the p·v dot and streams
        # projections via matvec_stacked, jax stays fp32/XLA-matmul — logits
        # differ by fp-reduction order, not correctness (the kernel-level
        # "ragged decode" row pins the kernel vs the einsum oracle at ~3e-5).
        run(f"decode_step pallas=={tag}-jax [logits]",
            lambda prm=prm: step(prm, emb, jnp.int32(400), kpool, vpool, lens,
                                 attn_impl="pallas")[0],
            lambda prm=prm: step(prm, emb, jnp.int32(400), kpool, vpool, lens,
                                 attn_impl="jax")[0],
            atol=9e-2)  # 1.3x the worst observed (7.03e-2, r4); 2x drift FAILs
        run(f"decode_step mv-jax=={tag}-jax [logits]",
            lambda prm=prm: step(prm, emb, jnp.int32(400), kpool, vpool, lens,
                                 attn_impl="mv-jax")[0],
            lambda prm=prm: step(prm, emb, jnp.int32(400), kpool, vpool, lens,
                                 attn_impl="jax")[0],
            atol=9e-2)  # same masked attention; bf16 streamed matvec weights
        embs = jnp.asarray(rng.standard_normal((3, dcfg.hidden_size)) * 0.1, jnp.bfloat16)
        kpb = jnp.asarray(rng.standard_normal((2, 3, 512, dcfg.num_kv_heads, 128)) * 0.1,
                          jnp.bfloat16)
        vpb = jnp.asarray(rng.standard_normal((2, 3, 512, dcfg.num_kv_heads, 128)) * 0.1,
                          jnp.bfloat16)
        lensb = jnp.asarray([[300, 260, 200], [280, 240, 190]], jnp.int32)
        posb = jnp.asarray([300, 260, 200], jnp.int32)
        stepb = jax.jit(functools.partial(q2.decode_step_batch, cfg=dcfg),
                        static_argnames="attn_impl")
        run(f"decode_step_batch pallas=={tag}-jax [logits]",
            lambda prm=prm: stepb(prm, embs, posb, kpb, vpb, lensb, jnp.int32(440),
                                  jnp.int32(2), attn_impl="pallas")[0],
            lambda prm=prm: stepb(prm, embs, posb, kpb, vpb, lensb, jnp.int32(440),
                                  jnp.int32(2), attn_impl="jax")[0],
            atol=1e-1)

    # speculative verify: the K-row one-weight-pass program must equal K
    # SEQUENTIAL decode_steps fed the same candidate rows (logits level —
    # this is the program the spec decode loop and the serving chunk ride).
    # Fresh params: the int8 leg above CONSUMED dparams via quantization.
    vparams = q2.init_params(dcfg, jax.random.PRNGKey(4))
    kq = 4
    rows_emb = jnp.asarray(rng.standard_normal((kq, dcfg.hidden_size)) * 0.1, jnp.bfloat16)
    kp0 = jnp.asarray(rng.standard_normal((2, 512, dcfg.num_kv_heads, 128)) * 0.1, jnp.bfloat16)
    vp0 = jnp.asarray(rng.standard_normal((2, 512, dcfg.num_kv_heads, 128)) * 0.1, jnp.bfloat16)
    lens0 = jnp.asarray([400, 380], jnp.int32)
    vstep = jax.jit(functools.partial(q2.verify_step, cfg=dcfg))
    dstep = jax.jit(functools.partial(q2.decode_step, cfg=dcfg), static_argnames="attn_impl")

    def seq_oracle():
        lg, kp, vp, ln = [], kp0, vp0, lens0
        for i in range(kq):
            lgi, kp, vp, ln = dstep(vparams, rows_emb[i], jnp.int32(400 + i),
                                    kp, vp, ln, attn_impl="jax")
            lg.append(lgi)
        return jnp.stack(lg)

    # atol widened 5e-2 -> 9e-2 in r5: verify_step now streams its weight
    # pass through the pallas matvec kernels on TPU (FF_VERIFY_MV default)
    # while the sequential oracle stays on the XLA "jax" path — the same
    # cross-implementation drift budget as the decode_step rows above.
    run("verify_step K=4 == sequential decode [logits]",
        lambda: vstep(vparams, rows_emb, jnp.int32(400) + jnp.arange(kq, dtype=jnp.int32),
                      kp0, vp0, lens0)[0],
        seq_oracle, atol=9e-2)

    # batched verify (the serving-chunk/spec-batch core): per-sequence
    # parity against the solo K-row program at empty decode bitmaps
    bsz = 3
    embsk = jnp.asarray(rng.standard_normal((bsz, kq, dcfg.hidden_size)) * 0.1, jnp.bfloat16)
    kpbk = jnp.asarray(rng.standard_normal((2, bsz, 512, dcfg.num_kv_heads, 128)) * 0.1,
                       jnp.bfloat16)
    vpbk = jnp.asarray(rng.standard_normal((2, bsz, 512, dcfg.num_kv_heads, 128)) * 0.1,
                       jnp.bfloat16)
    lensbk = jnp.asarray([[300, 260, 200], [280, 240, 190]], jnp.int32)
    posbk = lensbk[0][:, None] + jnp.arange(kq, dtype=jnp.int32)[None]
    vbstep = jax.jit(functools.partial(q2.verify_step_batch, cfg=dcfg))

    def solo_rows():
        outs = []
        for b in range(bsz):
            outs.append(vstep(vparams, embsk[b], posbk[b],
                              kpbk[:, b], vpbk[:, b], lensbk[:, b])[0])
        return jnp.stack(outs)

    # Cross-LAYOUT comparison (batched (B,K,D) program vs B solo (K,D)
    # programs): TPU batched matmuls reassociate bf16 reductions differently
    # from the solo layouts, so the logit gap is wider than the same-layout
    # pallas-vs-jax checks above (measured 5.45e-2 on chip, 2026-08-18; the
    # CPU suite pins this parity exactly where both layouts reduce in the
    # same order — test_spec_decode).
    run("verify_step_batch B=3 == per-seq solo [logits]",
        lambda: vbstep(vparams, embsk, posbk, kpbk, vpbk, lensbk,
                       jnp.zeros((bsz, 512), bool), jnp.int32(440), jnp.int32(0))[0],
        solo_rows, atol=1e-1)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return len(failures)


def check_batch_parity() -> int:
    """On-chip batched-vs-solo decision parity gate (ADVICE r2 #3).

    The lockstep-batched planned prefill computes per-sequence compression
    decisions with (B, S, D) batched matmuls whose fp32/bf16 reductions may
    reassociate differently from the solo (S, D) programs on TPU — exactly
    the tie sensitivity documented for budget0 in _pre_event_program. The
    CPU/einsum suite pins exact parity; this gate checks the COMPILED TPU
    programs agree on real-geometry prompts (7B heads/hidden, 8 layers,
    16 frames, three coherence levels) before serving telemetry relies on
    batched==solo events. Decode greedy-token divergence is reported as
    info, not gated (bf16 argmax ties are legitimate).
    """
    from bench import build_video_prompt  # repo root on sys.path via common
    from framefusion_tpu.config import FrameFusionConfig, qwen2_7b_config
    from framefusion_tpu.models import qwen2
    from framefusion_tpu.runtime.engine import CompressionEngine, PlanHistory

    cfg = qwen2_7b_config(vocab_size=8192, num_layers=8)
    ff = FrameFusionConfig(cost=0.3, similarity_lower_bound=0.6,
                           ratio_lower_bound=0.1, schedule_num_layers=8)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    engine = CompressionEngine(params, cfg, ff, attn_impl="pallas")

    rng = np.random.default_rng(7)
    patch_num, n_frames = 182, 16
    prompts = []
    for c in (0.35, 0.45, 0.55):
        h, pt, img_start, n_img = build_video_prompt(
            rng, cfg.hidden_size, n_frames=n_frames, patch_num=patch_num,
            coherent=c)
        pos = np.arange(len(pt), dtype=np.int32)
        prompts.append((h, pt, pos, img_start, n_img))

    failures = []

    def ev(res):
        return [(e.layer, e.kind, e.tokens_removed) for e in res.telemetry.events]

    # Solo adaptive runs: ground truth decisions + seed PlanHistory.
    solo_fused = [
        engine.prefill(h, pt, pos, patch_num, i0, il)
        for (h, pt, pos, i0, il) in prompts
    ]
    key = PlanHistory.key(patch_num, n_frames, ff)
    pre_plan, plan = engine.plan_history.suggest(key, ff.bucket)
    print(f"  history buckets: pre_plan={pre_plan} plan={plan}")

    # Solo planned with the shared buckets must reproduce the fused decisions.
    solo_planned = [
        engine.prefill_planned(h, pt, pos, patch_num, i0, il,
                               plan_len=plan, pre_plan_len=pre_plan)
        for (h, pt, pos, i0, il) in prompts
    ]
    for i, (f_res, p_res) in enumerate(zip(solo_fused, solo_planned)):
        ok = (ev(f_res) == ev(p_res) and f_res.valid_len == p_res.valid_len
              and p_res.mode == "planned")
        print(f"  {'PASS' if ok else 'FAIL'}  solo planned==fused   seq{i} "
              f"events={ev(p_res)} n={p_res.valid_len} mode={p_res.mode}")
        if not ok:
            failures.append(f"solo-planned-seq{i}")

    # Batched lockstep planned with the SAME buckets vs the solo runs.
    batched = engine.prefill_planned_batch(prompts, patch_num=patch_num,
                                           plan_len=plan, pre_plan_len=pre_plan)
    for i, (s_res, b_res) in enumerate(zip(solo_planned, batched)):
        ok = ev(s_res) == ev(b_res) and s_res.valid_len == b_res.valid_len
        print(f"  {'PASS' if ok else 'FAIL'}  batch==solo decisions seq{i} "
              f"events={ev(b_res)} n={b_res.valid_len} mode={b_res.mode}")
        if not ok:
            failures.append(f"batch-decisions-seq{i}")

    # Info only: batched decode vs solo decode greedy agreement.
    n_new = 8
    batch_toks = engine.generate_batch(batched, max_new_tokens=n_new)
    for i, (h, pt, pos, i0, il) in enumerate(prompts):
        r = engine.prefill_planned(h, pt, pos, patch_num, i0, il,
                                   plan_len=plan, pre_plan_len=pre_plan)
        solo_toks = engine.generate_greedy(r, max_new_tokens=n_new)
        m = next((j for j, (a, b) in enumerate(zip(solo_toks, batch_toks[i]))
                  if a != b), n_new)
        print(f"  INFO  batched-decode greedy match seq{i}: {m}/{n_new}")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return len(failures)


def bench_decodestep():
    """Attribute the decode step's gap over the weight-stream floor.

    Slope-times 32-step decode scans at the full 7B geometry (int8 weights)
    in three attention modes:
      pallas — the product path (ragged decode kernel);
      jax    — the masked-pool XLA fallback;
      stub   — attention replaced by the token's own v (qwen2.decode_step
               attn_impl="stub"): weight stream + projections + misc only.
    full - stub = total attention cost/step; floor = int8 bytes / 819 GB/s.

    Two pool geometries: a uniform post-compression pool (S=3328, every
    layer's ragged length near the pool size) and the REAL 64-frame product
    geometry — the pool is sized by the longest layer (engine
    make_decode_state), so the phase layers' full-prompt caches (~11697
    live keys, reference DynamicCache semantics: layer 0 ran before any
    merge) pad every tail layer (~3292 live) to S_pool=11776. The masked
    XLA fallback pays the full padded read per layer; the ragged kernel's
    clamped index_map skips the dead blocks.
    """
    from common import DeviceTimer

    from framefusion_tpu.config import qwen2_7b_config
    from framefusion_tpu.models import qwen2
    from framefusion_tpu.ops.quant import quantize_params_int8

    cfg = qwen2_7b_config(vocab_size=8192)
    params = quantize_params_int8(qwen2.init_params(cfg, jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    steps = 32
    tok0 = jnp.int32(17)

    def wbytes(t):
        sz = t.size * t.dtype.itemsize
        return sz

    weight_bytes = sum(wbytes(x) for x in jax.tree.leaves(params))
    floor_ms = weight_bytes / 819e9 * 1e3
    print(f"  int8 param bytes: {weight_bytes/2**30:.2f} GiB -> "
          f"weight-stream floor {floor_ms/1:.2f} ms/step @819 GB/s")

    lens_ragged = np.full((cfg.num_layers,), 3292, np.int32)
    lens_ragged[:2] = 11697
    geoms = [
        ("uniform S=3328", 3328, np.full((cfg.num_layers,), 3328 - steps - 4, np.int32)),
        ("ragged 64f S_pool=11776", 11776, lens_ragged),
    ]
    for gname, s_pool, lens_np in geoms:
        kp = jnp.asarray(
            rng.standard_normal((cfg.num_layers, s_pool, cfg.num_kv_heads, 128)) * 0.1,
            jnp.bfloat16)
        vp = jnp.asarray(
            rng.standard_normal((cfg.num_layers, s_pool, cfg.num_kv_heads, 128)) * 0.1,
            jnp.bfloat16)
        lens = jnp.asarray(lens_np)
        # tail-split view (engine.best_tail_split): tail layers attend only
        # the pool's first tail_s rows — None on the uniform geometry.
        from framefusion_tpu.runtime.engine import best_tail_split

        split = best_tail_split([int(x) for x in lens_np], s_pool, steps + 4, 128)
        print(f"  geometry: {gname} (tail_split={split})")
        variants = [("stub", None), ("pallas", None), ("jax", None), ("mv-jax", None)]
        if split is not None:
            variants += [("pallas", split), ("jax", split), ("mv-jax", split)]
        for impl, ts in variants:
            # params passed as a jit ARGUMENT: closure capture would lower
            # the 7 GB stacks as constants through the relay (DEVNOTES).
            @functools.partial(jax.jit, static_argnames=("impl", "ts"))
            def scan32(params, tok0, kp, vp, lens, impl, ts):
                def body(carry, _):
                    tok, kp, vp, lens = carry
                    emb = params["embed"][tok]
                    logits, kp, vp, lens = qwen2.decode_step(
                        params, emb, lens[0], kp, vp, lens, cfg, attn_impl=impl,
                        tail_split=ts)
                    return (jnp.argmax(logits).astype(jnp.int32), kp, vp, lens), logits[0]
                (tok, _, _, _), ls = jax.lax.scan(
                    body, (tok0, kp, vp, lens), None, length=steps)
                return tok, ls

            def run(scale, eps):
                # distinct dispatches (identical-input elision, DEVNOTES):
                # the seed token varies with the per-rep scale; eps (≈0)
                # keeps the chain's data dependency on the previous output.
                t0 = (tok0 + jnp.int32(scale * 128) + eps.astype(jnp.int32)) % jnp.int32(8192)
                return scan32(params, t0, kp, vp, lens, impl, ts)[1]

            label = impl + ("+split" if ts is not None else "")
            try:
                t, _ = DeviceTimer.timeit_slope(run, lambda o: o, max_chain=8)
                print(f"  decode_step[{label:12s}] x{steps}: {t*1e3:7.1f} ms  "
                      f"({t/steps*1e3:5.2f} ms/step, floor+{(t/steps*1e3-floor_ms):+5.2f})")
            except Exception as e:  # noqa: BLE001
                print(f"  decode_step[{label:12s}]: FAIL {type(e).__name__} {str(e)[:90]}")


def bench_decode():
    """Where does decode's gap over the weight-stream floor live?

    Decode at 7B is weight-bandwidth-bound (one full read of the weights per
    token): floor = bytes / 819 GB/s = ~16.4 ms bf16 / ~8.2 ms int8, but the
    e2e scan measures 24 / ~13.7 ms (DEVNOTES). This isolates the candidate
    costs with decode-shaped (1, K) x (K, N) matvecs at Qwen2-7B shapes:
      - per-shape dequant matvec effective GB/s (int8 + per-channel descale,
        exactly models/qwen2.mm's weight-only path)
      - bf16 matvec effective GB/s (dense path)
      - the layer-stacked fori + dynamic_index pattern the decode loop uses
        (gate/up/down MLP chain over L layers — does slicing from a stacked
        (L, K, N) array lose streaming efficiency?)
      - a pure int8 stream reduce as the read-rate ceiling check
    Each measurement repeats the op R times INSIDE one jitted fori chain
    (R sized so one dispatch ~ 0.4 s of floor-model work), then slope-times
    dispatches with bf16-visibly distinct inputs (relay artifacts, DEVNOTES).
    """
    from common import DeviceTimer

    rng = np.random.default_rng(0)
    hbm = 819e9  # measured stream rate, DEVNOTES

    def rep_count(bytes_per_op, target_s=0.4):
        return max(int(target_s / (bytes_per_op / hbm)), 4)

    def slope(jitted, x0, bytes_per_dispatch):
        run = lambda scale, eps: jitted(x0 * jnp.bfloat16(scale)
                                        + eps.astype(jnp.bfloat16))
        t, _ = DeviceTimer.timeit_slope(run, lambda o: o, max_chain=16)
        return t, bytes_per_dispatch / t / 1e9

    def dev_int8(key, shape):
        # generate ON DEVICE: host->device of GB-scale numpy arrays crawls
        # through the relay tunnel
        return jax.random.randint(key, shape, -127, 128, jnp.int8)

    keys = iter(jax.random.split(jax.random.PRNGKey(0), 64))

    shapes = [("wqkv 3584x4608", 3584, 4608), ("wo   3584x3584", 3584, 3584),
              ("wup  3584x18944", 3584, 18944), ("wdn  18944x3584", 18944, 3584)]
    print("--- single-shape matvec chains (R in-program reps per dispatch)")
    for name, kdim, n in shapes:
        w8 = dev_int8(next(keys), (kdim, n))
        sc = jnp.asarray(rng.random(n).astype(np.float32) * 0.01 + 0.005)
        wb = (w8.astype(jnp.bfloat16) * sc).astype(jnp.bfloat16)
        x0 = jnp.asarray(rng.standard_normal((1, kdim)) * 0.1, jnp.bfloat16)

        r_i8 = rep_count(kdim * n)

        @jax.jit
        def f_i8(x, w8=w8, sc=sc, r=r_i8):
            def body(i, x):
                y = jnp.dot(x, w8.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32) * sc
                return x + (jnp.sum(y) * 1e-30).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, r, body, x)

        t, rate = slope(f_i8, x0, r_i8 * kdim * n)
        print(f"  int8 dequant {name}: {t/r_i8*1e6:7.1f} us/op  {rate:6.0f} GB/s")

        r_bf = rep_count(2 * kdim * n)

        @jax.jit
        def f_bf(x, wb=wb, r=r_bf):
            def body(i, x):
                y = jnp.dot(x, wb, preferred_element_type=jnp.float32)
                return x + (jnp.sum(y) * 1e-30).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, r, body, x)

        t, rate = slope(f_bf, x0, r_bf * 2 * kdim * n)
        print(f"  bf16         {name}: {t/r_bf*1e6:7.1f} us/op  {rate:6.0f} GB/s")
        del w8, wb

    # --- pallas matvec kernel vs XLA's dequant matvec, per shape + blocks.
    # XLA already rides HBM bandwidth on the big MLP weights; the small
    # projections (wq/wk/wv/wo) are the gap the kernel must close.
    from framefusion_tpu.ops.kernels.matvec_q8 import matvec_bf16, matvec_q8

    print("--- pallas matvec kernel (int8 unless noted)")
    pshapes = shapes + [("wkv  3584x512", 3584, 512)]
    for name, kdim, n in pshapes:
        w8 = dev_int8(next(keys), (kdim, n))
        sc = jnp.asarray(rng.random(n).astype(np.float32) * 0.01 + 0.005)
        wb = (w8.astype(jnp.bfloat16) * sc).astype(jnp.bfloat16)
        x0 = jnp.asarray(rng.standard_normal((1, kdim)) * 0.1, jnp.bfloat16)
        r = rep_count(kdim * n)

        def bench_one(tag, y_fn, bytes_per_rep, reps):
            @jax.jit
            def f(x):
                def body(i, x):
                    y = y_fn(x)
                    return x + (jnp.sum(y) * 1e-30).astype(jnp.bfloat16)
                return jax.lax.fori_loop(0, reps, body, x)

            try:
                t, rate = slope(f, x0, reps * bytes_per_rep)
                print(f"  {tag:34s}: {t/reps*1e6:7.1f} us/op  {rate:6.0f} GB/s")
            except Exception as e:  # noqa: BLE001
                print(f"  {tag:34s}: FAIL {type(e).__name__} {str(e)[:70]}")

        for bk in (None, 896, 1792):
            for bn in (None, 1024, 2048):
                if bk is not None and kdim % bk:
                    continue
                if bn is not None and n % bn:
                    continue
                tag = f"pallas {name} bk={bk or 'auto'} bn={bn or 'auto'}"
                bench_one(tag, functools.partial(matvec_q8, w8=w8, scale=sc,
                                                 block_k=bk, block_n=bn),
                          kdim * n, r)
        bench_one(f"pallas {name} bf16", functools.partial(matvec_bf16, w=wb),
                  2 * kdim * n, rep_count(2 * kdim * n))
        del w8, wb

    # --- layer-stacked MLP chain: the decode loop's access pattern
    # (dynamic_index_in_dim into (L, K, N) int8 stacks inside fori). Weights
    # are jit ARGUMENTS — closure capture lowers them as multi-GB constants,
    # which crawls through the relay (a full --what decode run timed out on
    # exactly that).
    L, kdim, n = 8, 3584, 18944
    wg = dev_int8(next(keys), (L, kdim, n))
    wd = dev_int8(next(keys), (L, n, kdim))
    sg = jnp.asarray(rng.random(n).astype(np.float32) * 0.01 + 0.005)
    sd = jnp.asarray(rng.random(kdim).astype(np.float32) * 0.01 + 0.005)
    x0 = jnp.asarray(rng.standard_normal((1, kdim)) * 0.1, jnp.bfloat16)
    sweep_bytes = 2 * L * kdim * n
    r_st = rep_count(sweep_bytes)

    @jax.jit
    def f_stack(x, wg, wd):
        def sweep(j, x):
            def layer(l, h):
                g = jax.lax.dynamic_index_in_dim(wg, l, 0, keepdims=False)
                d = jax.lax.dynamic_index_in_dim(wd, l, 0, keepdims=False)
                u = jnp.dot(h, g.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32) * sg
                u = (u * jax.nn.sigmoid(u)).astype(jnp.bfloat16)
                y = jnp.dot(u, d.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32) * sd
                return h + (y * 1e-30).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, L, layer, x)
        return jax.lax.fori_loop(0, r_st, sweep, x)

    t, rate = slope(functools.partial(f_stack, wg=wg, wd=wd), x0, r_st * sweep_bytes)
    print(f"--- stacked fori MLP (L={L}): {t/r_st*1e3:7.2f} ms/sweep  "
          f"{rate:6.0f} GB/s  (floor {sweep_bytes/hbm*1e3:.2f} ms)")

    # --- pure int8 stream reduce over the same stack (read-rate ceiling;
    # int8->i32 convert + reduce runs on the VPU, so this can under-read
    # the true DMA rate a little).
    @jax.jit
    def f_stream(x, wg, wd):
        s = jnp.sum(wg.astype(jnp.int32)) + jnp.sum(wd.astype(jnp.int32))
        return x + (s.astype(jnp.float32) * 1e-30).astype(jnp.bfloat16)

    t, rate = slope(functools.partial(f_stream, wg=wg, wd=wd), x0, sweep_bytes)
    print(f"--- int8 stream reduce      : {t*1e3:7.2f} ms        {rate:6.0f} GB/s")


def bench_quant():
    """Is the int8 MXU path reachable from XLA on this chip? v5e quotes
    ~394 TOPS int8 vs ~197 TFLOPS bf16; if int8 x int8 -> int32 matmuls run
    ~2x, a W8A8 tail (activations quantized per row AFTER all compression
    decisions) is the next planned-prefill lever."""
    rng = np.random.default_rng(0)
    m, k, n = 3328, 3584, 18944
    x_bf = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
    w_bf = jnp.asarray(rng.standard_normal((k, n)) * 0.1, jnp.bfloat16)
    x_i8 = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
    w_i8 = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
    sx = jnp.asarray(rng.random((m, 1)) + 0.5, jnp.float32)
    sw = jnp.asarray(rng.random((1, n)) + 0.5, jnp.float32)
    fl = 2 * m * k * n

    @jax.jit
    def f_bf(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    @jax.jit
    def f_i8(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.int32)

    @jax.jit
    def f_w8a8(x, w, sx, sw):
        # full W8A8 epilogue: int32 accum -> fp32 descale -> bf16
        acc = jnp.dot(x, w, preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sx * sw).astype(jnp.bfloat16)

    for name, fn in [
        ("bf16 x bf16 -> f32", lambda: f_bf(x_bf, w_bf)),
        ("int8 x int8 -> i32", lambda: f_i8(x_i8, w_i8)),
        ("W8A8 + descale epilogue", lambda: f_w8a8(x_i8, w_i8, sx, sw)),
    ]:
        try:
            t = timeit(fn)
            print(f"  {name:26s}: {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} T(FL)OP/s")
        except Exception as e:  # noqa: BLE001
            print(f"  {name:26s}: {type(e).__name__}: {str(e)[:100]}")


def slope_timed(fn, x, rounds=3, max_chain=8):
    """Per-run time as the slope between two dependency-chained run counts
    (bench.py timed(), condensed): cancels the relay's latency-overlap term
    and defeats identical-input elision via per-rep bf16-visible scales.
    ``fn(x_like) -> array``; the returned array must depend on every heavy
    output of the stage being timed."""
    k = [0]
    out = fn(x)
    force(out)
    l_est = read_overhead()

    def chain(n):
        nonlocal out
        t0 = time.perf_counter()
        eps = jnp.float32(0.0)
        for _ in range(n):
            k[0] += 1
            scale = jnp.asarray(1.0 + (k[0] % 97 + 1) * 2.0**-7, x.dtype)
            out = fn(x * scale + eps.astype(x.dtype))
            eps = out.reshape(-1)[0].astype(jnp.float32) * jnp.float32(1e-30)
        force(out)
        return time.perf_counter() - t0

    n, total = 2, chain(2)
    while total < max(3.0 * l_est, 2.0) and n < max_chain:
        n *= 2
        total = chain(n)
    lo, hi = max(n // 2, 1), n
    slopes = []
    for _ in range(rounds):
        e_lo, e_hi = chain(lo), chain(hi)
        slopes.append(max((e_hi - e_lo) / (hi - lo), 1e-9))
    slopes.sort()
    return slopes[len(slopes) // 2]


def bench_ledger():
    """Speed-of-light ledger of the PLANNED prefill at bench geometry: each
    stage slope-timed in isolation next to its analytic floor (the evidence
    base for pushing the bf16 headline — DEVNOTES r4)."""
    import common  # noqa: F401
    import bench as benchmod
    from framefusion_tpu.config import FrameFusionConfig, qwen2_7b_config
    from framefusion_tpu.core.schedule import compute_pruning_ratio
    from framefusion_tpu.models import qwen2
    from framefusion_tpu.runtime import engine as eng

    cfg = qwen2_7b_config(vocab_size=32768)
    ff = FrameFusionConfig(cost=0.3, similarity_lower_bound=0.6, ratio_lower_bound=0.1)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    h_np, patch_type, img_start, n_img = benchmod.build_video_prompt(
        rng, cfg.hidden_size, n_frames=64)
    pos = np.arange(len(patch_type), dtype=np.int32)
    e = eng.CompressionEngine(params, cfg, ff, attn_impl="pallas")
    h, pt, pos_tok, orig_len = e._prep_inputs(
        jnp.asarray(h_np, cfg.dtype), patch_type, pos)
    frame_tok0 = int(np.sum(patch_type != -1))
    pre_plan, plan = 6528, 3328  # the probe-autotuned bench buckets
    max_events = ff.schedule_num_layers
    budget0 = compute_pruning_ratio([], ff.cost, ff.schedule_num_layers)

    def pre_event(hv):
        o = eng._pre_event_program(
            hv, pos_tok, pt, jnp.int32(orig_len), jnp.int32(frame_tok0),
            jnp.float32(budget0), jnp.float32(ff.similarity_lower_bound),
            jnp.float32(ff.ratio_lower_bound), patch_num=182,
            max_events=max_events, schedule_num_layers=ff.schedule_num_layers,
            plan_len=pre_plan)
        return o[0][:1, :1] + o[9][5]  # h1 + control join

    t_pre = slope_timed(pre_event, h)

    # clean stage outputs feeding the next stages
    (h1, pos1, pt1, n_live_d, frame_tok_d, sparsity_d, n_events_d, fm_d, fp_d,
     _ctl) = eng._pre_event_program(
        h, pos_tok, pt, jnp.int32(orig_len), jnp.int32(frame_tok0),
        jnp.float32(budget0), jnp.float32(ff.similarity_lower_bound),
        jnp.float32(ff.ratio_lower_bound), patch_num=182,
        max_events=max_events, schedule_num_layers=ff.schedule_num_layers,
        plan_len=pre_plan)
    live1 = jnp.arange(pre_plan, dtype=jnp.int32) < n_live_d
    phase_common = dict(
        cfg=cfg, attn_impl="pallas", capture_num=ff.num_importance_queries,
        patch_num=182, max_events=max_events,
        pool_layers=min(e.pool_layers, cfg.num_layers),
        schedule_num_layers=ff.schedule_num_layers)

    def phase(hv):
        st = eng._phase_program(
            params, hv, pos1, pt1, live1, n_live_d, frame_tok_d,
            jnp.int32(orig_len), n_live_d, jnp.int32(img_start),
            jnp.int32(n_img), sparsity_d, n_events_d, fm_d, fp_d,
            jnp.int32(0), jnp.float32(ff.cost),
            jnp.float32(ff.similarity_lower_bound),
            jnp.float32(ff.ratio_lower_bound), include_pre_event=False,
            **phase_common)
        return (st["h"][:1, :1] + st["k_pool"][-1, :1, :1, 0]
                + st["control"][0])

    t_phase = slope_timed(phase, h1)

    st = eng._phase_program(
        params, h1, pos1, pt1, live1, n_live_d, frame_tok_d,
        jnp.int32(orig_len), n_live_d, jnp.int32(img_start), jnp.int32(n_img),
        sparsity_d, n_events_d, fm_d, fp_d, jnp.int32(0), jnp.float32(ff.cost),
        jnp.float32(ff.similarity_lower_bound), jnp.float32(ff.ratio_lower_bound),
        include_pre_event=False, **phase_common)
    layer_end = int(np.asarray(st["control"])[0])

    def compact(hv):
        o = eng._compact_state_program(hv, pos1, pt1, st["live"], st["n_live"],
                                       new_len=plan)
        return o[0][:1, :1]

    t_compact = slope_timed(compact, st["h"])

    h2, pos2, pt2 = eng._compact_state_program(
        st["h"], pos1, pt1, st["live"], st["n_live"], new_len=plan)

    def tail(hv):
        logits, k_tail, v_tail = eng._tail_program(
            params, layer_end, hv, pos2, st["n_live"], cfg=cfg,
            attn_impl="pallas")
        return logits[:1] + k_tail[-1, :1, 0, 0] + v_tail[-1, :1, 0, 0]

    t_tail = slope_timed(tail, h2)

    def pack(kv):
        kp, vp, lens = eng._pack_caches_program(kv, st["v_pool"], st["cache_live"])
        return kp[-1, :1, 0, 0] + vp[-1, :1, 0, 0] + lens[0].astype(kv.dtype)

    t_pack = slope_timed(pack, st["k_pool"])

    # analytic floors at 185 TF/s bf16 (measured sustained, DEVNOTES)
    p_layer = 2 * cfg.hidden_size * (cfg.num_heads + 2 * cfg.num_kv_heads) * cfg.head_dim_ \
        + cfg.hidden_size * cfg.num_heads * cfg.head_dim_ \
        + 3 * cfg.hidden_size * cfg.intermediate_size
    tf = 185e12
    n_tail = cfg.num_layers - layer_end
    sol_tail = n_tail * 2 * plan * p_layer / tf
    sol_phase = layer_end * 2 * pre_plan * p_layer / tf
    sol_logits = 2 * plan * 0 + 2 * 1 * cfg.hidden_size * cfg.vocab_size / tf

    total = t_pre + t_phase + t_compact + t_tail + t_pack
    print(f"planned-prefill ledger (pre_plan {pre_plan}, plan {plan}, "
          f"tail layers {n_tail}):")
    print(f"  pre-event (full-S merge+compact): {t_pre*1e3:7.1f} ms")
    print(f"  phase ({layer_end} layers @ {pre_plan}):   {t_phase*1e3:7.1f} ms"
          f"   (matmul floor {sol_phase*1e3:.1f})")
    print(f"  compact -> {plan}:                {t_compact*1e3:7.1f} ms")
    print(f"  tail ({n_tail} layers @ {plan}):    {t_tail*1e3:7.1f} ms"
          f"   (matmul floor {sol_tail*1e3:.1f}, +logits {sol_logits*1e3:.2f})")
    print(f"  pack phase caches:               {t_pack*1e3:7.1f} ms")
    print(f"  SUM of stages:                   {total*1e3:7.1f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="all",
                    choices=["attn", "engine", "quant", "decode", "decodestep",
                             "ledger", "all"])
    ap.add_argument("--check", action="store_true",
                    help="compile-and-verify every kernel dispatch regime; "
                         "non-zero exit on mismatch or compile failure")
    args = ap.parse_args()
    print("backend:", jax.default_backend())
    if args.check:
        n = check_kernels()
        print("\nbatched-vs-solo decision parity (engine level):")
        n += check_batch_parity()
        raise SystemExit(n)
    if args.what in ("attn", "all"):
        bench_attention()
    if args.what in ("quant", "all"):
        bench_quant()
    if args.what == "decode":
        bench_decode()
    if args.what == "decodestep":
        bench_decodestep()
    if args.what == "ledger":
        bench_ledger()
    if args.what in ("engine", "all"):
        bench_engine()


if __name__ == "__main__":
    main()
