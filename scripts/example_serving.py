"""Continuous-batching serving example: a stream of video-QA requests served
through a fixed set of slots (runtime/serving.py).

Requests queue in FIFO order; each is admitted into a freed slot via its own
compressed prefill, then decodes lockstep with whatever else is in flight —
one chunked device program per scheduling quantum. The reference serves one
request at a time end to end (bsz==1, /root/reference/framefusion/main.py:203);
this is the production form of the same engine.

Usage:
  python scripts/example_serving.py [--requests 8] [--slots 4] [--chunk 8]
      [--new-tokens 32] [--frames 16] [--speculative] [--int8] [--tiny]
      [--tail-pool]
"""

import argparse
import os
import time

import common  # noqa: F401  (sys.path + compile cache)
import numpy as np

import jax

from framefusion_tpu.config import FrameFusionConfig, qwen2_7b_config, tiny_llm_config
from framefusion_tpu.models import qwen2
from framefusion_tpu.models.adapters.common import PrefillInputs
from framefusion_tpu.runtime.engine import CompressionEngine
from framefusion_tpu.runtime.serving import ServeRequest, ServingLoop


def build_prompt(rng, hidden, n_frames, patch_num, coherent):
    from bench import build_video_prompt

    return build_video_prompt(rng, hidden, n_frames=n_frames, patch_num=patch_num,
                              coherent=coherent)


def run_loop(engine, reqs, arrival_offsets, *, slots, chunk, max_new, prefix_cap,
             draft=0, prefill_mode="fused", tail_pool=None):
    """Serve ``reqs`` with request i submitted ``arrival_offsets[i]`` seconds
    after start (0 = all enqueued up front, the r4 easy regime). Stepping
    continues through idle gaps so late arrivals are admitted when their
    time comes — queue_s then measures real scheduling wait, not backlog.
    Returns (results dict by request index, wall seconds, loop)."""
    loop = ServingLoop(engine, max_slots=slots, max_new_cap=max_new,
                       chunk_steps=chunk, draft_len=draft,
                       prefix_cap=prefix_cap, prefill_mode=prefill_mode,
                       tail_pool=tail_pool)
    order = sorted(range(len(reqs)), key=lambda i: arrival_offsets[i])
    pending = list(order)
    rid_of = {}
    t0 = time.perf_counter()
    while True:
        now = time.perf_counter() - t0
        while pending and arrival_offsets[pending[0]] <= now:
            i = pending.pop(0)
            rid_of[i] = loop.submit(reqs[i])
        busy = loop.step()
        if not busy:
            if not pending:
                break
            wait = arrival_offsets[pending[0]] - (time.perf_counter() - t0)
            if wait > 0:
                time.sleep(min(wait, 0.02))
    dt = time.perf_counter() - t0
    results = loop.run()  # drain (no-op when already drained)
    return {i: results[rid_of[i]] for i in rid_of}, dt, loop


def percentiles(vals, ps=(50, 95)):
    vals = sorted(vals)
    out = {}
    for p in ps:
        k = min(int(round(p / 100 * (len(vals) - 1))), len(vals) - 1)
        out[f"p{p}"] = round(vals[k] * 1e3, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--new-tokens", type=int, default=32)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--speculative", action="store_true",
                    help="draft_len=4 prompt-lookup speculation per slot")
    ap.add_argument("--int8", action="store_true", help="weight-only int8 decode")
    ap.add_argument("--tiny", action="store_true", help="tiny config (CPU smoke test)")
    ap.add_argument("--fixed-budget", action="store_true",
                    help="every request decodes exactly --new-tokens (default: "
                         "uniform random in [new_tokens/2, new_tokens])")
    ap.add_argument("--sequential-baseline", action="store_true",
                    help="also serve the same requests through a 1-slot loop "
                         "(the reference's bsz==1 contract, main.py:203) and "
                         "report the continuous-batching speedup")
    ap.add_argument("--arrival-rate", type=float, default=0.0,
                    help="Poisson request arrivals at this mean rate (req/s); "
                         "0 = all requests enqueued at t=0 (backlog regime)")
    ap.add_argument("--tail-pool", action="store_true",
                    help="physically split the slot pools: layers past the "
                         "compression phase allocate only their compressed "
                         "prefix (P and cap auto-derived from a sample "
                         "prefill) — same tokens, ~L/P-fold less pool HBM, "
                         "clears the 64-frame B=8 memory wall")
    ap.add_argument("--slots-sweep", type=str, default=None,
                    help="comma-separated slot counts, e.g. 1,2,4,8 — serve "
                         "the same requests+arrivals at each and report "
                         "per-B throughput and batching speedup vs B=1")
    ap.add_argument("--json", type=str, default=None,
                    help="write the measured numbers to this JSON file")
    args = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    if args.tiny or not on_tpu:
        cfg = tiny_llm_config(num_layers=4)
        patch_num, frames, prefix_cap = 6, 8, 256
        attn_impl = "chunked"
    else:
        cfg = qwen2_7b_config(vocab_size=8192)
        patch_num, frames, prefix_cap = 182, args.frames, 4096
        attn_impl = "pallas"

    ff = FrameFusionConfig(cost=0.3, similarity_lower_bound=0.6, ratio_lower_bound=0.1)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    if args.int8:
        from framefusion_tpu.ops.quant import quantize_params_int8

        params = quantize_params_int8(params)
    engine = CompressionEngine(params, cfg, ff, attn_impl=attn_impl)

    rng = np.random.default_rng(0)
    reqs = []
    for i in range(args.requests):
        h, pt, img_start, n_img = build_prompt(rng, cfg.hidden_size, frames, patch_num,
                                               coherent=0.35 + 0.1 * (i % 3))
        pos = np.arange(len(pt), dtype=np.int32)
        inp = PrefillInputs(input_embeds=h, patch_type=pt, position_ids=pos,
                            patch_num=patch_num, image_token_start=img_start,
                            image_token_length=n_img)
        budget = (args.new_tokens if args.fixed_budget
                  else int(rng.integers(args.new_tokens // 2, args.new_tokens + 1)))
        reqs.append(ServeRequest(inp, max_new_tokens=budget))

    # The phase layers' caches hold the FULL prompt (reference DynamicCache
    # semantics: layer 0 ran before any merge), so the slot prefix region
    # must cover the uncompressed prompt length at 64-frame geometry.
    prefix_cap = max(prefix_cap, len(reqs[0].inputs.patch_type) + engine.ff.bucket)

    # Arrival schedule: exponential inter-arrival gaps at --arrival-rate
    # (Poisson process), shared across every measured loop so the sweep
    # compares identical workloads. Rate 0 = the all-at-t0 backlog regime.
    arr_rng = np.random.default_rng(7)
    if args.arrival_rate > 0:
        gaps = arr_rng.exponential(1.0 / args.arrival_rate, size=len(reqs))
        arrivals = np.cumsum(gaps)
        arrivals[0] = 0.0  # first request starts the clock
    else:
        arrivals = np.zeros(len(reqs))

    draft = 4 if args.speculative else 0
    slot_counts = ([int(s) for s in args.slots_sweep.split(",")]
                   if args.slots_sweep else [args.slots])
    if args.sequential_baseline and 1 not in slot_counts:
        slot_counts = [1] + slot_counts

    # Auto-derive the split-pool geometry from a sample prefill: P = first
    # layer whose cache is shorter than layer 0's (compression has fired by
    # then — it never un-fires, main.py:40-140 layer order), cap = the max
    # layer>=P length plus headroom for request-to-request variation (the
    # admission assert catches any request that still exceeds it).
    tail_pool = None
    if args.tail_pool:
        inp0 = reqs[0].inputs
        res0 = engine.prefill(inp0.input_embeds, inp0.patch_type,
                              inp0.position_ids, patch_num=inp0.patch_num,
                              image_token_start=inp0.image_token_start,
                              image_token_length=inp0.image_token_length)
        lens0 = [c[2] for c in res0.layer_caches]
        p = next((l for l in range(1, len(lens0)) if lens0[l] < lens0[0]), None)
        if p is not None:
            cap = int(max(lens0[p:]) * 1.15) + engine.ff.bucket
            tail_pool = (p, cap)
            print(f"tail pool: P={p}, tail_prefix_cap={cap} "
                  f"(sample lens {lens0[0]} -> {max(lens0[p:])}; "
                  f"head prefix_cap {prefix_cap})")
        del res0

    def serve_at(slots, draft_d=0, warm_first=True):
        if warm_first:
            warm = ServingLoop(engine, max_slots=slots, max_new_cap=args.new_tokens,
                               chunk_steps=args.chunk, draft_len=draft_d,
                               prefix_cap=prefix_cap, tail_pool=tail_pool)
            warm.submit(ServeRequest(reqs[0].inputs, max_new_tokens=4))
            warm.run()
        return run_loop(engine, reqs, arrivals, slots=slots, chunk=args.chunk,
                        max_new=args.new_tokens, prefix_cap=prefix_cap,
                        draft=draft_d, tail_pool=tail_pool)

    sweep_rows = []
    results = dt = main_row = None
    for slots in slot_counts:
        try:
            res_s, dt_s, loop_s = serve_at(slots)
        except Exception as e:  # noqa: BLE001 — a B past the memory wall is
            # a DATA POINT of the sweep (e.g. 64-frame x B=8 int8: pools
            # ~5.5 GB + weights ~7.6 GB leaves no HLO-temp headroom and the
            # chunk program fails to compile), not a reason to lose the
            # feasible rows. Record it and keep sweeping.
            msg = str(e).split("\n")[0][:200]
            sweep_rows.append({"slots": slots, "infeasible": msg})
            print(f"  B={slots}: INFEASIBLE at this geometry — {msg}")
            import gc

            gc.collect()
            continue
        toks_s = sum(len(r.tokens) for r in res_s.values())
        lat = [res_s[i].queue_s + res_s[i].serve_s for i in res_s]
        row = {
            "slots": slots, "wall_ms": round(dt_s * 1e3, 1),
            "tokens": toks_s, "tokens_per_s": round(toks_s / dt_s, 1),
            "chunks": loop_s._chunk_idx, "compactions": loop_s.compactions,
            "queue_ms": percentiles([res_s[i].queue_s for i in res_s]),
            "serve_ms": percentiles([res_s[i].serve_s for i in res_s]),
            "request_latency_ms": percentiles(lat),
        }
        sweep_rows.append(row)
        print(f"  B={slots}: {row['wall_ms']:.0f} ms, {row['tokens_per_s']} tok/s, "
              f"{row['chunks']} chunks, {row['compactions']} compactions; "
              f"latency p50/p95 {row['request_latency_ms']['p50']:.0f}/"
              f"{row['request_latency_ms']['p95']:.0f} ms")
        if slots == args.slots or results is None:
            results, dt, main_row = res_s, dt_s, row
        # Free this B's pools before the next geometry allocates — at the
        # 64-frame hard regime a loop's batched pools are multi-GB and two
        # generations coexisting next to the 7B weights OOMs the chip.
        del loop_s
        import gc

        gc.collect()
    ids = list(range(len(reqs)))

    total_toks = sum(len(results[i].tokens) for i in ids)
    print(f"served {args.requests} requests through {args.slots} slots in "
          f"{dt*1e3:.0f} ms — {total_toks} tokens, {total_toks/dt:.1f} tok/s, "
          f"{main_row['chunks']} chunks, {main_row['compactions']} compactions")
    qs = sorted(results[i].queue_s for i in ids)
    ss = sorted(results[i].serve_s for i in ids)
    mid = len(ids) // 2
    print(f"  latency: queue p50 {qs[mid]*1e3:.0f} ms / max {qs[-1]*1e3:.0f} ms; "
          f"serve p50 {ss[mid]*1e3:.0f} ms / max {ss[-1]*1e3:.0f} ms")
    record = {
        "requests": args.requests, "slots": args.slots, "chunk_steps": args.chunk,
        "frames": frames, "prompt_tokens": int(len(reqs[0].inputs.patch_type)),
        "backend": jax.default_backend(), "int8": bool(args.int8),
        "tail_pool": list(tail_pool) if tail_pool else None,
        "arrival_rate_per_s": args.arrival_rate,
        "arrival_span_ms": round(float(arrivals[-1]) * 1e3, 1),
        "total_tokens": total_toks, "wall_ms": round(dt * 1e3, 1),
        "serving_tokens_per_s": round(total_toks / dt, 1),
        "queue_ms_p50": round(qs[mid] * 1e3, 1), "queue_ms_max": round(qs[-1] * 1e3, 1),
        "serve_ms_p50": round(ss[mid] * 1e3, 1), "serve_ms_max": round(ss[-1] * 1e3, 1),
        "chunks": main_row["chunks"], "compactions": main_row["compactions"],
        "slots_sweep": sweep_rows,
        "reading_note": (
            "At 64-frame geometry this workload is PREFILL-bound (each "
            "admission runs an ~11.7k-token compressed prefill serially "
            "between chunks; decode is ~48 tokens/request), so wall-clock "
            "batching gains are bounded by the decode fraction and ride "
            "the relay's process variance — the stable signals are the "
            "chunk counts (dispatch+sync per quantum, ~inverse in B), the "
            "on-chip compaction counts, and the queue-vs-serve split under "
            "Poisson arrivals. An infeasible slots row marks the memory "
            "wall: that B's pools + int8 weights leave no HLO-temp "
            "headroom at this prompt length."),
    }
    base1 = next((r for r in sweep_rows
                  if r["slots"] == 1 and "wall_ms" in r), None)
    if base1 is not None:
        for r in sweep_rows:
            if "wall_ms" in r:
                r["batching_speedup"] = round(base1["wall_ms"] / r["wall_ms"], 3)
        record.update({
            "sequential_wall_ms": base1["wall_ms"],
            "sequential_tokens_per_s": base1["tokens_per_s"],
            "batching_speedup": round(base1["wall_ms"] / record["wall_ms"], 3),
        })
        print(f"  sequential 1-slot baseline: {base1['wall_ms']:.0f} ms — "
              f"{base1['tokens_per_s']} tok/s; continuous-batching speedup "
              f"{record.get('batching_speedup')}x")
    if args.speculative:
        # Oracle-seeded pass: re-serve the same requests with each one's own
        # plain output as its lookup history, so drafts hit — the measured
        # ceiling of speculative serving. (Cold prompt-lookup on synthetic
        # random-weight prompts accepts ~nothing: no repeated n-grams; real
        # text has them. example_batched --speculative uses the same method.)
        spec_reqs = [ServeRequest(r.inputs, max_new_tokens=r.max_new_tokens,
                                  prompt_ids=np.asarray(results[i].tokens, np.int32))
                     for i, r in zip(ids, reqs)]
        sloop = ServingLoop(engine, max_slots=args.slots,
                            max_new_cap=args.new_tokens, chunk_steps=args.chunk,
                            draft_len=draft, prefix_cap=prefix_cap,
                            tail_pool=tail_pool)
        sids = [sloop.submit(r) for r in spec_reqs]
        t0 = time.perf_counter()
        sresults = sloop.run()
        ds = time.perf_counter() - t0
        stoks = sum(len(sresults[i].tokens) for i in sids)
        agree = sum(a == b for i, j in zip(sids, ids)
                    for a, b in zip(sresults[i].tokens, results[j].tokens))
        print(f"  oracle-seeded speculative: {ds*1e3:.0f} ms — {stoks} tokens, "
              f"{stoks/ds:.1f} tok/s, {sloop._chunk_idx} chunks; "
              f"agreement {agree}/{total_toks} vs plain")
        record.update({
            "speculative_wall_ms": round(ds * 1e3, 1),
            "speculative_tokens_per_s": round(stoks / ds, 1),
            "speculative_agreement": f"{agree}/{total_toks}",
        })

    for i in ids[: min(4, len(ids))]:
        r = results[i]
        print(f"  req {i}: admitted@chunk {r.admitted_step}, "
              f"{len(r.tokens)} tokens, prefill={r.prefill_mode}, "
              f"first: {r.tokens[:6]}")

    # Spot-check: request 0 against its solo greedy run. The serving chunk
    # decodes through the BATCHED slot program while the solo loop is a
    # single-sequence program; on TPU their bf16 reductions reassociate
    # differently, so argmax near-ties can flip a random-init chain (exact
    # parity for matching layouts is pinned in tests/test_serving.py on CPU).
    # Gate on the first token; report agreement.
    inp = reqs[0].inputs
    res = engine.prefill(inp.input_embeds, inp.patch_type, inp.position_ids,
                         patch_num=inp.patch_num,
                         image_token_start=inp.image_token_start,
                         image_token_length=inp.image_token_length)
    solo = engine.generate_greedy(res, reqs[0].max_new_tokens)
    got = results[ids[0]].tokens
    assert got[0] == solo[0], "serving first token diverged from solo greedy"
    # One argmax tie-flip legitimately ends the matching prefix on random-init
    # weights, but a broken tail-split/pool bound corrupts EVERY token after
    # the first — so gate on a minimum matching prefix, not just token 0.
    prefix = 0
    for a, b in zip(got, solo):
        if a != b:
            break
        prefix += 1
    # On TPU, bf16 reduction reassociation between the batched chunk program
    # and the solo loop can flip argmax near-ties on random-init weights at
    # ANY position (see the comment above), so the default gate there is
    # token 0 only; exact-layout parity is pinned on CPU (tests/test_serving).
    default_prefix = "1" if jax.default_backend() == "tpu" else "4"
    min_prefix = min(
        int(os.environ.get("FF_SERVE_PARITY_MIN_PREFIX", default_prefix)), len(solo)
    )
    assert prefix >= min_prefix, (
        f"serving diverged from solo greedy at token {prefix} "
        f"(< {min_prefix}): {got[:8]} vs {solo[:8]}")
    agree = sum(a == b for a, b in zip(got, solo))
    print(f"parity: request 0 vs solo greedy — prefix {prefix}, "
          f"agreement {agree}/{len(solo)}")
    record["parity_prefix"] = prefix

    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
