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

    draft = 4 if args.speculative else 0
    # Warmup loop(s): compile the chunk program(s) + prefill executors once.
    for d in {0, draft}:
        warm = ServingLoop(engine, max_slots=args.slots, max_new_cap=args.new_tokens,
                           chunk_steps=args.chunk, draft_len=d, prefix_cap=prefix_cap)
        warm.submit(ServeRequest(reqs[0].inputs, max_new_tokens=4))
        warm.run()

    # Main loop runs PLAIN (draft 0): it is the baseline the speculative
    # pass below compares against, and cold prompt-lookup has nothing to
    # draft from on these synthetic prompts anyway.
    loop = ServingLoop(engine, max_slots=args.slots, max_new_cap=args.new_tokens,
                       chunk_steps=args.chunk, draft_len=0, prefix_cap=prefix_cap)
    ids = [loop.submit(r) for r in reqs]
    t0 = time.perf_counter()
    results = loop.run()
    dt = time.perf_counter() - t0

    total_toks = sum(len(results[i].tokens) for i in ids)
    print(f"served {args.requests} requests through {args.slots} slots in "
          f"{dt*1e3:.0f} ms — {total_toks} tokens, {total_toks/dt:.1f} tok/s, "
          f"{loop._chunk_idx} chunks, {loop.compactions} compactions")
    qs = sorted(results[i].queue_s for i in ids)
    ss = sorted(results[i].serve_s for i in ids)
    mid = len(ids) // 2
    print(f"  latency: queue p50 {qs[mid]*1e3:.0f} ms / max {qs[-1]*1e3:.0f} ms; "
          f"serve p50 {ss[mid]*1e3:.0f} ms / max {ss[-1]*1e3:.0f} ms")
    record = {
        "requests": args.requests, "slots": args.slots, "chunk_steps": args.chunk,
        "frames": frames, "prompt_tokens": int(len(reqs[0].inputs.patch_type)),
        "backend": jax.default_backend(), "int8": bool(args.int8),
        "total_tokens": total_toks, "wall_ms": round(dt * 1e3, 1),
        "serving_tokens_per_s": round(total_toks / dt, 1),
        "queue_ms_p50": round(qs[mid] * 1e3, 1), "queue_ms_max": round(qs[-1] * 1e3, 1),
        "serve_ms_p50": round(ss[mid] * 1e3, 1), "serve_ms_max": round(ss[-1] * 1e3, 1),
        "chunks": loop._chunk_idx, "compactions": loop.compactions,
    }

    if args.sequential_baseline:
        # The reference serves one request at a time end to end (bsz==1,
        # main.py:203). Same requests, same machinery, max_slots=1 — the
        # honest baseline for what the batched slots buy. Warm its (1-slot)
        # chunk program first so the A/B compares steady-state loops.
        warm1 = ServingLoop(engine, max_slots=1, max_new_cap=args.new_tokens,
                            chunk_steps=args.chunk, draft_len=0, prefix_cap=prefix_cap)
        warm1.submit(ServeRequest(reqs[0].inputs, max_new_tokens=4))
        warm1.run()
        bloop = ServingLoop(engine, max_slots=1, max_new_cap=args.new_tokens,
                            chunk_steps=args.chunk, draft_len=0, prefix_cap=prefix_cap)
        bids = [bloop.submit(ServeRequest(r.inputs, max_new_tokens=r.max_new_tokens))
                for r in reqs]
        t0 = time.perf_counter()
        bresults = bloop.run()
        b1_dt = time.perf_counter() - t0
        b1_toks = sum(len(bresults[i].tokens) for i in bids)
        print(f"  sequential 1-slot baseline: {b1_dt*1e3:.0f} ms — {b1_toks} tokens, "
              f"{b1_toks/b1_dt:.1f} tok/s; continuous-batching speedup "
              f"{b1_dt/dt:.2f}x")
        record.update({
            "sequential_wall_ms": round(b1_dt * 1e3, 1),
            "sequential_tokens_per_s": round(b1_toks / b1_dt, 1),
            "batching_speedup": round(b1_dt / dt, 3),
        })
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
                            draft_len=draft, prefix_cap=prefix_cap)
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
