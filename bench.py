"""Benchmark: FrameFusion LLM prefill speedup at 64 frames on one TPU chip.

Mirrors the reference's measurement methodology
(/root/reference/script/playground/example_llava.py:129-167: warmed A/B of
the same prompt through the dense model and the FrameFusion model) on the
rebuild's north-star metric (BASELINE.json): LLM prefill at 64 frames,
LLaVA-Video-7B-Qwen2 geometry, cost=0.3, S_th=0.6, r_min=0.1.

Timing note: on this runner, dispatch and ``block_until_ready`` are
asynchronous stubs (remote-relay execution); only a device->host read forces
completion. Each path is therefore timed as N queued runs closed by a single
forced logits read, with the measured read round-trip subtracted.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
where value = dense_prefill_ms / framefusion_prefill_ms and vs_baseline
normalises by the reference's lower-bound LLM speedup claim (3.4x,
reference README.md:13).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# Persistent compile cache: repeat bench invocations skip XLA recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import numpy as np


def build_video_prompt(rng, hidden, n_frames=64, patch_num=182, n_pre=35, n_post=14, coherent=0.45):
    """Synthetic LLaVA-Video-style 64-frame prompt.

    patch_num=182 matches LLaVA-Video-7B (27 patches/side -> 13x14 incl. the
    per-row newline column, reference modeling_llava_video.py:322-326).
    ``coherent`` is the fraction of adjacent-frame patch pairs resembling each
    other; perturbation scales vary so similarities spread over (0.6, 1.0)
    like real video rather than clustering. coherent=0.45 reproduces the
    reference's typical trajectory: a large first merge under budget, a small
    follow-up, then the cost-capped prune.
    """
    n_img = patch_num * n_frames
    s = n_pre + n_img + n_post
    patch_type = np.full(s, -1, dtype=np.int32)
    patch_type[n_pre : n_pre + n_img] = np.tile(np.arange(patch_num), n_frames)
    h = rng.standard_normal((s, hidden)).astype(np.float32) * 0.05
    for f in range(1, n_frames):
        cur = slice(n_pre + f * patch_num, n_pre + (f + 1) * patch_num)
        prev = slice(n_pre + (f - 1) * patch_num, n_pre + f * patch_num)
        mask = rng.random(patch_num) < coherent
        scale = rng.uniform(0.05, 0.5, size=(patch_num, 1)).astype(np.float32)
        blended = h[prev] + scale * rng.standard_normal((patch_num, hidden)).astype(np.float32) * 0.05
        h[cur] = np.where(mask[:, None], blended, h[cur])
    return h, patch_type, n_pre, n_img


def main():
    import jax
    import jax.numpy as jnp

    from framefusion_tpu.config import FrameFusionConfig, qwen2_7b_config
    from framefusion_tpu.models import qwen2
    from framefusion_tpu.runtime.engine import CompressionEngine

    backend = jax.default_backend()
    # Benchmark geometry: Qwen2-7B decoder with benchmark-reduced vocab
    # (prefill speed is vocab-independent; full 152k embeddings would not
    # leave activation headroom on one 16 GB v5e chip).
    if backend == "cpu":
        cfg = qwen2_7b_config(vocab_size=4096, num_layers=4, hidden_size=512,
                              intermediate_size=1024, num_heads=8, num_kv_heads=2)
        n_frames, reps = 8, 1
    else:
        cfg = qwen2_7b_config(vocab_size=32768)
        n_frames, reps = 64, 5

    ff = FrameFusionConfig(cost=0.3, similarity_lower_bound=0.6, ratio_lower_bound=0.1)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    h, patch_type, img_start, n_img = build_video_prompt(rng, cfg.hidden_size, n_frames=n_frames)
    pos = np.arange(len(patch_type), dtype=np.int32)
    attn_impl = "pallas" if backend == "tpu" else "chunked"
    engine = CompressionEngine(params, cfg, ff, attn_impl=attn_impl)
    # Upload the prompt once — host->device transfers are not part of the
    # LLM prefill being measured (the reference times model.generate on
    # already-resident tensors).
    h = jax.device_put(jnp.asarray(h, cfg.dtype))
    jax.block_until_ready(h)

    def force(x):
        return float(jnp.sum(x))  # device->host read: the only true barrier here

    def read_overhead():
        t0 = time.perf_counter()
        force(jnp.zeros((4,), jnp.float32))
        return time.perf_counter() - t0

    def run_dense():
        return engine.dense_prefill(h, pos)

    def run_ff():
        return engine.prefill(h, patch_type, pos, patch_num=182,
                              image_token_start=img_start, image_token_length=n_img)

    def timed(fn, reps, rounds=3):
        """Median of ``rounds`` chained-run measurements (robust to relay
        scheduling artifacts), read overhead subtracted."""
        out = fn()
        force(out.logits)  # warmup: compile + drain
        overhead = read_overhead()
        times = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn()
            force(out.logits)
            times.append(max((time.perf_counter() - t0 - overhead) / reps, 1e-9))
        times.sort()
        return times[len(times) // 2], out

    dense_t, dense_res = timed(run_dense, reps)
    ff_t, res = timed(run_ff, reps)

    # End-to-end: prefill + 32 greedy tokens (single on-device decode scan).
    def e2e(prefill_fn):
        r = prefill_fn()
        toks = engine.generate_greedy(r, max_new_tokens=32)
        return toks

    e2e(run_ff)  # compile decode programs
    e2e(run_dense)
    t0 = time.perf_counter(); e2e(run_ff); ff_e2e = time.perf_counter() - t0
    t0 = time.perf_counter(); e2e(run_dense); dense_e2e = time.perf_counter() - t0

    speedup = dense_t / ff_t
    record = {
        "metric": "llm_prefill_speedup_64frames",
        "value": round(speedup, 3),
        "unit": "x_vs_dense",
        "vs_baseline": round(speedup / 3.4, 3),
        "detail": {
            "backend": backend,
            "seq_len": len(patch_type),
            "dense_ms": round(dense_t * 1e3, 1),
            "framefusion_ms": round(ff_t * 1e3, 1),
            "prefill_tokens_per_s": round(len(patch_type) / ff_t, 1),
            "e2e_speedup_32tok": round(dense_e2e / ff_e2e, 3),
            "e2e_dense_ms": round(dense_e2e * 1e3, 1),
            "e2e_framefusion_ms": round(ff_e2e * 1e3, 1),
            "vision_token_reduction": round(res.telemetry.vision_token_reduction, 3),
            "final_tokens": res.valid_len,
            "tail_start_layer": res.telemetry.tail_start_layer,
            "events": [(e.layer, e.kind, e.tokens_removed) for e in res.telemetry.events],
        },
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
