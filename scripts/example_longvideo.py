"""128-frame long-video A/B at FULL Qwen2-7B on one chip (int8 weights).

The reference's demo supports up to 128 frames
(/root/reference/script/demo/llava_video_compare.py:366-371); at S~23k the
bf16 7B weights (~13.4 GB) leave no room for activations on a 16 GB chip, so
this config runs weight-only int8 (ops/quant.py, near-lossless) — the
supported single-chip long-video deployment. Alternative: TP2 with bf16
weights (framefusion_tpu.parallel), validated on the virtual mesh in
tests/test_parallel.py.

Usage: python scripts/example_longvideo.py [--num-frames 128]
"""

import argparse
import gc
import sys

import numpy as np

from common import DeviceTimer, ab_table  # also puts the repo root on sys.path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-frames", type=int, default=128)
    p.add_argument("--bf16", action="store_true", help="skip int8 (needs TP or a small model)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as benchmod
    from framefusion_tpu.config import FrameFusionConfig, qwen2_7b_config
    from framefusion_tpu.models import qwen2
    from framefusion_tpu.ops.quant import quantize_params_int8
    from framefusion_tpu.runtime.engine import CompressionEngine

    backend = jax.default_backend()
    if backend == "cpu":
        cfg = qwen2_7b_config(vocab_size=4096, num_layers=4, hidden_size=512,
                              intermediate_size=1024, num_heads=8, num_kv_heads=2)
        args.num_frames = min(args.num_frames, 16)
    else:
        cfg = qwen2_7b_config(vocab_size=8192)

    ff = FrameFusionConfig(cost=0.3, similarity_lower_bound=0.6, ratio_lower_bound=0.1)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    if not args.bf16:
        params = quantize_params_int8(params)
        gc.collect()

    rng = np.random.default_rng(0)
    h, patch_type, img_start, n_img = benchmod.build_video_prompt(
        rng, cfg.hidden_size, n_frames=args.num_frames)
    pos = np.arange(len(patch_type), dtype=np.int32)
    attn_impl = "pallas" if backend == "tpu" else "chunked"
    engine = CompressionEngine(params, cfg, ff, attn_impl=attn_impl)
    h = jax.device_put(jnp.asarray(h, cfg.dtype))

    rows = []

    import functools

    @functools.partial(jax.jit, static_argnames=("cfg", "attn_impl"))
    def dense_logits(params, embeds, pos_t, *, cfg, attn_impl):
        lg, _, _ = qwen2.dense_prefill(params, embeds, pos_t, cfg,
                                       attn_impl=attn_impl, want_caches=False)
        return lg

    pos_dev = jnp.asarray(pos)
    t_dense, _ = DeviceTimer.timeit(
        lambda: dense_logits(params, h, pos_dev, cfg=cfg, attn_impl=attn_impl), lambda x: x)
    rows.append({"method": "dense", "prefill_ms": round(t_dense * 1e3, 1),
                 "tokens": len(pos), "reduction": "0.0%"})
    print(ab_table(rows[-1:]))
    gc.collect()

    t_ff, res = DeviceTimer.timeit(
        lambda: engine.prefill(h, patch_type, pos, 182, img_start, n_img),
        lambda r: r.logits)
    rows.append({"method": "framefusion", "prefill_ms": round(t_ff * 1e3, 1),
                 "tokens": res.valid_len,
                 "reduction": f"{1 - res.valid_len / len(pos):.1%}"})
    print(ab_table(rows[-1:]))
    print()
    print(ab_table(rows))
    print(f"speedup: {t_dense / t_ff:.2f}x  frames={args.num_frames}  seq={len(pos)}  "
          f"weights={'bf16' if args.bf16 else 'int8'}  "
          f"events={[(e.layer, e.kind, e.tokens_removed) for e in res.telemetry.events]}")


if __name__ == "__main__":
    main()
