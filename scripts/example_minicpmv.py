"""MiniCPM-V 2.6 A/B example (S_th default 0.7, reference
example_minicpmv.py:31-37; image-bound-derived frame geometry with the +2
separator slots)."""

import argparse

import numpy as np

from common import DeviceTimer, ab_table


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-frames", type=int, default=16)
    p.add_argument("--slice-tokens", type=int, default=12)
    p.add_argument("--cost", type=float, default=0.3)
    p.add_argument("--similarity-lower-bound", type=float, default=0.7)
    p.add_argument("--ratio-lower-bound", type=float, default=0.1)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="hub-layout dir (config.json + safetensors)")
    args = p.parse_args()

    import jax

    from framefusion_tpu.config import tiny_llm_config
    from framefusion_tpu.interface import FrameFusionModel, apply_framefusion
    from framefusion_tpu.models import qwen2
    from framefusion_tpu.models.adapters import minicpmv

    rng = np.random.default_rng(0)
    if args.checkpoint:
        from framefusion_tpu.weights import load_checkpoint

        loaded = load_checkpoint(args.checkpoint, family="minicpmv")
        cfg, params = loaded.cfg, loaded.params
    else:
        cfg = tiny_llm_config(num_layers=8, hidden_size=256, num_heads=8, num_kv_heads=4)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))

    # Layout: 6 text, then per frame [slice_tokens image + 2 separators]
    st = args.slice_tokens
    tpf = st + 2
    total = 6 + args.num_frames * tpf + 8
    embeds = (rng.standard_normal((total, cfg.hidden_size)) * 0.05).astype(np.float32)
    bounds = []
    frame = rng.standard_normal((st, cfg.hidden_size)) * 0.05
    for f in range(args.num_frames):
        lo = 6 + f * tpf
        frame = frame + 0.01 * rng.standard_normal(frame.shape)
        embeds[lo : lo + st] = frame
        bounds.append([lo, lo + st])

    inputs = minicpmv.build_prefill_inputs(embeds, np.asarray(bounds), args.num_frames)
    print(f"prompt: {total} tokens, token_per_frame={inputs.patch_num} "
          f"(incl. separator slots, reference modeling_minicpmv.py:96-98)")

    model = FrameFusionModel(family="minicpmv", cfg=cfg, params=params)
    ff_model = apply_framefusion(model, args.cost, args.similarity_lower_bound, args.ratio_lower_bound)
    ff_model.ff = ff_model.ff.replace(schedule_num_layers=cfg.num_layers)

    dense_t, dense_res = DeviceTimer.timeit(lambda: model.prefill(inputs), lambda r: r.logits)
    ff_t, ff_res = DeviceTimer.timeit(lambda: ff_model.prefill(inputs), lambda r: r.logits)
    t = ff_res.telemetry
    print(ab_table([
        {"method": "dense", "prefill_ms": round(dense_t * 1e3, 1), "tokens_kept": dense_res.valid_len},
        {"method": "framefusion", "prefill_ms": round(ff_t * 1e3, 1), "tokens_kept": ff_res.valid_len},
    ]))
    print(f"\nspeedup: {dense_t / ff_t:.2f}x | reduction: {t.vision_token_reduction:.1%}")


if __name__ == "__main__":
    main()
