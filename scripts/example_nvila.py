"""NVILA A/B example (S_th default 0.7, reference example_nvila.py:22-27;
video with temporal pooling, plus the multi-image patch_num=1 mode)."""

import argparse

import numpy as np

from common import DeviceTimer, ab_table


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-frames", type=int, default=16)
    p.add_argument("--mode", choices=["video", "images"], default="video")
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
    from framefusion_tpu.models.adapters import nvila

    rng = np.random.default_rng(0)
    if args.checkpoint:
        from framefusion_tpu.weights import load_checkpoint

        loaded = load_checkpoint(args.checkpoint, family="nvila")
        cfg, params = loaded.cfg, loaded.params
    else:
        cfg = tiny_llm_config(num_layers=8, hidden_size=256, num_heads=8, num_kv_heads=4)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    text = (rng.standard_normal((20, cfg.hidden_size)) * 0.05).astype(np.float32)

    if args.mode == "video":
        patch_num = 16
        media = np.empty((args.num_frames * patch_num, cfg.hidden_size), np.float32)
        frame = rng.standard_normal((patch_num, cfg.hidden_size)) * 0.05
        for f in range(args.num_frames):
            frame = frame + 0.01 * rng.standard_normal(frame.shape)
            media[f * patch_num : (f + 1) * patch_num] = frame
        inputs = nvila.build_prefill_inputs_video(text, media, 15, args.num_frames)
    else:
        base = rng.standard_normal((8, cfg.hidden_size)) * 0.05
        imgs = [(base + 0.01 * rng.standard_normal(base.shape)).astype(np.float32) for _ in range(6)]
        inputs = nvila.build_prefill_inputs_multi_image(text, imgs, 15)
    print(f"mode={args.mode}: {inputs.input_embeds.shape[0]} tokens, patch_num={inputs.patch_num}")

    model = FrameFusionModel(family="nvila", cfg=cfg, params=params)
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
