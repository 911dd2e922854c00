"""LLaVA-Video A/B example — dense vs FrameFusion on one TPU chip.

Counterpart of /root/reference/script/playground/example_llava.py (same
defaults: cost=0.3, similarity_lower_bound=0.6, ratio_lower_bound=0.1,
64 frames; same structure: run the identical prompt dense and compressed,
print a side-by-side table).

Usage:
    python scripts/example_llava.py                       # synthetic, tiny-but-real
    python scripts/example_llava.py --full-size           # Qwen2-7B geometry
    python scripts/example_llava.py --checkpoint DIR --video clip.mp4
"""

import argparse

import numpy as np

from common import DeviceTimer, ab_table, load_video_frames, synthetic_video


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, default=None, help="safetensors dir (LLaVA-Video-7B-Qwen2)")
    p.add_argument("--video", type=str, default=None)
    p.add_argument("--num-frames", type=int, default=64)
    p.add_argument("--cost", type=float, default=0.3)
    p.add_argument("--similarity-lower-bound", type=float, default=0.6)
    p.add_argument("--ratio-lower-bound", type=float, default=0.1)
    p.add_argument("--max-new-tokens", type=int, default=16)
    p.add_argument("--full-size", action="store_true", help="Qwen2-7B geometry with random weights")
    p.add_argument("--int8", action="store_true",
                   help="int8 weight-only decoder (quantize-on-load for --checkpoint: "
                        "a real 7B bf16 checkpoint is ~13.4 GB and must never fully "
                        "materialize on a 16 GB chip)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from framefusion_tpu.config import qwen2_7b_config, tiny_llm_config
    from framefusion_tpu.interface import FrameFusionModel, apply_framefusion
    from framefusion_tpu.models import qwen2
    from framefusion_tpu.models.adapters import llava_video
    from framefusion_tpu.models.vision import siglip
    from framefusion_tpu.models.vision.llava_frontend import encode_video, init_projector

    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"

    loaded = None
    if args.checkpoint:
        # config.json-driven geometry + LLM + (when present) the siglip
        # tower and mm_projector from the same hub-layout directory.
        from framefusion_tpu.weights import load_checkpoint

        loaded = load_checkpoint(args.checkpoint, family="llava_video",
                                 quantize="int8" if args.int8 else None)
        cfg, params = loaded.cfg, loaded.params
        vit_cfg = loaded.vision["cfg"] if loaded.vision else siglip.ViTConfig()
    elif args.full_size:
        cfg = qwen2_7b_config(vocab_size=32768)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
        if args.int8:
            from framefusion_tpu.ops.quant import quantize_params_int8

            params = quantize_params_int8(params)
        vit_cfg = siglip.ViTConfig(num_layers=4)  # random tower; keep encode fast
    else:
        cfg = tiny_llm_config(num_layers=8, hidden_size=256, intermediate_size=512, num_heads=8)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
        vit_cfg = siglip.tiny_vit_config(image_size=56, patch_size=7)  # 8 patches/side

    if loaded is not None and loaded.vision:
        vit = loaded.vision["params"]
        proj = loaded.vision["projector"] or init_projector(
            jax.random.PRNGKey(2), vit_cfg.hidden_size, cfg.hidden_size, cfg.dtype
        )
    else:
        vit = siglip.init_params(vit_cfg, jax.random.PRNGKey(1))
        proj = init_projector(jax.random.PRNGKey(2), vit_cfg.hidden_size, cfg.hidden_size, cfg.dtype)

    if args.video:
        frames = load_video_frames(args.video, args.num_frames, vit_cfg.image_size)
    else:
        frames = synthetic_video(rng, args.num_frames, vit_cfg.image_size)

    print(f"encoding {len(frames)} frames @ {vit_cfg.image_size}px ...")
    video_tokens = encode_video(vit, vit_cfg, proj, jnp.asarray(frames))
    video_tokens = np.asarray(video_tokens, np.float32) * (0.05 if not args.checkpoint else 1.0)
    text = rng.standard_normal((40, cfg.hidden_size)).astype(np.float32) * 0.05

    inputs = llava_video.build_prefill_inputs(
        text, video_tokens, image_token_pos=35,
        num_patches_per_side=vit_cfg.patches_per_side,
    )
    # Pin the prompt on device once — per-run host->device uploads are not
    # part of the LLM timing being A/B'd (the reference times model.generate
    # over resident tensors).
    inputs.input_embeds = jax.device_put(jnp.asarray(inputs.input_embeds, cfg.dtype))
    jax.block_until_ready(inputs.input_embeds)
    print(f"prompt: {inputs.input_embeds.shape[0]} tokens "
          f"({inputs.image_token_length} video, patch_num={inputs.patch_num})")

    model = FrameFusionModel(family="llava_video", cfg=cfg, params=params)
    ff_model = apply_framefusion(model, args.cost, args.similarity_lower_bound, args.ratio_lower_bound)

    dense_t, dense_res = DeviceTimer.timeit(lambda: model.prefill(inputs), lambda r: r.logits)
    ff_t, ff_res = DeviceTimer.timeit(lambda: ff_model.prefill(inputs), lambda r: r.logits)
    dense_tokens = model.engine().generate_greedy(dense_res, args.max_new_tokens)
    ff_tokens = ff_model.engine().generate_greedy(ff_res, args.max_new_tokens)

    t = ff_res.telemetry
    print(ab_table([
        {"method": "dense", "prefill_ms": round(dense_t * 1e3, 1), "tokens_kept": dense_res.valid_len,
         "first_tokens": dense_tokens[:8]},
        {"method": "framefusion", "prefill_ms": round(ff_t * 1e3, 1), "tokens_kept": ff_res.valid_len,
         "first_tokens": ff_tokens[:8]},
    ]))
    print(f"\nspeedup: {dense_t / ff_t:.2f}x | vision-token reduction: "
          f"{t.vision_token_reduction:.1%} | events: "
          f"{[(e.layer, e.kind, e.tokens_removed) for e in t.events]}")


if __name__ == "__main__":
    main()
