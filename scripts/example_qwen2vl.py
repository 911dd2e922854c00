"""Qwen2-VL A/B example — mRoPE stack with FrameFusion (S_th default 0.5,
reference script/playground/example_qwen2vl.py:49-54; importance from the
last 4 query rows).

Two frontends:
  * default — raw pixel frames through the in-repo Qwen2-VL ViT
    (models/vision/qwen2_vl_vit; the reference calls ``self.visual``,
    qwenvl/modeling_qwen2_vl.py:95-111): pixels -> patches -> tower ->
    merged embedding rows -> compressed prefill.
  * ``--precomputed-features`` — synthetic visual embeddings (skips the
    tower; the round-2 behavior).
"""

import argparse

import numpy as np

from common import DeviceTimer, ab_table, synthetic_video


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-frames", type=int, default=16)
    p.add_argument("--cost", type=float, default=0.3)
    p.add_argument("--similarity-lower-bound", type=float, default=0.5)
    p.add_argument("--ratio-lower-bound", type=float, default=0.1)
    p.add_argument("--precomputed-features", action="store_true",
                   help="skip the ViT; use synthetic visual embeddings")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="hub-layout dir (config.json + safetensors; loads the "
                        "visual.* tower too)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from framefusion_tpu.config import tiny_llm_config
    from framefusion_tpu.interface import FrameFusionModel, apply_framefusion
    from framefusion_tpu.models import qwen2
    from framefusion_tpu.models.adapters import qwen2_vl

    rng = np.random.default_rng(0)
    loaded = None
    if args.checkpoint:
        from framefusion_tpu.weights import load_checkpoint

        loaded = load_checkpoint(args.checkpoint, family="qwen2_vl")
        cfg, params = loaded.cfg, loaded.params
    else:
        # Qwen2-VL tiny geometry with mRoPE sections (t,h,w) summing to head_dim/2.
        cfg = tiny_llm_config(num_layers=8, hidden_size=256, num_heads=8, num_kv_heads=4,
                              mrope_section=(4, 6, 6))
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))

    if args.precomputed_features:
        grid_t, grid_h, grid_w = args.num_frames, 8, 8
        patch_num = (grid_h * grid_w) // 4
        # temporally coherent visual embeddings
        video = np.empty((grid_t * patch_num, cfg.hidden_size), np.float32)
        frame = rng.standard_normal((patch_num, cfg.hidden_size)).astype(np.float32) * 0.05
        for t in range(grid_t):
            frame = frame + 0.01 * rng.standard_normal(frame.shape).astype(np.float32)
            video[t * patch_num : (t + 1) * patch_num] = frame
    else:
        from framefusion_tpu.models.vision.qwen2_vl_vit import (
            Qwen2VLViTConfig, encode_video, init_params as init_vit, pixels_to_patches,
        )

        if loaded is not None and loaded.vision:
            vit_cfg = loaded.vision["cfg"]
            vit_params = loaded.vision["params"]
        else:
            vit_cfg = Qwen2VLViTConfig(embed_dim=128, depth=4, num_heads=4, patch_size=14,
                                       mlp_ratio=2.0, hidden_size=cfg.hidden_size)
            vit_params = init_vit(vit_cfg, jax.random.PRNGKey(7))
        side = vit_cfg.patch_size * vit_cfg.spatial_merge_size * 4
        # temporally coherent pixel frames: 2 raw frames per temporal patch
        base = rng.standard_normal((1, side, side, 3)).astype(np.float32)
        frames = np.concatenate([
            base + 0.05 * rng.standard_normal(base.shape).astype(np.float32)
            for _ in range(2 * args.num_frames)
        ])
        patches, (grid_t, grid_h, grid_w) = pixels_to_patches(frames, vit_cfg)
        video = np.asarray(encode_video(
            vit_params, jnp.asarray(patches), grid_t, grid_h, grid_w, vit_cfg
        )) * 0.05
        print(f"ViT: {frames.shape[0]} frames -> grid ({grid_t},{grid_h},{grid_w}) "
              f"-> {video.shape[0]} embedding rows")
    text = rng.standard_normal((30, cfg.hidden_size)).astype(np.float32) * 0.05

    inputs = qwen2_vl.build_prefill_inputs(text, video, 25, grid_t, grid_h, grid_w)
    print(f"prompt: {inputs.input_embeds.shape[0]} tokens, 3D mRoPE positions, "
          f"importance rows: {inputs.num_importance_queries}")

    model = FrameFusionModel(family="qwen2_vl", cfg=cfg, params=params)
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
