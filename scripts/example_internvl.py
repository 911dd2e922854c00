"""InternVL2.5 A/B example — interleaved ``FrameN: <image>`` prompt with
FrameFusion (S_th default 0.5, reference example_internvl.py:125-130;
InternLM2-style backbone: no qkv bias).

Default frontend runs raw pixel frames through the in-repo InternViT +
pixel-shuffle projector (models/vision/internvl_vit; the reference's
``extract_feature``, modeling_internvl_chat.py:19-33);
``--precomputed-features`` uses synthetic per-frame embeddings instead."""

import argparse

import numpy as np

from common import DeviceTimer, ab_table


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-frames", type=int, default=16)
    p.add_argument("--tokens-per-frame", type=int, default=16)
    p.add_argument("--cost", type=float, default=0.3)
    p.add_argument("--similarity-lower-bound", type=float, default=0.5)
    p.add_argument("--ratio-lower-bound", type=float, default=0.1)
    p.add_argument("--precomputed-features", action="store_true",
                   help="skip the ViT; use synthetic per-frame embeddings")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="hub-layout dir (InternLM2 fused wqkv + vision_model.* "
                        "remote-layout tower + mlp1 projector)")
    args = p.parse_args()

    import jax

    from framefusion_tpu.config import tiny_llm_config
    from framefusion_tpu.interface import FrameFusionModel, apply_framefusion
    from framefusion_tpu.models import qwen2
    from framefusion_tpu.models.adapters import internvl

    rng = np.random.default_rng(0)
    loaded = None
    if args.checkpoint:
        from framefusion_tpu.weights import load_checkpoint

        loaded = load_checkpoint(args.checkpoint, family="internvl")
        cfg, params = loaded.cfg, loaded.params
    else:
        cfg = tiny_llm_config(num_layers=8, hidden_size=256, num_heads=8, num_kv_heads=4,
                              qkv_bias=False)  # InternLM2 has no qkv bias
        params = qwen2.init_params(cfg, jax.random.PRNGKey(0))

    tpf = args.tokens_per_frame
    if not args.precomputed_features:
        import jax.numpy as jnp

        from framefusion_tpu.models.vision.internvl_vit import (
            InternViTConfig, extract_features, init_params as init_vit,
            init_projector,
        )

        if loaded is not None and loaded.vision:
            vit_cfg = loaded.vision["cfg"]
            vit_params = loaded.vision["params"]
            proj = loaded.vision["projector"]
        else:
            # 8x8 patch grid -> pixel-shuffled to 4x4 = 16 tokens/frame
            vit_cfg = InternViTConfig(image_size=112, patch_size=14, hidden_size=128,
                                      intermediate_size=256, num_layers=4, num_heads=4,
                                      text_hidden_size=cfg.hidden_size)
            vit_params = init_vit(vit_cfg, jax.random.PRNGKey(5))
            proj = init_projector(vit_cfg, jax.random.PRNGKey(6))
        img = vit_cfg.image_size
        base = rng.standard_normal((1, img, img, 3)).astype(np.float32)
        pix = np.concatenate([base + 0.03 * rng.standard_normal(base.shape).astype(np.float32)
                              for _ in range(args.num_frames)])
        feats = np.asarray(extract_features(vit_params, proj, jnp.asarray(pix), vit_cfg)) * 0.05
        tpf = feats.shape[1]
        print(f"InternViT: {args.num_frames} frames -> {tpf} tokens/frame after pixel shuffle")

    # interleaved prompt: 5 text, then per frame: [3 text ("FrameN:")] + image block
    chunks, mask = [], []
    chunks.append(rng.standard_normal((5, cfg.hidden_size)) * 0.05)
    mask.extend([False] * 5)
    frame = rng.standard_normal((tpf, cfg.hidden_size)) * 0.05
    for f in range(args.num_frames):
        chunks.append(rng.standard_normal((3, cfg.hidden_size)) * 0.05)
        mask.extend([False] * 3)
        if args.precomputed_features:
            frame = frame + 0.01 * rng.standard_normal(frame.shape)
            chunks.append(frame.copy())
        else:
            chunks.append(feats[f])
        mask.extend([True] * tpf)
    chunks.append(rng.standard_normal((6, cfg.hidden_size)) * 0.05)
    mask.extend([False] * 6)
    embeds = np.concatenate(chunks).astype(np.float32)

    inputs = internvl.build_prefill_inputs(embeds, np.asarray(mask), tpf)
    print(f"prompt: {embeds.shape[0]} tokens, interleaved across {args.num_frames} frames "
          f"(prune window spans interleaved text — reference quirk preserved)")

    model = FrameFusionModel(family="internvl", cfg=cfg, params=params)
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
