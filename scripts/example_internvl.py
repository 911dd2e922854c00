"""InternVL2.5 A/B example — interleaved ``FrameN: <image>`` prompt with
FrameFusion (S_th default 0.5, reference example_internvl.py:125-130;
InternLM2-style backbone: no qkv bias)."""

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
    args = p.parse_args()

    import jax

    from framefusion_tpu.config import tiny_llm_config
    from framefusion_tpu.interface import FrameFusionModel, apply_framefusion
    from framefusion_tpu.models import qwen2
    from framefusion_tpu.models.adapters import internvl

    rng = np.random.default_rng(0)
    cfg = tiny_llm_config(num_layers=8, hidden_size=256, num_heads=8, num_kv_heads=4,
                          qkv_bias=False)  # InternLM2 has no qkv bias
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))

    # interleaved prompt: 5 text, then per frame: [3 text ("FrameN:")] + image block
    tpf = args.tokens_per_frame
    chunks, mask = [], []
    chunks.append(rng.standard_normal((5, cfg.hidden_size)) * 0.05)
    mask.extend([False] * 5)
    frame = rng.standard_normal((tpf, cfg.hidden_size)) * 0.05
    for f in range(args.num_frames):
        chunks.append(rng.standard_normal((3, cfg.hidden_size)) * 0.05)
        mask.extend([False] * 3)
        frame = frame + 0.01 * rng.standard_normal(frame.shape)
        chunks.append(frame.copy())
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
