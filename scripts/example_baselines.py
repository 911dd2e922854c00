"""Baseline-methods comparison — FrameFusion vs FastV / StreamingLLM /
fixed-schedule merging / hybrids on the same prompt.

Counterpart of the reference's baseline entry points
(reference models/qwen2/modeling_qwen2_baseline.py:45-109)."""

import argparse

import numpy as np

from common import DeviceTimer, ab_table


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-frames", type=int, default=16)
    p.add_argument("--full", action="store_true",
                   help="Qwen2-7B geometry at 64 frames (TPU; ~14 GB of weights). "
                        "Reproduces the paper's method-comparison table at full "
                        "scale — every method, incl. the merging family that "
                        "previously only ran at test geometry.")
    args = p.parse_args()

    import jax

    from framefusion_tpu.baselines import replace_forward
    from framefusion_tpu.config import qwen2_7b_config, tiny_llm_config
    from framefusion_tpu.interface import FrameFusionModel, apply_framefusion
    from framefusion_tpu.models import qwen2
    from framefusion_tpu.models.adapters import llava_video

    rng = np.random.default_rng(0)
    if args.full:
        cfg = qwen2_7b_config(vocab_size=8192)  # bench-reduced vocab; see bench.py
        args.num_frames = 64
        patch_num, n_pre, hidden_scale = 182, 35, 0.05
    else:
        cfg = tiny_llm_config(num_layers=8, hidden_size=256, num_heads=8, num_kv_heads=4)
        patch_num, n_pre = 20, 25
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))

    if args.full:
        import bench as benchmod  # repo root on sys.path via common

        h_np, patch_type, img_start, n_img = benchmod.build_video_prompt(
            rng, cfg.hidden_size, n_frames=64, patch_num=patch_num)
        from framefusion_tpu.models.adapters.common import PrefillInputs

        import jax.numpy as jnp

        # Upload once — re-transferring ~170 MB of embeddings per timed call
        # through the relay would dominate every row equally (~4 s).
        inputs = PrefillInputs(
            input_embeds=jax.device_put(jnp.asarray(h_np, cfg.dtype)),
            patch_type=patch_type,
            position_ids=np.arange(len(patch_type), dtype=np.int32),
            patch_num=patch_num, image_token_start=img_start, image_token_length=n_img,
        )
    else:
        video = np.empty((args.num_frames * patch_num, cfg.hidden_size), np.float32)
        frame = rng.standard_normal((patch_num, cfg.hidden_size)) * 0.05
        for f in range(args.num_frames):
            frame = frame + 0.01 * rng.standard_normal(frame.shape)
            video[f * patch_num : (f + 1) * patch_num] = frame
        text = (rng.standard_normal((30, cfg.hidden_size)) * 0.05).astype(np.float32)
        inputs = llava_video.build_prefill_inputs(text, video, 25, num_patches_per_side=9)

    model = FrameFusionModel(family="llava_video", cfg=cfg, params=params)
    n_l = cfg.num_layers
    variants = {
        "dense": model,
        "framefusion": apply_framefusion(model, 0.3, 0.6, 0.1),
        "fastv": replace_forward(model, "fastv", fastv_k=3, fastv_r=0.5),
        "streamingllm": replace_forward(model, "streamingllm", init_num=8, length_rate=0.3),
        "prefill_merge": replace_forward(model, "prefill_merge", sparsity=[0.1] * n_l),
        "merge_then_fastv": replace_forward(model, "merge_then_fastv", sparsity=[0.1] * n_l, fastv_k=3, fastv_r=0.5),
        "fastv_then_merge": replace_forward(model, "fastv_then_merge", fastv_k=2, fastv_r=0.75, merging_sparsity=0.3),
    }
    if variants["framefusion"].ff:
        variants["framefusion"].ff = variants["framefusion"].ff.replace(schedule_num_layers=n_l)

    import gc

    import dataclasses as _dc

    import jax.numpy as _jnp

    rows = []
    for name, m in variants.items():
        # Slope-timed (latency-artifact-free, DEVNOTES): chained inputs get a
        # bf16-visible scale — normalized away at the first RMSNorm, and every
        # baseline's removal schedule is static-shape, so timing is unaffected.
        def run(scale, eps, m=m):
            emb = inputs.input_embeds * _jnp.float32(scale) + eps
            return m.prefill(_dc.replace(inputs, input_embeds=emb))

        t, res = DeviceTimer.timeit_slope(run, lambda r: r.logits)
        rows.append({"method": name, "prefill_ms": round(t * 1e3, 1),
                     "tokens_kept": res.valid_len,
                     "reduction": f"{1 - res.valid_len / inputs.input_embeds.shape[0]:.1%}"})
        print(ab_table(rows[-1:]))
        del res
        m._engine = None  # free the method's programs/pools before the next
        gc.collect()
    print()
    print(ab_table(rows))


if __name__ == "__main__":
    main()
