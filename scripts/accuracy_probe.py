"""Discriminating quality probe: trained-model answer accuracy vs compression.

Random-init weights saturate greedy-agreement metrics (bench.py reports
top1_agreement 0.0 against a 0.094 noise floor — a one-ulp nudge destroys the
chain, so the number carries no information about compression damage). This
probe supplies the missing signal OFFLINE, standing in for the reference's
lmms-eval accuracy story (/root/reference/README.md:128-154, which needs
network + real checkpoints):

1. OVERFIT a tiny Qwen2 stack (parallel/train.py) on a structured video-QA
   task — per-frame color recall over redundant synthetic "video" — until
   dense greedy answers are perfect AND stable under a one-ulp input nudge
   (noise floor ~1.0, i.e. the metric is no longer chaotic).
2. Sweep FrameFusion aggressiveness (cost) and report answer accuracy + token
   reduction per point: a number that MOVES when compression is made more
   aggressive and doesn't when it isn't.

Task design (why it discriminates): each frame carries one COLOR token inside
otherwise frame-persistent filler; the query names a frame index and the
answer is that frame's color. Colors persist across adjacent frames with
p=0.6, so merging truly-redundant patches is harmless, but aggressive
schedules must merge/prune frames whose colors DIFFER, destroying exactly the
per-frame information the query needs — accuracy degrades with aggressiveness
instead of cliffing at the first perturbation.

Usage:
  python scripts/accuracy_probe.py --json ACCURACY_r04.json       # full run
  python scripts/accuracy_probe.py --steps 80 --eval 16           # smoke
"""

import argparse
import json

import common  # noqa: F401  (sys.path + compile cache)
import numpy as np

import jax
import jax.numpy as jnp

# Vocab layout
BOS = 0
COLOR_BASE, N_COLORS = 1, 8
FILLER_BASE, N_FILLER = 16, 16
QUERY_BASE = 40  # + frame index
VOCAB = 64

N_FRAMES = 8
PATCH_NUM = 5  # tokens per frame; color lives at in-frame slot 2
COLOR_SLOT = 2


def make_instance(rng):
    """One task instance: (token ids incl. answer, queried frame, answer id)."""
    fillers = rng.integers(FILLER_BASE, FILLER_BASE + N_FILLER, size=PATCH_NUM)
    colors = np.empty(N_FRAMES, np.int64)
    colors[0] = rng.integers(0, N_COLORS)
    for f in range(1, N_FRAMES):
        colors[f] = colors[f - 1] if rng.random() < 0.6 else rng.integers(0, N_COLORS)
    video = np.empty((N_FRAMES, PATCH_NUM), np.int64)
    for f in range(N_FRAMES):
        # filler persists across frames with occasional redraws -> high
        # adjacent-frame similarity, like real video
        redraw = rng.random(PATCH_NUM) < 0.1
        fillers = np.where(redraw, rng.integers(FILLER_BASE, FILLER_BASE + N_FILLER,
                                                size=PATCH_NUM), fillers)
        video[f] = fillers
        video[f, COLOR_SLOT] = COLOR_BASE + colors[f]
    q = int(rng.integers(0, N_FRAMES))
    ids = np.concatenate([[BOS], video.reshape(-1), [QUERY_BASE + q],
                          [COLOR_BASE + colors[q]]])
    return ids.astype(np.int32), q, int(COLOR_BASE + colors[q])


def make_batch(rng, batch):
    return np.stack([make_instance(rng)[0] for _ in range(batch)])


def train(cfg, steps, batch, lr, seed=0, log_every=200):
    from jax.sharding import Mesh

    from framefusion_tpu.models import qwen2
    from framefusion_tpu.parallel.train import make_optimizer, make_train_step

    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("data", "tensor"))
    params = qwen2.init_params(cfg, jax.random.PRNGKey(seed))
    train_step, init, _ = make_train_step(cfg, mesh, make_optimizer(lr))
    with mesh:
        params, opt_state = init(params)
        rng = np.random.default_rng(seed)
        loss = float("nan")
        for step in range(steps):
            ids = jnp.asarray(make_batch(rng, batch))
            params, opt_state, loss = train_step(params, opt_state, ids)
            if log_every and (step + 1) % log_every == 0:
                print(f"  step {step+1}/{steps} loss {float(loss):.4f}")
    return params, float(loss)


def build_prompt(ids_with_answer):
    """Engine inputs for one instance (prompt excludes the answer token)."""
    prompt = ids_with_answer[:-1]
    patch_type = np.full(len(prompt), -1, np.int32)
    patch_type[1 : 1 + N_FRAMES * PATCH_NUM] = np.tile(np.arange(PATCH_NUM), N_FRAMES)
    pos = np.arange(len(prompt), dtype=np.int32)
    return prompt, patch_type, pos


def evaluate(engine, params, cfg, instances, compressed, nudge=False):
    """Answer accuracy of the first greedy token; optionally on a one-ulp
    nudged input (the stability/noise-floor measurement)."""
    from framefusion_tpu.models import qwen2

    hits, reductions = 0, []
    for ids, _, answer in instances:
        prompt, patch_type, pos = build_prompt(ids)
        h = qwen2.embed(params, jnp.asarray(prompt), cfg)
        if nudge:
            h = h * jnp.asarray(1.0 + 2.0 ** -7, h.dtype)
        if compressed:
            res = engine.prefill(h, patch_type, pos, patch_num=PATCH_NUM,
                                 image_token_start=1,
                                 image_token_length=N_FRAMES * PATCH_NUM)
            reductions.append(engine_reduction(res))
        else:
            res = engine.dense_prefill(h, pos)
        tok = engine.generate_greedy(res, 1)[0]
        hits += int(tok == answer)
    acc = hits / len(instances)
    return acc, (float(np.mean(reductions)) if reductions else 0.0)


def engine_reduction(res):
    return float(res.telemetry.vision_token_reduction)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--eval", type=int, default=200)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    from framefusion_tpu.config import FrameFusionConfig, tiny_llm_config
    from framefusion_tpu.runtime.engine import CompressionEngine

    cfg = tiny_llm_config(vocab_size=VOCAB)
    print(f"training {cfg.num_layers}L/d{cfg.hidden_size} on frame-color recall "
          f"({args.steps} steps x {args.batch}) ...")
    params, loss = train(cfg, args.steps, args.batch, args.lr)
    print(f"final loss {loss:.4f}")

    rng = np.random.default_rng(1234)  # eval instances disjoint from training stream
    instances = [make_instance(rng) for _ in range(args.eval)]

    dense_engine = CompressionEngine(
        params, cfg, FrameFusionConfig(), attn_impl="einsum")
    dense_acc, _ = evaluate(dense_engine, params, cfg, instances, compressed=False)
    stable_acc, _ = evaluate(dense_engine, params, cfg, instances, compressed=False,
                             nudge=True)
    print(f"dense answer accuracy {dense_acc:.3f}; one-ulp-nudged {stable_acc:.3f} "
          f"(both ~1.0 = metric is no longer chaotic)")

    from framefusion_tpu.core.schedule import CostInfeasibleError

    sweep = []
    for cost in (0.9, 0.7, 0.5, 0.3, 0.2):
        ff = FrameFusionConfig(cost=cost, similarity_lower_bound=0.6,
                               ratio_lower_bound=0.05,
                               schedule_num_layers=cfg.num_layers)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        try:
            acc, red = evaluate(engine, params, cfg, instances, compressed=True)
        except CostInfeasibleError:
            # reference raises the same way when the budget can't be met
            # (main.py:321-343 schedule twins); record and stop the sweep
            sweep.append({"cost": cost, "infeasible": True})
            print(f"  cost={cost:>4}: infeasible for a {cfg.num_layers}-layer schedule")
            break
        sweep.append({"cost": cost, "accuracy": round(acc, 3),
                      "token_reduction": round(red, 3)})
        print(f"  cost={cost:>4}: accuracy {acc:.3f} @ {red:.1%} vision-token reduction")

    record = {
        "task": "per-frame color recall over redundant synthetic video "
                "(8 frames x 5 tokens, colors persist p=0.6)",
        "model": f"qwen2-tiny {cfg.num_layers}L d{cfg.hidden_size} vocab {VOCAB}",
        "train_steps": args.steps, "final_loss": round(loss, 4),
        "eval_instances": args.eval,
        "dense_accuracy": round(dense_acc, 3),
        "dense_accuracy_one_ulp_nudge": round(stable_acc, 3),
        "sweep": sweep,
    }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {args.json}")
    return record


if __name__ == "__main__":
    main()
