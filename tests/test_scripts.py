"""Smoke tests for the measurement-artifact scripts (CPU-tiny).

These drive the CLIs the round artifacts come from — example_serving.py
(SERVING_rNN.json: continuous-batching throughput vs the reference's bsz==1
serial contract, main.py:203) and accuracy_probe.py (ACCURACY_rNN.json: the
trained-model compression-vs-accuracy sweep standing in for the reference's
lmms-eval story, README.md:128-154)."""

import json
import os
import subprocess
import sys

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")
ENV = {**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""}


def run(args, timeout=600):
    out = subprocess.run([sys.executable, *args], cwd=SCRIPTS, env=ENV,
                         capture_output=True, text=True, timeout=timeout)
    assert out.returncode == 0, f"{args} failed:\n{out.stdout}\n{out.stderr}"
    return out.stdout


def test_example_serving_artifact(tmp_path):
    path = tmp_path / "serving.json"
    out = run(["example_serving.py", "--tiny", "--requests", "3", "--slots", "2",
               "--new-tokens", "8", "--fixed-budget", "--sequential-baseline",
               "--json", str(path)])
    assert "batching speedup" in out
    rec = json.loads(path.read_text())
    assert rec["requests"] == 3 and rec["total_tokens"] == 24
    for key in ("serving_tokens_per_s", "sequential_tokens_per_s",
                "batching_speedup", "queue_ms_p50", "serve_ms_p50",
                "parity_prefix"):
        assert key in rec, key
    assert rec["parity_prefix"] >= 1


def test_load_video_frames_from_directory(tmp_path):
    """Real pixels with no video decoder: a directory of image files is a
    first-class --video argument (the reference ships an .mp4 and uses
    decord, example_llava.py:69-86; offline runners have PIL only)."""
    import numpy as np
    import PIL.Image as Image

    sys.path.insert(0, SCRIPTS)
    try:
        from common import load_video_frames
    finally:
        sys.path.remove(SCRIPTS)

    rng = np.random.default_rng(0)
    for i in range(6):
        arr = rng.integers(0, 255, size=(20, 24, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"frame_{i:03d}.png")
    frames = load_video_frames(str(tmp_path), num_frames=4, size=16)
    assert frames.shape == (4, 16, 16, 3)
    assert frames.min() >= -1.0 and frames.max() <= 1.0
    # uniform sampling keeps name order: first sampled frame is frame_000
    first_direct = np.asarray(
        Image.open(tmp_path / "frame_000.png").resize((16, 16)), np.float32
    ) / 127.5 - 1.0
    np.testing.assert_allclose(frames[0], first_direct, atol=1e-6)


def test_spec_probe_smoke(tmp_path):
    """spec_probe.py (SPEC_rNN.json): speculative decode on a TRAINED echo
    task — greedy parity must hold and acceptance must beat chance even at
    smoke training scale."""
    path = tmp_path / "spec.json"
    run(["spec_probe.py", "--steps", "60", "--batch", "16", "--eval", "4",
         "--json", str(path)], timeout=900)
    rec = json.loads(path.read_text())
    for name in ("dense_solo", "dense_batched", "framefusion_solo",
                 "framefusion_batched"):
        r = rec[name]
        assert r["greedy_match"] is True, name
        assert 0.0 <= r["acceptance"] <= 1.0
        assert r["tokens_per_weight_pass"] >= 1.0
        assert r["spec_decode_wall_ms"] > 0 and r["wall_speedup"] > 0  # r5
    for name in ("dense_serving", "framefusion_serving"):  # r5 serving rows
        r = rec[name]
        assert r["plain_chunks"] >= r["spec_chunks"] >= 1
        a, b = r["agreement"].split("/")
        assert int(a) == int(b)  # speculative serving tokens == plain


def test_accuracy_probe_artifact(tmp_path):
    path = tmp_path / "acc.json"
    run(["accuracy_probe.py", "--steps", "60", "--batch", "16", "--eval", "8",
         "--json", str(path)], timeout=900)
    rec = json.loads(path.read_text())
    assert rec["train_steps"] == 60 and rec["eval_instances"] == 8
    assert 0.0 <= rec["dense_accuracy"] <= 1.0
    assert len(rec["sweep"]) >= 3
    # every feasible sweep point reports both the metric and the knob's effect
    for pt in rec["sweep"]:
        assert "infeasible" in pt or ("accuracy" in pt and "token_reduction" in pt)
    # reductions grow with aggressiveness (schedule arithmetic, not the model)
    reds = [pt["token_reduction"] for pt in rec["sweep"] if "token_reduction" in pt]
    assert reds == sorted(reds)


def test_accuracy_probe_transitions_instances():
    """The aggregate task's generator: answer == count of adjacent-frame color
    changes, prompt layout identical to the recall task (same engine inputs),
    answer tokens in their reserved vocab block."""
    import importlib.util
    import numpy as np

    sys.path.insert(0, SCRIPTS)  # the scripts resolve their shared `common`
    try:
        spec = importlib.util.spec_from_file_location(
            "accuracy_probe", os.path.join(SCRIPTS, "accuracy_probe.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(SCRIPTS)

    rng = np.random.default_rng(7)
    lens = set()
    for _ in range(50):
        ids, _, answer = mod.make_instance(rng, task="transitions")
        lens.add(len(ids))
        assert ids[-2] == mod.TRANS_QUERY and ids[-1] == answer
        # recompute the ground truth from the embedded color slots
        colors = ids[1:-2].reshape(mod.N_FRAMES, mod.PATCH_NUM)[:, mod.COLOR_SLOT]
        changes = int(np.sum(colors[1:] != colors[:-1]))
        assert answer == mod.COUNT_BASE + changes
        assert mod.COUNT_BASE <= answer < mod.COUNT_BASE + mod.N_FRAMES
        assert answer < mod.VOCAB
    # same prompt geometry as recall: build_prompt works unchanged
    assert lens == {1 + mod.N_FRAMES * mod.PATCH_NUM + 2}
    prompt, patch_type, pos = mod.build_prompt(ids)
    assert len(prompt) == len(ids) - 1 and patch_type[0] == -1 and pos[-1] == len(prompt) - 1
