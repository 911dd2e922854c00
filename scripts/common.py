"""Shared utilities for the playground scripts.

The reference's example scripts (reference script/playground/*) load real HF
checkpoints and decode videos with decord. This environment has no network and
no video decoders, so every script supports two modes:
  * ``--checkpoint DIR``: load real safetensors weights (framefusion_tpu.weights)
    and, with ``--video`` plus an available decoder (decord/av), real frames;
  * default: random weights at the family's geometry and a synthetic
    temporally-coherent video — the timing A/B and compression telemetry are
    real either way.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import numpy as np


def load_video_frames(path: str, num_frames: int, size: int):
    """Uniformly sample frames; a directory of image files (sorted by name,
    loaded with PIL — works with no video decoder installed), then decord,
    then av (reference example_llava.py:69-86 uses decord)."""
    if os.path.isdir(path):
        import PIL.Image as Image

        names = sorted(
            n for n in os.listdir(path)
            if n.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".webp"))
        )
        if not names:
            raise FileNotFoundError(f"no image files in frame directory {path}")
        idx = np.linspace(0, len(names) - 1, num_frames).astype(int)
        frames = np.stack([
            np.asarray(Image.open(os.path.join(path, names[i])).convert("RGB"))
            for i in idx
        ])
    else:
        try:
            import decord

            vr = decord.VideoReader(path)
            idx = np.linspace(0, len(vr) - 1, num_frames).astype(int)
            frames = vr.get_batch(idx).asnumpy()
        except Exception:
            import av  # may also be absent; caller handles failure

            container = av.open(path)
            all_frames = [f.to_ndarray(format="rgb24") for f in container.decode(video=0)]
            idx = np.linspace(0, len(all_frames) - 1, num_frames).astype(int)
            frames = np.stack([all_frames[i] for i in idx])
    # center-crop + resize to (size, size), normalize to [-1, 1]
    import PIL.Image as Image

    out = []
    for f in frames:
        im = Image.fromarray(f).resize((size, size))
        out.append(np.asarray(im, np.float32) / 127.5 - 1.0)
    return np.stack(out)


def synthetic_video(rng, num_frames: int, size: int, scene_len: int = 16):
    """Temporally coherent random video: slow drift within scenes, cuts between."""
    frames = np.empty((num_frames, size, size, 3), np.float32)
    cur = rng.standard_normal((size, size, 3)).astype(np.float32)
    for i in range(num_frames):
        if i % scene_len == 0 and i:
            cur = rng.standard_normal((size, size, 3)).astype(np.float32)
        cur = cur + 0.08 * rng.standard_normal((size, size, 3)).astype(np.float32)
        frames[i] = np.clip(cur, -1, 1)
    return frames


class DeviceTimer:
    """Wall-clock timing that actually waits for device work: on remote-relay
    runners only a device->host read is a true barrier."""

    @staticmethod
    def force(x):
        import jax.numpy as jnp

        return float(jnp.sum(x.astype(jnp.float32)))

    @staticmethod
    def timeit(fn, probe, reps=3):
        """Median of ``reps`` individually-forced runs. Each sample's wall is
        ``max(T, L)`` where L is the relay's read round-trip (DEVNOTES) —
        fine when T >> L, but methods faster than L read as L. Prefer
        ``timeit_slope`` for anything whose runtime can sit below ~1 s."""
        out = fn()
        DeviceTimer.force(probe(out))  # warmup / compile
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            DeviceTimer.force(probe(out))
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2], out

    @staticmethod
    def timeit_slope(run, probe, rounds=3, max_chain=32):
        """Latency-artifact-free per-run time: the SLOPE between two
        dependency-chained run counts (see bench.py timed() and DEVNOTES —
        a chain of N dispatches closed by one forced read takes
        ``max(N*T, L)`` wall, so slope cancels the relay's read latency L
        and every other constant term).

        ``run(scale, eps)`` must execute one dispatch on an input made
        bf16-visibly distinct by multiplying with the python float ``scale``
        and adding the jnp scalar ``eps`` (derived from the previous rep's
        output, ordering the chain). ``probe(out)`` selects a device array
        of the output. Returns ``(seconds_per_run, clean_out)`` where
        clean_out is a final unscaled run (scale=1, eps=0).
        """
        import jax.numpy as jnp

        out = run(1.0, jnp.float32(0.0))
        DeviceTimer.force(probe(out))  # warmup / compile
        t0 = time.perf_counter()
        DeviceTimer.force(probe(out))
        l_est = time.perf_counter() - t0  # idle-queue read == latency floor

        k = [0]

        def chain(n):
            t0 = time.perf_counter()
            eps = jnp.float32(0.0)
            for _ in range(n):
                k[0] += 1
                o = run(1.0 + (k[0] % 97 + 1) * 2.0 ** -7, eps)
                eps = probe(o).reshape(-1)[0].astype(jnp.float32) * jnp.float32(1e-30)
            DeviceTimer.force(probe(o))
            return time.perf_counter() - t0

        n, total = 2, chain(2)
        while total < max(3.0 * l_est, 2.0) and n < max_chain:
            n *= 2
            total = chain(n)
        lo, hi = max(n // 2, 1), n
        slopes = []
        for _ in range(rounds):
            e_lo = chain(lo)
            e_hi = chain(hi)
            slopes.append(max((e_hi - e_lo) / (hi - lo), 1e-9))
        slopes.sort()
        out = run(1.0, jnp.float32(0.0))
        DeviceTimer.force(probe(out))
        return slopes[len(slopes) // 2], out


def ab_table(rows):
    import pandas as pd

    return pd.DataFrame(rows).to_string(index=False)
