"""Framework utilities.

Parity: /root/reference/framefusion/utils.py — the dot-path attribute
resolver (:13-25), the attention-weight extractor (:27-57, reimplemented as
``ops.attention.last_rows_importance`` fused into the compute path), and the
frame-dump debug helpers (:59-101).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def get_attr_by_name(obj: Any, name: str) -> Any:
    """Dot-path access with integer indexing, e.g. ``"layers.0.wq"``.

    Works on objects, mappings (param pytrees), and sequences — the pytree
    counterpart of the reference's module-path resolver (utils.py:13-25).
    """
    current = obj
    for level in name.split("."):
        if isinstance(current, dict):
            current = current[level]
        elif level.isdigit():
            current = current[int(level)]
        else:
            current = getattr(current, level)
    return current


def tree_path_get(params: dict, path: str):
    """Alias of :func:`get_attr_by_name` for param pytrees."""
    return get_attr_by_name(params, path)


def _to_uint8_frame(frame: np.ndarray) -> np.ndarray:
    """[-1, 1] float frame (H, W, 3) -> uint8."""
    f = np.asarray(frame, np.float32)
    f = np.clip((f + 1.0) / 2.0, 0.0, 1.0)
    return (f * 255).astype(np.uint8)


def save_video_frames(video: np.ndarray, output_path: str = "local/video_frames"):
    """Dump sampled frames as PNGs (reference utils.py:59-68).

    Args:
        video: (n_frames, H, W, 3) in [-1, 1].
    """
    from PIL import Image

    os.makedirs(output_path, exist_ok=True)
    for i, frame in enumerate(np.asarray(video)):
        Image.fromarray(_to_uint8_frame(frame)).save(os.path.join(output_path, f"frame_{i}.png"))


def save_video_frames_subfigures(video: np.ndarray, output_path: str = "local/video_frames.jpg"):
    """One subplot grid with all frames (reference utils.py:70-101)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    video = np.asarray(video)
    n = len(video)
    rows = int(np.sqrt(n))
    cols = int(np.ceil(n / rows))
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 4 * rows), squeeze=False)
    axes = axes.flatten()
    for i in range(n):
        axes[i].imshow(_to_uint8_frame(video[i]))
        axes[i].axis("off")
        axes[i].set_title(f"Frame {i}")
    for i in range(n, len(axes)):
        axes[i].axis("off")
    plt.tight_layout()
    plt.savefig(output_path)
    plt.close(fig)
