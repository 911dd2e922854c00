"""Adapter layer: per-model-family prompt metadata -> PrefillInputs.

The reference implements adapters as monkey-patched embedding hooks that
splice vision features into text embeddings and derive ``patch_type``
metadata (SURVEY.md §2 "Per-model adapters"). Here each adapter is a pure
host-side function producing a ``PrefillInputs`` bundle the engine consumes;
embedding splicing is explicit instead of hidden in patched HF internals.

``patch_type`` semantics (shared with the reference): -1 text, >=0 the
spatial patch id within a frame; consecutive frames repeat the same id range,
so same-id neighbours in patch-major order are adjacent-frame merge
candidates.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ...core.constants import TEXT_TOKEN


@dataclasses.dataclass
class PrefillInputs:
    """Everything the compression engine needs for one prefill."""

    input_embeds: np.ndarray  # (S, D)
    patch_type: np.ndarray  # (S,) int32
    position_ids: np.ndarray  # (S,) int32 or (3, S) for mRoPE
    patch_num: int
    image_token_start: int
    image_token_length: int
    # Importance-query count differs per family (1 for Qwen2-backed models,
    # 4 for Qwen2-VL — reference models/qwen2/modeling_qwen2_vl.py:289-301).
    num_importance_queries: int = 1


def splice_embeddings(text_embeds: np.ndarray, insert_pos: int, media_embeds: np.ndarray):
    """Insert media embeddings at ``insert_pos`` (replacing one placeholder
    row), the common fusion shape across adapters."""
    return np.concatenate(
        [text_embeds[:insert_pos], media_embeds, text_embeds[insert_pos + 1 :]], axis=0
    )


def contiguous_patch_type(
    total_len: int, start: int, patch_num: int, n_frames: int
) -> np.ndarray:
    """[TEXT]*start + (0..patch_num-1)*n_frames + [TEXT]*rest — the layout of
    every contiguous-video family (reference modeling_llava_video.py:335-336,
    qwenvl/modeling_qwen2_vl.py:126)."""
    pt = np.full(total_len, TEXT_TOKEN, dtype=np.int32)
    n_img = patch_num * n_frames
    pt[start : start + n_img] = np.tile(np.arange(patch_num, dtype=np.int32), n_frames)
    return pt


def image_span(patch_type: np.ndarray):
    """(start, end, length) of the image-token span — argmax-over-flipped-mask
    construction used by the MiniCPM-V / NVILA hooks (reference
    modeling_minicpmv.py:101-104, llava_arch.py:92-95)."""
    is_img = patch_type >= 0
    start = int(np.argmax(is_img))
    end = len(patch_type) - 1 - int(np.argmax(is_img[::-1]))
    return start, end, end - start + 1
