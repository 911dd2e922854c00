"""LLaVA-NeXT-Video adapter.

Parity note: the reference's adapter
(/root/reference/framefusion/models/llava_next_video/modeling_llava_next_video.py:226-234)
computes a per-token *frame index* token_type and stores it on the model but
NEVER calls ``framefusion.prepare`` — the registered path
(interface.py:58-66) would run with unset compression state; SURVEY.md §2
flags it as incomplete/vestigial. This rebuild completes the adapter the way
the other families work: spatial patch ids per frame
(``token_per_frame = vit_patches / pool_kernel^2``, reference :228), so the
family is actually usable. The reference's frame-index token_type is exposed
too (``frame_index_token_type``) for parity inspection.
"""

from __future__ import annotations

import numpy as np

from ...core.constants import TEXT_TOKEN
from .common import PrefillInputs


def frame_index_token_type(image_mask: np.ndarray, token_per_frame: int) -> np.ndarray:
    """The reference's (vestigial) per-token frame index: -10 base, -1 text,
    frame id on video tokens (reference :226-232)."""
    out = np.full(image_mask.shape[0], -10, dtype=np.int32)
    out[~image_mask] = TEXT_TOKEN
    idx = np.nonzero(image_mask)[0]
    n_frames = len(idx) // token_per_frame
    out[idx] = np.repeat(np.arange(n_frames, dtype=np.int32), token_per_frame)
    return out


def build_prefill_inputs(
    input_embeds: np.ndarray,
    image_mask: np.ndarray,
    num_vit_patches: int,
    pool_kernel_size: int = 2,
) -> PrefillInputs:
    """Spatial patch ids over the video span (completed adapter).

    Args:
        input_embeds: (S, D) embeddings with video features scattered in.
        image_mask: (S,) bool — video-token positions.
        num_vit_patches: ViT patches per frame before pooling.
        pool_kernel_size: the vision resampler's pooling kernel (reference :228).
    """
    token_per_frame = num_vit_patches // (pool_kernel_size ** 2)
    s = input_embeds.shape[0]
    idx = np.nonzero(image_mask)[0]
    assert len(idx) % token_per_frame == 0
    n_frames = len(idx) // token_per_frame

    patch_type = np.full(s, TEXT_TOKEN, dtype=np.int32)
    patch_type[idx] = np.tile(np.arange(token_per_frame, dtype=np.int32), n_frames)
    start, end = int(idx[0]), int(idx[-1])
    return PrefillInputs(
        input_embeds=input_embeds,
        patch_type=patch_type,
        position_ids=np.arange(s, dtype=np.int32),
        patch_num=token_per_frame,
        image_token_start=start,
        image_token_length=end - start + 1,
        num_importance_queries=1,
    )
