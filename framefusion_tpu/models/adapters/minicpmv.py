"""MiniCPM-V 2.6 adapter.

Parity: the patched ``get_vllm_embedding`` hook
(/root/reference/framefusion/models/minicpmv/modeling_minicpmv.py:90-107):
  * ``token_per_frame`` = distance between consecutive frames' first image
    positions (includes the resampler's slice-separator slots, hence the +2
    window extension — :96-98);
  * patch ids are a running index modulo ``token_per_frame`` over
    ``[first_image_pos, last_image_pos + 2)`` (:98) — note this deliberately
    tags the two trailing separator tokens of each frame as patch ids too;
  * the span is recovered from the first/last non-negative patch ids
    (:101-104).
"""

from __future__ import annotations

import numpy as np

from ...core.constants import TEXT_TOKEN
from .common import PrefillInputs, image_span


def build_prefill_inputs(
    input_embeds: np.ndarray,
    image_bound: np.ndarray,
    num_frames: int,
) -> PrefillInputs:
    """Derive metadata from MiniCPM-V's image-bound table.

    Args:
        input_embeds: (S, D) embeddings with vision features scattered in.
        image_bound: (n_slices, 2) int — [start, end) of each vision-feature
            slice in token space (the model's ``data["image_bound"][0]``).
        num_frames: frames in the video (the reference requires the caller to
            set ``model.num_frames`` — script/playground/example_minicpmv.py:99).
    """
    s = input_embeds.shape[0]
    image_bound = np.asarray(image_bound)
    patch_per_frame = image_bound.shape[0] // num_frames
    token_per_frame = int(image_bound[patch_per_frame, 0] - image_bound[0, 0])

    patch_type = np.full(s, TEXT_TOKEN, dtype=np.int32)
    lo = int(image_bound[0, 0])
    hi = int(image_bound[-1, 1]) + 2
    patch_type[lo:hi] = np.arange(hi - lo, dtype=np.int32) % token_per_frame

    start, end, length = image_span(patch_type)
    return PrefillInputs(
        input_embeds=input_embeds,
        patch_type=patch_type,
        position_ids=np.arange(s, dtype=np.int32),
        patch_num=token_per_frame,
        image_token_start=start,
        image_token_length=length,
        num_importance_queries=1,
    )
