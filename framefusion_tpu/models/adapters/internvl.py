"""InternVL2.5 adapter: interleaved ``FrameN: <image>`` prompts.

Parity: the patched ``generate`` hook
(/root/reference/framefusion/models/internvl/modeling_internvl_chat.py:38-83):
  * per-frame ``patch_num = vit_embeds.shape[1]`` (tokens per tile, :61);
  * patch_type = leading text + per-frame [range(patch_num) + frame's
    trailing text] with the inter-frame text lengths recovered from the
    run-lengths of non-image tokens (:66-71);
  * the InternLM2 backbone threads 2D position_ids instead of cos/sin
    (models/internvl/modeling_internlm2.py:183-185) — positions here are
    plain 1D arange, which our engine carries uniformly.
"""

from __future__ import annotations

import numpy as np

from ...core.constants import TEXT_TOKEN
from .common import PrefillInputs


def build_prefill_inputs(
    input_embeds: np.ndarray,
    image_mask: np.ndarray,
    tokens_per_frame: int,
) -> PrefillInputs:
    """Derive metadata for an interleaved multi-frame InternVL prompt.

    Args:
        input_embeds: (S, D) embeddings with ViT features already scattered
            into the image-context positions.
        image_mask: (S,) bool — True where image tokens live (the reference's
            ``selected`` mask over ``img_context_token_id`` positions).
        tokens_per_frame: ViT tokens per frame/tile (= patch_num).
    """
    s = input_embeds.shape[0]
    img_idx = np.nonzero(image_mask)[0]
    assert len(img_idx) % tokens_per_frame == 0, "image tokens not a multiple of frame size"
    n_frames = len(img_idx) // tokens_per_frame

    patch_type = np.full(s, TEXT_TOKEN, dtype=np.int32)
    # Each frame's block is contiguous; interleaved text keeps TEXT_TOKEN.
    frame_ids = np.tile(np.arange(tokens_per_frame, dtype=np.int32), n_frames)
    patch_type[img_idx] = frame_ids

    start = int(img_idx[0])
    end = int(img_idx[-1])
    return PrefillInputs(
        input_embeds=input_embeds,
        patch_type=patch_type,
        position_ids=np.arange(s, dtype=np.int32),
        patch_num=tokens_per_frame,
        image_token_start=start,
        # NOTE reference quirk kept: the "image token length" is the SPAN
        # end-start+1 (modeling_internvl_chat.py:60), which for interleaved
        # prompts includes the text between frames — the prune window
        # therefore covers that text too, exactly as upstream.
        image_token_length=end - start + 1,
        num_importance_queries=1,
    )
