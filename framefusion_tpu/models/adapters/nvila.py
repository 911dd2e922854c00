"""NVILA adapter (video and multi-image prompts).

Parity: the patched ``LlavaMetaForCausalLM._embed``
(/root/reference/framefusion/models/nvila/llava_arch.py:40-104):
  * video: ``num_frames`` scaled down by the temporal ``pool_sizes`` factor,
    ``patch_num = video_tokens / num_frames`` (:46-51);
  * multi-image: every image is treated as one "frame" with ``patch_num = 1``
    (:52-58) — merging then collapses consecutive near-duplicate images;
  * patch ids tile across the single contiguous media span between the
    leading and trailing text segments (:85-89); span via argmax on the
    flipped mask (:92-95).
"""

from __future__ import annotations

import numpy as np

from .common import PrefillInputs, contiguous_patch_type, image_span


def build_prefill_inputs_video(
    text_embeds: np.ndarray,
    video_embeds: np.ndarray,
    media_token_pos: int,
    num_frames: int,
    temporal_pool_size: int = 1,
) -> PrefillInputs:
    from .common import splice_embeddings

    eff_frames = int(num_frames / temporal_pool_size)
    n_tokens = video_embeds.shape[0]
    patch_num = n_tokens // eff_frames
    assert patch_num * eff_frames == n_tokens

    embeds = splice_embeddings(text_embeds, media_token_pos, video_embeds)
    total = embeds.shape[0]
    patch_type = contiguous_patch_type(total, media_token_pos, patch_num, eff_frames)
    start, end, length = image_span(patch_type)
    return PrefillInputs(
        input_embeds=embeds,
        patch_type=patch_type,
        position_ids=np.arange(total, dtype=np.int32),
        patch_num=patch_num,
        image_token_start=start,
        image_token_length=length,
        num_importance_queries=1,
    )


def build_prefill_inputs_multi_image(
    text_embeds: np.ndarray,
    image_embeds_list: list,
    media_token_pos: int,
) -> PrefillInputs:
    """Multi-image: patch_num=1, each image one frame (reference :52-58).

    All images are spliced as one contiguous block at ``media_token_pos``
    (the reference asserts the prompt shape text+media+text, :87-88).
    """
    from .common import splice_embeddings

    media = np.concatenate(image_embeds_list, axis=0)
    n_tokens = media.shape[0]
    embeds = splice_embeddings(text_embeds, media_token_pos, media)
    total = embeds.shape[0]
    patch_type = contiguous_patch_type(total, media_token_pos, 1, n_tokens)
    start, end, length = image_span(patch_type)
    return PrefillInputs(
        input_embeds=embeds,
        patch_type=patch_type,
        position_ids=np.arange(total, dtype=np.int32),
        patch_num=1,
        image_token_start=start,
        image_token_length=length,
        num_importance_queries=1,
    )
