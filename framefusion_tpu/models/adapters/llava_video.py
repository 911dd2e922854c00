"""LLaVA-Video adapter (the reference's canonical example, README.md:171-173).

Parity: ``prepare_inputs_labels_for_multimodal_get_patch_type``
(/root/reference/framefusion/models/llava_video/modeling_llava_video.py:
321-339):
  * 2x2 spatial pooling of the ViT grid: ``patch_size = ceil(side/2)`` for
    bilinear pooling, ``side // 2`` otherwise (:322-325);
  * ``patch_num = patch_size * (patch_size + 1)`` — the +1 column is the
    per-row ``image_newline`` token appended by LLaVA's anyres packing
    (:326);
  * one contiguous video block at the <image> placeholder; text before and
    after (:335-336); batch size 1, single video (:328-329).
"""

from __future__ import annotations

import math

import numpy as np

from .common import PrefillInputs, contiguous_patch_type, splice_embeddings


def build_prefill_inputs(
    text_embeds: np.ndarray,
    video_features: np.ndarray,
    image_token_pos: int,
    num_patches_per_side: int = 27,
    spatial_pool_mode: str = "average",
) -> PrefillInputs:
    """Fuse text + video features and derive FrameFusion metadata.

    Args:
        text_embeds: (T, D) token embeddings with ONE <image> placeholder row.
        video_features: (n_frames * patch_num, D) pooled ViT features
            including per-row newline tokens, as produced by the LLaVA-Video
            frontend (vision tower + get_2dPool + newline insertion).
        image_token_pos: index of the <image> placeholder row.
        num_patches_per_side: ViT patches per side (27 for SigLIP-so400m@384/14).
    """
    if spatial_pool_mode == "bilinear":
        patch_size = math.ceil(num_patches_per_side / 2)
    else:
        patch_size = num_patches_per_side // 2
    patch_num = patch_size * (patch_size + 1)

    image_token_length = video_features.shape[0]
    n_frames = image_token_length // patch_num
    assert n_frames * patch_num == image_token_length, (
        f"video features ({image_token_length}) not a multiple of patch_num ({patch_num})"
    )

    embeds = splice_embeddings(text_embeds, image_token_pos, video_features)
    total = embeds.shape[0]
    patch_type = contiguous_patch_type(total, image_token_pos, patch_num, n_frames)
    return PrefillInputs(
        input_embeds=embeds,
        patch_type=patch_type,
        position_ids=np.arange(total, dtype=np.int32),
        patch_num=patch_num,
        image_token_start=image_token_pos,
        image_token_length=image_token_length,
        num_importance_queries=1,
    )
