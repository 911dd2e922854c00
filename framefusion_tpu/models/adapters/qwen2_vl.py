"""Qwen2-VL adapter: contiguous video block + 3D mRoPE positions.

Parity: the patched ``Qwen2VLForConditionalGeneration.forward``
(/root/reference/framefusion/models/qwenvl/modeling_qwen2_vl.py:117-163):
  * ``patch_num = (grid_h * grid_w) / spatial_merge_size^2`` (:119-120);
  * patch_type tiles ``range(patch_num)`` per (merged) temporal frame (:126);
  * 3D rope index streams (temporal, height, width) recomputed once at
    prefill via ``get_rope_index`` — reimplemented here for the single-video
    prompt layout;
  * importance uses the last 4 query rows
    (models/qwen2/modeling_qwen2_vl.py:289-301).
"""

from __future__ import annotations

import numpy as np

from .common import PrefillInputs, contiguous_patch_type, splice_embeddings


def mrope_position_ids(
    total_len: int,
    video_start: int,
    grid_t: int,
    grid_h: int,
    grid_w: int,
    spatial_merge_size: int = 2,
    second_per_grid_ts: float | None = None,
    tokens_per_second: int = 2,
) -> np.ndarray:
    """(3, S) int32 positions: text advances all three streams together;
    video tokens get (t, h, w) grid coordinates offset by the text position,
    and the text after the video resumes from max(position)+1 — the layout
    produced by HF ``Qwen2VLModel.get_rope_index`` for one video.

    ``second_per_grid_ts`` switches to Qwen2.5-VL temporal spacing
    (``Qwen2_5_VLModel.get_rope_index`` — beyond the reference repo, which
    has no Qwen2.5 code; the oracle is the installed transformers, pinned
    by tests/test_qwen2vl_vs_hf.py::test_qwen25_rope_index_matches_hf):
    the temporal stream advances by absolute video time,
    ``t_idx * second_per_grid_ts * tokens_per_second``, rather than the
    frame index — h/w and the text resume rule unchanged. Oracle quirk
    (transformers 4.57): ``second_per_grid_ts`` is cast to int64 BEFORE the
    multiply, so fractional seconds-per-grid truncate; replicated to match
    the testable oracle (real checkpoints ship integer-valued defaults).
    """
    h = grid_h // spatial_merge_size
    w = grid_w // spatial_merge_size
    n_video = grid_t * h * w
    pos = np.zeros((3, total_len), dtype=np.int32)
    # leading text
    pos[:, :video_start] = np.arange(video_start, dtype=np.int32)[None, :]
    # video block
    t_idx = np.repeat(np.arange(grid_t, dtype=np.int32), h * w)
    if second_per_grid_ts is not None:
        t_idx = (t_idx.astype(np.int64) * int(second_per_grid_ts) * tokens_per_second).astype(np.int32)
    h_idx = np.tile(np.repeat(np.arange(h, dtype=np.int32), w), grid_t)
    w_idx = np.tile(np.arange(w, dtype=np.int32), grid_t * h)
    base = video_start
    pos[0, video_start : video_start + n_video] = base + t_idx
    pos[1, video_start : video_start + n_video] = base + h_idx
    pos[2, video_start : video_start + n_video] = base + w_idx
    # trailing text resumes after the max used position
    tail_start = int(pos[:, : video_start + n_video].max()) + 1
    n_tail = total_len - (video_start + n_video)
    tail = tail_start + np.arange(n_tail, dtype=np.int32)
    pos[:, video_start + n_video :] = tail[None, :]
    return pos


def build_prefill_inputs(
    text_embeds: np.ndarray,
    video_embeds: np.ndarray,
    video_token_pos: int,
    grid_t: int,
    grid_h: int,
    grid_w: int,
    spatial_merge_size: int = 2,
    second_per_grid_ts: float | None = None,
    tokens_per_second: int = 2,
) -> PrefillInputs:
    """Fuse text + Qwen2-VL visual embeddings and derive metadata.

    Args:
        text_embeds: (T, D) with ONE video placeholder row at
            ``video_token_pos``.
        video_embeds: (grid_t * grid_h * grid_w / merge^2, D) from the ViT.
        grid_*: the video_grid_thw entries (already temporally merged t).
    """
    patch_num = (grid_h * grid_w) // (spatial_merge_size * spatial_merge_size)
    image_token_length = video_embeds.shape[0]
    n_frames = image_token_length // patch_num
    assert n_frames == grid_t and n_frames * patch_num == image_token_length

    embeds = splice_embeddings(text_embeds, video_token_pos, video_embeds)
    total = embeds.shape[0]
    patch_type = contiguous_patch_type(total, video_token_pos, patch_num, n_frames)
    pos = mrope_position_ids(total, video_token_pos, grid_t, grid_h, grid_w, spatial_merge_size,
                             second_per_grid_ts=second_per_grid_ts,
                             tokens_per_second=tokens_per_second)
    return PrefillInputs(
        input_embeds=embeds,
        patch_type=patch_type,
        position_ids=pos,
        patch_num=patch_num,
        image_token_start=video_token_pos,
        image_token_length=image_token_length,
        num_importance_queries=4,
    )
