"""Token-type sentinels shared across the framework.

Parity: /root/reference/framefusion/main.py:5-6, framefusion/utils.py:10-11,
framefusion/models/llava_video/modeling_llava_video.py:14-16.

``patch_type`` is an int32 vector aligned with the token sequence. Image/video
tokens carry their spatial patch id in ``[0, patch_num)``; everything else
carries a negative sentinel. Only tokens with a non-negative patch id
participate in adjacent-frame merging.
"""

TEXT_TOKEN = -1
IGNORE_TOKEN = -2
SPECIAL_TOKEN = -9

# Fill value used for padding slots introduced by bucketed compaction. Padding
# must never merge (similarity forced to IGNORE) nor count as a frame token,
# so it gets its own sentinel distinct from TEXT_TOKEN (which *does* count
# toward ``frame_token_num`` in the reference only when != -1; see
# core/similarity.py for the exact accounting).
PAD_TOKEN = -10
