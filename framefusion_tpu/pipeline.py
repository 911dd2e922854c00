"""Text-level pipeline: checkpoint + tokenizer + frames -> answer text.

The reference's example scripts drive HF ``model.generate`` with tokenized
chat prompts (reference script/playground/example_llava.py:103-146). This is
the standalone equivalent: given a tokenizer (HF AutoTokenizer or anything
with encode/decode), LLM params, a vision tower, and frames, it builds the
LLaVA-style prompt, splices video features at the media placeholder, runs the
(compressed) prefill, and decodes text.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

import jax.numpy as jnp

from .interface import FrameFusionModel
from .models import qwen2
from .models.adapters import llava_video


DEFAULT_TEMPLATE = (
    "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
    "<|im_start|>user\n<image>\n{question}<|im_end|>\n<|im_start|>assistant\n"
)


@dataclasses.dataclass
class TextPipeline:
    """End-to-end video QA for LLaVA-Video-style models."""

    model: FrameFusionModel
    tokenizer: object  # .encode(str)->list[int], .decode(list[int])->str
    vit_params: Optional[dict] = None
    vit_cfg: Optional[object] = None
    projector: Optional[dict] = None
    image_token: str = "<image>"
    chat_template: str = DEFAULT_TEMPLATE

    def build_inputs(self, question: str, frames=None, video_features=None):
        """Tokenize the chat prompt and splice video features at <image>."""
        prompt = self.chat_template.format(question=question)
        before, _, after = prompt.partition(self.image_token)
        ids_before = list(self.tokenizer.encode(before))
        ids_after = list(self.tokenizer.encode(after))

        if video_features is None:
            from .models.vision.llava_frontend import encode_video

            assert frames is not None and self.vit_params is not None
            video_features = np.asarray(
                encode_video(self.vit_params, self.vit_cfg, self.projector, jnp.asarray(frames))
            )

        ids = np.asarray(ids_before + [0] + ids_after, np.int32)  # 0 = placeholder row
        text_embeds = np.asarray(
            qwen2.embed(self.model.params, jnp.asarray(ids), self.model.cfg), np.float32
        )
        pps = self.vit_cfg.patches_per_side if self.vit_cfg is not None else 27
        return llava_video.build_prefill_inputs(
            text_embeds, np.asarray(video_features, np.float32),
            image_token_pos=len(ids_before), num_patches_per_side=pps,
        )

    def ask(self, question: str, frames=None, video_features=None,
            max_new_tokens: int = 64, eos_token_id: Optional[int] = None) -> str:
        inputs = self.build_inputs(question, frames=frames, video_features=video_features)
        eos = eos_token_id
        if eos is None:
            eos = getattr(self.tokenizer, "eos_token_id", None)
        tokens, result = self.model.generate(inputs, max_new_tokens, eos_token_id=eos)
        text = self.tokenizer.decode(tokens)
        self.last_result = result
        return text
