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

# Qwen2-VL processor-path equivalent (reference example_qwen2vl.py:49-54
# routes through processor.apply_chat_template, which expands the video into
# <|vision_start|><|video_pad|>...<|vision_end|>); here the single
# <|video_pad|> marks where the visual embeddings splice in.
QWEN2_VL_TEMPLATE = (
    "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
    "<|im_start|>user\n<|vision_start|><|video_pad|><|vision_end|>"
    "{question}<|im_end|>\n<|im_start|>assistant\n"
)

# InternVL chat builds an interleaved 'FrameN: <image>\n' prefix per frame
# (reference example_internvl.py:139-141; modeling_internvl_chat.py scatters
# per-frame ViT features at each <image>).
INTERNVL_TEMPLATE = "<|im_start|>user\n{video_prefix}{question}<|im_end|>\n<|im_start|>assistant\n"

FAMILY_TEMPLATES = {
    "qwen2_vl": QWEN2_VL_TEMPLATE,
    "internvl": INTERNVL_TEMPLATE,
}


@dataclasses.dataclass
class TextPipeline:
    """End-to-end video QA: tokenizer + (compressed) LLM + optional ViT.

    Prompt construction dispatches on ``model.family``:
      * LLaVA-Video / Qwen2-stack families — chat template with one
        ``<image>`` placeholder, frame-major feature block.
      * ``qwen2_vl`` — vision-token span at ``<|video_pad|>`` with 3D mRoPE
        position ids (pass ``video_grid_thw``).
      * ``internvl`` — interleaved ``FrameN: <image>`` prefix, per-frame
        feature splicing (pass per-frame features).
    """

    model: FrameFusionModel
    tokenizer: object  # .encode(str)->list[int], .decode(list[int])->str
    vit_params: Optional[dict] = None
    vit_cfg: Optional[object] = None
    projector: Optional[dict] = None
    image_token: str = "<image>"
    chat_template: Optional[str] = None

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str, cost: float = 0.3,
                        similarity_lower_bound: Optional[float] = None,
                        ratio_lower_bound: float = 0.1,
                        quantize: Optional[str] = None, dtype=jnp.bfloat16,
                        tokenizer=None) -> "TextPipeline":
        """Hub-layout checkpoint dir -> an ``ask()``-able pipeline in one call
        — the standalone twin of the reference's from_pretrained + processor
        setup (example_llava.py:94-113). The tokenizer loads from the SAME
        directory via transformers.AutoTokenizer (local files, no network)
        unless one is passed; S_th defaults to the family's per-script value
        (interface.FAMILIES). ``quantize="int8"`` quantizes decoder weights
        on the host during import (see weights.load_checkpoint)."""
        from .interface import FAMILIES, apply_framefusion
        from .weights import load_checkpoint

        model = load_checkpoint(checkpoint_dir, dtype=dtype, quantize=quantize)
        if similarity_lower_bound is None:
            similarity_lower_bound = FAMILIES[model.family].default_similarity_lower_bound
        model = apply_framefusion(model, cost, similarity_lower_bound, ratio_lower_bound)
        if tokenizer is None:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(checkpoint_dir)
        vision = model.vision or {}
        return cls(model=model, tokenizer=tokenizer,
                   vit_params=vision.get("params"), vit_cfg=vision.get("cfg"),
                   projector=vision.get("projector"))

    def _template(self) -> str:
        if self.chat_template is not None:
            return self.chat_template
        return FAMILY_TEMPLATES.get(self.model.family, DEFAULT_TEMPLATE)

    def _render_prompt(self, media: str, question: str, fallback: str) -> str:
        """Build the chat prompt. A tokenizer carrying a ``chat_template``
        (tokenizer_config.json-driven, the way the reference's scripts use
        ``processor.apply_chat_template`` — example_qwen2vl.py:49-54) renders
        through it; otherwise the family's static template is used. The
        media placeholder string stays in the user turn either way and is
        spliced downstream."""
        if self.chat_template is None and getattr(self.tokenizer, "chat_template", None):
            return self.tokenizer.apply_chat_template(
                [{"role": "user", "content": f"{media}{question}"}],
                tokenize=False, add_generation_prompt=True,
            )
        return fallback

    # Sentinel for media-placeholder rows in id lists handed to _embed_ids:
    # embeds as row 0 (the spliced feature overwrites it anyway) but never
    # enters the prompt-lookup history — real tokenizers may use id 0 for a
    # legitimate token, so placeholders are marked at their insertion sites
    # rather than filtered by value.
    PLACEHOLDER_ID = -1

    def _embed_ids(self, ids) -> np.ndarray:
        ids = np.asarray(ids, np.int32)
        if getattr(self, "_prompt_ids_acc", None) is not None:
            self._prompt_ids_acc.extend(int(i) for i in ids if i >= 0)
        return np.asarray(
            qwen2.embed(self.model.params,
                        jnp.asarray(np.where(ids < 0, 0, ids)), self.model.cfg),
            np.float32,
        )

    def build_inputs(self, question: str, frames=None, video_features=None,
                     video_grid_thw=None, second_per_grid_ts=None):
        """Tokenize the family's chat prompt and splice the video features.

        Also records ``last_prompt_ids`` — the prompt's text token ids
        (placeholder rows dropped) — which ``ask(speculative=True)`` feeds to
        the prompt-lookup drafter (runtime/spec_decode.py).

        ``frames`` may be raw uint8 (T, H, W, C) video frames: they are
        resized/normalized to the family's processor geometry in-repo
        (preprocess.py — the reference leans on each model's HF processor
        for this); float frames are taken as already preprocessed."""
        self._prompt_ids_acc = []
        try:
            inputs = self._build_inputs_dispatch(
                question, frames=self._prepare_frames(frames),
                video_features=video_features,
                video_grid_thw=video_grid_thw,
                second_per_grid_ts=second_per_grid_ts)
        finally:
            self.last_prompt_ids = list(self._prompt_ids_acc)
            self._prompt_ids_acc = None
        return inputs

    def _prepare_frames(self, frames):
        """Raw uint8 frames -> the family's normalized model pixels.

        Resize target comes from the attached tower: Qwen2-VL towers ride
        ``smart_resize`` with factor = patch_size * spatial_merge_size (the
        HF processor's rule); fixed-size towers (SigLIP, InternViT) use
        their ``image_size``. Float inputs pass through untouched."""
        if frames is None:
            return None
        frames = np.asarray(frames)
        if frames.dtype != np.uint8:
            return frames
        from . import preprocess as pp

        fam = self.model.family
        if fam == "qwen2_vl":
            assert self.vit_cfg is not None, "uint8 frames need a vision tower"
            factor = self.vit_cfg.patch_size * self.vit_cfg.spatial_merge_size
            return pp.preprocess_frames(frames, fam, factor=factor)
        assert self.vit_cfg is not None and hasattr(self.vit_cfg, "image_size"), \
            "uint8 frames need a fixed-size vision tower (image_size)"
        size = self.vit_cfg.image_size
        return pp.preprocess_frames(frames, fam, target=(size, size))

    def _build_inputs_dispatch(self, question: str, frames=None, video_features=None,
                               video_grid_thw=None, second_per_grid_ts=None):
        if self.model.family == "qwen2_vl":
            return self._build_inputs_qwen2_vl(question, video_features, video_grid_thw,
                                               frames=frames,
                                               second_per_grid_ts=second_per_grid_ts)
        if self.model.family == "internvl":
            return self._build_inputs_internvl(question, video_features, frames=frames)
        if self.model.family == "minicpmv":
            return self._build_inputs_minicpmv(question, video_features, frames=frames)
        if self.model.family == "nvila":
            return self._build_inputs_nvila(question, video_features, frames=frames)
        prompt = self._render_prompt(
            f"{self.image_token}\n", question,
            self._template().format(question=question),
        )
        before, _, after = prompt.partition(self.image_token)
        ids_before = list(self.tokenizer.encode(before))
        ids_after = list(self.tokenizer.encode(after))

        if video_features is None:
            from .models.vision.llava_frontend import encode_video

            assert frames is not None and self.vit_params is not None
            video_features = np.asarray(
                encode_video(self.vit_params, self.vit_cfg, self.projector, jnp.asarray(frames))
            )

        ids = ids_before + [self.PLACEHOLDER_ID] + ids_after
        text_embeds = self._embed_ids(ids)
        pps = self.vit_cfg.patches_per_side if self.vit_cfg is not None else 27
        return llava_video.build_prefill_inputs(
            text_embeds, np.asarray(video_features, np.float32),
            image_token_pos=len(ids_before), num_patches_per_side=pps,
        )

    def _build_inputs_qwen2_vl(self, question: str, video_features, video_grid_thw,
                               frames=None, second_per_grid_ts=None):
        """Qwen2-VL: one vision span, 3D mRoPE ids from video_grid_thw
        (reference qwenvl/modeling_qwen2_vl.py:117-163). Raw ``frames`` run
        through the in-repo ViT (models/vision/qwen2_vl_vit — the reference
        calls ``self.visual`` at qwenvl/modeling_qwen2_vl.py:95-111);
        precomputed ``video_features`` + ``video_grid_thw`` skip it.

        With a Qwen2.5-VL tower (Qwen25VLViTConfig) the temporal mRoPE
        stream advances by absolute video time: ``second_per_grid_ts``
        (default 1.0 = temporal_patch_size 2 / 2 fps, the HF processor's
        default sampling) times the tower's ``tokens_per_second``.
        """
        from .models.adapters import qwen2_vl
        from .models.vision.qwen25_vl_vit import Qwen25VLViTConfig

        is_qwen25 = isinstance(self.vit_cfg, Qwen25VLViTConfig)
        if video_features is None:
            from .models.vision.qwen2_vl_vit import pixels_to_patches

            assert frames is not None and self.vit_params is not None, (
                "qwen2_vl needs frames + a Qwen2-VL/Qwen2.5-VL ViT "
                "(vit_params/vit_cfg), or precomputed video_features + "
                "video_grid_thw"
            )
            # patch layout is shared; the tower dispatches on the config type
            patches, (grid_t, grid_h, grid_w) = pixels_to_patches(
                np.asarray(frames, np.float32), self.vit_cfg
            )
            if is_qwen25:
                from .models.vision.qwen25_vl_vit import encode_video
            else:
                from .models.vision.qwen2_vl_vit import encode_video
            video_grid_thw = (grid_t, grid_h, grid_w)
            video_features = np.asarray(encode_video(
                self.vit_params, jnp.asarray(patches), grid_t, grid_h, grid_w, self.vit_cfg
            ))
        assert video_grid_thw is not None, "qwen2_vl needs video_grid_thw"
        grid_t, grid_h, grid_w = (int(x) for x in video_grid_thw)
        prompt = self._render_prompt(
            "<|vision_start|><|video_pad|><|vision_end|>", question,
            self._template().format(question=question),
        )
        before, _, after = prompt.partition("<|video_pad|>")
        ids_before = list(self.tokenizer.encode(before))
        ids_after = list(self.tokenizer.encode(after))
        text_embeds = self._embed_ids(ids_before + [self.PLACEHOLDER_ID] + ids_after)
        if is_qwen25 and second_per_grid_ts is None:
            second_per_grid_ts = 1.0
        return qwen2_vl.build_prefill_inputs(
            text_embeds, np.asarray(video_features, np.float32),
            video_token_pos=len(ids_before), grid_t=grid_t, grid_h=grid_h, grid_w=grid_w,
            second_per_grid_ts=second_per_grid_ts,
            tokens_per_second=(self.vit_cfg.tokens_per_second if is_qwen25 else 2),
        )

    def _build_inputs_internvl(self, question: str, video_features, frames=None):
        """InternVL: 'FrameN: <image>\\n' per frame, features scattered at
        each <image> (reference example_internvl.py:139-141 +
        modeling_internvl_chat.py:19-71). Raw ``frames`` run through the
        in-repo InternViT + pixel-shuffle projector
        (models/vision/internvl_vit — the reference's ``extract_feature``,
        modeling_internvl_chat.py:19-33)."""
        from .models.adapters import internvl

        if video_features is None:
            from .models.vision.internvl_vit import extract_features

            assert frames is not None and self.vit_params is not None, (
                "internvl needs frames + an InternViT (vit_params/vit_cfg/"
                "projector), or precomputed per-frame video_features"
            )
            video_features = np.asarray(extract_features(
                self.vit_params, self.projector,
                jnp.asarray(np.asarray(frames, np.float32)), self.vit_cfg,
            ))
        feats = np.asarray(video_features, np.float32)
        assert feats.ndim == 3, "internvl expects (n_frames, tokens_per_frame, D)"
        n_frames, tpf, d = feats.shape
        video_prefix = "".join(f"Frame{i+1}: {self.image_token}\n" for i in range(n_frames))
        prompt = self._render_prompt(
            video_prefix, question,
            self._template().format(video_prefix=video_prefix, question=question),
        )
        segments = prompt.split(self.image_token)
        assert len(segments) == n_frames + 1
        embeds_parts = []
        mask_parts = []
        for i, seg in enumerate(segments):
            ids = list(self.tokenizer.encode(seg))
            if ids:
                embeds_parts.append(self._embed_ids(ids))
                mask_parts.append(np.zeros(len(ids), bool))
            if i < n_frames:
                embeds_parts.append(feats[i])
                mask_parts.append(np.ones(tpf, bool))
        embeds = np.concatenate(embeds_parts, axis=0)
        image_mask = np.concatenate(mask_parts)
        return internvl.build_prefill_inputs(embeds, image_mask, tokens_per_frame=tpf)

    def _build_inputs_minicpmv(self, question: str, video_features, frames=None):
        """MiniCPM-V: per-frame 64-token resampled blocks scattered at the
        image bounds (reference modeling_minicpmv.py:80-88 scatter +
        :90-107 bound-derived geometry). Raw ``frames`` run through the
        in-repo SigLIP + perceiver resampler
        (models/vision/minicpmv_frontend); ``video_features`` may be
        (n_frames, tokens_per_frame, D) precomputed."""
        from .models.adapters import minicpmv

        if video_features is None:
            from .models.vision.minicpmv_frontend import encode_video

            assert frames is not None and self.vit_params is not None and self.projector, (
                "minicpmv needs frames + SigLIP (vit_params/vit_cfg) + a "
                "resampler in projector={'params', 'cfg'}, or precomputed "
                "(n_frames, tokens_per_frame, D) video_features"
            )
            video_features = np.asarray(encode_video(
                self.vit_params, self.vit_cfg,
                self.projector["params"], self.projector["cfg"],
                jnp.asarray(np.asarray(frames, np.float32)),
            ))
        feats = np.asarray(video_features, np.float32)
        assert feats.ndim == 3, "minicpmv expects (n_frames, tokens_per_frame, D)"
        n_frames, tpf, _ = feats.shape
        prompt = self._render_prompt(f"{self.image_token}\n", question,
                                     self._template().format(question=question))
        before, _, after = prompt.partition(self.image_token)
        emb_before = self._embed_ids(list(self.tokenizer.encode(before)))
        emb_after = self._embed_ids(list(self.tokenizer.encode(after)))
        # 2 text separator slots per frame — the ``(<image>./</image>)\n``
        # suffix tokens whose distance the adapter's token_per_frame
        # includes (reference modeling_minicpmv.py:95-98).
        sep = self._embed_ids(
            (list(self.tokenizer.encode(")\n")) + [self.PLACEHOLDER_ID] * 2)[:2])
        chunks, bounds, cursor = [emb_before], [], emb_before.shape[0]
        for f in range(n_frames):
            chunks.append(feats[f])
            bounds.append([cursor, cursor + tpf])
            chunks.append(sep)
            cursor += tpf + 2
        chunks.append(emb_after)
        embeds = np.concatenate(chunks)
        return minicpmv.build_prefill_inputs(embeds, np.asarray(bounds),
                                             num_frames=n_frames)

    def _build_inputs_nvila(self, question: str, video_features, frames=None):
        """NVILA: one contiguous media block at the placeholder (reference
        llava_arch.py:85-104). Raw ``frames`` run through SigLIP + the VILA
        mlp_downsample connector (models/vision/nvila_frontend)."""
        from .models.adapters import nvila

        if video_features is None:
            from .models.vision.nvila_frontend import encode_video

            assert frames is not None and self.vit_params is not None and self.projector, (
                "nvila needs frames + SigLIP (vit_params/vit_cfg) + a "
                "projector in projector={'params', 'cfg'}, or precomputed "
                "(n_frames * patch_num, D) video_features"
            )
            frames = np.asarray(frames, np.float32)
            video_features = np.asarray(encode_video(
                self.vit_params, self.vit_cfg,
                self.projector["params"], self.projector["cfg"],
                jnp.asarray(frames),
            ))
            n_frames = frames.shape[0]
        else:
            n_frames = getattr(self, "nvila_num_frames", None)
            assert n_frames, "set pipeline.nvila_num_frames with precomputed features"
        prompt = self._render_prompt(f"{self.image_token}\n", question,
                                     self._template().format(question=question))
        before, _, after = prompt.partition(self.image_token)
        ids_before = list(self.tokenizer.encode(before))
        ids_after = list(self.tokenizer.encode(after))
        text_embeds = self._embed_ids(ids_before + [self.PLACEHOLDER_ID] + ids_after)
        return nvila.build_prefill_inputs_video(
            text_embeds, np.asarray(video_features, np.float32),
            media_token_pos=len(ids_before), num_frames=n_frames,
        )

    def ask(self, question: str, frames=None, video_features=None,
            max_new_tokens: int = 64, eos_token_id: Optional[int] = None,
            video_grid_thw=None, second_per_grid_ts=None,
            speculative: bool = False, draft_len: int = 4) -> str:
        inputs = self.build_inputs(question, frames=frames, video_features=video_features,
                                   video_grid_thw=video_grid_thw,
                                   second_per_grid_ts=second_per_grid_ts)
        eos = eos_token_id
        if eos is None:
            eos = getattr(self.tokenizer, "eos_token_id", None)
        tokens, result = self.model.generate(
            inputs, max_new_tokens, eos_token_id=eos,
            speculative=speculative, draft_len=draft_len,
            prompt_ids=self.last_prompt_ids if speculative else None,
        )
        text = self.tokenizer.decode(tokens)
        self.last_result = result
        return text
