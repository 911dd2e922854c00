"""Public API: ``apply_framefusion`` and the model-family registry.

Parity surface: /root/reference/framefusion/interface.py:47-137. The
reference dispatches on the HF model class and monkey-patches forward
methods in place; the TPU build dispatches on a family name and returns a
*new, configured* ``FrameFusionModel`` whose engine runs the compressed
prefill as jitted XLA programs — same three knobs, no mutation.

Family table (reference interface.py:58-124 + per-script S_th defaults,
SURVEY.md §5 "Config / flag system"):

| family            | backbone  | positions | importance rows | default S_th |
|-------------------|-----------|-----------|-----------------|--------------|
| llava_video       | Qwen2     | 1D        | 1               | 0.6          |
| llava_next_video  | Qwen2     | 1D        | 1               | 0.6          |
| minicpmv          | Qwen2     | 1D        | 1               | 0.7          |
| nvila             | Qwen2     | 1D        | 1               | 0.7          |
| qwen2_vl          | Qwen2-VL  | 3D mRoPE  | 4               | 0.5          |
| internvl          | InternLM2 | 1D        | 1               | 0.5          |

All six ride the same functional decoder (models/qwen2.py): Qwen2-VL adds
``mrope_section`` and InternLM2 drops qkv bias; only weight import differs
(weights.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax

from .config import FrameFusionConfig, LLMConfig
from .models.adapters.common import PrefillInputs
from .runtime.engine import CompressionEngine, PrefillResult


@dataclasses.dataclass
class FamilySpec:
    name: str
    adapter_module: str  # framefusion_tpu.models.adapters.<name>
    llm_prefix: str  # weight-import prefix of the language model
    num_importance_queries: int
    default_similarity_lower_bound: float
    qkv_bias: bool = True
    mrope: bool = False


FAMILIES = {
    # reference interface.py:69-77 (LLaVA-Video -> Qwen2 triple)
    "llava_video": FamilySpec("llava_video", "llava_video", "model.", 1, 0.6),
    # reference interface.py:58-66 (LLaVA-NeXT-Video -> Qwen2 triple)
    "llava_next_video": FamilySpec("llava_next_video", "llava_next_video", "language_model.model.", 1, 0.6),
    # reference interface.py:80-88 (MiniCPM-V -> Qwen2 triple, llm.model)
    "minicpmv": FamilySpec("minicpmv", "minicpmv", "llm.model.", 1, 0.7),
    # reference interface.py:91-98 (NVILA -> Qwen2 triple, llm.model)
    "nvila": FamilySpec("nvila", "nvila", "llm.model.", 1, 0.7),
    # reference interface.py:101-108 (Qwen2-VL triple, num=4 importance rows)
    "qwen2_vl": FamilySpec("qwen2_vl", "qwen2_vl", "model.", 4, 0.5, mrope=True),
    # reference interface.py:111-118 (InternVL -> InternLM2 triple)
    "internvl": FamilySpec("internvl", "internvl", "language_model.model.", 1, 0.5, qkv_bias=False),
}


@dataclasses.dataclass
class FrameFusionModel:
    """A loaded LVLM language model plus (optionally) a FrameFusion config.

    ``params`` is the functional decoder pytree (models/qwen2.py layout);
    ``vision`` may hold a vision tower (models/vision/) for full end-to-end
    pipelines — adapters also accept precomputed features, mirroring how the
    reference splices upstream-encoder outputs.
    """

    family: str
    cfg: LLMConfig
    params: dict
    ff: Optional[FrameFusionConfig] = None
    vision: Optional[object] = None
    attn_impl: str = "auto"
    pool_layers: int = 8
    _engine: Optional[CompressionEngine] = dataclasses.field(default=None, repr=False)

    @property
    def spec(self) -> FamilySpec:
        return FAMILIES[self.family]

    def _resolved_attn_impl(self) -> str:
        if self.attn_impl != "auto":
            return self.attn_impl
        return "pallas" if jax.default_backend() == "tpu" else "chunked"

    def engine(self) -> CompressionEngine:
        if self._engine is None:
            ff = self.ff or FrameFusionConfig(cost=1.0)  # dense placeholder
            self._engine = CompressionEngine(
                self.params, self.cfg, ff,
                attn_impl=self._resolved_attn_impl(), pool_layers=self.pool_layers,
            )
        return self._engine

    # -- inference ----------------------------------------------------------

    def prefill(self, inputs: PrefillInputs, mode: str = "fused") -> PrefillResult:
        """Compressed prefill if FrameFusion or a baseline is applied, dense
        otherwise."""
        is_baseline = getattr(self.engine(), "mode", None) is not None
        if self.ff is None and not is_baseline:
            return self.engine().dense_prefill(inputs.input_embeds, inputs.position_ids)
        return self.engine().prefill(
            inputs.input_embeds,
            inputs.patch_type,
            inputs.position_ids,
            patch_num=inputs.patch_num,
            image_token_start=inputs.image_token_start,
            image_token_length=inputs.image_token_length,
            mode=mode,
        )

    def generate(
        self,
        inputs: PrefillInputs,
        max_new_tokens: int = 64,
        eos_token_id: Optional[int] = None,
        sampler=None,
        rng_key=None,
        speculative: bool = False,
        draft_len: int = 4,
        prompt_ids=None,
    ):
        """Prefill + decode (greedy, or an ``ops.sampling.SamplerConfig``).
        Returns (token_ids, PrefillResult).

        ``speculative=True`` (greedy only) decodes via prompt-lookup
        draft-and-verify — same tokens, fewer weight passes when the output
        echoes ``prompt_ids`` or itself (runtime/spec_decode.py)."""
        result = self.prefill(inputs)
        if speculative:
            assert sampler is None, "speculative decoding is greedy-only"
            tokens = self.engine().generate_spec(
                result, max_new_tokens, draft_len=draft_len,
                prompt_ids=prompt_ids, eos_token_id=eos_token_id,
            )
        else:
            tokens = self.engine().generate(
                result, max_new_tokens, eos_token_id=eos_token_id, sampler=sampler, rng_key=rng_key
            )
        return tokens, result

    def generate_batch(
        self,
        inputs_list,
        max_new_tokens: int = 64,
        eos_token_id: Optional[int] = None,
        sampler=None,
        rng_key=None,
        mode: str = "fused",
        speculative: bool = False,
        draft_len: int = 4,
        prompt_ids=None,
    ):
        """Batched serving: compressed prefills + ONE batched decode scan
        (decode is weight-bandwidth-bound, so B sequences cost ~one
        sequence's wall-clock per step). Beyond the reference's surface — it
        is bsz==1 end to end (main.py:203).

        ``mode="planned_batch"`` runs ALL the prefills as one lockstep-
        batched program pipeline too (engine.prefill_planned_batch); any
        other mode prefills per request (prefill is MXU-compute-bound, so
        sequential prefills cost the same FLOPs — batching them mainly
        saves dispatches).

        ``speculative=True`` (greedy only) decodes the batch by prompt-
        lookup draft-and-verify — each macro step verifies all B sequences'
        K candidate rows in one weight pass, same tokens as the plain
        batched greedy scan (runtime/spec_decode.py). ``prompt_ids``:
        optional list of per-request text token id lists seeding the lookup
        histories.

        Returns (list of per-request token lists, list of PrefillResults).
        """
        is_baseline = getattr(self.engine(), "mode", None) is not None
        if mode == "planned_batch" and self.ff is not None and not is_baseline:
            pn = inputs_list[0].patch_num
            assert all(i.patch_num == pn for i in inputs_list), \
                "one model family / vision geometry per batch"
            results = self.engine().prefill_planned_batch(
                [(i.input_embeds, i.patch_type, i.position_ids,
                  i.image_token_start, i.image_token_length) for i in inputs_list],
                patch_num=pn,
            )
        else:
            # dense (ff not applied) and baseline engines have no batched
            # prefill pipeline — prefill() per request keeps their dispatch.
            per_request_mode = "fused" if mode == "planned_batch" else mode
            results = [self.prefill(inp, mode=per_request_mode) for inp in inputs_list]
        if speculative:
            assert sampler is None, "speculative decoding is greedy-only"
            tokens = self.engine().generate_spec_batch(
                results, max_new_tokens, draft_len=draft_len,
                prompt_ids=prompt_ids, eos_token_id=eos_token_id,
            )
        else:
            tokens = self.engine().generate_batch(
                results, max_new_tokens, eos_token_id=eos_token_id,
                sampler=sampler, rng_key=rng_key
            )
        return tokens, results

    def serving_loop(self, **kwargs):
        """Continuous-batching scheduler bound to this model's engine
        (runtime/serving.ServingLoop): submit `ServeRequest`s, call
        ``run()``. Requests admit mid-flight into freed slots; every
        request's tokens equal its solo greedy run. Kwargs: max_slots,
        max_new_cap, chunk_steps, draft_len (speculative serving),
        prefix_cap, prefill_mode."""
        from .runtime.serving import ServingLoop

        return ServingLoop(self.engine(), **kwargs)


def get_token_type(family: str):
    """Return the family's prompt-metadata builder — the reference's
    ``get_token_type`` (interface.py:140-166) installs only the embedding
    hooks (patch-type derivation) without enabling compression; here that
    surface is simply the adapter module's ``build_prefill_inputs``."""
    import importlib

    if family not in FAMILIES:
        raise NotImplementedError(f"Model family not supported: {family}")
    mod = importlib.import_module(
        f".models.adapters.{FAMILIES[family].adapter_module}", __package__
    )
    return mod


def apply_framefusion(model, cost, similarity_lower_bound, ratio_lower_bound):
    """Configure FrameFusion on a model — the reference's public entry point
    (interface.py:47), same signature and knob semantics.

    Accepts a ``FrameFusionModel`` and returns a new one with compression
    enabled (the reference mutates the HF model in place; here the model is a
    frozen value and the compressed prefill is a property of the returned
    object). A second call simply installs fresh compression state, like the
    reference's re-application pattern (example_llava.py:133-136).
    """
    if not isinstance(model, FrameFusionModel):
        raise NotImplementedError(
            f"Model not supported\nModel type: {type(model)}\n"
            "apply_framefusion expects a framefusion_tpu FrameFusionModel; "
            "load one via framefusion_tpu.weights + FrameFusionModel(family=...)."
        )
    spec = model.spec
    ff = FrameFusionConfig(
        cost=cost,
        similarity_lower_bound=similarity_lower_bound,
        ratio_lower_bound=ratio_lower_bound,
        num_importance_queries=spec.num_importance_queries,
    )
    return dataclasses.replace(model, ff=ff, _engine=None)
