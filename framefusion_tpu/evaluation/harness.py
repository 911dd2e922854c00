"""Accuracy-regression harness: dense vs compressed on the same prompts.

The reference measures quality by inserting ``apply_framefusion`` into the
external lmms-eval evaluator (reference README.md:128-154). This module gives
(a) the same integration shim for lmms-eval when it is installed
(``LmmsEvalAdapter``) and (b) an offline harness that works without any
external dataset service: for a list of prefill inputs it reports per-prompt
agreement between dense and compressed generations plus logit-level deltas —
the structured-JSON observability SURVEY.md §5 calls for.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class PromptEval:
    prompt_tokens: int
    final_tokens: int
    vision_token_reduction: float
    greedy_match_len: int  # longest common greedy prefix dense-vs-compressed
    greedy_agreement: float  # fraction of identical positions
    top1_logit_match: bool
    kl_first_token: float


def evaluate_pair(dense_model, ff_model, inputs, max_new_tokens: int = 16) -> PromptEval:
    dense_res = dense_model.prefill(inputs)
    ff_res = ff_model.prefill(inputs)
    dense_tokens = dense_model.engine().generate_greedy(dense_res, max_new_tokens)
    ff_tokens = ff_model.engine().generate_greedy(ff_res, max_new_tokens)

    match_len = 0
    for a, b in zip(dense_tokens, ff_tokens):
        if a != b:
            break
        match_len += 1
    agree = float(np.mean([a == b for a, b in zip(dense_tokens, ff_tokens)]))

    p = jax.nn.log_softmax(jnp.asarray(dense_res.logits, jnp.float32))
    q = jax.nn.log_softmax(jnp.asarray(ff_res.logits, jnp.float32))
    kl = float(jnp.sum(jnp.exp(p) * (p - q)))

    t = ff_res.telemetry
    return PromptEval(
        prompt_tokens=inputs.input_embeds.shape[0],
        final_tokens=ff_res.valid_len,
        vision_token_reduction=t.vision_token_reduction if t else 0.0,
        greedy_match_len=match_len,
        greedy_agreement=agree,
        top1_logit_match=int(jnp.argmax(p)) == int(jnp.argmax(q)),
        kl_first_token=kl,
    )


def run_offline_eval(dense_model, ff_model, prompt_list, max_new_tokens: int = 16) -> dict:
    """Evaluate a list of PrefillInputs; returns an aggregate JSON-able dict."""
    rows = [evaluate_pair(dense_model, ff_model, p, max_new_tokens) for p in prompt_list]
    return {
        "num_prompts": len(rows),
        "mean_reduction": float(np.mean([r.vision_token_reduction for r in rows])),
        "mean_greedy_agreement": float(np.mean([r.greedy_agreement for r in rows])),
        "first_token_match_rate": float(np.mean([r.top1_logit_match for r in rows])),
        "mean_kl_first_token": float(np.mean([r.kl_first_token for r in rows])),
        "per_prompt": [dataclasses.asdict(r) for r in rows],
    }


class LmmsEvalAdapter:
    """lmms-eval model shim (reference README.md:128-154 integration point).

    Register with lmms-eval as a custom model; ``generate_until`` runs the
    compressed prefill + greedy decode through the adapter's tokenizer and
    vision frontend. Requires the external ``lmms_eval`` package plus real
    checkpoints — both absent in offline environments, hence the import gate.
    """

    def __init__(self, model, tokenizer, frontend, max_new_tokens: int = 64):
        try:
            import lmms_eval  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "lmms-eval is not installed; use run_offline_eval for the "
                "self-contained accuracy harness"
            ) from e
        self.model = model
        self.tokenizer = tokenizer
        self.frontend = frontend
        self.max_new_tokens = max_new_tokens

    def generate_until(self, requests):
        """lmms-eval ``generate_until`` contract: each request is an
        ``Instance`` whose ``args`` tuple carries (context, gen_kwargs,
        doc_to_visual, doc_id, task, split); gen_kwargs may set
        ``max_new_tokens`` and ``until`` stop strings. Returns one decoded
        string per request, truncated at the first stop string."""
        outputs = []
        for req in requests:
            args = getattr(req, "args", None)
            gen_kwargs = {}
            if isinstance(args, (tuple, list)) and len(args) > 1 and isinstance(args[1], dict):
                gen_kwargs = args[1]
            inputs = self.frontend(req)
            max_new = int(gen_kwargs.get("max_new_tokens", self.max_new_tokens))
            tokens, _ = self.model.generate(
                inputs, max_new,
                eos_token_id=getattr(self.tokenizer, "eos_token_id", None),
            )
            text = self.tokenizer.decode(tokens)
            until = gen_kwargs.get("until") or []
            if isinstance(until, str):  # the contract allows a bare string
                until = [until]
            for stop in until:
                cut = text.find(stop)
                if cut >= 0:
                    text = text[:cut]
            outputs.append(text)
        return outputs
