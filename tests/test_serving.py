"""Continuous-batching serving loop (runtime/serving.py).

Oracle: every request's tokens must be EXACTLY its solo ``generate_greedy``
output, no matter when the request was admitted, which slot it rode, whether
the scratch region was compacted under it, or whether speculation was on.
(The reference serves bsz==1 end to end — main.py:203 — so the oracle is our
own solo loop.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framefusion_tpu.config import FrameFusionConfig, tiny_llm_config
from framefusion_tpu.models import qwen2
from framefusion_tpu.models.adapters.common import PrefillInputs
from framefusion_tpu.runtime.engine import CompressionEngine
from framefusion_tpu.runtime.serving import ServeRequest, ServingLoop

from test_engine import build_inputs


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_llm_config(num_layers=4)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.75, ratio_lower_bound=0.05,
                           schedule_num_layers=4, bucket=32)
    return cfg, params, ff


def _inputs(seed, coherent=0.35):
    h, pt, pos, img_start, n_img = build_inputs(seed=seed, coherent=coherent)
    return PrefillInputs(input_embeds=h, patch_type=pt, position_ids=pos,
                         patch_num=6, image_token_start=img_start,
                         image_token_length=n_img)


def _solo(engine, inp, max_new, eos=None):
    res = engine.prefill(inp.input_embeds, inp.patch_type, inp.position_ids,
                         patch_num=inp.patch_num,
                         image_token_start=inp.image_token_start,
                         image_token_length=inp.image_token_length)
    return engine.generate_greedy(res, max_new, eos_token_id=eos)


class TestServingParity:
    def test_staggered_fifo_matches_solo(self, setup):
        """5 requests with different lengths through 2 slots: later requests
        are admitted mid-stream into retired slots; every output matches the
        solo run."""
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        loop = ServingLoop(engine, max_slots=2, max_new_cap=24, chunk_steps=4,
                           prefix_cap=256)
        reqs = [(seed, new) for seed, new in
                [(0, 16), (1, 9), (2, 24), (3, 5), (4, 13)]]
        ids = [loop.submit(ServeRequest(_inputs(s), max_new_tokens=n))
               for s, n in reqs]
        results = loop.run()
        assert set(results) == set(ids)
        for rid, (seed, n) in zip(ids, reqs):
            want = _solo(engine, _inputs(seed), n)
            assert results[rid].tokens == want, (rid, seed)
        # the later requests really were admitted mid-stream
        assert max(r.admitted_step for r in results.values()) > 0

    def test_compaction_preserves_tokens(self, setup):
        """A scratch region smaller than the total decode length forces
        mid-request compaction; tokens must be unchanged."""
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        loop = ServingLoop(engine, max_slots=2, max_new_cap=48, chunk_steps=2,
                           prefix_cap=256)
        ids = [loop.submit(ServeRequest(_inputs(s), max_new_tokens=48))
               for s in (0, 1)]
        results = loop.run()
        assert loop.compactions >= 1, "test did not exercise compaction"
        for rid, seed in zip(ids, (0, 1)):
            assert results[rid].tokens == _solo(engine, _inputs(seed), 48)

    def test_eos_mid_chunk(self, setup):
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        solo = _solo(engine, _inputs(0), 16)
        eos = solo[6]  # cut mid-sequence, mid-chunk
        loop = ServingLoop(engine, max_slots=2, max_new_cap=16, chunk_steps=4,
                           prefix_cap=256)
        rid = loop.submit(ServeRequest(_inputs(0), max_new_tokens=16,
                                       eos_token_id=eos))
        results = loop.run()
        assert results[rid].tokens == solo[: solo.index(eos) + 1]

    def test_eos_at_admission_frees_slot_immediately(self, setup):
        """A request whose admission-seeded token 0 IS its eos must retire on
        its first chunk instead of silently decoding its whole budget (the
        in-chunk clamp only sees newly generated rows; _serve_chunk kills the
        slot in-graph before the first macro step). Observable: with one slot,
        the next queued request is admitted within the first couple of chunks,
        not after budget/chunk_steps of them."""
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        solo = _solo(engine, _inputs(0), 1)
        eos = solo[0]  # prefill argmax == eos
        loop = ServingLoop(engine, max_slots=1, max_new_cap=64, chunk_steps=2,
                           prefix_cap=256)
        rid0 = loop.submit(ServeRequest(_inputs(0), max_new_tokens=64,
                                        eos_token_id=eos))
        rid1 = loop.submit(ServeRequest(_inputs(1), max_new_tokens=6))
        results = loop.run()
        assert results[rid0].tokens == [eos]
        assert results[rid1].tokens == _solo(engine, _inputs(1), 6)
        assert results[rid1].admitted_step <= 2, (
            "eos-at-admission slot burned its budget before freeing the slot")

    def test_speculative_serving(self, setup):
        """draft_len>0: same tokens; with oracle histories the loop finishes
        in fewer chunks than plain serving needs."""
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        solos = [_solo(engine, _inputs(s), 24) for s in (0, 1)]
        loop = ServingLoop(engine, max_slots=2, max_new_cap=24, chunk_steps=4,
                           prefix_cap=256, draft_len=4)
        ids = [loop.submit(ServeRequest(_inputs(s), max_new_tokens=24,
                                        prompt_ids=np.asarray(solos[i], np.int32)))
               for i, s in enumerate((0, 1))]
        results = loop.run()
        for rid, want in zip(ids, solos):
            assert results[rid].tokens == want
        # 23 decode steps at ~5 tokens/pass -> well under the plain 6 chunks
        assert loop._chunk_idx <= 3, loop._chunk_idx

    def test_mrope_serving(self, setup):
        cfg1, params, _ = setup
        cfg = cfg1.replace(mrope_section=(4, 6, 6))
        ff = FrameFusionConfig(cost=0.4, similarity_lower_bound=0.75,
                               ratio_lower_bound=0.05, schedule_num_layers=4,
                               bucket=32, num_importance_queries=4)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")

        def inp(seed):
            h, pt, pos, img_start, n_img = build_inputs(seed=seed, coherent=0.35)
            return PrefillInputs(input_embeds=h, patch_type=pt,
                                 position_ids=np.tile(pos, (3, 1)), patch_num=6,
                                 image_token_start=img_start,
                                 image_token_length=n_img)

        loop = ServingLoop(engine, max_slots=2, max_new_cap=12, chunk_steps=3,
                           prefix_cap=256)
        ids = [loop.submit(ServeRequest(inp(s), max_new_tokens=12)) for s in (0, 2)]
        results = loop.run()
        for rid, seed in zip(ids, (0, 2)):
            assert results[rid].tokens == _solo(engine, inp(seed), 12)

    def test_auto_prefill_rides_plan_history(self, setup):
        """prefill_mode='auto' composes with serving: the first admission of
        a geometry rides the measured cold-start planner (similarity
        pre-pass, one scalar sync — VERDICT r3 item 1) and seeds
        PlanHistory; later same-geometry admissions ride the sync-free
        planned path — with tokens still equal to the solo runs."""
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        loop = ServingLoop(engine, max_slots=1, max_new_cap=8, chunk_steps=4,
                           prefix_cap=256, prefill_mode="auto")
        ids = [loop.submit(ServeRequest(_inputs(s), max_new_tokens=8))
               for s in (0, 1, 2)]
        results = loop.run()
        modes = [results[i].prefill_mode for i in ids]
        assert all(m == "planned" for m in modes), modes
        for rid, seed in zip(ids, (0, 1, 2)):
            assert results[rid].tokens == _solo(engine, _inputs(seed), 8)

    def test_moe_serving(self):
        """The chunk program's sparse-MLP path (row-exact expert gather in
        verify_step_batch) serves MoE stacks with solo parity."""
        from framefusion_tpu.config import tiny_moe_llm_config

        cfg = tiny_moe_llm_config(num_layers=4)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(1))
        ff = FrameFusionConfig(cost=0.5, similarity_lower_bound=0.8,
                               ratio_lower_bound=0.05, schedule_num_layers=4, bucket=32)
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        loop = ServingLoop(engine, max_slots=2, max_new_cap=10, chunk_steps=3,
                           prefix_cap=256, draft_len=3)
        ids = [loop.submit(ServeRequest(_inputs(s), max_new_tokens=10)) for s in (0, 3)]
        results = loop.run()
        for rid, seed in zip(ids, (0, 3)):
            assert results[rid].tokens == _solo(engine, _inputs(seed), 10)

    def test_single_token_request(self, setup):
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        loop = ServingLoop(engine, max_slots=2, max_new_cap=16, chunk_steps=4,
                           prefix_cap=256)
        rid1 = loop.submit(ServeRequest(_inputs(0), max_new_tokens=1))
        rid2 = loop.submit(ServeRequest(_inputs(1), max_new_tokens=8))
        results = loop.run()
        assert results[rid1].tokens == _solo(engine, _inputs(0), 1)
        assert results[rid2].tokens == _solo(engine, _inputs(1), 8)

    def test_fuzz_schedules_vs_solo(self, setup):
        """Randomized schedules: slot counts, chunk lengths, budgets, eos
        cuts and speculation all vary; every request must still reproduce
        its solo greedy tokens exactly."""
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        rng = np.random.default_rng(7)
        solo_cache = {}

        def solo(seed, n, eos=None):
            if (seed, n) not in solo_cache:
                solo_cache[(seed, n)] = _solo(engine, _inputs(seed), n)
            toks = solo_cache[(seed, n)]
            if eos is not None and eos in toks:
                toks = toks[: toks.index(eos) + 1]
            return toks

        for trial in range(3):
            n_req = int(rng.integers(3, 6))
            slots = int(rng.integers(1, 4))
            chunk = int(rng.integers(2, 6))
            draft = int(rng.choice([0, 3]))
            loop = ServingLoop(engine, max_slots=slots, max_new_cap=20,
                               chunk_steps=chunk, draft_len=draft,
                               prefix_cap=256)
            plan = []
            for _ in range(n_req):
                seed = int(rng.integers(0, 50))
                budget = int(rng.integers(1, 21))
                base = solo(seed, budget)
                eos = None
                if budget > 4 and rng.random() < 0.4:
                    # sometimes the very first token: the slot then decodes
                    # its budget and is truncated at retirement (no host
                    # sync at admission reads token 0)
                    lo = 0 if rng.random() < 0.25 else 2
                    eos = base[int(rng.integers(lo, budget - 1))]
                rid = loop.submit(ServeRequest(_inputs(seed), max_new_tokens=budget,
                                               eos_token_id=eos))
                plan.append((rid, seed, budget, eos))
            results = loop.run()
            for rid, seed, budget, eos in plan:
                want = solo(seed, budget, eos)
                assert results[rid].tokens == want, (trial, rid, seed, budget, eos,
                                                     slots, chunk, draft)

    def test_budget_cap_enforced(self, setup):
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        loop = ServingLoop(engine, max_slots=1, max_new_cap=8, chunk_steps=4)
        with pytest.raises(AssertionError):
            loop.submit(ServeRequest(_inputs(0), max_new_tokens=9))

    def test_interface_serving_loop(self, setup):
        """FrameFusionModel.serving_loop() binds the scheduler to the
        model's engine — the public serving entry point."""
        from framefusion_tpu.interface import FrameFusionModel, apply_framefusion

        cfg, params, ff = setup
        model = apply_framefusion(
            FrameFusionModel(family="llava_video", cfg=cfg, params=params,
                             attn_impl="einsum"),
            cost=ff.cost, similarity_lower_bound=ff.similarity_lower_bound,
            ratio_lower_bound=ff.ratio_lower_bound,
        )
        model.ff = model.ff.replace(schedule_num_layers=cfg.num_layers, bucket=32)
        loop = model.serving_loop(max_slots=2, max_new_cap=10, chunk_steps=3,
                                  prefix_cap=128)
        rid = loop.submit(ServeRequest(_inputs(0), max_new_tokens=10))
        results = loop.run()
        want = model.engine().generate_greedy(
            model.prefill(_inputs(0)), 10)
        assert results[rid].tokens == want

    def test_prefix_capacity_enforced(self, setup):
        """Compaction invariant: a prefix that could not coexist with a full
        budget below region_start must be REJECTED at admission — admitting
        it would let compaction spill committed rows into the scratch region
        (silent KV corruption, caught by review)."""
        cfg, params, ff = setup
        engine = CompressionEngine(params, cfg, ff, attn_impl="einsum")
        # prefix_cap=32 with max_new_cap=32: region_start=64, so any prefix
        # over 32 rows must raise. The synthetic prompt is ~100 tokens and
        # stays > 32 even after compression.
        loop = ServingLoop(engine, max_slots=1, max_new_cap=32, chunk_steps=4,
                           prefix_cap=32)
        loop.submit(ServeRequest(_inputs(0), max_new_tokens=8))
        with pytest.raises(AssertionError, match="prefix capacity"):
            loop.run()


class TestSplitPool:
    """Physically split slot pools (``tail_pool=(P, tail_prefix_cap)``):
    layers >= P live in a smaller array sized for their post-compression
    prefixes instead of the phase layers' full-prompt requirement. Pure
    allocation change — every token must match the uniform-pool loop (and
    hence solo greedy) bit for bit on CPU, including across compactions
    and under speculation."""

    def _engine(self, setup):
        cfg, params, ff = setup
        return CompressionEngine(params, cfg, ff, attn_impl="einsum")

    def _tail_cap(self, engine):
        """Pick (P, tail_prefix_cap) from a sample admission's per-layer
        lengths — the caller contract the serving scripts use."""
        inp = _inputs(0)
        res = engine.prefill(inp.input_embeds, inp.patch_type, inp.position_ids,
                             patch_num=inp.patch_num,
                             image_token_start=inp.image_token_start,
                             image_token_length=inp.image_token_length)
        lens = [c[2] for c in res.layer_caches]
        p = next(l for l in range(1, len(lens)) if lens[l] < lens[0])
        return p, max(lens[p:]) + 8

    def test_split_matches_uniform_across_compactions(self, setup):
        engine = self._engine(setup)
        p, cap = self._tail_cap(engine)
        reqs = [(s, n) for s, n in [(0, 48), (1, 40), (2, 48), (3, 25), (4, 33)]]

        def serve(**kw):
            # max_new_cap 48 with chunk_steps 2 leaves a scratch region far
            # smaller than the decode total -> compaction fires mid-request.
            loop = ServingLoop(engine, max_slots=2, max_new_cap=48,
                               chunk_steps=2, prefix_cap=256, **kw)
            ids = [loop.submit(ServeRequest(_inputs(s), max_new_tokens=n))
                   for s, n in reqs]
            res = loop.run()
            return [res[i].tokens for i in ids], loop

        uni, lu = serve()
        split, ls = serve(tail_pool=(p, cap))
        assert ls.phys is not None and ls.k_tail.shape[2] < ls.k_pool.shape[2]
        assert ls.k_pool.shape[0] == p
        assert lu.compactions >= 1 and ls.compactions >= 1, (
            lu.compactions, ls.compactions)
        assert split == uni
        # and the uniform loop itself is solo-exact (existing contract)
        for toks, (s, n) in zip(uni, reqs):
            assert toks == _solo(engine, _inputs(s), n)

    def test_split_speculative(self, setup):
        engine = self._engine(setup)
        p, cap = self._tail_cap(engine)
        solos = [_solo(engine, _inputs(s), 24) for s in (0, 1, 2)]
        loop = ServingLoop(engine, max_slots=2, max_new_cap=24, chunk_steps=4,
                           prefix_cap=256, draft_len=4, tail_pool=(p, cap))
        ids = [loop.submit(ServeRequest(_inputs(s), max_new_tokens=24,
                                        prompt_ids=np.asarray(solos[i], np.int32)))
               for i, s in enumerate((0, 1, 2))]
        results = loop.run()
        for rid, want in zip(ids, solos):
            assert results[rid].tokens == want

    def test_split_admission_capacity_enforced(self, setup):
        """A request whose layer>=P caches exceed the tail pool's prefix
        capacity must be rejected at admission — the same compaction
        invariant the head region enforces, at the smaller capacity."""
        engine = self._engine(setup)
        loop = ServingLoop(engine, max_slots=1, max_new_cap=32, chunk_steps=4,
                           prefix_cap=256, tail_pool=(1, 8))
        loop.submit(ServeRequest(_inputs(0), max_new_tokens=8))
        with pytest.raises(AssertionError, match="tail pool capacity"):
            loop.run()

    def test_degenerate_split_falls_back_to_uniform(self, setup):
        """tail_prefix_cap >= prefix_cap saves nothing — the loop quietly
        keeps the uniform layout (phys None, no tail arrays)."""
        engine = self._engine(setup)
        loop = ServingLoop(engine, max_slots=1, max_new_cap=8, chunk_steps=4,
                           prefix_cap=128, tail_pool=(2, 256))
        assert loop.phys is None and loop.k_tail is None
        rid = loop.submit(ServeRequest(_inputs(0), max_new_tokens=8))
        results = loop.run()
        assert results[rid].tokens == _solo(engine, _inputs(0), 8)
