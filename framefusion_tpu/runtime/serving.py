"""Continuous-batching serving loop: slot-based scheduling over ONE static
decode program.

The reference serves one request end to end (bsz==1 asserted at
/root/reference/framefusion/main.py:203; its demo runs two fixed replicas,
script/demo/llava_video_compare.py). A production serving runtime needs
continuous batching — new requests join the running batch as others finish —
which on TPU must be expressed with STATIC shapes: XLA compiles one program
per (B, S_pool) geometry, so the batch is a fixed set of SLOTS and request
churn is state, not shape.

Design:

- **Slots.** ``max_slots`` fixed rows in batched KV pools
  ``(L, B, S_pool, Hk, hd)``. Per-slot state (emitted counts, budgets, eos
  ids, rotary bases, lookup histories) rides small device arrays; an
  ``active`` mask gates dead slots (their lanes compute garbage that is
  masked out — lockstep lanes are the TPU idiom, branching is not).
- **Chunked decode.** The loop decodes ``chunk_steps`` macro steps per
  dispatch (one jitted ``lax.while_loop``), then syncs ONCE to retire
  finished slots and admit queued requests. Admission cost (a compressed
  prefill) amortizes over the chunk; the chunk length trades scheduling
  latency against host-sync overhead.
- **Per-slot committed-row bitmaps.** Slots admitted mid-stream cannot share
  the plain batched loop's global ``write_pos + step`` validity rule
  (qwen2.decode_step_batch) — a fresh slot must not see earlier slots'
  decode rows. Each chunk step writes every slot's K rows at a COMMON
  offset (scatter-free, qwen2.verify_step_batch) and marks only the
  COMMITTED rows in a ``(B, S_pool)`` bitmap; rejected/dead rows stay
  invisible padding.
- **Region recycling.** Common-offset writes consume pool rows
  monotonically. When the scratch region runs low, ``_compact_pools`` packs
  every slot's live rows (ragged per-layer prefix + committed decode rows,
  order preserved) back into the prefix region with one argsort gather —
  rotary phases are baked into K at write time, so row motion is free — and
  resets the bitmap. The pool is sized so a compacted slot ALWAYS fits:
  ``S_pool = prefix_cap + max_new_cap + chunk region``.
- **Speculative serving.** ``draft_len > 0`` turns each chunk step into a
  prompt-lookup draft-and-verify macro step (runtime/spec_decode.py): all B
  slots' K candidate rows share one weight pass. Greedy parity is exact per
  request either way.

Every request's tokens are EXACTLY its solo ``generate_greedy`` output
(same fp caveat as the batched loops: (B,·) matmul reassociation can flip
argmax ties on-chip; parity is pinned on the CPU suite).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LLMConfig
from ..core.compact import bucket_length
from ..models import qwen2
from .engine import best_tail_split_batch
from .spec_decode import spec_macro_step

__all__ = ["ServeRequest", "ServingLoop"]


@dataclasses.dataclass
class ServeRequest:
    """One serving request: prefill inputs + decode contract."""

    inputs: object  # models.adapters.common.PrefillInputs
    max_new_tokens: int = 64
    eos_token_id: Optional[int] = None
    prompt_ids: Optional[object] = None  # text ids seeding the lookup drafter


@dataclasses.dataclass
class ServeResult:
    request_id: int
    tokens: list
    prefill_mode: str
    admitted_step: int  # chunk index at admission (scheduling introspection)
    # wall-clock telemetry (host perf_counter seconds); queue_s = submit ->
    # admission, serve_s = admission -> retirement. Chunked scheduling makes
    # both quantized to the chunk cadence — that's the real serving latency.
    queue_s: float = 0.0
    serve_s: float = 0.0


def _first_eos_clamp(t, n_new, eos_ids, kq):
    """Clamp per-slot commit counts at the first eos among the committed
    rows; returns (n_new, hit)."""
    row = jnp.arange(kq, dtype=jnp.int32)[None]
    hit_rows = (t == eos_ids[:, None]) & (row < n_new[:, None]) & (eos_ids[:, None] >= 0)
    any_hit = jnp.any(hit_rows, axis=1)
    first = jnp.argmax(hit_rows, axis=1).astype(jnp.int32)
    n_new = jnp.where(any_hit, first + 1, n_new)
    return n_new, any_hit


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "chunk", "pos_dims", "draft_len", "tail_split", "phys"),
    donate_argnums=(1, 2, 3, 4),
)
def _serve_chunk(
    params,
    k_pool,
    v_pool,
    k_tail,
    v_tail,
    cache_lens,
    dmask,
    out,
    last_tok,
    emitted,
    active,
    budgets,
    eos_ids,
    pos_bases,
    hist,
    hist_len,
    cursor,
    *,
    cfg: LLMConfig,
    chunk: int,
    pos_dims: int,
    draft_len: int,
    tail_split=None,
    phys=None,
):
    """``chunk`` macro steps over all slots as ONE program (single dispatch,
    zero host syncs). Each step verifies every slot's K = draft_len+1
    candidate rows in one weight pass (K=1 degrades to plain batched greedy
    decode with per-slot validity bitmaps); per-slot budget and eos clamp
    the committed count in-graph so a slot never runs past its contract.
    Stops early when no slot is active. Returns the advanced state."""
    kq = draft_len + 1
    s_pool = k_pool.shape[2]
    pos_iota = jnp.arange(s_pool, dtype=jnp.int32)
    upd_row = jax.vmap(lambda buf, val, at: jax.lax.dynamic_update_slice(buf, val, (at,)))

    # A slot whose admission-seeded token 0 (the prefill argmax — committed
    # on-device, never read back) is already its eos must not decode its
    # budget: the in-loop eos clamp only inspects newly generated rows, so
    # kill it here, in-graph, before the first macro step. Mid-stream slots
    # never reach this state active (a generated eos deactivates via
    # eos_hit), so this only fires on admission-seeded eos.
    active = active & ~((last_tok == eos_ids) & (eos_ids >= 0))

    state = (jnp.int32(0), out, last_tok, emitted, active, hist, hist_len,
             k_pool, v_pool, k_tail, v_tail, dmask, cursor)

    def cond(st):
        return (st[0] < chunk) & jnp.any(st[4])

    def body(st):
        (s, out, last, emitted, active, hist, hl, k_pool, v_pool, k_tail,
         v_tail, dmask, cursor) = st
        t, a, _, k_pool, v_pool, k_tail, v_tail = spec_macro_step(
            params, last, emitted, hist, hl, pos_bases,
            k_pool, v_pool, cache_lens, dmask, cursor,
            cfg=cfg, pos_dims=pos_dims, draft_len=draft_len, tail_split=tail_split,
            k_tail=k_tail, v_tail=v_tail, phys=phys,
        )
        n_new = jnp.minimum(a + 1, budgets - emitted)  # budget clamp
        n_new, eos_hit = _first_eos_clamp(t, n_new, eos_ids, kq)
        n_new = jnp.where(active, n_new, 0)
        out = upd_row(out, t, emitted)
        hist = upd_row(hist, t, hl)
        dmask = dmask | (
            (pos_iota[None, :] >= cursor) & (pos_iota[None, :] < cursor + n_new[:, None])
        )
        emitted = emitted + n_new
        active = active & ~eos_hit & (emitted < budgets)
        last = jnp.where(
            n_new > 0,
            jnp.take_along_axis(t, jnp.maximum(n_new - 1, 0)[:, None], axis=1)[:, 0],
            last,
        )
        return (s + 1, out, last, emitted, active, hist, hl + n_new,
                k_pool, v_pool, k_tail, v_tail, dmask, cursor + kq)

    st = jax.lax.while_loop(cond, body, state)
    (_, out, last, emitted, active, hist, hl, k_pool, v_pool, k_tail, v_tail,
     dmask, cursor) = st
    return (out, last, emitted, active, hist, hl, k_pool, v_pool, k_tail,
            v_tail, dmask, cursor)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _splice_slot(k_pool, v_pool, k_one, v_one, slot):
    """Write one sequence's assembled caches into its slot IN PLACE (pools
    donated — an un-donated op-level update would copy the whole batched
    pool twice per admission, ~GBs of HBM traffic at 7B serving geometry)."""
    idx = (jnp.int32(0), slot, jnp.int32(0), jnp.int32(0), jnp.int32(0))
    return (
        jax.lax.dynamic_update_slice(k_pool, k_one[:, None], idx),
        jax.lax.dynamic_update_slice(v_pool, v_one[:, None], idx),
    )


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _compact_pools(k_pool, v_pool, cache_lens, dmask, region_start):
    """Pack each slot's live rows back into the prefix region.

    Live = the ragged per-layer prefix ``[0, cache_lens[l, b])`` plus the
    slot's COMMITTED decode rows (``dmask``); both keep their order, dead
    rows sink to the tail. Rotary phases are already applied to the stored
    K rows, so attention is invariant to row position — compaction is pure
    data movement (one argsort + gather per pool). Returns
    (k_pool, v_pool, new cache_lens, cleared dmask).
    """
    l, b, s = k_pool.shape[:3]
    pos = jnp.arange(s, dtype=jnp.int32)
    prefix = pos[None, None, :] < cache_lens[:, :, None]  # (L,B,S)
    committed = (dmask & (pos[None, :] >= region_start))[None, :, :]  # (1,B,S)
    committed = jnp.broadcast_to(committed, (l, b, s))
    keys = jnp.where(prefix, pos[None, None], jnp.where(committed, s + pos[None, None], 2 * s + pos[None, None]))
    order = jnp.argsort(keys, axis=-1)
    k_pool = jnp.take_along_axis(k_pool, order[..., None, None], axis=2)
    v_pool = jnp.take_along_axis(v_pool, order[..., None, None], axis=2)
    n_committed = jnp.sum(dmask & (pos[None, :] >= region_start), axis=1).astype(jnp.int32)  # (B,)
    return k_pool, v_pool, cache_lens + n_committed[None, :], jnp.zeros_like(dmask)


class ServingLoop:
    """Continuous-batching scheduler over one CompressionEngine.

    Usage::

        loop = ServingLoop(engine, max_slots=4, max_new_cap=64)
        ids = [loop.submit(ServeRequest(inputs, max_new_tokens=32)) for ...]
        results = loop.run()          # drain queue + slots
        results[ids[0]].tokens

    ``submit`` only queues; all device work happens in ``run`` (or
    ``step()``, one chunk at a time). Requests are admitted FIFO into free
    slots, each via the engine's own solo prefill (``prefill_mode``, e.g.
    "auto" rides PlanHistory); their tokens are exactly the solo
    ``generate_greedy`` output.

    ``draft_len > 0`` serves speculatively: same tokens, fewer weight
    passes per request when outputs echo the prompt/history.

    ``tail_pool=(P, tail_prefix_cap)`` physically splits the slot pools:
    layers >= P (post-compression — they never hold the raw prompt) get a
    small array sized for ``tail_prefix_cap`` prefix rows instead of the
    full ``prefix_cap`` every layer pays in the uniform layout. Identical
    tokens (it allocates exactly the rows the ``tail_split`` read view
    already proved dead); ~L/P-fold less pool HBM at long-video geometry,
    which is what clears the 64-frame B=8 memory wall. Admission asserts
    each request's layer>=P cache lengths fit ``tail_prefix_cap``.
    """

    def __init__(
        self,
        engine,
        max_slots: int = 4,
        max_new_cap: int = 64,
        chunk_steps: int = 8,
        draft_len: int = 0,
        prefix_cap: Optional[int] = None,
        prefill_mode: str = "fused",
        seed_cap: int = 256,
        tail_pool: Optional[tuple] = None,
    ):
        self.engine = engine
        cfg = engine.cfg
        self.cfg = cfg
        self.b = max_slots
        self.chunk = chunk_steps
        self.draft_len = draft_len
        self.kq = draft_len + 1
        self.max_new_cap = max_new_cap
        self.prefill_mode = prefill_mode
        self.seed_cap = seed_cap
        self.pos_dims = 3 if cfg.mrope_section is not None else 1
        # Region layout: [prefix_cap + max_new_cap) holds compacted live
        # rows (worst case: longest prefix + full budget all committed);
        # the scratch tail holds one chunk of common-offset writes.
        self.prefix_cap = prefix_cap or 2048
        self.region_start = bucket_length(self.prefix_cap + max_new_cap, engine.ff.bucket)
        self.scratch = self.chunk * self.kq
        self.s_pool = self.region_start + bucket_length(self.scratch, engine.ff.bucket)

        # Physically split pools (``tail_pool=(P, tail_prefix_cap)``): layers
        # >= P hold their slots in a SMALLER array whose prefix region covers
        # only ``tail_prefix_cap + max_new_cap`` rows (post-compression
        # layers never see the raw prompt length — reference layer order:
        # compression events fire in the first few decoder layers,
        # /root/reference/framefusion/main.py:40-140 — so sizing every layer
        # at the phase layers' full-prompt requirement wastes the dominant
        # share of pool HBM at long-video geometry; the uniform pool is what
        # walled B=8 at 64 frames, SERVING_r05.json). The math is identical
        # to the ``tail_split`` read VIEW — the rows the view skips are
        # simply never allocated (qwen2.verify_step_batch ``phys=``).
        # Admission asserts each request's layer->=P caches fit, mirroring
        # the head prefix_cap contract.
        self.tail_layers = 0
        self.tail_prefix_cap = None
        self.phys = None
        if tail_pool is not None:
            p, tail_prefix_cap = tail_pool
            assert 0 < p < cfg.num_layers, tail_pool
            tail_rs = bucket_length(tail_prefix_cap + max_new_cap, engine.ff.bucket)
            if tail_rs < self.region_start:  # degenerate split saves nothing
                self.tail_layers = int(p)
                self.tail_prefix_cap = int(tail_prefix_cap)
                self.tail_rs = tail_rs
                self.s_tail = tail_rs + (self.s_pool - self.region_start)
                self.phys = (int(p), int(tail_rs), int(self.region_start))

        head_layers = self.tail_layers or cfg.num_layers
        shape = (head_layers, self.b, self.s_pool, cfg.num_kv_heads, cfg.head_dim_)
        self.k_pool = jnp.zeros(shape, cfg.dtype)
        self.v_pool = jnp.zeros_like(self.k_pool)
        self.k_tail = self.v_tail = None
        if self.phys is not None:
            tshape = (cfg.num_layers - self.tail_layers, self.b, self.s_tail,
                      cfg.num_kv_heads, cfg.head_dim_)
            self.k_tail = jnp.zeros(tshape, cfg.dtype)
            self.v_tail = jnp.zeros_like(self.k_tail)
        self.cache_lens = jnp.zeros((cfg.num_layers, self.b), jnp.int32)
        self.dmask = jnp.zeros((self.b, self.s_pool), bool)
        self.cursor = jnp.int32(self.region_start)
        hist_cap = seed_cap + max_new_cap + self.kq + 1
        self.hist = jnp.zeros((self.b, hist_cap), jnp.int32)
        self.hist_len = jnp.zeros((self.b,), jnp.int32)
        self.out = jnp.zeros((self.b, max_new_cap + self.kq), jnp.int32)
        self.last_tok = jnp.zeros((self.b,), jnp.int32)
        self.emitted = np.zeros((self.b,), np.int32)
        self.active = np.zeros((self.b,), bool)
        self.budgets = np.zeros((self.b,), np.int32)
        self.eos_ids = np.full((self.b,), -1, np.int32)
        self.pos_bases = np.zeros((self.b,), np.int32)

        self._queue: list = []
        self._slot_req = [None] * self.b  # request id occupying each slot
        # Per-slot per-layer prefix lengths AT ADMISSION (host ints): the
        # chunk program's tail-split bound. A slot's ragged prefix can grow
        # past this only by compaction folding committed rows in — bounded
        # by max_new_cap — so admit_len + max_new_cap is a standing upper
        # bound needing no device read. Retired slots keep their entry until
        # a new admission overwrites the slot (their dead rows are still
        # inside the pool view).
        self._admit_lens = [[0] * cfg.num_layers for _ in range(self.b)]
        self._slot_mode = ["fused"] * self.b  # executor that served the prefill
        self._admitted_at = [0] * self.b
        self._slot_times = [(0.0, 0.0)] * self.b  # (queue_s, admitted perf_counter)
        self._results: dict = {}
        self._next_id = 0
        self._chunk_idx = 0
        # Held tail split (hysteresis): tail_split is a STATIC jit arg, so
        # recomputing the optimum every chunk would recompile _serve_chunk
        # whenever an admission shifts the per-layer max. Bounds change
        # ONLY at admissions, so _admit marks the split stale and step()
        # recomputes it once there — coverage stays sound by construction
        # and a shrinking admission adopts a tighter view.
        self._tail_split = None
        self._tail_split_stale = True
        self.compactions = 0  # introspection: times the scratch region recycled

    # -- request lifecycle --------------------------------------------------

    def submit(self, request: ServeRequest) -> int:
        assert request.max_new_tokens <= self.max_new_cap, (
            f"max_new_tokens {request.max_new_tokens} exceeds the loop's "
            f"max_new_cap {self.max_new_cap}")
        rid = self._next_id
        self._next_id += 1
        self._queue.append((rid, request, time.perf_counter()))
        return rid

    def _admit(self, slot: int, rid: int, request: ServeRequest,
               submitted_at: float):
        eng = self.engine
        inp = request.inputs
        result = eng.prefill(
            inp.input_embeds, inp.patch_type, inp.position_ids,
            patch_num=inp.patch_num, image_token_start=inp.image_token_start,
            image_token_length=inp.image_token_length, mode=self.prefill_mode,
        )
        assert result.pos_dims == self.pos_dims, "rope layout mismatch"
        max_prefix = max(c[2] for c in result.layer_caches)
        # Compaction invariant: prefix + committed rows (<= max_new_cap) must
        # always fit below region_start, or a compacted slot's live rows
        # would spill into the scratch region and be overwritten by the next
        # chunk's common-offset writes (silent KV corruption).
        prefix_limit = self.region_start - self.max_new_cap
        assert max_prefix <= prefix_limit, (
            f"prefix {max_prefix} exceeds prefix capacity {prefix_limit} "
            f"(= region_start {self.region_start} - max_new_cap "
            f"{self.max_new_cap}); raise prefix_cap")
        k_one, v_one, lens_one = eng.make_decode_state(result, 0, s_pool=self.s_pool)
        if self.phys is None:
            self.k_pool, self.v_pool = _splice_slot(
                self.k_pool, self.v_pool, k_one, v_one, jnp.int32(slot))
        else:
            # Same compaction invariant as the head region, at the tail
            # pool's smaller prefix capacity.
            p = self.tail_layers
            tail_prefix = max(c[2] for c in result.layer_caches[p:])
            tail_limit = self.tail_rs - self.max_new_cap
            assert tail_prefix <= tail_limit, (
                f"layer>={p} prefix {tail_prefix} exceeds tail pool capacity "
                f"{tail_limit} (= tail region {self.tail_rs} - max_new_cap "
                f"{self.max_new_cap}); raise tail_pool's tail_prefix_cap or "
                f"lower P")
            self.k_pool, self.v_pool = _splice_slot(
                self.k_pool, self.v_pool, k_one[:p], v_one[:p], jnp.int32(slot))
            # Rows [0, s_tail) of the full-S layout are the prefix plus dead
            # padding — exactly the tail pool's slot content (its decode
            # region starts empty; dmask rows for this slot reset below).
            self.k_tail, self.v_tail = _splice_slot(
                self.k_tail, self.v_tail, k_one[p:, :self.s_tail],
                v_one[p:, :self.s_tail], jnp.int32(slot))
        self.cache_lens = self.cache_lens.at[:, slot].set(lens_one)
        self.dmask = self.dmask.at[slot].set(False)
        # Token 0 stays ON DEVICE: a host argmax read here would add one
        # device->host round-trip per admission (up to ~1.3 s on the relay,
        # DEVNOTES) to the inter-chunk gap. A request whose token 0 happens
        # to be its eos decodes its full budget and is truncated at
        # retirement — same tokens, bounded waste, no sync.
        tok0 = jnp.argmax(result.logits).astype(jnp.int32)
        self.out = self.out.at[slot].set(0).at[slot, 0].set(tok0)
        self.last_tok = self.last_tok.at[slot].set(tok0)
        pids = np.asarray(request.prompt_ids, np.int32).reshape(-1) if request.prompt_ids is not None else np.zeros((0,), np.int32)
        pids = pids[-self.seed_cap:]
        seed = np.zeros((self.hist.shape[1],), np.int32)
        seed[: len(pids)] = pids
        self.hist = self.hist.at[slot].set(jnp.asarray(seed)).at[slot, len(pids)].set(tok0)
        self.hist_len = self.hist_len.at[slot].set(len(pids) + 1)
        self.emitted[slot] = 1
        self.active[slot] = request.max_new_tokens > 1
        self.budgets[slot] = request.max_new_tokens
        self.eos_ids[slot] = -1 if request.eos_token_id is None else request.eos_token_id
        self.pos_bases[slot] = result.decode_pos_base
        self._admit_lens[slot] = [c[2] for c in result.layer_caches]
        # Admission is the ONLY event that changes the per-layer bounds, so
        # the held tail split is recomputed exactly here (next step()): a
        # growing admission keeps coverage sound, a shrinking one adopts a
        # tighter view. Recompile cadence is unchanged — the split program
        # still only changes at admissions.
        self._tail_split_stale = True
        self._slot_req[slot] = rid
        self._slot_mode[slot] = result.mode
        self._admitted_at[slot] = self._chunk_idx
        now = time.perf_counter()
        self._slot_times[slot] = (now - submitted_at, now)

    def _retire(self, slot: int, emitted_row: np.ndarray, out_rows: np.ndarray):
        rid = self._slot_req[slot]
        n = int(emitted_row)
        toks = [int(x) for x in out_rows[:n]]
        eos = int(self.eos_ids[slot])
        if eos >= 0 and eos in toks:
            toks = toks[: toks.index(eos) + 1]
        queue_s, admitted_at = self._slot_times[slot]
        self._results[rid] = ServeResult(
            request_id=rid, tokens=toks, prefill_mode=self._slot_mode[slot],
            admitted_step=self._admitted_at[slot],
            queue_s=queue_s, serve_s=time.perf_counter() - admitted_at,
        )
        self._slot_req[slot] = None
        self.active[slot] = False

    # -- scheduling ----------------------------------------------------------

    def _fill_slots(self):
        for slot in range(self.b):
            if self._slot_req[slot] is None and self._queue:
                rid, req, submitted_at = self._queue.pop(0)
                self._admit(slot, rid, req, submitted_at)
                # Single-token request: retire immediately, free the slot.
                if not self.active[slot] and self._slot_req[slot] is not None:
                    self._retire(slot, self.emitted[slot], np.asarray(self.out[slot]))

    def step(self):
        """Admit + one decode chunk + retire. Returns True if work remains."""
        self._fill_slots()
        if not self.active.any():
            return bool(self._queue)
        # Recycle the scratch region when the next chunk wouldn't fit.
        if int(self.cursor) + self.scratch > self.s_pool:
            if self.phys is None:
                self.k_pool, self.v_pool, self.cache_lens, self.dmask = _compact_pools(
                    self.k_pool, self.v_pool, self.cache_lens, self.dmask,
                    jnp.int32(self.region_start),
                )
            else:
                # Compact each physical pool in its own coordinates: the
                # committed decode rows [region_start, S_pool) sit at
                # [tail_rs, S_tail) in the tail pool, row for row.
                p = self.tail_layers
                self.k_pool, self.v_pool, cl_head, _ = _compact_pools(
                    self.k_pool, self.v_pool, self.cache_lens[:p], self.dmask,
                    jnp.int32(self.region_start),
                )
                dmask_tail = jnp.zeros((self.b, self.s_tail), bool)
                dmask_tail = jax.lax.dynamic_update_slice(
                    dmask_tail, self.dmask[:, self.region_start:],
                    (0, self.tail_rs))
                self.k_tail, self.v_tail, cl_tail, _ = _compact_pools(
                    self.k_tail, self.v_tail, self.cache_lens[p:], dmask_tail,
                    jnp.int32(self.tail_rs),
                )
                self.cache_lens = jnp.concatenate([cl_head, cl_tail], axis=0)
                self.dmask = jnp.zeros_like(self.dmask)
            self.cursor = jnp.int32(self.region_start)
            self.compactions += 1
        if self.phys is not None:
            split = None  # the physical split IS the narrow read
        else:
            if self._tail_split_stale:
                bounds = [
                    [n + self.max_new_cap for n in lens] for lens in self._admit_lens
                ]
                self._tail_split = best_tail_split_batch(
                    bounds, self.s_pool, self.region_start, self.engine.ff.bucket)
                self._tail_split_stale = False
            split = self._tail_split
        (self.out, self.last_tok, emitted, active, self.hist, self.hist_len,
         self.k_pool, self.v_pool, self.k_tail, self.v_tail, self.dmask,
         self.cursor) = _serve_chunk(
            self.engine.params, self.k_pool, self.v_pool, self.k_tail,
            self.v_tail, self.cache_lens,
            self.dmask, self.out, self.last_tok,
            jnp.asarray(self.emitted), jnp.asarray(self.active),
            jnp.asarray(self.budgets), jnp.asarray(self.eos_ids),
            jnp.asarray(self.pos_bases), self.hist, self.hist_len, self.cursor,
            cfg=self.cfg, chunk=self.chunk, pos_dims=self.pos_dims,
            draft_len=self.draft_len, tail_split=split, phys=self.phys,
        )
        self._chunk_idx += 1
        # ONE host sync per chunk: emitted/active (+ out rows for retirees).
        emitted = np.asarray(emitted)
        active_now = np.asarray(active)
        out_host = None
        for slot in range(self.b):
            if self._slot_req[slot] is not None and self.active[slot] and not active_now[slot]:
                if out_host is None:
                    out_host = np.asarray(self.out)
                self.emitted[slot] = emitted[slot]
                self._retire(slot, emitted[slot], out_host[slot])
        self.emitted = emitted.copy()
        self.active = np.asarray([
            bool(active_now[s]) and self._slot_req[s] is not None for s in range(self.b)
        ])
        return bool(self._queue) or self.active.any()

    def run(self, max_chunks: int = 10_000) -> dict:
        """Drain the queue and all slots; returns {request_id: ServeResult}."""
        for _ in range(max_chunks):
            if not self.step():
                break
        assert not self._queue and not self.active.any(), "serving loop did not drain"
        return self._results
