"""Continuous batching: admit new requests into retired batch slots.

Beyond the reference (strict batch=1 eval) and beyond ``generate_batch``
(grouped static batches): a fixed pool of B head-packed slots decodes
together, and whenever a slot's sequence hits EOS (or max_new_tokens) at a
chunk boundary, the next pending request is prefilled and inserted into
that slot while the other slots keep decoding — the production serving
pattern (vLLM-style continuous batching, expressed with static shapes).

TPU-shaped constraints and how they are honored:
- One compiled program: all requests share a compile key (same padded
  s_full and reducer spec), the batched decode program is keyed on the
  constant pool size B (head packing folds B into the KV-head axis), and
  admission happens only at chunk boundaries — no recompiles mid-stream.
- Fixed-slot tail writes: decode step ``s`` writes tail slot ``s`` for
  every row (models/qwen2.py decode_layers). A request admitted at global
  step ``s0`` therefore starts writing at tail slot ``s0`` and must not
  attend to slots < s0 (its inserted cache has zeros there, and zero K/V
  still takes softmax mass): the per-row ``tail_min`` mask handles this.
- The decode tail is a shared ring of MAX_DECODE slots indexed by the
  global step, so a request is admitted only when the remaining tail can
  hold its full max_new_tokens. When no pending request fits and every
  live slot finished, the global step resets and a fresh wave starts —
  the only idle moment; mid-wave retirements refill immediately.
- Prefix-cached admission (PrefixRequest): a request may be a SUFFIX
  extension of a per-video prefix cache (prefix_prefill) — admission then
  costs one build_extend dispatch (~tens of tokens) instead of a full
  prefill, and slots may hold questions of DIFFERENT videos concurrently
  (per-slot prefixes). Mixing Request and PrefixRequest in one pool works
  as long as all cache buffers share one compile key.

The full pool family (every composition token-exactness-tested):
- serve_continuous:            chunked greedy decode, full/prefix admission
- serve_continuous_spec:       every dispatch VERIFIES k candidates/slot
  (batched speculative decoding; acceptance-mask ring, mid-wave admission)
- serve_continuous_paged:      paged prefix pool (each distinct video's
  prefix ONCE in HBM — optionally int8 — read once per step)
- serve_continuous_paged_spec: all levers at once
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..models import qwen2
from ..models.config import DecoderConfig
from .generate import (
    MAX_DECODE,
    GenerateConfig,
    PrefixPool,
    build_decode_chunk_batch,
    build_extend,
    build_paged_admit,
    build_paged_decode_chunk,
    build_paged_verify_chunk,
    build_prefill,
    build_prefix_pool,
    build_verify_chunk_batch,
    ngram_draft,
    _batched_like,
    _cascade_tail_like,
    _reset_mask_row,
)
from .reducer import ReducerSpec


@dataclasses.dataclass
class Request:
    """One serving request: pre-assembled multimodal embeds (same layout as
    generate(): [1, s_full, D]) plus its prompt geometry."""

    rid: object
    embeds: jnp.ndarray
    valid_len: int
    video_start: int
    pos_base: int | None = None
    t_valid: int | None = None


@dataclasses.dataclass
class PrefixRequest:
    """A serving request that extends an existing per-video prefix cache
    (prefix_prefill) instead of running a full prefill: admission costs one
    build_extend dispatch over the suffix tokens (~tens) rather than a
    25k-token prefill. Different slots may reference DIFFERENT videos'
    prefix caches — the pool interleaves questions across videos, so a hot
    video's questions don't serialize behind a cold one's prefill (the
    continuous-batching + prefix-caching composition). All prefix caches
    must share buffer shapes (one compile key, like Request.embeds)."""

    rid: object
    prefix_cache: object  # KVCache from prefix_prefill (shared per video)
    suffix_embeds: jnp.ndarray  # [1, s_sfx, D]
    suffix_valid: int


def serve_continuous(
    params,
    cfg: DecoderConfig,
    requests: list,
    spec,
    gen: GenerateConfig = GenerateConfig(),
    batch_slots: int = 4,
    impl: str = "xla",
    decode_chunk_size: int = 8,
):
    """Run ``requests`` (same compile key) through a continuously batched
    decode pool. Returns ({rid: token_ids}, stats dict). Token-level
    behavior matches per-sample generate() for every request (CPU-exact;
    on-TPU modulo argmax near-ties between batch sizes, as everywhere).
    """
    if not requests:
        return {}, {}
    if gen.max_new_tokens - 1 > MAX_DECODE:
        raise ValueError(
            f"max_new_tokens {gen.max_new_tokens} exceeds the decode tail "
            f"({MAX_DECODE + 1}) — no admission window could ever fit it"
        )
    b = batch_slots

    def _buf_len(r):
        if isinstance(r, PrefixRequest):
            # group-0 cache buffer is [Lg, 1, s_full + MAX_DECODE, KV, hd]
            return r.prefix_cache.ks[0].shape[2] - MAX_DECODE
        return r.embeds.shape[1]

    s_full = _buf_len(requests[0])
    spec_key = spec if (spec is None or isinstance(spec, ReducerSpec)) else tuple(spec)
    prefill = build_prefill(cfg, spec_key, s_full, impl)
    chunk = max(1, min(decode_chunk_size, gen.max_new_tokens))
    insert_row, decode_chunk = build_decode_chunk_batch(
        cfg, spec_key, chunk, tuple(gen.eos_token_ids), cfg.num_kv_heads
    )

    pending = list(requests)
    results: dict = {}
    # per-slot host state
    slot_rid = [None] * b
    slot_ids: list = [None] * b
    admit_step = np.zeros(b, np.int32)
    cache = None
    token = jnp.zeros((b,), jnp.int32)
    done = jnp.ones((b,), bool)  # empty slots are frozen
    step = 0
    t_start = time.perf_counter()
    n_prefills = n_extends = n_chunks = 0

    def admit(i: int, req):
        nonlocal cache, token, n_prefills, n_extends
        if isinstance(req, PrefixRequest):
            extend = build_extend(cfg, spec_key, req.suffix_embeds.shape[1])
            logits, row = extend(
                params, req.prefix_cache, req.suffix_embeds,
                jnp.int32(req.suffix_valid),
            )
            n_extends += 1
        else:
            p = None
            pb = None if req.pos_base is None else jnp.int32(req.pos_base)
            tv = None if req.t_valid is None else jnp.int32(req.t_valid)
            logits, row = prefill(
                params, req.embeds, jnp.int32(req.valid_len),
                jnp.int32(req.video_start), p, pb, tv,
            )
            n_prefills += 1
        if cache is None:
            cache_init = jax.tree.map(lambda x: _batched_like(x, b), row)
        else:
            cache_init = cache
        new_cache = insert_row(cache_init, row, jnp.int32(i))
        first = int(jnp.argmax(logits, -1)[0])
        del logits, row
        slot_rid[i] = req.rid
        slot_ids[i] = [first]
        admit_step[i] = step
        token = token.at[i].set(first)
        return new_cache, first in gen.eos_token_ids

    def retire(i: int):
        results[slot_rid[i]] = slot_ids[i]
        slot_rid[i] = None
        slot_ids[i] = None

    for r in requests:
        if _buf_len(r) != s_full:
            raise ValueError(
                "continuous batching requires one compile key: all requests "
                f"must share s_full ({_buf_len(r)} != {s_full})"
            )

    while pending or any(r is not None for r in slot_rid):
        # retire rows finished by the last chunk (EOS or token budget), then
        # refill their slots in the same pass so they never idle a chunk
        d = np.array(done)  # writable copy (np.asarray of a jax array is RO)
        for i in range(b):
            if slot_rid[i] is not None and (
                len(slot_ids[i]) >= gen.max_new_tokens
                or slot_ids[i][-1] in gen.eos_token_ids
            ):
                retire(i)
                d[i] = True
        for i in range(b):
            if slot_rid[i] is None and pending and step + gen.max_new_tokens - 1 <= MAX_DECODE:
                cache, is_eos = admit(i, pending.pop(0))
                d[i] = is_eos
        done = jnp.asarray(d)

        live = [i for i in range(b) if slot_rid[i] is not None]
        if not live:
            # nothing fits the remaining tail: wave reset
            step = 0
            continue
        if step >= MAX_DECODE:  # safety: live rows always fit by admission rule
            raise RuntimeError("decode tail overrun")

        n_this = min(chunk, MAX_DECODE - step,
                     max(gen.max_new_tokens - len(slot_ids[i]) for i in live))
        token_d = jnp.asarray(token)
        token_d, cache, done, buf, n_run = decode_chunk(
            params, token_d, cache, jnp.int32(step), done, jnp.int32(n_this),
            jnp.asarray(admit_step),
        )
        token = token_d
        buf = np.asarray(buf)
        n_chunks += 1
        for i in live:
            for j in range(int(n_run)):
                if buf[i, j] >= 0 and len(slot_ids[i]) < gen.max_new_tokens:
                    slot_ids[i].append(int(buf[i, j]))
        step += int(n_run)

    stats = {
        "wall_s": time.perf_counter() - t_start,
        "n_requests": len(requests),
        "n_prefills": n_prefills,
        "n_extends": n_extends,
        "n_decode_chunks": n_chunks,
        "total_tokens": sum(len(v) for v in results.values()),
    }
    return results, stats


def serve_continuous_spec(
    params,
    cfg: DecoderConfig,
    requests: list,
    spec,
    gen: GenerateConfig = GenerateConfig(),
    batch_slots: int = 4,
    spec_decode_k: int = 4,
    impl: str = "xla",
    ring_dispatches: int = 0,
    draft_fn=None,
    histories: dict | None = None,
):
    """Continuous batching x batched speculative decoding: a pool of B
    head-packed slots where every dispatch VERIFIES spec_decode_k candidate
    tokens per slot (one weight read scores B*k tokens), and retired slots
    refill mid-wave. The fixed-slot dispatch layout of
    build_verify_chunk_batch (dispatch d writes tail slots [d*k, (d+1)*k),
    rejected slots hidden by per-row acceptance masks) extends to continuous
    admission naturally: a newly admitted slot's acceptance mask is reset,
    hiding ALL of the previous occupant's tail slots, and the causal verify
    window bounds reads to freshly written slots.

    ``requests`` may mix Request (full prefill admission) and PrefixRequest
    (suffix-extension admission) like serve_continuous. ``ring_dispatches``
    sizes the tail ring in dispatches (default 2*(max_new_tokens-1): worst
    case one accepted token per dispatch, with headroom so mid-wave
    admissions fit without waiting for a wave reset). ``histories`` maps
    rid -> prompt token ids to seed the drafter. Token-level behavior
    matches per-sample generate()/generate_from_prefix for every request
    (CPU-exact; on-TPU modulo argmax near-ties between program variants).
    Returns ({rid: token_ids}, stats)."""
    if not requests:
        return {}, {}
    b = batch_slots
    k, need, ring, tail_slots = _spec_ring(spec_decode_k, gen, ring_dispatches)

    def _buf_len(r):
        if isinstance(r, PrefixRequest):
            return r.prefix_cache.ks[0].shape[2] - MAX_DECODE
        return r.embeds.shape[1]

    s_full = _buf_len(requests[0])
    for r in requests:
        if _buf_len(r) != s_full:
            raise ValueError(
                "continuous batching requires one compile key: all requests "
                f"must share s_full ({_buf_len(r)} != {s_full})"
            )

    spec_key = spec if (spec is None or isinstance(spec, ReducerSpec)) else tuple(spec)
    prefill = build_prefill(cfg, spec_key, s_full, impl)
    init_row_buf, insert_row, update_mask, verify_chunk = build_verify_chunk_batch(
        cfg, spec_key, k, cfg.num_kv_heads, tail_slots
    )

    cache = None
    n_prefills = n_extends = 0

    def admit_impl(i: int, req) -> int:
        nonlocal cache, n_prefills, n_extends
        if isinstance(req, PrefixRequest):
            extend = build_extend(cfg, spec_key, req.suffix_embeds.shape[1])
            logits, row = extend(
                params, req.prefix_cache, req.suffix_embeds,
                jnp.int32(req.suffix_valid),
            )
            n_extends += 1
        else:
            pb = None if req.pos_base is None else jnp.int32(req.pos_base)
            tv = None if req.t_valid is None else jnp.int32(req.t_valid)
            logits, row = prefill(
                params, req.embeds, jnp.int32(req.valid_len),
                jnp.int32(req.video_start), None, pb, tv,
            )
            n_prefills += 1
        if cache is None:
            cache_init = jax.tree.map(lambda x: init_row_buf(x, b), row)
        else:
            cache_init = cache
        cache = insert_row(cache_init, row, jnp.int32(i))
        return int(jnp.argmax(logits, -1)[0])

    def verify_impl(feed, d, acc_counts, acc_mask):
        nonlocal cache
        preds, cache = verify_chunk(
            params, jnp.asarray(feed), cache, jnp.int32(d),
            jnp.asarray(acc_counts, jnp.int32), acc_mask,
        )
        return np.asarray(preds)

    results, stats = _continuous_spec_drive(
        requests, gen, b, k, ring, need, tail_slots, update_mask,
        admit_impl, verify_impl, draft_fn or ngram_draft, histories or {},
    )
    stats["n_prefills"] = n_prefills
    stats["n_extends"] = n_extends
    return results, stats


def _continuous_spec_drive(
    requests, gen: GenerateConfig, b: int, k: int, ring: int, need: int,
    tail_slots: int, update_mask, admit_impl, verify_impl, drafter, histories,
):
    """The shared continuous speculative pool driver (host-side wave/slot/
    acceptance bookkeeping), used by serve_continuous_spec (flat batched
    cache) and serve_continuous_paged_spec (paged prefix pool). The callers
    own their device state through the ``admit_impl(i, req) -> first_token``
    and ``verify_impl(feed [B, k], d, acc_counts, acc_mask) -> preds``
    closures; the driver owns slots, the dispatch ring, and the acceptance
    masks (resetting a slot's row at admission)."""
    reset_row = _reset_mask_row()
    pending = list(requests)
    results: dict = {}
    slot_rid = [None] * b
    slot_ids: list = [None] * b
    slot_hist: list = [None] * b
    done = [True] * b  # empty slots are frozen
    last_tok = np.zeros(b, np.int32)
    acc_counts = np.zeros(b, np.int64)
    acc_mask = jnp.zeros((b, tail_slots), bool)
    d = 0
    t_start = time.perf_counter()
    n_dispatches = n_drafted = n_hit = 0
    eos = set(gen.eos_token_ids)

    def admit(i: int, req):
        nonlocal acc_mask
        first = admit_impl(i, req)
        acc_mask = reset_row(acc_mask, jnp.int32(i))
        slot_rid[i] = req.rid
        slot_ids[i] = [first]
        slot_hist[i] = list(histories.get(req.rid, [])) + [first]
        acc_counts[i] = 0
        last_tok[i] = first
        return first in eos or gen.max_new_tokens <= 1

    def retire(i: int):
        results[slot_rid[i]] = slot_ids[i]
        slot_rid[i] = None
        slot_ids[i] = None
        slot_hist[i] = None

    while pending or any(r is not None for r in slot_rid):
        for i in range(b):
            if slot_rid[i] is not None and done[i]:
                retire(i)
        for i in range(b):
            if slot_rid[i] is None and pending and d + need <= ring:
                done[i] = admit(i, pending.pop(0))
        live = [i for i in range(b) if slot_rid[i] is not None]
        if not live:
            d = 0  # wave reset: reuse the ring (admission resets acc rows)
            continue
        if all(done[i] for i in live):
            continue  # retire-and-refill next pass
        if d >= ring:
            raise RuntimeError("verify ring overrun")

        feed = np.empty((b, k), np.int32)
        drafts = [None] * b
        for i in range(b):
            if slot_rid[i] is None or done[i]:
                feed[i] = last_tok[i]
                continue
            dr = [int(t) for t in drafter(slot_hist[i], k - 1)]
            drafts[i] = dr
            feed[i, 0] = last_tok[i]
            feed[i, 1:] = dr
        preds = verify_impl(feed, d, acc_counts, acc_mask)
        n_dispatches += 1

        window = np.zeros((b, k), bool)
        for i in live:
            if done[i]:
                continue
            a = 0
            while a < k - 1 and drafts[i][a] == int(preds[i, a]):
                a += 1
            n_drafted += k - 1
            n_hit += a
            e = 0
            for j in range(a + 1):
                t = int(preds[i, j])
                slot_ids[i].append(t)
                slot_hist[i].append(t)
                e += 1
                if t in eos or len(slot_ids[i]) >= gen.max_new_tokens:
                    done[i] = True
                    break
            window[i, :e] = True
            acc_counts[i] += e
            last_tok[i] = slot_ids[i][-1]
        acc_mask = update_mask(acc_mask, jnp.asarray(window), jnp.int32(d))
        d += 1

    stats = {
        "wall_s": time.perf_counter() - t_start,
        "n_requests": len(requests),
        "n_verify_dispatches": n_dispatches,
        "spec_drafted": n_drafted,
        "spec_accepted": n_hit,
        "total_tokens": sum(len(v) for v in results.values()),
    }
    return results, stats


def _spec_ring(spec_decode_k: int, gen: GenerateConfig, ring_dispatches: int):
    """(k, need, ring, tail_slots) sizing shared by the spec pools: worst
    case a request needs max_new_tokens-1 dispatches (one accepted token
    each); the default ring doubles that so mid-wave admissions fit."""
    k = max(2, min(spec_decode_k, MAX_DECODE))
    need = max(gen.max_new_tokens - 1, 1)
    ring = max(ring_dispatches, need) if ring_dispatches else 2 * need
    return k, need, ring, ring * k


def serve_continuous_paged_spec(
    params,
    cfg: DecoderConfig,
    pool: PrefixPool,
    requests: list,
    spec,
    gen: GenerateConfig = GenerateConfig(),
    batch_slots: int = 4,
    spec_decode_k: int = 4,
    ring_dispatches: int = 0,
    draft_fn=None,
    histories: dict | None = None,
):
    """ALL the serving levers in one pool: paged prefix caching (each
    distinct video's prefill lives once in HBM; admission is a ~tens-of-
    tokens extension straight into the slot tail), continuous batching
    (retired slots refill mid-wave), head-packed batching, and speculative
    decoding (every dispatch verifies k candidates per slot — one weight
    read + one read of each distinct page scores B*k tokens,
    build_paged_verify_chunk). Requests are PagedRequests against ``pool``.
    Token-exact vs per-sample generate_from_prefix for any drafter
    (CPU; on-TPU modulo argmax near-ties between program variants).
    Returns ({rid: token_ids}, stats)."""
    if not requests:
        return {}, {}
    b = batch_slots
    k, need, ring, tail_slots = _spec_ring(spec_decode_k, gen, ring_dispatches)
    s_sfx = requests[0].suffix_embeds.shape[1]
    for r in requests:
        if r.suffix_embeds.shape[1] != s_sfx:
            raise ValueError(
                "paged serving requires one compile key: all suffixes must "
                f"share s_sfx ({r.suffix_embeds.shape[1]} != {s_sfx})"
            )
        if not 0 <= r.page < pool.pos_base.shape[0]:
            raise ValueError(f"request {r.rid}: page {r.page} outside pool")

    spec_key = spec if (spec is None or isinstance(spec, ReducerSpec)) else tuple(spec)
    make_tail, update_mask, verify_chunk = build_paged_verify_chunk(
        cfg, spec_key, k, cfg.num_kv_heads, s_sfx, tail_slots
    )
    admit_fn = build_paged_admit(cfg, spec_key, s_sfx, cfg.num_kv_heads)
    tail = make_tail(pool, b)
    page = np.zeros(b, np.int32)
    n_extends = 0

    def admit_impl(i: int, req: PagedRequest) -> int:
        nonlocal tail, n_extends
        logits, tail = admit_fn(
            params, pool, jnp.int32(req.page), tail, req.suffix_embeds,
            jnp.int32(req.suffix_valid), jnp.int32(i),
        )
        page[i] = req.page
        n_extends += 1
        return int(jnp.argmax(logits, -1))

    def verify_impl(feed, d, acc_counts, acc_mask):
        nonlocal tail
        preds, tail = verify_chunk(
            params, jnp.asarray(feed), tail, pool, jnp.asarray(page),
            jnp.int32(d), jnp.asarray(acc_counts, jnp.int32), acc_mask,
        )
        return np.asarray(preds)

    results, stats = _continuous_spec_drive(
        requests, gen, b, k, ring, need, tail_slots, update_mask,
        admit_impl, verify_impl, draft_fn or ngram_draft, histories or {},
    )
    stats["n_extends"] = n_extends
    stats["n_pool_pages"] = int(pool.pos_base.shape[0])
    return results, stats


@dataclasses.dataclass
class PagedRequest:
    """A serving request that extends page ``page`` of a shared PrefixPool
    (build_prefix_pool): the pool holds each distinct video's prefix cache
    ONCE, so admission writes the suffix K/V straight into the slot's tail
    and decode reads each page once per step — cascade x continuous
    batching. All requests' suffixes must share one padded length s_sfx
    (one compile key)."""

    rid: object
    page: int
    suffix_embeds: jnp.ndarray  # [1, s_sfx, D]
    suffix_valid: int


def make_prefix_pool(cfg: DecoderConfig, spec, prefix_caches: list,
                     int8: bool = False) -> PrefixPool:
    """Stack per-video prefix caches (prefix_prefill) into a PrefixPool.
    OWNERSHIP TRANSFER: the list is consumed in place (entries become None
    as each page is inserted), so with no other references held by the
    caller, peak HBM stays ~one source cache above the pool instead of
    pool + all P sources (~2x). Callers that want to keep a source cache
    must copy the list reference-wise before calling. ``int8=True``
    quantizes pages at insert (half the pool HBM and prefix read traffic,
    2x page capacity; bounded approximation — build_prefix_pool)."""
    spec_key = spec if (spec is None or isinstance(spec, ReducerSpec)) else tuple(spec)
    n = len(prefix_caches)
    init_pool, insert_page = build_prefix_pool(cfg, spec_key, n, int8=int8)
    pool = init_pool(prefix_caches[0])
    for p in range(n):
        pool = insert_page(pool, prefix_caches[p], jnp.int32(p))
        prefix_caches[p] = None  # free the source before the next insert
    return pool


class PrefixPoolManager:
    """LRU page manager over a fixed-capacity PrefixPool — the prefix-cache
    MANAGER layer of production serving: videos map to pages, a miss
    prefills (caller-supplied) and inserts into the least-recently-used
    unpinned page (donated in-place overwrite, no copies), and repeated
    questions of a resident video cost zero prefills. The pool object
    identity changes on insert (donation) — always read ``mgr.pool``.

    Synchronous serving (serve once, then maybe insert) needs no pinning;
    ``pin``/``unpin`` exist for callers that interleave admission with an
    in-flight serve and must keep its referenced pages resident."""

    def __init__(self, cfg: DecoderConfig, spec, pages: int, int8: bool = False):
        self.cfg = cfg
        self.spec_key = (
            spec if (spec is None or isinstance(spec, ReducerSpec)) else tuple(spec)
        )
        self.capacity = pages
        self.int8 = int8
        self.pool: PrefixPool | None = None
        self._init_pool, self._insert_page = build_prefix_pool(
            cfg, self.spec_key, pages, int8=int8
        )
        self._vid_to_page: dict = {}
        self._page_to_vid: dict = {}
        self._clock = 0
        self._last_used: dict = {}
        self._pins: dict = {}
        self.n_hits = self.n_misses = self.n_evictions = 0

    def lookup(self, vid) -> int | None:
        """Page index of ``vid`` if resident (refreshes recency), else None."""
        page = self._vid_to_page.get(vid)
        if page is not None:
            self._clock += 1
            self._last_used[page] = self._clock
            self.n_hits += 1
        return page

    def get_page(self, vid, build_cache) -> int:
        """Resident page of ``vid``, or prefill via ``build_cache()`` (a
        prefix_prefill thunk; consumed by the insert) and place it, evicting
        the LRU unpinned page when full."""
        page = self.lookup(vid)
        if page is not None:
            return page
        self.n_misses += 1
        return self.insert(vid, build_cache())

    def insert(self, vid, prefix_cache) -> int:
        if vid in self._vid_to_page:
            raise ValueError(f"{vid!r} already resident")
        free = [p for p in range(self.capacity) if p not in self._page_to_vid]
        if free:
            page = free[0]
        else:
            candidates = [
                p for p in range(self.capacity) if not self._pins.get(p)
            ]
            if not candidates:
                raise RuntimeError("all pool pages are pinned")
            page = min(candidates, key=lambda p: self._last_used.get(p, -1))
            del self._vid_to_page[self._page_to_vid[page]]
            self.n_evictions += 1
        if self.pool is None:
            self.pool = self._init_pool(prefix_cache)
        self.pool = self._insert_page(self.pool, prefix_cache, jnp.int32(page))
        self._vid_to_page[vid] = page
        self._page_to_vid[page] = vid
        self._clock += 1
        self._last_used[page] = self._clock
        return page

    def pin(self, page: int):
        self._pins[page] = self._pins.get(page, 0) + 1

    def unpin(self, page: int):
        self._pins[page] = max(self._pins.get(page, 0) - 1, 0)

    def stats(self) -> dict:
        return {
            "capacity": self.capacity,
            "resident": len(self._vid_to_page),
            "hits": self.n_hits,
            "misses": self.n_misses,
            "evictions": self.n_evictions,
        }


def serve_continuous_paged(
    params,
    cfg: DecoderConfig,
    pool: PrefixPool,
    requests: list,
    spec,
    gen: GenerateConfig = GenerateConfig(),
    batch_slots: int = 4,
    decode_chunk_size: int = 8,
):
    """Continuous batching over a paged prefix pool: the three production
    serving levers composed — prefix caching (a question pays a ~tens-of-
    tokens admission, never a full prefill), continuous batching (retired
    slots refill mid-wave), and the cascade KV layout generalized to pages
    (each distinct video's prefix lives once in HBM and is read once per
    decode step however many slots reference it). Beyond the reference's
    strict batch=1 serving (eval_vidqa_by_feat_llavavideo.py:208). Requests
    of DIFFERENT videos interleave freely; admission order is FIFO.
    Returns ({rid: token_ids}, stats). Token-level behavior matches
    generate_from_prefix per request (CPU-exact; on-TPU modulo argmax
    near-ties between program variants, as everywhere)."""
    if not requests:
        return {}, {}
    if gen.max_new_tokens - 1 > MAX_DECODE:
        raise ValueError(
            f"max_new_tokens {gen.max_new_tokens} exceeds the decode tail "
            f"({MAX_DECODE + 1}) — no admission window could ever fit it"
        )
    b = batch_slots
    s_sfx = requests[0].suffix_embeds.shape[1]
    for r in requests:
        if r.suffix_embeds.shape[1] != s_sfx:
            raise ValueError(
                "paged serving requires one compile key: all suffixes must "
                f"share s_sfx ({r.suffix_embeds.shape[1]} != {s_sfx})"
            )
        if not 0 <= r.page < pool.pos_base.shape[0]:
            raise ValueError(f"request {r.rid}: page {r.page} outside pool")

    spec_key = spec if (spec is None or isinstance(spec, ReducerSpec)) else tuple(spec)
    chunk = max(1, min(decode_chunk_size, gen.max_new_tokens))
    admit_fn = build_paged_admit(cfg, spec_key, s_sfx, cfg.num_kv_heads)
    decode_chunk = build_paged_decode_chunk(
        cfg, spec_key, chunk, tuple(gen.eos_token_ids), cfg.num_kv_heads
    )

    pending = list(requests)
    results: dict = {}
    slot_rid = [None] * b
    slot_ids: list = [None] * b
    admit_step = np.zeros(b, np.int32)
    page = np.zeros(b, np.int32)
    tail = _cascade_tail_like(pool, b, s_sfx, dtype=cfg.dtype)
    token = jnp.zeros((b,), jnp.int32)
    done = jnp.ones((b,), bool)
    step = 0
    t_start = time.perf_counter()
    n_extends = n_chunks = 0

    def admit(i: int, req: PagedRequest):
        nonlocal tail, token, n_extends
        logits, tail = admit_fn(
            params, pool, jnp.int32(req.page), tail, req.suffix_embeds,
            jnp.int32(req.suffix_valid), jnp.int32(i),
        )
        n_extends += 1
        first = int(jnp.argmax(logits, -1))
        slot_rid[i] = req.rid
        slot_ids[i] = [first]
        admit_step[i] = step
        page[i] = req.page
        token = token.at[i].set(first)
        return first in gen.eos_token_ids

    def retire(i: int):
        results[slot_rid[i]] = slot_ids[i]
        slot_rid[i] = None
        slot_ids[i] = None

    while pending or any(r is not None for r in slot_rid):
        d = np.array(done)
        for i in range(b):
            if slot_rid[i] is not None and (
                len(slot_ids[i]) >= gen.max_new_tokens
                or slot_ids[i][-1] in gen.eos_token_ids
            ):
                retire(i)
                d[i] = True
        for i in range(b):
            if slot_rid[i] is None and pending and step + gen.max_new_tokens - 1 <= MAX_DECODE:
                d[i] = admit(i, pending.pop(0))
        done = jnp.asarray(d)

        live = [i for i in range(b) if slot_rid[i] is not None]
        if not live:
            step = 0
            continue
        if step >= MAX_DECODE:
            raise RuntimeError("decode tail overrun")

        n_this = min(chunk, MAX_DECODE - step,
                     max(gen.max_new_tokens - len(slot_ids[i]) for i in live))
        token, tail, done, buf, n_run = decode_chunk(
            params, jnp.asarray(token), tail, pool, jnp.asarray(page),
            jnp.int32(step), done, jnp.int32(n_this), jnp.asarray(admit_step),
        )
        buf = np.asarray(buf)
        n_chunks += 1
        for i in live:
            for j in range(int(n_run)):
                if buf[i, j] >= 0 and len(slot_ids[i]) < gen.max_new_tokens:
                    slot_ids[i].append(int(buf[i, j]))
        step += int(n_run)

    stats = {
        "wall_s": time.perf_counter() - t_start,
        "n_requests": len(requests),
        "n_pool_pages": int(pool.pos_base.shape[0]),
        "n_extends": n_extends,
        "n_decode_chunks": n_chunks,
        "total_tokens": sum(len(v) for v in results.values()),
    }
    return results, stats
