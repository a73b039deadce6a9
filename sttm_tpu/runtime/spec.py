"""Speculative decoding: drafters, verify steps, batched verify.

Split from runtime/generate.py. Decode is weight-bandwidth-bound and the
MXU is idle at M=1, so multi-token verify is near-free (k=8 costs 1.27x one
step, CLAUDE.md); every emitted token is the model's own argmax — drafters
(n-gram prompt-lookup, layer-skip self-drafting) set only the speed.
"""

from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models import qwen2
from ..models.config import DecoderConfig
from .common import (
    MAX_DECODE,
    GenerateConfig,
    _group_bounds,
    _normalize_specs,
)

@functools.lru_cache(maxsize=16)
def build_verify_step(cfg: DecoderConfig, spec, k: int):
    """Speculative-decode verify step: score ``k`` candidate tokens in ONE
    dispatch. (params, tokens [k], cache, step) -> (logits [k, V] fp32,
    cache). Feeding [last_accepted, d_1, .., d_{k-1}] writes their K/V into
    tail slots step..step+k-1 and returns next-token logits after each —
    logits[j] scores draft d_{j+1} (greedy acceptance in generate()).

    Rationale: decode is weight-bandwidth-bound and the MXU is idle at
    batch 1 (GAPS.md #3), so verifying k tokens costs ~the HBM traffic of
    one plain step; accepted drafts amortize the weight read. Rejected
    tail slots are never visible (attention bounds reads at the current
    write position) and are simply overwritten by the next dispatch.
    """
    specs = _normalize_specs(spec)
    bounds = _group_bounds(cfg, specs)

    def fn(params, tokens, cache, step):
        return _verify_tokens(params, tokens, cache, step, bounds, cfg, k)

    return jax.jit(fn, donate_argnums=(2,))

def _verify_tokens(params, tokens, cache, step, bounds, cfg, k):
    """Multi-token verify body shared by build_verify_step and
    build_selfspec_step: score k tokens, write their K/V into tail slots
    step..step+k-1. An int8 cache (kv_int8, cache.k_scales set) verifies
    over int8 K/V reads — the draft window quantizes at its write slots
    exactly like the per-step path, so acceptance decisions match."""
    kv_int8 = cache.k_scales is not None
    layers = params["layers"]
    x = qwen2.embed_tokens(params, tokens, cfg)[None]  # [1, k, D]
    pos = (cache.pos_base + step + jnp.arange(k)).astype(jnp.int32)  # [k]
    if cfg.mrope_section:  # all three M-RoPE rows advance together
        pos = jnp.broadcast_to(pos[None], (3, k))
    cos, sin = qwen2.rope_cos_sin(cfg, pos)
    new_ks, new_vs, new_ksc, new_vsc = [], [], [], []
    for gi, (lo, hi) in enumerate(bounds):
        s_c = cache.ks[gi].shape[2]
        tail_start = s_c - MAX_DECODE
        out = qwen2.decode_layers(
            layers, lo, hi, x, cos, sin, cache.ks[gi], cache.vs[gi],
            cache.lens[gi], step, tail_start, cfg,
            cache_ksc=None if not kv_int8 else cache.k_scales[gi],
            cache_vsc=None if not kv_int8 else cache.v_scales[gi],
        )
        if kv_int8:
            x, ck, cv, ksc, vsc, _ = out
            new_ksc.append(ksc)
            new_vsc.append(vsc)
        else:
            x, ck, cv, _ = out
        new_ks.append(ck)
        new_vs.append(cv)
    h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
    logits = qwen2.lm_head(params, cfg, h)[0]  # [k, V]
    new_cache = dataclasses.replace(
        cache, ks=tuple(new_ks), vs=tuple(new_vs),
        k_scales=tuple(new_ksc) if kv_int8 else None,
        v_scales=tuple(new_vsc) if kv_int8 else None,
    )
    return logits, new_cache

@functools.lru_cache(maxsize=8)
def build_selfspec_step(cfg: DecoderConfig, spec, k: int, exit_layer: int):
    """Self-speculative decode: draft k-1 tokens through the first
    ``exit_layer`` layers only (early exit via the final norm + lm_head),
    then verify all k in the SAME dispatch — a training-free drafter that,
    unlike prompt-lookup (ngram_draft), needs no repeated token history.
    Layer-skip drafting in the LayerSkip / Draft-and-Verify family of
    self-speculative methods; greedy verify acceptance keeps any drafter
    token-exact, so ``exit_layer`` only sets the acceptance rate, never
    correctness.

    Cost model: the draft scan re-reads the first E of L layers' weights
    per drafted token, so one dispatch costs ~(1 + (k-1)·E/L) plain steps
    of HBM traffic vs the accepted+1 tokens it can emit.

    (params, token [1], cache, step) -> (out [2k-1] int32, cache) where
    out = argmax-preds [k] ++ drafts [k-1] (one small host fetch per cycle).
    Draft-phase K/V writes for layers < E land in the same tail slots the
    verify pass then rewrites with identical values (same inputs through
    the same layers), so the cache ends exactly as build_verify_step
    leaves it; rejected slots are handled identically (never visible past
    the next write bound).
    """
    specs = _normalize_specs(spec)
    bounds = _group_bounds(cfg, specs)
    e = exit_layer
    if not 0 < e < cfg.num_layers:
        raise ValueError(f"exit_layer must be in (0, {cfg.num_layers})")

    def fn(params, token, cache, step):
        layers = params["layers"]
        kv_int8 = cache.k_scales is not None

        def body(carry, j):
            cur, ks, vs, kscs, vscs = carry
            x = qwen2.embed_tokens(params, cur, cfg)[:, None, :]  # [1, 1, D]
            pos = (cache.pos_base + step + j)[None].astype(jnp.int32)
            if cfg.mrope_section:
                pos = jnp.broadcast_to(pos, (3, 1))
            cos, sin = qwen2.rope_cos_sin(cfg, pos)
            ks, vs = list(ks), list(vs)
            kscs, vscs = list(kscs), list(vscs)
            for gi, (lo, hi) in enumerate(bounds):
                if lo >= e:
                    break
                s_c = ks[gi].shape[2]
                out = qwen2.decode_layers(
                    layers, lo, min(hi, e), x, cos, sin, ks[gi], vs[gi],
                    cache.lens[gi], step + j, s_c - MAX_DECODE, cfg,
                    cache_ksc=kscs[gi] if kv_int8 else None,
                    cache_vsc=vscs[gi] if kv_int8 else None,
                )
                if kv_int8:
                    x, ck, cv, kscs[gi], vscs[gi], _ = out
                else:
                    x, ck, cv, _ = out
                ks[gi], vs[gi] = ck, cv
            h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
            logits = qwen2.lm_head(params, cfg, h)[:, 0]
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (nxt, tuple(ks), tuple(vs), tuple(kscs), tuple(vscs)), nxt[0]

        none_tup = (None,) * len(cache.ks)
        (_, ks, vs, kscs, vscs), drafts = jax.lax.scan(
            body,
            (token, cache.ks, cache.vs,
             cache.k_scales if kv_int8 else none_tup,
             cache.v_scales if kv_int8 else none_tup),
            jnp.arange(k - 1, dtype=jnp.int32),
        )
        cache = dataclasses.replace(
            cache, ks=ks, vs=vs,
            k_scales=kscs if kv_int8 else None,
            v_scales=vscs if kv_int8 else None,
        )
        feed = jnp.concatenate([token, drafts])
        logits, new_cache = _verify_tokens(params, feed, cache, step, bounds, cfg, k)
        # argmax on device, one small fetchable array [2k-1] = preds ++
        # drafts: the caller needs exactly these ints, and a single host
        # fetch per cycle matters under ~27 ms/dispatch tunnels
        preds = jnp.argmax(logits, -1).astype(jnp.int32)
        return jnp.concatenate([preds, drafts]), new_cache

    return jax.jit(fn, donate_argnums=(2,))

def ngram_draft(ids: list, n: int, max_ngram: int = 3) -> list:
    """Training-free drafter: longest-suffix n-gram lookup over the token
    history (prompt-lookup decoding, Saxon/PLD-style). Finds the most recent
    earlier occurrence of the current suffix (longest first) and proposes
    the tokens that followed it; pads with the last token if short. The
    verify step makes any drafter token-exact, so a weak drafter only costs
    acceptance rate, never correctness. ``ids`` may include prompt token
    ids followed by generated ids (the harness passes both; generate()
    alone has only embeddings for the prompt, so it drafts from the
    generated history)."""
    if n <= 0:
        return []
    out: list = []
    for g in range(min(max_ngram, len(ids) - 1), 0, -1):
        if len(ids) <= g:
            continue
        suffix = ids[-g:]
        # most recent earlier occurrence
        for st in range(len(ids) - g - 1, -1, -1):
            if ids[st : st + g] == suffix:
                out = ids[st + g : st + g + n]
                break
        if out:
            break
    while len(out) < n:
        out.append(out[-1] if out else ids[-1])
    return out[:n]

def _make_update_mask(k: int):
    """Jitted acceptance-mask window write shared by the verify builders:
    mark dispatch d's slots [d*k, (d+1)*k) with the per-row window."""
    return jax.jit(
        lambda m, window, d: jax.lax.dynamic_update_slice(m, window, (0, d * k)),
        donate_argnums=(0,),
    )

def _verify_pos_tail(cfg: DecoderConfig, pos_base, acc_counts, k: int, d,
                     tail_slots: int, acc_mask):
    """Shared verify-dispatch scaffolding: per-row candidate positions
    (pos_base + accepted count + j; all three M-RoPE rows advance together)
    and the visible-tail mask = accepted slots + the current/future window
    (the causal bound to <= write_slot + j per query row is applied inside
    the attention)."""
    b = pos_base.shape[0]
    pos = ((pos_base + acc_counts)[:, None] + jnp.arange(k)[None]).astype(jnp.int32)
    if cfg.mrope_section:
        pos = jnp.broadcast_to(pos[:, None, :], (b, 3, k))
    cos, sin = jax.vmap(lambda p: qwen2.rope_cos_sin(cfg, p))(pos)
    step_idx = d * k
    rel = jnp.arange(tail_slots)
    tail_vis = acc_mask | (rel[None, :] >= step_idx)  # [B, tail_slots]
    return cos, sin, step_idx, tail_vis

@functools.lru_cache(maxsize=8)
def build_verify_chunk_batch(cfg: DecoderConfig, spec, k: int, kvh: int, tail_slots: int):
    """Cached builders for BATCHED greedy speculative decoding — the two
    strongest measured serving levers composed: head-packed batching (one
    weight read per step for B rows) x multi-token verify (one weight read
    scores k tokens), so a dispatch scores B*k candidate tokens for ~one
    weight read.

    Slot layout: the single-sample verify reuses rejected tail slots by
    advancing the write position by the per-dispatch acceptance — impossible
    per-row under head packing, where every row shares ONE write slot (the
    fixed-slot DUS is what keeps batched decode at the bandwidth floor,
    decode_layers). Instead, dispatch ``d`` always writes its k tokens at
    tail slots [d*k, (d+1)*k): rejected slots are never overwritten, just
    hidden from later dispatches by a per-row ACCEPTANCE MASK
    (acc_mask [B, tail_slots], host-updated after each dispatch). The tail
    is therefore sized k*max_new_tokens (worst case: one accepted token per
    dispatch) — a few hundred extra slots of KV buffer, trivial vs S_p.

    Returns (init_row_buf, insert_row, update_mask, verify_chunk):
      init_row_buf(leaf, b): zero batched buffer with the EXTENDED tail.
      insert_row(buf_tree, row_tree, i): pack one prefill/extension row
        (its MAX_DECODE tail is unused zeros) at KV-head offset i*kvh.
      update_mask(acc_mask, window [B, k] bool, d): mark dispatch d's
        accepted slots.
      verify_chunk(params, tokens [B, k], cache, d, acc_counts [B],
        acc_mask) -> (preds [B, k] int32, cache): preds[r, j] = argmax next
        token after tokens[r, j]; row r's feed is
        [last_accepted_r, draft_1..draft_{k-1}].
    """
    specs = _normalize_specs(spec)
    bounds = _group_bounds(cfg, specs)

    def init_row_buf(x, b: int):
        x = jnp.asarray(x)
        if x.ndim >= 2:  # [Lg, 1, S_main + MAX_DECODE, KV, hd]
            s_ext = x.shape[2] - MAX_DECODE + tail_slots
            return jnp.zeros(
                x.shape[:2] + (s_ext, b * x.shape[3]) + x.shape[4:], x.dtype
            )
        return jnp.zeros((b,), x.dtype)

    def _row_insert(buf, x, i):
        x = jnp.asarray(x)
        if x.ndim >= 2:  # KV [Lg, 1, S, KV, hd] / kv_int8 scales [Lg, 1, S, KV]
            if x.shape[2] > buf.shape[2]:
                # tail_slots < MAX_DECODE: drop the row's unused zero tail
                x = jax.lax.slice_in_dim(x, 0, buf.shape[2], axis=2)
            idx = (0, 0, 0, i * kvh) + (0,) * (x.ndim - 4)
            return jax.lax.dynamic_update_slice(buf, x, idx)
        return jax.lax.dynamic_update_index_in_dim(buf, x, i, 0)

    insert_row = jax.jit(
        lambda buf_tree, row_tree, i: jax.tree.map(
            lambda buf, x: _row_insert(buf, x, i), buf_tree, row_tree
        ),
        donate_argnums=(0,),
    )

    update_mask = _make_update_mask(k)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def verify_chunk(params, tokens, cache, d, acc_counts, acc_mask):
        kv_int8 = cache.k_scales is not None
        layers = params["layers"]
        b = tokens.shape[0]
        x = qwen2.embed_tokens(params, tokens, cfg)  # [B, k, D]
        cos, sin, step_idx, tail_vis = _verify_pos_tail(
            cfg, cache.pos_base, acc_counts, k, d, tail_slots, acc_mask
        )
        new_ks, new_vs, new_ksc, new_vsc = [], [], [], []
        for gi, (lo, hi) in enumerate(bounds):
            s_c = cache.ks[gi].shape[2]
            tail_start = s_c - tail_slots
            kvm = jnp.concatenate(
                [jnp.ones((b, tail_start), bool), tail_vis], axis=1
            )
            out = qwen2.decode_layers(
                layers, lo, hi, x, cos, sin, cache.ks[gi], cache.vs[gi],
                cache.lens[gi], step_idx, tail_start, cfg, kv_mask=kvm,
                head_packed=True,
                cache_ksc=None if not kv_int8 else cache.k_scales[gi],
                cache_vsc=None if not kv_int8 else cache.v_scales[gi],
            )
            if kv_int8:
                x, ck, cv, ksc, vsc, _ = out
                new_ksc.append(ksc)
                new_vsc.append(vsc)
            else:
                x, ck, cv, _ = out
            new_ks.append(ck)
            new_vs.append(cv)
        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
        logits = qwen2.lm_head(params, cfg, h)  # [B, k, V]
        preds = jnp.argmax(logits, -1).astype(jnp.int32)
        new_cache = dataclasses.replace(
            cache, ks=tuple(new_ks), vs=tuple(new_vs),
            k_scales=tuple(new_ksc) if kv_int8 else None,
            v_scales=tuple(new_vsc) if kv_int8 else None,
        )
        return preds, new_cache

    return init_row_buf, insert_row, update_mask, verify_chunk

@functools.lru_cache(maxsize=1)
def _reset_mask_row():
    """Zero one row of a boolean mask in place (donated) — continuous
    speculative serving resets a slot's acceptance mask at admission so the
    previous occupant's accepted tail slots stay hidden."""
    return jax.jit(lambda m, r: m.at[r].set(False), donate_argnums=(0,))

def _spec_batch_builders(cfg: DecoderConfig, spec_key, k: int, gen: GenerateConfig):
    """Resolve the batched-verify builders + tail sizing for a spec-decode
    batch (callers insert rows incrementally — holding all B row caches and
    the batched buffer at once would peak at 2x the cache footprint)."""
    k = max(2, min(k, MAX_DECODE))
    tail_slots = max(k * max(gen.max_new_tokens - 1, 1), k)
    builders = build_verify_chunk_batch(
        cfg, spec_key, k, cfg.num_kv_heads, tail_slots
    )
    return k, tail_slots, builders

def _batched_spec_decode(
    params,
    logits,
    cache,
    gen: GenerateConfig,
    k: int,
    tail_slots: int,
    update_mask,
    verify_chunk,
    histories=None,
    draft_fn=None,
):
    """Batched greedy speculative decode loop over an extended-tail batched
    cache (_spec_batch_builders). Every emitted token is the model's own
    argmax — any drafter only affects speed. Returns (ids, time_decoding,
    stats)."""
    b = logits.shape[0]
    token0 = np.asarray(jnp.argmax(logits, -1).astype(jnp.int32))
    ids = [[int(t)] for t in token0]
    eos = set(gen.eos_token_ids)
    done = [ids[r][-1] in eos or gen.max_new_tokens <= 1 for r in range(b)]
    histories = (
        [list(h) for h in histories] if histories is not None
        else [[] for _ in range(b)]
    )
    for r in range(b):
        histories[r].append(ids[r][0])
    drafter = draft_fn or ngram_draft

    acc_counts = np.zeros(b, np.int64)
    acc_mask = jnp.zeros((b, tail_slots), bool)
    n_drafted = n_hit = 0
    # per-slot accounting: dispatches are gated by the SLOWEST slot (done
    # slots ride along with dummy drafts), so any cost model must see
    # per-slot acceptance, not the batch mean (bench_spec_realistic.py)
    hit_counts = np.zeros(b, np.int64)
    disp_counts = np.zeros(b, np.int64)
    time_decoding = 0.0
    d = 0
    while not all(done) and (d + 1) * k <= tail_slots:
        feed = np.empty((b, k), np.int32)
        drafts = []
        for r in range(b):
            dr = (
                [ids[r][-1]] * (k - 1) if done[r]
                else [int(t) for t in drafter(histories[r], k - 1)]
            )
            drafts.append(dr)
            feed[r, 0] = ids[r][-1]
            feed[r, 1:] = dr
        t0 = time.perf_counter()
        preds, cache = verify_chunk(
            params, jnp.asarray(feed), cache, jnp.int32(d),
            jnp.asarray(acc_counts, jnp.int32), acc_mask,
        )
        preds = np.asarray(preds)  # host sync
        time_decoding += time.perf_counter() - t0

        window = np.zeros((b, k), bool)
        for r in range(b):
            if done[r]:
                continue
            a = 0
            while a < k - 1 and drafts[r][a] == int(preds[r, a]):
                a += 1
            n_drafted += k - 1
            n_hit += a
            hit_counts[r] += a
            disp_counts[r] += 1
            e = 0
            for j in range(a + 1):
                t = int(preds[r, j])
                ids[r].append(t)
                histories[r].append(t)
                e += 1
                if t in eos or len(ids[r]) >= gen.max_new_tokens:
                    done[r] = True
                    break
            window[r, :e] = True
            acc_counts[r] += e
        acc_mask = update_mask(acc_mask, jnp.asarray(window), jnp.int32(d))
        d += 1

    stats = {"spec_drafted": n_drafted, "spec_accepted": n_hit,
             "spec_dispatches": d,
             "spec_accepted_per_slot": [int(x) for x in hit_counts],
             "spec_active_dispatches_per_slot": [int(x) for x in disp_counts]}
    return ids, time_decoding, stats
