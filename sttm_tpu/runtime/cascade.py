"""Prefix-cache serving: extensions, cascade tails, batched prefix decode.

Split from runtime/generate.py. The benchmark access pattern is many
questions per video; the [sys|video] prefill (merge included) is question-
independent and its cache exactly reusable (build_extend docstring). The
cascade layout keeps ONE read-only prefix copy plus small head-packed
per-row suffix tails (CascadeTail) — decode KV reads drop from B*S_p to
S_p (qwen2.cascade_attention).
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
from .decode import (
    _batched_greedy_decode,
    _batched_like,
    _chunked_greedy_loop,
    build_decode_chunk_batch,
    build_decode_step,
)
from .prefill import build_prefill
from .reducer import ReducerSpec
from .sampling import make_key, sample_body, select_token, static_sample_key
from .spec import (
    _batched_spec_decode,
    _make_update_mask,
    _spec_batch_builders,
    _verify_pos_tail,
)

@functools.lru_cache(maxsize=16)
def build_extend(cfg: DecoderConfig, spec, s_suffix: int):
    """Prefix-cache extension: run ``s_suffix`` suffix tokens (padded; first
    ``suffix_valid`` real) against an existing prefill cache, writing their
    K/V contiguously after each group's packed length. (params, cache,
    suffix_embeds [1, s_suffix, D], suffix_valid) -> (logits [1, V], cache).

    Rationale: the benchmark access pattern is many questions per video
    (multiple qids share one vid in every annotation set — the reference
    re-prefills [sys|video|question] from scratch per question,
    eval_vidqa_by_feat_llavavideo.py:236-244). The merge at layer k depends
    only on tokens BEFORE the question (causal attention: video hidden
    states cannot see the suffix), so the [sys|video] prefill — merge
    included — is question-independent and its cache is exactly reusable;
    only the question tokens (~tens) need computing. The cache argument is
    NOT donated: the same prefix cache serves every question of the video.

    Positions: the HF-default truncate+recompute policy gives group gi's
    suffix tokens positions lens[gi] + i (group 0 = unmerged continuation,
    later groups = merged continuation — what the reference's recomputed
    rotary does for the instruction segment); M-RoPE / position-gathering
    specs keep ORIGINAL positions for all groups: cache.pos_base + i.
    StreamingLLM windows and DyCoke decode pruning are out of scope here.
    """
    specs = _normalize_specs(spec)
    bounds = _group_bounds(cfg, specs)
    mrope = bool(cfg.mrope_section)
    original_pos = mrope or any(sp.gathers_positions for sp in specs)

    def fn(params, cache, suffix_embeds, suffix_valid):
        layers = params["layers"]
        x = suffix_embeds
        new_ks, new_vs = [], []
        for gi, (lo, hi) in enumerate(bounds):
            if original_pos:
                pos = (cache.pos_base + jnp.arange(s_suffix)).astype(jnp.int32)
            else:
                pos = (cache.lens[gi] + jnp.arange(s_suffix)).astype(jnp.int32)
            if mrope:
                pos = jnp.broadcast_to(pos[None], (3, s_suffix))
            cos, sin = qwen2.rope_cos_sin(cfg, pos)
            # tail_start=0 + step_idx=lens[gi] lands the suffix at the main
            # region's packed end; the verify-window attention (causal with
            # q_offset) bounds row j's reads to prefix + suffix[:j+1]
            x, ck, cv, _ = qwen2.decode_layers(
                layers, lo, hi, x, cos, sin, cache.ks[gi], cache.vs[gi],
                cache.lens[gi], cache.lens[gi], 0, cfg,
            )
            new_ks.append(ck)
            new_vs.append(cv)
        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
        last = jax.lax.dynamic_slice(
            h, (0, suffix_valid - 1, 0), (1, 1, cfg.hidden_size)
        )
        logits = qwen2.lm_head(params, cfg, last)[:, 0]
        base = cache.pos_base if original_pos else cache.lens[0]
        new_cache = dataclasses.replace(
            cache,
            ks=tuple(new_ks),
            vs=tuple(new_vs),
            lens=tuple(l + suffix_valid for l in cache.lens),
            pos_base=(base + suffix_valid).astype(jnp.int32),
        )
        return logits, new_cache

    return jax.jit(fn)

def prefix_prefill(
    params,
    cfg: DecoderConfig,
    embeds: jnp.ndarray,
    prefix_valid: int,
    video_start: int,
    spec,
    impl: str = "xla",
    position_ids=None,
    t_valid=None,
):
    """Prefill the question-independent [sys|video] prefix once, merge
    included. ``embeds`` must be padded to the FULL prompt buffer (s_full
    covering the longest suffix) so the cache has room for any question's
    tokens and decode reuses the normal compiled programs. Returns the
    reusable cache (pass to generate_from_prefix for each question)."""
    s_full = embeds.shape[1]
    spec_key = spec if (spec is None or isinstance(spec, ReducerSpec)) else tuple(spec)
    prefill = build_prefill(cfg, spec_key, s_full, impl)
    specs = _normalize_specs(spec_key)
    if any(sp.needs_scores for sp in specs):
        # FastV ranks video tokens by the LAST prompt token's attention
        # (reference: last instruction token). A [sys|video] prefix ends at
        # the video, so caching it would rank by the wrong token and make
        # the prune question-independent — a silent parity break.
        raise ValueError(
            "score-based reducers (fastv) are incompatible with prefix "
            "caching: the ranking token must be the last instruction token"
        )
    # Position-gathering specs (M-RoPE, FastV) keep ORIGINAL token positions
    # through the merge, so in the full path the suffix starts at one past the
    # max UNMERGED prefix position (get_rope_index rope-delta semantics,
    # modeling_qwen2vl.py:1779). The prefill's own pos_base is max KEPT
    # position + 1, which undershoots whenever the merge drops the
    # raster-last token — override it with the unmerged base.
    pos_base = None
    if bool(cfg.mrope_section) or any(sp.gathers_positions for sp in specs):
        if position_ids is None:
            pos_base = jnp.int32(prefix_valid)
        else:
            pos_base = (
                jnp.max(position_ids[..., :prefix_valid]) + 1
            ).astype(jnp.int32)
    _, cache = prefill(
        params, embeds, jnp.int32(prefix_valid), jnp.int32(video_start),
        position_ids, pos_base, None if t_valid is None else jnp.int32(t_valid),
    )
    return cache

def generate_from_prefix(
    params,
    cfg: DecoderConfig,
    prefix_cache,
    suffix_embeds: jnp.ndarray,
    suffix_valid: int,
    spec,
    gen: GenerateConfig = GenerateConfig(),
):
    """Greedy generation for one question against a shared prefix cache
    (prefix_prefill). suffix_embeds: [1, s_suffix, D] (bucket-padded).
    Returns (token_ids, runtime dict) like generate(); ttft_llm here is the
    EXTENSION cost — the per-question prefill work under prefix caching."""
    s_suffix = suffix_embeds.shape[1]
    spec_key = spec if (spec is None or isinstance(spec, ReducerSpec)) else tuple(spec)
    extend = build_extend(cfg, spec_key, s_suffix)
    decode = build_decode_step(cfg, spec_key)

    t0 = time.perf_counter()
    logits, cache = extend(
        params, prefix_cache, suffix_embeds, jnp.int32(suffix_valid)
    )
    logits.block_until_ready()
    ttft = time.perf_counter() - t0

    sp = gen.sampling
    skey = make_key(sp.seed) if sp is not None and not sp.greedy else None
    token = select_token(logits, sp, skey, 0)
    ids = [int(token[0])]
    merged_len = int(cache.merged_len)
    time_decoding = 0.0
    step = 0
    while len(ids) < gen.max_new_tokens and ids[-1] not in gen.eos_token_ids:
        t0 = time.perf_counter()
        logits, cache = decode(params, token, cache, jnp.int32(step))
        logits = jax.block_until_ready(logits)
        time_decoding += time.perf_counter() - t0
        token = select_token(logits, sp, skey, len(ids))
        ids.append(int(token[0]))
        step += 1

    runtime = {
        "ttft_llm": ttft,
        "time_decoding": time_decoding,
        "num_dec_token": len(ids),
        "merged_len": merged_len,
        "full_len": int(cache.lens[0]),
        "budget_overflow": 0 if cache.budget_overflow is None else int(cache.budget_overflow),
        "prefix_cached": True,
    }
    return ids, runtime

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CascadeTail:
    """Mutable per-question state for CASCADE batched prefix serving: the
    shared [sys|video] prefix cache stays a single read-only copy in HBM
    (the KVCache from prefix_prefill, passed alongside), and only these
    small head-packed suffix/decode buffers are carried + donated through
    the decode loop. vs the plain batched prefix path (B full cache copies):
    decode KV reads drop from B*S_p to S_p and (B-1)*S_p cache HBM is freed
    (qwen2.cascade_attention)."""

    sfx_ks: tuple  # per group: [Lg, 1, s_sfx + MAX_DECODE, B*KV, hd]
    sfx_vs: tuple
    sfx_lens: jnp.ndarray  # [B] per-row suffix valid lengths
    pos_base: jnp.ndarray  # [B] per-row decode position bases


def _cascade_tail_like(row, b: int, s_sfx: int, dtype=None) -> CascadeTail:
    """Empty cascade tail buffers shaped from one extension row's cache
    (or from a PrefixPool — pool leaves [Lg, P, S, KV, hd] share the
    KV-head/head-dim geometry the tail needs). Pass ``dtype`` (cfg.dtype)
    when shaping from an int8 pool: only the read-only pages are quantized;
    the mutable suffix/decode tail stays in compute precision."""

    def zf(x):
        lg, kv, hd = x.shape[0], x.shape[3], x.shape[4]
        dt = dtype if (dtype is not None and x.dtype == jnp.int8) else x.dtype
        return jnp.zeros((lg, 1, s_sfx + MAX_DECODE, b * kv, hd), dt)

    return CascadeTail(
        sfx_ks=tuple(zf(k) for k in row.ks),
        sfx_vs=tuple(zf(v) for v in row.vs),
        sfx_lens=jnp.zeros((b,), jnp.int32),
        pos_base=jnp.zeros((b,), jnp.int32),
    )

@functools.lru_cache(maxsize=16)
def build_decode_chunk_cascade(
    cfg: DecoderConfig,
    spec,
    chunk: int,
    eos_ids: tuple,
    kvh: int,
    s_sfx: int,
    sample: tuple | None = None,  # (top_k, use_top_p) -> sampled decode
):
    """Cached builders for cascade batched prefix decoding (one shared prefix
    cache + head-packed per-row suffix tails — CascadeTail). Returns
    (pack_row, decode_chunk):

    pack_row(tail, row, pfx_lens, suffix_valid, i) copies one extension row's
    suffix K/V slice (the s_sfx slots build_extend wrote at each group's
    prefix length) into the packed tail buffers at KV-head offset i*kvh and
    records its suffix length / position base. The full row cache is then
    dropped — the batched state never holds a prefix copy per question.

    decode_chunk(params, token, tail, prefix_cache, start_step, done0,
    n_steps) greedily decodes ``chunk`` tokens (freeze-after-EOS), donating
    only the tail; the prefix cache is read-only and reusable afterwards."""
    specs = _normalize_specs(spec)
    bounds = _group_bounds(cfg, specs)
    eos_arr_np = np.asarray(list(eos_ids) or [-1], np.int32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def pack_row(tail: CascadeTail, row, pfx_lens, suffix_valid, i):
        new_ks, new_vs = [], []
        for gi in range(len(bounds)):
            rk, rv = row.ks[gi], row.vs[gi]
            lg, _, _, kv, hd = rk.shape
            if lg == 0:
                new_ks.append(tail.sfx_ks[gi])
                new_vs.append(tail.sfx_vs[gi])
                continue
            start = (0, 0, pfx_lens[gi], 0, 0)
            ksl = jax.lax.dynamic_slice(rk, start, (lg, 1, s_sfx, kv, hd))
            vsl = jax.lax.dynamic_slice(rv, start, (lg, 1, s_sfx, kv, hd))
            at = (0, 0, 0, i * kvh, 0)
            new_ks.append(jax.lax.dynamic_update_slice(tail.sfx_ks[gi], ksl, at))
            new_vs.append(jax.lax.dynamic_update_slice(tail.sfx_vs[gi], vsl, at))
        return CascadeTail(
            sfx_ks=tuple(new_ks),
            sfx_vs=tuple(new_vs),
            sfx_lens=jax.lax.dynamic_update_index_in_dim(
                tail.sfx_lens, jnp.asarray(suffix_valid, jnp.int32), i, 0
            ),
            pos_base=jax.lax.dynamic_update_index_in_dim(
                tail.pos_base, jnp.asarray(row.pos_base, jnp.int32), i, 0
            ),
        )

    def decode(params, token, tail: CascadeTail, pfx, step):
        layers = params["layers"]
        x = qwen2.embed_tokens(params, token, cfg)[:, None, :]  # [B, 1, D]
        pos = (tail.pos_base + step)[:, None].astype(jnp.int32)  # [B, 1]
        if cfg.mrope_section:  # all three M-RoPE rows advance together
            pos = jnp.broadcast_to(pos[:, None, :], (pos.shape[0], 3, 1))
        cos, sin = jax.vmap(lambda p: qwen2.rope_cos_sin(cfg, p))(pos)
        new_ks, new_vs = [], []
        for gi, (lo, hi) in enumerate(bounds):
            tail_start = tail.sfx_ks[gi].shape[2] - MAX_DECODE
            x, sk, sv = qwen2.cascade_decode_layers(
                layers, lo, hi, x, cos, sin,
                pfx.ks[gi], pfx.vs[gi], pfx.lens[gi],
                tail.sfx_ks[gi], tail.sfx_vs[gi], tail.sfx_lens,
                step, tail_start, cfg,
            )
            new_ks.append(sk)
            new_vs.append(sv)
        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
        logits = qwen2.lm_head(params, cfg, h)[:, 0]  # [B, V]
        return logits, dataclasses.replace(
            tail, sfx_ks=tuple(new_ks), sfx_vs=tuple(new_vs)
        )

    if chunk == 1:

        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode_chunk(p, token, tail, pfx, start_step, done0, n_steps,
                         sample_args=None):
            eos_arr = jnp.asarray(eos_arr_np)
            lg, t2 = decode(p, token, tail, pfx, start_step)
            if sample is None:
                nxt = jnp.argmax(lg, -1).astype(jnp.int32)
            else:
                key, temperature, top_p = sample_args
                nxt = sample_body(*sample)(
                    lg, jax.random.fold_in(key, start_step + 1),
                    temperature, top_p,
                )
            nxt = jnp.where(done0, token, nxt)
            buf = jnp.where(done0, -1, nxt)[:, None]
            done = done0 | jnp.any(nxt[:, None] == eos_arr[None, :], axis=-1)
            return nxt, t2, done, buf, jnp.int32(1)

    else:

        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode_chunk(p, token, tail, pfx, start_step, done0, n_steps,
                         sample_args=None):
            loop = _chunked_greedy_loop(
                lambda tok, c, i: decode(p, tok, c, pfx, i),
                chunk, eos_arr_np, sample=sample,
            )
            return loop(token, tail, start_step, done0, n_steps, sample_args)

    return pack_row, decode_chunk

@functools.lru_cache(maxsize=8)
def build_verify_chunk_cascade(
    cfg: DecoderConfig, spec, k: int, kvh: int, s_sfx: int, tail_slots: int
):
    """Batched speculative decoding over the CASCADE layout — three levers
    in one dispatch: one shared read-only prefix copy in HBM (cascade),
    head-packed batching, and k-token verify (one weight read + one prefix
    read scores B*k candidates). Same fixed-dispatch-slot + acceptance-mask
    scheme as build_verify_chunk_batch, with the tail ring living in the
    CascadeTail suffix buffers past the s_sfx suffix region.

    Returns (make_tail, pack_row, update_mask, verify_chunk):
      make_tail(row, b): CascadeTail with an extended [s_sfx + tail_slots]
        buffer shaped from one extension row's cache.
      pack_row(tail, row, pfx_lens, suffix_valid, i): as the cascade decode
        builder — copy one extension row's suffix K/V slice into the packed
        tail at KV-head offset i*kvh.
      update_mask(acc_mask [B, tail_slots], window [B, k], d): mark
        dispatch d's accepted slots.
      verify_chunk(params, tokens [B, k], tail, pfx, d, acc_counts,
        acc_mask) -> (preds [B, k], tail'): tail donated; the prefix cache
        is read-only and reusable."""
    specs = _normalize_specs(spec)
    bounds = _group_bounds(cfg, specs)

    def make_tail(row, b: int) -> CascadeTail:
        def zf(x):
            lg, _, _, kv, hd = x.shape
            return jnp.zeros((lg, 1, s_sfx + tail_slots, b * kv, hd), x.dtype)

        return CascadeTail(
            sfx_ks=tuple(zf(kk) for kk in row.ks),
            sfx_vs=tuple(zf(vv) for vv in row.vs),
            sfx_lens=jnp.zeros((b,), jnp.int32),
            pos_base=jnp.zeros((b,), jnp.int32),
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def pack_row(tail: CascadeTail, row, pfx_lens, suffix_valid, i):
        new_ks, new_vs = [], []
        for gi in range(len(bounds)):
            rk, rv = row.ks[gi], row.vs[gi]
            lg, _, _, kv, hd = rk.shape
            if lg == 0:
                new_ks.append(tail.sfx_ks[gi])
                new_vs.append(tail.sfx_vs[gi])
                continue
            start = (0, 0, pfx_lens[gi], 0, 0)
            ksl = jax.lax.dynamic_slice(rk, start, (lg, 1, s_sfx, kv, hd))
            vsl = jax.lax.dynamic_slice(rv, start, (lg, 1, s_sfx, kv, hd))
            at = (0, 0, 0, i * kvh, 0)
            new_ks.append(jax.lax.dynamic_update_slice(tail.sfx_ks[gi], ksl, at))
            new_vs.append(jax.lax.dynamic_update_slice(tail.sfx_vs[gi], vsl, at))
        return CascadeTail(
            sfx_ks=tuple(new_ks),
            sfx_vs=tuple(new_vs),
            sfx_lens=jax.lax.dynamic_update_index_in_dim(
                tail.sfx_lens, jnp.asarray(suffix_valid, jnp.int32), i, 0
            ),
            pos_base=jax.lax.dynamic_update_index_in_dim(
                tail.pos_base, jnp.asarray(row.pos_base, jnp.int32), i, 0
            ),
        )

    update_mask = _make_update_mask(k)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def verify_chunk(params, tokens, tail: CascadeTail, pfx, d, acc_counts,
                     acc_mask):
        layers = params["layers"]
        x = qwen2.embed_tokens(params, tokens, cfg)  # [B, k, D]
        cos, sin, step_idx, tail_vis = _verify_pos_tail(
            cfg, tail.pos_base, acc_counts, k, d, tail_slots, acc_mask
        )
        kpos_s = jnp.arange(s_sfx)
        base = jnp.concatenate(
            [kpos_s[None, :] < tail.sfx_lens[:, None], tail_vis], axis=1
        )  # [B, s_sfx + tail_slots]
        new_ks, new_vs = [], []
        for gi, (lo, hi) in enumerate(bounds):
            x, sk, sv = qwen2.cascade_verify_layers(
                layers, lo, hi, x, cos, sin, pfx.ks[gi], pfx.vs[gi],
                pfx.lens[gi], tail.sfx_ks[gi], tail.sfx_vs[gi], base,
                step_idx, s_sfx, cfg,
            )
            new_ks.append(sk)
            new_vs.append(sv)
        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
        logits = qwen2.lm_head(params, cfg, h)  # [B, k, V]
        preds = jnp.argmax(logits, -1).astype(jnp.int32)
        new_tail = dataclasses.replace(
            tail, sfx_ks=tuple(new_ks), sfx_vs=tuple(new_vs)
        )
        return preds, new_tail

    return make_tail, pack_row, update_mask, verify_chunk

def generate_batch_from_prefix(
    params,
    cfg: DecoderConfig,
    prefix_cache,
    suffix_embeds: jnp.ndarray,
    suffix_valids,
    spec,
    gen: GenerateConfig = GenerateConfig(),
    decode_chunk_size: int = 1,
    decode_attn_kernel: bool = False,
    cascade: bool = False,
    spec_decode_k: int = 0,
    histories=None,
    draft_fn=None,
    kv_int8: bool = False,
):
    """Batched greedy generation for several questions that share one prefix
    cache (prefix_prefill) — the two serving levers composed: the [sys|video]
    prefill is paid ONCE for the whole batch, each question runs as a cheap
    cache extension (build_extend, sequential — tens of tokens each), and
    decode runs head-packed batched (one weight read per step for all B
    rows, generate_batch's layout). suffix_embeds: [B, s_sfx, D];
    suffix_valids: [B]. Token-exact vs per-question generate(): the
    extension rows are the same caches the single-sample path decodes from.
    Returns (ids list-of-lists, runtime dict); ttft_llm covers all B
    extensions (the per-batch prefill work under prefix caching).

    ``cascade=True`` switches to the cascade KV layout: the batched state
    keeps ONE shared read-only prefix cache plus small per-row suffix tails
    (CascadeTail), instead of B full cache copies — decode KV reads drop
    from B*S_p to S_p and (B-1)*S_p of cache HBM is freed. Attention merges
    the two sources with the exact online-softmax combine
    (qwen2.cascade_attention); math equals the flat path up to fp
    reassociation. decode_attn_kernel is ignored under cascade (XLA path).

    ``spec_decode_k >= 2`` runs batched greedy speculative decoding: ONE
    prefill for the video + per-question extensions + B*k-token verify
    dispatches — the serving levers composed. Token-exact for any drafter.
    With ``cascade=True`` as well, the verify dispatches keep the single
    shared prefix copy (build_verify_chunk_cascade): one weight read + one
    prefix read scores B*k candidates.

    ``gen.sampling`` (temperature > 0) samples ON DEVICE inside the chunked
    decode on both layouts, folding the global step into the key (chunk-size
    invariant, seed-replayable; flat and cascade draw identical tokens up to
    fp reassociation near-ties). Overrides spec_decode_k (verify is greedy).

    ``kv_int8`` (flat layout only) quantizes each extended row cache before
    packing (qwen2.quantize_kv_cache): the flat layout holds B FULL cache
    copies — the layout whose b=8 leg exceeds one v5e's HBM in bf16
    (BENCH_SERVING) — so int8 rows halve exactly the footprint and the
    per-step KV reads that cap it. The cascade layout already shares one
    prefix copy; its int8 form is the pool path (build_prefix_pool).
    """
    b, s_sfx, _ = suffix_embeds.shape
    if kv_int8 and cascade:
        raise ValueError(
            "kv_int8 supports the flat prefix layout; cascade shares one "
            "bf16 prefix copy (int8 prefix pages = the paged pool)"
        )
    spec_key = spec if (spec is None or isinstance(spec, ReducerSpec)) else tuple(spec)
    extend = build_extend(cfg, spec_key, s_sfx)
    chunk = max(1, min(decode_chunk_size, gen.max_new_tokens))
    samp = static_sample_key(gen.sampling)  # None = greedy programs
    speculative = spec_decode_k > 1 and samp is None  # spec verify is greedy
    if speculative and cascade:
        k = max(2, min(spec_decode_k, MAX_DECODE))
        tail_slots = max(k * max(gen.max_new_tokens - 1, 1), k)
        make_tail, pack_row, update_mask, verify_chunk_c = (
            build_verify_chunk_cascade(
                cfg, spec_key, k, cfg.num_kv_heads, s_sfx, tail_slots
            )
        )
        verify_chunk = (
            lambda p, feed, tail, d, ac, am:
            verify_chunk_c(p, feed, tail, prefix_cache, d, ac, am)
        )
    elif speculative:
        k, tail_slots, (init_row_buf, insert_row, update_mask, verify_chunk) = (
            _spec_batch_builders(cfg, spec_key, spec_decode_k, gen)
        )
    elif cascade:
        pack_row, decode_chunk_c = build_decode_chunk_cascade(
            cfg, spec_key, chunk, tuple(gen.eos_token_ids), cfg.num_kv_heads,
            s_sfx, sample=samp,
        )
        insert_row = None
        decode_chunk = (
            lambda p, tok, c, st, d, n, sample_args=None:
            decode_chunk_c(p, tok, c, prefix_cache, st, d, n,
                           sample_args=sample_args)
        )
    else:
        insert_row, decode_chunk = build_decode_chunk_batch(
            cfg, spec_key, chunk, tuple(gen.eos_token_ids), cfg.num_kv_heads,
            attn_kernel=decode_attn_kernel, sample=samp,
        )

    t0 = time.perf_counter()
    logits_rows, cache = [], None
    for i in range(b):
        lg, row = extend(
            params, prefix_cache, suffix_embeds[i : i + 1],
            jnp.int32(int(suffix_valids[i])),
        )
        jax.block_until_ready(lg)
        logits_rows.append(lg)
        if cascade:
            if cache is None:
                cache = (
                    make_tail(row, b) if speculative
                    else _cascade_tail_like(row, b, s_sfx)
                )
            cache = pack_row(
                cache, row, prefix_cache.lens,
                jnp.int32(int(suffix_valids[i])), jnp.int32(i),
            )
        else:
            if kv_int8:  # quantize the extended row before packing
                row = qwen2.quantize_kv_cache(row)
            if cache is None:
                init = (lambda x: init_row_buf(x, b)) if speculative \
                    else (lambda x: _batched_like(x, b))
                cache = jax.tree.map(init, row)
            cache = insert_row(cache, row, jnp.int32(i))
        del row
    logits = jnp.concatenate(logits_rows)  # [B, V]
    logits.block_until_ready()
    ttft = time.perf_counter() - t0

    if cascade:
        pfx_merged = int(prefix_cache.lens[-1])
        pfx_full = int(prefix_cache.lens[0])
        merged_lens = [pfx_merged + int(v) for v in suffix_valids]
        full_lens = [pfx_full + int(v) for v in suffix_valids]
        budget_overflow = [
            0 if prefix_cache.budget_overflow is None
            else int(prefix_cache.budget_overflow)
        ] * b
    else:
        merged_lens = [int(m) for m in cache.merged_len]
        full_lens = [int(l) for l in cache.lens[0]]
        budget_overflow = (
            [0] * b if cache.budget_overflow is None
            else [int(o) for o in cache.budget_overflow]
        )
    spec_stats = {}
    if speculative:
        ids, time_decoding, spec_stats = _batched_spec_decode(
            params, logits, cache, gen, k, tail_slots, update_mask,
            verify_chunk, histories=histories, draft_fn=draft_fn,
        )
    else:
        ids, time_decoding = _batched_greedy_decode(
            params, logits, cache, gen, decode_chunk, chunk
        )

    runtime = {
        "ttft_llm": ttft,
        "time_decoding": time_decoding,
        "num_dec_token": [len(x) for x in ids],
        "merged_len": merged_lens,
        "full_len": full_lens,
        "budget_overflow": budget_overflow,
        "prefix_cached": True,
        **spec_stats,
    }
    return ids, runtime
