"""Prefill/decode runtime with TTFT + decode-time instrumentation.

Mirrors the reference's forked ``_sample`` measurement semantics
(llava/model/language_model/llava_qwen.py:238-331): the first forward's
device-synchronized wall-clock is ``ttft_llm``; subsequent single-token
forwards accumulate ``time_decoding``; the merged token count is read from the
last layer group's cache length (llava_qwen.py:258). Greedy decoding, ≤
``max_new_tokens`` (the harness uses 32, eval_vidqa_by_feat_llavavideo.py:164).

Token reduction splits the layer stack into groups: reducers fire between
groups at their ``layer_idx`` (one reducer = the STTM/ToMe/DyCoke/FastV case;
several = pyramid-drop's multi-stage schedule, pyrd_attn_monkey_patch.py).
All shapes are static per (config, specs, s_full); functions are built once
and cached; the host loop only feeds scalars.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models import qwen2
from ..models.config import DecoderConfig
from .reducer import ReducerSpec, apply_reducer, merged_buffer_len

__all__ = ["GenerateConfig", "build_prefill", "build_decode_step", "generate"]

MAX_DECODE = 64


@dataclasses.dataclass(frozen=True)
class GenerateConfig:
    max_new_tokens: int = 32
    eos_token_ids: tuple = (151645, 151643)  # Qwen2 <|im_end|>, <|endoftext|>


@dataclasses.dataclass(frozen=True)
class DycokeDecodeOptions:
    """DyCoke stage-2 decode-time KV pruning (dycoke_attn_monkey_patch.py:
    25-100): at decode layer ``layer_idx``, rank cached image tokens by the
    current token's head-mean attention; when the attention distribution
    drifts (cosine < drift_thresh vs the previous step), re-select the top
    (1 - ratio) image tokens; layers above ``layer_idx`` see the new
    selection immediately, layers below on the next step. TPU-native: a
    boolean KV mask instead of cache gathering (static shapes). Requires a
    single layer group (the reference runs stage 1 at layer 0)."""

    layer_idx: int  # dycoke_l
    ratio: float  # dycoke_p
    img_len: int  # post-stage-1 image token count (static)
    drift_thresh: float = 0.9


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DycokeState:
    keep_mask: jnp.ndarray  # [S_cache] bool
    attn_score: jnp.ndarray  # [img_len] fp32
    has_score: jnp.ndarray  # scalar bool


def _normalize_specs(spec) -> tuple:
    if spec is None:
        return ()
    if isinstance(spec, ReducerSpec):
        return (spec,)
    return tuple(sorted(spec, key=lambda s: s.layer_idx))


def _group_bounds(cfg: DecoderConfig, specs: tuple) -> list[tuple[int, int]]:
    """Layer ranges [lo, hi) for each group; len == len(specs) + 1."""
    cuts = [max(0, min(s.layer_idx, cfg.num_layers)) for s in specs]
    edges = [0] + cuts + [cfg.num_layers]
    return [(edges[i], edges[i + 1]) for i in range(len(edges) - 1)]


def _buffer_lens(specs: tuple, s_full: int) -> list[int]:
    lens = [s_full]
    for sp in specs:
        lens.append(merged_buffer_len(sp, lens[-1]))
    return lens


@functools.lru_cache(maxsize=32)
def build_prefill(
    cfg: DecoderConfig,
    spec,
    s_full: int,
    impl: str,
    attn_sinks: int = 0,
    attn_window: int = 0,
):
    """Jitted prefill: (params, embeds [1, s_full, D], valid_len, video_start,
    position_ids=None) -> (logits [1, V] fp32, KVCache).

    ``spec``: None, one ReducerSpec, or a tuple of them (multi-stage).
    position_ids: [s_full] (1D RoPE) or [3, s_full] (M-RoPE); defaults to
    iota. Post-merge positions: M-RoPE and FastV gather source positions
    (token_merging_qwen2vl_monkey_patch/...:109-113,
    modeling_qwen2_baseline.py:296); the default truncates + recomputes
    (quadtree_attn_monkey_patch.py:114-115). attn_sinks/attn_window select
    the StreamingLLM A-shape attention pattern.
    """
    specs = _normalize_specs(spec)
    bounds = _group_bounds(cfg, specs)
    buf_lens = _buffer_lens(specs, s_full)
    mrope = bool(cfg.mrope_section)
    if attn_sinks == 0 and attn_window == 0 and cfg.sliding_window:
        attn_window = cfg.sliding_window  # Mistral-family architectural window

    def fn(params, embeds, valid_len, video_start, position_ids=None, pos_base_override=None, t_valid=None):
        layers = params["layers"]
        if position_ids is None:
            position_ids = jnp.arange(s_full, dtype=jnp.int32)
        pos = position_ids
        cos, sin = qwen2.rope_cos_sin(cfg, pos)
        x = embeds
        valid = valid_len
        vstart = video_start
        overflow = jnp.int32(0)
        ks, vs, lens = [], [], []

        for gi, (lo, hi) in enumerate(bounds):
            needs_scores = gi < len(specs) and specs[gi].needs_scores
            out = qwen2.prefill_layers(
                layers, lo, hi, x, cos, sin, valid, cfg, impl,
                collect_last_q=needs_scores,
                attn_sinks=attn_sinks, attn_window=attn_window,
            )
            x, k_all, v_all = out[0], out[1], out[2]
            ks.append(k_all)
            vs.append(v_all)
            lens.append(jnp.asarray(valid, jnp.int32))

            if gi < len(specs):
                sp = specs[gi]
                scores = None
                if needs_scores:
                    # last-token attention over the sequence from the layer
                    # just below the boundary (fp32, head-mean)
                    q_last = out[3][-1].astype(jnp.float32)  # [B, H, hd]
                    k_prev = k_all[-1].astype(jnp.float32)  # [B, S, KV, hd]
                    b, s, kvh, hd = k_prev.shape
                    g = cfg.num_heads // kvh
                    qh = q_last.reshape(b, kvh, g, hd)
                    att = jnp.einsum(
                        "bhgd,bshd->bhgs", qh, k_prev,
                        precision=jax.lax.Precision.HIGHEST,
                    ) * (hd**-0.5)
                    att = jnp.where(
                        (jnp.arange(s) < valid)[None, None, None], att, -1e30
                    )
                    probs = jax.nn.softmax(att, axis=-1)
                    scores = probs.reshape(b, cfg.num_heads, s).mean(1)[0]  # [S]
                rope_maps = (cos, sin) if (sp.pos_emb_ver == 1 and not mrope) else None
                x, valid, n_kept, src_pos, merged_rope, n_raw = apply_reducer(
                    sp, x, vstart, valid, scores, rope_maps,
                    t_valid if gi == 0 else None,
                )
                overflow = overflow + (n_raw - n_kept)
                if merged_rope is not None:  # pos_emb_ver 1: pooled rope maps
                    cos, sin = merged_rope
                    pos = jnp.arange(buf_lens[gi + 1], dtype=jnp.int32)
                else:
                    if mrope:
                        pos = pos[:, src_pos]
                    elif sp.gathers_positions:
                        pos = pos[src_pos]
                    else:  # truncate + recompute
                        pos = jnp.arange(buf_lens[gi + 1], dtype=jnp.int32)
                    cos, sin = qwen2.rope_cos_sin(cfg, pos)
                # video span start is unchanged (sys prefix untouched); its
                # length shrinks to n_kept for any subsequent stage
                # (pyrd updates image_token_length, pyrd_...patch.py:102)

        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
        last = jax.lax.dynamic_slice(h, (0, valid - 1, 0), (1, 1, cfg.hidden_size))
        logits = qwen2.lm_head(params, cfg, last)[:, 0]

        def with_tail(buf):
            if buf.shape[0] == 0:
                return buf
            l, b, s, kv, hd = buf.shape
            return jnp.concatenate(
                [buf, jnp.zeros((l, b, MAX_DECODE, kv, hd), buf.dtype)], axis=2
            )

        # decode position base: one past the last valid token's position id
        # (1D iota -> valid_len, the HF default; M-RoPE -> max pos + 1, the
        # reference's rope-delta decode positions, modeling_qwen2vl.py:1779)
        last_pos = pos[..., valid - 1]
        pos_base = (jnp.max(last_pos) + 1).astype(jnp.int32)
        if not mrope and not any(sp.gathers_positions for sp in specs):
            # HF default: decode positions continue from the UNMERGED length
            pos_base = jnp.asarray(valid_len, jnp.int32)
        if pos_base_override is not None:
            # caller-supplied base (e.g. frame bucketing: pad frames inflate
            # valid_len; decode must continue from the REAL prompt length)
            pos_base = jnp.asarray(pos_base_override, jnp.int32)

        # lens[gi] is the packed valid length group gi ran at (i.e. the
        # validity BEFORE its following reducer) — exactly its cache length
        cache = qwen2.KVCache(
            ks=tuple(with_tail(k) for k in ks),
            vs=tuple(with_tail(v) for v in vs),
            lens=tuple(lens),
            pos_base=pos_base,
            budget_overflow=overflow if specs else None,
        )
        return logits, cache

    return jax.jit(fn)


@functools.lru_cache(maxsize=32)
def build_decode_step(
    cfg: DecoderConfig,
    spec,
    jit: bool = True,
    attn_sinks: int = 0,
    attn_window: int = 0,
    unroll: bool = False,
    attn_kernel: bool = False,
    head_packed: bool = False,
):
    """Single-token decode: (params, token [1], cache, step) ->
    (logits [1, V] fp32, cache). jit=False returns the raw traceable body
    (for composition inside other jitted programs, e.g. the batched
    chunked-decode loop — nesting jit there makes tracing pathological).

    attn_sinks/attn_window > 0 applies StreamingLLM's sliding-window decode:
    each new token attends only to the initial sink tokens plus the last
    ``attn_window`` positions — the reference's SinkCache(window, sinks)
    semantics (framefusion/models/qwen2/modeling_qwen2_baseline.py:707,718),
    expressed as a per-step KV mask instead of cache eviction (static shapes).
    """
    specs = _normalize_specs(spec)
    bounds = _group_bounds(cfg, specs)
    if attn_sinks == 0 and attn_window == 0 and cfg.sliding_window:
        attn_window = cfg.sliding_window  # Mistral-family architectural window

    def fn(params, token, cache, step, tail_min=None):
        layers = params["layers"]
        x = qwen2.embed_tokens(params, token, cfg)[:, None, :]  # [B, 1, D]
        if jnp.ndim(cache.pos_base) == 1:  # natively batched: per-row bases
            # continuous batching: a row admitted at global step tail_min[i]
            # is at LOCAL step (step - tail_min[i]) for rope purposes
            local = step if tail_min is None else step - jnp.asarray(tail_min)
            pos = (cache.pos_base + local)[:, None].astype(jnp.int32)  # [B, 1]
            if cfg.mrope_section:  # all three M-RoPE rows advance together
                pos = jnp.broadcast_to(pos[:, None, :], (pos.shape[0], 3, 1))
            cos, sin = jax.vmap(lambda p: qwen2.rope_cos_sin(cfg, p))(pos)
        else:
            pos = (cache.pos_base + step)[None].astype(jnp.int32)
            if cfg.mrope_section:
                pos = jnp.broadcast_to(pos, (3, 1))
            cos, sin = qwen2.rope_cos_sin(cfg, pos)

        new_ks, new_vs = [], []
        for gi, (lo, hi) in enumerate(bounds):
            s_c = cache.ks[gi].shape[2]
            tail_start = s_c - MAX_DECODE
            kv_len = cache.lens[gi]
            kv_mask = None
            if attn_sinks > 0 or attn_window > 0:
                # A-shape over LOGICAL positions (tail slots sit past kv_len)
                logical = qwen2.decode_logical_kpos(s_c, tail_start, kv_len)
                cur = kv_len + step
                cur = cur[:, None] if jnp.ndim(cur) == 1 else cur
                kv_mask = (logical < attn_sinks) | (cur - logical < attn_window)
            x, ck, cv, _ = qwen2.decode_layers(
                layers, lo, hi, x, cos, sin, cache.ks[gi], cache.vs[gi],
                kv_len, step, tail_start, cfg, kv_mask=kv_mask, unroll=unroll,
                attn_kernel=attn_kernel, head_packed=head_packed,
                tail_min=tail_min,
            )
            new_ks.append(ck)
            new_vs.append(cv)
        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
        logits = qwen2.lm_head(params, cfg, h)[:, 0]
        new_cache = dataclasses.replace(cache, ks=tuple(new_ks), vs=tuple(new_vs))
        return logits, new_cache

    return jax.jit(fn, donate_argnums=(2,)) if jit else fn


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
    step..step+k-1."""
    layers = params["layers"]
    x = qwen2.embed_tokens(params, tokens, cfg)[None]  # [1, k, D]
    pos = (cache.pos_base + step + jnp.arange(k)).astype(jnp.int32)  # [k]
    if cfg.mrope_section:  # all three M-RoPE rows advance together
        pos = jnp.broadcast_to(pos[None], (3, k))
    cos, sin = qwen2.rope_cos_sin(cfg, pos)
    new_ks, new_vs = [], []
    for gi, (lo, hi) in enumerate(bounds):
        s_c = cache.ks[gi].shape[2]
        tail_start = s_c - MAX_DECODE
        x, ck, cv, _ = qwen2.decode_layers(
            layers, lo, hi, x, cos, sin, cache.ks[gi], cache.vs[gi],
            cache.lens[gi], step, tail_start, cfg,
        )
        new_ks.append(ck)
        new_vs.append(cv)
    h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
    logits = qwen2.lm_head(params, cfg, h)[0]  # [k, V]
    new_cache = dataclasses.replace(cache, ks=tuple(new_ks), vs=tuple(new_vs))
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

        def body(carry, j):
            cur, ks, vs = carry
            x = qwen2.embed_tokens(params, cur, cfg)[:, None, :]  # [1, 1, D]
            pos = (cache.pos_base + step + j)[None].astype(jnp.int32)
            if cfg.mrope_section:
                pos = jnp.broadcast_to(pos, (3, 1))
            cos, sin = qwen2.rope_cos_sin(cfg, pos)
            ks, vs = list(ks), list(vs)
            for gi, (lo, hi) in enumerate(bounds):
                if lo >= e:
                    break
                s_c = ks[gi].shape[2]
                x, ck, cv, _ = qwen2.decode_layers(
                    layers, lo, min(hi, e), x, cos, sin, ks[gi], vs[gi],
                    cache.lens[gi], step + j, s_c - MAX_DECODE, cfg,
                )
                ks[gi], vs[gi] = ck, cv
            h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
            logits = qwen2.lm_head(params, cfg, h)[:, 0]
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (nxt, tuple(ks), tuple(vs)), nxt[0]

        (_, ks, vs), drafts = jax.lax.scan(
            body, (token, cache.ks, cache.vs), jnp.arange(k - 1, dtype=jnp.int32)
        )
        cache = dataclasses.replace(cache, ks=ks, vs=vs)
        feed = jnp.concatenate([token, drafts])
        logits, new_cache = _verify_tokens(params, feed, cache, step, bounds, cfg, k)
        # argmax on device, one small fetchable array [2k-1] = preds ++
        # drafts: the caller needs exactly these ints, and a single host
        # fetch per cycle matters under ~27 ms/dispatch tunnels
        preds = jnp.argmax(logits, -1).astype(jnp.int32)
        return jnp.concatenate([preds, drafts]), new_cache

    return jax.jit(fn, donate_argnums=(2,))


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

    token = jnp.argmax(logits, -1).astype(jnp.int32)
    ids = [int(token[0])]
    merged_len = int(cache.merged_len)
    time_decoding = 0.0
    step = 0
    while len(ids) < gen.max_new_tokens and ids[-1] not in gen.eos_token_ids:
        t0 = time.perf_counter()
        logits, cache = decode(params, token, cache, jnp.int32(step))
        logits = jax.block_until_ready(logits)
        time_decoding += time.perf_counter() - t0
        token = jnp.argmax(logits, -1).astype(jnp.int32)
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


def _batched_like(x, b: int):
    """Zero-filled head-packed batched buffer shaped like one sample's cache
    leaf: [Lg, 1, S, KV, hd] -> [Lg, 1, S, B*KV, hd]; scalar leaves -> [B]."""
    x = jnp.asarray(x)
    if x.ndim >= 2:
        return jnp.zeros(x.shape[:3] + (b * x.shape[3],) + x.shape[4:], x.dtype)
    return jnp.zeros((b,), x.dtype)


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
        def decode_chunk(p, token, tail, pfx, start_step, done0, n_steps):
            eos_arr = jnp.asarray(eos_arr_np)
            lg, t2 = decode(p, token, tail, pfx, start_step)
            nxt = jnp.argmax(lg, -1).astype(jnp.int32)
            nxt = jnp.where(done0, token, nxt)
            buf = jnp.where(done0, -1, nxt)[:, None]
            done = done0 | jnp.any(nxt[:, None] == eos_arr[None, :], axis=-1)
            return nxt, t2, done, buf, jnp.int32(1)

    else:

        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode_chunk(p, token, tail, pfx, start_step, done0, n_steps):
            loop = _chunked_greedy_loop(
                lambda tok, c, i: decode(p, tok, c, pfx, i),
                chunk, eos_arr_np,
            )
            return loop(token, tail, start_step, done0, n_steps)

    return pack_row, decode_chunk


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PrefixPool:
    """A paged pool of P distinct prefix caches (cascade x continuous
    batching): each video's [sys|video] prefill lives ONCE in HBM regardless
    of how many serving slots reference it; slots carry a page index. vs
    per-slot prefix copies (serving.PrefixRequest): cache HBM drops from
    B*S_p to P*S_p and the decode step reads each page once (slots sharing
    a page share the read — qwen2.paged_cascade_attention)."""

    ks: tuple  # per group: [Lg, P, S_main, KV, hd] (decode tail trimmed)
    vs: tuple
    lens: tuple  # per group: [P] packed prefix lengths
    pos_base: jnp.ndarray  # [P]
    # int8 pools only (build_prefix_pool(int8=True)): per-(position, head)
    # dequant scales, [Lg, P, S_main, KV] fp32 per group. None = bf16 pool.
    k_scales: Any = None
    v_scales: Any = None


@functools.lru_cache(maxsize=8)
def build_prefix_pool(cfg: DecoderConfig, spec, pages: int, int8: bool = False):
    """Cached builders for a PrefixPool. Returns (init_pool, insert_page):
    init_pool(cache) makes an all-zero P-page pool shaped from one
    prefix_prefill cache (its MAX_DECODE tail trimmed — pages are read-only);
    insert_page(pool, cache, p) (jitted, pool donated) copies one video's
    prefix cache into page ``p``. Callers insert pages one at a time and drop
    each source cache before the next insert, so peak HBM stays ~one page
    above the pool.

    ``int8=True`` quantizes each page's K/V at insert to int8 with
    per-(position, KV-head) symmetric scales: the pool is read-only, so
    quantization is one-time. Pool HBM and per-step prefix read traffic
    halve vs bf16 (2x the page capacity per chip); attention dequantizes by
    scaling the score/prob matrices — the int8->f32 convert fuses into the
    dot operand read, so the HBM read stays int8
    (qwen2.paged_cascade_attention). Bounded approximation (like the w8a8
    weight path): |error| <= scale/2 per element."""

    def init_pool(cache) -> PrefixPool:
        def zp(x):
            lg, _, s, kv, hd = x.shape
            return jnp.zeros(
                (lg, pages, s - MAX_DECODE, kv, hd),
                jnp.int8 if int8 else x.dtype,
            )

        def zs(x):
            lg, _, s, kv, _ = x.shape
            return jnp.zeros((lg, pages, s - MAX_DECODE, kv), jnp.float32)

        return PrefixPool(
            ks=tuple(zp(k) for k in cache.ks),
            vs=tuple(zp(v) for v in cache.vs),
            lens=tuple(jnp.zeros((pages,), jnp.int32) for _ in cache.ks),
            pos_base=jnp.zeros((pages,), jnp.int32),
            k_scales=tuple(zs(k) for k in cache.ks) if int8 else None,
            v_scales=tuple(zs(v) for v in cache.vs) if int8 else None,
        )

    def _quant(x):
        scale = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 127.0
        scale = jnp.maximum(scale, 1e-8)
        q = jnp.round(x.astype(jnp.float32) / scale[..., None])
        return q.astype(jnp.int8), scale

    @functools.partial(jax.jit, donate_argnums=(0,))
    def insert_page(pool: PrefixPool, cache, p) -> PrefixPool:
        new_ks, new_vs, new_lens = [], [], []
        new_kscales, new_vscales = [], []
        for gi in range(len(pool.ks)):
            s_main = pool.ks[gi].shape[2]
            ksl = jax.lax.slice_in_dim(cache.ks[gi], 0, s_main, axis=2)
            vsl = jax.lax.slice_in_dim(cache.vs[gi], 0, s_main, axis=2)
            at = (0, p, 0, 0, 0)
            if int8:
                ksl, ksc = _quant(ksl)
                vsl, vsc = _quant(vsl)
                sat = (0, p, 0, 0)
                new_kscales.append(jax.lax.dynamic_update_slice(
                    pool.k_scales[gi], ksc, sat))
                new_vscales.append(jax.lax.dynamic_update_slice(
                    pool.v_scales[gi], vsc, sat))
            new_ks.append(jax.lax.dynamic_update_slice(pool.ks[gi], ksl, at))
            new_vs.append(jax.lax.dynamic_update_slice(pool.vs[gi], vsl, at))
            new_lens.append(jax.lax.dynamic_update_index_in_dim(
                pool.lens[gi], jnp.asarray(cache.lens[gi], jnp.int32), p, 0
            ))
        return PrefixPool(
            ks=tuple(new_ks), vs=tuple(new_vs), lens=tuple(new_lens),
            pos_base=jax.lax.dynamic_update_index_in_dim(
                pool.pos_base, jnp.asarray(cache.pos_base, jnp.int32), p, 0
            ),
            k_scales=tuple(new_kscales) if int8 else None,
            v_scales=tuple(new_vscales) if int8 else None,
        )

    return init_pool, insert_page


@functools.lru_cache(maxsize=8)
def build_paged_admit(cfg: DecoderConfig, spec, s_sfx: int, kvh: int):
    """Pool admission program: run one request's suffix against its pool
    page and write the suffix K/V straight into tail slot ``i`` (no prefix
    copy, no intermediate row cache — qwen2.paged_extend_layers).
    (params, pool, p, tail, sfx_embeds [1, s_sfx, D], suffix_valid, i) ->
    (logits [V], tail'). Positions mirror build_extend: truncate+recompute
    (group gi's suffix starts at lens[gi][p]) unless the spec/M-RoPE keeps
    original positions (pos_base[p] + j)."""
    specs = _normalize_specs(spec)
    bounds = _group_bounds(cfg, specs)
    mrope = bool(cfg.mrope_section)
    original_pos = mrope or any(sp.gathers_positions for sp in specs)

    @functools.partial(jax.jit, donate_argnums=(3,))
    def admit(params, pool: PrefixPool, p, tail: CascadeTail, sfx_embeds,
              suffix_valid, i):
        layers = params["layers"]
        x = sfx_embeds
        new_ks, new_vs = [], []
        for gi, (lo, hi) in enumerate(bounds):
            if original_pos:
                pos = (pool.pos_base[p] + jnp.arange(s_sfx)).astype(jnp.int32)
            else:
                pos = (pool.lens[gi][p] + jnp.arange(s_sfx)).astype(jnp.int32)
            if mrope:
                pos = jnp.broadcast_to(pos[None], (3, s_sfx))
            cos, sin = qwen2.rope_cos_sin(cfg, pos)
            x, sk, sv = qwen2.paged_extend_layers(
                layers, lo, hi, x, cos, sin, pool.ks[gi], pool.vs[gi],
                pool.lens[gi][p], p, tail.sfx_ks[gi], tail.sfx_vs[gi], i, cfg,
                k_scales=None if pool.k_scales is None else pool.k_scales[gi],
                v_scales=None if pool.v_scales is None else pool.v_scales[gi],
            )
            new_ks.append(sk)
            new_vs.append(sv)
        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
        last = jax.lax.dynamic_slice(
            h, (0, suffix_valid - 1, 0), (1, 1, cfg.hidden_size)
        )
        logits = qwen2.lm_head(params, cfg, last)[0, 0]
        base = pool.pos_base[p] if original_pos else pool.lens[0][p]
        new_tail = CascadeTail(
            sfx_ks=tuple(new_ks),
            sfx_vs=tuple(new_vs),
            sfx_lens=jax.lax.dynamic_update_index_in_dim(
                tail.sfx_lens, jnp.asarray(suffix_valid, jnp.int32), i, 0
            ),
            pos_base=jax.lax.dynamic_update_index_in_dim(
                tail.pos_base, (base + suffix_valid).astype(jnp.int32), i, 0
            ),
        )
        return logits, new_tail

    return admit


@functools.lru_cache(maxsize=8)
def build_paged_decode_chunk(
    cfg: DecoderConfig,
    spec,
    chunk: int,
    eos_ids: tuple,
    kvh: int,
):
    """Chunked decode over a PrefixPool + CascadeTail with continuous-
    admission semantics: per-row page indices (qwen2.paged_cascade_attention
    reads each page once per step), per-row admit steps (local rope position
    = pos_base + step - admit_step; tail slots below a row's admit step are
    the previous occupant's K/V and are masked). decode_chunk(params, token,
    tail, pool, page [B], start_step, done0, n_steps, admit_step [B]) ->
    (token, tail, done, buf [B, chunk], n_run); only the tail is donated —
    the pool is read-only and reusable."""
    specs = _normalize_specs(spec)
    bounds = _group_bounds(cfg, specs)
    eos_arr_np = np.asarray(list(eos_ids) or [-1], np.int32)

    def decode(params, token, tail: CascadeTail, pool: PrefixPool, page,
               step, admit_step):
        layers = params["layers"]
        x = qwen2.embed_tokens(params, token, cfg)[:, None, :]  # [B, 1, D]
        local = step - admit_step
        pos = (tail.pos_base + local)[:, None].astype(jnp.int32)  # [B, 1]
        if cfg.mrope_section:
            pos = jnp.broadcast_to(pos[:, None, :], (pos.shape[0], 3, 1))
        cos, sin = jax.vmap(lambda p: qwen2.rope_cos_sin(cfg, p))(pos)
        new_ks, new_vs = [], []
        for gi, (lo, hi) in enumerate(bounds):
            tail_start = tail.sfx_ks[gi].shape[2] - MAX_DECODE
            x, sk, sv = qwen2.paged_cascade_decode_layers(
                layers, lo, hi, x, cos, sin,
                pool.ks[gi], pool.vs[gi], pool.lens[gi], page,
                tail.sfx_ks[gi], tail.sfx_vs[gi], tail.sfx_lens,
                step, tail_start, cfg, tail_min=admit_step,
                k_scales=None if pool.k_scales is None else pool.k_scales[gi],
                v_scales=None if pool.v_scales is None else pool.v_scales[gi],
            )
            new_ks.append(sk)
            new_vs.append(sv)
        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
        logits = qwen2.lm_head(params, cfg, h)[:, 0]  # [B, V]
        return logits, dataclasses.replace(
            tail, sfx_ks=tuple(new_ks), sfx_vs=tuple(new_vs)
        )

    @functools.partial(jax.jit, donate_argnums=(2,))
    def decode_chunk(p, token, tail, pool, page, start_step, done0, n_steps,
                     admit_step):
        loop = _chunked_greedy_loop(
            lambda tok, c, i: decode(p, tok, c, pool, page, i, admit_step),
            chunk, eos_arr_np,
        )
        return loop(token, tail, start_step, done0, n_steps)

    return decode_chunk


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


@functools.lru_cache(maxsize=16)
def build_decode_chunk(
    cfg: DecoderConfig,
    spec,
    chunk: int,
    attn_sinks: int = 0,
    attn_window: int = 0,
):
    """On-device multi-token decode: one dispatch greedily generates ``chunk``
    tokens with a lax.scan over the single-step body (build_decode_step).

    Amortizes per-step dispatch overhead — the host loop pays one round-trip
    per CHUNK instead of per token (decisive through high-RTT links, and a
    real dispatch-overhead win on production serving too). Steps past
    ``n_steps`` or after EOS are skipped on-device via lax.cond (an identity
    branch: no weight reads), so a tail chunk or an early EOS doesn't pay
    for the unused steps; scan + cond keeps the compile behavior of a plain
    layer stack (a while_loop variant compiled pathologically through
    remote-compile tunnels). Returns
    (params, token [1], cache, start_step, done0, eos_arr, n_steps) ->
    (last_token [1], cache, done, buf [chunk] int32 with -1 after EOS,
    n_run = steps actually decoded).
    """
    decode = build_decode_step(
        cfg, spec, jit=False, attn_sinks=attn_sinks, attn_window=attn_window
    )

    def fn(params, token, cache, start_step, done0, eos_arr, n_steps):
        def real(tok, c, done, i):
            logits, c2 = decode(params, tok, c, start_step + i)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            nxt = jnp.where(done, tok, nxt)  # freeze after EOS
            out = jnp.where(done, -1, nxt[0])
            done = done | jnp.any(nxt[0] == eos_arr)
            return nxt, c2, done, out

        def skip(tok, c, done, i):
            return tok, c, done, jnp.int32(-1)

        def body(carry, i):
            tok, c, done, n_run = carry
            run = (i < n_steps) & ~done
            tok, c, done, out = jax.lax.cond(run, real, skip, tok, c, done, i)
            return (tok, c, done, n_run + run.astype(jnp.int32)), out

        (tok, cache, done, n_run), buf = jax.lax.scan(
            body, (token, cache, done0, jnp.int32(0)), jnp.arange(chunk, dtype=jnp.int32)
        )
        return tok, cache, done, buf, n_run

    return jax.jit(fn, donate_argnums=(2,))


def _chunked_greedy_loop(decode_fn, chunk: int, eos_arr_np):
    """The shared batched freeze-after-EOS chunked-decode loop (scan + cond,
    NOT while_loop — the round-1 while_loop variant compiled pathologically
    through remote-compile tunnels; steps past n_steps or after every row
    hit EOS take the identity branch, no weight reads). Used by the flat,
    cascade, and paged decode-chunk builders, whose only difference is the
    per-step decode closure. decode_fn(token [B], carry, step) ->
    (logits [B, V], carry). Returns loop(token, carry, start_step, done0,
    n_steps) -> (token, carry, done, buf [B, chunk] int32 with -1 after
    EOS, n_run)."""

    def loop(token, carry0, start_step, done0, n_steps):
        eos_arr = jnp.asarray(eos_arr_np)

        def real(tok, c, done, i):
            lg, c2 = decode_fn(tok, c, start_step + i)
            nxt = jnp.argmax(lg, -1).astype(jnp.int32)
            nxt = jnp.where(done, tok, nxt)  # freeze finished rows
            out = jnp.where(done, -1, nxt)
            done = done | jnp.any(nxt[:, None] == eos_arr[None, :], axis=-1)
            return nxt, c2, done, out

        def skip(tok, c, done, i):
            return tok, c, done, jnp.full_like(tok, -1)

        def body(carry, i):
            tok, c, done, n_run = carry
            run = (i < n_steps) & ~jnp.all(done)
            tok, c, done, out = jax.lax.cond(run, real, skip, tok, c, done, i)
            return (tok, c, done, n_run + run.astype(jnp.int32)), out

        (tok, c, done, n_run), buf = jax.lax.scan(
            body, (token, carry0, done0, jnp.int32(0)),
            jnp.arange(chunk, dtype=jnp.int32),
        )
        return tok, c, done, buf.T, n_run

    return loop


@functools.lru_cache(maxsize=16)
def build_decode_chunk_batch(
    cfg: DecoderConfig,
    spec,
    chunk: int,
    eos_ids: tuple,
    kvh: int,
    attn_kernel: bool = False,
):
    """Cached builders for batched generation. These MUST be module-level and
    cached: defining the jitted decode chunk / row-insert inside
    generate_batch creates fresh function objects per call, so jax.jit
    RETRACES AND RECOMPILES on every invocation — profiled at ~1.9 s of
    compile per call through this environment's remote-compile path while
    the decode chunk itself runs 113 ms on-device (this was the round-1
    'batched chunked decode compiles pathologically' mystery's other half).

    Returns (insert_row, decode_chunk): insert_row packs one sample's cache
    into the head-packed batched buffer (donated, KV-head offset i*kvh);
    decode_chunk greedily decodes ``chunk`` tokens (freeze-after-EOS).
    """
    decode = build_decode_step(
        cfg, spec, jit=False, attn_kernel=attn_kernel, head_packed=True
    )
    eos_arr_np = np.asarray(list(eos_ids) or [-1], np.int32)

    def _row_insert(buf, x, i):
        x = jnp.asarray(x)
        if x.ndim >= 2:  # [Lg, 1, S, KV, hd] at head offset i*kvh
            return jax.lax.dynamic_update_slice(buf, x, (0, 0, 0, i * kvh, 0))
        return jax.lax.dynamic_update_index_in_dim(buf, x, i, 0)

    insert_row = jax.jit(
        lambda buf_tree, row_tree, i: jax.tree.map(
            lambda buf, x: _row_insert(buf, x, i), buf_tree, row_tree
        ),
        donate_argnums=(0,),
    )

    if chunk == 1:

        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode_chunk(p, token, cache, start_step, done0, n_steps, tail_min=None):
            eos_arr = jnp.asarray(eos_arr_np)
            lg, c2 = decode(p, token, cache, start_step, tail_min)  # [B, V]
            nxt = jnp.argmax(lg, -1).astype(jnp.int32)
            nxt = jnp.where(done0, token, nxt)
            buf = jnp.where(done0, -1, nxt)[:, None]
            done = done0 | jnp.any(nxt[:, None] == eos_arr[None, :], axis=-1)
            return nxt, c2, done, buf, jnp.int32(1)

    else:

        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode_chunk(p, token, cache, start_step, done0, n_steps, tail_min=None):
            loop = _chunked_greedy_loop(
                lambda tok, c, i: decode(p, tok, c, i, tail_min),
                chunk, eos_arr_np,
            )
            return loop(token, cache, start_step, done0, n_steps)

    return insert_row, decode_chunk


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
        if x.ndim >= 2:
            if x.shape[2] > buf.shape[2]:
                # tail_slots < MAX_DECODE: drop the row's unused zero tail
                x = jax.lax.slice_in_dim(x, 0, buf.shape[2], axis=2)
            return jax.lax.dynamic_update_slice(buf, x, (0, 0, 0, i * kvh, 0))
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
        layers = params["layers"]
        b = tokens.shape[0]
        x = qwen2.embed_tokens(params, tokens, cfg)  # [B, k, D]
        cos, sin, step_idx, tail_vis = _verify_pos_tail(
            cfg, cache.pos_base, acc_counts, k, d, tail_slots, acc_mask
        )
        new_ks, new_vs = [], []
        for gi, (lo, hi) in enumerate(bounds):
            s_c = cache.ks[gi].shape[2]
            tail_start = s_c - tail_slots
            kvm = jnp.concatenate(
                [jnp.ones((b, tail_start), bool), tail_vis], axis=1
            )
            x, ck, cv, _ = qwen2.decode_layers(
                layers, lo, hi, x, cos, sin, cache.ks[gi], cache.vs[gi],
                cache.lens[gi], step_idx, tail_start, cfg, kv_mask=kvm,
                head_packed=True,
            )
            new_ks.append(ck)
            new_vs.append(cv)
        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
        logits = qwen2.lm_head(params, cfg, h)  # [B, k, V]
        preds = jnp.argmax(logits, -1).astype(jnp.int32)
        new_cache = dataclasses.replace(cache, ks=tuple(new_ks), vs=tuple(new_vs))
        return preds, new_cache

    return init_row_buf, insert_row, update_mask, verify_chunk


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


@functools.lru_cache(maxsize=8)
def build_paged_verify_chunk(
    cfg: DecoderConfig, spec, k: int, kvh: int, s_sfx: int, tail_slots: int
):
    """Batched speculative verify over a PAGED prefix pool (the grand
    composition: paged prefix caching x head-packed batching x k-token
    verify — one weight read + one read of each DISTINCT page scores B*k
    candidates). Same dispatch-slot/acceptance-mask scheme as
    build_verify_chunk_cascade, prefix side paged
    (qwen2.paged_cascade_verify_attention). Returns (make_tail, update_mask,
    verify_chunk):
      make_tail(pool, b): CascadeTail [s_sfx + tail_slots] shaped from pool
        leaves (admission writes suffixes via build_paged_admit).
      verify_chunk(params, tokens [B, k], tail, pool, page [B], d,
        acc_counts, acc_mask) -> (preds, tail'); tail donated, pool
        read-only."""
    specs = _normalize_specs(spec)
    bounds = _group_bounds(cfg, specs)

    def make_tail(pool, b: int) -> CascadeTail:
        def zf(x):
            lg, kv, hd = x.shape[0], x.shape[3], x.shape[4]
            dt = cfg.dtype if x.dtype == jnp.int8 else x.dtype
            return jnp.zeros((lg, 1, s_sfx + tail_slots, b * kv, hd), dt)

        return CascadeTail(
            sfx_ks=tuple(zf(kk) for kk in pool.ks),
            sfx_vs=tuple(zf(vv) for vv in pool.vs),
            sfx_lens=jnp.zeros((b,), jnp.int32),
            pos_base=jnp.zeros((b,), jnp.int32),
        )

    update_mask = _make_update_mask(k)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def verify_chunk(params, tokens, tail: CascadeTail, pool, page, d,
                     acc_counts, acc_mask):
        layers = params["layers"]
        x = qwen2.embed_tokens(params, tokens, cfg)  # [B, k, D]
        cos, sin, step_idx, tail_vis = _verify_pos_tail(
            cfg, tail.pos_base, acc_counts, k, d, tail_slots, acc_mask
        )
        kpos_s = jnp.arange(s_sfx)
        base = jnp.concatenate(
            [kpos_s[None, :] < tail.sfx_lens[:, None], tail_vis], axis=1
        )
        new_ks, new_vs = [], []
        for gi, (lo, hi) in enumerate(bounds):
            x, sk, sv = qwen2.paged_cascade_verify_layers(
                layers, lo, hi, x, cos, sin, pool.ks[gi], pool.vs[gi],
                pool.lens[gi], page, tail.sfx_ks[gi], tail.sfx_vs[gi],
                base, step_idx, s_sfx, cfg,
                k_scales=None if pool.k_scales is None else pool.k_scales[gi],
                v_scales=None if pool.v_scales is None else pool.v_scales[gi],
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

    return make_tail, update_mask, verify_chunk


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
             "spec_dispatches": d}
    return ids, time_decoding, stats


@functools.lru_cache(maxsize=8)
def build_decode_step_dycoke(cfg: DecoderConfig, spec, dyc: DycokeDecodeOptions):
    """Decode step with DyCoke stage-2 KV pruning. Single layer group only
    (the reference prunes at prefill layer 0, run_vidqa.sh dycoke cfgs)."""
    specs = _normalize_specs(spec)
    bounds = _group_bounds(cfg, specs)
    non_empty = [(gi, b) for gi, b in enumerate(bounds) if b[1] > b[0]]
    if len(non_empty) != 1:
        raise ValueError(
            "dycoke stage-2 decode requires a single (non-empty) layer group — "
            "run stage 1 at layer 0 like the reference (run_vidqa.sh dycoke cfgs)"
        )
    g0, (lo, hi) = non_empty[0]
    l = max(lo, min(dyc.layer_idx, hi - 1))

    def fn(params, token, cache, step, dstate, video_start):
        layers = params["layers"]
        x = qwen2.embed_tokens(params, token, cfg)[:, None, :]
        pos = (cache.pos_base + step)[None].astype(jnp.int32)
        cos, sin = qwen2.rope_cos_sin(cfg, pos)
        s_c = cache.ks[g0].shape[2]
        tail_start = s_c - MAX_DECODE
        kv_len = cache.lens[g0]

        # layers [lo, l] with the carried mask; layer l's q drives the ranking
        x, ck, cv, q_all = qwen2.decode_layers(
            layers, lo, l + 1, x, cos, sin, cache.ks[g0][: l + 1 - lo],
            cache.vs[g0][: l + 1 - lo], kv_len, step, tail_start, cfg,
            kv_mask=dstate.keep_mask,
        )
        # head-mean attention of the current token at layer l
        q = q_all[-1][:, 0].astype(jnp.float32)  # [B, H, hd]
        kl = ck[-1].astype(jnp.float32)  # [B, S_c, KV, hd]
        b, s_c, kvh, hd = kl.shape
        g = cfg.num_heads // kvh
        att = jnp.einsum(
            "bhgd,bshd->bhgs", q.reshape(b, kvh, g, hd), kl,
            precision=jax.lax.Precision.HIGHEST,
        ) * (hd**-0.5)
        kpos = jnp.arange(s_c)
        seen = (kpos < kv_len) | ((kpos >= tail_start) & (kpos <= tail_start + step))
        valid = seen[None, None, None] & dstate.keep_mask[None, None, None]
        att = jnp.where(valid, att, -1e30)
        probs = jax.nn.softmax(att, axis=-1).reshape(b, cfg.num_heads, s_c).mean(1)[0]
        img_att = jax.lax.dynamic_slice(probs, (video_start,), (dyc.img_len,))

        # drift check (cosine vs previous step's image attention; first step
        # always prunes — reference similarity init 0 < 0.9)
        num = (img_att * dstate.attn_score).sum()
        den = jnp.linalg.norm(img_att) * jnp.maximum(jnp.linalg.norm(dstate.attn_score), 1e-8)
        sim = jnp.where(dstate.has_score, num / jnp.maximum(den, 1e-8), 0.0)

        n_keep = int(dyc.img_len * (1 - dyc.ratio))
        _, top = jax.lax.top_k(img_att, n_keep)
        img_keep = jnp.zeros((dyc.img_len,), bool).at[top].set(True)
        new_mask = jnp.ones((s_c,), bool)
        new_mask = jax.lax.dynamic_update_slice(new_mask, img_keep, (video_start,))
        keep_mask = jnp.where(sim < dyc.drift_thresh, new_mask, dstate.keep_mask)

        # layers (l, hi) see the (possibly) updated selection immediately
        x, ck2, cv2, _ = qwen2.decode_layers(
            layers, l + 1, hi, x, cos, sin, cache.ks[g0][l + 1 - lo :],
            cache.vs[g0][l + 1 - lo :], kv_len, step, tail_start, cfg,
            kv_mask=keep_mask,
        )
        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
        logits = qwen2.lm_head(params, cfg, h)[:, 0]
        merged_k = jnp.concatenate([ck, ck2], axis=0)
        merged_v = jnp.concatenate([cv, cv2], axis=0)
        ks = tuple(merged_k if gi == g0 else cache.ks[gi] for gi in range(len(bounds)))
        vs = tuple(merged_v if gi == g0 else cache.vs[gi] for gi in range(len(bounds)))
        new_cache = dataclasses.replace(cache, ks=ks, vs=vs)
        new_state = DycokeState(
            keep_mask=keep_mask, attn_score=img_att, has_score=jnp.array(True)
        )
        return logits, new_cache, new_state

    return jax.jit(fn, donate_argnums=(2,))


def generate(
    params,
    cfg: DecoderConfig,
    embeds: jnp.ndarray,
    valid_len: int,
    video_start: int,
    spec,
    gen: GenerateConfig = GenerateConfig(),
    impl: str = "xla",
    position_ids=None,
    attn_sinks: int = 0,
    attn_window: int = 0,
    dycoke: DycokeDecodeOptions | None = None,
    pos_base=None,
    t_valid=None,
    decode_chunk_size: int = 1,
    spec_decode_k: int = 0,
    draft_fn=None,
    prompt_ids=None,
    spec_draft_layers: int = 0,
):
    """Greedy generation. Returns (token_ids list, runtime dict).

    ``spec`` may also be a FrameFusionSpec (layerwise budgeted merge-prune,
    runtime/framefusion.py), which uses its own prefill and a masked decode.

    ``decode_chunk_size`` > 1 generates tokens in on-device chunks (one
    dispatch per chunk, lax.scan over the step body — build_decode_chunk):
    token-exact vs the per-step loop, but ``time_decoding`` is then measured
    per chunk rather than per step. The final sub-chunk tail falls back to
    per-step dispatch so exactly max_new_tokens are respected.

    ``spec_decode_k`` >= 2 enables greedy speculative decoding: a drafter
    proposes k-1 tokens, one verify dispatch scores all of them
    (build_verify_step), and the accepted prefix plus the model's own
    correction advance the sequence — every emitted token is the model's
    own argmax, for any drafter, with up to k tokens per weight-read when
    drafts hit. Exactness caveat: the verify program's attention reduces in
    a different order than the single-step program (exactly like prefill vs
    decode), so argmax NEAR-TIES can resolve differently — bit-exact on the
    CPU fp32 tests; measured on v5e int8w8a with random weights (margins
    near zero) ~1 flipped token per 30 (logit deltas ~0.3 vs margins ~0.02,
    BENCH_EXTRA speculative_decode_round2); real checkpoints have decisive
    margins. ``draft_fn(history_ids, n) -> list[n]`` defaults to n-gram
    prompt-lookup over ``prompt_ids`` (if given) + generated ids
    (ngram_draft). Takes precedence over decode_chunk_size; unsupported
    with dycoke/StreamingLLM windows (falls back to their paths).
    ``spec_draft_layers`` = E > 0 switches to SELF-speculative drafting
    (build_selfspec_step): the draft runs the first E layers on device,
    fused with the verify in one dispatch — no token-history repetition
    needed, acceptance set by how well the early-exit head predicts the
    full model.
    """
    from .framefusion import FrameFusionSpec

    if isinstance(spec, FrameFusionSpec):
        return _generate_framefusion(
            params, cfg, embeds, valid_len, video_start, spec, gen, position_ids
        )
    s_full = embeds.shape[1]
    spec_key = spec if (spec is None or isinstance(spec, ReducerSpec)) else tuple(spec)
    prefill = build_prefill(cfg, spec_key, s_full, impl, attn_sinks, attn_window)
    if dycoke is not None:
        decode = build_decode_step_dycoke(cfg, spec_key, dycoke)
    else:
        decode = build_decode_step(
            cfg, spec_key, attn_sinks=attn_sinks, attn_window=attn_window
        )

    t0 = time.perf_counter()
    logits, cache = prefill(
        params, embeds, jnp.int32(valid_len), jnp.int32(video_start), position_ids,
        None if pos_base is None else jnp.int32(pos_base),
        None if t_valid is None else jnp.int32(t_valid),
    )
    logits.block_until_ready()
    ttft = time.perf_counter() - t0

    token = jnp.argmax(logits, -1).astype(jnp.int32)
    ids = [int(token[0])]
    merged_len = int(cache.merged_len)
    overflow = 0 if cache.budget_overflow is None else int(cache.budget_overflow)
    if overflow > 0:
        from ..utils.logging import rank0_print

        rank0_print(
            f"WARNING: merge kept {overflow} tokens beyond video_budget; "
            f"raster-last tokens dropped (raise --video_budget_ratio for parity)"
        )

    dstate = None
    if dycoke is not None:
        s_c = cache.ks[-1].shape[2]  # the (single) non-empty group's buffer
        dstate = DycokeState(
            keep_mask=jnp.ones((s_c,), bool),
            attn_score=jnp.zeros((dycoke.img_len,), jnp.float32),
            has_score=jnp.array(False),
        )

    time_decoding = 0.0
    step = 0
    spec_stats = None
    speculative = (
        spec_decode_k > 1 and dycoke is None and attn_sinks == 0 and attn_window == 0
    )
    if speculative:
        k = max(2, min(spec_decode_k, MAX_DECODE))
        selfspec = spec_draft_layers > 0
        if selfspec:  # layer-skip drafting happens on device, fused w/ verify
            vstep = build_selfspec_step(cfg, spec_key, k, spec_draft_layers)
        else:
            verify = build_verify_step(cfg, spec_key, k)
            drafter = draft_fn or ngram_draft
        history = (list(prompt_ids) if prompt_ids is not None else []) + ids
        n_drafted = n_hit = 0
        while (
            len(ids) < gen.max_new_tokens
            and ids[-1] not in gen.eos_token_ids
            and step + k <= MAX_DECODE
        ):
            t0 = time.perf_counter()
            if selfspec:
                out, cache = vstep(
                    params, jnp.asarray([ids[-1]], jnp.int32), cache, jnp.int32(step)
                )
                out = np.asarray(out)  # ONE host sync: preds [k] ++ drafts [k-1]
                preds, drafts = out[:k], [int(t) for t in out[k:]]
            else:
                drafts = [int(t) for t in drafter(history, k - 1)]
                feed = jnp.asarray([ids[-1]] + drafts, jnp.int32)
                logits, cache = verify(params, feed, cache, jnp.int32(step))
                preds = np.asarray(jnp.argmax(logits, -1))  # host sync
            time_decoding += time.perf_counter() - t0
            # preds[j] = model's next token after feed[j]; accept drafts
            # while they match, then append the model's own token (the
            # correction, or the bonus token when every draft matched)
            a = 0
            while a < k - 1 and drafts[a] == int(preds[a]):
                a += 1
            n_drafted += k - 1
            n_hit += a
            for t in (int(preds[j]) for j in range(a + 1)):
                ids.append(t)
                history.append(t)
                if t in gen.eos_token_ids or len(ids) >= gen.max_new_tokens:
                    break
            # feed[0..a] hold real history in slots step..step+a; the next
            # feed's first token (preds[a]) writes at step+a+1. Rejected
            # slots beyond sit past the next write bound and are overwritten.
            step += a + 1
        token = jnp.asarray([ids[-1]], jnp.int32)  # per-step tail fallback
        spec_stats = {"spec_drafted": n_drafted, "spec_accepted": n_hit}
    chunk = max(1, min(decode_chunk_size, gen.max_new_tokens - 1))
    if chunk > 1 and dycoke is None and not speculative:
        dchunk = build_decode_chunk(
            cfg, spec_key, chunk, attn_sinks=attn_sinks, attn_window=attn_window
        )
        eos_arr = jnp.asarray(list(gen.eos_token_ids) or [-1], jnp.int32)
        done = jnp.asarray(ids[-1] in gen.eos_token_ids)
        while step < gen.max_new_tokens - 1 and not bool(done):
            n_this = min(chunk, gen.max_new_tokens - 1 - step)
            t0 = time.perf_counter()
            token, cache, done, buf, n_run = dchunk(
                params, token, cache, jnp.int32(step), done, eos_arr, jnp.int32(n_this)
            )
            buf = np.asarray(buf)  # host sync
            time_decoding += time.perf_counter() - t0
            ids.extend(int(t) for t in buf if t >= 0)
            step += int(n_run)
    while len(ids) < gen.max_new_tokens and ids[-1] not in gen.eos_token_ids:
        t0 = time.perf_counter()
        if dycoke is not None:
            logits, cache, dstate = decode(
                params, token, cache, jnp.int32(step), dstate, jnp.int32(video_start)
            )
        else:
            logits, cache = decode(params, token, cache, jnp.int32(step))
        logits = jax.block_until_ready(logits)
        time_decoding += time.perf_counter() - t0
        token = jnp.argmax(logits, -1).astype(jnp.int32)
        ids.append(int(token[0]))
        step += 1

    runtime = {
        "ttft_llm": ttft,
        "time_decoding": time_decoding,
        "num_dec_token": len(ids),
        "merged_len": merged_len,
        "full_len": int(valid_len),
        "budget_overflow": overflow,
    }
    if spec_stats is not None:
        runtime.update(spec_stats)
    return ids, runtime


@functools.lru_cache(maxsize=8)
def _build_decode_step_masked(cfg: DecoderConfig):
    """Single-group decode with a fixed KV keep-mask (FrameFusion: dead
    merged/pruned slots stay masked through decode)."""

    def fn(params, token, cache, step, kv_mask):
        layers = params["layers"]
        x = qwen2.embed_tokens(params, token, cfg)[:, None, :]
        pos = (cache.pos_base + step)[None].astype(jnp.int32)
        if cfg.mrope_section:  # decode: all three M-RoPE rows advance together
            pos = jnp.broadcast_to(pos, (3, 1))
        cos, sin = qwen2.rope_cos_sin(cfg, pos)
        s_c = cache.ks[0].shape[2]
        x, ck, cv, _ = qwen2.decode_layers(
            layers, 0, cfg.num_layers, x, cos, sin, cache.ks[0], cache.vs[0],
            cache.lens[0], step, s_c - MAX_DECODE, cfg, kv_mask=kv_mask,
        )
        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
        logits = qwen2.lm_head(params, cfg, h)[:, 0]
        return logits, dataclasses.replace(cache, ks=(ck,), vs=(cv,))

    return jax.jit(fn, donate_argnums=(2,))


@functools.lru_cache(maxsize=8)
def _build_decode_step_masked2(cfg: DecoderConfig, cut: int):
    """Two-group decode for compacted FrameFusion: group 0 (layers < cut,
    full-length cache) hides dead slots via ``kv_mask``; group 1 (layers >=
    cut, budget-length cache) is densely packed (the valid-length bound
    suffices)."""

    def fn(params, token, cache, step, kv_mask0):
        layers = params["layers"]
        x = qwen2.embed_tokens(params, token, cfg)[:, None, :]
        pos = (cache.pos_base + step)[None].astype(jnp.int32)
        if cfg.mrope_section:
            pos = jnp.broadcast_to(pos, (3, 1))
        cos, sin = qwen2.rope_cos_sin(cfg, pos)
        x, ck0, cv0, _ = qwen2.decode_layers(
            layers, 0, cut, x, cos, sin, cache.ks[0], cache.vs[0],
            cache.lens[0], step, cache.ks[0].shape[2] - MAX_DECODE, cfg,
            kv_mask=kv_mask0,
        )
        x, ck1, cv1, _ = qwen2.decode_layers(
            layers, cut, cfg.num_layers, x, cos, sin, cache.ks[1], cache.vs[1],
            cache.lens[1], step, cache.ks[1].shape[2] - MAX_DECODE, cfg,
        )
        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
        logits = qwen2.lm_head(params, cfg, h)[:, 0]
        return logits, dataclasses.replace(cache, ks=(ck0, ck1), vs=(cv0, cv1))

    return jax.jit(fn, donate_argnums=(2,))


def _generate_framefusion(params, cfg, embeds, valid_len, video_start, spec, gen,
                          position_ids=None):
    from .framefusion import build_prefill_framefusion

    s_full = embeds.shape[1]
    prefill = build_prefill_framefusion(cfg, spec, s_full)
    if spec.compact_at_layer:
        return _generate_framefusion_compact(
            params, cfg, embeds, valid_len, video_start, spec, gen, prefill,
            position_ids,
        )
    decode = _build_decode_step_masked(cfg)

    t0 = time.perf_counter()
    logits, cache, alive = prefill(
        params, embeds, jnp.int32(valid_len), jnp.int32(video_start), position_ids
    )
    logits.block_until_ready()
    ttft = time.perf_counter() - t0

    # extend the mask over the decode tail (new tokens are always visible;
    # fixed-slot decode writes land there, and the [valid_len, s_full) pad
    # gap is hidden by decode_layers' composite mask)
    kv_mask = jnp.concatenate([alive, jnp.ones((MAX_DECODE,), bool)])
    token = jnp.argmax(logits, -1).astype(jnp.int32)
    ids = [int(token[0])]
    merged_len = int(alive.sum())

    time_decoding = 0.0
    step = 0
    while len(ids) < gen.max_new_tokens and ids[-1] not in gen.eos_token_ids:
        t0 = time.perf_counter()
        logits, cache = decode(params, token, cache, jnp.int32(step), kv_mask)
        logits = jax.block_until_ready(logits)
        time_decoding += time.perf_counter() - t0
        token = jnp.argmax(logits, -1).astype(jnp.int32)
        ids.append(int(token[0]))
        step += 1

    runtime = {
        "ttft_llm": ttft,
        "time_decoding": time_decoding,
        "num_dec_token": len(ids),
        "merged_len": merged_len,
        "full_len": int(valid_len),
    }
    return ids, runtime


def _generate_framefusion_compact(params, cfg, embeds, valid_len, video_start,
                                  spec, gen, prefill, position_ids=None):
    """FrameFusion with compaction: layers >= compact_at_layer run at the
    budget length (real TTFT saving, framefusion.py compact mode)."""
    s_full = embeds.shape[1]
    decode = _build_decode_step_masked2(cfg, spec.compact_at_layer)

    t0 = time.perf_counter()
    logits, cache, alive, (new_valid, exact, overflow) = prefill(
        params, embeds, jnp.int32(valid_len), jnp.int32(video_start), position_ids
    )
    logits.block_until_ready()
    ttft = time.perf_counter() - t0

    # group-0 mask: surviving tokens; the decode tail is always visible and
    # the pad gap is hidden by decode_layers' composite mask
    kv_mask0 = jnp.concatenate([alive, jnp.ones((MAX_DECODE,), bool)])
    token = jnp.argmax(logits, -1).astype(jnp.int32)
    ids = [int(token[0])]
    merged_len = int(new_valid)

    time_decoding = 0.0
    step = 0
    while len(ids) < gen.max_new_tokens and ids[-1] not in gen.eos_token_ids:
        t0 = time.perf_counter()
        logits, cache = decode(params, token, cache, jnp.int32(step), kv_mask0)
        logits = jax.block_until_ready(logits)
        time_decoding += time.perf_counter() - t0
        token = jnp.argmax(logits, -1).astype(jnp.int32)
        ids.append(int(token[0]))
        step += 1

    runtime = {
        "ttft_llm": ttft,
        "time_decoding": time_decoding,
        "num_dec_token": len(ids),
        "merged_len": merged_len,
        "full_len": int(valid_len),
        "compact_exact": bool(exact),
        "compact_overflow": int(overflow),
    }
    if not runtime["compact_exact"]:
        from ..utils.logging import rank0_print

        rank0_print(
            "WARNING: FrameFusion compaction fired before merge/prune finished "
            "(compact_exact=False); raise compact_at_layer for exact semantics"
        )
    return ids, runtime


def spec_from_pattern(pattern: str, t: int, h: int, w: int, **kw):
    """Library-level dispatcher mirroring the reference's
    replace_qwen2_by_sparse_attn(sa_pattern, ...) interface
    (token_merging_utils/monkey_patch_interface.py:17-38). Returns the
    reducer spec(s) for ``generate`` (None for origin/streamingllm —
    streaming is an attention-pattern flag, see generate(attn_sinks=...)).
    """
    from .framefusion import FrameFusionSpec

    nv = t * h * w
    layer = kw.get("sa_start_layer_idx", 2)
    pad = kw.get("pad_multiple", 1)
    if pattern == "origin" or pattern == "streamingllm":
        return None
    if pattern == "quadtree":
        return ReducerSpec(
            kind="quadtree", layer_idx=layer, t=t, h=h, w=w,
            video_budget=kw.get("video_budget", int(0.6 * nv)),
            spatial_thresh=kw.get("sa_tree_thresh", 0.9),
            temporal_thresh=kw.get("sa_tree_temporal_thresh", -1.0),
            root_level=kw.get("sa_tree_root_level", 0),
            weighted_avg=kw.get("sa_tree_weighted_avg", False),
            sim_head_dim=kw.get("sim_head_dim"),
            pos_emb_ver=kw.get("pos_emb_ver", 0),
            pad_multiple=pad,
        )
    if pattern == "tome":
        return ReducerSpec(kind="tome", layer_idx=layer, t=t, h=h, w=w,
                           prune_ratio=kw.get("sa_prune_ratio", 0.5),
                           tome_per=kw.get("sa_tome_ver", "video"),
                           pad_multiple=pad)
    if pattern in ("dycoke-stage1", "dycoke"):
        return ReducerSpec(kind="dycoke", layer_idx=layer, t=t, h=h, w=w,
                           prune_ratio=kw.get("sa_prune_ratio", 0.7),
                           pad_multiple=pad)
    if pattern == "fastv":
        return ReducerSpec(kind="fastv", layer_idx=layer, t=t, h=h, w=w,
                           prune_ratio=kw.get("sa_fastv_evict_ratio", 0.5),
                           pad_multiple=pad)
    if pattern == "octree":
        return ReducerSpec(kind="octree", layer_idx=layer, t=t, h=h, w=w,
                           video_budget=kw.get("video_budget", int(0.6 * nv)),
                           spatial_thresh=kw.get("sa_tree_thresh", 0.9),
                           root_level=kw.get("sa_tree_root_level", 0),
                           pad_multiple=pad)
    if pattern == "pyrd":
        specs, hh, ww = [], h, w
        for loc, size in zip(kw["sa_pyrd_loc_list"], kw["sa_pyrd_size_list"]):
            specs.append(ReducerSpec(kind="pyrd", layer_idx=loc, t=t, h=hh, w=ww,
                                     pyrd_size=size, pad_multiple=pad))
            hh = ww = size
        return tuple(specs)
    if pattern in ("framefusion", "merging"):
        return FrameFusionSpec(cost=kw.get("sa_framefusion_cost", 0.3), t=t, h=h, w=w,
                               enable_prune=pattern == "framefusion",
                               compact_at_layer=kw.get("sa_framefusion_compact_layer", 0),
                               compact_budget=kw.get("sa_framefusion_compact_budget", 0))
    raise ValueError(f"unknown sa_pattern {pattern!r}")


def generate_batch(
    params,
    cfg: DecoderConfig,
    embeds: jnp.ndarray,
    valid_lens,
    video_starts,
    spec,
    gen: GenerateConfig = GenerateConfig(),
    impl: str = "xla",
    position_ids=None,
    decode_chunk_size: int = 1,
    decode_attn_kernel: bool = False,
    pos_bases=None,
    t_valids=None,
    spec_decode_k: int = 0,
    histories=None,
    draft_fn=None,
):
    """Batched greedy generation — beyond the reference's strict batch=1
    (eval_vidqa_by_feat_llavavideo.py:208). Samples share (s_full, spec);
    per-sample valid lengths/video starts vary. embeds: [B, s_full, D];
    valid_lens/video_starts: [B]. position_ids: optional [B, ...] per-sample.

    Implementation (the standard serving split): prefills run SEQUENTIALLY
    (a 25k-token prefill's activations are per-sample and large), then decode
    runs HEAD-PACKED: the batch is folded into the cache's KV-head axis
    ([Lg, 1, S, B*KV, hd]) so the batched decode program is shape-identical
    to the single-sample one and each step reads the weights once (decode is
    weight-bandwidth-bound). Attention is per-head independent, so the
    folding is exact. A real batch axis — via vmap OR natively — makes
    XLA:TPU's attention-read and cache-update layout preferences collide and
    the per-layer cache updates stop aliasing in place (measured 10x decode
    slowdown at batch 2-4 at the 7B operating point, see decode_layers).
    Returns (ids list-of-lists, runtime dict).

    ``spec_decode_k >= 2`` runs BATCHED greedy speculative decoding instead
    of the chunked loop (build_verify_chunk_batch): per-row n-gram drafts,
    one dispatch verifies B*k tokens for ~one weight read. Token-exact for
    any drafter. ``histories`` (optional, per-row prompt token ids) seeds
    the drafter like generate()'s prompt_ids.
    """
    b, s_full, _ = embeds.shape
    spec_key = spec if (spec is None or isinstance(spec, ReducerSpec)) else tuple(spec)
    prefill = build_prefill(cfg, spec_key, s_full, impl)
    chunk = max(1, min(decode_chunk_size, gen.max_new_tokens))
    speculative = spec_decode_k > 1
    if speculative:
        k, tail_slots, (init_row_buf, insert_row, update_mask, verify_chunk) = (
            _spec_batch_builders(cfg, spec_key, spec_decode_k, gen)
        )
        _batched_init = lambda x: init_row_buf(x, b)
    else:
        insert_row, decode_chunk = build_decode_chunk_batch(
            cfg, spec_key, chunk, tuple(gen.eos_token_ids), cfg.num_kv_heads,
            attn_kernel=decode_attn_kernel,
        )

        # Prefill samples sequentially, inserting each cache row into the
        # batched buffer in place (donated): ks/vs rows land in the cache's
        # KV-HEAD axis at offset i*KV (head packing), scalar leaves (lens,
        # pos_base) become [B]. Holding all per-sample caches and stacking at
        # the end would peak at 2x the batched-cache footprint — which OOMs
        # one v5e chip at the full 28-layer 7B point.
        def _batched_init(x):
            return _batched_like(x, b)

    vl = jnp.asarray(valid_lens, jnp.int32)
    vs = jnp.asarray(video_starts, jnp.int32)

    t0 = time.perf_counter()
    logits_rows, cache = [], None
    for i in range(b):
        p = None if position_ids is None else jnp.asarray(position_ids)[i]
        pb = None if pos_bases is None else jnp.int32(pos_bases[i])
        tv = None if t_valids is None else jnp.int32(t_valids[i])
        out = prefill(params, embeds[i : i + 1], vl[i], vs[i], p, pb, tv)
        jax.block_until_ready(out[0])
        logits_rows.append(out[0])
        ci = out[1]
        if cache is None:
            cache = jax.tree.map(_batched_init, ci)
        cache = insert_row(cache, ci, jnp.int32(i))
        del out, ci
    logits = jnp.concatenate(logits_rows)  # [B, V]
    logits.block_until_ready()
    ttft = time.perf_counter() - t0

    merged_lens = [int(m) for m in cache.merged_len]
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
        "full_len": [int(v) for v in vl],
        **spec_stats,
    }
    return ids, runtime


def _batched_greedy_decode(params, logits, cache, gen: GenerateConfig, decode_chunk, chunk: int):
    """Shared batched greedy-decode loop (generate_batch /
    generate_batch_from_prefix): chunked head-packed decode with
    freeze-after-EOS. Returns (ids list-of-lists, time_decoding)."""
    token = jnp.argmax(logits, -1).astype(jnp.int32)  # [B]
    b = token.shape[0]
    ids = [[int(t)] for t in token]
    eos = set(gen.eos_token_ids)
    done = jnp.asarray([ids[i][-1] in eos for i in range(b)])
    time_decoding = 0.0
    step = 0
    while step < gen.max_new_tokens - 1 and not bool(jnp.all(done)):
        n_this = min(chunk, gen.max_new_tokens - 1 - step)
        t0 = time.perf_counter()
        token, cache, done, buf, n = decode_chunk(
            params, token, cache, jnp.int32(step), done, jnp.int32(n_this)
        )
        buf = np.asarray(buf)  # host sync
        time_decoding += time.perf_counter() - t0
        for i in range(b):
            for j in range(int(n)):
                if buf[i, j] >= 0 and len(ids[i]) < gen.max_new_tokens:
                    ids[i].append(int(buf[i, j]))
        step += int(n)
    return ids, time_decoding


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
    """
    b, s_sfx, _ = suffix_embeds.shape
    spec_key = spec if (spec is None or isinstance(spec, ReducerSpec)) else tuple(spec)
    extend = build_extend(cfg, spec_key, s_sfx)
    chunk = max(1, min(decode_chunk_size, gen.max_new_tokens))
    speculative = spec_decode_k > 1
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
            s_sfx,
        )
        insert_row = None
        decode_chunk = (
            lambda p, tok, c, st, d, n: decode_chunk_c(p, tok, c, prefix_cache, st, d, n)
        )
    else:
        insert_row, decode_chunk = build_decode_chunk_batch(
            cfg, spec_key, chunk, tuple(gen.eos_token_ids), cfg.num_kv_heads,
            attn_kernel=decode_attn_kernel,
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
