"""Paged prefix pools: P distinct video prefixes shared across serving slots.

Split from runtime/generate.py. Each video's [sys|video] prefill lives ONCE
in HBM regardless of slot count; slots carry a page index and the decode
step reads each distinct page once (qwen2.paged_cascade_attention).
``int8=True`` pools halve pool HBM + per-step prefix read traffic.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models import qwen2
from ..models.config import DecoderConfig
from .cascade import CascadeTail
from .common import MAX_DECODE, _group_bounds, _normalize_specs
from .decode import _chunked_greedy_loop
from .spec import _make_update_mask, _verify_pos_tail

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
