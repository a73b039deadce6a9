"""Single-token, chunked, and head-packed batched decode builders.

Split from runtime/generate.py. The decode-path design rules (measured,
CLAUDE.md): carry the KV cache and dynamic-update-slice in place (never
scan xs->ys), head-pack the batch into the KV-head axis (a real batch axis
makes XLA:TPU attention-read and cache-update layouts collide), and keep
all builders module-level + lru-cached (inner jitted defs retrace per call).
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
    DycokeDecodeOptions,
    DycokeState,
    GenerateConfig,
    _group_bounds,
    _normalize_specs,
)

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

        kv_int8 = cache.k_scales is not None
        new_ks, new_vs, new_ksc, new_vsc = [], [], [], []
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
            out = qwen2.decode_layers(
                layers, lo, hi, x, cos, sin, cache.ks[gi], cache.vs[gi],
                kv_len, step, tail_start, cfg, kv_mask=kv_mask, unroll=unroll,
                attn_kernel=attn_kernel, head_packed=head_packed,
                tail_min=tail_min,
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
        logits = qwen2.lm_head(params, cfg, h)[:, 0]
        new_cache = dataclasses.replace(
            cache, ks=tuple(new_ks), vs=tuple(new_vs),
            k_scales=tuple(new_ksc) if kv_int8 else None,
            v_scales=tuple(new_vsc) if kv_int8 else None,
        )
        return logits, new_cache

    return jax.jit(fn, donate_argnums=(2,)) if jit else fn


def _batched_like(x, b: int):
    """Zero-filled head-packed batched buffer shaped like one sample's cache
    leaf: [Lg, 1, S, KV, hd] -> [Lg, 1, S, B*KV, hd]; scalar leaves -> [B]."""
    x = jnp.asarray(x)
    if x.ndim >= 2:
        return jnp.zeros(x.shape[:3] + (b * x.shape[3],) + x.shape[4:], x.dtype)
    return jnp.zeros((b,), x.dtype)

@functools.lru_cache(maxsize=16)
def build_decode_chunk(
    cfg: DecoderConfig,
    spec,
    chunk: int,
    attn_sinks: int = 0,
    attn_window: int = 0,
    unroll: bool = False,
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
        cfg, spec, jit=False, attn_sinks=attn_sinks, attn_window=attn_window,
        unroll=unroll,
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

def _chunked_greedy_loop(decode_fn, chunk: int, eos_arr_np, sample=None):
    """The shared batched freeze-after-EOS chunked-decode loop (scan + cond,
    NOT while_loop — the round-1 while_loop variant compiled pathologically
    through remote-compile tunnels; steps past n_steps or after every row
    hit EOS take the identity branch, no weight reads). Used by the flat,
    cascade, and paged decode-chunk builders, whose only difference is the
    per-step decode closure. decode_fn(token [B], carry, step) ->
    (logits [B, V], carry). Returns loop(token, carry, start_step, done0,
    n_steps, sample_args) -> (token, carry, done, buf [B, chunk] int32 with
    -1 after EOS, n_run).

    ``sample`` = (top_k, use_top_p) switches on-device token selection from
    argmax to temperature/top-k/top-p sampling (runtime/sampling.py
    sample_body); the loop then needs ``sample_args`` = (key, temperature,
    top_p) and folds the GLOBAL step index into the key — every decoded
    position draws a distinct, replayable key regardless of chunk size
    (+1 offset: fold 0 is the caller's prefill first-token draw)."""

    def loop(token, carry0, start_step, done0, n_steps, sample_args=None):
        eos_arr = jnp.asarray(eos_arr_np)

        def real(tok, c, done, i):
            lg, c2 = decode_fn(tok, c, start_step + i)
            if sample is None:
                nxt = jnp.argmax(lg, -1).astype(jnp.int32)
            else:
                from .sampling import sample_body

                key, temperature, top_p = sample_args
                nxt = sample_body(*sample)(
                    lg, jax.random.fold_in(key, start_step + i + 1),
                    temperature, top_p,
                )
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
    sample: tuple | None = None,  # (top_k, use_top_p) -> sampled decode
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
        if x.ndim >= 2:  # KV [Lg, 1, S, KV, hd] / kv_int8 scales
            # [Lg, 1, S, KV] — both land at head offset i*kvh
            idx = (0, 0, 0, i * kvh) + (0,) * (x.ndim - 4)
            return jax.lax.dynamic_update_slice(buf, x, idx)
        return jax.lax.dynamic_update_index_in_dim(buf, x, i, 0)

    insert_row = jax.jit(
        lambda buf_tree, row_tree, i: jax.tree.map(
            lambda buf, x: _row_insert(buf, x, i), buf_tree, row_tree
        ),
        donate_argnums=(0,),
    )

    if chunk == 1:

        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode_chunk(p, token, cache, start_step, done0, n_steps,
                         tail_min=None, sample_args=None):
            eos_arr = jnp.asarray(eos_arr_np)
            lg, c2 = decode(p, token, cache, start_step, tail_min)  # [B, V]
            if sample is None:
                nxt = jnp.argmax(lg, -1).astype(jnp.int32)
            else:
                from .sampling import sample_body

                key, temperature, top_p = sample_args
                nxt = sample_body(*sample)(
                    lg, jax.random.fold_in(key, start_step + 1),
                    temperature, top_p,
                )
            nxt = jnp.where(done0, token, nxt)
            buf = jnp.where(done0, -1, nxt)[:, None]
            done = done0 | jnp.any(nxt[:, None] == eos_arr[None, :], axis=-1)
            return nxt, c2, done, buf, jnp.int32(1)

    else:

        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode_chunk(p, token, cache, start_step, done0, n_steps,
                         tail_min=None, sample_args=None):
            loop = _chunked_greedy_loop(
                lambda tok, c, i: decode(p, tok, c, i, tail_min),
                chunk, eos_arr_np, sample=sample,
            )
            return loop(token, cache, start_step, done0, n_steps, sample_args)

    return insert_row, decode_chunk

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
        kv_int8 = cache.k_scales is not None
        layers = params["layers"]
        x = qwen2.embed_tokens(params, token, cfg)[:, None, :]
        pos = (cache.pos_base + step)[None].astype(jnp.int32)
        cos, sin = qwen2.rope_cos_sin(cfg, pos)
        s_c = cache.ks[g0].shape[2]
        tail_start = s_c - MAX_DECODE
        kv_len = cache.lens[g0]

        # layers [lo, l] with the carried mask; layer l's q drives the ranking
        out = qwen2.decode_layers(
            layers, lo, l + 1, x, cos, sin, cache.ks[g0][: l + 1 - lo],
            cache.vs[g0][: l + 1 - lo], kv_len, step, tail_start, cfg,
            kv_mask=dstate.keep_mask,
            cache_ksc=cache.k_scales[g0][: l + 1 - lo] if kv_int8 else None,
            cache_vsc=cache.v_scales[g0][: l + 1 - lo] if kv_int8 else None,
        )
        if kv_int8:
            x, ck, cv, ksc, vsc, q_all = out
        else:
            x, ck, cv, q_all = out
        # head-mean attention of the current token at layer l
        q = q_all[-1][:, 0].astype(jnp.float32)  # [B, H, hd]
        kl = ck[-1].astype(jnp.float32)  # [B, S_c, KV, hd]
        b, s_c, kvh, hd = kl.shape
        g = cfg.num_heads // kvh
        att = jnp.einsum(
            "bhgd,bshd->bhgs", q.reshape(b, kvh, g, hd), kl,
            precision=jax.lax.Precision.HIGHEST,
        ) * (hd**-0.5)
        if kv_int8:  # dequantize the ranking scores like the attention read
            att = att * ksc[-1].transpose(0, 2, 1)[:, :, None, :]
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
        out2 = qwen2.decode_layers(
            layers, l + 1, hi, x, cos, sin, cache.ks[g0][l + 1 - lo :],
            cache.vs[g0][l + 1 - lo :], kv_len, step, tail_start, cfg,
            kv_mask=keep_mask,
            cache_ksc=cache.k_scales[g0][l + 1 - lo :] if kv_int8 else None,
            cache_vsc=cache.v_scales[g0][l + 1 - lo :] if kv_int8 else None,
        )
        if kv_int8:
            x, ck2, cv2, ksc2, vsc2, _ = out2
        else:
            x, ck2, cv2, _ = out2
        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
        logits = qwen2.lm_head(params, cfg, h)[:, 0]
        merged_k = jnp.concatenate([ck, ck2], axis=0)
        merged_v = jnp.concatenate([cv, cv2], axis=0)
        ks = tuple(merged_k if gi == g0 else cache.ks[gi] for gi in range(len(bounds)))
        vs = tuple(merged_v if gi == g0 else cache.vs[gi] for gi in range(len(bounds)))
        if kv_int8:
            mk = jnp.concatenate([ksc, ksc2], axis=0)
            mv = jnp.concatenate([vsc, vsc2], axis=0)
            kscs = tuple(mk if gi == g0 else cache.k_scales[gi]
                         for gi in range(len(bounds)))
            vscs = tuple(mv if gi == g0 else cache.v_scales[gi]
                         for gi in range(len(bounds)))
        new_cache = dataclasses.replace(
            cache, ks=ks, vs=vs,
            k_scales=kscs if kv_int8 else None,
            v_scales=vscs if kv_int8 else None,
        )
        new_state = DycokeState(
            keep_mask=keep_mask, attn_score=img_att, has_score=jnp.array(True)
        )
        return logits, new_cache, new_state

    return jax.jit(fn, donate_argnums=(2,))

@functools.lru_cache(maxsize=8)
def _build_decode_step_masked(cfg: DecoderConfig):
    """Single-group decode with a fixed KV keep-mask (FrameFusion: dead
    merged/pruned slots stay masked through decode)."""

    def fn(params, token, cache, step, kv_mask):
        kv_int8 = cache.k_scales is not None
        layers = params["layers"]
        x = qwen2.embed_tokens(params, token, cfg)[:, None, :]
        pos = (cache.pos_base + step)[None].astype(jnp.int32)
        if cfg.mrope_section:  # decode: all three M-RoPE rows advance together
            pos = jnp.broadcast_to(pos, (3, 1))
        cos, sin = qwen2.rope_cos_sin(cfg, pos)
        s_c = cache.ks[0].shape[2]
        out = qwen2.decode_layers(
            layers, 0, cfg.num_layers, x, cos, sin, cache.ks[0], cache.vs[0],
            cache.lens[0], step, s_c - MAX_DECODE, cfg, kv_mask=kv_mask,
            cache_ksc=cache.k_scales[0] if kv_int8 else None,
            cache_vsc=cache.v_scales[0] if kv_int8 else None,
        )
        if kv_int8:
            x, ck, cv, ksc, vsc, _ = out
        else:
            x, ck, cv, _ = out
        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
        logits = qwen2.lm_head(params, cfg, h)[:, 0]
        return logits, dataclasses.replace(
            cache, ks=(ck,), vs=(cv,),
            k_scales=(ksc,) if kv_int8 else None,
            v_scales=(vsc,) if kv_int8 else None,
        )

    return jax.jit(fn, donate_argnums=(2,))


@functools.lru_cache(maxsize=8)
def _build_decode_step_masked2(cfg: DecoderConfig, cut: int):
    """Two-group decode for compacted FrameFusion: group 0 (layers < cut,
    full-length cache) hides dead slots via ``kv_mask``; group 1 (layers >=
    cut, budget-length cache) is densely packed (the valid-length bound
    suffices)."""

    def fn(params, token, cache, step, kv_mask0):
        kv_int8 = cache.k_scales is not None
        layers = params["layers"]
        x = qwen2.embed_tokens(params, token, cfg)[:, None, :]
        pos = (cache.pos_base + step)[None].astype(jnp.int32)
        if cfg.mrope_section:
            pos = jnp.broadcast_to(pos, (3, 1))
        cos, sin = qwen2.rope_cos_sin(cfg, pos)
        out0 = qwen2.decode_layers(
            layers, 0, cut, x, cos, sin, cache.ks[0], cache.vs[0],
            cache.lens[0], step, cache.ks[0].shape[2] - MAX_DECODE, cfg,
            kv_mask=kv_mask0,
            cache_ksc=cache.k_scales[0] if kv_int8 else None,
            cache_vsc=cache.v_scales[0] if kv_int8 else None,
        )
        if kv_int8:
            x, ck0, cv0, ksc0, vsc0, _ = out0
        else:
            x, ck0, cv0, _ = out0
        out1 = qwen2.decode_layers(
            layers, cut, cfg.num_layers, x, cos, sin, cache.ks[1], cache.vs[1],
            cache.lens[1], step, cache.ks[1].shape[2] - MAX_DECODE, cfg,
            cache_ksc=cache.k_scales[1] if kv_int8 else None,
            cache_vsc=cache.v_scales[1] if kv_int8 else None,
        )
        if kv_int8:
            x, ck1, cv1, ksc1, vsc1, _ = out1
        else:
            x, ck1, cv1, _ = out1
        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
        logits = qwen2.lm_head(params, cfg, h)[:, 0]
        return logits, dataclasses.replace(
            cache, ks=(ck0, ck1), vs=(cv0, cv1),
            k_scales=(ksc0, ksc1) if kv_int8 else None,
            v_scales=(vsc0, vsc1) if kv_int8 else None,
        )

    return jax.jit(fn, donate_argnums=(2,))

def _batched_greedy_decode(params, logits, cache, gen: GenerateConfig, decode_chunk, chunk: int):
    """Shared batched decode loop (generate_batch /
    generate_batch_from_prefix): chunked head-packed decode with
    freeze-after-EOS. Greedy by default; when ``gen.sampling`` is active the
    decode_chunk must have been built with the matching
    static_sample_key(gen.sampling) and tokens are drawn on device with
    global-step-folded keys (seed-replayable). Returns (ids list-of-lists,
    time_decoding)."""
    from .sampling import sample_args_of, select_token

    sp = gen.sampling
    sargs = sample_args_of(sp)
    token = select_token(logits, sp, None if sargs is None else sargs[0], 0)
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
            params, token, cache, jnp.int32(step), done, jnp.int32(n_this),
            sample_args=sargs,
        )
        buf = np.asarray(buf)  # host sync
        time_decoding += time.perf_counter() - t0
        for i in range(b):
            for j in range(int(n)):
                if buf[i, j] >= 0 and len(ids[i]) < gen.max_new_tokens:
                    ids[i].append(int(buf[i, j]))
        step += int(n)
    return ids, time_decoding
