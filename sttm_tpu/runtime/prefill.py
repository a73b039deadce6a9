"""Jitted STTM prefill: layer groups with reducers firing between them.

Split from runtime/generate.py. Mirrors the reference's merged prefill
(quadtree_attn_monkey_patch.py:114-115 truncate+recompute positions;
M-RoPE/FastV gather source positions, token_merging_qwen2vl_monkey_patch
:109-113). All shapes static per (config, specs, s_full).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models import qwen2
from ..models.config import DecoderConfig
from .common import MAX_DECODE, _buffer_lens, _group_bounds, _normalize_specs
from .reducer import apply_reducer

@functools.lru_cache(maxsize=32)
def build_prefill(
    cfg: DecoderConfig,
    spec,
    s_full: int,
    impl: str,
    attn_sinks: int = 0,
    attn_window: int = 0,
    kv_int8: bool = False,
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

    ``kv_int8=True`` returns the int8 live cache DIRECTLY: each layer's K/V
    quantizes inside the prefill scan (qwen2.prefill_layers kv_int8), so
    the full bf16 cache never materializes — the quantize_kv_cache handoff
    held bf16 + int8 copies simultaneously, and that transient (not the
    steady state) was what capped the flat batch at the same b=5 as bf16
    (BENCH_KV_INT8.json round 4). Bitwise-identical codes/scales to the
    handoff path. Groups that must rank FastV attention scores keep bf16
    K through the score einsum and quantize after (score-exact; those
    groups sit below the merge layer and are small).
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
        ks, vs, lens, kscs, vscs = [], [], [], [], []

        for gi, (lo, hi) in enumerate(bounds):
            needs_scores = gi < len(specs) and specs[gi].needs_scores
            # score-ranking groups keep bf16 K through the FastV einsum and
            # quantize below — identical codes either way (same bf16 values)
            g_inline = kv_int8 and not needs_scores
            out = qwen2.prefill_layers(
                layers, lo, hi, x, cos, sin, valid, cfg, impl,
                collect_last_q=needs_scores,
                attn_sinks=attn_sinks, attn_window=attn_window,
                kv_int8=g_inline,
            )
            x, k_all, v_all = out[0], out[1], out[2]
            if g_inline:
                kscs.append(out[3])
                vscs.append(out[4])
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
                if kv_int8 and not g_inline:
                    # score group: quantize AFTER the bf16 score einsum
                    # (ranking stays exact vs the handoff path)
                    ks[-1], ksc_g = qwen2.quantize_kv(ks[-1])
                    vs[-1], vsc_g = qwen2.quantize_kv(vs[-1])
                    kscs.append(ksc_g)
                    vscs.append(vsc_g)
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

        def with_tail_sc(buf):
            # decode-tail scales: quantize_kv of a zero row yields
            # max(0, 1e-8) = 1e-8, so the inline cache matches the
            # quantize_kv_cache handoff bitwise on the tail too
            if buf.shape[0] == 0:
                return buf
            l, b, s, kv = buf.shape
            return jnp.concatenate(
                [buf, jnp.full((l, b, MAX_DECODE, kv), 1e-8, jnp.float32)],
                axis=2,
            )

        scale_kw = {}
        if kv_int8:
            scale_kw = dict(
                k_scales=tuple(with_tail_sc(sc) for sc in kscs),
                v_scales=tuple(with_tail_sc(sc) for sc in vscs),
            )
        # lens[gi] is the packed valid length group gi ran at (i.e. the
        # validity BEFORE its following reducer) — exactly its cache length
        cache = qwen2.KVCache(
            ks=tuple(with_tail(k) for k in ks),
            vs=tuple(with_tail(v) for v in vs),
            lens=tuple(lens),
            pos_base=pos_base,
            budget_overflow=overflow if specs else None,
            **scale_kw,
        )
        return logits, cache

    return jax.jit(fn)
