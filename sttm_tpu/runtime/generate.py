"""Prefill/decode runtime with TTFT + decode-time instrumentation.

Mirrors the reference's forked ``_sample`` measurement semantics
(llava/model/language_model/llava_qwen.py:238-331): the first forward's
device-synchronized wall-clock is ``ttft_llm``; subsequent single-token
forwards accumulate ``time_decoding``; the merged token count is read from the
last layer group's cache length (llava_qwen.py:258). Greedy decoding, ≤
``max_new_tokens`` (the harness uses 32, eval_vidqa_by_feat_llavavideo.py:164).

All shapes are static per (config, spec, s_full): functions are built once and
cached; the host loop only feeds scalars.
"""

from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp

from ..models import qwen2
from ..models.config import DecoderConfig
from .reducer import ReducerSpec, apply_reducer, merged_buffer_len

__all__ = ["GenerateConfig", "build_prefill", "build_decode_step", "generate"]

MAX_DECODE = 64


@dataclasses.dataclass(frozen=True)
class GenerateConfig:
    max_new_tokens: int = 32
    eos_token_ids: tuple = (151645, 151643)  # Qwen2 <|im_end|>, <|endoftext|>


def _split_idx(cfg: DecoderConfig, spec: ReducerSpec | None) -> int:
    if spec is None:
        return cfg.num_layers
    return max(0, min(spec.layer_idx, cfg.num_layers))


@functools.lru_cache(maxsize=16)
def build_prefill(cfg: DecoderConfig, spec: ReducerSpec | None, s_full: int, impl: str):
    """Jitted prefill: (params, embeds [1, s_full, D], valid_len, video_start,
    position_ids=None) -> (logits [1, V] fp32, KVCache).

    position_ids: [s_full] (1D RoPE) or [3, s_full] (M-RoPE, Qwen2-VL);
    defaults to iota. With M-RoPE, post-merge positions are gathered from the
    source sequence by surviving-token index — the reference's 3D position
    remap (token_merging_qwen2vl_monkey_patch/quadtree_attn_monkey_patch.py:
    109-113). With 1D RoPE the default policy truncates + recomputes
    (quadtree_attn_monkey_patch.py:114-115); pos_emb_ver=2 gathers instead.
    """
    k_split = _split_idx(cfg, spec)
    s_merged = merged_buffer_len(spec, s_full) if spec is not None else s_full
    mrope = bool(cfg.mrope_section)

    def fn(params, embeds, valid_len, video_start, position_ids=None):
        layers = params["layers"]
        if position_ids is None:
            position_ids = jnp.arange(s_full, dtype=jnp.int32)
        cos, sin = qwen2.rope_cos_sin(cfg, position_ids)
        x = embeds

        x, ka, va = qwen2.prefill_layers(
            layers, 0, k_split, x, cos, sin, valid_len, cfg, impl
        )

        if spec is not None and k_split < cfg.num_layers:
            x, new_valid, n_kept, src_pos = apply_reducer(spec, x, video_start, valid_len)
            if mrope:
                pos_m = position_ids[:, src_pos]  # gather 3D source positions
            elif spec.pos_emb_ver == 2:
                pos_m = position_ids[src_pos]
            else:  # truncate + recompute (reference default, :114-115)
                pos_m = jnp.arange(s_merged, dtype=jnp.int32)
            cos_m, sin_m = qwen2.rope_cos_sin(cfg, pos_m)
            x, kb, vb = qwen2.prefill_layers(
                layers, k_split, cfg.num_layers, x, cos_m, sin_m, new_valid, cfg, impl
            )
        else:
            new_valid = valid_len
            b = embeds.shape[0]
            kb = jnp.zeros((0, b, s_merged, cfg.num_kv_heads, cfg.head_dim), embeds.dtype)
            vb = kb

        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps)
        last = jax.lax.dynamic_slice(h, (0, new_valid - 1, 0), (1, 1, cfg.hidden_size))
        logits = qwen2.lm_head(params, cfg, last)[:, 0]

        def with_tail(buf):
            if buf.shape[0] == 0:
                return buf
            l, b, s, kv, hd = buf.shape
            return jnp.concatenate(
                [buf, jnp.zeros((l, b, MAX_DECODE, kv, hd), buf.dtype)], axis=2
            )

        # decode position base: one past the last valid token's position id
        # (1D iota -> valid_len, the HF default; M-RoPE -> max pos + 1, i.e.
        # the reference's rope-delta decode positions, modeling_qwen2vl.py:
        # 1779-1787)
        last = position_ids[..., valid_len - 1]
        pos_base = (jnp.max(last) + 1).astype(jnp.int32)

        cache = qwen2.KVCache(
            ka=with_tail(ka),
            va=with_tail(va),
            kb=with_tail(kb),
            vb=with_tail(vb),
            len_a=jnp.asarray(valid_len, jnp.int32),
            len_b=jnp.asarray(new_valid, jnp.int32),
            pos_base=pos_base,
        )
        return logits, cache

    return jax.jit(fn, static_argnames=())


@functools.lru_cache(maxsize=16)
def build_decode_step(cfg: DecoderConfig, spec: ReducerSpec | None):
    """Jitted single-token decode: (params, token [1], cache, step) ->
    (logits [1, V] fp32, cache). Decode positions continue from the full
    (unmerged) prompt length — HF default the reference relies on
    (SURVEY.md §3.2)."""
    k_split = _split_idx(cfg, spec)

    def fn(params, token, cache, step):
        layers = params["layers"]
        x = qwen2.embed_tokens(params, token)[:, None, :]  # [1, 1, D]
        pos = (cache.pos_base + step)[None].astype(jnp.int32)
        if cfg.mrope_section:  # decode: all three M-RoPE rows advance together
            pos = jnp.broadcast_to(pos, (3, 1))
        cos, sin = qwen2.rope_cos_sin(cfg, pos)

        x, ka, va = qwen2.decode_layers(
            layers, 0, k_split, x, cos, sin, cache.ka, cache.va, cache.len_a + step, cfg
        )
        x, kb, vb = qwen2.decode_layers(
            layers, k_split, cfg.num_layers, x, cos, sin, cache.kb, cache.vb,
            cache.len_b + step, cfg,
        )
        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps)
        logits = qwen2.lm_head(params, cfg, h)[:, 0]
        new_cache = dataclasses.replace(cache, ka=ka, va=va, kb=kb, vb=vb)
        return logits, new_cache

    return jax.jit(fn, donate_argnums=(2,))


def generate(
    params,
    cfg: DecoderConfig,
    embeds: jnp.ndarray,
    valid_len: int,
    video_start: int,
    spec: ReducerSpec | None,
    gen: GenerateConfig = GenerateConfig(),
    impl: str = "xla",
    position_ids=None,
):
    """Greedy generation. Returns (token_ids list, runtime dict)."""
    s_full = embeds.shape[1]
    prefill = build_prefill(cfg, spec, s_full, impl)
    decode = build_decode_step(cfg, spec)

    t0 = time.perf_counter()
    logits, cache = jax.block_until_ready(
        prefill(params, embeds, jnp.int32(valid_len), jnp.int32(video_start), position_ids)
    )
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
        "full_len": int(valid_len),
    }
    return ids, runtime
