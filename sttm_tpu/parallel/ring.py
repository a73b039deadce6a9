"""Sequence-parallel (context-parallel) prefill: ring attention over a mesh.

The reference has NO sequence parallelism (SURVEY §2.7 — its long-context
levers are RoPE scaling + token merging). This is the TPU-native lever for
prefills beyond one chip's HBM: shard the sequence across a mesh axis, keep
every per-token op (norms, projections, MLP) local, and compute exact causal
attention by rotating K/V blocks around the ring with ``jax.lax.ppermute``
while accumulating a blockwise online softmax (flash-attention style), fp32
accumulators.

All functions here run INSIDE ``jax.shard_map`` over a mesh with a sequence
axis; ``sp_prefill`` is the user-facing wrapper that shards a full decoder
prefill over the ``sp`` axis and returns last-token logits plus the
sequence-sharded K/V.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ring_attention_local", "sp_prefill", "sp_generate", "create_sp_mesh"]


def create_sp_mesh(sp: int, devices=None) -> Mesh:
    """A 1-axis ("sp") mesh over the first ``sp`` devices."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    if sp > len(devices):
        raise ValueError(f"sp={sp} needs {sp} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:sp]).reshape(sp), ("sp",))


def ring_attention_local(q, k, v, q_offset, valid_len, axis_name: str):
    """Exact causal attention with ring-passed K/V. Call inside shard_map.

    q/k/v: LOCAL shards [B, Sl, Hq|Hkv, hd] of a [B, Sl*p, ...] sequence
    (GQA: Hq % Hkv == 0). ``q_offset``: global position of local row 0
    (= axis_index * Sl for equal shards). Padding keys (>= valid_len) are
    masked. Returns the local output shard [B, Sl, Hq, hd].
    """
    p = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    b, sl, hq, hd = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    scale = hd ** -0.5

    qf = q.astype(jnp.float32).reshape(b, sl, hkv, g, hd)
    qpos = q_offset + jnp.arange(sl)

    m0 = jnp.full((b, hkv, g, sl), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, hkv, g, sl), jnp.float32)
    acc0 = jnp.zeros((b, hkv, g, sl, hd), jnp.float32)

    def step(carry, i):
        k_blk, v_blk, m, l, acc = carry
        src = (my - i) % p  # whose block we currently hold
        kpos = src * sl + jnp.arange(sl)
        s = jnp.einsum(
            "bqhgd,bkhd->bhgqk", qf, k_blk.astype(jnp.float32)
        ) * scale
        mask = (kpos[None, :] <= qpos[:, None]) & (kpos[None, :] < valid_len)
        s = jnp.where(mask[None, None, None], s, -jnp.inf)

        blk_max = jnp.max(s, axis=-1)  # [b, hkv, g, sl]
        new_m = jnp.maximum(m, blk_max)
        # guard fully-masked rows/blocks (exp(-inf - -inf))
        safe_m = jnp.where(jnp.isfinite(new_m), new_m, 0.0)
        alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
        pexp = jnp.exp(jnp.where(jnp.isfinite(s), s - safe_m[..., None], -jnp.inf))
        pexp = jnp.where(jnp.isfinite(s), pexp, 0.0)
        l = l * alpha + pexp.sum(-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhgqk,bkhd->bhgqd", pexp, v_blk.astype(jnp.float32)
        )
        # rotate: every shard sends its block to the next rank, so after
        # step i we hold the block of rank (my - i - 1)
        perm = [(j, (j + 1) % p) for j in range(p)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (k_blk, v_blk, new_m, l, acc), None

    (_, _, m, l, acc), _ = jax.lax.scan(
        step, (k, v, m0, l0, acc0), jnp.arange(p)
    )
    out = acc / jnp.maximum(l, 1e-30)[..., None]  # [b, hkv, g, sl, hd]
    return out.transpose(0, 3, 1, 2, 4).reshape(b, sl, hq, hd).astype(q.dtype)


@functools.lru_cache(maxsize=8)
def _build_sp_prefill(cfg, s_full: int, mesh: Mesh, axis: str, hi: int | None = None):
    """Jitted sequence-parallel prefill over layers [0, hi).

    ``hi=None`` (default) runs the whole stack and returns (logits, ks, vs);
    an ``hi`` < num_layers stops at the reducer boundary and returns the
    sequence-sharded hidden states instead of logits: (x, ks, vs) — the
    caller gathers x, merges, and finishes the stack single-device
    (sp_generate)."""
    from ..models import qwen2

    p = mesh.shape[axis]
    assert s_full % p == 0, (s_full, p)
    sl = s_full // p
    n_layers = cfg.num_layers if hi is None else hi
    assert 0 < n_layers <= cfg.num_layers

    def local_fn(params, embeds, valid_len):
        """Runs per-shard under shard_map. embeds: local [1, Sl, D]."""
        my = jax.lax.axis_index(axis)
        q_offset = my * sl
        pos = q_offset + jnp.arange(sl, dtype=jnp.int32)
        cos, sin = qwen2.rope_cos_sin(cfg, pos)
        x = embeds
        layers = params["layers"]
        ks, vs = [], []
        for li in range(n_layers):
            lp = {kk: (vv[li] if not isinstance(vv, dict)
                       else {s2: a[li] for s2, a in vv.items()})
                  for kk, vv in layers.items()}
            h = qwen2.rms_norm(x, lp["ln1"], cfg.rms_eps, cfg.rms_offset)
            q, k, v = qwen2.qkv_proj(lp, h, cfg)
            q = qwen2.apply_rope(q, cos, sin)
            k = qwen2.apply_rope(k, cos, sin)
            o = ring_attention_local(q, k, v, q_offset, valid_len, axis)
            aq = cfg.act_quant
            x = x + qwen2._mat(o.reshape(1, sl, cfg.q_dim), lp["wo"], aq)
            h = qwen2.rms_norm(x, lp["ln2"], cfg.rms_eps, cfg.rms_offset)
            x = x + qwen2.mlp_block(lp, h, cfg)  # dense SwiGLU or MoE trunk
            ks.append(k)
            vs.append(v)
        if hi is not None and hi < cfg.num_layers:
            return x, jnp.stack(ks), jnp.stack(vs)
        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
        # last valid token lives on shard (valid_len-1)//sl; compute logits
        # there and psum (other shards contribute zeros)
        last_local = jnp.clip(valid_len - 1 - my * sl, 0, sl - 1)
        mine = (valid_len - 1) // sl == my
        lasth = jax.lax.dynamic_slice(h, (0, last_local, 0), (1, 1, cfg.hidden_size))
        logits = qwen2.lm_head(params, cfg, lasth)[:, 0]
        logits = jax.lax.psum(jnp.where(mine, logits, 0.0), axis)
        return logits, jnp.stack(ks), jnp.stack(vs)

    kv_spec = P(None, None, axis, None, None)
    x_spec = P(None, axis, None)
    out_specs = (
        (x_spec, kv_spec, kv_spec)
        if hi is not None and hi < cfg.num_layers
        else (P(), kv_spec, kv_spec)
    )

    def fn(params, embeds, valid_len):
        param_specs = jax.tree.map(lambda _: P(), params)
        return jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(param_specs, x_spec, P()),
            out_specs=out_specs,
            check_vma=False,
        )(params, embeds, valid_len)

    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def _build_sp_continue(cfg, spec, s_full: int, impl: str):
    """Jitted single-device continuation after a sequence-parallel first
    group: apply the reducer to the gathered hidden states, run layers
    [cut, L), and assemble the full two-group KVCache (group 0's K/V come
    from the sp phase). Mirrors build_prefill's post-merge semantics
    (runtime/generate.py:140-214) for one non-scoring reducer, 1D RoPE."""
    from ..models import qwen2
    from ..runtime.generate import MAX_DECODE
    from ..runtime.reducer import apply_reducer, merged_buffer_len

    cut = max(0, min(spec.layer_idx, cfg.num_layers))
    buf_len = merged_buffer_len(spec, s_full)

    def with_tail(buf):
        if buf.shape[0] == 0:
            return buf
        l, b, s, kv, hd = buf.shape
        return jnp.concatenate(
            [buf, jnp.zeros((l, b, MAX_DECODE, kv, hd), buf.dtype)], axis=2
        )

    def fn(params, x, k0, v0, valid_len, video_start, t_valid=None):
        pos = jnp.arange(s_full, dtype=jnp.int32)
        cos0, sin0 = qwen2.rope_cos_sin(cfg, pos)
        rope_maps = (cos0, sin0) if spec.pos_emb_ver == 1 else None
        x, valid, n_kept, src_pos, merged_rope, n_raw = apply_reducer(
            spec, x, video_start, valid_len, None, rope_maps, t_valid
        )
        overflow = n_raw - n_kept
        if merged_rope is not None:  # pos_emb_ver 1: pooled rope maps
            cos, sin = merged_rope
            pos2 = jnp.arange(buf_len, dtype=jnp.int32)
        else:
            pos2 = pos[src_pos] if spec.gathers_positions else jnp.arange(
                buf_len, dtype=jnp.int32
            )
            cos, sin = qwen2.rope_cos_sin(cfg, pos2)
        x, k1, v1 = qwen2.prefill_layers(
            params["layers"], cut, cfg.num_layers, x, cos, sin, valid, cfg, impl
        )
        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
        last = jax.lax.dynamic_slice(h, (0, valid - 1, 0), (1, 1, cfg.hidden_size))
        logits = qwen2.lm_head(params, cfg, last)[:, 0]
        if spec.gathers_positions:
            pos_base = (jnp.max(pos2[valid - 1]) + 1).astype(jnp.int32)
        else:  # truncate + recompute: decode continues from the UNMERGED length
            pos_base = jnp.asarray(valid_len, jnp.int32)
        cache = qwen2.KVCache(
            ks=(with_tail(k0), with_tail(k1)),
            vs=(with_tail(v0), with_tail(v1)),
            lens=(jnp.asarray(valid_len, jnp.int32), jnp.asarray(valid, jnp.int32)),
            pos_base=pos_base,
            budget_overflow=overflow,
        )
        return logits, cache

    return jax.jit(fn)


def sp_generate(
    params,
    cfg,
    embeds,
    valid_len,
    video_start,
    spec,
    mesh: Mesh,
    axis: str = "sp",
    gen=None,
    impl: str = "xla",
    pos_base=None,
    t_valid=None,
    kv_int8: bool = False,
):
    """Greedy generation with a sequence-parallel prefill over ``mesh``.

    The pre-merge layers (the HBM-heavy part: full-length sequence) run
    ring-attention sharded over ``axis``; the merge and the post-merge layers
    run on one device (the merged sequence fits by construction); decode
    reuses the standard per-step program. Beyond reference scope (the
    reference has no sequence parallelism, SURVEY §2.7) — this is the
    multi-chip lever for >128-frame prefills. Supports ``spec`` None or one
    non-scoring ReducerSpec with 1D RoPE; returns (ids, runtime) like
    ``generate``.
    """
    import time

    from ..runtime.generate import (
        GenerateConfig, build_decode_step, _normalize_specs,
    )

    gen = gen or GenerateConfig()
    specs = _normalize_specs(spec)
    if cfg.mrope_section:
        raise ValueError("sp_generate supports 1D RoPE only (no M-RoPE)")
    if len(specs) > 1:
        raise ValueError("sp_generate supports at most one reducer stage")
    if specs and specs[0].needs_scores:
        raise ValueError("sp_generate does not support score-based reducers (fastv)")
    spec_key = specs[0] if specs else None
    cut = cfg.num_layers if not specs else max(0, min(specs[0].layer_idx, cfg.num_layers))
    s_full = embeds.shape[1]
    dev0 = jax.devices()[0]

    t0 = time.perf_counter()
    embeds_sh = jax.device_put(embeds, NamedSharding(mesh, P(None, axis, None)))
    if spec_key is None:
        fn = _build_sp_prefill(cfg, s_full, mesh, axis)
        logits, k0, v0 = fn(params, embeds_sh, jnp.int32(valid_len))
        k0, v0 = (jax.device_put(a, dev0) for a in (k0, v0))
        cache = _build_sp_cache_origin(cfg, s_full)(k0, v0, jnp.int32(valid_len))
    elif cut == 0:
        # merge-at-embeddings (72B config): nothing to shard before the merge
        from ..runtime.generate import build_prefill

        prefill = build_prefill(cfg, spec_key, s_full, impl)
        logits, cache = prefill(
            params, embeds, jnp.int32(valid_len), jnp.int32(video_start), None,
            None, None if t_valid is None else jnp.int32(t_valid),
        )
    else:
        fn = _build_sp_prefill(cfg, s_full, mesh, axis, hi=cut)
        x, k0, v0 = fn(params, embeds_sh, jnp.int32(valid_len))
        x, k0, v0 = (jax.device_put(a, dev0) for a in (x, k0, v0))
        cont = _build_sp_continue(cfg, spec_key, s_full, impl)
        logits, cache = cont(
            params, x, k0, v0, jnp.int32(valid_len), jnp.int32(video_start),
            None if t_valid is None else jnp.int32(t_valid),
        )
    if pos_base is not None:  # caller-supplied decode base (build_prefill's
        # pos_base_override semantics: unconditional)
        cache = dataclasses.replace(cache, pos_base=jnp.asarray(pos_base, jnp.int32))
    logits = jax.device_put(logits, dev0)  # off the mesh for single-dev decode
    logits.block_until_ready()
    ttft = time.perf_counter() - t0
    if kv_int8:  # int8 live cache for the single-device decode (kv_int8
        # semantics as in runtime.generate.generate)
        from ..models import qwen2 as _qwen2

        cache = _qwen2.quantize_kv_cache(cache)

    token = jnp.argmax(logits, -1).astype(jnp.int32)
    ids = [int(token[0])]
    merged_len = int(cache.merged_len)
    overflow = 0 if cache.budget_overflow is None else int(cache.budget_overflow)

    decode = build_decode_step(cfg, spec_key)
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
        "budget_overflow": overflow,
        "sp": mesh.shape[axis],
    }
    return ids, runtime


@functools.lru_cache(maxsize=8)
def _build_sp_cache_origin(cfg, s_full: int):
    """Assemble the single-group KVCache from a full sp_prefill's K/V."""
    from ..models import qwen2
    from ..runtime.generate import MAX_DECODE

    def fn(k0, v0, valid_len):
        def with_tail(buf):
            l, b, s, kv, hd = buf.shape
            return jnp.concatenate(
                [buf, jnp.zeros((l, b, MAX_DECODE, kv, hd), buf.dtype)], axis=2
            )

        return qwen2.KVCache(
            ks=(with_tail(k0),), vs=(with_tail(v0),),
            lens=(jnp.asarray(valid_len, jnp.int32),),
            pos_base=jnp.asarray(valid_len, jnp.int32),
            budget_overflow=None,
        )

    return jax.jit(fn)


def sp_prefill(params, cfg, embeds, valid_len, mesh: Mesh, axis: str = "sp"):
    """Sequence-parallel prefill: embeds [1, S, D] sharded over ``axis``.

    Returns (logits [1, V] fp32 replicated, k_all, v_all [L, 1, S, KV, hd]
    sequence-sharded on the mesh). Exact (fp32-accumulated online softmax) —
    matches the single-device prefill logits.
    """
    fn = _build_sp_prefill(cfg, embeds.shape[1], mesh, axis)
    embeds = jax.device_put(embeds, NamedSharding(mesh, P(None, axis, None)))
    return fn(params, embeds, jnp.int32(valid_len))
