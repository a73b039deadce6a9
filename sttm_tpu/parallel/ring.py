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

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ring_attention_local", "sp_prefill"]


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
def _build_sp_prefill(cfg, s_full: int, mesh: Mesh, axis: str):
    from ..models import qwen2

    p = mesh.shape[axis]
    assert s_full % p == 0, (s_full, p)
    sl = s_full // p

    def local_fn(params, embeds, valid_len):
        """Runs per-shard under shard_map. embeds: local [1, Sl, D]."""
        my = jax.lax.axis_index(axis)
        q_offset = my * sl
        pos = q_offset + jnp.arange(sl, dtype=jnp.int32)
        cos, sin = qwen2.rope_cos_sin(cfg, pos)
        x = embeds
        layers = params["layers"]
        ks, vs = [], []
        for li in range(cfg.num_layers):
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
            x = x + qwen2._mat(
                qwen2.mlp_act(qwen2._mat(h, lp["wg"], aq), cfg) * qwen2._mat(h, lp["wu"], aq),
                lp["wd"], aq,
            )
            ks.append(k)
            vs.append(v)
        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
        # last valid token lives on shard (valid_len-1)//sl; compute logits
        # there and psum (other shards contribute zeros)
        last_local = jnp.clip(valid_len - 1 - my * sl, 0, sl - 1)
        mine = (valid_len - 1) // sl == my
        lasth = jax.lax.dynamic_slice(h, (0, last_local, 0), (1, 1, cfg.hidden_size))
        logits = qwen2.lm_head(params, cfg, lasth)[:, 0]
        logits = jax.lax.psum(jnp.where(mine, logits, 0.0), axis)
        return logits, jnp.stack(ks), jnp.stack(vs)

    def fn(params, embeds, valid_len):
        param_specs = jax.tree.map(lambda _: P(), params)
        return jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(param_specs, P(None, axis, None), P()),
            out_specs=(P(), P(None, None, axis, None, None), P(None, None, axis, None, None)),
            check_vma=False,
        )(params, embeds, valid_len)

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
