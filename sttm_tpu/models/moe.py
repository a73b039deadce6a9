"""Sparse Mixture-of-Experts MLP block (Qwen2-MoE family).

The reference carries a Qwen2-MoE LM shim
(llava/model/language_model/llava_qwen_moe.py:1-149 — LLaVA-NeXT inheritance,
unused by the STTM experiments); here the MoE trunk is a first-class decoder
variant selected by ``cfg.num_experts > 0``, numerically matching HF's
``Qwen2MoeSparseMoeBlock``: softmax router over all experts in fp32, top-k
selection (optionally renormalized), expert outputs combined with the routing
weights in the activation dtype, plus an always-on shared expert scaled by a
sigmoid gate.

TPU-first design notes:

* Two exact dispatch modes. ``dense`` computes every expert for every token
  as one stacked einsum over the expert axis, with non-selected experts
  zeroed by the combine weights — the shapes are static, the MXU sees
  [N, D] x [E, D, F] batched matmuls, and sharding the expert axis over an
  ``ep`` mesh axis turns the combine into a single psum (expert parallelism:
  each device computes only its local experts at full density). ``gather``
  pulls only the top-k experts' weights per token — for decode (N = batch,
  a handful of tokens) this reads k/E of the expert bytes, which is the
  difference that matters in the weight-bandwidth-bound decode regime; XLA
  fuses the weight gather into the consuming matmul (see CLAUDE.md decode
  notes), so there is no materialized copy.
* ``auto`` picks gather for token counts below ``_GATHER_MAX_TOKENS`` and
  dense otherwise (prefill wants the batched-matmul form; a 25.6k-token
  gather of per-token expert weights would be enormous).
* No token dropping / capacity factor anywhere: both modes are dropless and
  bit-identical to the HF loop up to matmul reduction order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quant import dequantize

__all__ = ["moe_router", "moe_mlp", "init_moe_layer_params"]

# Below this many tokens the per-token top-k weight gather reads fewer expert
# bytes than the all-experts dense form: N * topk < E  (each gathered token
# reads topk experts vs the dense form's E). Decode steps (N = batch size)
# sit far under it; prefill far over it.
_GATHER_MAX_TOKENS = 16


def init_moe_layer_params(cfg, key, scale_fn) -> dict:
    """Random-init stacked MoE layer params. ``scale_fn(k, shape)`` is the
    trunk's weight initializer (qwen2.init_params shares it)."""
    ks = jax.random.split(key, 8)
    l, d = cfg.num_layers, cfg.hidden_size
    e, fe, fs = cfg.num_experts, cfg.moe_intermediate_size, cfg.shared_expert_intermediate_size
    return {
        "router": scale_fn(ks[0], (l, d, e)),
        "we_g": scale_fn(ks[1], (l, e, d, fe)),
        "we_u": scale_fn(ks[2], (l, e, d, fe)),
        "we_d": scale_fn(ks[3], (l, e, fe, d)),
        "ws_g": scale_fn(ks[4], (l, d, fs)),
        "ws_u": scale_fn(ks[5], (l, d, fs)),
        "ws_d": scale_fn(ks[6], (l, fs, d)),
        "wsg": scale_fn(ks[7], (l, d, 1)),
    }


def moe_router(router_w, h: jnp.ndarray, cfg):
    """Top-k routing. h: [N, D]. Returns (topv [N, k] fp32, topi [N, k],
    router_logits [N, E]).

    Matches Qwen2MoeSparseMoeBlock.forward: logits in the input dtype,
    softmax in fp32, top-k, optional renormalization.
    """
    logits = h @ dequantize(router_w, h.dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    topv, topi = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    if cfg.norm_topk_prob:
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    return topv, topi, logits


def _swiglu(x, wg, wu, wd, cfg, dtype):
    from .qwen2 import mlp_act

    g = mlp_act(x @ dequantize(wg, dtype), cfg)
    return (g * (x @ dequantize(wu, dtype))) @ dequantize(wd, dtype)


def moe_mlp(lp: dict, h: jnp.ndarray, cfg, mode: str = "auto") -> jnp.ndarray:
    """The sparse MoE block for one layer. h: [B, S, D] -> [B, S, D].

    lp holds this layer's slice of the stacks from init_moe_layer_params
    (no leading L axis).
    """
    b, s, d = h.shape
    x = h.reshape(b * s, d)
    n = b * s
    if mode == "auto":
        mode = "gather" if n <= _GATHER_MAX_TOKENS else "dense"

    from .qwen2 import mlp_act

    topv, topi, _ = moe_router(lp["router"], x, cfg)
    topv = topv.astype(x.dtype)

    if mode == "dense":
        # combine weights [N, E]: routing weight where selected, else 0 —
        # sharding E over an "ep" mesh axis partitions all four einsums and
        # reduces the last with one psum
        onehot = jax.nn.one_hot(topi, cfg.num_experts, dtype=x.dtype)
        combine = jnp.sum(onehot * topv[..., None], axis=-2)
        we_g = dequantize(lp["we_g"], x.dtype)
        we_u = dequantize(lp["we_u"], x.dtype)
        we_d = dequantize(lp["we_d"], x.dtype)
        g = jnp.einsum("nd,edf->enf", x, we_g)
        u = jnp.einsum("nd,edf->enf", x, we_u)
        o = jnp.einsum("enf,efd->end", mlp_act(g, cfg) * u, we_d)
        y = jnp.einsum("end,ne->nd", o, combine)
    elif mode == "gather":
        # per-token top-k expert weight gather; XLA fuses the gather into
        # the matmuls (no materialized [N, k, D, Fe] copy)
        wg = dequantize(lp["we_g"], x.dtype)[topi]  # [N, k, D, Fe]
        wu = dequantize(lp["we_u"], x.dtype)[topi]
        wd = dequantize(lp["we_d"], x.dtype)[topi]
        g = jnp.einsum("nd,nkdf->nkf", x, wg)
        u = jnp.einsum("nd,nkdf->nkf", x, wu)
        o = jnp.einsum("nkf,nkfd->nkd", mlp_act(g, cfg) * u, wd)
        y = jnp.einsum("nkd,nk->nd", o, topv)
    elif mode == "sort":
        # dropless sorted dispatch (MegaBlocks-style): sort the N*k
        # (token, expert) assignments by expert, run grouped matmuls via
        # lax.ragged_dot (TPU grouped-GEMM primitive), scatter-add back.
        # FLOPs = N*k assignment rows vs the dense form's N*E — E/k fewer
        # (15x at Qwen2-MoE's E=60, k=4) with no capacity factor and no
        # dropped tokens. Single-device dispatch: under an "ep"-sharded mesh
        # use dense (its einsums partition over the expert axis; ragged
        # group sizes do not).
        k = cfg.num_experts_per_tok
        flat_e = topi.reshape(-1)
        order = jnp.argsort(flat_e)  # stable: preserves token order per expert
        tok = order // k
        xs = x[tok]  # [N*k, D]
        group_sizes = jnp.bincount(flat_e, length=cfg.num_experts)
        we_g = dequantize(lp["we_g"], x.dtype)
        we_u = dequantize(lp["we_u"], x.dtype)
        we_d = dequantize(lp["we_d"], x.dtype)
        g = jax.lax.ragged_dot(xs, we_g, group_sizes)
        u = jax.lax.ragged_dot(xs, we_u, group_sizes)
        o = jax.lax.ragged_dot(mlp_act(g, cfg) * u, we_d, group_sizes)
        w = topv.reshape(-1)[order]
        # ragged_dot accumulates in f32; cast before the scatter-add (a
        # mixed-dtype scatter is a FutureWarning today, an error soon)
        y = jnp.zeros((n, d), x.dtype).at[tok].add((o * w[:, None]).astype(x.dtype))
    elif mode in ("gmm", "gmm_fused"):
        # same dropless sorted dispatch, but through the Pallas grouped-GEMM
        # (ops/gmm.py): groups padded to tm-multiples so every m-tile is one
        # expert and the MXU runs full tiles — built because ragged_dot's XLA
        # lowering measures ~16 TFLOP/s on the selected FLOPs (GAPS.md #9).
        # "gmm_fused" runs the whole SwiGLU in one kernel (one HBM pass over
        # all three expert matrices). Single-device prefill paths, like "sort".
        from ..ops.gmm import gmm, gmm_mlp_fused, grouped_layout

        k = cfg.num_experts_per_tok
        flat_e = topi.reshape(-1)
        tm = 256 if n * k >= 2048 else 8
        order, row_dst, tile_group, m_pad = grouped_layout(flat_e, cfg.num_experts, tm)
        tok = order // k
        xs = jnp.zeros((m_pad, d), x.dtype).at[row_dst].set(x[tok])
        we_g = dequantize(lp["we_g"], x.dtype)
        we_u = dequantize(lp["we_u"], x.dtype)
        we_d = dequantize(lp["we_d"], x.dtype)
        if mode == "gmm_fused":
            if cfg.hidden_act != "silu":
                raise ValueError("gmm_fused supports SiLU only")
            o = gmm_mlp_fused(xs, we_g, we_u, we_d, tile_group, tm)
        else:
            g = gmm(xs, we_g, tile_group, tm)
            u = gmm(xs, we_u, tile_group, tm)
            o = gmm(mlp_act(g, cfg) * u, we_d, tile_group, tm)
        w = topv.reshape(-1)[order]
        y = jnp.zeros((n, d), x.dtype).at[tok].add(o[row_dst] * w[:, None])
    else:
        raise ValueError(f"unknown moe dispatch mode {mode!r}")

    shared = _swiglu(x, lp["ws_g"], lp["ws_u"], lp["ws_d"], cfg, x.dtype)
    gate = jax.nn.sigmoid((x @ dequantize(lp["wsg"], x.dtype)).astype(jnp.float32))
    y = y + shared * gate.astype(x.dtype)
    return y.reshape(b, s, d)
