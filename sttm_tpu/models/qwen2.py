"""Functional Qwen2-architecture decoder in JAX (GQA + RoPE/M-RoPE + SwiGLU).

Backbone for LLaVA-Video-7B/72B, LLaVA-OneVision-7B and Qwen2-VL-7B (the
reference's model families, README.md:10-13). Pure functions over a params
pytree; layer weights are stacked [L, ...] and executed with lax.scan, which
gives one compiled layer body per group and a natural axis for tensor-parallel
sharding.

The decoder is split into two scan groups around the token-reduction layer k:
layers [0, k) run at full sequence length, layers [k, L) at the merged budget
length — the KV-cache-per-layer-length invariant of the reference
(llava/model/language_model/llava_qwen.py:258).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.attention import mha
from .config import DecoderConfig
from .quant import dequantize, is_quantized, is_quantized4, matmul_w4, matmul_w8a8

__all__ = [
    "init_params",
    "rope_cos_sin",
    "rms_norm",
    "embed_tokens",
    "lm_head",
    "prefill_layers",
    "decode_layers",
    "KVCache",
]


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def init_params(cfg: DecoderConfig, key: jax.Array) -> dict:
    """Random-init params (HF-checkpoint loading lives in models/weights.py)."""
    ks = jax.random.split(key, 12)
    d, f, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    qd, kvd = cfg.q_dim, cfg.kv_dim

    def w(k, shape, scale=None):
        scale = scale if scale is not None else (shape[-2] ** -0.5 if len(shape) > 2 else 0.02)
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(cfg.dtype)

    layers = {
        "ln1": jnp.ones((l, d), cfg.dtype),
        "ln2": jnp.ones((l, d), cfg.dtype),
        "wq": w(ks[1], (l, d, qd)),
        "wk": w(ks[2], (l, d, kvd)),
        "wv": w(ks[3], (l, d, kvd)),
        "wo": w(ks[4], (l, qd, d)),
    }
    if cfg.num_experts > 0:  # Qwen2-MoE family: sparse MoE block per layer
        from .moe import init_moe_layer_params

        layers.update(init_moe_layer_params(cfg, ks[9], w))
    else:
        layers.update(
            {
                "wg": w(ks[5], (l, d, f)),
                "wu": w(ks[6], (l, d, f)),
                "wd": w(ks[7], (l, f, d)),
            }
        )
    if cfg.attention_bias:  # Qwen2 family; Llama/Vicuna trunks have none
        layers["bq"] = jnp.zeros((l, qd), cfg.dtype)
        layers["bk"] = jnp.zeros((l, kvd), cfg.dtype)
        layers["bv"] = jnp.zeros((l, kvd), cfg.dtype)
    params = {
        "embed": w(ks[0], (cfg.vocab_size, d), 0.02),
        "layers": layers,
        "norm": jnp.ones((d,), cfg.dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w(ks[8], (d, cfg.vocab_size), 0.02)
    return params


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float, offset: bool = False) -> jnp.ndarray:
    """RMSNorm; ``offset`` selects the Gemma convention (weights stored as
    deltas from 1, applied as ``x_norm * (1 + w)``)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return normed * (1.0 + weight.astype(jnp.float32)).astype(x.dtype) if offset else normed * weight


def mlp_act(h: jnp.ndarray, cfg: DecoderConfig) -> jnp.ndarray:
    """MLP gate activation: SiLU (Qwen2/Llama) or tanh-GELU (Gemma)."""
    if cfg.hidden_act == "silu":
        return jax.nn.silu(h)
    if cfg.hidden_act == "gelu_tanh":
        return jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(h.dtype)
    raise ValueError(f"unknown hidden_act {cfg.hidden_act!r}")


def rope_cos_sin(cfg: DecoderConfig, position_ids: jnp.ndarray):
    """RoPE tables. position_ids: [S] (1D) or [3, S] (M-RoPE t/h/w rows).

    Linear scaling divides positions by ``rope_scaling_factor`` (the HF
    "linear" rope_scaling the reference enables for long inputs,
    eval_vidqa_by_feat_llavavideo.py:88-97). M-RoPE interleaves the three
    position rows across frequency sections (modeling_qwen2vl.py M-RoPE).
    Returns (cos, sin): [S, head_dim] fp32.
    """
    hd = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    pos = position_ids.astype(jnp.float32) / cfg.rope_scaling_factor
    if position_ids.ndim == 1:
        freqs = pos[:, None] * inv_freq[None, :]  # [S, hd/2]
    else:
        f3 = pos[:, :, None] * inv_freq[None, None, :]  # [3, S, hd/2]
        if not cfg.mrope_section:
            raise ValueError("3-row position ids require cfg.mrope_section")
        parts, start = [], 0
        for axis, sec in enumerate(cfg.mrope_section):
            parts.append(f3[axis, :, start : start + sec])
            start += sec
        freqs = jnp.concatenate(parts, axis=-1)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # rotate-half convention
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, S, H, hd]; cos/sin: [S, hd] (shared) or [B, S, hd] (per-row,
    batched decode with per-sample position bases)."""
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    if cos.ndim == 3:
        c = cos[:, :, None, :]
        s = sin[:, :, None, :]
    else:
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
    return (x.astype(jnp.float32) * c + rot * s).astype(x.dtype)


def embed_tokens(params: dict, ids: jnp.ndarray, cfg: DecoderConfig | None = None) -> jnp.ndarray:
    e = params["embed"][ids]
    if cfg is not None and cfg.embed_scale:  # Gemma: sqrt(hidden) scaling
        e = e * jnp.asarray(cfg.hidden_size**0.5, e.dtype)
    return e


def lm_head(params: dict, cfg: DecoderConfig, x: jnp.ndarray) -> jnp.ndarray:
    w = params["embed"].T if cfg.tie_word_embeddings else params["lm_head"]
    return jnp.einsum("bsd,dv->bsv", x, w, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Layer groups
# ---------------------------------------------------------------------------


def _slice_layers(layers: dict, lo: int, hi: int) -> dict:
    def sl(v):
        if isinstance(v, dict):  # quantized {"q", "s"}
            return {kk: vv[lo:hi] for kk, vv in v.items()}
        return v[lo:hi]

    return {k: sl(v) for k, v in layers.items()}


def _take_layer(layers: dict, li) -> dict:
    """Gather ONE layer's weights from the stacked tree by (traced) index.

    Layer groups scan over index arrays and gather per iteration instead of
    scanning over ``_slice_layers(layers, lo, hi)`` xs: a non-identity slice
    of the stacked weights materializes a copy of the whole sub-stack, which
    inside a decode step means copying ~all weights per generated token
    (measured +20 ms/token on v5e for the 7B two-group split). The gather
    reads exactly the one layer the iteration was going to read anyway.
    """

    def tk(v):
        if isinstance(v, dict):
            return {kk: jax.lax.dynamic_index_in_dim(vv, li, 0, keepdims=False) for kk, vv in v.items()}
        return jax.lax.dynamic_index_in_dim(v, li, 0, keepdims=False)

    return {k: tk(v) for k, v in layers.items()}


def qkv_proj(lp: dict, h, cfg: DecoderConfig):
    """QKV projection; biases only when the config family has them.

    A fused "wqkv" weight (quant.fuse_layer_projections) runs ONE matmul and
    splits the outputs — identical math (same columns, same per-channel
    scales), ~3x fewer decode GEMV ops (decode is weight-bandwidth-bound and
    per-op ramp time never overlaps across ops)."""
    b, s, _ = h.shape
    nq = cfg.num_heads * cfg.head_dim
    nkv = cfg.num_kv_heads * cfg.head_dim
    if "wqkv" in lp:
        qkv = _mat(h, lp["wqkv"], cfg.act_quant)
        if "bqkv" in lp:
            qkv = qkv + lp["bqkv"]
        q = qkv[..., :nq]
        k = qkv[..., nq : nq + nkv]
        v = qkv[..., nq + nkv :]
    else:
        q = _mat(h, lp["wq"], cfg.act_quant)
        k = _mat(h, lp["wk"], cfg.act_quant)
        v = _mat(h, lp["wv"], cfg.act_quant)
        if "bq" in lp:
            q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
    return (
        q.reshape(b, s, cfg.num_heads, cfg.head_dim),
        k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim),
        v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim),
    )


def mlp_block(lp: dict, h: jnp.ndarray, cfg: DecoderConfig) -> jnp.ndarray:
    """The per-layer MLP: dense SwiGLU, or the sparse MoE block when the
    layer params carry a router (cfg.num_experts > 0)."""
    if "router" in lp:
        from .moe import moe_mlp

        return moe_mlp(lp, h, cfg, getattr(cfg, "moe_dispatch", "auto"))
    aq = cfg.act_quant
    if "wgu" in lp:  # fused gate|up (quant.fuse_layer_projections)
        gu = _mat(h, lp["wgu"], aq)
        i = gu.shape[-1] // 2
        return _mat(mlp_act(gu[..., :i], cfg) * gu[..., i:], lp["wd"], aq)
    return _mat(mlp_act(_mat(h, lp["wg"], aq), cfg) * _mat(h, lp["wu"], aq), lp["wd"], aq)


def _qkv_proj_pre(lp: dict, hq, hs, cfg: DecoderConfig):
    """qkv_proj over a pre-quantized (int8 codes, f32 scales) input: the
    three projections share ONE activation-quantize pass (the fused
    rmsnorm_quantize_rows producer) instead of re-quantizing per matmul.
    Isolated GEMMs measured 73.8% -> 93.4% of int8 peak at M=12800
    (BENCH_W8A8_TAIL.json qo)."""
    from .quant import matmul_w8a8_pre

    b, s, _ = hq.shape
    nq = cfg.num_heads * cfg.head_dim
    nkv = cfg.num_kv_heads * cfg.head_dim
    if "wqkv" in lp:
        qkv = matmul_w8a8_pre(hq, hs, lp["wqkv"], out_dtype=cfg.dtype)
        if "bqkv" in lp:
            qkv = qkv + lp["bqkv"]
        q = qkv[..., :nq]
        k = qkv[..., nq : nq + nkv]
        v = qkv[..., nq + nkv :]
    else:
        q = matmul_w8a8_pre(hq, hs, lp["wq"], out_dtype=cfg.dtype)
        k = matmul_w8a8_pre(hq, hs, lp["wk"], out_dtype=cfg.dtype)
        v = matmul_w8a8_pre(hq, hs, lp["wv"], out_dtype=cfg.dtype)
        if "bq" in lp:
            q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
    return (
        q.reshape(b, s, cfg.num_heads, cfg.head_dim),
        k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim),
        v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim),
    )


def _mlp_block_pre(lp: dict, hq, hs, cfg: DecoderConfig) -> jnp.ndarray:
    """Dense SwiGLU MLP over a pre-quantized input, with the act+quantize
    producer fused (ops.kernels.swiglu_quantize_rows: the two-op path
    writes + re-reads a bf16 [M, 18944] intermediate) and the skinny-N
    down_proj contracted in 4 int32-exact K chunks (83.4% -> 89.2% of
    int8 peak isolated, BENCH_W8A8_TAIL.json down; whole-model the win
    shrinks to ~0.2% — XLA overlaps the down_proj with neighbors —
    measured BENCH_AB_KSPLIT.json, kept as default since it never
    regresses)."""
    from ..ops.kernels import swiglu_quantize_rows
    from .quant import matmul_w8a8_pre

    if "wgu" in lp:
        gu = matmul_w8a8_pre(hq, hs, lp["wgu"], out_dtype=cfg.dtype)
        i = gu.shape[-1] // 2
        gate, up = gu[..., :i], gu[..., i:]
    else:
        gate = matmul_w8a8_pre(hq, hs, lp["wg"], out_dtype=cfg.dtype)
        up = matmul_w8a8_pre(hq, hs, lp["wu"], out_dtype=cfg.dtype)
    dq, ds = swiglu_quantize_rows(gate, up, act=cfg.hidden_act)
    f = gate.shape[-1]
    k_splits = cfg.down_k_splits or (4 if (f >= 8192 and f % 512 == 0) else 1)
    return matmul_w8a8_pre(dq, ds, lp["wd"], k_splits=k_splits,
                           out_dtype=cfg.dtype)


def _use_fused_quant(lp: dict, cfg: DecoderConfig) -> bool:
    """The ``act_quant == "fused"`` prefill path applies when the layer is
    a dense int8-quantized decoder layer (MoE layers keep the dispatching
    mlp_block; bf16 weights keep the bf16 matmuls)."""
    wq = lp["wq"] if "wq" in lp else lp.get("wqkv")
    wd = lp.get("wd")
    return (cfg.act_quant == "fused" and "router" not in lp
            and is_quantized(wq) and is_quantized(wd))


def _layer_core(lp: dict, x, cos, sin, cfg: DecoderConfig, attend,
                return_q: bool = False, rope_q_in_attend: bool = False,
                rope_k_in_attend: bool = False):
    """One decoder layer; ``attend(q, k, v) -> o`` supplied by the caller.

    cfg.act_quant == "fused" selects the w8a8 prefill fast path: fused
    RMSNorm+quantize producers (one HBM pass), one shared activation-
    quantize per projection group, and the K-split down_proj — measured
    levers from BENCH_W8A8_TAIL.json. Decode paths are untouched: at M=1
    XLA already streams GEMVs at ~90% of HBM peak (CLAUDE.md) and the
    kernels' tiling predicates exclude single-row shapes anyway.

    rope_q_in_attend=True hands attend the UNROPED q (and returns it
    unroped when return_q): the splash prefill fuses q's rope + sm_scale
    + GQA transpose into one Pallas pass (ops.attention
    mha_prefill_rope_q); k is always roped here — it is what the cache
    stores."""
    b, s, d = x.shape
    fused = _use_fused_quant(lp, cfg)
    if fused:
        from ..ops.kernels import rmsnorm_quantize_rows

        hq, hs = rmsnorm_quantize_rows(x, lp["ln1"], cfg.rms_eps, cfg.rms_offset)
        q, k, v = _qkv_proj_pre(lp, hq, hs, cfg)
    else:
        h = rms_norm(x, lp["ln1"], cfg.rms_eps, cfg.rms_offset)
        q, k, v = qkv_proj(lp, h, cfg)
    if not rope_q_in_attend:
        q = apply_rope(q, cos, sin)
    if rope_k_in_attend:
        # attend ropes k itself (fused with q's rope+scale+transpose in ONE
        # Pallas pass on the splash path — ops.attention.mha_prefill_rope_qk)
        # and returns the roped k, which is what the cache stores
        o, k = attend(q, k, v)
    else:
        k = apply_rope(k, cos, sin)
        o = attend(q, k, v)
    aq = cfg.act_quant
    x = x + _mat(o.reshape(b, s, cfg.q_dim), lp["wo"], aq)
    if fused:
        # NOTE: folding this residual add into the quantize producer
        # (ops.kernels.residual_rmsnorm_quantize_rows, bit-identical) was
        # MEASURED NEUTRAL whole-model (merged leg 0.958 -> 0.967 s): the
        # o-proj dequant that XLA fuses into this add for free must
        # materialize separately to feed a custom call, cancelling the
        # saved pass. Kept as the two-op XLA form on purpose.
        hq, hs = rmsnorm_quantize_rows(x, lp["ln2"], cfg.rms_eps, cfg.rms_offset)
        x = x + _mlp_block_pre(lp, hq, hs, cfg)
    else:
        h = rms_norm(x, lp["ln2"], cfg.rms_eps, cfg.rms_offset)
        x = x + mlp_block(lp, h, cfg)
    if return_q:
        return x, k, v, q
    return x, k, v


def _remat_policy(remat):
    """Map the ``remat`` argument to a jax.checkpoint policy.

    - True: full per-layer remat (save only layer boundaries; the backward
      re-runs the whole forward — cheapest memory, most recompute FLOPs).
    - "dots": ``dots_with_no_batch_dims_saveable`` — save every projection
      GEMM output (qkv/o/gate/up/down; ~0.4 GB/layer bf16 at B=1 S=4096
      7B width) so the backward recomputes only elementwise ops and
      attention (whose QK^T/PV einsums carry batch dims and stay
      rematerialized — saving [B, H, S, S] scores would dwarf HBM).
      Trades ~1.2 GB at L=3 for skipping the 2PT GEMM recompute.
    """
    if remat is True:
        return None
    if remat == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f"unknown remat mode: {remat!r} (True or 'dots')")


def prefill_layers(
    layers: dict,
    lo: int,
    hi: int,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    valid_len,
    cfg: DecoderConfig,
    impl: str,
    remat: bool = False,
    collect_last_q: bool = False,
    attn_sinks: int = 0,
    attn_window: int = 0,
    kv_int8: bool = False,
):
    """Run layers [lo, hi) at full block width.

    Returns (x, k_all, v_all[, k_scales, v_scales][, q_last_all]) where
    k_all/v_all: [hi-lo, B, S, KV, hd] and q_last_all: [hi-lo, B, H, hd]
    (the roped query of the last valid token per layer; used by FastV's
    attention ranking).
    attn_sinks/attn_window > 0 selects the StreamingLLM A-shape mask (keep
    initial sink tokens + a local window; the reference's streamingllm
    baseline, framefusion/models/qwen2/modeling_qwen2_baseline.py).

    kv_int8=True quantizes each layer's K/V INSIDE the scan step
    (quantize_kv's per-(position, KV-head) scheme) so only int8 codes +
    fp32 scales are stacked — the full bf16 K/V stack never exists. This
    is what makes int8's cache-capacity advantage real on one chip: the
    post-hoc quantize_kv_cache handoff holds bf16 + int8 copies
    simultaneously (measured round 4: flat-batch capacity frontier b=5
    for bf16 AND int8 alike, both b=6 legs device-OOM — the handoff
    transient, not the steady state, was the cap). Bitwise-identical
    codes/scales to quantize_kv_cache of the bf16 stack (same per-layer
    bf16 values quantized by the same function).
    """
    if hi <= lo:
        b, s, _ = x.shape
        kvshape = (0, b, s, cfg.num_kv_heads, cfg.head_dim)
        if kv_int8:
            empty = jnp.zeros(kvshape, jnp.int8)
            esc = jnp.zeros(kvshape[:-1], jnp.float32)
            out = (x, empty, empty, esc, esc)
        else:
            empty = jnp.zeros(kvshape, x.dtype)
            out = (x, empty, empty)
        if collect_last_q:
            out += (jnp.zeros((0, b, cfg.num_heads, cfg.head_dim), x.dtype),)
        return out

    from ..ops.attention import mha_prefill_rope_q, mha_prefill_rope_qk

    import os as _os

    # STTM_ROPE_QK=0 reverts to the stock XLA K-rope (whole-model A/B
    # knob, scripts/ab_merged_splash.py); read at trace time.
    rope_k = _os.environ.get("STTM_ROPE_QK", "1") != "0"
    eff_impl = "xla" if (attn_sinks > 0 or attn_window > 0) else impl

    if rope_k:
        def attend(q_unroped, k_unroped, v):
            # BOTH ropes applied inside (fused with sm_scale + the splash
            # GQA transpose in one Pallas pass on the flash path; stock
            # ropes + mha elsewhere — identical math). Returns
            # (o, k_roped); k_roped is what the cache stores.
            return mha_prefill_rope_qk(
                q_unroped, k_unroped, v, cos, sin, kv_valid_len=valid_len,
                impl=eff_impl, attn_sinks=attn_sinks,
                attn_window=attn_window)
    else:
        def attend(q_unroped, k, v):
            # q's rope applied inside; k arrives roped by _layer_core
            return mha_prefill_rope_q(
                q_unroped, k, v, cos, sin, kv_valid_len=valid_len,
                impl=eff_impl, attn_sinks=attn_sinks,
                attn_window=attn_window)

    def step(carry, li):
        lp = _take_layer(layers, li)
        y, k, v, q = _layer_core(lp, carry, cos, sin, cfg, attend,
                                 return_q=True, rope_q_in_attend=True,
                                 rope_k_in_attend=rope_k)
        if kv_int8:
            kq, ksc = quantize_kv(k)
            vq, vsc = quantize_kv(v)
            ys = (kq, vq, ksc, vsc)
        else:
            ys = (k, v)
        if collect_last_q:
            # q comes back UNROPED (rope_q_in_attend); rope just the last
            # valid token's slice — FastV ranks roped-q . roped-k scores
            q_last = jax.lax.dynamic_slice(
                q, (0, valid_len - 1, 0, 0), (q.shape[0], 1, cfg.num_heads, cfg.head_dim)
            )
            cos_l = jax.lax.dynamic_slice(cos, (valid_len - 1, 0), (1, cfg.head_dim))
            sin_l = jax.lax.dynamic_slice(sin, (valid_len - 1, 0), (1, cfg.head_dim))
            q_last = apply_rope(q_last, cos_l, sin_l)[:, 0]
            ys += (q_last,)
        return y, ys

    if remat:
        step = jax.checkpoint(step, policy=_remat_policy(remat))
    x, ys = jax.lax.scan(step, x, jnp.arange(lo, hi, dtype=jnp.int32))
    return (x,) + tuple(ys)


def decode_layers(
    layers: dict,
    lo: int,
    hi: int,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    kv_len,
    step_idx,
    tail_start: int,
    cfg: DecoderConfig,
    kv_mask=None,
    unroll: bool = False,
    attn_kernel: bool = False,
    head_packed: bool = False,
    tail_min=None,
    cache_ksc=None,
    cache_vsc=None,
):
    """Decode through layers [lo, hi) for x [B, s, D] new tokens. cache_k/v:
    [hi-lo, B, S_c, KV, hd] where the last ``S_c - tail_start`` slots are the
    reserved decode tail. s == 1 is the normal decode step; s > 1 is the
    speculative-verify window: the s tokens land in consecutive tail slots
    starting at ``tail_start + step_idx`` and attend causally within the
    window (query row j sees prefix + tail slots <= step_idx + j), so one
    dispatch scores all s draft tokens for ~the weight-read cost of one
    (decode is weight-bandwidth-bound; the MXU is idle at batch 1).
    head_packed/attn_kernel are single-token modes (s == 1 only).

    ``head_packed=True`` is the batched-serving mode: the cache carries the
    batch FOLDED INTO THE KV-HEAD AXIS ([Lg, 1, S_c, B*KV, hd]) and x is
    [B, 1, D]. Rationale: with a real batch axis, XLA:TPU cannot reconcile
    the attention-read layout (S second-minor) with the cache-update layout
    (B second-minor) — the scan-carry DUS stops aliasing in place and every
    layer iteration materializes a fresh full cache (~10x decode slowdown
    measured at batch 2-4 on v5e). Head-packing makes the batched program
    shape-identical to the B=1 case (which runs at the bandwidth floor):
    attention is per-head independent, so folding rows into heads is exact.

    ``unroll=True`` unrolls the layer loop with STATIC layer indices: cache
    reads become zero-copy views and the update a statically-indexed DUS, so
    XLA assigns one consistent layout. The scan form pins the carried cache
    to the DUS-preferred layout and, for B > 1, pays a full per-layer cache
    copy (layout permutation) on every attention read — measured ~10x decode
    slowdown at batch 4. Batched decode should unroll; B == 1 layouts
    coincide and the (faster-compiling) scan is fine.

    Fixed-slot writes: the new K/V lands at ``tail_start + step_idx`` — an
    index that does NOT depend on the sample's packed length ``kv_len``, so
    batched decode (vmap over rows with different kv_len) keeps the update a
    single in-place dynamic-update-slice instead of a per-row scatter
    (measured: the scatter form made batch-4 decode 10x slower than batch-1
    on v5e). Visibility: prefix slots ``< kv_len`` plus written tail slots;
    the gap ``[kv_len, tail_start)`` is masked. ``kv_mask`` [S_c] optionally
    hides additional cached positions (DyCoke stage-2 pruning, FrameFusion
    dead slots, StreamingLLM windows). Also returns the per-layer roped
    queries q_all [Lg, B, 1, H, hd].

    ``cache_ksc``/``cache_vsc`` [Lg, B, S_c, KV] fp32 switch on the
    kv_int8 mode: cache_k/cache_v are int8 (quantize_kv_cache) and every
    new token's K/V is quantized at its write slot with a fresh
    per-(position, head) scale; attention dequantizes by scaling the
    score/prob matrices (ops/attention._xla_mha) so the cache HBM read
    stays int8. The return gains the updated scale stacks:
    (x, ck, cv, ksc, vsc, q_all). XLA attention paths only.
    """
    kv_int8 = cache_ksc is not None
    if kv_int8 and attn_kernel:
        raise ValueError("kv_int8 decode supports the XLA attention paths only")
    if hi <= lo:
        b, s_new = x.shape[:2]
        empty_q = jnp.zeros((0, b, s_new, cfg.num_heads, cfg.head_dim), x.dtype)
        if kv_int8:
            return x, cache_k, cache_v, cache_ksc, cache_vsc, empty_q
        return x, cache_k, cache_v, empty_q
    s_new = x.shape[1]
    if s_new > 1 and attn_kernel:
        raise ValueError("multi-token decode (s > 1) supports the XLA paths only")

    write_slot = tail_start + step_idx
    kpos = jnp.arange(cache_k.shape[2])
    kv = jnp.asarray(kv_len)
    if kv.ndim == 1:  # per-row packed lengths (batched decode)
        tail_ok = kpos[None, :] >= tail_start
        if tail_min is not None:
            # continuous batching: a row admitted at global decode step
            # tail_min[i] must not see earlier rows' (zeroed) tail slots —
            # zero K/V still takes softmax mass and dilutes attention
            tail_ok = kpos[None, :] >= tail_start + jnp.asarray(tail_min)[:, None]
        gap_ok = (kpos[None, :] < kv[:, None]) | tail_ok
    else:
        tail_ok = kpos >= tail_start
        if tail_min is not None:
            tail_ok = kpos >= tail_start + jnp.asarray(tail_min)
        gap_ok = (kpos < kv) | tail_ok
    mask = gap_ok if kv_mask is None else (gap_ok & kv_mask)
    if head_packed and mask.ndim == 2:  # per-row -> per-packed-KV-head rows
        mask = jnp.repeat(mask, cfg.num_kv_heads, axis=0)
    if attn_kernel:  # the Pallas kernel takes the complete visibility mask
        kmask = mask & (kpos <= write_slot)
        if head_packed:
            # per-packed-KV-head [B*KV, S] under kernel batch dim 1
            if kmask.ndim == 1:
                kmask = jnp.broadcast_to(
                    kmask[None], (x.shape[0] * cfg.num_kv_heads, kmask.shape[-1])
                )
            kmask = kmask[None]  # [1, B*KV, S]
        elif kmask.ndim == 1:
            kmask = jnp.broadcast_to(kmask[None], (x.shape[0],) + kmask.shape)

    # The stacked caches ride the scan CARRY and are updated with an indexed
    # in-place dynamic-update-slice per layer. Threading them through xs/ys
    # instead would materialize a fresh stacked output every step — a full
    # cache copy per decoded token (measured: +9.4 ms/token at a 25.6k cache
    # on v5e). Carries with a single DUS use alias in place.
    def body(y, ck_all, cv_all, ksc_all, vsc_all, lp, li):
        b, s, d = y.shape
        h = rms_norm(y, lp["ln1"], cfg.rms_eps, cfg.rms_offset)
        q, k, v = qkv_proj(lp, h, cfg)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if head_packed:  # [B, s, KV, hd] -> [1, s, B*KV, hd], packed head
            # index r*KV + j (s == 1 makes the transpose a pure reshape)
            k = k.transpose(1, 0, 2, 3).reshape(1, s, b * cfg.num_kv_heads, cfg.head_dim)
            v = v.transpose(1, 0, 2, 3).reshape(1, s, b * cfg.num_kv_heads, cfg.head_dim)
        if kv_int8:  # quantize the new token(s) at their write slots
            k, ksc_new = quantize_kv(k)
            v, vsc_new = quantize_kv(v)
            ksc_all = jax.lax.dynamic_update_slice(
                ksc_all, ksc_new[None], (li, 0, write_slot, 0))
            vsc_all = jax.lax.dynamic_update_slice(
                vsc_all, vsc_new[None], (li, 0, write_slot, 0))
        ck_all = jax.lax.dynamic_update_slice(ck_all, k[None], (li, 0, write_slot, 0, 0))
        cv_all = jax.lax.dynamic_update_slice(cv_all, v[None], (li, 0, write_slot, 0, 0))
        ksc = vsc = None
        if isinstance(li, int):  # static index: a zero-copy view
            ck = ck_all[li]
            cv = cv_all[li]
            if kv_int8:
                ksc, vsc = ksc_all[li], vsc_all[li]
        else:
            ck = jax.lax.dynamic_index_in_dim(ck_all, li, 0, keepdims=False)
            cv = jax.lax.dynamic_index_in_dim(cv_all, li, 0, keepdims=False)
            if kv_int8:
                ksc = jax.lax.dynamic_index_in_dim(ksc_all, li, 0, keepdims=False)
                vsc = jax.lax.dynamic_index_in_dim(vsc_all, li, 0, keepdims=False)
        kvh = cfg.num_kv_heads
        g = cfg.num_heads // kvh
        if head_packed and attn_kernel:
            # Kernel sees one "row" whose KV-head axis carries B*KV packed
            # heads; q follows the same r*KV + j packing order as k/v.
            from ..ops.attention import flash_decode_mha

            qk = (q[:, 0] * cfg.head_dim**-0.5).reshape(b, kvh, g, cfg.head_dim)
            qk = qk.reshape(1, b * kvh, g, cfg.head_dim)
            o = flash_decode_mha(qk, ck, cv, kmask).reshape(
                b, 1, cfg.num_heads, cfg.head_dim
            )
        elif head_packed:
            # s == 1: plain packed decode read. s > 1: packed verify window —
            # causal over physical slots via q_offset (query row j of every
            # packed row sees kpos <= write_slot + j); rejected earlier tail
            # slots must be hidden by the caller's kv_mask (they sit BELOW
            # write_slot here, unlike the single-sample verify where slot
            # reuse pushes them past the write bound).
            qp = q.transpose(1, 0, 2, 3).reshape(1, s, b * cfg.num_heads, cfg.head_dim)
            o = mha(
                qp, ck, cv,
                kv_valid_len=write_slot + s,
                causal=s > 1,
                q_offset=write_slot,
                impl="xla",
                kv_mask=mask,
                kv_mask_per_head=mask.ndim == 2,
                k_scale=ksc,
                v_scale=vsc,
            ).reshape(s, b, cfg.num_heads, cfg.head_dim).transpose(1, 0, 2, 3)
        elif attn_kernel:
            from ..ops.attention import flash_decode_mha

            qk = (q[:, 0] * cfg.head_dim**-0.5).reshape(b, kvh, g, cfg.head_dim)
            o = flash_decode_mha(qk, ck, cv, kmask).reshape(b, 1, cfg.q_dim)
        elif s == 1:
            o = mha(
                q, ck, cv,
                kv_valid_len=write_slot + 1,
                causal=False,
                impl="xla",
                kv_mask=mask,
                k_scale=ksc,
                v_scale=vsc,
            )
        else:
            # verify window: causal over PHYSICAL slots via q_offset —
            # query row j allows kpos <= write_slot + j (prefix slots sit
            # below tail_start <= write_slot; the gap is masked by kv_mask)
            o = mha(
                q, ck, cv,
                kv_valid_len=write_slot + s,
                causal=True,
                q_offset=write_slot,
                impl="xla",
                kv_mask=mask,
                k_scale=ksc,
                v_scale=vsc,
            )
        aq = cfg.act_quant
        y = y + _mat(o.reshape(b, s, cfg.q_dim), lp["wo"], aq)
        h = rms_norm(y, lp["ln2"], cfg.rms_eps, cfg.rms_offset)
        y = y + mlp_block(lp, h, cfg)
        return y, ck_all, cv_all, ksc_all, vsc_all, q

    if unroll:
        qs = []
        for li in range(hi - lo):
            lp = jax.tree.map(lambda a: a[lo + li], layers)
            x, cache_k, cache_v, cache_ksc, cache_vsc, q = body(
                x, cache_k, cache_v, cache_ksc, cache_vsc, lp, li)
            qs.append(q)
        if kv_int8:
            return x, cache_k, cache_v, cache_ksc, cache_vsc, jnp.stack(qs)
        return x, cache_k, cache_v, jnp.stack(qs)

    if kv_int8:
        def step8(carry, li):
            y, ck_all, cv_all, ksc_all, vsc_all = carry
            lp = _take_layer(layers, lo + li)
            y, ck_all, cv_all, ksc_all, vsc_all, q = body(
                y, ck_all, cv_all, ksc_all, vsc_all, lp, li)
            return (y, ck_all, cv_all, ksc_all, vsc_all), q

        (x, cache_k, cache_v, cache_ksc, cache_vsc), q_all = jax.lax.scan(
            step8,
            (x, cache_k, cache_v, cache_ksc, cache_vsc),
            jnp.arange(hi - lo, dtype=jnp.int32),
        )
        return x, cache_k, cache_v, cache_ksc, cache_vsc, q_all

    def step(carry, li):
        y, ck_all, cv_all = carry
        lp = _take_layer(layers, lo + li)
        y, ck_all, cv_all, _, _, q = body(y, ck_all, cv_all, None, None, lp, li)
        return (y, ck_all, cv_all), q

    (x, cache_k, cache_v), q_all = jax.lax.scan(
        step,
        (x, cache_k, cache_v),
        jnp.arange(hi - lo, dtype=jnp.int32),
    )
    return x, cache_k, cache_v, q_all


def decode_logical_kpos(s_c: int, tail_start: int, kv_len):
    """Logical sequence position of each cache slot under fixed-slot decode
    writes: prefix slots keep their index; tail slot j holds the token at
    logical position kv_len + j. kv_len: scalar -> [s_c]; [B] -> [B, s_c]."""
    kpos = jnp.arange(s_c)
    kv = jnp.asarray(kv_len)
    if kv.ndim == 1:
        return jnp.where(
            kpos[None] < tail_start, kpos[None], kv[:, None] + (kpos[None] - tail_start)
        )
    return jnp.where(kpos < tail_start, kpos, kv + (kpos - tail_start))


def cascade_attention(q, pk, pv, pfx_mask, sk, sv, sfx_mask, cfg: DecoderConfig):
    """Single-token decode attention over a CASCADED KV layout: one shared
    read-only prefix cache (all rows attend to the same [sys|video] keys) plus
    a small head-packed per-row suffix/decode cache. The two partial softmaxes
    are merged exactly with the online-softmax identity (flash attention's
    combine step): softmax over [P | S] equals the lse-weighted average of the
    per-source attention outputs — no approximation.

    q: [B, 1, H, hd] (roped); pk/pv: [S_p, KV, hd] shared prefix;
    sk/sv: [S_s, B*KV, hd] head-packed suffix; pfx_mask: [S_p] (shared);
    sfx_mask: [B, S_s] per-row. Numerics mirror ops/attention._xla_mha:
    fp32 score accumulation (HIGHEST) without materializing fp32 K/V copies.

    Why it exists: batched prefix-cache serving otherwise carries B copies of
    the prefix in HBM and re-reads all B per decode step; sharing the prefix
    cuts decode KV traffic from B*S_p to S_p (decode is bandwidth-bound) and
    frees (B-1)*S_p cache HBM. The prefix matmul also feeds the MXU B*G query
    rows per KV head instead of G.
    """
    b = q.shape[0]
    kvh, hd = cfg.num_kv_heads, cfg.head_dim
    g = cfg.num_heads // kvh
    qh = q[:, 0].reshape(b, kvh, g, hd)
    scale = hd**-0.5

    sp = jnp.einsum(
        "bkgd,skd->bkgs", qh, pk,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) * scale
    sp = jnp.where(pfx_mask[None, None, None, :], sp, -1e30)
    mp = jnp.max(sp, -1)  # [B, KV, G]
    ep = jnp.exp(sp - mp[..., None])
    lp = jnp.sum(ep, -1)
    op = jnp.einsum(
        "bkgs,skd->bkgd", ep, pv,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    skr = sk.reshape(-1, b, kvh, hd)
    svr = sv.reshape(-1, b, kvh, hd)
    ss = jnp.einsum(
        "bkgd,sbkd->bkgs", qh, skr,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) * scale
    ss = jnp.where(sfx_mask[:, None, None, :], ss, -1e30)
    ms = jnp.max(ss, -1)
    es = jnp.exp(ss - ms[..., None])
    ls = jnp.sum(es, -1)
    os_ = jnp.einsum(
        "bkgs,sbkd->bkgd", es, svr,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    # exact combine; an all-masked source gets weight exp(-1e30 - m) == 0
    m = jnp.maximum(mp, ms)
    wp = jnp.exp(mp - m)
    ws = jnp.exp(ms - m)
    out = (op * wp[..., None] + os_ * ws[..., None]) / (
        lp * wp + ls * ws
    )[..., None]
    return out.reshape(b, 1, cfg.num_heads, hd).astype(q.dtype)


def cascade_decode_layers(
    layers: dict,
    lo: int,
    hi: int,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    pfx_k_all: jnp.ndarray,
    pfx_v_all: jnp.ndarray,
    pfx_len,
    sfx_k_all: jnp.ndarray,
    sfx_v_all: jnp.ndarray,
    sfx_lens,
    step_idx,
    tail_start: int,
    cfg: DecoderConfig,
):
    """Decode through layers [lo, hi) with the cascaded KV layout (one shared
    prefix cache + per-row head-packed suffix caches — see cascade_attention).
    x: [B, 1, D]. pfx_k_all/pfx_v_all: [Lg, 1, S_p, KV, hd] read-only (NOT
    carried through the scan — indexed per layer; XLA fuses the gather into
    the consuming matmuls). sfx_k_all/sfx_v_all: [Lg, 1, S_s, B*KV, hd]; the
    new token's K/V lands at fixed slot ``tail_start + step_idx`` (same
    batch-invariant DUS as decode_layers). sfx_lens: [B] per-row suffix valid
    lengths. Returns (x, sfx_k_all, sfx_v_all)."""
    if hi <= lo:
        return x, sfx_k_all, sfx_v_all
    b = x.shape[0]
    kvh = cfg.num_kv_heads
    write_slot = tail_start + step_idx
    kpos_s = jnp.arange(sfx_k_all.shape[2])
    sfx_mask = (kpos_s[None, :] < jnp.asarray(sfx_lens)[:, None]) | (
        (kpos_s[None, :] >= tail_start) & (kpos_s[None, :] <= write_slot)
    )
    pfx_mask = jnp.arange(pfx_k_all.shape[2]) < pfx_len

    def body(y, sk_all, sv_all, li):
        lp = _take_layer(layers, lo + li)
        h = rms_norm(y, lp["ln1"], cfg.rms_eps, cfg.rms_offset)
        q, k, v = qkv_proj(lp, h, cfg)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kp = k.reshape(1, 1, b * kvh, cfg.head_dim)
        vp = v.reshape(1, 1, b * kvh, cfg.head_dim)
        sk_all = jax.lax.dynamic_update_slice(sk_all, kp[None], (li, 0, write_slot, 0, 0))
        sv_all = jax.lax.dynamic_update_slice(sv_all, vp[None], (li, 0, write_slot, 0, 0))
        sk = jax.lax.dynamic_index_in_dim(sk_all, li, 0, keepdims=False)
        sv = jax.lax.dynamic_index_in_dim(sv_all, li, 0, keepdims=False)
        pk = jax.lax.dynamic_index_in_dim(pfx_k_all, li, 0, keepdims=False)
        pv = jax.lax.dynamic_index_in_dim(pfx_v_all, li, 0, keepdims=False)
        o = cascade_attention(q, pk[0], pv[0], pfx_mask, sk[0], sv[0], sfx_mask, cfg)
        y = y + _mat(o.reshape(b, 1, cfg.q_dim), lp["wo"], cfg.act_quant)
        h = rms_norm(y, lp["ln2"], cfg.rms_eps, cfg.rms_offset)
        y = y + mlp_block(lp, h, cfg)
        return y, sk_all, sv_all

    def step(carry, li):
        return body(*carry, li), None

    (x, sfx_k_all, sfx_v_all), _ = jax.lax.scan(
        step, (x, sfx_k_all, sfx_v_all), jnp.arange(hi - lo, dtype=jnp.int32)
    )
    return x, sfx_k_all, sfx_v_all


def cascade_verify_attention(q, pk, pv, pfx_mask, sk, sv, base_mask,
                             write_slot, cfg: DecoderConfig):
    """cascade_attention generalized to MULTI-TOKEN VERIFY queries
    (speculative decoding over the cascade layout): q [B, s, H, hd] scores
    s candidate tokens per row against the shared prefix (all-visible) and
    the head-packed suffix/tail, with the verify window's causality applied
    on physical tail slots — query row j sees suffix positions allowed by
    ``base_mask`` AND <= write_slot + j (the flat verify's q_offset bound).
    Exact online-softmax combine of the two sources, as cascade_attention.

    pk/pv: [S_p, KV, hd]; sk/sv: [S_s, B*KV, hd]; base_mask: [B, S_s]
    (per-row suffix valid + accepted tail slots + current/future window)."""
    b, s = q.shape[:2]
    kvh, hd = cfg.num_kv_heads, cfg.head_dim
    g = cfg.num_heads // kvh
    qh = q.reshape(b, s, kvh, g, hd)
    scale = hd**-0.5

    sp = jnp.einsum(
        "bskgd,tkd->bkgst", qh, pk,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) * scale
    sp = jnp.where(pfx_mask[None, None, None, None, :], sp, -1e30)
    mp = jnp.max(sp, -1)  # [B, KV, G, s]
    ep = jnp.exp(sp - mp[..., None])
    lp = jnp.sum(ep, -1)
    op = jnp.einsum(
        "bkgst,tkd->bkgsd", ep, pv,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    skr = sk.reshape(-1, b, kvh, hd)
    svr = sv.reshape(-1, b, kvh, hd)
    ss = jnp.einsum(
        "bskgd,tbkd->bkgst", qh, skr,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) * scale
    kpos = jnp.arange(sk.shape[0])
    vis = base_mask[:, None, :] & (
        kpos[None, None, :] <= write_slot + jnp.arange(s)[None, :, None]
    )  # [B, s, S_s]
    ss = jnp.where(vis[:, None, None, :, :], ss, -1e30)
    ms = jnp.max(ss, -1)
    es = jnp.exp(ss - ms[..., None])
    ls = jnp.sum(es, -1)
    os_ = jnp.einsum(
        "bkgst,tbkd->bkgsd", es, svr,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    m = jnp.maximum(mp, ms)
    wp = jnp.exp(mp - m)
    ws = jnp.exp(ms - m)
    out = (op * wp[..., None] + os_ * ws[..., None]) / (
        lp * wp + ls * ws
    )[..., None]
    # [B, KV, G, s, hd] -> [B, s, H, hd]
    return out.transpose(0, 3, 1, 2, 4).reshape(
        b, s, cfg.num_heads, hd
    ).astype(q.dtype)


def _verify_walk(layers, lo, hi, x, cos, sin, sfx_k_all, sfx_v_all,
                 write_slot, cfg: DecoderConfig, attn_fn):
    """The shared multi-token verify layer walk (cascade AND paged verify
    differ only in how the prefix side of the attention is read): per layer,
    project/rope the s candidates per row, write their K/V head-packed at
    tail slots [write_slot, write_slot + s), and call ``attn_fn(li, q, sk,
    sv)`` for the two-source attention. Returns (x, sfx_k_all, sfx_v_all)."""
    if hi <= lo:
        return x, sfx_k_all, sfx_v_all
    b, s = x.shape[:2]
    kvh = cfg.num_kv_heads

    def body(y, sk_all, sv_all, li):
        lp = _take_layer(layers, lo + li)
        h = rms_norm(y, lp["ln1"], cfg.rms_eps, cfg.rms_offset)
        q, k, v = qkv_proj(lp, h, cfg)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kp = k.transpose(1, 0, 2, 3).reshape(1, s, b * kvh, cfg.head_dim)
        vp = v.transpose(1, 0, 2, 3).reshape(1, s, b * kvh, cfg.head_dim)
        sk_all = jax.lax.dynamic_update_slice(sk_all, kp[None], (li, 0, write_slot, 0, 0))
        sv_all = jax.lax.dynamic_update_slice(sv_all, vp[None], (li, 0, write_slot, 0, 0))
        sk = jax.lax.dynamic_index_in_dim(sk_all, li, 0, keepdims=False)
        sv = jax.lax.dynamic_index_in_dim(sv_all, li, 0, keepdims=False)
        o = attn_fn(li, q, sk[0], sv[0])
        y = y + _mat(o.reshape(b, s, cfg.q_dim), lp["wo"], cfg.act_quant)
        h = rms_norm(y, lp["ln2"], cfg.rms_eps, cfg.rms_offset)
        y = y + mlp_block(lp, h, cfg)
        return y, sk_all, sv_all

    def step(carry, li):
        return body(*carry, li), None

    (x, sfx_k_all, sfx_v_all), _ = jax.lax.scan(
        step, (x, sfx_k_all, sfx_v_all), jnp.arange(hi - lo, dtype=jnp.int32)
    )
    return x, sfx_k_all, sfx_v_all


def cascade_verify_layers(
    layers: dict,
    lo: int,
    hi: int,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    pfx_k_all: jnp.ndarray,
    pfx_v_all: jnp.ndarray,
    pfx_len,
    sfx_k_all: jnp.ndarray,
    sfx_v_all: jnp.ndarray,
    base_mask: jnp.ndarray,
    step_idx,
    tail_start: int,
    cfg: DecoderConfig,
):
    """Multi-token verify walk over the cascade layout: x [B, s, D] scores
    s candidates per row against (shared prefix, head-packed suffix tails),
    writing the candidates' K/V at tail slots [tail_start + step_idx, ... + s)
    (the fixed-dispatch-slot layout of build_verify_chunk_batch). Returns
    (x, sfx_k_all, sfx_v_all)."""
    write_slot = tail_start + step_idx
    pfx_mask = jnp.arange(pfx_k_all.shape[2]) < pfx_len

    def attn_fn(li, q, sk, sv):
        pk = jax.lax.dynamic_index_in_dim(pfx_k_all, li, 0, keepdims=False)
        pv = jax.lax.dynamic_index_in_dim(pfx_v_all, li, 0, keepdims=False)
        return cascade_verify_attention(
            q, pk[0], pv[0], pfx_mask, sk, sv, base_mask, write_slot, cfg
        )

    return _verify_walk(layers, lo, hi, x, cos, sin, sfx_k_all, sfx_v_all,
                        write_slot, cfg, attn_fn)


def paged_cascade_attention(q, pks, pvs, pfx_lens, page, sk, sv, sfx_mask,
                            cfg: DecoderConfig, ksc=None, vsc=None):
    """cascade_attention generalized to a PAGED prefix pool: ``pks``/``pvs``
    hold P distinct read-only prefixes ([P, S_p, KV, hd]) and row r attends
    to page ``page[r]``. An inner scan visits each page ONCE per step (HBM
    reads P*S_p regardless of B — slots sharing a page share the read) and
    computes the partial-softmax stats for all rows against that page; each
    row then keeps the stats of its own page. FLOPs are P x the minimum, but
    single-token decode is bandwidth-bound and the MXU idles at M=1, so the
    extra arithmetic is free. Math per row is identical to cascade_attention
    with that row's page as the shared prefix.

    q: [B, 1, H, hd]; pfx_lens: [P] per-page valid lengths; page: [B] int32;
    sk/sv/sfx_mask as in cascade_attention. ``ksc``/``vsc`` ([P, S_p, KV],
    int8 pools) dequantize by scaling the score/prob matrices — the
    int8->f32 operand convert fuses into the dot, so the page HBM read
    stays int8."""
    b = q.shape[0]
    kvh, hd = cfg.num_kv_heads, cfg.head_dim
    g = cfg.num_heads // kvh
    qh = q[:, 0].reshape(b, kvh, g, hd)
    scale = hd**-0.5
    kpos = jnp.arange(pks.shape[1])
    n_pages = pks.shape[0]
    int8 = ksc is not None

    def page_body(carry, inp):
        if int8:
            pk, pv, plen, pidx, kc, vc = inp
            pk = pk.astype(jnp.float32)
            pv = pv.astype(jnp.float32)
        else:
            pk, pv, plen, pidx = inp
        sp = jnp.einsum(
            "bkgd,skd->bkgs", qh, pk,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ) * scale
        if int8:  # kc: [S_p, KV] -> broadcast over (B, G)
            sp = sp * kc.T[None, :, None, :]
        sp = jnp.where((kpos < plen)[None, None, None, :], sp, -1e30)
        mp = jnp.max(sp, -1)  # [B, KV, G]
        ep = jnp.exp(sp - mp[..., None])
        lp = jnp.sum(ep, -1)
        ev = ep * vc.T[None, :, None, :] if int8 else ep
        op = jnp.einsum(
            "bkgs,skd->bkgd", ev, pv,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        sel = (page == pidx)[:, None, None]
        m0, l0, o0 = carry
        return (
            jnp.where(sel, mp, m0),
            jnp.where(sel, lp, l0),
            jnp.where(sel[..., None], op, o0),
        ), None

    init = (
        jnp.full((b, kvh, g), -1e30, jnp.float32),
        jnp.zeros((b, kvh, g), jnp.float32),
        jnp.zeros((b, kvh, g, hd), jnp.float32),
    )
    xs = (pks, pvs, pfx_lens, jnp.arange(n_pages, dtype=jnp.int32))
    if int8:
        xs = xs + (ksc, vsc)
    (mp, lp, op), _ = jax.lax.scan(page_body, init, xs)

    skr = sk.reshape(-1, b, kvh, hd)
    svr = sv.reshape(-1, b, kvh, hd)
    ss = jnp.einsum(
        "bkgd,sbkd->bkgs", qh, skr,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) * scale
    ss = jnp.where(sfx_mask[:, None, None, :], ss, -1e30)
    ms = jnp.max(ss, -1)
    es = jnp.exp(ss - ms[..., None])
    ls = jnp.sum(es, -1)
    os_ = jnp.einsum(
        "bkgs,sbkd->bkgd", es, svr,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    m = jnp.maximum(mp, ms)
    wp = jnp.exp(mp - m)
    ws = jnp.exp(ms - m)
    out = (op * wp[..., None] + os_ * ws[..., None]) / (
        lp * wp + ls * ws
    )[..., None]
    return out.reshape(b, 1, cfg.num_heads, hd).astype(q.dtype)


def paged_cascade_decode_layers(
    layers: dict,
    lo: int,
    hi: int,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    pool_k_all: jnp.ndarray,
    pool_v_all: jnp.ndarray,
    pfx_lens: jnp.ndarray,
    page: jnp.ndarray,
    sfx_k_all: jnp.ndarray,
    sfx_v_all: jnp.ndarray,
    sfx_lens,
    step_idx,
    tail_start: int,
    cfg: DecoderConfig,
    tail_min=None,
    k_scales=None,
    v_scales=None,
):
    """cascade_decode_layers over a paged prefix pool (continuous batching x
    cascade): pool_k_all/pool_v_all [Lg, P, S_p, KV, hd] hold P distinct
    videos' prefixes once each; row r reads page ``page[r]``
    (paged_cascade_attention). ``tail_min`` [B] (optional) hides decode-tail
    slots written before a row's admission step — the previous occupant's
    K/V in the shared slot ring (runtime/serving.py semantics).
    ``k_scales``/``v_scales`` [Lg, P, S_p, KV]: int8-pool dequant scales.
    Returns (x, sfx_k_all, sfx_v_all)."""
    if hi <= lo:
        return x, sfx_k_all, sfx_v_all
    b = x.shape[0]
    kvh = cfg.num_kv_heads
    write_slot = tail_start + step_idx
    kpos_s = jnp.arange(sfx_k_all.shape[2])
    lo_bound = (
        tail_start if tail_min is None
        else tail_start + jnp.asarray(tail_min)[:, None]
    )
    sfx_mask = (kpos_s[None, :] < jnp.asarray(sfx_lens)[:, None]) | (
        (kpos_s[None, :] >= lo_bound) & (kpos_s[None, :] <= write_slot)
    )

    def body(y, sk_all, sv_all, li):
        lp = _take_layer(layers, lo + li)
        h = rms_norm(y, lp["ln1"], cfg.rms_eps, cfg.rms_offset)
        q, k, v = qkv_proj(lp, h, cfg)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kp = k.reshape(1, 1, b * kvh, cfg.head_dim)
        vp = v.reshape(1, 1, b * kvh, cfg.head_dim)
        sk_all = jax.lax.dynamic_update_slice(sk_all, kp[None], (li, 0, write_slot, 0, 0))
        sv_all = jax.lax.dynamic_update_slice(sv_all, vp[None], (li, 0, write_slot, 0, 0))
        sk = jax.lax.dynamic_index_in_dim(sk_all, li, 0, keepdims=False)
        sv = jax.lax.dynamic_index_in_dim(sv_all, li, 0, keepdims=False)
        pks = jax.lax.dynamic_index_in_dim(pool_k_all, li, 0, keepdims=False)
        pvs = jax.lax.dynamic_index_in_dim(pool_v_all, li, 0, keepdims=False)
        ksc = vsc = None
        if k_scales is not None:
            ksc = jax.lax.dynamic_index_in_dim(k_scales, li, 0, keepdims=False)
            vsc = jax.lax.dynamic_index_in_dim(v_scales, li, 0, keepdims=False)
        o = paged_cascade_attention(
            q, pks, pvs, pfx_lens, page, sk[0], sv[0], sfx_mask, cfg,
            ksc=ksc, vsc=vsc,
        )
        y = y + _mat(o.reshape(b, 1, cfg.q_dim), lp["wo"], cfg.act_quant)
        h = rms_norm(y, lp["ln2"], cfg.rms_eps, cfg.rms_offset)
        y = y + mlp_block(lp, h, cfg)
        return y, sk_all, sv_all

    def step(carry, li):
        return body(*carry, li), None

    (x, sfx_k_all, sfx_v_all), _ = jax.lax.scan(
        step, (x, sfx_k_all, sfx_v_all), jnp.arange(hi - lo, dtype=jnp.int32)
    )
    return x, sfx_k_all, sfx_v_all


def paged_cascade_verify_attention(q, pks, pvs, pfx_lens, page, sk, sv,
                                   base_mask, write_slot, cfg: DecoderConfig,
                                   ksc=None, vsc=None):
    """Multi-token verify over a PAGED prefix pool: the page-scan of
    paged_cascade_attention (each page read once, rows keep their own
    page's stats) combined with the verify-window causality of
    cascade_verify_attention. q: [B, s, H, hd]; pks/pvs: [P, S_p, KV, hd];
    pfx_lens: [P]; page: [B]; base_mask: [B, S_s]; ksc/vsc: int8-pool
    dequant scales [P, S_p, KV] (see paged_cascade_attention)."""
    b, s = q.shape[:2]
    kvh, hd = cfg.num_kv_heads, cfg.head_dim
    g = cfg.num_heads // kvh
    qh = q.reshape(b, s, kvh, g, hd)
    scale = hd**-0.5
    kpos_p = jnp.arange(pks.shape[1])
    n_pages = pks.shape[0]
    int8 = ksc is not None

    def page_body(carry, inp):
        if int8:
            pk, pv, plen, pidx, kc, vc = inp
            pk = pk.astype(jnp.float32)
            pv = pv.astype(jnp.float32)
        else:
            pk, pv, plen, pidx = inp
        sp = jnp.einsum(
            "bskgd,tkd->bkgst", qh, pk,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ) * scale
        if int8:  # kc: [S_p, KV] -> broadcast over (B, G, s)
            sp = sp * kc.T[None, :, None, None, :]
        sp = jnp.where((kpos_p < plen)[None, None, None, None, :], sp, -1e30)
        mp = jnp.max(sp, -1)  # [B, KV, G, s]
        ep = jnp.exp(sp - mp[..., None])
        lp = jnp.sum(ep, -1)
        ev = ep * vc.T[None, :, None, None, :] if int8 else ep
        op = jnp.einsum(
            "bkgst,tkd->bkgsd", ev, pv,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        sel = (page == pidx)[:, None, None, None]
        m0, l0, o0 = carry
        return (
            jnp.where(sel, mp, m0),
            jnp.where(sel, lp, l0),
            jnp.where(sel[..., None], op, o0),
        ), None

    init = (
        jnp.full((b, kvh, g, s), -1e30, jnp.float32),
        jnp.zeros((b, kvh, g, s), jnp.float32),
        jnp.zeros((b, kvh, g, s, hd), jnp.float32),
    )
    xs = (pks, pvs, pfx_lens, jnp.arange(n_pages, dtype=jnp.int32))
    if int8:
        xs = xs + (ksc, vsc)
    (mp, lp, op), _ = jax.lax.scan(page_body, init, xs)

    skr = sk.reshape(-1, b, kvh, hd)
    svr = sv.reshape(-1, b, kvh, hd)
    ss = jnp.einsum(
        "bskgd,tbkd->bkgst", qh, skr,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) * scale
    kpos = jnp.arange(sk.shape[0])
    vis = base_mask[:, None, :] & (
        kpos[None, None, :] <= write_slot + jnp.arange(s)[None, :, None]
    )
    ss = jnp.where(vis[:, None, None, :, :], ss, -1e30)
    ms = jnp.max(ss, -1)
    es = jnp.exp(ss - ms[..., None])
    ls = jnp.sum(es, -1)
    os_ = jnp.einsum(
        "bkgst,tbkd->bkgsd", es, svr,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    m = jnp.maximum(mp, ms)
    wp = jnp.exp(mp - m)
    ws = jnp.exp(ms - m)
    out = (op * wp[..., None] + os_ * ws[..., None]) / (
        lp * wp + ls * ws
    )[..., None]
    return out.transpose(0, 3, 1, 2, 4).reshape(
        b, s, cfg.num_heads, hd
    ).astype(q.dtype)


def paged_cascade_verify_layers(
    layers: dict,
    lo: int,
    hi: int,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    pool_k_all: jnp.ndarray,
    pool_v_all: jnp.ndarray,
    pfx_lens: jnp.ndarray,
    page: jnp.ndarray,
    sfx_k_all: jnp.ndarray,
    sfx_v_all: jnp.ndarray,
    base_mask: jnp.ndarray,
    step_idx,
    tail_start: int,
    cfg: DecoderConfig,
    k_scales=None,
    v_scales=None,
):
    """cascade_verify_layers over a paged prefix pool: x [B, s, D] scores s
    candidates per row against (its pool page, its head-packed suffix tail).
    ``k_scales``/``v_scales``: int8-pool dequant scales [Lg, P, S_p, KV].
    Returns (x, sfx_k_all, sfx_v_all)."""
    write_slot = tail_start + step_idx

    def attn_fn(li, q, sk, sv):
        pks = jax.lax.dynamic_index_in_dim(pool_k_all, li, 0, keepdims=False)
        pvs = jax.lax.dynamic_index_in_dim(pool_v_all, li, 0, keepdims=False)
        ksc = vsc = None
        if k_scales is not None:
            ksc = jax.lax.dynamic_index_in_dim(k_scales, li, 0, keepdims=False)
            vsc = jax.lax.dynamic_index_in_dim(v_scales, li, 0, keepdims=False)
        return paged_cascade_verify_attention(
            q, pks, pvs, pfx_lens, page, sk, sv, base_mask, write_slot,
            cfg, ksc=ksc, vsc=vsc,
        )

    return _verify_walk(layers, lo, hi, x, cos, sin, sfx_k_all, sfx_v_all,
                        write_slot, cfg, attn_fn)


def paged_extend_layers(
    layers: dict,
    lo: int,
    hi: int,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    pool_k_all: jnp.ndarray,
    pool_v_all: jnp.ndarray,
    pfx_len,
    pidx,
    sfx_k_all: jnp.ndarray,
    sfx_v_all: jnp.ndarray,
    slot,
    cfg: DecoderConfig,
    k_scales=None,
    v_scales=None,
):
    """Prefix-pool admission: run ONE request's ``s_sfx`` suffix tokens
    (x [1, s, D]) against pool page ``pidx`` and write their K/V straight
    into the head-packed tail buffers at KV-head block ``slot`` — no per-
    request prefix copy is ever materialized (the page is indexed per layer;
    XLA fuses the gather into the consuming matmuls, see CLAUDE.md). Suffix
    token j attends to the page's ``pfx_len`` prefix keys plus suffix keys
    [0, j] (causal), combined with the exact online-softmax identity — the
    same visibility build_extend gives the flat path. ``k_scales``/
    ``v_scales``: int8-pool dequant scales [Lg, P, S_p, KV]. Returns
    (x, sfx_k_all, sfx_v_all)."""
    if hi <= lo:
        return x, sfx_k_all, sfx_v_all
    s = x.shape[1]
    kvh, hd = cfg.num_kv_heads, cfg.head_dim
    g = cfg.num_heads // kvh
    scale = hd**-0.5
    kpos_p = jnp.arange(pool_k_all.shape[2])
    causal = jnp.arange(s)[:, None] >= jnp.arange(s)[None, :]  # [s_q, s_k]
    int8 = k_scales is not None

    def attn(q, pk, pv, kn, vn, kc, vc):
        qh = q[0].reshape(s, kvh, g, hd)
        if int8:
            pk = pk.astype(jnp.float32)
            pv = pv.astype(jnp.float32)
        sp = jnp.einsum(
            "skgd,tkd->skgt", qh, pk,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ) * scale
        if int8:  # kc: [S_p, KV] -> broadcast over (s, G)
            sp = sp * kc.T[None, :, None, :]
        sp = jnp.where((kpos_p < pfx_len)[None, None, None, :], sp, -1e30)
        mp = jnp.max(sp, -1)
        ep = jnp.exp(sp - mp[..., None])
        lp = jnp.sum(ep, -1)
        ev = ep * vc.T[None, :, None, :] if int8 else ep
        op = jnp.einsum(
            "skgt,tkd->skgd", ev, pv,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        ss = jnp.einsum(
            "skgd,tkd->skgt", qh, kn[0],
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ) * scale
        ss = jnp.where(causal[:, None, None, :], ss, -1e30)
        ms = jnp.max(ss, -1)
        es = jnp.exp(ss - ms[..., None])
        ls = jnp.sum(es, -1)
        os_ = jnp.einsum(
            "skgt,tkd->skgd", es, vn[0],
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        m = jnp.maximum(mp, ms)
        wp = jnp.exp(mp - m)
        ws = jnp.exp(ms - m)
        out = (op * wp[..., None] + os_ * ws[..., None]) / (
            lp * wp + ls * ws
        )[..., None]
        return out.reshape(1, s, cfg.num_heads, hd).astype(q.dtype)

    def body(y, sk_all, sv_all, li):
        lp_ = _take_layer(layers, lo + li)
        h = rms_norm(y, lp_["ln1"], cfg.rms_eps, cfg.rms_offset)
        q, k, v = qkv_proj(lp_, h, cfg)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        sk_all = jax.lax.dynamic_update_slice(
            sk_all, k[None], (li, 0, 0, slot * kvh, 0)
        )
        sv_all = jax.lax.dynamic_update_slice(
            sv_all, v[None], (li, 0, 0, slot * kvh, 0)
        )
        pk = jax.lax.dynamic_slice(
            pool_k_all, (li, pidx, 0, 0, 0),
            (1, 1) + pool_k_all.shape[2:],
        )[0, 0]
        pv = jax.lax.dynamic_slice(
            pool_v_all, (li, pidx, 0, 0, 0),
            (1, 1) + pool_v_all.shape[2:],
        )[0, 0]
        kc = vc = None
        if int8:
            kc = jax.lax.dynamic_slice(
                k_scales, (li, pidx, 0, 0), (1, 1) + k_scales.shape[2:]
            )[0, 0]
            vc = jax.lax.dynamic_slice(
                v_scales, (li, pidx, 0, 0), (1, 1) + v_scales.shape[2:]
            )[0, 0]
        o = attn(q, pk, pv, k, v, kc, vc)
        y = y + _mat(o.reshape(1, s, cfg.q_dim), lp_["wo"], cfg.act_quant)
        h = rms_norm(y, lp_["ln2"], cfg.rms_eps, cfg.rms_offset)
        y = y + mlp_block(lp_, h, cfg)
        return y, sk_all, sv_all

    def step(carry, li):
        return body(*carry, li), None

    (x, sfx_k_all, sfx_v_all), _ = jax.lax.scan(
        step, (x, sfx_k_all, sfx_v_all), jnp.arange(hi - lo, dtype=jnp.int32)
    )
    return x, sfx_k_all, sfx_v_all


# ---------------------------------------------------------------------------
# KV cache (two groups around the reduction layer)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Per-layer-group KV cache. Token reduction at layer k splits the stack
    into groups with different sequence lengths; each group's cache keeps its
    own packed valid length (reference invariant, llava_qwen.py:258: layer-0
    cache keeps the unmerged length, the last layer's the merged length)."""

    ks: tuple  # per group: [Lg, B, Sg, KV, hd]
    vs: tuple
    lens: tuple  # per group: scalar int32 packed valid length
    pos_base: jnp.ndarray  # decode position base (one past last valid pos id)
    # tokens the merge kept beyond the static video_budget and silently
    # dropped (raster tail) — a parity break vs the budget-free reference
    # that must be reported, not hidden. None = no reducer ran.
    budget_overflow: Any = None
    # int8 live-cache mode (quantize_kv_cache): per-(position, KV-head)
    # symmetric dequant scales, [Lg, B, Sg, KV] fp32 per group; ks/vs are
    # then int8. None = bf16 cache. Same scheme as the read-only prefix
    # pool (runtime/paged.py), extended to the WRITABLE decode cache: every
    # decoded token's K/V is quantized at its write slot with its own
    # scale. Motivation: single-stream decode is weight-read-bound (~250
    # MB/layer int8 weights vs ~26 MB/layer bf16 KV at the 12.8k merged
    # point), but batched decode reads B caches per weight read — KV
    # approaches half the step traffic at b=8 — and cache HBM is what caps
    # the flat batch size on one chip. int8 KV halves both.
    k_scales: Any = None
    v_scales: Any = None

    @property
    def merged_len(self) -> jnp.ndarray:
        """Reference's 'merged token count' readout (get_seq_length(-1))."""
        return self.lens[-1]

    # two-group convenience (the common single-reducer case)
    @property
    def len_a(self):
        return self.lens[0]

    @property
    def len_b(self):
        return self.lens[-1]


def quantize_kv(x: jnp.ndarray):
    """Symmetric int8 quantization over the trailing (head_dim) axis:
    x [..., hd] -> (int8 [..., hd], fp32 scales [...]). The per-(position,
    KV-head) scheme of the int8 prefix pool (runtime/paged.py)."""
    scale = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.round(x.astype(jnp.float32) / scale[..., None])
    return q.astype(jnp.int8), scale


@functools.partial(jax.jit, donate_argnums=(0,))
def quantize_kv_cache(cache: KVCache) -> KVCache:
    """bf16 KVCache -> int8 KVCache with per-(position, KV-head) scales
    (the ``kv_int8`` decode mode). One pass over the cache at the
    prefill->decode handoff; the reserved decode tail (zeros) quantizes to
    zeros and every later token is re-quantized at its write slot by
    decode_layers. Bounded approximation like the int8 pool:
    |error| <= scale/2 per element on K and V reads.

    DONATION CONTRACT: the input cache's buffers are donated
    (donate_argnums=(0,)) — on TPU they are invalidated by this call. Do
    NOT pass a cache that is still referenced elsewhere (e.g. a shared
    bf16 prefix cache to be reused for a later batch); pass a fresh
    per-request cache, or copy first (jax.tree.map(jnp.copy, cache))."""
    ks, vs, ksc, vsc = [], [], [], []
    for k, v in zip(cache.ks, cache.vs):
        kq, ks_ = quantize_kv(k)
        vq, vs_ = quantize_kv(v)
        ks.append(kq)
        vs.append(vq)
        ksc.append(ks_)
        vsc.append(vs_)
    return dataclasses.replace(
        cache, ks=tuple(ks), vs=tuple(vs),
        k_scales=tuple(ksc), v_scales=tuple(vsc),
    )


def _mat(x: jnp.ndarray, w, act_quant=False) -> jnp.ndarray:
    """x @ w, transparently dequantizing int8/int4 weight dicts
    (models/quant.py). act_quant truthy runs int8-weight matmuls on the int8
    MXU path with dynamic per-token activation quantization (cfg.act_quant);
    the "kernel" value additionally quantizes activations with the
    single-pass Pallas kernel (quantize_rows). int4 weights use the
    fused-unpack GEMV kernel for decode shapes."""
    if is_quantized4(w):
        return matmul_w4(x, w)
    if act_quant and is_quantized(w):
        return matmul_w8a8(x, w, kernel=act_quant == "kernel")
    return x @ dequantize(w, x.dtype)
