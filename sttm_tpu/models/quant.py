"""Weight-only int8/int4 quantization (per-output-channel, symmetric).

Purpose: HBM capacity AND decode bandwidth. Full 7B bf16 (13.3 GB) +
25k-token prefill transients exceed one v5e chip; int8 weights (≈6.7 GB)
fit with room to spare, so the FULL 28-layer model runs single-chip; int4
(≈3.4 GB) additionally halves the decode weight-read floor (decode is
weight-bandwidth-bound). Matmul math stays bf16 unless ``act_quant``
selects the int8 MXU path (w8a8).

Quantized tensors are {"q": int8 [..., out], "s": f32 [out]} (int8) or
{"q4": int8 [..., in/2, out] nibble-packed, "s": f32 [out]} (int4) dicts in
the params pytree; the decoder's matmul helper dispatches transparently
(models/qwen2.py _mat). int4 packing puts input row ``k`` in the LOW nibble
and row ``k + K/2`` in the HIGH nibble of byte row ``k``, so unpacking needs
no interleave: ``x @ W == x[:, :K/2] @ lo + x[:, K/2:] @ hi``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "quantize_tensor", "dequantize", "quantize_params", "is_quantized",
    "matmul_w8a8", "quantize_tensor_int4", "is_quantized4", "matmul_w4",
    "fuse_layer_projections",
]

# weight matrices worth quantizing (stacked-layer projections)
_QUANT_KEYS = ("wq", "wk", "wv", "wo", "wg", "wu", "wd")


def quantize_tensor(w: jnp.ndarray) -> dict:
    """[..., in, out] -> int8 with per-output-channel scales."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # per out column
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale.astype(jnp.float32)}


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def dequantize(w, dtype=jnp.bfloat16) -> jnp.ndarray:
    if not is_quantized(w):
        return w
    return (w["q"].astype(jnp.float32) * w["s"]).astype(dtype)


def quantize_act(x: jnp.ndarray):
    """Dynamic per-token symmetric int8 activation quantization:
    [..., K] -> (int8 [..., K], f32 scales [..., 1]). XLA path."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    return xq, xs


def matmul_w8a8(x: jnp.ndarray, w: dict, kernel: bool = False) -> jnp.ndarray:
    """int8 x int8 matmul on the int8 MXU path (2x bf16 peak on v5e:
    394 TOPS vs 197 TFLOPs; measured ~1.5x end-to-end on [25.6k, 3584] x
    [3584, 18944]). Per-token symmetric activation quantization fused into
    the op; weights carry per-output-channel scales from quantize_tensor.
    ``kernel=True`` quantizes the activation with the single-pass Pallas
    kernel (ops/kernels.py quantize_rows — XLA's two-pass lowering measured
    266-330 GB/s eff, BENCH_PREFILL_MFU.json); same math (codes may
    differ by 1 at exact rounding boundaries across programs)."""
    q, s = w["q"], w["s"]  # [in, out] int8, [1, out] f32
    if kernel:
        from ..ops.kernels import quantize_rows

        xq, xs = quantize_rows(x)
    else:
        xq, xs = quantize_act(x)
    acc = jax.lax.dot_general(
        xq, q, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * xs * s.reshape(s.shape[-1])
    return out.astype(x.dtype)


def matmul_w8a8_pre(xq: jnp.ndarray, xs: jnp.ndarray, w: dict,
                    out_dtype=jnp.bfloat16, k_splits: int = 1) -> jnp.ndarray:
    """int8 MXU matmul over PRE-quantized activations (xq int8 [..., K],
    xs f32 [..., 1] from quantize_act/quantize_rows). Lets several GEMMs
    over the same input (q/k/v, gate/up) share ONE activation-quantize
    pass instead of re-quantizing per matmul — same math as matmul_w8a8
    (XLA CSE usually dedupes the re-quantize already; this makes the
    sharing explicit and kernel-compatible).

    ``k_splits > 1`` contracts K in that many chunks accumulated in int32
    — EXACT (integer adds commute) but it changes XLA's tiling choice for
    skinny-N GEMMs: the [18944, 3584] down_proj measured 83.4% -> 89.2%
    of int8 peak at M=12800 with k_splits=4 (BENCH_W8A8_TAIL.json)."""
    q, s = w["q"], w["s"]
    kdim = xq.shape[-1]
    if k_splits > 1 and kdim % k_splits == 0:
        kc = kdim // k_splits
        acc = None
        for p in range(k_splits):
            a = jax.lax.dot_general(
                jax.lax.slice_in_dim(xq, p * kc, (p + 1) * kc, axis=xq.ndim - 1),
                jax.lax.slice_in_dim(q, p * kc, (p + 1) * kc, axis=0),
                (((xq.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = a if acc is None else acc + a
    else:
        acc = jax.lax.dot_general(
            xq, q, (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    out = acc.astype(jnp.float32) * xs * s.reshape(s.shape[-1])
    return out.astype(out_dtype)


def quantize_tensor_int4(w: jnp.ndarray) -> dict:
    """[..., in, out] -> nibble-packed int4 with per-output-channel scales.

    Byte row ``k`` holds input row ``k`` (low nibble) and ``k + K/2`` (high
    nibble); requires even ``in``.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -8, 7).astype(jnp.int8)
    k = q.shape[-2]
    assert k % 2 == 0, "int4 packing requires an even input dim"
    lo = q[..., : k // 2, :]
    hi = q[..., k // 2 :, :]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0x0F), jnp.left_shift(hi, 4))
    return {"q4": packed, "s": scale.astype(jnp.float32)}


def is_quantized4(w) -> bool:
    return isinstance(w, dict) and "q4" in w and "s" in w


def unpack_int4(q4: jnp.ndarray):
    """Packed [..., K/2, N] int8 -> (lo, hi) int8 halves ([..., K/2, N] each:
    input rows [0, K/2) and [K/2, K))."""
    lo = jnp.right_shift(jnp.left_shift(q4, 4), 4)  # sign-extend low nibble
    hi = jnp.right_shift(q4, 4)  # arithmetic shift sign-extends
    return lo, hi


def matmul_w4(x: jnp.ndarray, w: dict) -> jnp.ndarray:
    """x @ dequant(int4 weights). Decode-shaped inputs (few rows) go through
    the fused Pallas GEMV kernel on TPU (unpack never touches HBM); larger
    shapes use the two-dot XLA form (prefill is compute-bound)."""
    q4, s = w["q4"], w["s"]
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    if rows <= 32 and q4.ndim == 2 and jax.default_backend() != "cpu":
        from ..ops.kernels import gemv_w4

        y = gemv_w4(x.reshape(rows, x.shape[-1]), q4, s)
        return y.reshape(x.shape[:-1] + (q4.shape[-1],)).astype(x.dtype)
    lo, hi = unpack_int4(q4)
    k2 = q4.shape[-2]
    sc = s.reshape(s.shape[-1])
    xl = x[..., :k2].astype(jnp.bfloat16)
    xh = x[..., k2:].astype(jnp.bfloat16)
    acc = jnp.matmul(xl, lo.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    acc = acc + jnp.matmul(xh, hi.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return (acc * sc).astype(x.dtype)


def quantize_params(params: dict, host: bool = True, bits: int = 8) -> dict:
    """Quantize the layer projection matrices of a qwen2 params pytree
    (bits = 8 or 4).

    host=True quantizes layer-by-layer in numpy: quantizing the full stacked
    tensor on-device materializes an fp32 copy of all weights (>HBM for 7B).
    """
    import numpy as np

    assert bits in (4, 8)
    out = dict(params)
    layers = dict(params["layers"])
    for k in _QUANT_KEYS:
        if k not in layers or is_quantized(layers[k]) or is_quantized4(layers[k]):
            continue
        if not host:
            layers[k] = (
                quantize_tensor(layers[k]) if bits == 8 else quantize_tensor_int4(layers[k])
            )
            continue
        w = np.asarray(layers[k], np.float32)
        qs, ss = [], []
        for li in range(w.shape[0]):
            if bits == 8:
                amax = np.abs(w[li]).max(axis=-2, keepdims=True)
                scale = np.maximum(amax / 127.0, 1e-12)
                qs.append(np.clip(np.round(w[li] / scale), -127, 127).astype(np.int8))
            else:
                amax = np.abs(w[li]).max(axis=-2, keepdims=True)
                scale = np.maximum(amax / 7.0, 1e-12)
                q = np.clip(np.round(w[li] / scale), -8, 7).astype(np.int8)
                k2 = q.shape[-2] // 2
                qs.append(((q[:k2] & 0x0F) | (q[k2:] << 4)).astype(np.int8))
            ss.append(scale.astype(np.float32))
        key = "q" if bits == 8 else "q4"
        layers[k] = {key: jnp.asarray(np.stack(qs)), "s": jnp.asarray(np.stack(ss))}
    out["layers"] = layers
    return out


def fuse_layer_projections(params: dict) -> dict:
    """Concatenate the per-layer QKV and gate/up projections along the
    OUTPUT axis: wq|wk|wv -> "wqkv" [L, D, Nq+2*Nkv], wg|wu -> "wgu"
    [L, D, 2*I] (biases fused likewise). The decoder splits the outputs
    (qwen2.qkv_proj / mlp_block dispatch on the fused keys).

    Why: decode GEMVs are weight-bandwidth-bound and XLA streams each at
    ~90% of HBM peak, but a 28-layer step still issues 196 separate GEMV
    ops whose per-op ramp-in/out never overlaps (round-2 gap: 12.9 ms/token
    measured vs the 8.4 ms int8 weight-read floor). Fusing QKV and gate/up
    keeps the math identical (same columns, same per-output-channel scales)
    while cutting the op count to ~112 with larger, better-streaming reads.

    Works for bf16, int8 ("q"/"s" concat) and int4 ("q4"/"s") layouts.
    Note: the fused layout is a SINGLE-CHIP serving optimization — tp
    sharding splits the out axis across section boundaries; shard first,
    fuse per shard, or keep unfused params for multi-chip.
    """

    def cat(ws, axis=-1):
        if is_quantized(ws[0]):
            return {"q": jnp.concatenate([w["q"] for w in ws], axis=axis),
                    "s": jnp.concatenate([w["s"] for w in ws], axis=axis)}
        if is_quantized4(ws[0]):
            return {"q4": jnp.concatenate([w["q4"] for w in ws], axis=axis),
                    "s": jnp.concatenate([w["s"] for w in ws], axis=axis)}
        return jnp.concatenate(ws, axis=axis)

    layers = dict(params["layers"])
    if all(k in layers for k in ("wq", "wk", "wv")):
        layers["wqkv"] = cat([layers.pop("wq"), layers.pop("wk"), layers.pop("wv")])
        if "bq" in layers:
            layers["bqkv"] = jnp.concatenate(
                [layers.pop("bq"), layers.pop("bk"), layers.pop("bv")], axis=-1
            )
    if all(k in layers for k in ("wg", "wu")):
        layers["wgu"] = cat([layers.pop("wg"), layers.pop("wu")])
    out = dict(params)
    out["layers"] = layers
    return out


def random_quantized_init(cfg, key, bits: int = 8, on_device: bool = True) -> dict:
    """Random params with projections born int8/int4 (benchmarking: avoids
    ever materializing full-precision weights on device).

    on_device=True (default) generates the int8 tensors with jax.random on
    the accelerator — host generation + transfer of ~6.7 GB through the
    remote-TPU tunnel dominated the bench's wall-clock (the driver-timeout
    fight, BENCH_r02 rc=124); on-device generation is seconds."""
    import numpy as np

    from . import qwen2

    assert bits in (4, 8)
    small = __import__("dataclasses").replace(cfg, num_layers=1)
    proto = qwen2.init_params(small, key)  # one layer on device (tiny)
    rng = np.random.default_rng(0)
    l = cfg.num_layers
    keys = iter(jax.random.split(jax.random.key(0), 64))

    def rand_int8(shape, lo, hi):
        if on_device:
            return jax.random.randint(next(keys), shape, lo, hi, dtype=jnp.int8)
        return jnp.asarray(rng.integers(lo, hi, size=shape, dtype=np.int8))

    layers = {}
    for k, v in proto["layers"].items():
        shape = (l,) + v.shape[1:]
        if k in _QUANT_KEYS and bits == 4:
            pshape = (l, shape[1] // 2, shape[2])
            layers[k] = {
                "q4": rand_int8(pshape, -128, 128),
                "s": jnp.full((l,) + (1,) * (len(shape) - 2) + (shape[-1],),
                              v.shape[-2] ** -0.5 / 4.0, jnp.float32),
            }
        elif k in _QUANT_KEYS:
            layers[k] = {
                "q": rand_int8(shape, -127, 128),
                "s": jnp.full((l,) + (1,) * (len(shape) - 2) + (shape[-1],),
                              v.shape[-2] ** -0.5 / 64.0, jnp.float32),
            }
        else:
            layers[k] = jnp.zeros(shape, v.dtype) if k.startswith("b") else jnp.ones(shape, v.dtype)
    out = {"layers": layers, "embed": proto["embed"], "norm": proto["norm"]}
    if "lm_head" in proto:
        out["lm_head"] = proto["lm_head"]
    return out
