"""Weight-only int8 quantization (per-output-channel, symmetric).

Purpose: HBM capacity. Full 7B bf16 (13.3 GB) + 25k-token prefill transients
exceed one v5e chip; int8 weights (≈6.7 GB) fit with room to spare, so the
FULL 28-layer model runs single-chip. Matmul math stays bf16 (dequantize at
use; prefill is compute-bound so the dequant cost is noise).

Quantized tensors are {"q": int8 [..., out], "s": f32 [out]} dicts in the
params pytree; the decoder's matmul helper dequantizes transparently
(models/qwen2.py _mat).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["quantize_tensor", "dequantize", "quantize_params", "is_quantized", "matmul_w8a8"]

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


def matmul_w8a8(x: jnp.ndarray, w: dict) -> jnp.ndarray:
    """int8 x int8 matmul on the int8 MXU path (2x bf16 peak on v5e:
    394 TOPS vs 197 TFLOPs; measured ~1.5x end-to-end on [25.6k, 3584] x
    [3584, 18944]). Per-token symmetric activation quantization fused into
    the op; weights carry per-output-channel scales from quantize_tensor."""
    q, s = w["q"], w["s"]  # [in, out] int8, [1, out] f32
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, q, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * xs * s.reshape(s.shape[-1])
    return out.astype(x.dtype)


def quantize_params(params: dict, host: bool = True) -> dict:
    """Quantize the layer projection matrices of a qwen2 params pytree.

    host=True quantizes layer-by-layer in numpy: quantizing the full stacked
    tensor on-device materializes an fp32 copy of all weights (>HBM for 7B).
    """
    import numpy as np

    out = dict(params)
    layers = dict(params["layers"])
    for k in _QUANT_KEYS:
        if k not in layers or is_quantized(layers[k]):
            continue
        if not host:
            layers[k] = quantize_tensor(layers[k])
            continue
        w = np.asarray(layers[k], np.float32)
        qs, ss = [], []
        for li in range(w.shape[0]):
            amax = np.abs(w[li]).max(axis=-2, keepdims=True)
            scale = np.maximum(amax / 127.0, 1e-12)
            qs.append(np.clip(np.round(w[li] / scale), -127, 127).astype(np.int8))
            ss.append(scale.astype(np.float32))
        layers[k] = {"q": jnp.asarray(np.stack(qs)), "s": jnp.asarray(np.stack(ss))}
    out["layers"] = layers
    return out


def random_quantized_init(cfg, key) -> dict:
    """Random params with projections born int8 (benchmarking: avoids ever
    materializing full-precision weights on device)."""
    import numpy as np

    from . import qwen2

    small = __import__("dataclasses").replace(cfg, num_layers=1)
    proto = qwen2.init_params(small, key)  # one layer on device (tiny)
    rng = np.random.default_rng(0)
    l = cfg.num_layers
    layers = {}
    for k, v in proto["layers"].items():
        shape = (l,) + v.shape[1:]
        if k in _QUANT_KEYS:
            layers[k] = {
                "q": jnp.asarray(rng.integers(-127, 128, size=shape, dtype=np.int8)),
                "s": jnp.full((l,) + (1,) * (len(shape) - 2) + (shape[-1],),
                              v.shape[-2] ** -0.5 / 64.0, jnp.float32),
            }
        else:
            layers[k] = jnp.zeros(shape, v.dtype) if k.startswith("b") else jnp.ones(shape, v.dtype)
    out = {"layers": layers, "embed": proto["embed"], "norm": proto["norm"]}
    if "lm_head" in proto:
        out["lm_head"] = proto["lm_head"]
    return out
