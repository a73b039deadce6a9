"""Custom Pallas TPU kernels for the merge hot path.

``cosine_rows``: blocked row-wise cosine similarity (the north-star's
"blocked cosine-similarity" kernel): bf16 inputs stream HBM->VMEM once per
row block, products/norms accumulate in fp32 on the VPU, and only the [N]
similarity vector is written back — no [N, C] fp32 intermediates. Used by the
quadtree split decision and temporal pairing (ops/quadtree.py) where XLA
would otherwise materialize upcast temporaries.

Falls back to plain jnp off-TPU (tests run the kernel in interpreter mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["cosine_rows", "quantize_rows"]

_BLOCK_ROWS = 256


def _cos_kernel(a_ref, b_ref, o_ref):
    a = a_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    num = (a * b).sum(axis=-1, keepdims=True)
    na = (a * a).sum(axis=-1, keepdims=True)
    nb = (b * b).sum(axis=-1, keepdims=True)
    den = jnp.sqrt(na) * jnp.sqrt(nb)
    o_ref[:] = num / jnp.maximum(den, 1e-8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cosine_rows_pallas(a, b, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = a.shape
    nb = -(-n // _BLOCK_ROWS)
    pad = nb * _BLOCK_ROWS - n
    if pad:
        a = jnp.pad(a, ((0, pad), (0, 0)))
        b = jnp.pad(b, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        _cos_kernel,
        out_shape=jax.ShapeDtypeStruct((nb * _BLOCK_ROWS, 1), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, b)
    return out[:n, 0]


def cosine_rows(a: jnp.ndarray, b: jnp.ndarray, force: str | None = None) -> jnp.ndarray:
    """Row-wise cosine similarity. a, b: [..., C] -> [...] fp32.

    force: None (auto: Pallas on TPU), "pallas", "interpret", or "jnp".
    """
    shape = a.shape[:-1]
    c = a.shape[-1]
    a2 = a.reshape(-1, c)
    b2 = b.reshape(-1, c)
    mode = force
    if mode is None:
        mode = "pallas" if jax.default_backend() == "tpu" and c % 128 == 0 else "jnp"
    if mode in ("pallas", "interpret"):
        out = _cosine_rows_pallas(a2, b2, interpret=(mode == "interpret"))
    else:
        af = a2.astype(jnp.float32)
        bf = b2.astype(jnp.float32)
        num = (af * bf).sum(-1)
        den = jnp.linalg.norm(af, axis=-1) * jnp.linalg.norm(bf, axis=-1)
        out = num / jnp.maximum(den, 1e-8)
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# Fused int4 GEMV (decode weight streaming at the int4 floor)
# ---------------------------------------------------------------------------


def gemv_w4(
    x: jnp.ndarray,
    q4: jnp.ndarray,
    scale: jnp.ndarray,
    block_n: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """y = x @ dequant(q4) * scale with the nibble UNPACK FUSED in VMEM.

    x: [M, K] (M small — decode rows); q4: [K/2, N] int8, low nibble = input
    row k, high nibble = row k + K/2 (models/quant.py packing, so no
    interleave is needed: y = x_lo @ lo + x_hi @ hi); scale: [..., N] f32
    per-output-channel. Returns [M, N] f32.

    Rationale: XLA materializes the unpacked weights in HBM (measured 4x
    slower than int8 for a lone GEMV), defeating the point of int4 — the
    kernel streams the PACKED bytes HBM->VMEM once and unpacks on the VPU.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    m, k = x.shape
    k2, n = q4.shape
    assert k == 2 * k2, (x.shape, q4.shape)
    for cand in (min(block_n, n), 512, 256, 128):
        if n % cand == 0:
            bn = cand
            break
    else:
        raise ValueError(f"output dim {n} not a multiple of 128")
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if k2 % cand == 0:
            bk = cand
            break
    else:
        raise ValueError(f"packed input dim {k2} not a multiple of 8")
    nk = k2 // bk
    s2 = scale.reshape(1, n)

    def kern(x_ref, w_ref, s_ref, o_ref, acc_ref):
        ki = pl.program_id(1)

        @pl.when(ki == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        # Mosaic cannot legalize int8 vector shifts; unpack via bf16
        # arithmetic (int8 values are exact in bf16): hi = floor(w/16),
        # lo = remainder with sign fix-up. All VMEM/VPU-local, K-blocked so
        # the unpacked intermediates stay small.
        # f32 ALU (v5e has no bf16 ALU instructions); K-blocking keeps the
        # f32 intermediates small
        wp = w_ref[...].astype(jnp.float32)  # [bk, bn]
        hi32 = jnp.floor(wp * 0.0625)
        lo_u = wp - hi32 * 16.0  # [0, 16), exact
        # sign fix-up without a comparison: floor(lo_u/8) == (lo_u >= 8)
        lo = (lo_u - 16.0 * jnp.floor(lo_u * 0.125)).astype(jnp.bfloat16)
        hi = hi32.astype(jnp.bfloat16)
        xl = x_ref[:, pl.ds(ki * bk, bk)].astype(jnp.bfloat16)
        xh = x_ref[:, pl.ds(k2 + ki * bk, bk)].astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            xl, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        part = part + jax.lax.dot_general(
            xh, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc_ref[...] = acc_ref[...] + part

        @pl.when(ki == nk - 1)
        def _():
            o_ref[...] = acc_ref[...] * s_ref[...]

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=(n // bn, nk),
        in_specs=[
            pl.BlockSpec((m, k), lambda i, ki: (0, 0)),
            pl.BlockSpec((bk, bn), lambda i, ki: (ki, i)),
            pl.BlockSpec((1, bn), lambda i, ki: (0, i)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, ki: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((m, bn), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, q4, s2)


# ---------------------------------------------------------------------------
# Dynamic per-token int8 activation quantization (the w8a8 prefill tax).
#
# XLA lowers quantize_act (models/quant.py) as two passes over x — an amax
# row-reduction, then scale/round/clip — measured 266-330 GB/s effective
# (BENCH_PREFILL_MFU.json quantize_pass) against the v5e's ~819 GB/s HBM.
# This kernel streams each row block HBM->VMEM ONCE, reduces and quantizes
# in VMEM (f32 math — Mosaic has no bf16 ALU ops, CLAUDE.md), and writes
# only int8 + per-row scales back: 3 bytes/element of traffic instead of 5.
#
# MEASURED RESULT (BENCH_QUANT_KERNEL.json, v5e): the kernel LOSES — both
# isolated (329 vs 617 GB/s eff at K=3584; XLA's lowering inside a fused
# graph beats the 5-byte model this kernel assumed) and whole-model
# (merged prefill 1089.6 vs 1072.7 ms). Kept as an opt-in
# (act_quant="kernel") with the negative measurement on record — the same
# pattern as the int4 GEMV finding (CLAUDE.md: per-op Pallas custom-calls
# don't cross-op pipeline; XLA stays the default where it wins).
# Same f32 ops and 1e-8/127 clamps as quantize_act; scales are bitwise
# equal, codes can differ by 1 at exact rounding boundaries (separate
# programs reassociate x/s differently).
# ---------------------------------------------------------------------------


def _quant_kernel(x_ref, q_ref, s_ref):
    x = x_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    # one reciprocal per ROW, then a per-element multiply: VPU divides are
    # many-cycle, and these kernels are VPU-bound, not bandwidth-bound
    q_ref[:] = jnp.clip(jnp.round(x * (1.0 / s)), -127, 127).astype(jnp.int8)
    s_ref[:] = s


@functools.partial(jax.jit, static_argnames=("bs", "interpret"))
def _quantize_rows_pallas(x, bs, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k = x.shape
    return pl.pallas_call(
        _quant_kernel,
        grid=(n // bs,),
        in_specs=[
            pl.BlockSpec((bs, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((bs, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.int8),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x)


def _quant_block_rows(n: int, k: int) -> int | None:
    """Largest row block that tiles int8 outputs (32-multiples), divides n,
    and keeps the block's f32 temporaries well inside one core's ~16 MB
    VMEM (wide K=18944 blocks at 128 rows would not)."""
    cap = 32 if k > 8192 else 128
    for bs in (cap, 64, 32):
        if bs <= cap and n % bs == 0:
            return bs
    return None


def _rmsq_kernel(x_ref, g_ref, q_ref, s_ref, *, eps, offset):
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    if offset:
        g = g + 1.0
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    h = x * jax.lax.rsqrt(var + eps) * g
    amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q_ref[:] = jnp.clip(jnp.round(h * (1.0 / s)), -127, 127).astype(jnp.int8)
    s_ref[:] = s


@functools.partial(jax.jit, static_argnames=("bs", "eps", "offset", "interpret"))
def _rmsnorm_quantize_pallas(x, g, bs, eps, offset, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k = x.shape
    return pl.pallas_call(
        functools.partial(_rmsq_kernel, eps=eps, offset=offset),
        grid=(n // bs,),
        in_specs=[
            pl.BlockSpec((bs, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bs, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.int8),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, g.reshape(1, k))


def rmsnorm_quantize_rows(x: jnp.ndarray, weight: jnp.ndarray, eps: float,
                          offset: bool = False, force: str | None = None):
    """Fused RMSNorm + per-row int8 quantization in ONE HBM pass:
    [..., K] -> (int8 [..., K], f32 scales [..., 1]).

    The w8a8 prefill's pre-GEMM pipeline is rms_norm (read x, write bf16
    h) followed by quantize (read h, write int8 + scales) — two full HBM
    round trips over the activations, measured at only 266-330 GB/s
    effective for the quantize leg (BENCH_PREFILL_MFU.json quantize_pass).
    Fusing them reads x once and writes int8 once (~2.4x less traffic for
    the K=3584 shape). Numerics: all math in f32 (Mosaic/v5e has no bf16
    ALU ops — CLAUDE.md); the two-op path rounds the normed activations to
    bf16 before the gamma multiply, so int8 codes can differ by 1 at exact
    rounding boundaries — the same bounded divergence class as
    quantize_rows vs quantize_act. Falls back to the exact two-op XLA math
    off-TPU / non-tiling shapes."""
    lead, k = x.shape[:-1], x.shape[-1]
    n = 1
    for d in lead:
        n *= d
    bs = _quant_block_rows(n, k)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    tiles = bs is not None and k % 128 == 0
    if force == "kernel" and not tiles:
        # a caller forcing the kernel (e.g. for bit-identity with another
        # kernel-quantized path) must not silently get the ±1-code XLA
        # numerics — reject, matching mha()'s explicit int8-KV impl reject
        raise ValueError(
            f"force='kernel' but shape (n={n}, k={k}) does not tile "
            "(need a 32-multiple row block dividing n and k % 128 == 0)")
    use_kernel = force == "kernel" or (force is None and on_tpu and tiles)
    if use_kernel and tiles:
        q, s = _rmsnorm_quantize_pallas(
            x.reshape(n, k), weight, bs, float(eps), bool(offset),
            interpret=not on_tpu,
        )
        return q.reshape(*lead, k), s.reshape(*lead, 1)
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    h = normed * (1.0 + weight.astype(jnp.float32)).astype(x.dtype) \
        if offset else normed * weight
    hf = h.astype(jnp.float32)
    amax = jnp.max(jnp.abs(hf), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(hf / s), -127, 127).astype(jnp.int8)
    return q, s


def _res_rmsq_kernel(x_ref, d_ref, g_ref, xo_ref, q_ref, s_ref, *, eps, offset):
    xs = x_ref[:].astype(jnp.float32) + d_ref[:].astype(jnp.float32)
    xo_ref[:] = xs.astype(xo_ref.dtype)
    # norm the ROUNDED sum (not the f32 one): bit-identical codes to the
    # unfused path (XLA bf16 add -> _rmsq_kernel), so swapping the fusion
    # in cannot shift tokens
    x = xo_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    if offset:
        g = g + 1.0
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    h = x * jax.lax.rsqrt(var + eps) * g
    amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q_ref[:] = jnp.clip(jnp.round(h * (1.0 / s)), -127, 127).astype(jnp.int8)
    s_ref[:] = s


@functools.partial(jax.jit, static_argnames=("bs", "eps", "offset", "interpret"))
def _res_rmsnorm_quantize_pallas(x, d, g, bs, eps, offset, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k = x.shape
    return pl.pallas_call(
        functools.partial(_res_rmsq_kernel, eps=eps, offset=offset),
        grid=(n // bs,),
        in_specs=[
            pl.BlockSpec((bs, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bs, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), x.dtype),
            jax.ShapeDtypeStruct((n, k), jnp.int8),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, d, g.reshape(1, k))


def residual_rmsnorm_quantize_rows(x: jnp.ndarray, delta: jnp.ndarray,
                                   weight: jnp.ndarray, eps: float,
                                   offset: bool = False,
                                   force: str | None = None):
    """Residual add + fused RMSNorm + per-row int8 quantization in ONE HBM
    pass: (x, delta) [..., K] -> (x+delta [..., K], int8 [..., K],
    f32 scales [..., 1]).

    MEASURED NEUTRAL whole-model and therefore NOT wired into the fused
    prefill path (models/qwen2.py keeps the two-op XLA form): the o-proj
    residual add looked like a slow standalone pass (~216 GB/s,
    PROFILE_PREFILL.json fusion.375), but that fusion also absorbs the
    o-GEMM's s32->bf16 dequant for free; feeding this custom call instead
    forces the dequant to materialize separately (a Pallas call cannot
    consume its producer in place — the same mechanism as the int4-GEMV
    finding, CLAUDE.md), cancelling the saved pass (merged prefill leg
    0.958 -> 0.967 s). Kept because it is bit-identical and useful where
    the delta is NOT an int-GEMM output. Numerics: the kernel norms the
    bf16-ROUNDED sum, so codes/scales are bit-identical to the two-op path
    (tests/test_kernels.py)."""
    lead, k = x.shape[:-1], x.shape[-1]
    n = 1
    for d in lead:
        n *= d
    bs = _quant_block_rows(n, k)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    tiles = bs is not None and k % 128 == 0
    if force == "kernel" and not tiles:
        raise ValueError(
            f"force='kernel' but shape (n={n}, k={k}) does not tile "
            "(need a 32-multiple row block dividing n and k % 128 == 0)")
    use_kernel = force == "kernel" or (force is None and on_tpu and tiles)
    if use_kernel and tiles:
        xo, q, s = _res_rmsnorm_quantize_pallas(
            x.reshape(n, k), delta.reshape(n, k).astype(x.dtype), weight,
            bs, float(eps), bool(offset), interpret=not on_tpu,
        )
        return (xo.reshape(*lead, k), q.reshape(*lead, k),
                s.reshape(*lead, 1))
    xo = (x.astype(jnp.float32) + delta.astype(jnp.float32)).astype(x.dtype)
    q, s = rmsnorm_quantize_rows(xo, weight, eps, offset, force=force)
    return xo, q, s


def _swigluq_kernel(g_ref, u_ref, q_ref, s_ref, *, act):
    g = g_ref[:].astype(jnp.float32)
    u = u_ref[:].astype(jnp.float32)
    if act == "silu":
        h = g * jax.lax.logistic(g) * u
    elif act == "gelu_tanh":
        h = 0.5 * g * (1.0 + jnp.tanh(
            0.7978845608028654 * (g + 0.044715 * g * g * g))) * u
    else:
        raise ValueError(act)
    amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q_ref[:] = jnp.clip(jnp.round(h * (1.0 / s)), -127, 127).astype(jnp.int8)
    s_ref[:] = s


@functools.partial(jax.jit, static_argnames=("bs", "act", "interpret"))
def _swiglu_quantize_pallas(gate, up, bs, act, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k = gate.shape
    return pl.pallas_call(
        functools.partial(_swigluq_kernel, act=act),
        grid=(n // bs,),
        in_specs=[
            pl.BlockSpec((bs, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bs, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.int8),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(gate, up)


def swiglu_quantize_rows(gate: jnp.ndarray, up: jnp.ndarray,
                         act: str = "silu", force: str | None = None):
    """Fused act(gate) * up + per-row int8 quantization in ONE pass:
    (gate [..., F], up [..., F]) -> (int8 [..., F], f32 scales [..., 1]).

    Producer fusion for the w8a8 down_proj: the two-op path writes the
    bf16 SwiGLU product ([M, 18944] = 485 MB at the merged headline
    point) to HBM and re-reads it to quantize; this kernel consumes the
    gate/up GEMM outputs once and emits int8 directly (~1.2 GB less HBM
    traffic per layer at M=12800). Math in f32 (no bf16 ALU on v5e
    Mosaic); same bounded ±1-code divergence vs the two-op path as
    rmsnorm_quantize_rows. Falls back to exact two-op XLA math off-TPU /
    non-tiling shapes. ``act``: silu | gelu_tanh (models/qwen2.py
    mlp_act coverage)."""
    lead, k = gate.shape[:-1], gate.shape[-1]
    n = 1
    for d in lead:
        n *= d
    bs = _quant_block_rows(n, k)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    tiles = bs is not None and k % 128 == 0
    if force == "kernel" and not tiles:
        raise ValueError(
            f"force='kernel' but shape (n={n}, k={k}) does not tile "
            "(need a 32-multiple row block dividing n and k % 128 == 0)")
    use_kernel = force == "kernel" or (force is None and on_tpu and tiles)
    if use_kernel and tiles:
        q, s = _swiglu_quantize_pallas(
            gate.reshape(n, k), up.reshape(n, k), bs, act,
            interpret=not on_tpu,
        )
        return q.reshape(*lead, k), s.reshape(*lead, 1)
    gf = gate.astype(jnp.float32)
    if act == "silu":
        a = jax.nn.silu(gf)
    elif act == "gelu_tanh":
        a = jax.nn.gelu(gf, approximate=True)
    else:
        raise ValueError(act)
    h = (a.astype(gate.dtype) * up).astype(jnp.float32)
    amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(h / s), -127, 127).astype(jnp.int8)
    return q, s


def _rope_t_kernel(q_ref, c_ref, s_ref, o_ref, *, scale, hkv):
    x = q_ref[0].astype(jnp.float32)  # [bs, H, hd]
    c = c_ref[:][:, None, :]  # [bs, 1, hd]
    s = s_ref[:][:, None, :]
    hd = x.shape[-1]
    hd2 = hd // 2
    x1 = x[..., :hd2]
    x2 = x[..., hd2:]
    o1 = (x1 * c[..., :hd2] - x2 * s[..., :hd2]) * scale
    o2 = (x2 * c[..., hd2:] + x1 * s[..., hd2:]) * scale
    out = jnp.concatenate([o1, o2], axis=-1)  # [bs, H, hd]
    bs, h, _ = out.shape
    # [bs, H, hd] -> [Hkv, G, bs, hd]: lane dim (hd) untouched, so this is
    # a sublane-only rearrangement Mosaic handles in-register
    out = out.transpose(1, 0, 2).reshape(hkv, h // hkv, bs, hd)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hkv", "bs", "scale", "interpret"))
def _rope_transpose_pallas(q, cos, sin, hkv, bs, scale, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, sq, h, hd = q.shape
    g = h // hkv
    return pl.pallas_call(
        functools.partial(_rope_t_kernel, scale=scale, hkv=hkv),
        grid=(b, sq // bs),
        in_specs=[
            pl.BlockSpec((1, bs, h, hd), lambda ib, i: (ib, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, hd), lambda ib, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, hd), lambda ib, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hkv, g, bs, hd), lambda ib, i: (ib, 0, 0, i, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, sq, hd), q.dtype),
        interpret=interpret,
    )(q, cos, sin)


def _rope_qkt_kernel(q_ref, k_ref, c_ref, s_ref, oq_ref, ok_ref, *,
                     scale, hkv):
    c = c_ref[:][:, None, :]  # [bs, 1, hd]
    s = s_ref[:][:, None, :]

    def rot(x, sc):
        hd2 = x.shape[-1] // 2
        x1 = x[..., :hd2]
        x2 = x[..., hd2:]
        o1 = (x1 * c[..., :hd2] - x2 * s[..., :hd2]) * sc
        o2 = (x2 * c[..., hd2:] + x1 * s[..., hd2:]) * sc
        return jnp.concatenate([o1, o2], axis=-1)

    xq = rot(q_ref[0].astype(jnp.float32), scale)  # [bs, H, hd]
    bs, h, hd = xq.shape
    oq_ref[0] = xq.transpose(1, 0, 2).reshape(
        hkv, h // hkv, bs, hd).astype(oq_ref.dtype)
    ok_ref[0] = rot(k_ref[0].astype(jnp.float32), 1.0).astype(ok_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("hkv", "bs", "scale", "interpret"))
def _rope_qk_transpose_pallas(q, k, cos, sin, hkv, bs, scale,
                              interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, sq, h, hd = q.shape
    kvh = k.shape[2]
    g = h // hkv
    return pl.pallas_call(
        functools.partial(_rope_qkt_kernel, scale=scale, hkv=hkv),
        grid=(b, sq // bs),
        in_specs=[
            pl.BlockSpec((1, bs, h, hd), lambda ib, i: (ib, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, kvh, hd), lambda ib, i: (ib, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, hd), lambda ib, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, hd), lambda ib, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, hkv, g, bs, hd), lambda ib, i: (ib, 0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, kvh, hd), lambda ib, i: (ib, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, g, sq, hd), q.dtype),
            jax.ShapeDtypeStruct((b, sq, kvh, hd), k.dtype),
        ],
        interpret=interpret,
    )(q, k, cos, sin)


def rope_qk_scale_transpose(q: jnp.ndarray, k: jnp.ndarray,
                            cos: jnp.ndarray, sin: jnp.ndarray,
                            hkv: int, scale: float = 1.0,
                            force: str | None = None):
    """Fused RoPE over Q AND K + q's sm_scale + GQA transpose in ONE pass:
    (q [B, S, H, hd], k [B, S, KV, hd]) -> (q' [B, Hkv, G, S, hd],
    k_roped [B, S, KV, hd]).

    Extends rope_scale_transpose to also rope K in the same kernel: the
    stock XLA apply_rope on K materializes f32 intermediates and per-layer
    async copies of the rope tables whose DMA traffic overlaps the splash
    kernel's HBM streaming (PROFILE_PREFILL.json: the f32[S, hd/2] K-rope
    copy-starts and 16 rope-table slice-starts per layer pair). Here the
    tables are read once per block and K writes bf16 directly. Same
    rotate-half f32 math as apply_rope; exact fallback off-TPU /
    non-tiling shapes. Unlike the quantize kernels, force="kernel" on a
    non-tiling shape falls back WITHOUT raising: the rope fallback is the
    identical f32 math (tested equal), so there is no numerics contract
    to protect — the raise convention only guards divergent fallbacks."""
    b, sq, h, hd = q.shape
    on_tpu = jax.default_backend() in ("tpu", "axon")
    bs = None
    for cand in (256, 128, 64, 32, 16, 8):
        if sq % cand == 0:
            bs = cand
            break
    use_kernel = force == "kernel" or (
        force is None and on_tpu and cos.ndim == 2 and bs is not None
        and hd % 128 == 0 and h % hkv == 0
    )
    if use_kernel and bs is not None:
        return _rope_qk_transpose_pallas(
            q, k, cos.astype(jnp.float32), sin.astype(jnp.float32),
            hkv, bs, float(scale), interpret=not on_tpu)
    # exact fallback: apply_rope convention on both, then q's transpose
    def rot(x4):
        x = x4.astype(jnp.float32)
        x1, x2 = jnp.split(x, 2, axis=-1)
        r = jnp.concatenate([-x2, x1], axis=-1)
        return x * cos[None, :, None, :] + r * sin[None, :, None, :]

    qf = (rot(q) * scale).astype(q.dtype)
    g = h // hkv
    qf = qf.reshape(b, sq, hkv, g, hd).transpose(0, 2, 3, 1, 4)
    kf = rot(k).astype(k.dtype)
    return qf, kf


def rope_scale_transpose(q: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
                         hkv: int, scale: float = 1.0,
                         force: str | None = None) -> jnp.ndarray:
    """Fused RoPE + sm_scale + GQA transpose for the splash prefill input:
    q [B, S, H, hd] -> [B, Hkv, G, S, hd] (the splash MQA kernel layout).

    The unfused chain (apply_rope f32 intermediates -> bf16 write ->
    layout copy -> scale+transpose fusion) moves ~500 MB per layer at the
    merged headline point (profiled: fusion.373/copy.594/fusion.374 ~2 ms
    per layer, PROFILE_PREFILL.json); this kernel reads q once and writes
    the transposed roped block once (~180 MB). Math in f32; rotation
    follows models/qwen2.py apply_rope (rotate-half convention). Falls
    back to the exact unfused ops off-TPU / non-tiling shapes; cos/sin
    must be [S, hd] (prefill tables — batched per-row decode tables use
    the XLA path)."""
    b, sq, h, hd = q.shape
    on_tpu = jax.default_backend() in ("tpu", "axon")
    bs = None
    for cand in (256, 128, 64, 32, 16, 8):  # 256 keeps f32 temps < ~8 MB VMEM
        if sq % cand == 0:
            bs = cand
            break
    use_kernel = force == "kernel" or (
        force is None and on_tpu and cos.ndim == 2 and bs is not None
        and hd % 128 == 0 and h % hkv == 0
    )
    if use_kernel and bs is not None:
        return _rope_transpose_pallas(
            q, cos.astype(jnp.float32), sin.astype(jnp.float32),
            hkv, bs, float(scale), interpret=not on_tpu)
    # exact fallback: apply_rope convention (models/qwen2.py)
    x = q.astype(jnp.float32)
    x1, x2 = jnp.split(x, 2, axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = ((x * c + rot * s) * scale).astype(q.dtype)
    g = h // hkv
    return out.reshape(b, sq, hkv, g, hd).transpose(0, 2, 3, 1, 4)


def quantize_rows(x: jnp.ndarray, force: str | None = None):
    """Per-row symmetric int8 quantization: [..., K] -> (int8 [..., K],
    f32 scales [..., 1]). Pallas on TPU when the shape tiles (rows % 32 == 0,
    K % 128 == 0); jnp fallback elsewhere — identical f32 math either way.
    ``force``: "kernel" | "xla" | None (auto)."""
    lead, k = x.shape[:-1], x.shape[-1]
    n = 1
    for d in lead:
        n *= d
    bs = _quant_block_rows(n, k)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    use_kernel = force == "kernel" or (
        force is None and on_tpu and bs is not None and k % 128 == 0
    )
    if use_kernel and bs is not None and k % 128 == 0:
        q, s = _quantize_rows_pallas(
            x.reshape(n, k), bs, interpret=not on_tpu
        )
        return q.reshape(*lead, k), s.reshape(*lead, 1)
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s
