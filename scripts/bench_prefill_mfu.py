"""Prefill MFU decomposition on the real chip (VERDICT r2 #4).

Whole-model base prefill measures 66.6% MFU against the *theoretical* v5e
peaks (394 int8 TOPS / 197 bf16 TFLOPs). This script separates that gap
into its parts so the roofline is auditable and the remaining headroom is
known rather than guessed:

  1. per-GEMM achievable peak at the exact prefill shapes (qkv / o /
     gate+up / down, fused and unfused, w8a8 and bf16),
  2. the dynamic activation-quantize pass cost (the price of w8a8 that the
     theoretical roofline ignores),
  3. whole-model prefill with fused QKV + gate/up projections vs unfused.

Timing through the axon tunnel: each measurement jits a lax.scan over the
op with a data dependency between iterations, runs it at two iteration
counts, and reports the SLOPE — cancelling the ~27 ms dispatch RTT and the
small host fetch (CLAUDE.md: block_until_ready does not synchronize).

Usage: python scripts/bench_prefill_mfu.py [--tiny]
Writes BENCH_PREFILL_MFU.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


def _timed(fn, args, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[:1, :8])  # device->host sync (tunnel)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def slope_time(build_scan, lo=4, hi=20, n=3):
    """Per-iteration seconds via two-point slope (cancels dispatch RTT).

    build_scan(iters) returns a jitted fn with .__wrapped_args__ — the
    operands are ARGUMENTS, never closures: a closed-over bf16 weight is
    baked into the program as a constant and the remote-compile request
    then exceeds the tunnel's body limit (HTTP 413 at gate/down shapes).
    """
    f_lo, f_hi = build_scan(lo), build_scan(hi)
    args = f_lo.__wrapped_args__
    t_lo = _timed(f_lo, args, n)
    t_hi = _timed(f_hi, args, n)
    return (t_hi - t_lo) / (hi - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--seq", type=int, default=25600)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from bench import _enable_compile_cache

        _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from sttm_tpu.models.quant import matmul_w8a8, quantize_tensor

    S = 256 if args.tiny else args.seq
    D, I, HQ, HKV, HD = (64, 128, 4, 2, 16) if args.tiny else (
        3584, 18944, 28, 4, 128)
    results = {"config": {"seq": S, "hidden": D, "inter": I}}

    key = jax.random.key(0)

    def gemm_case(name, K, N, quant):
        """Per-iter time of [S,K]@[K,N]; data-dep chain via a free scalar."""
        kw, kx = jax.random.split(jax.random.fold_in(key, hash(name) % 2**31))
        w = jax.random.normal(kw, (K, N), jnp.bfloat16) * (K ** -0.5)
        wq = quantize_tensor(w) if quant else w
        x0 = jax.random.normal(kx, (S, K), jnp.bfloat16)

        def body_w(w):
            def body(x, _):
                if quant:
                    y = matmul_w8a8(x, w)
                else:
                    y = jnp.matmul(x, w, preferred_element_type=jnp.float32
                                   ).astype(jnp.bfloat16)
                # scalar fold-back: keeps the chain w/o an extra HBM pass
                return x * (1.0 + 1e-20 * y[0, 0].astype(jnp.bfloat16)), None

            return body

        def build(iters):
            f = jax.jit(
                lambda x, w: jax.lax.scan(body_w(w), x, None, length=iters)[0]
            )
            f.__wrapped_args__ = (x0, wq)
            return f

        sec = slope_time(build)
        flops = 2.0 * S * K * N
        peak = 394e12 if quant else 197e12
        tops = flops / sec / 1e12
        entry = {"K": K, "N": N, "quant": bool(quant),
                 "ms": round(sec * 1e3, 3), "tflops": round(tops, 1),
                 "pct_peak": round(100.0 * flops / sec / peak, 1)}
        results.setdefault("gemms", {})[name] = entry
        print(f"{name}: {entry['ms']} ms, {entry['tflops']} TF "
              f"({entry['pct_peak']}% of {'int8' if quant else 'bf16'} peak)",
              flush=True)

    qkv_n = (HQ + 2 * HKV) * HD
    for quant in (True, False) if not args.tiny else (False,):
        tag = "w8a8" if quant else "bf16"
        gemm_case(f"qkv_fused_{tag}", D, qkv_n, quant)
        gemm_case(f"q_only_{tag}", D, HQ * HD, quant)
        gemm_case(f"o_{tag}", HQ * HD, D, quant)
        gemm_case(f"gate_{tag}", D, I, quant)
        gemm_case(f"gateup_fused_{tag}", D, 2 * I, quant)
        gemm_case(f"down_{tag}", I, D, quant)

    # --- activation-quantize pass cost (the w8a8 tax the theoretical
    # roofline ignores): per-token amax -> scale -> round/clip -> int8 ---
    def quant_case(name, K):
        x0 = jax.random.normal(jax.random.fold_in(key, 7), (S, K), jnp.bfloat16)

        def body(x, _):
            xf = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            xs = jnp.maximum(amax, 1e-8) / 127.0
            xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
            return x * (1.0 + 1e-20 * xq[0, 0].astype(jnp.bfloat16)), None

        def build(iters):
            f = jax.jit(lambda x: jax.lax.scan(body, x, None, length=iters)[0])
            f.__wrapped_args__ = (x0,)
            return f

        sec = slope_time(build)
        gbps = (S * K * 3.0) / sec / 1e9  # read bf16 + write int8
        results.setdefault("quantize_pass", {})[name] = {
            "K": K, "ms": round(sec * 1e3, 3), "eff_gb_s": round(gbps, 1)}
        print(f"quantize {name}: {sec * 1e3:.3f} ms ({gbps:.0f} GB/s eff)",
              flush=True)

    quant_case("d_model", D)
    quant_case("inter", I)

    out = "BENCH_PREFILL_MFU_TINY.json" if args.tiny else "BENCH_PREFILL_MFU.json"
    with open(out, "w") as fp:
        json.dump(results, fp, indent=2)
    print(json.dumps({"wrote": out}), flush=True)


if __name__ == "__main__":
    main()
