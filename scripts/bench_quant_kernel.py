"""A/B the single-pass Pallas activation-quantize kernel on the real chip.

Measures, at the headline operating point (bench.py 7B int8w8a):
  1. isolated quantize throughput: XLA two-pass (quantize_act) vs Pallas
     single-pass (quantize_rows) at the two prefill widths,
  2. whole-model base + merged prefill TTFT with act_quant=True (XLA) vs
     act_quant="kernel" — the number that decides whether the kernel ships
     as the bench default (CLAUDE.md: per-op Pallas custom-calls don't
     cross-op pipeline; a kernel that wins in isolation can lose
     whole-model, so the whole-model A/B is the verdict).

Usage: python scripts/bench_quant_kernel.py [--tiny]
Writes BENCH_QUANT_KERNEL.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np


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

    from bench import build_case, time_fn
    from sttm_tpu.models.quant import quantize_act
    from sttm_tpu.ops.kernels import quantize_rows
    from sttm_tpu.runtime.generate import build_prefill

    results = {}

    # -- 1. isolated quantize: slope-timed scan chains --------------------
    S = 256 if args.tiny else args.seq
    widths = (64, 128) if args.tiny else (3584, 18944)
    key = jax.random.key(0)

    def slope(build, lo=4, hi=20, n=3):
        f_lo, f_hi = build(lo), build(hi)
        x = f_lo.__x__

        def timed(f):
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                out = f(x)
                np.asarray(out[:1, :8])
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        return (timed(f_hi) - timed(f_lo)) / (hi - lo)

    force = "xla" if args.tiny else None  # interpret-mode scan is too slow
    for k_dim in widths:
        x0 = jax.random.normal(key, (S, k_dim), jnp.bfloat16)
        for name, qfn in (
            ("xla", quantize_act),
            ("kernel", lambda v: quantize_rows(v, force=force)),
        ):
            def body(x, _):
                q, s = qfn(x)
                return x * (1.0 + 1e-20 * q[0, 0].astype(jnp.bfloat16)
                            * s[0, 0].astype(jnp.bfloat16)), None

            def build(iters):
                f = jax.jit(
                    lambda x: jax.lax.scan(body, x, None, length=iters)[0]
                )
                f.__x__ = x0
                return f

            sec = slope(build)
            gbps = (S * k_dim * 3.0) / sec / 1e9  # bf16 read + int8 write
            results[f"quantize_{k_dim}_{name}"] = {
                "ms": round(sec * 1e3, 3), "eff_gb_s": round(gbps, 1)}
            print(f"quantize K={k_dim} [{name}]: {sec * 1e3:.3f} ms "
                  f"({gbps:.0f} GB/s eff)", flush=True)

    # -- 2. whole-model prefill A/B ----------------------------------------
    cfg, spec, params, embeds, valid, vstart, s_full, impl = build_case(
        args.tiny, 128, args.layers, 32768, "none" if args.tiny else "int8w8a"
    )
    vl, vs = jnp.int32(valid), jnp.int32(vstart)
    for mode, aq in (("xla", True), ("kernel", "kernel")):
        if args.tiny and mode == "kernel":
            continue  # interpret-mode whole-model is pathological on CPU
        c = dataclasses.replace(cfg, act_quant=aq) if not args.tiny else cfg
        entry = {}
        for tag, sp in (("merged", spec), ("base", None)):
            prefill = build_prefill(c, sp, s_full, impl)
            lg, cache = prefill(params, embeds, vl, vs)
            np.asarray(lg[:1, :8])
            del lg, cache

            def run():
                lg, _cache = prefill(params, embeds, vl, vs)
                return lg[:1, :8]  # time_fn fetches this (cache freed)

            entry[f"{tag}_s"] = time_fn(run)
            print(f"{mode} {tag} prefill: {entry[f'{tag}_s']*1e3:.1f} ms",
                  flush=True)
        results[f"prefill_{mode}"] = entry

    if "prefill_kernel" in results and "prefill_xla" in results:
        results["kernel_speedup_merged"] = (
            results["prefill_xla"]["merged_s"]
            / results["prefill_kernel"]["merged_s"]
        )
        results["kernel_speedup_base"] = (
            results["prefill_xla"]["base_s"]
            / results["prefill_kernel"]["base_s"]
        )

    out = "BENCH_QUANT_KERNEL_TINY.json" if args.tiny else "BENCH_QUANT_KERNEL.json"
    with open(out, "w") as fp:
        json.dump(results, fp, indent=2)
    print(json.dumps(results, default=str)[:400], flush=True)


if __name__ == "__main__":
    main()
