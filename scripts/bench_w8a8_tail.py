"""A/B the w8a8 prefill GEMM tail on the real chip (VERDICT r3 directive #2).

BENCH_PREFILL_MFU.json localizes the merged-prefill MFU gap (60% vs the
>=70% target): down_proj at 56.8% of the int8 peak, q/o at 61-69%, and
266-330 GB/s two-pass activation quantizes. This bench measures the
candidate fixes in isolation so only winners get wired into the model:

  1. down_proj [M, 18944] x [18944, 3584] variants: baseline w8a8
     (quantize fused in), pre-quantized input (isolates the quantize
     cost), K-split 2/4 (two/four contracted chunks accumulated in int32 —
     changes XLA's tiling choice for the skinny-N GEMM), bf16 reference.
  2. q/o-shaped [M, 3584] x [3584, 3584]: baseline vs prequant vs K-split.
  3. Activation-quantize producers: rms_norm + quantize_act (XLA two-op),
     rms_norm + quantize_rows (Pallas quant only), and the new FUSED
     rmsnorm_quantize_rows kernel (one HBM pass).
  4. Projection-group sharing at layer level: q+k+v as three w8a8 matmuls
     (per-matmul quantize, XLA may CSE) vs one shared quantize + three
     matmul_w8a8_pre vs the fused [K, 4608] wqkv GEMM; same for gate|up.

All timings slope-based over scan-chained iterations (RTT cancels,
CLAUDE.md). Writes BENCH_W8A8_TAIL.json (merge-updating, so partial runs
keep earlier legs). --tiny = CPU parity smoke (asserts variants match).

Usage: python scripts/bench_w8a8_tail.py [--tiny] [--m 12800]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

V5E_INT8_PEAK_TOPS = 394.0
V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--m", type=int, default=12800,
                    help="token count (12800 = merged headline length)")
    ap.add_argument("--sections", nargs="+",
                    default=["down", "qo", "quant", "group", "gu"])
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

    from chiputil import merge_json, retry_call

    from sttm_tpu.models.quant import (
        matmul_w8a8, matmul_w8a8_pre, quantize_act, quantize_tensor,
    )
    from sttm_tpu.ops.kernels import quantize_rows, rmsnorm_quantize_rows

    if args.tiny:
        m, d, f = 64, 256, 512
    else:
        m, d, f = args.m, 3584, 18944
    key = jax.random.key(0)
    ks = jax.random.split(key, 4)
    x_d = jax.random.normal(ks[0], (m, d), jnp.bfloat16)
    x_f = jax.random.normal(ks[1], (m, f), jnp.bfloat16)
    w_down = quantize_tensor(jax.random.normal(ks[2], (f, d), jnp.bfloat16) * 0.02)
    w_q = quantize_tensor(jax.random.normal(ks[3], (d, d), jnp.bfloat16) * 0.02)
    gamma = jax.random.normal(ks[2], (d,), jnp.bfloat16) * 0.1 + 1.0

    results = {"config": {"m": m, "d": d, "f": f}}

    def slope(build, x0, lo=2, hi=6, reps=5):
        f_lo, f_hi = build(lo), build(hi)

        def timed(fn):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = fn(x0)
                np.asarray(out.ravel()[:8])
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        timed(f_lo), timed(f_hi)  # warm compiles
        return (timed(f_hi) - timed(f_lo)) / (hi - lo)

    def chain(body):
        """Scan-chained variant timer. The carry is (x, acc): x passes
        through an optimization_barrier jointly with acc so XLA cannot
        hoist body(x) out of the loop (the barrier output is a fresh
        per-iteration value), and acc absorbs a FULL sum of every output
        so no column of the GEMM is dead-code-eliminated. (The first
        version fed back y[:, :1] — XLA sliced the whole GEMM down to one
        column: 'bf16 at 351% of peak'.) The sum adds one read pass over
        the output — identical across legs of an A/B, and small vs the
        GEMM (output is the small side for down/qo)."""

        def build(iters):
            def step(carry, _):
                x, acc = jax.lax.optimization_barrier(carry)
                y = body(x)
                ys = y if isinstance(y, tuple) else (y,)
                s = sum(jnp.sum(t.astype(jnp.float32)) for t in ys)
                return (x, acc + s), None

            def run(x):
                (_, acc), _ = jax.lax.scan(
                    step, (x, jnp.float32(0.0)), None, length=iters)
                return acc

            return jax.jit(run)

        return build

    def ksplit(xq, xs, w, parts):
        k = xq.shape[-1]
        kc = k // parts
        acc = None
        for p in range(parts):
            a = jax.lax.dot_general(
                xq[:, p * kc : (p + 1) * kc], w["q"][p * kc : (p + 1) * kc],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            acc = a if acc is None else acc + a
        return (acc.astype(jnp.float32) * xs
                * w["s"].reshape(-1)).astype(jnp.bfloat16)

    # parity (CPU + chip): variants must agree
    ref = np.asarray(matmul_w8a8(x_f, w_down), np.float32)
    xq_f, xs_f = quantize_act(x_f)
    for name, y in (
        ("prequant", matmul_w8a8_pre(xq_f, xs_f, w_down)),
        ("ksplit2", ksplit(xq_f, xs_f, w_down, 2)),
        ("ksplit4", ksplit(xq_f, xs_f, w_down, 4)),
    ):
        err = float(np.max(np.abs(np.asarray(y, np.float32) - ref))
                    / (np.max(np.abs(ref)) + 1e-9))
        results[f"relerr_down_{name}"] = round(err, 6)
        assert err < 1e-3, (name, err)
    qk, sk = rmsnorm_quantize_rows(x_d, gamma, 1e-6)
    from sttm_tpu.models.qwen2 import rms_norm

    q2, s2 = quantize_act(rms_norm(x_d, gamma, 1e-6))
    results["rmsq_code_mismatch_pct"] = round(
        100.0 * float(np.mean(np.asarray(qk) != np.asarray(q2))), 4)
    results["rmsq_scale_relerr"] = round(float(
        np.max(np.abs(np.asarray(sk) - np.asarray(s2))
               / (np.abs(np.asarray(s2)) + 1e-12))), 6)
    assert results["rmsq_code_mismatch_pct"] < 15.0
    assert results["rmsq_scale_relerr"] < 1e-2

    if args.tiny:
        with open("BENCH_W8A8_TAIL_TINY.json", "w") as fp:
            json.dump(results, fp, indent=2)
        print(json.dumps(results), flush=True)
        return

    flop_down = 2.0 * m * f * d
    flop_q = 2.0 * m * d * d

    def record(section, name, sec, flop, int8=True):
        peak = V5E_INT8_PEAK_TOPS if int8 else V5E_BF16_PEAK_TFLOPS
        ent = {"ms": round(sec * 1e3, 3),
               "tflops": round(flop / sec / 1e12, 1),
               "pct_peak": round(100 * flop / sec / 1e12 / peak, 1)}
        results.setdefault(section, {})[name] = ent
        print(f"{section}/{name}: {ent['ms']} ms ({ent['pct_peak']}% peak)",
              flush=True)
        merge_json("BENCH_W8A8_TAIL.json", {section: {name: ent}})

    if "down" in args.sections:
        # prequant legs time ONLY the GEMM: quantize once outside the chain
        xq0, xs0 = jax.jit(quantize_act)(x_f)
        legs = {
            "w8a8_baseline": (x_f, lambda x: matmul_w8a8(x, w_down)),
            "gemm_only_prequant": (xq0, lambda x: matmul_w8a8_pre(x, xs0, w_down)),
            "gemm_only_ksplit2": (xq0, lambda x: ksplit(x, xs0, w_down, 2)),
            "gemm_only_ksplit4": (xq0, lambda x: ksplit(x, xs0, w_down, 4)),
        }
        for name, (x0, body) in legs.items():
            st, sec = retry_call(lambda b=body, x=x0: slope(chain(b), x),
                                 label=f"down/{name}")
            if st == "ok":
                record("down", name, sec, flop_down)
            else:
                results.setdefault("down", {})[name] = sec
                merge_json("BENCH_W8A8_TAIL.json", {"down": {name: sec}})
        st, sec = retry_call(lambda: slope(chain(
            lambda x: jnp.matmul(x, (w_down["q"].astype(jnp.float32)
                                     * w_down["s"]).astype(jnp.bfloat16))),
            x_f), label="down/bf16")
        if st == "ok":
            record("down", "bf16", sec, flop_down, int8=False)

    if "qo" in args.sections:
        xq0, xs0 = jax.jit(quantize_act)(x_d)
        legs = {
            "w8a8_baseline": (x_d, lambda x: matmul_w8a8(x, w_q)),
            "gemm_only_prequant": (xq0, lambda x: matmul_w8a8_pre(x, xs0, w_q)),
            "gemm_only_ksplit2": (xq0, lambda x: ksplit(x, xs0, w_q, 2)),
        }
        for name, (x0, body) in legs.items():
            st, sec = retry_call(lambda b=body, x=x0: slope(chain(b), x),
                                 label=f"qo/{name}")
            if st == "ok":
                record("qo", name, sec, flop_q)

    if "quant" in args.sections:
        # bytes: read bf16 + write int8 + scales (one pass)
        passes = {
            "rms_then_quant_xla": lambda x: quantize_act(
                rms_norm(x, gamma, 1e-6))[0],
            "rms_then_quant_kernel": lambda x: quantize_rows(
                rms_norm(x, gamma, 1e-6), force="kernel")[0],
            "fused_rmsq_kernel": lambda x: rmsnorm_quantize_rows(
                x, gamma, 1e-6, force="kernel")[0],
        }
        nbytes = m * d * 3  # 2B read + 1B write
        for name, body in passes.items():
            # sub-ms legs: long chains (lo=4, hi=36 -> 32-iter delta) push
            # the measured delta far above tunnel-RTT noise
            st, sec = retry_call(
                lambda b=body: slope(chain(b), x_d, lo=4, hi=36, reps=7),
                label=f"quant/{name}")
            if st == "ok":
                ent = {"ms": round(sec * 1e3, 3),
                       "eff_gb_s": round(nbytes / sec / 1e9, 1)}
                results.setdefault("quant", {})[name] = ent
                merge_json("BENCH_W8A8_TAIL.json", {"quant": {name: ent}})
                print(f"quant/{name}: {ent['ms']} ms ({ent['eff_gb_s']} GB/s)",
                      flush=True)

    if "group" in args.sections:
        # q/k/v projection group: per-matmul quantize vs shared vs fused
        nq, nkv = 3584, 512
        wq = w_q
        wk = quantize_tensor(jax.random.normal(ks[0], (d, nkv), jnp.bfloat16) * 0.02)
        wv = quantize_tensor(jax.random.normal(ks[1], (d, nkv), jnp.bfloat16) * 0.02)
        wqkv = {"q": jnp.concatenate([wq["q"], wk["q"], wv["q"]], axis=1),
                "s": jnp.concatenate([wq["s"], wk["s"], wv["s"]], axis=1)}
        flop_qkv = 2.0 * m * d * (nq + 2 * nkv)

        def per_matmul(x):
            return (matmul_w8a8(x, wq), matmul_w8a8(x, wk), matmul_w8a8(x, wv))

        def shared(x):
            xq, xs = quantize_act(x)
            return (matmul_w8a8_pre(xq, xs, wq), matmul_w8a8_pre(xq, xs, wk),
                    matmul_w8a8_pre(xq, xs, wv))

        def fused(x):
            return matmul_w8a8(x, wqkv)

        # prequant legs: the int8 tensor IS the chain carry (a closed-over
        # constant input would be hoisted out of the scan), scales closed over
        xq_d0, xs_d0 = jax.jit(quantize_act)(x_d)

        def sep_pre(xq):
            return (matmul_w8a8_pre(xq, xs_d0, wq),
                    matmul_w8a8_pre(xq, xs_d0, wk),
                    matmul_w8a8_pre(xq, xs_d0, wv))

        def fused_pre(xq):
            return matmul_w8a8_pre(xq, xs_d0, wqkv)

        for name, body, x0 in (("qkv_per_matmul_quant", per_matmul, x_d),
                               ("qkv_shared_quant", shared, x_d),
                               ("qkv_fused", fused, x_d),
                               ("qkv_separate_prequant", sep_pre, xq_d0),
                               ("qkv_fused_prequant", fused_pre, xq_d0)):
            st, sec = retry_call(
                lambda b=body, xx=x0: slope(chain(b), xx, lo=2, hi=10, reps=5),
                label=f"group/{name}")
            if st == "ok":
                record("group", name, sec, flop_qkv)

    if "gu" in args.sections:
        # gate|up: fused [d, 2f] wgu (the decode win) vs separate at prefill M
        wg = quantize_tensor(jax.random.normal(ks[0], (d, f), jnp.bfloat16) * 0.02)
        wu = quantize_tensor(jax.random.normal(ks[1], (d, f), jnp.bfloat16) * 0.02)
        wgu = {"q": jnp.concatenate([wg["q"], wu["q"]], axis=1),
               "s": jnp.concatenate([wg["s"], wu["s"]], axis=1)}
        flop_gu = 2.0 * m * d * 2 * f

        for name, body in (
            ("gu_separate", lambda x: (matmul_w8a8(x, wg), matmul_w8a8(x, wu))),
            ("gu_fused", lambda x: matmul_w8a8(x, wgu)),
        ):
            st, sec = retry_call(lambda b=body: slope(chain(b), x_d),
                                 label=f"gu/{name}")
            if st == "ok":
                record("gu", name, sec, flop_gu)

    with open("BENCH_W8A8_TAIL.json") as fp:
        final = json.load(fp)
    final["config"] = results["config"]
    for k2 in list(results):
        if k2.startswith("relerr") or k2.startswith("rmsq"):
            final[k2] = results[k2]
    with open("BENCH_W8A8_TAIL.json", "w") as fp:
        json.dump(final, fp, indent=2)
    print(json.dumps(final, default=str)[:500], flush=True)


if __name__ == "__main__":
    main()
