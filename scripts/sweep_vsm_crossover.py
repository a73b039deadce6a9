"""Place the V-SEQ_MINOR layout crossover between 12.8k (vS wins) and
25.6k (vS loses) — ADVICE r4 #2: the production default
``v_seq_minor = (sq <= 12800)`` rested on exactly two measured points, so
intermediate operating points (other frame counts / budgets) might silently
get the slower layout.

Measures isolated splash attention (the same protocol as sweep_splash.py)
with vS on/off at intermediate lengths and records the crossover; the
threshold constant in ops/attention.py cites this artifact.

Writes BENCH_VSM_CROSSOVER.json. Usage:
  python scripts/sweep_vsm_crossover.py [--lengths 15360 19200 23040]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

V5E_BF16_PEAK = 197e12


def main():
    ap = argparse.ArgumentParser()
    # multiples of 1280 so the production 1280/2560/256 blocks apply
    # (2560 falls back to 1280 when it does not divide — _pick_block)
    ap.add_argument("--lengths", type=int, nargs="+",
                    default=[15360, 17920, 19200, 23040])
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from bench import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from chiputil import merge_json, retry_call
    from sttm_tpu.ops.attention import _splash_mha

    hq, hkv, hd = 28, 4, 128
    rng = np.random.default_rng(0)
    summary = {}
    for s in args.lengths:
        q = jnp.asarray(rng.normal(size=(1, s, hq, hd)) * 0.1, jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(1, s, hkv, hd)) * 0.1, jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(1, s, hkv, hd)) * 0.1, jnp.bfloat16)
        vl = jnp.int32(s)
        flops = 2 * (s * (s + 1) / 2) * hd * 2 * hq
        entry = {}
        for vsm in (False, True):
            def leg(vsm=vsm):
                f = jax.jit(lambda q, k, v, vl: _splash_mha(
                    q, k, v, vl, hd**-0.5, v_seq_minor=vsm))
                np.asarray(f(q, k, v, vl))[0, 0, 0]  # warm
                times = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    out = f(q, k, v, vl)
                    np.asarray(out[0, :8, 0, 0])
                    times.append(time.perf_counter() - t0)
                return float(np.median(times)) - 0.027  # tunnel RTT

            st, out = retry_call(leg, attempts=4,
                                 label=f"vsm s={s} {'vS' if vsm else 'hd'}")
            key = "v_seq_minor" if vsm else "head_dim_minor"
            if st == "ok":
                entry[key] = {"ms": round(out * 1e3, 2),
                              "mfu": round(flops / out / V5E_BF16_PEAK, 4)}
                print(f"S={s} {key}: {out*1e3:.2f} ms", flush=True)
            else:
                entry[key] = out
                print(f"S={s} {key}: terminal {st}", flush=True)
        if all("ms" in entry.get(k, {}) for k in
               ("v_seq_minor", "head_dim_minor")):
            entry["vsm_speedup"] = round(
                entry["head_dim_minor"]["ms"] / entry["v_seq_minor"]["ms"], 4)
        merge_json("BENCH_VSM_CROSSOVER.json", {str(s): entry})
        summary[str(s)] = entry.get("vsm_speedup")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
