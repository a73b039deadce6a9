"""Whole-model A/B of the fused-path down_proj K-split (VERDICT r4 MFU push).

The isolated GEMM bench said k_splits=4 wins (83.4% -> 89.2% of int8 peak,
BENCH_W8A8_TAIL.json down). The device profile says it also costs: the
int32-exact chunk accumulation materializes an s32 [M, 3584] intermediate
that blocks XLA's dequant epilogue fusion, adding a ~1.27 ms/layer
dequant+residual pass (PROFILE_PREFILL.json fusion.389) where the unsplit
GEMM emits bf16 directly (like gate/up's fusion.386). Per-op wins don't
compose across fusion boundaries (CLAUDE.md) — this measures the REAL
26-layer merged-prefill stage (s=12800, act_quant='fused', splash
attention) with down_k_splits in {1, 4}.

Usage: python scripts/ab_down_ksplit.py   Writes BENCH_AB_KSPLIT.json.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, ".")
    from bench import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from chiputil import retry_call
    from sttm_tpu.models import config as mcfg, qwen2
    from sttm_tpu.models.quant import random_quantized_init

    layers, s = 26, 12800
    base = dataclasses.replace(
        mcfg.QWEN2_7B, num_layers=layers, vocab_size=32768,
        act_quant="fused")
    params = random_quantized_init(base, jax.random.key(0), bits=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.1 * rng.normal(size=(1, s, base.hidden_size)),
                    base.dtype)
    cos, sin = qwen2.rope_cos_sin(base, jnp.arange(s))

    import functools

    @functools.lru_cache(maxsize=None)
    def build(ks):
        cfg = dataclasses.replace(base, down_k_splits=ks)
        return jax.jit(lambda lyr, x: qwen2.prefill_layers(
            lyr, 0, layers, x, cos, sin, s, cfg, "flash")[0])

    results = {"config": {"layers": layers, "seq": s,
                          "quant": "int8w8a_fused"}}
    for ks in (1, 4):
        def leg(ks=ks):
            f = build(ks)
            np.asarray(f(params["layers"], x)[0, :4, 0])  # warm + sync
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f(params["layers"], x)[0, :4, 0])
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts)) - 0.027  # tunnel RTT (CLAUDE.md)

        st, out = retry_call(leg, attempts=4, label=f"ksplit={ks}")
        results[f"ksplit{ks}"] = (
            {"ms": round(out * 1e3, 2)} if st == "ok" else out)
        print(f"ksplit={ks}: {results[f'ksplit{ks}']}", flush=True)

    a, b = results.get("ksplit1", {}), results.get("ksplit4", {})
    if "ms" in a and "ms" in b:
        results["winner"] = "ksplit1" if a["ms"] < b["ms"] else "ksplit4"
        results["delta_ms"] = round(b["ms"] - a["ms"], 2)
    with open("BENCH_AB_KSPLIT.json", "w") as fp:
        json.dump(results, fp, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
