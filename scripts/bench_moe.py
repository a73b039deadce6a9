"""A/B the MoE dispatch tiers on the real chip (GAPS.md #9 lever).

Measures, at the Qwen1.5-MoE-A2.7B single-layer geometry (D=2048, E=60,
k=4, Fe=1408, bf16) at N=4096 prefill tokens:
  1. whole moe_mlp block per dispatch mode: dense (masked einsum) vs
     sort (lax.ragged_dot) vs gmm (Pallas grouped-GEMM, ops/gmm.py) vs
     gmm_fused (whole SwiGLU in one kernel) — the number that decides the
     default prefill dispatch tier;
  2. isolated grouped-GEMM: ragged_dot vs gmm at tm in {128, 256} on one
     [M, D] x [E, D, Fe] selected-FLOPs matmul, with achieved TFLOP/s vs
     the v5e bf16 MXU peak (197 TFLOP/s) — quantifies how much of the
     ragged_dot gap the tile-padded kernel recovers.

Timing is slope-based (scan-chained iterations) so the ~27 ms axon
dispatch RTT cancels (CLAUDE.md). The reference has no grouped-GEMM path
(its MoE shim defers to HF's per-expert python loop,
llava/model/language_model/llava_qwen_moe.py); this bench tunes
TPU-native infrastructure beyond reference scope.

Usage: python scripts/bench_moe.py [--tiny]
Writes BENCH_MOE.json (BENCH_MOE_TINY.json for the CPU smoke).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--tokens", type=int, default=4096)
    ap.add_argument("--modes", nargs="+",
                    default=["dense", "sort", "gmm", "gmm_fused"],
                    help="dispatch modes to time (the E=60 dense scan "
                         "program has repeatedly broken the remote-compile "
                         "tunnel; pass 'sort gmm gmm_fused' to skip it)")
    ap.add_argument("--skip_ragged", action="store_true",
                    help="skip the isolated lax.ragged_dot leg (its E=60 "
                         "lowering compiles for tens of minutes through the "
                         "remote tunnel and has wedged it)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--experts", type=int, default=None,
                    help="override num_experts: the full E=60 geometry's "
                         "compiles have repeatedly killed the remote-compile "
                         "transport (broken pipe after ~30 min); a smaller E "
                         "at the same d/fe/k measures the dispatch-tier "
                         "ordering on hardware at a geometry that compiles")
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

    from sttm_tpu.models import config as mcfg
    from sttm_tpu.models.moe import init_moe_layer_params, moe_mlp
    from sttm_tpu.ops.gmm import gmm, grouped_layout

    cfg = mcfg.TINY_MOE if args.tiny else mcfg.QWEN15_MOE_A27B
    if args.experts:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, num_experts=args.experts)
    n = 64 if args.tiny else args.tokens
    d, e, k, fe = (cfg.hidden_size, cfg.num_experts,
                   cfg.num_experts_per_tok, cfg.moe_intermediate_size)
    key = jax.random.key(0)
    ks = jax.random.split(key, 2)
    # NOTE: multiply by a Python float — a np.float64 scalar promotes the
    # bf16 weights to f32 under standard dtype promotion
    scale = lambda kk, shape: (jax.random.normal(kk, shape, jnp.bfloat16)
                               * float(0.5 / np.sqrt(shape[-2])))
    # init ONE layer only: the full 24-layer expert stack is 16.6 GB of
    # we_g alone and does not fit one v5e chip
    import dataclasses

    cfg1 = dataclasses.replace(cfg, num_layers=1)
    stacks = init_moe_layer_params(cfg1, ks[0], scale)
    lp = jax.tree.map(lambda a: a[0], stacks)
    h = jax.random.normal(ks[1], (1, n, d), jnp.bfloat16)

    results = {"geometry": {"d": d, "e": e, "k": k, "fe": fe, "tokens": n}}

    def slope(build, args, lo=2, hi=8, reps=3):
        """Per-iteration time of a scan-chained body at two chain lengths;
        the slope cancels dispatch RTT + output fetch (CLAUDE.md).

        ``build(iters)`` must return a jitted fn taking ``*args`` with the
        WEIGHTS as explicit arguments — a builder that closes over the
        expert stack bakes it into the program as constants, and the
        serialized module (hundreds of MB of weight bytes) blows the
        remote-compile request limit (HTTP 413 "length limit exceeded" —
        the actual mechanism behind round 3/4's "E=60 compiles wedged the
        tunnel")."""
        f_lo, f_hi = build(lo), build(hi)

        def timed(f):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = f(*args)
                np.asarray(out.ravel()[:8])
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        timed(f_lo), timed(f_hi)  # warm both compiles before measuring
        return (timed(f_hi) - timed(f_lo)) / (hi - lo)

    # -- 1. whole moe_mlp block per dispatch mode -------------------------
    modes = ["dense", "sort", "gmm", "gmm_fused"] if args.tiny else args.modes
    ref = None
    for mode in modes:
        # jit the parity forward: an eager run through the axon tunnel
        # dispatches op-by-op and holds every dense-mode intermediate
        # (~GBs at E=60, N=4096) with no XLA memory planning
        import functools

        y = jax.jit(functools.partial(moe_mlp, cfg=cfg, mode=mode))(lp, h)
        ynp = np.asarray(y, np.float32)
        if ref is None:
            ref = ynp
        else:
            err = float(np.max(np.abs(ynp - ref)) / (np.max(np.abs(ref)) + 1e-9))
            results[f"relerr_{mode}_vs_{modes[0]}"] = round(err, 5)
            assert err < 0.05, f"{mode} diverges from {modes[0]}: {err}"
        del y
        if args.tiny:
            continue

        def build(iters, mode=mode):
            def run(lp, x):
                def body(x, _):
                    y = moe_mlp(lp, x, cfg, mode=mode)
                    return x + jnp.bfloat16(1e-20) * y.astype(x.dtype), None

                return jax.lax.scan(body, x, None, length=iters)[0]

            return jax.jit(run)

        from chiputil import retry_call

        st, out = retry_call(lambda: slope(build, (lp, h)), attempts=4,
                             label=f"moe/{mode}")
        if st != "ok":
            results[f"block_{mode}"] = out
            print(f"moe_mlp[{mode}]: terminal {st}", flush=True)
            continue
        sec = out
        # selected FLOPs: N*k assignment rows x 3 expert matmuls + shared
        flops = (2.0 * n * k * 3 * d * fe
                 + 2.0 * n * 3 * d * cfg.shared_expert_intermediate_size)
        results[f"block_{mode}"] = {
            "ms": round(sec * 1e3, 2),
            "selected_tflop_s": round(flops / sec / 1e12, 1),
        }
        print(f"moe_mlp[{mode}]: {sec * 1e3:.2f} ms "
              f"({flops / sec / 1e12:.1f} TFLOP/s selected)", flush=True)

    # -- 2. isolated grouped-GEMM: ragged_dot vs gmm ----------------------
    m = n * k
    flat_e = jnp.sort(jax.random.randint(key, (m,), 0, e))
    group_sizes = jnp.bincount(flat_e, length=e)
    xs = jax.random.normal(ks[1], (m, d), jnp.bfloat16)
    w = jax.random.normal(ks[0], (e, d, fe), jnp.bfloat16) * 0.02
    gemm_flops = 2.0 * m * d * fe

    if not args.tiny and not args.skip_ragged:
        def b_ragged(iters):
            def run(w, x):
                def body(x, _):
                    y = jax.lax.ragged_dot(x, w, group_sizes)
                    # carried data dependence; fe < d at this geometry, so
                    # fold y into x's first fe columns
                    c = min(d, y.shape[1])
                    return x.at[:, :c].add(
                        jnp.bfloat16(1e-20) * y[:, :c]), None

                return jax.lax.scan(body, x, None, length=iters)[0]

            return jax.jit(run)

        sec = slope(b_ragged, (w, xs))
        results["gemm_ragged_dot"] = {
            "ms": round(sec * 1e3, 2),
            "tflop_s": round(gemm_flops / sec / 1e12, 1),
            "mxu_pct": round(100 * gemm_flops / sec / 1e12 / V5E_BF16_PEAK_TFLOPS, 1),
        }
        print(f"ragged_dot: {sec * 1e3:.2f} ms "
              f"({gemm_flops / sec / 1e12:.1f} TFLOP/s)", flush=True)

    for tm in (128, 256):
        order, row_dst, tile_group, m_pad = grouped_layout(flat_e, e, tm)
        xp = jnp.zeros((m_pad, d), jnp.bfloat16).at[row_dst].set(xs[order])

        if args.tiny:
            y = gmm(xp, w, tile_group, tm)[row_dst]
            yr = jax.lax.ragged_dot(xs, w, group_sizes)[order]
            err = float(
                np.max(np.abs(np.asarray(y, np.float32) - np.asarray(yr, np.float32)))
                / (np.max(np.abs(np.asarray(yr, np.float32))) + 1e-9))
            results[f"relerr_gmm_tm{tm}_vs_ragged"] = round(err, 6)
            assert err < 1e-2
            continue

        def b_gmm(iters, tile_group=tile_group, tm=tm):
            def run(w, x):
                def body(x, _):
                    y = gmm(x, w, tile_group, tm)
                    c = min(d, y.shape[1])
                    return x.at[:, :c].add(
                        jnp.bfloat16(1e-20) * y[:, :c]), None

                return jax.lax.scan(body, x, None, length=iters)[0]

            return jax.jit(run)

        from chiputil import retry_call

        st, out = retry_call(lambda b=b_gmm: slope(b, (w, xp)), attempts=4,
                             label=f"gmm_tm{tm}")
        if st != "ok":
            results[f"gemm_gmm_tm{tm}"] = out
            continue
        sec = out
        pad_ratio = m_pad / m
        results[f"gemm_gmm_tm{tm}"] = {
            "ms": round(sec * 1e3, 2),
            "tflop_s": round(gemm_flops / sec / 1e12, 1),
            "mxu_pct": round(100 * gemm_flops / sec / 1e12 / V5E_BF16_PEAK_TFLOPS, 1),
            "pad_ratio": round(pad_ratio, 3),
        }
        print(f"gmm tm={tm}: {sec * 1e3:.2f} ms "
              f"({gemm_flops / sec / 1e12:.1f} TFLOP/s, pad {pad_ratio:.2f}x)",
              flush=True)

    out = args.out or ("BENCH_MOE_TINY.json" if args.tiny else "BENCH_MOE.json")
    # deep-merge so each --modes leg can run in its own process (the E=60
    # compiles have wedged the tunnel before — isolate per mode) and still
    # accumulate into one artifact.
    from chiputil import merge_json

    merge_json(out, results)
    print(json.dumps(results, default=str)[:400], flush=True)


if __name__ == "__main__":
    main()
