"""Measure the SFT training step on the real chip (tokens/s + MFU).

The training stack (train/sft.py — capability parity with the reference's
llava/train/train.py, which STTM itself never runs) had CPU-only evidence;
this bench puts a number on it: one adamw step (fwd + bwd + update) over
the Qwen2 trunk at exact 7B width (D=3584, F=18944, 28q/4kv heads) with
``--layers`` layers. Default 3: XLA's compile-time memory analysis of the
donated step chain puts the 4-layer point at 7.0 GB aliased state + 7.9 GB
temp (grads + fresh adam moments before they alias) = 14.9 GB peak, which
RESOURCE_EXHAUSTs at runtime on a 15.75 GB v5e; 3 layers peaks ~11.9 GB.
The per-chip memory analysis is recorded in the output either way.

Timing is slope-based over a scan-chained step loop (params/opt_state as
the scan carry, donated), so the ~27 ms axon dispatch RTT cancels
(CLAUDE.md). MFU is reported two ways:
  - ``mfu_model``: standard model-FLOPs MFU — 6*P*T for the projection /
    lm_head GEMMs (2PT fwd, 4PT bwd) plus 3x the causal attention forward
    — against the v5e bf16 peak (197 TFLOP/s);
  - ``mfu_hw``: hardware FLOPs under remat (the backward recomputes the
    forward: 8PT + 4x attention fwd) — how busy the MXU actually is.

Usage: python scripts/bench_train.py [--tiny] [--layers N] [--seq S]
Writes BENCH_TRAIN.json (BENCH_TRAIN_TINY.json for the CPU smoke).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0


def param_flop_count(cfg, tokens: int) -> tuple[float, float]:
    """(gemm_train_flop, attn_fwd_flop) for one step over ``tokens``."""
    d, f, hd = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    hq, hkv, L = cfg.num_heads, cfg.num_kv_heads, cfg.num_layers
    per_layer = (d * hq * hd + 2 * d * hkv * hd + hq * hd * d  # q k v o
                 + 3 * d * f)                                   # gate up down
    p_matmul = L * per_layer + d * cfg.vocab_size               # + lm_head
    gemm_train = 6.0 * p_matmul * tokens
    # causal QK^T + PV per layer: 2 * 2 * T^2 * hd * Hq / 2
    attn_fwd = L * 2.0 * tokens * tokens * hd * hq
    return gemm_train, attn_fwd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--no_remat", action="store_true")
    ap.add_argument(
        "--remat_mode", choices=["full", "dots", "none"], default="full",
        help="full: per-layer jax.checkpoint (backward re-runs the whole "
             "forward); dots: dots_with_no_batch_dims_saveable (GEMM "
             "outputs saved, only elementwise+attention recomputed — "
             "~0.4 GB/layer more HBM); none: no remat")
    ap.add_argument(
        "--attn", choices=["xla", "flash_train"], default="xla",
        help="flash_train: splash-kernel attention with its fused backward "
             "(no S^2 score buffers fwd or bwd)")
    ap.add_argument(
        "--tag", default=None,
        help="merge this run under BENCH_TRAIN.json[tag] instead of the "
             "top level / remat_<mode> key — for secondary geometries "
             "(e.g. a full-vs-dots pair at a seq both modes fit)")
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
    import optax

    from sttm_tpu.models import config as mcfg, qwen2
    from sttm_tpu.train.sft import IGNORE_INDEX, make_train_step

    mode = "none" if args.no_remat else args.remat_mode
    remat = {"full": True, "dots": "dots", "none": False}[mode]
    if args.tiny:
        cfg = mcfg.TINY
        b, s = 2, 64
    else:
        cfg = dataclasses.replace(
            mcfg.QWEN2_7B, num_layers=args.layers, vocab_size=32768)
        b, s = args.batch, args.seq

    key = jax.random.key(0)
    params = qwen2.init_params(cfg, key)
    tx = optax.adamw(1e-4 if args.tiny else 1e-5)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, remat=remat, attn_impl=args.attn)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    # supervise the second half of every row (an instruction-tuning shape)
    labels = np.array(ids)
    labels[:, : s // 2] = IGNORE_INDEX
    labels = jnp.asarray(labels)

    def chain(n):
        """n optimisation steps on the fixed batch, params/opt as carry.
        The final carry IS returned: donation needs an output to alias the
        donated state into — returning only the losses keeps a second copy
        of params+opt alive (measured: OOMs the 4-layer 7B-width point)."""

        def body(carry, _):
            p, o = carry
            p, o, loss = step(p, o, ids, labels)
            return (p, o), loss

        def run(p, o):
            (p, o), losses = jax.lax.scan(body, (p, o), None, length=n)
            return p, o, losses

        return jax.jit(run, donate_argnums=(0, 1))

    tokens = b * s
    results = {
        "config": {"layers": cfg.num_layers, "hidden": cfg.hidden_size,
                   "vocab": cfg.vocab_size, "batch": b, "seq": s,
                   "remat": mode, "attn": args.attn, "dtype": "bf16"},
    }

    if args.tiny:
        _, _, losses = chain(6)(params, opt_state)
        losses = np.asarray(losses, np.float32)
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], f"loss must decrease: {losses}"
        results["losses"] = [round(float(x), 4) for x in losses]
        out = "BENCH_TRAIN_TINY.json"
    else:
        # two chain lengths; the slope cancels dispatch RTT + fetch
        lo, hi = 2, 6
        f_lo, f_hi = chain(lo), chain(hi)

        # compile-time memory analysis (runs through the remote-compile
        # tunnel without executing): documents why 4 layers OOMs — peak =
        # aliased donated state + temp (grads + fresh adam moments).
        try:
            ma = f_lo.lower(params, opt_state).compile().memory_analysis()
            results["memory_analysis_gb"] = {
                "aliased_state": round(ma.alias_size_in_bytes / 1e9, 2),
                "temp": round(ma.temp_size_in_bytes / 1e9, 2),
                "peak": round((ma.alias_size_in_bytes
                               + ma.temp_size_in_bytes) / 1e9, 2),
            }
        except Exception as e:  # pragma: no cover - informational only
            results["memory_analysis_gb"] = {"error": str(e)[:200]}

        # The timed phase inits FRESH params/opt per rep (donation!); keeping
        # the main-level copies alive added ~aliased_state of dead device
        # weight to every rep's peak, turning fit-on-paper points into OOMs
        # (the bench_dpo L=4 lesson, round 5). Frontier claims below are only
        # honest with these freed.
        del params, opt_state

        def timed(f, n, reps=3):
            ts = []
            for _ in range(reps):
                p = qwen2.init_params(cfg, key)
                o = tx.init(p)
                t0 = time.perf_counter()
                p, o, losses = f(p, o)
                np.asarray(losses)
                ts.append(time.perf_counter() - t0)
                del p, o
            return float(np.median(ts))

        # the remote-compile service 500s transiently (VERDICT r3 weak #1);
        # retry the warm-up (where compiles happen), then measure
        from chiputil import retry_call

        st, err = retry_call(
            lambda: (timed(f_lo, lo, reps=1), timed(f_hi, hi, reps=1)),
            attempts=4, label="train-warm")
        if st != "ok":
            results["error_warm"] = err
            print(f"train bench warm-up failed terminally: {err}", flush=True)
        else:
            sec = (timed(f_hi, hi) - timed(f_lo, lo)) / (hi - lo)

            gemm_train, attn_fwd = param_flop_count(cfg, tokens)
            model_flop = gemm_train + 3.0 * attn_fwd
            # recompute FLOPs by mode: full re-runs the forward (2PT GEMMs
            # + attention); dots saves GEMM outputs so only attention
            # recomputes; none recomputes nothing
            hw_flop = model_flop
            if mode == "full":
                hw_flop += (2.0 / 6.0) * gemm_train + attn_fwd
            elif mode == "dots":
                hw_flop += attn_fwd
            results.update({
                "ms_per_step": round(sec * 1e3, 2),
                "tokens_per_s": round(tokens / sec, 1),
                "model_tflop_per_step": round(model_flop / 1e12, 2),
                "mfu_model": round(model_flop / sec / 1e12 / V5E_BF16_PEAK_TFLOPS, 4),
                "mfu_hw": round(hw_flop / sec / 1e12 / V5E_BF16_PEAK_TFLOPS, 4),
            })
            print(f"train step: {sec * 1e3:.1f} ms, {tokens / sec:.0f} tok/s, "
                  f"mfu_model={results['mfu_model']:.3f} "
                  f"mfu_hw={results['mfu_hw']:.3f}", flush=True)
        out = "BENCH_TRAIN.json"

    if not args.tiny and (mode != "full" or args.tag):
        # non-default remat modes / tagged secondary geometries merge under
        # a key so the headline full-remat record survives
        try:
            with open(out) as fp:
                merged = json.load(fp)
        except (OSError, json.JSONDecodeError):
            merged = {}
        merged[args.tag or f"remat_{mode}"] = results
        results = merged
    with open(out, "w") as fp:
        json.dump(results, fp, indent=2)
    print(json.dumps(results)[:300], flush=True)


if __name__ == "__main__":
    main()
