"""Measure the DPO training step on the real chip (tokens/s + MFU).

DPO runs FOUR trunk forwards per step (policy + stop-gradient reference
over chosen/rejected pairs) and backprops through the two policy passes —
the heaviest training step in the framework (reference capability:
llava/train/train_dpo.py, which the reference never benchmarks either).
Round 5 threaded remat + the fused-backward splash attention through
train/dpo.py; this bench prices the step at exact 7B width.

Model-FLOPs accounting per step over T = B*S tokens per sequence side:
  policy fwd+bwd: 6*P*T per side  -> 12*P*T
  reference fwd (no grad): 2*P*T per side -> 4*P*T
  attention fwd: A = L*2*T^2/B*hd*Hq per side; policy 3A*2, ref A*2
(lm_head counted inside P). mfu_model charges those to the v5e bf16 peak.

Slope-timed over a scan chain (params/opt donated) so the ~27 ms axon
dispatch RTT cancels (CLAUDE.md). Writes BENCH_DPO.json
(BENCH_DPO_TINY.json for --tiny). Usage:
  python scripts/bench_dpo.py [--layers 2] [--seq 2048] [--batch 1]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--remat_mode", choices=["full", "dots", "none"],
                    default="full")
    ap.add_argument("--attn", choices=["xla", "flash_train"],
                    default="flash_train")
    ap.add_argument("--tag", default=None)
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
    from sttm_tpu.train.dpo import make_dpo_train_step
    from sttm_tpu.train.sft import IGNORE_INDEX

    remat = {"full": True, "dots": "dots", "none": False}[args.remat_mode]
    if args.tiny:
        cfg = mcfg.TINY
        b, s = 2, 64
    else:
        cfg = dataclasses.replace(
            mcfg.QWEN2_7B, num_layers=args.layers, vocab_size=32768)
        b, s = args.batch, args.seq

    key = jax.random.key(0)
    params = qwen2.init_params(cfg, key)
    ref_params = qwen2.init_params(cfg, jax.random.key(1))
    tx = optax.adamw(1e-6)
    opt_state = tx.init(params)
    step = make_dpo_train_step(cfg, tx, beta=0.1, remat=remat,
                               attn_impl=args.attn)

    rng = np.random.default_rng(0)

    def pair():
        ids = rng.integers(0, cfg.vocab_size, (b, s))
        labels = np.array(ids)
        labels[:, : s // 2] = IGNORE_INDEX
        return jnp.asarray(ids, jnp.int32), jnp.asarray(labels, jnp.int32)

    ci, cl = pair()
    ri, rl = pair()
    batch = {"chosen_ids": ci, "chosen_labels": cl,
             "rejected_ids": ri, "rejected_labels": rl}

    def chain(n):
        # ref_params and batch are ARGUMENTS of the jitted fn, not closure
        # captures: closed-over weights become HLO constants and the ~1.4 GB
        # serialized module breaks the remote-compile transport (the
        # bench_moe lesson, CLAUDE.md)
        def run(p, o, rp, bt):
            def body(carry, _):
                p, o = carry
                p, o, loss, acc = step(p, rp, o, bt)
                return (p, o), (loss, acc)

            (p, o), (losses, accs) = jax.lax.scan(body, (p, o), None, length=n)
            return p, o, losses, accs

        return jax.jit(run, donate_argnums=(0, 1))

    tokens = 2 * b * s  # chosen + rejected tokens consumed per step
    results = {"config": {"layers": cfg.num_layers, "hidden": cfg.hidden_size,
                          "vocab": cfg.vocab_size, "batch": b, "seq": s,
                          "remat": args.remat_mode, "attn": args.attn}}

    if args.tiny:
        _, _, losses, _ = chain(4)(params, opt_state, ref_params, batch)
        losses = np.asarray(losses, np.float32)
        assert np.isfinite(losses).all()
        results["losses"] = [round(float(x), 4) for x in losses]
        out = "BENCH_DPO_TINY.json"
    else:
        lo, hi = 2, 6
        f_lo, f_hi = chain(lo), chain(hi)
        try:
            ma = f_lo.lower(params, opt_state, ref_params,
                            batch).compile().memory_analysis()
            results["memory_analysis_gb"] = {
                "aliased_state": round(ma.alias_size_in_bytes / 1e9, 2),
                "temp": round(ma.temp_size_in_bytes / 1e9, 2),
                "peak": round((ma.alias_size_in_bytes
                               + ma.temp_size_in_bytes) / 1e9, 2),
            }
        except Exception as e:  # pragma: no cover - informational only
            results["memory_analysis_gb"] = {"error": str(e)[:200]}

        # The timed phase inits FRESH params/opt per rep (donation!); the
        # main-level copies would otherwise sit on device adding ~params+opt
        # of dead weight to every rep's peak (L=4 OOMed from exactly this).
        del params, opt_state

        def timed(f, reps=3):
            ts = []
            for _ in range(reps):
                p = qwen2.init_params(cfg, key)
                o = tx.init(p)
                t0 = time.perf_counter()
                p, o, losses, _ = f(p, o, ref_params, batch)
                np.asarray(losses)
                ts.append(time.perf_counter() - t0)
                del p, o
            return float(np.median(ts))

        from chiputil import retry_call

        st, err = retry_call(lambda: (timed(f_lo, reps=1), timed(f_hi, reps=1)),
                             attempts=4, label="dpo-warm")
        if st != "ok":
            results["error_warm"] = err
            print(f"dpo bench warm-up failed terminally: {err}", flush=True)
        else:
            sec = (timed(f_hi) - timed(f_lo)) / (hi - lo)
            d, f, hd = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
            hq, hkv, L = cfg.num_heads, cfg.num_kv_heads, cfg.num_layers
            per_layer = (d * hq * hd + 2 * d * hkv * hd + hq * hd * d
                         + 3 * d * f)
            p_mat = L * per_layer + d * cfg.vocab_size
            t_side = b * s
            attn_side = L * 2.0 * t_side * s * hd * hq  # causal fwd, per side
            model_flop = (12.0 * p_mat * t_side      # policy fwd+bwd x2 sides
                          + 4.0 * p_mat * t_side     # ref fwd x2 sides
                          + 2 * 3.0 * attn_side      # policy attn fwd+bwd
                          + 2 * attn_side)           # ref attn fwd
            results.update({
                "ms_per_step": round(sec * 1e3, 2),
                "pair_tokens_per_s": round(tokens / sec, 1),
                "model_tflop_per_step": round(model_flop / 1e12, 2),
                "mfu_model": round(
                    model_flop / sec / 1e12 / V5E_BF16_PEAK_TFLOPS, 4),
            })
            print(f"dpo step: {sec * 1e3:.1f} ms, {tokens / sec:.0f} "
                  f"pair-tok/s, mfu_model={results['mfu_model']:.3f}",
                  flush=True)
        out = "BENCH_DPO.json"

    if not args.tiny and args.tag:
        try:
            with open(out) as fp:
                merged = json.load(fp)
        except (OSError, json.JSONDecodeError):
            merged = {}
        merged[args.tag] = results
        results = merged
    with open(out, "w") as fp:
        json.dump(results, fp, indent=2)
    print(json.dumps(results)[:300], flush=True)


if __name__ == "__main__":
    main()
