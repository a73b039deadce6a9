"""int8 live-KV decode on the real chip (the kv_int8 mode's numbers).

Traffic model at the headline point (28-layer 7B int8w8a, STTM 50%/k=2,
25.6k prefill merging to ~12.8k): one decode step reads ~7 GB of int8
weights plus ~0.8 GB of bf16 KV per cache copy. Single-stream decode is
therefore weight-read-bound and kv_int8 buys only a few percent — but
BATCHED decode reads B caches per weight read (KV approaches half the
step traffic at b=8) and cache HBM is what caps the flat batch size on
one 15.75 GB chip. kv_int8 halves both, so the interesting legs are:

  1. single-stream chunked decode ms/token, bf16 vs int8 cache (honest
     small number + token agreement);
  2. flat-batched decode tokens/s at --batches, bf16 vs int8 caches —
     including whether the bf16 leg fits at all (OOM recorded, the
     BENCH_SERVING b=8 story: int8 KV is the capacity lever for flat
     batches of DISTINCT videos, where cascade/paged pools don't apply).

Usage: python scripts/bench_kv_int8.py [--layers 28] [--batches 4 8]
Writes BENCH_KV_INT8.json (BENCH_KV_INT8_TINY.json for the CPU smoke).
"""

from __future__ import annotations

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--vocab", type=int, default=32768)
    ap.add_argument("--quant", default="int8w8a")
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--batches", type=int, nargs="+", default=[4, 8])
    ap.add_argument("--skip_single", action="store_true",
                    help="only run the batched legs (re-run harness)")
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
    import numpy as np

    from bench import build_case
    from chiputil import merge_json, retry_call
    from sttm_tpu.runtime.generate import GenerateConfig, generate, generate_batch

    cfg, spec, params, embeds, valid, vstart, s_full, impl = build_case(
        args.tiny, args.frames, args.layers, args.vocab,
        "none" if args.tiny else args.quant,
    )
    chunk = 4 if args.tiny else args.chunk
    n_tok = 8 if args.tiny else args.tokens
    batches = [2] if args.tiny else args.batches
    gen = GenerateConfig(max_new_tokens=n_tok, eos_token_ids=())

    results = {"config": {"layers": cfg.num_layers, "quant": args.quant,
                          "chunk": chunk, "s_full": s_full}}
    out_path = "BENCH_KV_INT8_TINY.json" if args.tiny else "BENCH_KV_INT8.json"

    # -- 1. single-stream: bf16 vs int8 cache --------------------------------
    def run_single(kv_int8):
        generate(params, cfg, embeds, valid, vstart, spec, gen,
                 impl=impl, decode_chunk_size=chunk, kv_int8=kv_int8)  # warm
        ids, rt = generate(params, cfg, embeds, valid, vstart, spec, gen,
                           impl=impl, decode_chunk_size=chunk, kv_int8=kv_int8)
        return ids, 1e3 * rt["time_decoding"] / max(rt["num_dec_token"] - 1, 1)

    if not args.skip_single:
        ids_b, ms_b = run_single(False)
        ids_q, ms_q = run_single(True)
        flips = sum(a != b for a, b in zip(ids_b, ids_q))
        results["single"] = {
            "bf16_ms_per_token": round(ms_b, 3),
            "int8_ms_per_token": round(ms_q, 3),
            "speedup": round(ms_b / ms_q, 3),
            "token_flips": flips,
        }
        print(f"single: bf16 {ms_b:.2f} vs int8 {ms_q:.2f} ms/token "
              f"({ms_b / ms_q:.3f}x, {flips}/{len(ids_b)} flips)", flush=True)

    # -- 2. flat-batched decode of DISTINCT videos: bf16 vs int8 caches ------
    # clear stale entries for the legs being re-measured (merge_json is a
    # deep merge: an old {"error": ...} would otherwise survive inside a
    # fresh measurement)
    try:
        with open(out_path) as fp:
            prior = json.load(fp)
        for b in batches:
            prior.get("batched", {}).pop(str(b), None)
        with open(out_path, "w") as fp:
            json.dump(prior, fp, indent=2)
    except (OSError, json.JSONDecodeError):
        pass
    rng = np.random.default_rng(0)
    results["batched"] = {}
    for b in batches:
        try:
            embs = np.asarray(embeds, np.float32)
            embs = np.broadcast_to(embs, (b,) + embs.shape[1:]).copy()
            embs += 0.01 * rng.normal(size=embs.shape).astype(np.float32)
            embs_j = jnp.asarray(embs, embeds.dtype)
            del embs
        except Exception as e:
            results["batched"][str(b)] = {"error": str(e)[:160]}
            continue
        entry = {}
        for tag, kv8 in (("bf16", False), ("int8", True)):
            # retry_call: a transport HTTP-500 retries; only a genuine
            # device RESOURCE_EXHAUSTED is recorded as {"oom": true}
            # (VERDICT r3 weak #1c: bf16 b=8 capacity claim needs a real
            # device-side OOM or a number, never a compile-service error).
            def leg(kv8=kv8):
                def run():
                    return generate_batch(
                        params, cfg, embs_j, [valid] * b, [vstart] * b, spec,
                        gen, impl=impl, decode_chunk_size=chunk, kv_int8=kv8)

                run()  # warm
                ids, rt = run()
                toks = sum(len(r) for r in ids) - b
                return toks / rt["time_decoding"], rt["time_decoding"], toks

            st, out = retry_call(leg, attempts=4, label=f"kv_int8 b={b} {tag}")
            if st == "ok":
                tok_s, t_dec, toks = out
                entry[tag] = {"tokens_per_s": round(tok_s, 1),
                              "ms_per_step": round(1e3 * t_dec * b / toks, 2)}
                print(f"batched b={b} {tag}: {tok_s:.1f} tok/s", flush=True)
            else:
                entry[tag] = out
                print(f"batched b={b} {tag}: terminal {st}", flush=True)
            merge_json(out_path, {"batched": {str(b): {tag: entry[tag]}}})
        if "tokens_per_s" in entry.get("bf16", {}) and \
                "tokens_per_s" in entry.get("int8", {}):
            entry["speedup"] = round(
                entry["int8"]["tokens_per_s"] / entry["bf16"]["tokens_per_s"], 3)
            merge_json(out_path, {"batched": {str(b): {
                "speedup": entry["speedup"]}}})
        results["batched"][str(b)] = entry

    final = merge_json(out_path, results)  # keep prior legs on partial re-runs
    print(json.dumps(final)[:400], flush=True)


if __name__ == "__main__":
    main()
