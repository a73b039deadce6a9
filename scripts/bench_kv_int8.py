"""int8 live-KV decode on the real chip (the kv_int8 mode's headline number).

At the headline decode point (28-layer 7B int8w8a, STTM 50%/k=2 merged to
~12.8k tokens) the per-layer per-step HBM read is ~8.3 MB of int8 weights
plus ~26 MB of bf16 K/V — the cache, not the weights, dominates. kv_int8
(qwen2.quantize_kv_cache + per-write-slot quantization in decode_layers)
stores the live cache as int8 with per-(position, head) scales, cutting the
KV read in half; the roofline expectation is ~1.5x on device-side decode.

Measures chunked decode ms/token with the bf16 vs int8 cache at the same
operating point (same weights, same prompt), plus token agreement (bounded
approximation — argmax near-ties flip under random weights, CLAUDE.md;
CPU tests bound the drift, tests/test_kv_int8.py).

Usage: python scripts/bench_kv_int8.py [--layers 28] [--tokens 64]
Writes BENCH_KV_INT8.json (BENCH_KV_INT8_TINY.json for the CPU smoke).
"""

from __future__ import annotations

import argparse
import json
import sys


def run_decode(params, cfg, spec, embeds, valid, vstart, impl, n_tokens,
               chunk, kv_int8):
    from sttm_tpu.runtime.generate import GenerateConfig, generate

    gen = GenerateConfig(max_new_tokens=n_tokens, eos_token_ids=())
    generate(params, cfg, embeds, valid, vstart, spec, gen,
             impl=impl, decode_chunk_size=chunk, kv_int8=kv_int8)  # warm
    ids, rt = generate(params, cfg, embeds, valid, vstart, spec, gen,
                       impl=impl, decode_chunk_size=chunk, kv_int8=kv_int8)
    ms_per_tok = 1e3 * rt["time_decoding"] / max(rt["num_dec_token"] - 1, 1)
    return ids, ms_per_tok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--vocab", type=int, default=32768)
    ap.add_argument("--quant", default="int8w8a")
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=16)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from bench import _enable_compile_cache

        _enable_compile_cache()

    from bench import build_case

    cfg, spec, params, embeds, valid, vstart, s_full, impl = build_case(
        args.tiny, args.frames, args.layers, args.vocab,
        "none" if args.tiny else args.quant,
    )
    chunk = 4 if args.tiny else args.chunk
    n_tok = 8 if args.tiny else args.tokens

    results = {"config": {"layers": cfg.num_layers, "quant": args.quant,
                          "chunk": chunk, "s_full": s_full}}

    ids_b, ms_b = run_decode(
        params, cfg, spec, embeds, valid, vstart, impl, n_tok, chunk, False)
    print(f"bf16 KV: {ms_b:.2f} ms/token", flush=True)
    results["bf16_ms_per_token"] = round(ms_b, 3)

    ids_q, ms_q = run_decode(
        params, cfg, spec, embeds, valid, vstart, impl, n_tok, chunk, True)
    print(f"int8 KV: {ms_q:.2f} ms/token", flush=True)
    results["int8_ms_per_token"] = round(ms_q, 3)
    results["speedup"] = round(ms_b / ms_q, 3)
    flips = sum(a != b for a, b in zip(ids_b, ids_q))
    results["token_flips"] = flips
    print(f"speedup {ms_b / ms_q:.3f}x, {flips}/{len(ids_b)} token flips",
          flush=True)

    out = "BENCH_KV_INT8_TINY.json" if args.tiny else "BENCH_KV_INT8.json"
    with open(out, "w") as fp:
        json.dump(results, fp, indent=2)


if __name__ == "__main__":
    main()
