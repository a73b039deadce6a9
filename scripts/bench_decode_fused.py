"""Decode-gap experiment: fused QKV / gate-up projections (VERDICT r2 #5).

Round-2 measured decode at 12.9 ms/token (chunk16, 28-layer int8w8a,
sttm50/k2) vs the 8.4 ms int8 weight-read floor, and attributed the gap to
per-op GEMV overhead (196 ops/step; each streams at ~90% HBM peak but ramps
never overlap). This measures the same operating point with
quant.fuse_layer_projections (wq|wk|wv -> wqkv, wg|wu -> wgu: ~112 ops/step,
larger reads) against the unfused baseline, on the real chip.

Usage: python scripts/bench_decode_fused.py [--layers 28] [--tokens 32]
Writes BENCH_DECODE_FUSED.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def run_decode(params, cfg, spec, embeds, valid, vstart, impl, n_tokens, chunk,
               unroll=False):
    import jax
    import jax.numpy as jnp

    from sttm_tpu.runtime.generate import GenerateConfig, generate

    gen = GenerateConfig(max_new_tokens=n_tokens, eos_token_ids=())
    # warm (compile)
    generate(params, cfg, embeds, valid, vstart, spec,
             GenerateConfig(max_new_tokens=n_tokens, eos_token_ids=()),
             impl=impl, decode_chunk_size=chunk, decode_unroll=unroll)
    ids, rt = generate(params, cfg, embeds, valid, vstart, spec, gen,
                       impl=impl, decode_chunk_size=chunk, decode_unroll=unroll)
    ms_per_tok = 1e3 * rt["time_decoding"] / max(rt["num_dec_token"] - 1, 1)
    return ids, ms_per_tok, rt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--vocab", type=int, default=32768)
    ap.add_argument("--quant", default="int8w8a")
    ap.add_argument("--tokens", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--unroll", action="store_true",
                    help="unroll the fused run's layer loop (static weight "
                         "indices; required for Pallas int4 GEMVs to avoid "
                         "per-layer weight copies)")
    ap.add_argument("--out", default="BENCH_DECODE_FUSED.json")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from bench import _enable_compile_cache

        _enable_compile_cache()
    import jax

    from bench import build_case
    from sttm_tpu.models.quant import fuse_layer_projections

    cfg, spec, params, embeds, valid, vstart, s_full, impl = build_case(
        args.tiny, args.frames, args.layers, args.vocab,
        "none" if args.tiny else args.quant,
    )
    chunk = 4 if args.tiny else args.chunk
    n_tok = 8 if args.tiny else args.tokens

    results = {"config": {"layers": cfg.num_layers, "quant": args.quant,
                          "chunk": chunk, "s_full": s_full}}

    ids_u, ms_u, _ = run_decode(
        params, cfg, spec, embeds, valid, vstart, impl, n_tok, chunk)
    print(f"unfused: {ms_u:.2f} ms/token", flush=True)
    results["unfused_ms_per_token"] = ms_u

    fused = fuse_layer_projections(params)
    del params
    ids_f, ms_f, _ = run_decode(
        fused, cfg, spec, embeds, valid, vstart, impl, n_tok, chunk,
        unroll=args.unroll)
    print(f"fused:   {ms_f:.2f} ms/token", flush=True)
    results["fused_ms_per_token"] = ms_f
    results["unroll"] = args.unroll
    results["speedup"] = ms_u / ms_f
    # token agreement (same math; argmax near-ties may flip under random
    # weights on TPU — record, don't assert; CPU tests assert exactness)
    flips = sum(a != b for a, b in zip(ids_u, ids_f))
    results["token_flips"] = flips
    print(f"speedup {ms_u / ms_f:.3f}x, {flips} token flips", flush=True)

    out = "BENCH_DECODE_FUSED_TINY.json" if args.tiny else args.out
    with open(out, "w") as fp:
        json.dump(results, fp, indent=2)


if __name__ == "__main__":
    main()
