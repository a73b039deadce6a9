"""Whole-model prefill op-level profile on the real chip.

Captures a jax.profiler trace of ONE merged (and optionally base) prefill
at the headline operating point and aggregates device-plane op durations,
so MFU-gap work targets measured ops instead of guesses (the round-3
decode-gap lesson: profile first). Works through the axon tunnel —
device-op times with HLO metadata are recorded remotely (CLAUDE.md).

Usage: python scripts/profile_prefill.py [--quant int8w8a_fused]
       [--top 40] [--merged_only]
Prints a sorted per-op table and writes PROFILE_PREFILL.json.
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys
import tempfile

import numpy as np


def aggregate_device_ops(log_dir: str):
    """Load the xplane dump and sum durations by op name on TPU planes.

    Returns (plane_name, total_ms, [(name, ms, count), ...]).
    """
    from jax.profiler import ProfileData

    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {log_dir}"
    data = ProfileData.from_file(paths[0])
    best = None
    for plane in data.planes:
        name = plane.name
        if "TPU" not in name and "tpu" not in name:
            continue
        by_op = collections.defaultdict(lambda: [0.0, 0])
        for line in plane.lines:
            for ev in line.events:
                d = ev.duration_ns / 1e6
                by_op[ev.name][0] += d
                by_op[ev.name][1] += 1
        total = sum(v[0] for v in by_op.values())
        if best is None or total > best[1]:
            best = (name, total, sorted(
                ((k, v[0], v[1]) for k, v in by_op.items()),
                key=lambda t: -t[1]))
    assert best is not None, "no TPU plane found in trace"
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="int8w8a_fused")
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--vocab", type=int, default=32768)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--merged_only", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from bench import _enable_compile_cache

    _enable_compile_cache()
    import jax

    from bench import build_case
    from sttm_tpu.runtime.generate import build_prefill

    cfg, spec, params, embeds, valid, vstart, s_full, impl = build_case(
        False, args.frames, args.layers, args.vocab, args.quant)
    import jax.numpy as jnp

    out = {"config": {"layers": cfg.num_layers, "quant": args.quant,
                      "s_full": s_full}}
    runs = [("merged", True)] if args.merged_only else [
        ("merged", True), ("base", False)]
    for tag, merged in runs:
        fn = build_prefill(cfg, spec if merged else None, s_full, impl)
        r = fn(params, embeds, jnp.int32(valid), jnp.int32(vstart))
        np.asarray(jax.tree.leaves(r)[0].ravel()[:8])  # warm + sync
        log_dir = tempfile.mkdtemp(prefix=f"prefill_trace_{tag}_")
        jax.profiler.start_trace(log_dir)
        r = fn(params, embeds, jnp.int32(valid), jnp.int32(vstart))
        np.asarray(jax.tree.leaves(r)[0].ravel()[:8])
        jax.profiler.stop_trace()
        plane, total, ops = aggregate_device_ops(log_dir)
        print(f"\n== {tag} prefill: device total {total:.1f} ms "
              f"(plane {plane}) ==")
        for name, ms, cnt in ops[:args.top]:
            print(f"  {ms:9.2f} ms  x{cnt:<5d} {name[:110]}")
        out[tag] = {
            "device_total_ms": round(total, 1),
            "top_ops": [
                {"name": n[:160], "ms": round(m, 2), "count": c}
                for n, m, c in ops[:args.top]
            ],
        }
        del r, fn

    with open("PROFILE_PREFILL.json", "w") as fp:
        json.dump(out, fp, indent=2)


if __name__ == "__main__":
    main()
