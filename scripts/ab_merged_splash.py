"""Whole-model A/B of in-model splash configs on the merged prefill leg
(VERDICT r4 #5: close the last MFU points — merged 0.686 vs target 0.70).

The quantified tail is ~24 ms of in-model-vs-isolated splash penalty
(8.47 vs 7.56 ms/layer x 26 layers at the 12.8k merged length,
PROFILE_PREFILL.json) attributed to VMEM/DMA contention with neighboring
ops. Isolated sweeps cannot see that interaction, so each candidate config
is timed through the FULL merged prefill (bench.py --merged_only), one
fresh process per variant (the env knob is read at trace time and jit
builders are module-level caches — see ops/attention.py STTM_SPLASH_BLOCKS).

Writes BENCH_AB_MERGED_SPLASH.json. Usage:
  python scripts/ab_merged_splash.py [--variants default,1280/2560/128,...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_variant(name: str, env_extra: dict, budget_s: int = 3000):
    env = dict(os.environ)
    env.update(env_extra)
    cmd = [sys.executable, "bench.py", "--merged_only",
           "--budget_s", str(budget_s)]
    p = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                       text=True, timeout=budget_s + 300)
    line = None
    for ln in p.stdout.strip().splitlines():
        try:
            line = json.loads(ln)
        except json.JSONDecodeError:
            continue
    if line is None or "ttft_merged_s" not in line:
        return {"error": (p.stderr.strip().splitlines() or ["no output"])[-1],
                "rc": p.returncode}
    return line


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=None,
                    help="comma list: 'default', 'bq/bkv/bkc', "
                         "'bq/bkv/bkc+noVS', 'noVS', 'ropeQK_off' "
                         "(revert to the stock XLA K-rope)")
    ap.add_argument("--reps", type=int, default=1,
                    help="repeat each variant (fresh process each)")
    args = ap.parse_args()

    variants = (args.variants.split(",") if args.variants else [
        "default",            # 1280/2560/256 + vS (the shipped config)
        "1280/2560/128",      # smaller MXU sub-block
        "1280/1280/256",      # halve the streaming KV block (less VMEM)
        "640/2560/256",       # smaller q block
        "1280/2560/512",      # bigger sub-block
        "noVS",               # HEAD_DIM_MINOR V in-model (isolated loser)
    ])

    out_path = os.path.join(REPO, "BENCH_AB_MERGED_SPLASH.json")
    try:
        with open(out_path) as fp:
            results = json.load(fp)
    except (OSError, json.JSONDecodeError):
        results = {}

    for v in variants:
        env = {}
        name = v
        if v.endswith("+noVS"):
            env["STTM_SPLASH_VSM"] = "0"
            v = v[: -len("+noVS")]
        if v == "noVS":
            env["STTM_SPLASH_VSM"] = "0"
        elif v == "ropeQK_off":
            env["STTM_ROPE_QK"] = "0"
        elif v != "default":
            env["STTM_SPLASH_BLOCKS"] = v.replace("/", ",")
        for r in range(args.reps):
            res = run_variant(name, env)
            print(f"{name} rep{r}: {json.dumps(res)}", flush=True)
            results.setdefault(name, []).append(res)
            with open(out_path, "w") as fp:
                json.dump(results, fp, indent=2)

    best = {
        k: min(x["ttft_merged_s"] for x in vs if "ttft_merged_s" in x)
        for k, vs in results.items()
        if any("ttft_merged_s" in x for x in vs)
    }
    print(json.dumps({"best_per_variant": best}))


if __name__ == "__main__":
    main()
