"""CLI: aggregate runtime and prompt-stat streams into CSV summaries.

Role of the reference's avg_runtime.py (mean ttft_llm / time_decoding /
num_dec_token, optionally grouped by duration, :9-71) and avg_prompt_stat.py
(mean visual/input merged ratios, :9-71). Reads the harness's JSONL streams.

    python -m sttm_tpu.eval.report_cli outputs/<run_dir> [--group duration \
        --anno annos.json]
"""

from __future__ import annotations

import argparse
import json
import os

from .reporting import read_jsonl, summarize_prompt_stat, summarize_runtime


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--group", default=None, help="group runtime by this gt field")
    p.add_argument("--anno", default=None, help="annotation json for group fields")
    args = p.parse_args(argv)

    rts = read_jsonl(os.path.join(args.run_dir, "runtime.jsonl"))
    stats = read_jsonl(os.path.join(args.run_dir, "prompt_stat.jsonl"))

    if args.group and args.anno:
        with open(args.anno) as fp:
            gts = {a.get("question_id"): a for a in json.load(fp)}
        for r in rts:
            g = gts.get(r["question_id"], {})
            if args.group in g:
                r[args.group] = g[args.group]

    rt_summary = summarize_runtime(rts, group_field=args.group if args.anno else None)
    ps_summary = summarize_prompt_stat(stats)

    # CSV mirroring the reference's metrics/ layout
    csv_path = os.path.join(args.run_dir, "runtime_summary.csv")
    cols = ["n", "ttft_llm", "time_decoding", "num_dec_token", "all",
            "visual_merged_ratio", "input_merged_ratio"]
    vals = [rt_summary["n"], rt_summary["ttft_llm"], rt_summary["time_decoding"],
            rt_summary["num_dec_token"], rt_summary["all"],
            ps_summary["visual_merged_ratio"], ps_summary["input_merged_ratio"]]
    with open(csv_path, "w") as fp:
        fp.write(",".join(cols) + "\n")
        fp.write(",".join(f"{v:.6g}" if isinstance(v, float) else str(v) for v in vals) + "\n")

    print(json.dumps({"runtime": rt_summary, "prompt_stat": ps_summary}, indent=2))


if __name__ == "__main__":
    main()
