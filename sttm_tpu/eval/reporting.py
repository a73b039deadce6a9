"""Runtime and token-compression reporting.

Behavioral port of avg_runtime.py:9-71 (mean ttft_llm / time_decoding /
num_dec_token, optionally grouped by duration) and avg_prompt_stat.py:9-71
(visual_merged_ratio = 100 * merged visual tokens / original visual tokens,
input_merged_ratio over the whole prompt; computed per sample in the harness
like eval_vidqa_by_feat_llavavideo.py:250-252).
"""

from __future__ import annotations

import json

__all__ = ["prompt_stat_ratios", "summarize_runtime", "summarize_prompt_stat", "append_jsonl", "read_jsonl"]


def prompt_stat_ratios(stat: dict) -> dict:
    """stat: {sys, video, inst, merged_video, merged_input}."""
    out = dict(stat)
    total_in = stat["sys"] + stat["video"] + stat["inst"]
    out["visual_merged_ratio"] = 100.0 * stat["merged_video"] / max(stat["video"], 1)
    out["input_merged_ratio"] = 100.0 * stat["merged_input"] / max(total_in, 1)
    return out


def _mean(rows, key):
    vals = [r[key] for r in rows if key in r]
    return sum(vals) / len(vals) if vals else 0.0


def summarize_runtime(rows: list[dict], group_field: str | None = None) -> dict:
    """rows: per-sample runtime dicts (ttft_llm, time_decoding, num_dec_token)."""
    summary = {
        "n": len(rows),
        "ttft_llm": _mean(rows, "ttft_llm"),
        "time_decoding": _mean(rows, "time_decoding"),
        "num_dec_token": _mean(rows, "num_dec_token"),
        "all": _mean(rows, "all"),
    }
    # speculative decoding (--spec_decode_k): pooled draft-acceptance rate
    drafted = sum(r.get("spec_drafted", 0) for r in rows)
    if drafted:
        summary["spec_accept_rate"] = (
            sum(r.get("spec_accepted", 0) for r in rows) / drafted
        )
    if group_field:
        groups = sorted({r.get(group_field) for r in rows if group_field in r}, key=str)
        summary["per_group"] = {
            g: summarize_runtime([r for r in rows if r.get(group_field) == g])
            for g in groups
        }
    return summary


def summarize_prompt_stat(rows: list[dict]) -> dict:
    return {
        "n": len(rows),
        "visual_merged_ratio": _mean(rows, "visual_merged_ratio"),
        "input_merged_ratio": _mean(rows, "input_merged_ratio"),
    }


def append_jsonl(path: str, record: dict):
    with open(path, "a") as fp:
        fp.write(json.dumps(record) + "\n")
        fp.flush()


def read_jsonl(path: str) -> list[dict]:
    import os

    if not os.path.exists(path):
        return []
    out = []
    with open(path) as fp:
        for line in fp:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out
