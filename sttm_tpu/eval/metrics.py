"""Accuracy metrics: MCQ letter extraction + grouped accuracy.

Behavioral port of the reference metric family (llava/eval/metric_*.py):
strip known answer prefixes, regex the first option letter, exact-match
against gt, report total + per-group accuracy (duration/domain/task groupings
per benchmark: metric_videomme.py:173-208, metric_vnbench.py:14-24 with its 9
needle task types). EgoSchema emits a submission mapping instead
(metric_egoschema.py:138-150).
"""

from __future__ import annotations

import json
import re

__all__ = ["extract_letter", "grouped_accuracy", "evaluate_predictions", "BENCHMARK_GROUPS"]

_ANSWER_PREFIXES = [
    "The best answer is",
    "The correct answer is",
    "The answer is",
    "The answer",
    "The best option is" "The correct option is",  # reference quirk: missing commas
    "Best answer:" "Best option:",
    "Answer:",
    "Option:",
    "The correct answer",
    "The correct option",
]

VNBENCH_TASKS = [
    "ret_insert1", "ret_insert2", "ord_insert1", "ord_insert2",
    "cnt_edit1", "cnt_edit2", "ret_edit1", "ord_edit1", "cnt_insert1",
]

BENCHMARK_GROUPS = {
    "videomme": ["duration", "domain", "task_type"],
    "vnbench": ["duration", "task_type"],
    "lvb-val": ["duration_group", "question_category"],
    "lvb-test": ["duration_group", "question_category"],
    "mlvu-mcq": ["task_type"],
    "nextqa-mcq": ["type"],
    "egoschema": [],
}

_LETTER_RANGE = {
    "videomme": "ABCD",
    "vnbench": "ABCD",
    "mlvu-mcq": "ABCD",
    "nextqa-mcq": "ABCDE",
    "egoschema": "ABCDE",
    "lvb-val": "ABCDEF",
    "lvb-test": "ABCDEF",
}


def extract_letter(s: str, letters: str = "ABCD") -> str:
    s = s.strip()
    for prefix in _ANSWER_PREFIXES:
        s = s.replace(prefix, "")
    if len(s.split()) > 10 and not re.search(f"[{letters}]", s):
        return ""
    m = re.search(f"[{letters}]", s)
    return m[0] if m else ""


def grouped_accuracy(rows: list[dict], group_fields: list[str]):
    """rows: dicts with 'correct' bool + group fields. Returns (total_acc,
    {field: {value: acc}}) with -1 for empty groups (reference get_acc)."""

    def acc(sub):
        return 100.0 * sum(r["correct"] for r in sub) / len(sub) if sub else -1.0

    per_group = {}
    for field in group_fields:
        values = sorted({r.get(field) for r in rows if r.get(field) is not None}, key=str)
        per_group[field] = {v: acc([r for r in rows if r.get(field) == v]) for v in values}
    return acc(rows), per_group


def evaluate_predictions(dataset_name: str, preds: list[dict], gts: list[dict] | None = None):
    """preds: [{question_id, answer (model text), gt (letter)}]; gts: raw
    annotation dicts for grouping (joined on question_id). Returns a result
    dict; for egoschema, returns {'submission': {qid: option_idx}}."""
    letters = _LETTER_RANGE[dataset_name]
    if dataset_name == "egoschema":
        sub = {}
        for p in preds:
            letter = extract_letter(p["answer"], letters)
            sub[p["question_id"]] = letters.index(letter) if letter else -1
        return {"submission": sub}

    gt_by_id = {}
    for g in gts or []:
        key = g.get("question_id", g.get("q_uid"))
        gt_by_id[key] = g
    rows = []
    for p in preds:
        parsed = extract_letter(p["answer"], letters)
        row = dict(gt_by_id.get(p["question_id"], {}))
        row.update(p)
        row["parsed_answer"] = parsed
        row["correct"] = parsed == p.get("gt")
        row["answered"] = parsed != ""
        rows.append(row)
    total, per_group = grouped_accuracy(rows, BENCHMARK_GROUPS[dataset_name])
    return {
        "total": total,
        "per_group": per_group,
        "answered_ratio": 100.0 * sum(r["answered"] for r in rows) / max(len(rows), 1),
        "n": len(rows),
    }


def write_metrics_csv(result: dict, path: str, model_name: str = ""):
    """Flat CSV mirroring the reference's metrics/ output layout."""
    cols, vals = ["model", "total"], [model_name, f"{result['total']:.2f}"]
    for field, groups in result.get("per_group", {}).items():
        for value, acc in groups.items():
            cols.append(f"{field}:{value}")
            vals.append(f"{acc:.2f}")
    with open(path, "w") as fp:
        fp.write(",".join(map(str, cols)) + "\n")
        fp.write(",".join(map(str, vals)) + "\n")
