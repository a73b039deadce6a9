"""Annotation converters: raw benchmark releases -> the reformatted v2 JSONs.

Behavioral ports of scripts/data/format_data_{vnbench,mlvu,nextqa_mcq,
longvideobench}.py (the reference ships the converted JSONs under
sttm_annotations/). Video durations come from the native libav decoder
instead of decord; pass ``duration_fn`` to override (e.g. in tests or when
videos are unavailable).
"""

from __future__ import annotations

import json
import os
import string

__all__ = [
    "duration_category",
    "convert_vnbench",
    "convert_mlvu",
    "convert_nextqa_mcq",
    "convert_longvideobench",
]

_LETTERS = string.ascii_uppercase


def duration_category(seconds: float) -> str:
    if seconds < 60:
        return "short"
    if seconds < 120:
        return "medium"
    return "long"


def _probe_duration(video_root: str):
    from .. import native

    def fn(vid: str) -> float:
        return native.probe(os.path.join(video_root, f"{vid}.mp4"))["duration"]

    return fn


def _letter(answer) -> str:
    if isinstance(answer, int):
        return _LETTERS[answer]
    return str(answer)


def convert_vnbench(annos: list[dict], duration_fn=None, video_root: str = "") -> list[dict]:
    """VNBench-main-4try.json -> v2 (format_data_vnbench.py:26-47)."""
    duration_fn = duration_fn or _probe_duration(video_root)
    out = []
    for a in annos:
        vid = a["video"].split("/")[-1].replace(".mp4", "")
        sec = duration_fn(vid)
        out.append({
            "videoID": vid,
            "question_id": f"{vid}_try{a['try']}",
            "question": a["question"],
            "options": [f"{_LETTERS[i]}. {o}." for i, o in enumerate(a["options"])],
            "answer": _letter(a["gt_option"]),
            "try": a["try"],
            "needle_time": a.get("needle_time"),
            "task_type": a["type"],
            "video_second": sec,
            "duration": duration_category(sec),
        })
    return out


def convert_mlvu(annos: list[dict], task_type: str, duration_fn=None, video_root: str = "") -> list[dict]:
    """MLVU per-task json -> v2 (format_data_mlvu.py): video ids prefixed
    with the task type; answers mapped to letters via candidate index."""
    duration_fn = duration_fn or _probe_duration(video_root)
    out = []
    counts: dict[str, int] = {}
    for a in annos:
        vid = f"{task_type}-" + a["video"].replace(".mp4", "")
        counts[vid] = counts.get(vid, 0) + 1
        idx = a["candidates"].index(a["answer"])
        sec = duration_fn(vid)
        out.append({
            "video_id": vid,
            "question_id": f"{vid}-{counts[vid]}",
            "question": a["question"],
            "options": list(a["candidates"]),
            "answer": _LETTERS[idx],
            "task_type": task_type,
            "video_second": sec,
            "duration": duration_category(sec),
        })
    return out


def convert_nextqa_mcq(records: list[dict], duration_fn=None, video_root: str = "") -> list[dict]:
    """NExT-QA MC records (parquet rows as dicts with video/qid/question/
    a0..a4/answer/type) -> v2 (format_data_nextqa_mcq.py:30-58)."""
    duration_fn = duration_fn or _probe_duration(video_root)
    out = []
    for a in records:
        vid = str(a["video"])
        sec = duration_fn(vid)
        out.append({
            "video_id": vid,
            "question_id": f"{a['video']}_{a['qid']}",
            "question": a["question"],
            "options": [a[f"a{i}"] for i in range(5)],
            "answer": _LETTERS[int(a["answer"])],
            "type": a["type"],
            "task_type": a["type"],
            "video_second": sec,
            "duration": duration_category(sec),
        })
    return out


def convert_longvideobench(annos: list[dict]) -> list[dict]:
    """lvb_{val,test_wo_gt}.json -> v2 (format_data_longvideobench.py:11-35);
    ids containing '@' keep only the segment after the last '-'."""
    out = []
    for a in annos:
        vid, qid = a["video_id"], a["id"]
        if "@" in a["video_id"]:
            vid = vid.split("-")[-1]
            qid = qid.split("-")[-1]
        rec = {
            "videoID": vid,
            "question_id": qid,
            "duration_group": a["duration_group"],
            "duration": a["duration_group"],
            "task_type": a["question_category"],
            "question_category": a["question_category"],
            "question": a["question"],
            "options": list(a["candidates"]),
        }
        if "correct_choice" in a:
            rec["answer"] = _letter(a["correct_choice"])
        out.append(rec)
    return out


def write_json(records: list[dict], path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fp:
        json.dump(records, fp, indent=2)
