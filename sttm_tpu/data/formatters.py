"""Per-benchmark MCQ prompt formatters.

Behavioral port of the reference formatters
(llava/eval/eval_utils.py:209-403): every benchmark shares the template

    {option_prompt}\n{question}\n{options}\n The best answer is:

with benchmark-specific letter ranges and option prefixing. Output dicts keep
the reference's keys so downstream metrics/harness code lines up.
"""

from __future__ import annotations

_POST_PROMPT = "The best answer is:"
_BASE = (
    "Select the best answer to the following multiple-choice question based "
    "on the video and the subtitles. Respond with only the letter {letters} "
    "of the correct option."
)

_LETTERS = ["A", "B", "C", "D", "E", "F"]


def _assemble(option_prompt: str, question: str, option_block: str) -> str:
    return option_prompt + "\n" + question + "\n" + option_block + "\n" + _POST_PROMPT


def _mcq_entry(qid, vid, question, options, answer, option_prompt, prefixed, extra=None):
    if prefixed:
        block = "\n".join(f"{_LETTERS[i]}. {opt}" for i, opt in enumerate(options))
    else:  # annotations already carry "A. ..." prefixes (videomme/vnbench)
        block = "\n".join(str(opt) for opt in options)
    data = {
        "qid": qid,
        "vid": vid,
        "video_filepath": f"{vid}.mp4",
        "conversations": _assemble(option_prompt, question, block),
        "answer": answer,
        "question": question,
        "options": options,
    }
    if extra:
        data.update(extra)
    return data


def format_videomme(data_list, answer_flag=False):
    prompt = _BASE.format(letters="(A, B, C, or D)")
    return [
        _mcq_entry(
            a["question_id"], a["videoID"], a["question"], a["options"],
            a["answer"] if answer_flag else None, prompt, prefixed=False,
        )
        for a in data_list
    ]


def format_vnbench(data_list, answer_flag=False):
    prompt = _BASE.format(letters="(A, B, C, or D)")
    return [
        _mcq_entry(
            a["question_id"], a["videoID"], a["question"], a["options"],
            a["answer"] if answer_flag else None, prompt, prefixed=False,
            extra={"try": a["try"], "needle_time": a["needle_time"]},
        )
        for a in data_list
    ]


def format_egoschema(data_list, answer_flag=False):
    prompt = _BASE.format(letters="(A, B, C, D, or E)")
    has_answer = bool(data_list) and "answer" in data_list[0]
    return [
        _mcq_entry(
            a["q_uid"], a["q_uid"], a["question"],
            [a[f"option {i}"] for i in range(5)],
            a["answer"] if answer_flag and has_answer else "", prompt, prefixed=True,
        )
        for a in data_list
    ]


def format_lvb(data_list, answer_flag=False):
    out = []
    choice_txt = ["", "", "(A, B, or C)", "(A, B, C, or D)", "(A, B, C, D, or E)", "(A, B, C, D, E, or F)"]
    for a in data_list:
        prompt = _BASE.format(letters=choice_txt[len(a["options"])])
        out.append(
            _mcq_entry(
                a["question_id"], a["videoID"], a["question"], a["options"],
                a["answer"] if answer_flag else None, prompt, prefixed=True,
            )
        )
    return out


def format_nextqa_mcq(data_list, answer_flag=False):
    prompt = _BASE.format(letters="(A, B, C, D, or E)")
    has_answer = bool(data_list) and "answer" in data_list[0]
    return [
        _mcq_entry(
            a["question_id"], a["video_id"], a["question"], a["options"],
            a["answer"] if answer_flag and has_answer else "", prompt, prefixed=True,
        )
        for a in data_list
    ]


def format_mlvu_mcq(data_list, answer_flag=False):
    prompt = _BASE.format(letters="(A, B, C, or D)")
    has_answer = bool(data_list) and "answer" in data_list[0]
    return [
        _mcq_entry(
            a["question_id"], a["video_id"], a["question"], a["options"],
            a["answer"] if answer_flag and has_answer else "", prompt, prefixed=True,
        )
        for a in data_list
    ]


FORMATTERS = {
    "videomme": format_videomme,
    "vnbench": format_vnbench,
    "egoschema": format_egoschema,
    "lvb-val": format_lvb,
    "lvb-test": format_lvb,
    "nextqa-mcq": format_nextqa_mcq,
    "mlvu-mcq": format_mlvu_mcq,
}
