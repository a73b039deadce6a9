"""SFT dataset preprocessing (the reference training stack's data path).

Behavioral port of LazySupervisedDataset + preprocess_qwen
(llava/train/train.py:614-688, 1009-1343): conversations are rendered with
the Qwen chat template ``<|im_start|>role\\ncontent<|im_end|>\\n``; system and
user spans are masked to IGNORE_INDEX, assistant spans are supervised, and
the newline / im_start / im_end tokens are unmasked everywhere (train.py:
628,674-676). ``<image>`` placeholders become IMAGE_TOKEN_INDEX (-200).
"""

from __future__ import annotations

import json

import numpy as np

from ..models.llava import IMAGE_TOKEN_INDEX

__all__ = ["IGNORE_INDEX", "preprocess_qwen_chat", "SFTDataset", "pad_collate"]

IGNORE_INDEX = -100
DEFAULT_IMAGE_TOKEN = "<image>"


def _encode_with_image(text: str, tokenizer) -> list[int]:
    parts = text.split(DEFAULT_IMAGE_TOKEN)
    ids: list[int] = []
    for i, part in enumerate(parts):
        if i > 0:
            ids.append(IMAGE_TOKEN_INDEX)
        if part:
            ids.extend(tokenizer.encode(part, add_special_tokens=False))
    return ids


def preprocess_qwen_chat(
    conversations: list[dict],
    tokenizer,
    system_message: str = "You are a helpful assistant.",
    unmask_token_ids: tuple = (),
):
    """-> (input_ids, labels) lists. ``conversations``: [{"from"/"role":
    "human"|"user"|"gpt"|"assistant", "value"/"content": str}, ...].

    ``unmask_token_ids``: ids kept supervised even inside masked spans (the
    reference unmasks "\\n" + im_start/im_end, train.py:628). Image
    placeholders are never supervised.
    """
    roles = {"human": "user", "gpt": "assistant"}
    msgs = []
    for conv in conversations:
        role = conv.get("role", conv.get("from"))
        content = conv.get("content", conv.get("value"))
        msgs.append({"role": roles.get(role, role), "content": content})
    if msgs and msgs[0]["role"] != "user":
        msgs = msgs[1:]

    input_ids: list[int] = []
    labels: list[int] = []

    def add(role: str, content: str, supervised: bool):
        seg = _encode_with_image(
            f"<|im_start|>{role}\n{content}<|im_end|>\n", tokenizer
        )
        input_ids.extend(seg)
        for tok in seg:
            if tok == IMAGE_TOKEN_INDEX:
                labels.append(IGNORE_INDEX)
            elif supervised or tok in unmask_token_ids:
                labels.append(tok)
            else:
                labels.append(IGNORE_INDEX)

    add("system", system_message, supervised=False)
    for m in msgs:
        add(m["role"], m["content"], supervised=m["role"] == "assistant")
    return input_ids, labels


class SFTDataset:
    """Lazy dataset over a llava-format annotation JSON: a list of
    {"conversations": [...], optional "video"/"image" keys}. Feature loading
    is the harness's job; this dataset yields token/label pairs plus the
    media key so trainers can splice features (train.py:1009-1343)."""

    def __init__(self, data_path: str, tokenizer, max_len: int = 2048,
                 system_message: str = "You are a helpful assistant."):
        with open(data_path) as fp:
            self.data = json.load(fp)
        self.tokenizer = tokenizer
        self.max_len = max_len
        self.system_message = system_message

    def __len__(self):
        return len(self.data)

    def lengths(self) -> list[int]:
        """Token lengths for the length-grouped sampler (approximated by
        conversation text length, like the reference's modality lengths)."""
        return [
            min(sum(len(str(c.get("value", c.get("content", "")))) for c in d["conversations"]) // 4 + 1,
                self.max_len)
            for d in self.data
        ]

    def __getitem__(self, idx: int) -> dict:
        d = self.data[idx]
        ids, labels = preprocess_qwen_chat(
            d["conversations"], self.tokenizer, self.system_message
        )
        ids, labels = ids[: self.max_len], labels[: self.max_len]
        return {
            "input_ids": ids,
            "labels": labels,
            "media": d.get("video", d.get("image")),
            "id": d.get("id", idx),
        }


def pad_collate(batch: list[dict], pad_to: int, pad_id: int = 0):
    """-> (input_ids [B, pad_to] int32, labels [B, pad_to] int32). Image
    placeholders are replaced by pad_id at the trunk input (text-only
    training path; multimodal splicing replaces them upstream)."""
    b = len(batch)
    ids = np.full((b, pad_to), pad_id, np.int32)
    labels = np.full((b, pad_to), IGNORE_INDEX, np.int32)
    for i, s in enumerate(batch):
        n = min(len(s["input_ids"]), pad_to)
        row = np.asarray(s["input_ids"][:n], np.int32)
        row = np.where(row == IMAGE_TOKEN_INDEX, pad_id, row)
        ids[i, :n] = row
        labels[i, :n] = np.asarray(s["labels"][:n], np.int32)
    return ids, labels
