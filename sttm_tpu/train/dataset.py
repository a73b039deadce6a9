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

__all__ = [
    "IGNORE_INDEX", "preprocess_qwen_chat", "preprocess_vicuna_v1",
    "preprocess_llama_2", "preprocess_gemma", "preprocess_llama3",
    "PREPROCESSORS", "SFTDataset", "pad_collate", "mm_collate",
]

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


VICUNA_SYSTEM = (
    "A chat between a curious user and an artificial intelligence assistant. "
    "The assistant gives helpful, detailed, and polite answers to the user's "
    "questions."
)


def preprocess_vicuna_v1(
    conversations: list[dict],
    tokenizer,
    system_message: str = VICUNA_SYSTEM,
    unmask_token_ids: tuple = (),
):
    """Vicuna v1 template (SeparatorStyle.TWO): ``{system} USER: {q}
    ASSISTANT: {a}</s>`` per round — the reference's preprocess_v1
    (llava/train/train.py:776-851) over conv_vicuna_v1
    (llava/conversation.py:345-354, sep=" ", sep2="</s>").

    The reference masks by token-count arithmetic over the rendered string
    (train.py:813-841, with the -2/-1 BOS offsets of its sentencepiece
    tokenizer); this port applies the same *semantics* segment-wise —
    system + user turns + the "ASSISTANT:" role header masked, answer +
    trailing sep2 supervised — which transfers across tokenizers. Used by
    the Vicuna config family (models/config.py VICUNA_7B).
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

    def add(text: str, supervised: bool):
        seg = _encode_with_image(text, tokenizer)
        input_ids.extend(seg)
        for tok in seg:
            if tok == IMAGE_TOKEN_INDEX:
                labels.append(IGNORE_INDEX)
            elif supervised or tok in unmask_token_ids:
                labels.append(tok)
            else:
                labels.append(IGNORE_INDEX)

    add(system_message + " ", supervised=False)
    for m in msgs:
        if m["role"] == "user":
            add(f"USER: {m['content']} ", supervised=False)
        else:
            add("ASSISTANT: ", supervised=False)
            add(f"{m['content']}</s>", supervised=True)
    return input_ids, labels


LLAMA2_SYSTEM = (
    "You are a helpful, respectful and honest assistant. Always answer as "
    "helpfully as possible, while being safe.  Your answers should not "
    "include any harmful, unethical, racist, sexist, toxic, dangerous, or "
    "illegal content. Please ensure that your responses are socially "
    "unbiased and positive in nature.\n\nIf a question does not make any "
    "sense, or is not factually coherent, explain why instead of answering "
    "something not correct. If you don't know the answer to a question, "
    "please don't share false information."
)


def _roles_msgs(conversations):
    roles = {"human": "user", "gpt": "assistant"}
    msgs = []
    for conv in conversations:
        role = conv.get("role", conv.get("from"))
        content = conv.get("content", conv.get("value"))
        msgs.append({"role": roles.get(role, role), "content": content})
    if msgs and msgs[0]["role"] != "user":
        msgs = msgs[1:]
    return msgs


def _segment_preprocess(segments, tokenizer, unmask_token_ids=()):
    """Render (text, supervised) segments to (input_ids, labels) with image
    placeholders never supervised — the shared core of every template port."""
    input_ids: list[int] = []
    labels: list[int] = []
    for text, supervised in segments:
        seg = _encode_with_image(text, tokenizer)
        input_ids.extend(seg)
        for tok in seg:
            if tok == IMAGE_TOKEN_INDEX:
                labels.append(IGNORE_INDEX)
            elif supervised or tok in unmask_token_ids:
                labels.append(tok)
            else:
                labels.append(IGNORE_INDEX)
    return input_ids, labels


def preprocess_llama_2(
    conversations: list[dict],
    tokenizer,
    system_message: str = LLAMA2_SYSTEM,
    unmask_token_ids: tuple = (),
):
    """Llama-2 chat template (SeparatorStyle.LLAMA_2): per round
    ``<s>[INST] {q} [/INST] {a} </s>`` with ``<<SYS>>`` wrapping the system
    prompt into the first instruction — the reference's preprocess_llama_2
    (llava/train/train.py:614-699 over conv_llama_2,
    llava/conversation.py:142-160). Instruction segments (incl. "[/INST] ")
    are masked; answers + their trailing " </s>" are supervised."""
    msgs = _roles_msgs(conversations)
    wrap_sys = f"<<SYS>>\n{system_message}\n<</SYS>>\n\n" if system_message else ""
    segments = []
    for i, m in enumerate(msgs):
        if m["role"] == "user":
            content = (wrap_sys + m["content"]) if i == 0 else m["content"]
            segments.append((f"<s>[INST] {content} [/INST]", False))
        else:
            segments.append((f" {m['content']} </s>", True))
    return _segment_preprocess(segments, tokenizer, unmask_token_ids)


def preprocess_gemma(
    conversations: list[dict],
    tokenizer,
    system_message: str = "",
    unmask_token_ids: tuple = (),
):
    """Gemma instruct template (SeparatorStyle.GEMMA): per turn
    ``<start_of_turn>{role}\\n{content}<end_of_turn>\\n`` with roles
    user/model and no system prompt — the reference's preprocess_gemma
    (llava/train/train.py over conv_gemma_instruct,
    llava/conversation.py:131-140,454). Model answers + their trailing
    ``<end_of_turn>\\n`` are supervised; user turns and role headers are
    masked."""
    del system_message  # conv_gemma_instruct has no system prompt
    msgs = _roles_msgs(conversations)
    segments = []
    for m in msgs:
        if m["role"] == "user":
            segments.append((f"<start_of_turn>user\n{m['content']}<end_of_turn>\n", False))
        else:
            segments.append(("<start_of_turn>model\n", False))
            segments.append((f"{m['content']}<end_of_turn>\n", True))
    return _segment_preprocess(segments, tokenizer, unmask_token_ids)


LLAMA3_SYSTEM = (
    "You are a helpful language and vision assistant. You are able to "
    "understand the visual content that the user provides, and assist the "
    "user with a variety of tasks using natural language."
)


def preprocess_llama3(
    conversations: list[dict],
    tokenizer,
    system_message: str = LLAMA3_SYSTEM,
    unmask_token_ids: tuple = (),
):
    """Llama-3 chat template: per turn
    ``<|start_header_id|>{role}<|end_header_id|>\\n\\n{content}<|eot_id|>``
    after a ``<|begin_of_text|>`` + system block — the reference's
    preprocess_llama3 (llava/train/train.py:690-780, which renders via
    apply_chat_template and masks user/system turns while unmasking the
    header/eot structural tokens). This port applies the same semantics
    segment-wise: system + user turns + the assistant role header are
    masked, the assistant content + trailing ``<|eot_id|>`` supervised;
    pass the tokenizer's structural-token ids via ``unmask_token_ids`` to
    reproduce the reference's unmask list exactly."""
    msgs = _roles_msgs(conversations)
    segments = [(
        f"<|begin_of_text|><|start_header_id|>system<|end_header_id|>\n\n"
        f"{system_message}<|eot_id|>", False)]
    for m in msgs:
        if m["role"] == "user":
            segments.append((
                f"<|start_header_id|>user<|end_header_id|>\n\n"
                f"{m['content']}<|eot_id|>", False))
        else:
            segments.append(("<|start_header_id|>assistant<|end_header_id|>\n\n",
                             False))
            segments.append((f"{m['content']}<|eot_id|>", True))
    return _segment_preprocess(segments, tokenizer, unmask_token_ids)


# conv-version dispatch (the reference's preprocess() switch,
# llava/train/train.py:1009-1035: conv version -> preprocess_* function).
# Descoped upstream versions: preprocess_mpt (train.py:855) targets the
# dead MPT family and preprocess_plain (train.py:936) the legacy
# caption-pretraining format — neither has a live model family in the
# reference's eval matrix; llama3 (the one with live models) is ported.
PREPROCESSORS = {
    "qwen": preprocess_qwen_chat,
    "v1": preprocess_vicuna_v1,
    "vicuna_v1": preprocess_vicuna_v1,
    "llama_2": preprocess_llama_2,
    "llama3": preprocess_llama3,
    "llama_v3": preprocess_llama3,
    "gemma": preprocess_gemma,
}


class SFTDataset:
    """Lazy dataset over a llava-format annotation JSON: a list of
    {"conversations": [...], optional "video"/"image" keys}. Feature loading
    is the harness's job; this dataset yields token/label pairs plus the
    media key so trainers can splice features (train.py:1009-1343)."""

    def __init__(self, data_path: str, tokenizer, max_len: int = 2048,
                 system_message: str | None = None, conv_version: str = "qwen"):
        with open(data_path) as fp:
            self.data = json.load(fp)
        self.tokenizer = tokenizer
        self.max_len = max_len
        if conv_version not in PREPROCESSORS:
            raise ValueError(
                f"unknown conv_version {conv_version!r} (have {sorted(PREPROCESSORS)})")
        self.conv_version = conv_version
        self.system_message = system_message  # None -> the template's default

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
        fn = PREPROCESSORS[self.conv_version]
        if self.system_message is None:
            ids, labels = fn(d["conversations"], self.tokenizer)
        else:
            ids, labels = fn(d["conversations"], self.tokenizer, self.system_message)
        ids, labels = ids[: self.max_len], labels[: self.max_len]
        # one modality tag per <image> placeholder, from the annotation's
        # media key (llava-format: "video" = one clip; "image" = one path or
        # a list for multi-image samples, train.py:1009-1343)
        n_ph = sum(1 for t in ids if t == IMAGE_TOKEN_INDEX)
        if "image" in d:
            modalities = ["image"] * n_ph
        elif "video" in d:
            modalities = ["video"] * n_ph
        else:
            modalities = []
        return {
            "input_ids": ids,
            "labels": labels,
            "media": d.get("video", d.get("image")),
            "modalities": modalities,
            "id": d.get("id", idx),
        }


def mm_collate(batch: list[dict], pad_to: int, n_video: int, pad_id: int = 0,
               n_image: int = 0, max_images: int | None = None):
    """Multimodal collate: expand every IMAGE_TOKEN_INDEX placeholder into
    its modality's slot count — the host-side half of the reference's
    prepare_inputs_labels_for_multimodal splice loop, which walks *all*
    sentinel occurrences per sample in order (llava/model/llava_arch.py:
    533-587); the training forward (``sft.mm_forward``) overwrites the
    slots' embeddings with projected features in-graph so gradients reach
    the projector.

    Per-sample modality tags come from ``sample["modalities"]`` (one of
    "video"/"image" per placeholder, in order — ``SFTDataset`` emits them
    from the annotation's media key). Absent tags default to a single
    video span (the round-3 behavior). Constraints: at most one video span
    per sample (a clip is one placeholder in llava-format data); any number
    of image spans up to ``max_images`` (default: the batch max), each
    expanding to ``n_image`` slots — interleaved with text and with the
    video span in placeholder order.

    -> dict(input_ids [B, pad_to] int32 (media slots = pad_id),
            labels [B, pad_to] int32 (media slots = IGNORE_INDEX),
            video_start [B] int32, has_video [B] bool
            [, image_starts [B, MI] int32, image_mask [B, MI] bool
               when n_image > 0]).
    Text-only samples get has_video False / empty image_mask (their splices
    are no-ops, like the reference's dummy 0-weight image feature path).
    """
    b = len(batch)
    ids = np.full((b, pad_to), pad_id, np.int32)
    labels = np.full((b, pad_to), IGNORE_INDEX, np.int32)
    video_start = np.zeros((b,), np.int32)
    has_video = np.zeros((b,), bool)
    img_starts: list[list[int]] = []
    for i, s in enumerate(batch):
        row = list(s["input_ids"])
        lab = list(s["labels"])
        img = [j for j, t in enumerate(row) if t == IMAGE_TOKEN_INDEX]
        mods = s.get("modalities") or ["video"] * len(img)
        if len(mods) != len(img):
            raise ValueError(
                f"sample {i}: {len(img)} image tokens but {len(mods)} modality tags")
        if mods.count("video") > 1:
            raise ValueError(
                f"sample {i}: {mods.count('video')} video placeholders (expected <= 1)")
        if "image" in mods and n_image <= 0:
            raise ValueError(
                f"sample {i}: image placeholders need n_image > 0 (tokens per image)")
        starts_i: list[int] = []
        # walk placeholders right-to-left so earlier expansions don't shift
        # later raw positions; record final (post-expansion) start offsets
        for p, mod in zip(reversed(img), reversed(mods)):
            span = n_video if mod == "video" else n_image
            row = row[:p] + [pad_id] * span + row[p + 1 :]
            lab = lab[:p] + [IGNORE_INDEX] * span + lab[p + 1 :]
        off = 0
        for p, mod in zip(img, mods):
            start = p + off
            span = n_video if mod == "video" else n_image
            if start + span > pad_to:
                raise ValueError(
                    f"sample {i}: {mod} span [{start}, {start + span}) "
                    f"exceeds pad_to={pad_to}")
            if mod == "video":
                video_start[i] = start
                has_video[i] = True
            else:
                starts_i.append(start)
            off += span - 1
        img_starts.append(starts_i)
        n = min(len(row), pad_to)
        ids[i, :n] = np.asarray(row[:n], np.int32)
        labels[i, :n] = np.asarray(lab[:n], np.int32)
    out = {
        "input_ids": ids,
        "labels": labels,
        "video_start": video_start,
        "has_video": has_video,
    }
    if n_image > 0:
        mi = max(len(x) for x in img_starts) if max_images is None else max_images
        mi = max(mi, 1)
        starts = np.zeros((b, mi), np.int32)
        mask = np.zeros((b, mi), bool)
        for i, st in enumerate(img_starts):
            if len(st) > mi:
                raise ValueError(f"sample {i}: {len(st)} images > max_images={mi}")
            starts[i, : len(st)] = st
            mask[i, : len(st)] = True
        out["image_starts"] = starts
        out["image_mask"] = mask
    return out


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
