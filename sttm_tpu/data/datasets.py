"""Feature-based video-QA dataset (the reference's main eval input path).

Behavioral port of VidQA_Loader_Feature (llava/eval/video_dataset.py:299-401):
loads per-video cached vision features ``{vid}.pt``/``{vid}.npy`` plus
``{vid}.pkl`` metadata, builds the chat prompt with the image placeholder, and
yields the (input_ids, feature, sys/inst lengths) bundle the harness feeds the
model. Supports resuming (skip answered qids, video_dataset.py:319-325),
``first_sample`` debug truncation (:316-317) and ``temporal_skip_freq``
(:328-329, frame subsampling).
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle

import numpy as np

from .chat import build_chat_prompt, build_video_message, time_instruction, tokenize_with_image
from .formatters import FORMATTERS

__all__ = ["DataConfig", "FeatureVidQADataset", "load_annotations"]


@dataclasses.dataclass
class DataConfig:
    dataset_name: str
    anno_filepath: str
    feature_dir: str
    metadata_dir: str
    add_time_instruction: bool = False
    answer_flag: bool = True
    first_sample: bool = False
    temporal_skip_freq: int = -1


def load_annotations(dataset_name: str, anno_filepath: str, answer_flag: bool = True):
    with open(anno_filepath) as fp:
        raw = json.load(fp)
    fmt = FORMATTERS[dataset_name]
    return fmt(raw, answer_flag=answer_flag)


def _load_feature(feature_dir: str, vid: str) -> np.ndarray:
    pt = os.path.join(feature_dir, f"{vid}.pt")
    npy = os.path.join(feature_dir, f"{vid}.npy")
    if os.path.exists(npy):
        return np.load(npy)
    if os.path.exists(pt):
        import torch

        return torch.load(pt, weights_only=True, map_location="cpu").float().numpy()
    raise FileNotFoundError(f"no cached feature for {vid} in {feature_dir}")


class RawVideoVidQADataset:
    """Raw-video variant (VidQA_Loader_Video, video_dataset.py:147-296):
    decodes + samples frames per question with the native libav decoder; the
    evaluator runs the vision tower on the fly. Frames for a video are cached
    across consecutive questions (the reference keeps an LRU frame cache)."""

    def __init__(self, cfg: DataConfig, tokenizer, video_dir: str, tgt_fps: float,
                 frames_upbound: int, image_size: int = 384, skip_qids=()):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.video_dir = video_dir
        self.tgt_fps = tgt_fps
        self.frames_upbound = frames_upbound
        self.image_size = image_size
        data = load_annotations(cfg.dataset_name, cfg.anno_filepath, cfg.answer_flag)
        skip = set(skip_qids)
        self.data = [d for d in data if d["qid"] not in skip]
        if cfg.first_sample:
            self.data = self.data[:1]
        self._cache_vid = None
        self._cache = None

    def __len__(self):
        return len(self.data)

    def _frames(self, vid: str):
        if self._cache_vid != vid:
            from .video import load_video_frames

            path = os.path.join(self.video_dir, f"{vid}.mp4")
            self._cache = load_video_frames(
                path, self.tgt_fps, self.frames_upbound, self.image_size, self.image_size
            )
            self._cache_vid = vid
        return self._cache

    def __getitem__(self, idx: int) -> dict:
        d = self.data[idx]
        frames, meta = self._frames(d["vid"])
        ti = None
        if self.cfg.add_time_instruction:
            ti = time_instruction(meta["video_time"], meta["num_frames"], meta["frame_time"])
        message = build_video_message(d["conversations"], ti)
        prompt = build_chat_prompt(message)
        input_ids, sys_len, inst_len = tokenize_with_image(prompt, self.tokenizer)
        return {
            "input_ids": input_ids,
            "frames": frames,  # uint8 [T, H, W, 3]
            "modality": "video",
            "id": d["qid"],
            "vid": d["vid"],
            "sys_len": sys_len,
            "inst_len": inst_len,
            "frame_len": len(frames),
            "answer": str(d["answer"]) if self.cfg.answer_flag else "",
            "instruction": message,
        }

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


class Qwen2VLFeatureDataset:
    """Feature-based dataset for Qwen2-VL (VidQA_Loader_Feature_Qwen2VL,
    video_dataset.py:404-496): cached post-merger features [t, gh/2, gw/2, C]
    + grid metadata; the ``<|video_pad|>`` placeholder expands to
    grid.prod() / merge_size^2 tokens (:482-496)."""

    VISION_START = 151652
    VISION_END = 151653
    VIDEO_PAD = 151656

    def __init__(self, cfg: DataConfig, tokenizer, skip_qids=()):
        self.cfg = cfg
        self.tokenizer = tokenizer
        data = load_annotations(cfg.dataset_name, cfg.anno_filepath, cfg.answer_flag)
        skip = set(skip_qids)
        self.data = [d for d in data if d["qid"] not in skip]
        if cfg.first_sample:
            self.data = self.data[:1]

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx: int) -> dict:
        d = self.data[idx]
        vid = d["vid"]
        feature = _load_feature(self.cfg.feature_dir, vid)  # [t, gh/2, gw/2, C]
        meta_path = os.path.join(self.cfg.metadata_dir, f"{vid}.pkl")
        with open(meta_path, "rb") as fp:
            meta = pickle.load(fp)
        t, gh, gw = meta["video_grid_thw"]
        n_video = t * (gh // 2) * (gw // 2)

        text = d["conversations"].replace("<image>", "")
        pre = (
            "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
            "<|im_start|>user\n"
        )
        post = f"{text}<|im_end|>\n<|im_start|>assistant\n"
        pre_ids = self.tokenizer.encode(pre, add_special_tokens=False)
        post_ids = self.tokenizer.encode(post, add_special_tokens=False)
        input_ids = (
            pre_ids + [self.VISION_START] + [self.VIDEO_PAD] * n_video
            + [self.VISION_END] + post_ids
        )
        return {
            "input_ids": input_ids,
            "feature": feature.reshape(n_video, -1),
            "grid": (t, gh // 2, gw // 2),
            "modality": "video_feature",
            "id": d["qid"],
            "vid": vid,
            "sys_len": len(pre_ids) + 1,
            "inst_len": len(post_ids) + 1,
            "frame_len": t,
            "answer": str(d["answer"]) if self.cfg.answer_flag else "",
            "instruction": text,
        }

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


class FeatureVidQADataset:
    def __init__(self, cfg: DataConfig, tokenizer, skip_qids=()):
        self.cfg = cfg
        self.tokenizer = tokenizer
        data = load_annotations(cfg.dataset_name, cfg.anno_filepath, cfg.answer_flag)
        skip = set(skip_qids)
        self.data = [d for d in data if d["qid"] not in skip]
        if cfg.first_sample:
            self.data = self.data[:1]

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx: int) -> dict:
        d = self.data[idx]
        vid = d["vid"]
        feature = _load_feature(self.cfg.feature_dir, vid)
        meta_path = os.path.join(self.cfg.metadata_dir, f"{vid}.pkl")
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path, "rb") as fp:
                meta = pickle.load(fp)
        if self.cfg.temporal_skip_freq > 2:
            feature = feature[:: self.cfg.temporal_skip_freq]

        ti = None
        if self.cfg.add_time_instruction:
            ti = time_instruction(
                meta.get("video_time", 0.0), meta.get("num_frames", len(feature)),
                meta.get("frame_time", ""),
            )
        message = build_video_message(d["conversations"], ti)
        prompt = build_chat_prompt(message)
        input_ids, sys_len, inst_len = tokenize_with_image(prompt, self.tokenizer)

        return {
            "input_ids": input_ids,
            "feature": feature,
            "modality": "video_feature",
            "id": d["qid"],
            "vid": vid,
            "sys_len": sys_len,
            "inst_len": inst_len,
            "frame_len": len(feature),
            "answer": str(d["answer"]) if self.cfg.answer_flag else "",
            "instruction": message,
        }

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
