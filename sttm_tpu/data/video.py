"""Raw-video frame sampling + per-family preprocessing.

Sampling mirrors the reference's decord pipeline (llava/utils.py:25-58):
sample at ``tgt_fps`` uniformly over the clip; if that exceeds
``frames_upbound``, fall back to ``frames_upbound`` uniformly-spaced frames;
report ``video_time`` and the "0.00s,1.00s,..." ``frame_time`` string. The
Qwen2-VL path mirrors qwen_vl_utils (smart_resize to 28-multiples
:61, smart_nframes :150, 2-frame temporal patch grouping).
"""

from __future__ import annotations

import math

import numpy as np

from .. import native

__all__ = [
    "sample_frame_times",
    "load_video_frames",
    "siglip_preprocess",
    "smart_resize",
    "smart_nframes",
    "qwen2vl_patchify",
]

# Qwen2-VL frame-count policy constants (qwen_vl_utils.py:34-37)
FRAME_FACTOR = 2
QWEN2VL_FPS = 2.0
FPS_MIN_FRAMES = 4
FPS_MAX_FRAMES = 768


def smart_nframes(
    total_frames: int,
    video_fps: float,
    fps: float | None = None,
    nframes: int | None = None,
    min_frames: int = FPS_MIN_FRAMES,
    max_frames: int | None = None,
) -> int:
    """Qwen2-VL frame-count policy (qwen_vl_utils.py:150-188): fps-based count
    clamped to [min_frames, min(max_frames, total)] and floored to a multiple
    of FRAME_FACTOR (2-frame temporal patches)."""
    if nframes is not None:
        n = round(nframes / FRAME_FACTOR) * FRAME_FACTOR
    else:
        fps = QWEN2VL_FPS if fps is None else fps
        if max_frames is None:
            max_frames = min(FPS_MAX_FRAMES, total_frames)
        min_f = math.ceil(min_frames / FRAME_FACTOR) * FRAME_FACTOR
        max_f = math.floor(max_frames / FRAME_FACTOR) * FRAME_FACTOR
        n = total_frames / video_fps * fps
        n = min(min(max(n, min_f), max_f), total_frames)
        n = math.floor(n / FRAME_FACTOR) * FRAME_FACTOR
    if not (FRAME_FACTOR <= n <= total_frames):
        raise ValueError(f"nframes should be in [{FRAME_FACTOR}, {total_frames}], got {n}")
    return int(n)


def sample_frame_times(duration: float, tgt_fps: float, frames_upbound: int):
    num = max(int(duration * tgt_fps), 1)
    if num > frames_upbound:
        times = np.linspace(0, duration, frames_upbound, endpoint=False)
    else:
        times = np.arange(num, dtype=np.float64) / tgt_fps
    frame_time = ",".join(f"{t:.2f}s" for t in times)
    return times, frame_time


def load_video_frames(path: str, tgt_fps: float, frames_upbound: int, out_w: int, out_h: int):
    """-> (frames uint8 [T, H, W, 3], metadata dict)."""
    info = native.probe(path)
    times, frame_time = sample_frame_times(info["duration"], tgt_fps, frames_upbound)
    frames, _ = native.decode_at(path, times, out_w, out_h)
    meta = {
        "video_time": info["duration"],
        "frame_time": frame_time,
        "num_frames": len(times),
        "fps": info["fps"],
    }
    return frames, meta


def siglip_preprocess(frames: np.ndarray) -> np.ndarray:
    """uint8 [T, 384, 384, 3] -> float32 normalized (mean/std 0.5, the
    reference's SigLipImageProcessor)."""
    x = frames.astype(np.float32) / 255.0
    return (x - 0.5) / 0.5


def smart_resize(h: int, w: int, factor: int = 28, min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280) -> tuple[int, int]:
    """Qwen2-VL resolution policy (qwen_vl_utils.py:61): round sides to
    multiples of ``factor`` keeping the pixel count within budget."""
    if max(h, w) / min(h, w) > 200:
        raise ValueError("absurd aspect ratio")
    h_bar = max(factor, round(h / factor) * factor)
    w_bar = max(factor, round(w / factor) * factor)
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((h * w) / max_pixels)
        h_bar = math.floor(h / beta / factor) * factor
        w_bar = math.floor(w / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (h * w))
        h_bar = math.ceil(h * beta / factor) * factor
        w_bar = math.ceil(w * beta / factor) * factor
    return h_bar, w_bar


def qwen2vl_patchify(frames: np.ndarray, patch: int = 14, tpatch: int = 2, merge: int = 2):
    """Normalized frames [T, H, W, 3] -> (patches [N, 3*tpatch*patch*patch],
    grid (t, h, w)) in the ViT's window order (modeling_qwen2vl.py PatchEmbed
    + rot_pos_emb ordering). T is padded to a multiple of tpatch by repeating
    the last frame (HF processor behavior)."""
    t, hh, ww, _ = frames.shape
    if t % tpatch:
        frames = np.concatenate([frames, frames[-1:]], axis=0)
        t += 1
    gt, gh, gw = t // tpatch, hh // patch, ww // patch
    x = frames.reshape(gt, tpatch, gh, patch, gw, patch, 3)
    # window order: (gt, gh//m, gw//m, m, m) over merged blocks
    x = x.reshape(gt, tpatch, gh // merge, merge, patch, gw // merge, merge, patch, 3)
    # -> [gt, ghm, gwm, merge_h, merge_w, 3, tpatch, patch_h, patch_w]
    x = x.transpose(0, 2, 5, 3, 6, 8, 1, 4, 7)
    patches = x.reshape(gt * gh * gw, 3 * tpatch * patch * patch)
    return patches, (gt, gh, gw)
