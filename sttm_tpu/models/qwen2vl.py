"""Qwen2-VL decoder-side specifics: M-RoPE position construction and
video-token embedding assembly.

Behavioral port of the vendored reference modeling
(llava/model/qwen2vl/modeling_qwen2vl.py): ``get_rope_index`` builds 3-row
(t/h/w) positions for the vision span and sequential positions for text
(:1452-1581); decode steps use ``cache_position + rope_deltas`` (:1779-1787).
The eval harness assembles input embeddings by scattering cached video
features over the ``<|video_pad|>`` placeholder tokens
(eval_vidqa_by_feat_qwen2vl.py:161-165).

The trunk itself is sttm_tpu.models.qwen2 with cfg.mrope_section set
(QWEN2VL_7B) — same weights layout under the "model." prefix.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from . import qwen2

__all__ = [
    "VISION_START_TOKEN_ID",
    "VIDEO_PAD_TOKEN_ID",
    "IMAGE_PAD_TOKEN_ID",
    "build_video_mrope_positions",
    "assemble_video_embeds",
]

# Qwen2-VL special tokens (tokenizer_config of Qwen/Qwen2-VL-7B-Instruct)
VISION_START_TOKEN_ID = 151652
IMAGE_PAD_TOKEN_ID = 151655
VIDEO_PAD_TOKEN_ID = 151656


def build_video_mrope_positions(
    pre_len: int, t: int, h: int, w: int, post_len: int, s_full: int
):
    """M-RoPE positions for [text_pre | video(t*h*w) | text_post] prompts.

    Returns (position_ids [3, s_full] int32, rope_delta int). Text rows are
    equal and sequential; the video span gets (t, y, x) offsets from the text
    start; post-video text resumes at max(video position) + 1
    (get_rope_index, modeling_qwen2vl.py:1452-1581). rope_delta =
    (max position + 1) - valid_len, the decode-position correction
    (:1779-1787). Padding positions continue sequentially (masked anyway).
    """
    nv = t * h * w
    valid = pre_len + nv + post_len
    pos = np.zeros((3, s_full), dtype=np.int32)
    pos[:, :pre_len] = np.arange(pre_len, dtype=np.int32)[None]

    st = pre_len
    tt = np.repeat(np.arange(t, dtype=np.int32), h * w)
    yy = np.tile(np.repeat(np.arange(h, dtype=np.int32), w), t)
    xx = np.tile(np.arange(w, dtype=np.int32), t * h)
    pos[0, st : st + nv] = st + tt
    pos[1, st : st + nv] = st + yy
    pos[2, st : st + nv] = st + xx

    vid_max = st + max(t, h, w) - 1
    post = np.arange(s_full - st - nv, dtype=np.int32) + vid_max + 1
    pos[:, st + nv :] = post[None]

    delta = int(pos[:, valid - 1].max() + 1 - valid)
    return jnp.asarray(pos), delta


def assemble_video_embeds(decoder_params, input_ids, video_feats, s_full: int, cfg=None):
    """Embed a Qwen2-VL prompt whose ``<|video_pad|>`` run carries the video.

    input_ids: full token list where the video span is VIDEO_PAD_TOKEN_ID
    repeated t*h*w times. video_feats: [n_video, D] (post vision-merger
    features). Returns (embeds [1, s_full, D], valid_len, video_start,
    n_video), mirroring the harness-side masked_scatter
    (eval_vidqa_by_feat_qwen2vl.py:161-165).
    """
    ids = np.asarray(input_ids).reshape(-1)
    pad_pos = np.nonzero(ids == VIDEO_PAD_TOKEN_ID)[0]
    n_video = len(pad_pos)
    if n_video != video_feats.shape[0]:
        raise ValueError(f"{n_video} video-pad tokens vs {video_feats.shape[0]} features")
    if n_video and not (pad_pos[-1] - pad_pos[0] + 1 == n_video):
        raise ValueError("video-pad tokens must be contiguous")
    video_start = int(pad_pos[0]) if n_video else 0

    safe_ids = np.where(ids == VIDEO_PAD_TOKEN_ID, 0, ids)
    emb = qwen2.embed_tokens(decoder_params, jnp.asarray(safe_ids, jnp.int32), cfg)
    emb = emb.at[video_start : video_start + n_video].set(
        video_feats.astype(emb.dtype)
    )
    valid = len(ids)
    if valid > s_full:
        raise ValueError(f"sequence {valid} exceeds buffer {s_full}")
    emb = jnp.pad(emb, ((0, s_full - valid), (0, 0)))
    return emb[None], valid, video_start, n_video
