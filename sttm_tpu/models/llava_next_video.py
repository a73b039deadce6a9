"""LLaVA-NeXT-Video FrameFusion front-end (CLIP + pooling + token types).

Behavioral port of the reference's LLaVA-NeXT-Video hook
(framefusion/models/llava_next_video/modeling_llava_next_video.py:9-240):
video frames go through the CLIP tower (models/clip.py, hidden_states[-2]
patch features), a stride-2 spatial average pool (the vision resampler,
:232 ``vision_resampler.pool``; models/resampler.py:spatial_pool), and the
multimodal projector; the features replace the ``<video>`` placeholder in the
token embeddings; and a per-token **token-type stream** is derived for
FrameFusion (:230-237): text = -1, video tokens get their FRAME index
(0..n_frames-1, each repeated token_per_frame times) — note this is a
different grouping convention than MiniCPM-V's position-within-frame types;
FrameFusion then merges consecutive similar tokens *within* a frame.

The LM trunk is Llama-architecture (Vicuna-7B — config.py VICUNA_7B,
attention_bias=False); FrameFusion runs through runtime/framefusion.py with
the explicit ``patch_type`` layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import qwen2
from .clip import ClipConfig, clip_encode
from .resampler import spatial_pool

__all__ = [
    "VIDEO_TOKEN_INDEX",
    "encode_video_frames_clip",
    "llava_next_video_token_types",
    "build_lnv_embeds",
    "framefusion_spec_lnv",
]

VIDEO_TOKEN_INDEX = -200  # shares LLaVA's IMAGE_TOKEN_INDEX placeholder ID


def encode_video_frames_clip(
    clip_params: dict,
    ccfg: ClipConfig,
    mm_params: dict,
    pixels: jnp.ndarray,
    pool_stride: int = 2,
    pool_mode: str = "average",
) -> jnp.ndarray:
    """[T, H, W, 3] preprocessed frames -> [T * tokens_per_frame, D_text].

    CLIP patch features (select_layer=-2, 'patch') -> spatial pool (the
    vision resampler) -> mlp2x_gelu projector weights in ``mm_params``
    ({"w1","b1","w2","b2"}). token_per_frame = num_patches // stride**2
    (modeling_llava_next_video.py:232).
    """
    feats = clip_encode(clip_params, ccfg, pixels, select_feature="patch")
    side = ccfg.patches_per_side
    feats = spatial_pool(feats, side, side, pool_stride, pool_mode)
    x = feats.astype(jnp.float32)
    x = jax.nn.gelu(x @ mm_params["w1"] + mm_params["b1"], approximate=False)
    x = x @ mm_params["w2"] + mm_params["b2"]
    t, n, d = x.shape
    return x.reshape(t * n, d)


def llava_next_video_token_types(
    seq_len: int, video_start: int, n_frames: int, token_per_frame: int
):
    """Per-token types: -1 text, frame index over the video span
    (modeling_llava_next_video.py:230-237). Returns int64 [seq_len]."""
    n_video = n_frames * token_per_frame
    if video_start + n_video > seq_len:
        raise ValueError(f"video span exceeds sequence {seq_len}")
    tt = np.full((seq_len,), -1, np.int64)
    tt[video_start : video_start + n_video] = np.arange(n_frames).repeat(token_per_frame)
    return tt


def build_lnv_embeds(
    decoder_params: dict,
    input_ids,
    video_feats: jnp.ndarray,
    s_full: int,
    dtype=jnp.bfloat16,
    cfg=None,
):
    """Replace the single VIDEO_TOKEN_INDEX placeholder with video features
    (the reference's _merge_input_ids_with_image_features for bs=1,
    modeling_llava_next_video.py:176-226). video_feats: [N_video, D].
    Returns (embeds [1, s_full, D], valid_len, video_start)."""
    ids = np.asarray(input_ids).reshape(-1)
    pos = np.nonzero(ids == VIDEO_TOKEN_INDEX)[0]
    if len(pos) != 1:
        raise ValueError(f"expected exactly one video token, got {len(pos)}")
    p = int(pos[0])
    pre, post = ids[:p], ids[p + 1 :]
    pre_e = qwen2.embed_tokens(decoder_params, jnp.asarray(pre, jnp.int32), cfg)
    post_e = qwen2.embed_tokens(decoder_params, jnp.asarray(post, jnp.int32), cfg)
    video = jnp.asarray(video_feats, pre_e.dtype)
    valid = len(pre) + video.shape[0] + len(post)
    if valid > s_full:
        raise ValueError(f"sequence {valid} exceeds buffer {s_full}")
    seq = jnp.concatenate([pre_e, video, post_e], axis=0)
    seq = jnp.pad(seq, ((0, s_full - valid), (0, 0))).astype(dtype)
    return seq[None], valid, len(pre)


def framefusion_spec_lnv(
    cost: float, s_full: int, video_start: int, n_frames: int, token_per_frame: int, **kw
):
    """FrameFusionSpec with the LLaVA-NeXT-Video frame-index token types."""
    from ..runtime.framefusion import FrameFusionSpec

    tt = llava_next_video_token_types(s_full, video_start, n_frames, token_per_frame)
    return FrameFusionSpec(cost=cost, patch_type=tuple(int(v) for v in tt), **kw)
