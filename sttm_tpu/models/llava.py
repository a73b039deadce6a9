"""LLaVA meta-architecture: projector + spatial pooling + newline policy +
multimodal embedding splice.

Functional port of the reference video feature pipeline
(llava/model/llava_arch.py): encode/passthrough -> mm_projector MLP
(llava_arch.py:230-241) -> 2D pool 27x27 -> 14x14 (get_2dPool,
llava_arch.py:173-198) -> newline-token policy (:383-433) -> splice into text
embeds at the image-token position (:533-587). The "video_feature" modality
(pre-extracted SigLIP features, :317-319) skips the vision tower — the main
eval path.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from .config import DecoderConfig
from . import qwen2

__all__ = [
    "LlavaConfig",
    "init_multimodal_params",
    "project_features",
    "pool_2d",
    "apply_newline_policy",
    "build_multimodal_embeds",
    "build_multimodal_embeds_multi",
]

IMAGE_TOKEN_INDEX = -200  # reference sentinel (llava/constants.py)


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    decoder: DecoderConfig
    vision_hidden_size: int = 1152  # SigLIP-so400m
    vision_patches_per_side: int = 27  # 384px / patch 14 -> 27x27 tokens
    spatial_pool_stride: int = 2
    spatial_pool_mode: str = "bilinear"  # average | max | bilinear
    newline_position: str = "no_token"  # grid | frame | one_token | no_token
    # mm_projector type: "mlp{N}x_gelu" (multimodal_projector/builder.py:32-48)
    # or "linear"
    projector_type: str = "mlp2x_gelu"

    @property
    def projector_depth(self) -> int:
        import re

        if self.projector_type == "linear":
            return 1
        m = re.match(r"^mlp(\d+)x_gelu$", self.projector_type)
        if not m:
            raise ValueError(f"unknown projector type {self.projector_type!r}")
        return int(m.group(1))

    @property
    def pooled_side(self) -> int:
        return math.ceil(self.vision_patches_per_side / self.spatial_pool_stride)

    def tokens_per_frame(self) -> int:
        s = self.pooled_side
        if self.newline_position == "grid":
            return s * (s + 1)
        return s * s


def init_multimodal_params(cfg: LlavaConfig, key: jax.Array) -> dict:
    """mm_projector (mlp{N}x_gelu, multimodal_projector/builder.py:32-48) +
    image_newline embedding."""
    depth = cfg.projector_depth
    ks = jax.random.split(key, depth + 1)
    d_in, d = cfg.vision_hidden_size, cfg.decoder.hidden_size
    dt = cfg.decoder.dtype
    params = {"image_newline": (jax.random.normal(ks[-1], (d,)) * 0.02).astype(dt)}
    for i in range(depth):
        din = d_in if i == 0 else d
        params[f"proj_w{i + 1}"] = (jax.random.normal(ks[i], (din, d)) * din**-0.5).astype(dt)
        params[f"proj_b{i + 1}"] = jnp.zeros((d,), dt)
    return params


def load_projector_safetensors(cfg: LlavaConfig, path: str) -> dict:
    """Load mm_projector + image_newline from a HF LLaVA checkpoint dir
    (keys: model.mm_projector.{0,2}.{weight,bias}, model.image_newline)."""
    import os

    from safetensors import safe_open

    # Sequential indices: linear layers at 0, 2, 4, ... (GELUs between)
    names = {"model.image_newline": ("image_newline", False)}
    for i in range(cfg.projector_depth):
        names[f"model.mm_projector.{2 * i}.weight"] = (f"proj_w{i + 1}", True)
        names[f"model.mm_projector.{2 * i}.bias"] = (f"proj_b{i + 1}", False)
    out = {}
    dt = cfg.decoder.dtype
    for shard in [f for f in os.listdir(path) if f.endswith(".safetensors")]:
        with safe_open(os.path.join(path, shard), framework="np") as f:
            for name in f.keys():
                if name in names:
                    key, transpose = names[name]
                    arr = f.get_tensor(name)
                    out[key] = jnp.asarray(arr.T if transpose else arr, dt)
    missing = {v[0] for v in names.values()} - set(out)
    if missing:
        raise ValueError(f"projector weights missing from {path}: {missing}")
    return out


def project_features(mm_params: dict, feats: jnp.ndarray) -> jnp.ndarray:
    """mm_projector: Linear (-> GELU -> Linear)*. [T, P, C_vis] -> [T, P, D]."""
    depth = sum(1 for k in mm_params if k.startswith("proj_w"))
    h = feats
    for i in range(1, depth + 1):
        if i > 1:
            h = jax.nn.gelu(h, approximate=False)
        h = h @ mm_params[f"proj_w{i}"] + mm_params[f"proj_b{i}"]
    return h


def _bilinear_matrix(in_size: int, out_size: int):
    """[out, in] interpolation matrix matching torch F.interpolate(bilinear,
    align_corners=False): half-pixel centers, 2-tap, NO anti-aliasing (torch
    does not low-pass when downsampling; jax.image.resize does, so we build
    the exact taps as a static matrix — one MXU matmul per axis)."""
    import numpy as np

    i = np.arange(out_size, dtype=np.float64)
    x = (i + 0.5) * (in_size / out_size) - 0.5
    x0 = np.clip(np.floor(x), 0, in_size - 1).astype(np.int64)
    x1 = np.clip(x0 + 1, 0, in_size - 1)
    w1 = np.clip(x - x0, 0.0, 1.0)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    m[np.arange(out_size), x0] += 1.0 - w1
    m[np.arange(out_size), x1] += w1
    return jnp.asarray(m)


def pool_2d(feats: jnp.ndarray, side: int, stride: int = 2, mode: str = "bilinear"):
    """get_2dPool: [T, side*side, D] -> [T, ceil(side/stride)^2, D]
    (llava_arch.py:173-198; bilinear is the mode the eval configs use)."""
    if stride == 1:
        return feats
    t, p, d = feats.shape
    out = math.ceil(side / stride)
    grid = feats.reshape(t, side, side, d)
    if mode == "bilinear":
        m = _bilinear_matrix(side, out).astype(jnp.float32)
        g = grid.astype(jnp.float32)
        pooled = jnp.einsum(
            "oh,thwd->towd", m, g, precision=jax.lax.Precision.HIGHEST
        )
        pooled = jnp.einsum(
            "ow,thwd->thod", m, pooled, precision=jax.lax.Precision.HIGHEST
        ).astype(feats.dtype)
    elif mode == "average":
        pooled = grid.reshape(t, out, stride, out, stride, d).mean((2, 4))
    elif mode == "max":
        pooled = grid.reshape(t, out, stride, out, stride, d).max((2, 4))
    else:
        raise ValueError(f"unknown pool mode {mode!r}")
    return pooled.reshape(t, out * out, d)


def apply_newline_policy(
    feats: jnp.ndarray, side: int, newline: jnp.ndarray, position: str
) -> jnp.ndarray:
    """[T, side*side, D] -> flattened video token sequence [N, D].

    grid: newline after each grid row (add_token_per_grid, llava_arch.py:267);
    frame: newline after each frame (:290); one_token: single trailing
    newline; no_token: plain flatten (:427-428). Token merging requires
    no_token (square per-frame grids)."""
    t, p, d = feats.shape
    if position == "no_token":
        return feats.reshape(t * p, d)
    if position == "one_token":
        return jnp.concatenate([feats.reshape(t * p, d), newline[None]], axis=0)
    if position == "frame":
        nl = jnp.broadcast_to(newline[None, None], (t, 1, d))
        return jnp.concatenate([feats, nl], axis=1).reshape(t * (p + 1), d)
    if position == "grid":
        grid = feats.reshape(t, side, side, d)
        nl = jnp.broadcast_to(newline[None, None, None], (t, side, 1, d))
        return jnp.concatenate([grid, nl], axis=2).reshape(t * side * (side + 1), d)
    raise ValueError(f"unknown newline position {position!r}")


def build_slowfast_video_tokens(
    feats: jnp.ndarray,
    cfg: LlavaConfig,
    mm_newline: jnp.ndarray,
    slow_path_stride: int = 10,
    slow_pool_stride: int = 2,
) -> jnp.ndarray:
    """Two-stream slow-fast video tokens (llava_arch.py:386-398, grid-newline
    mode): every ``slow_path_stride``-th frame contributes high-resolution
    "slow" tokens (pooled at ``slow_pool_stride``), interleaved ahead of that
    group's normally-pooled "fast" frame tokens. feats: [T, P_vis, D] already
    projected. Returns the flattened token sequence [N, D]."""
    t, p, d = feats.shape
    side_in = cfg.vision_patches_per_side
    fast = pool_2d(feats, side_in, cfg.spatial_pool_stride, cfg.spatial_pool_mode)
    fast_side = cfg.pooled_side
    fast_tok = apply_newline_policy(fast, fast_side, mm_newline, "grid")
    tok_pf = fast_side * (fast_side + 1)

    slow_frames = feats[::slow_path_stride]
    slow = pool_2d(slow_frames, side_in, slow_pool_stride, cfg.spatial_pool_mode)
    import math as _math

    slow_side = _math.ceil(side_in / slow_pool_stride)
    slow_tok = apply_newline_policy(slow, slow_side, mm_newline, "grid")
    n_slow = slow_frames.shape[0]
    slow_pf = slow_side * (slow_side + 1)

    pad_frames = slow_path_stride * n_slow - t
    fast_pad = jnp.concatenate(
        [fast_tok, jnp.zeros((pad_frames * tok_pf, d), fast_tok.dtype)], axis=0
    )
    fast_grp = fast_pad.reshape(n_slow, slow_path_stride * tok_pf, d)
    slow_grp = slow_tok.reshape(n_slow, slow_pf, d)
    out = jnp.concatenate([slow_grp, fast_grp], axis=1).reshape(-1, d)
    if pad_frames > 0:
        out = out[: -(pad_frames * tok_pf)]
    return out


def build_multimodal_embeds(
    decoder_params: dict,
    cfg: LlavaConfig,
    mm_params: dict,
    input_ids,
    video_feats: jnp.ndarray,
    s_full: int,
):
    """Assemble [1, s_full, D] embeddings from a tokenized prompt containing
    one IMAGE_TOKEN_INDEX placeholder and pre-extracted vision features
    [T, P_vis, C_vis].

    Returns (embeds, valid_len, video_start, n_video) — the layout the
    TokenReducer consumes (the reference stashes the same three scalars on
    the model, llava_qwen.py:139-143).
    """
    import numpy as np

    ids = np.asarray(input_ids).reshape(-1)
    img_pos = np.nonzero(ids == IMAGE_TOKEN_INDEX)[0]
    if len(img_pos) != 1:
        raise ValueError(f"expected exactly one image token, got {len(img_pos)}")
    img_pos = int(img_pos[0])
    pre, post = ids[:img_pos], ids[img_pos + 1 :]

    feats = project_features(mm_params, video_feats)
    feats = pool_2d(feats, cfg.vision_patches_per_side, cfg.spatial_pool_stride, cfg.spatial_pool_mode)
    video = apply_newline_policy(
        feats, cfg.pooled_side, mm_params["image_newline"], cfg.newline_position
    ).astype(cfg.decoder.dtype)

    pre_e = qwen2.embed_tokens(decoder_params, jnp.asarray(pre, jnp.int32), cfg.decoder)
    post_e = qwen2.embed_tokens(decoder_params, jnp.asarray(post, jnp.int32), cfg.decoder)
    n_video = video.shape[0]
    valid = len(pre) + n_video + len(post)
    if valid > s_full:
        raise ValueError(f"sequence {valid} exceeds buffer {s_full}")
    seq = jnp.concatenate([pre_e, video, post_e], axis=0)
    seq = jnp.pad(seq, ((0, s_full - valid), (0, 0)))
    return seq[None], valid, len(pre), n_video


def build_multimodal_embeds_multi(
    decoder_params: dict,
    cfg: LlavaConfig,
    input_ids,
    image_token_seqs: list,
    s_full: int,
):
    """Multi-image splice: interleave text segments with one token sequence
    per IMAGE_TOKEN_INDEX placeholder, in order (the reference's multi-image
    splice loop, llava_arch.py:533-587). ``image_token_seqs``: list of
    [N_i, D] arrays (e.g. from anyres.assemble_anyres_image_tokens or the
    video pipeline).

    Returns (embeds [1, s_full, D], valid_len, spans) where spans is a list of
    (start, length) for each spliced image's tokens.
    """
    import numpy as np

    ids = np.asarray(input_ids).reshape(-1)
    pos = np.nonzero(ids == IMAGE_TOKEN_INDEX)[0].tolist()
    if len(pos) != len(image_token_seqs):
        raise ValueError(
            f"{len(pos)} image tokens in prompt but {len(image_token_seqs)} feature sequences"
        )
    parts, spans = [], []
    cursor, offset = 0, 0
    dt = cfg.decoder.dtype
    for p_i, img in zip(pos, image_token_seqs):
        txt = ids[cursor:p_i]
        if len(txt):
            parts.append(qwen2.embed_tokens(decoder_params, jnp.asarray(txt, jnp.int32), cfg.decoder))
            offset += len(txt)
        spans.append((offset, int(img.shape[0])))
        parts.append(img.astype(dt))
        offset += int(img.shape[0])
        cursor = p_i + 1
    txt = ids[cursor:]
    if len(txt):
        parts.append(qwen2.embed_tokens(decoder_params, jnp.asarray(txt, jnp.int32), cfg.decoder))
        offset += len(txt)
    valid = offset
    if valid > s_full:
        raise ValueError(f"sequence {valid} exceeds buffer {s_full}")
    seq = jnp.concatenate(parts, axis=0)
    seq = jnp.pad(seq, ((0, s_full - valid), (0, 0)))
    return seq[None], valid, spans
