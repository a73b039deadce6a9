"""AnyRes / image / multi-image branches of the LLaVA meta-architecture.

Behavioral port of the reference's image path (llava/model/llava_arch.py:
365-527 + mm_utils.py helpers): an image is encoded as a base (whole-image)
tile plus an anyres grid of high-resolution tiles chosen from
``image_grid_pinpoints``; tile features are reassembled into one 2D map,
the letterbox padding is cropped (``unpad_image``, llava_arch.py:129-160), an
``image_newline`` column marks row ends, and the base tile is prepended.

All geometry here is host-side python over static sizes (image sizes arrive
with the sample); only the feature reassembly is jnp.
"""

from __future__ import annotations

import math
import re

import jax
import jax.numpy as jnp

__all__ = [
    "select_best_resolution",
    "get_anyres_image_grid_shape",
    "unpad_image_hwd",
    "assemble_anyres_image_tokens",
]


def select_best_resolution(original_size, possible_resolutions):
    """Pick the pinpoint resolution maximizing effective resolution, then
    minimizing waste (mm_utils.py:119-149). Sizes are (width, height)."""
    original_width, original_height = original_size
    best_fit = None
    max_effective = 0
    min_wasted = float("inf")
    for width, height in possible_resolutions:
        scale = min(width / original_width, height / original_height)
        dw, dh = int(original_width * scale), int(original_height * scale)
        effective = min(dw * dh, original_width * original_height)
        wasted = width * height - effective
        if effective > max_effective or (effective == max_effective and wasted < min_wasted):
            max_effective = effective
            min_wasted = wasted
            best_fit = (width, height)
    return best_fit


def get_anyres_image_grid_shape(image_size, grid_pinpoints, patch_size):
    """(n_patch_width, n_patch_height) of the anyres tile grid
    (mm_utils.py:213-240). ``grid_pinpoints``: list of (w, h) pixel
    resolutions or a range string like "(1x1),...,(6x6)"."""
    if isinstance(grid_pinpoints, str) and "x" in grid_pinpoints:
        matches = re.findall(r"\((\d+)x(\d+)\)", grid_pinpoints)
        start = tuple(map(int, matches[0]))
        end = tuple(map(int, matches[-1]))
        grid_pinpoints = [
            (i * patch_size, j * patch_size)
            for i in range(start[0], end[0] + 1)
            for j in range(start[1], end[1] + 1)
        ]
    width, height = select_best_resolution(image_size, grid_pinpoints)
    return width // patch_size, height // patch_size


def unpad_image_hwd(feat: jnp.ndarray, original_size) -> jnp.ndarray:
    """Crop letterbox padding from a [H, W, D] feature map given the original
    (width, height) (llava_arch.py:129-160, which uses [C, H, W])."""
    original_width, original_height = original_size
    current_height, current_width = feat.shape[0], feat.shape[1]
    if original_width / original_height > current_width / current_height:
        scale = current_width / original_width
        new_height = int(original_height * scale)
        padding = (current_height - new_height) // 2
        return feat[padding : current_height - padding]
    scale = current_height / original_height
    new_width = int(original_width * scale)
    padding = (current_width - new_width) // 2
    return feat[:, padding : current_width - padding]


def _bilinear_resize_hwd(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch F.interpolate(bilinear, align_corners=False) on [H, W, D]."""
    from .llava import _bilinear_matrix

    mh = _bilinear_matrix(x.shape[0], out_h).astype(jnp.float32)
    mw = _bilinear_matrix(x.shape[1], out_w).astype(jnp.float32)
    y = jnp.einsum("oh,hwd->owd", mh, x.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("ow,hwd->hod", mw, y, precision=jax.lax.Precision.HIGHEST)
    return y.astype(x.dtype)


def assemble_anyres_image_tokens(
    feats: jnp.ndarray,
    image_size,
    patches_per_side: int,
    newline: jnp.ndarray,
    image_aspect_ratio: str = "anyres",
    patch_merge_type: str = "spatial_unpad",
    grid_pinpoints=None,
    vision_image_size: int = 384,
) -> jnp.ndarray:
    """[n_tiles, P, D] projected tile features -> [N_tok, D] image tokens.

    feats[0] is the base (whole-image) tile; feats[1:] are the anyres grid
    tiles (llava_arch.py:437-491). Supported patch_merge_type variants:
    "flat", "spatial", "spatial_unpad", "spatial_unpad_nobase",
    "spatial_maxpool2x2"; aspect ratios "anyres", "anyres_max_{N}", "square"
    (2x2 grid fallback).
    """
    n_tiles, p, d = feats.shape
    side = patches_per_side
    assert side * side == p, (side, p)

    if patch_merge_type == "flat":
        return feats.reshape(n_tiles * p, d)

    if n_tiles == 1:  # single image operations (llava_arch.py:486-491)
        f = feats[0]
        if "unpad" in patch_merge_type:
            f = jnp.concatenate([f, newline[None].astype(f.dtype)], axis=0)
        return f

    base, tiles = feats[0], feats[1:]

    max_num_patches = None
    m = re.match(r"anyres_max_(\d+)", image_aspect_ratio)
    if m:
        max_num_patches = int(m.group(1))

    if image_aspect_ratio == "anyres" or "anyres_max" in image_aspect_ratio:
        if grid_pinpoints is None:
            raise ValueError("anyres requires grid_pinpoints")
        npw, nph = get_anyres_image_grid_shape(image_size, grid_pinpoints, vision_image_size)
    else:
        nph = npw = 2  # reference square fallback (llava_arch.py:458)
    grid = tiles.reshape(nph, npw, side, side, d)

    if "maxpool2x2" in patch_merge_type:
        x = grid.transpose(0, 2, 1, 3, 4).reshape(nph * side, npw * side, d)
        h2, w2 = (nph * side) // 2, (npw * side) // 2
        out = x[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2, d).max((1, 3)).reshape(-1, d)
    elif "unpad" in patch_merge_type:
        x = grid.transpose(0, 2, 1, 3, 4).reshape(nph * side, npw * side, d)
        x = unpad_image_hwd(x, image_size)
        if max_num_patches is not None:
            h, w = x.shape[0], x.shape[1]
            times = math.sqrt(h * w / (max_num_patches * side**2))
            if times > 1.1:  # llava_arch.py:470-474
                x = _bilinear_resize_hwd(x, int(h // times), int(w // times))
        col = jnp.broadcast_to(newline[None, None].astype(x.dtype), (x.shape[0], 1, d))
        out = jnp.concatenate([x, col], axis=1).reshape(-1, d)
    else:  # plain "spatial": row-major tile raster (llava_arch.py:484-485)
        out = grid.transpose(0, 2, 1, 3, 4).reshape(-1, d)

    if "nobase" in patch_merge_type:
        return out
    return jnp.concatenate([base, out], axis=0)
