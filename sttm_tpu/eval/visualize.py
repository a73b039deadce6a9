"""Merge visualization: per-node member boxes + frame overlays.

Role of the reference's vis pipeline (sa_pattern=quadtree_vis): the patched
forward returns node -> merged-member-box metadata instead of logits
(quadtree_attn_monkey_patch_for_vis.py:97-100,
cross_frame_node_merging_vis, quadtree_temporal_merger.py:301-320), rendered
over raw frames. Here the dense quadtree exposes the same metadata directly —
no special model forward needed.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops.quadtree import quadtree_spatial
from ..ops.temporal import temporal_merge_dense

__all__ = ["quadtree_node_metadata", "render_overlays"]


def quadtree_node_metadata(
    video_feat,
    spatial_thresh: float,
    temporal_thresh: float = -1.0,
    root_level: int = 0,
    weighted_avg: bool = False,
    head_dim: int | None = None,
):
    """video_feat: [T, H, W, C]. Returns {surviving_node_raster_id:
    [(t, top, left, bot_excl, right_excl), ...]} — each survivor's merged
    member boxes (the reference's ``node_metadata``)."""
    t, h, w, _ = video_feat.shape
    qt = quadtree_spatial(jnp.asarray(video_feat), spatial_thresh, root_level, weighted_avg, head_dim)
    is_rep = np.asarray(qt.is_rep).reshape(-1)
    tlbr = np.asarray(qt.tlbr).reshape(-1, 4)
    tid = np.repeat(np.arange(t), h * w)

    if temporal_thresh > 0:
        _, final_rep, _ = temporal_merge_dense(qt, temporal_thresh, head_dim)
        final_rep = np.asarray(final_rep)
    else:
        final_rep = np.arange(t * h * w)

    meta: dict[int, list] = {}
    node_ids = np.nonzero(is_rep)[0]
    for nid in node_ids:
        dst = int(final_rep[nid])
        box = (int(tid[nid]), *(int(v) for v in tlbr[nid]))
        meta.setdefault(dst, []).append(box)
    return meta


def render_overlays(frames: np.ndarray, node_metadata: dict, grid_hw: tuple[int, int]):
    """Draw node boxes on raw frames. frames: uint8 [T, H_px, W_px, 3];
    grid_hw: token grid (boxes are in token units). Returns a copy with
    boxes; color is hashed per surviving node so merged members share it."""
    t, hp, wp, _ = frames.shape
    gh, gw = grid_hw
    sy, sx = hp / gh, wp / gw
    out = frames.copy()

    def color(nid):
        rng = np.random.default_rng(nid)
        return rng.integers(64, 255, size=3, dtype=np.uint8)

    for dst, boxes in node_metadata.items():
        c = color(dst)
        for (ti, top, left, bot, right) in boxes:
            y0, y1 = int(top * sy), min(int(bot * sy), hp - 1)
            x0, x1 = int(left * sx), min(int(right * sx), wp - 1)
            out[ti, y0:y1 + 1, x0, :] = c
            out[ti, y0:y1 + 1, x1, :] = c
            out[ti, y0, x0:x1 + 1, :] = c
            out[ti, y1, x0:x1 + 1, :] = c
    return out
