"""Octree (3D spatio-temporal) token merging — dense TPU version.

Behavioral port of the reference's exploratory octree ablation
(token_merging_utils/octree_utils.py:293-386): the video is split into
cube snippets of side ``W`` (t = h = w), pooled over (t, y, x) simultaneously
with the same odd-size stripe scheme as the quadtree, and split when any of
the (<=8) children falls below the similarity threshold. Remainder frames
that don't fill a cube run through the spatial-only quadtree (:385). Output
order: snippet-major raster of surviving nodes' top-left-front leaves —
identical to the reference's 1d-index sort (:377-380).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .grids import build_geometry
from .quadtree import _per_head_cosine, quadtree_spatial

__all__ = ["octree_merge"]


def _pad_front3(x, axis, mode):
    first = jnp.take(x, jnp.array([0]), axis=axis)
    if mode == "sum":
        first = jnp.zeros_like(first)
    return jnp.concatenate([first, x], axis=axis)


def _pool3d(x: jnp.ndarray, mode: str = "avg") -> jnp.ndarray:
    """[B, T, H, W, C] -> [B, ceil/2 each of T/H/W, C] with stripe semantics."""
    _, t, h, w, _ = x.shape
    if t % 2:
        x = _pad_front3(x, 1, mode)
    if h % 2:
        x = _pad_front3(x, 2, mode)
    if w % 2:
        x = _pad_front3(x, 3, mode)
    b, t2, h2, w2, c = x.shape
    x = x.reshape(b, t2 // 2, 2, h2 // 2, 2, w2 // 2, 2, c)
    if mode == "avg":
        return x.mean(axis=(2, 4, 6))
    if mode == "min":
        return x.min(axis=(2, 4, 6))
    raise ValueError(mode)


def octree_merge(video: jnp.ndarray, threshold: float, root_level: int = 0, head_dim=None):
    """video: [T, H, W, C] with H == W. Returns (keep [T*H*W] bool,
    feat [T*H*W, C]) dense over the raster leaf grid (snippet-major order is
    raster order since snippets are contiguous frame blocks)."""
    t_total, h, w, c = video.shape
    s = w  # cube side
    ns, rem = t_total // s, t_total % s
    n = t_total * h * w

    keep_parts, feat_parts = [], []

    if ns == 0:
        qt = quadtree_spatial(video, threshold, root_level, head_dim=head_dim)
        return qt.is_rep.reshape(-1), qt.node_feat.reshape(n, c)

    cube = video[: ns * s].reshape(ns, s, s, s, c)
    # the (h, w) geometry of a square side-s grid doubles as the t geometry
    geom = build_geometry(s, s, root_level)
    n_level = geom.n_level

    feats = [cube]
    for _ in range(n_level - 1):
        feats.append(_pool3d(feats[-1], "avg"))
    feats.reverse()  # coarsest first

    def axis_map(cg_axis, pg_axis, cg_size):
        # child cell -> parent cell, one level up, via top-left leaf
        return np.asarray(
            [pg_axis.leaf_to_cell_y[cg_axis.cell_top_y[i]] for i in range(cg_size)],
            dtype=np.int32,
        )

    # split decisions
    stops = []
    for lvl in range(n_level - 1):
        cg, pg = geom.levels[lvl + 1], geom.levels[lvl]
        up = jnp.asarray(axis_map(cg, pg, cg.h))
        parent = feats[lvl]
        pc = jnp.take(jnp.take(jnp.take(parent, up, axis=1), up, axis=2), up, axis=3)
        sim = _per_head_cosine(pc, feats[lvl + 1], head_dim)  # [B, tc, hc, wc]
        min_sim = _pool3d(sim[..., None], "min")[..., 0]
        stop = min_sim >= threshold
        # Reference quirk (same as the 2D quadtree, see ops/quadtree.py):
        # the stop decision spans all EIGHT child slots; stripe parents'
        # unused slots keep zero-initialized (t, y, x) coords and contribute
        # cos(parent, child[b, 0, 0, 0]) (octree_utils.py
        # avgpool_to_even_side_index_tyx odd branch).
        if cg.h % 2 == 1:
            nc = np.full(pg.h, 2, np.int32)
            nc[0] = 1
            n_child = nc[:, None, None] * nc[None, :, None] * nc[None, None, :]
            has_garbage = jnp.asarray(n_child < 8)
            child000 = jnp.broadcast_to(feats[lvl + 1][:, :1, :1, :1], parent.shape)
            gsim = _per_head_cosine(parent, child000, head_dim)
            stop = stop & jnp.where(has_garbage[None], gsim >= threshold, True)
        stops.append(stop)

    # live/assigned propagation, gathered to the leaf cube
    leaf_map = [jnp.asarray(g.leaf_to_cell_y) for g in geom.levels]
    assigned_leaf = []
    live = jnp.ones((ns, geom.levels[0].h, geom.levels[0].h, geom.levels[0].h), bool)
    for lvl in range(n_level):
        if lvl < n_level - 1:
            assigned = live & stops[lvl]
            nxt = live & ~stops[lvl]
            cg, pg = geom.levels[lvl + 1], geom.levels[lvl]
            up = jnp.asarray(axis_map(cg, pg, cg.h))
            live = jnp.take(jnp.take(jnp.take(nxt, up, axis=1), up, axis=2), up, axis=3)
        else:
            assigned = live
        m = leaf_map[lvl]
        a = jnp.take(jnp.take(jnp.take(assigned, m, axis=1), m, axis=2), m, axis=3)
        assigned_leaf.append(a)

    assign_level = jnp.zeros((ns, s, s, s), jnp.int32)
    for lvl in range(n_level):
        assign_level = jnp.where(assigned_leaf[lvl], jnp.int32(lvl), assign_level)

    # rep leaf = top-left-front leaf of the owning node; node feature gathered
    keep = jnp.zeros((ns, s, s, s), bool)
    feat = jnp.zeros((ns, s, s, s, c), video.dtype)
    coords = np.arange(s, dtype=np.int32)
    for lvl in range(n_level):
        g = geom.levels[lvl]
        is_tl_axis = jnp.asarray(g.cell_top_y[g.leaf_to_cell_y] == coords)  # [s]
        is_tl = is_tl_axis[:, None, None] & is_tl_axis[None, :, None] & is_tl_axis[None, None, :]
        m = leaf_map[lvl]
        f = jnp.take(jnp.take(jnp.take(feats[lvl], m, axis=1), m, axis=2), m, axis=3)
        sel = assign_level == lvl
        keep = keep | (sel & is_tl[None])
        feat = jnp.where(sel[..., None], f, feat)

    keep_parts.append(keep.reshape(ns * s * s * s))
    feat_parts.append(feat.reshape(ns * s * s * s, c))

    if rem > 0:  # remainder frames: spatial-only quadtree (octree_utils.py:385)
        qt = quadtree_spatial(video[ns * s :], threshold, root_level, head_dim=head_dim)
        keep_parts.append(qt.is_rep.reshape(-1))
        feat_parts.append(qt.node_feat.reshape(rem * h * w, c))

    return jnp.concatenate(keep_parts), jnp.concatenate(feat_parts)
