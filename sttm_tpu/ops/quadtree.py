"""Dense quadtree spatial merging (TPU-native).

The reference builds the quadtree with variable-length surviving-node lists
and a Python level loop (token_merging_utils/quadtree_builder.py:85-235). We
re-express the identical algorithm densely on the leaf grid:

  * every quadtree node is keyed by the (t, y, x) of its top-left leaf; the
    reference's final raster sort (quadtree_builder.py:197-203) makes node
    order == raster order of top-left leaves, so the per-leaf form reproduces
    the exact output ordering;
  * split decisions are dense [T, H_l, W_l] maps: cos-sim(parent, children)
    in fp32, min-pooled over children, compared to the threshold — the dense
    equivalent of ``(sim >= t).all(-1)`` (quadtree_builder.py:61-68);
  * each leaf's assigned level = its coarsest "live and stopped" ancestor,
    computed by propagating live masks down the pyramid.

Everything is static-shape; no host sync, no data-dependent shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax.numpy as jnp
import numpy as np

from .grids import QuadtreeGeometry, build_geometry
from .pooling import pool_leaf_sim_min, pool_to_even_side

__all__ = ["DenseQuadtree", "quadtree_spatial"]


@dataclasses.dataclass
class DenseQuadtree:
    """Per-leaf dense view of a built quadtree.

    All fields are leaf-grid dense: shape [T, H, W] (+ trailing dims). At every
    leaf the fields describe the leaf's *owning node* (the surviving quadtree
    node whose box covers the leaf).
    """

    geom: QuadtreeGeometry
    assign_level: jnp.ndarray  # [T, H, W] int32, index into geom.levels
    is_rep: jnp.ndarray  # [T, H, W] bool, leaf is its node's top-left leaf
    node_feat: jnp.ndarray  # [T, H, W, C] owning node's (pooled) feature
    tlbr: jnp.ndarray  # [T, H, W, 4] int32 (top, left, bot_excl, right_excl)
    num_patches: jnp.ndarray  # [T, H, W] int32 box area in leaves
    payload_nodes: dict  # name -> [T, H, W, ...] pooled payloads at owner

    @property
    def owner_1d(self) -> jnp.ndarray:
        """Flattened node id: t*H*W + top*W + left (raster id of rep leaf)."""
        t, h, w = self.assign_level.shape
        tid = jnp.arange(t, dtype=jnp.int32)[:, None, None]
        return tid * (h * w) + self.tlbr[..., 0] * w + self.tlbr[..., 1]


def _per_head_cosine(a: jnp.ndarray, b: jnp.ndarray, head_dim: int | None) -> jnp.ndarray:
    """fp32 cosine similarity over the channel axis, optionally per-head-mean.

    Matches the reference's upcast + optional per-head mean
    (quadtree_builder.py:57-66). The plain (non-per-head) path runs the
    blocked Pallas kernel on TPU (ops/kernels.py).
    """
    if head_dim is None:
        from .kernels import cosine_rows

        return cosine_rows(a, b)
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a = a.reshape(*a.shape[:-1], -1, head_dim)
    b = b.reshape(*b.shape[:-1], -1, head_dim)
    num = (a * b).sum(-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    sim = num / jnp.maximum(den, 1e-8)
    return sim.mean(-1)


def _gather_level_to_leaf(x: jnp.ndarray, lvl, axes=(1, 2)) -> jnp.ndarray:
    """Gather a level-grid map [T, h_l, w_l, ...] to the leaf grid [T, H, W, ...]."""
    x = jnp.take(x, jnp.asarray(lvl.leaf_to_cell_y), axis=axes[0])
    x = jnp.take(x, jnp.asarray(lvl.leaf_to_cell_x), axis=axes[1])
    return x


def _select_by_level(assign_level: jnp.ndarray, per_level: list[jnp.ndarray]) -> jnp.ndarray:
    """out[leaf] = per_level[assign_level[leaf]][leaf] via a where-chain."""
    out = per_level[-1]
    sel = assign_level
    if out.ndim > sel.ndim:
        sel = sel[..., None]
    for lvl in range(len(per_level) - 2, -1, -1):
        out = jnp.where(sel == lvl, per_level[lvl], out)
    return out


def quadtree_spatial(
    feat: jnp.ndarray,
    threshold: float,
    root_level: int = 0,
    weighted_avg: bool = False,
    head_dim: int | None = None,
    payloads: Mapping[str, tuple[jnp.ndarray, str]] | None = None,
) -> DenseQuadtree:
    """Build the quadtree over ``feat`` [T, H, W, C].

    weighted_avg=True uses sum pooling (parent = sum of leaves; caller divides
    by num_patches at the end), matching quadtree_builder.py:89. ``payloads``
    maps name -> (tensor [T, H, W, D], pool_mode) for extra per-leaf data
    (e.g. rope cos/sin maps for the pos-emb ablation) pooled alongside and
    returned at the owning node.
    """
    t, h, w, _ = feat.shape
    geom = build_geometry(h, w, root_level)
    n_level = geom.n_level
    pool_mode = "sum" if weighted_avg else "avg"
    payloads = dict(payloads or {})

    # ---- pyramid (finest -> coarsest), then reorder coarsest-first ----
    feats = [feat]
    payload_lvls = {k: [v] for k, (v, _) in payloads.items()}
    for _ in range(n_level - 1):
        feats.append(pool_to_even_side(feats[-1], pool_mode))
        for k, (_, pmode) in payloads.items():
            payload_lvls[k].append(pool_to_even_side(payload_lvls[k][-1], pmode))
    feats.reverse()
    for k in payload_lvls:
        payload_lvls[k].reverse()

    # ---- split decisions per level (parents 0..n_level-2) ----
    # sim computed on the child grid, min-pooled to the parent grid.
    stops: list[jnp.ndarray] = []
    for lvl in range(n_level - 1):
        child = feats[lvl + 1]
        cg = geom.levels[lvl + 1]
        pg = geom.levels[lvl]
        # parent gathered to the child grid via one-step up maps
        up_y = np.asarray([pg.leaf_to_cell_y[cg.cell_top_y[i]] for i in range(cg.h)], dtype=np.int32)
        up_x = np.asarray([pg.leaf_to_cell_x[cg.cell_left_x[j]] for j in range(cg.w)], dtype=np.int32)
        parent_at_child = jnp.take(jnp.take(feats[lvl], jnp.asarray(up_y), axis=1), jnp.asarray(up_x), axis=2)
        sim = _per_head_cosine(parent_at_child, child, head_dim)  # [T, h_c, w_c]
        min_sim = pool_leaf_sim_min(sim)  # [T, h_p, w_p]
        stop = min_sim >= threshold

        # Reference quirk replicated for exact parity: the stop decision is
        # ``(sim >= t).all(-1)`` over ALL FOUR child slots — stripe parents'
        # unused slots keep their zero-initialized coords and contribute
        # cos(parent, child_grid[t, 0, 0]) (quadtree_builder.py:61-68 with
        # pool_to_even_side_index_video's zero-initialized child_yx_coords,
        # quadtree_spatial_merger.py:190). Fires whenever a level has odd
        # side(s) — including the main 14x14 config's 7->4 level.
        rows_odd, cols_odd = cg.h % 2 == 1, cg.w % 2 == 1
        if rows_odd or cols_odd:
            nc_y = np.full(pg.h, 2, np.int32)
            if rows_odd:
                nc_y[0] = 1
            nc_x = np.full(pg.w, 2, np.int32)
            if cols_odd:
                nc_x[0] = 1
            has_garbage = jnp.asarray((nc_y[:, None] * nc_x[None, :]) < 4)
            child00 = jnp.broadcast_to(child[:, :1, :1], feats[lvl].shape)
            garbage_sim = _per_head_cosine(
                feats[lvl], child00, head_dim
            )  # [T, h_p, w_p] vs child cell (t, 0, 0)
            stop = stop & jnp.where(has_garbage[None], garbage_sim >= threshold, True)
        stops.append(stop)

    # ---- live/assigned propagation ----
    assigned_leaf: list[jnp.ndarray] = []
    live = jnp.ones((t, geom.levels[0].h, geom.levels[0].w), dtype=bool)
    for lvl in range(n_level):
        if lvl < n_level - 1:
            assigned = live & stops[lvl]
            nxt_parent_live = live & ~stops[lvl]
            cg = geom.levels[lvl + 1]
            pg = geom.levels[lvl]
            up_y = np.asarray([pg.leaf_to_cell_y[cg.cell_top_y[i]] for i in range(cg.h)], dtype=np.int32)
            up_x = np.asarray([pg.leaf_to_cell_x[cg.cell_left_x[j]] for j in range(cg.w)], dtype=np.int32)
            live = jnp.take(jnp.take(nxt_parent_live, jnp.asarray(up_y), axis=1), jnp.asarray(up_x), axis=2)
        else:
            assigned = live
        assigned_leaf.append(_gather_level_to_leaf(assigned, geom.levels[lvl]))

    assign_level = jnp.zeros((t, h, w), dtype=jnp.int32)
    for lvl in range(n_level):
        assign_level = jnp.where(assigned_leaf[lvl], jnp.int32(lvl), assign_level)

    # ---- static per-level leaf tables ----
    tlbr_lvl, is_tl_lvl = [], []
    for lvl in geom.levels:
        top = lvl.cell_top_y[lvl.leaf_to_cell_y]  # [H]
        left = lvl.cell_left_x[lvl.leaf_to_cell_x]  # [W]
        bot = lvl.cell_bot_y[lvl.leaf_to_cell_y] + 1
        right = lvl.cell_right_x[lvl.leaf_to_cell_x] + 1
        box = np.stack(
            [
                np.broadcast_to(top[:, None], (h, w)),
                np.broadcast_to(left[None, :], (h, w)),
                np.broadcast_to(bot[:, None], (h, w)),
                np.broadcast_to(right[None, :], (h, w)),
            ],
            axis=-1,
        ).astype(np.int32)
        tlbr_lvl.append(jnp.asarray(box))
        is_tl = (top == np.arange(h, dtype=np.int32))[:, None] & (
            left == np.arange(w, dtype=np.int32)
        )[None, :]
        is_tl_lvl.append(jnp.asarray(np.broadcast_to(is_tl, (h, w))))

    tlbr = _select_by_level(
        assign_level, [jnp.broadcast_to(b[None], (t, h, w, 4)) for b in tlbr_lvl]
    )
    is_rep = _select_by_level(assign_level, [jnp.broadcast_to(m[None], (t, h, w)) for m in is_tl_lvl])
    num_patches = (tlbr[..., 2] - tlbr[..., 0]) * (tlbr[..., 3] - tlbr[..., 1])

    node_feat = _select_by_level(
        assign_level, [_gather_level_to_leaf(feats[lvl], geom.levels[lvl]) for lvl in range(n_level)]
    )
    payload_nodes = {
        k: _select_by_level(
            assign_level,
            [_gather_level_to_leaf(payload_lvls[k][lvl], geom.levels[lvl]) for lvl in range(n_level)],
        )
        for k in payload_lvls
    }

    return DenseQuadtree(
        geom=geom,
        assign_level=assign_level,
        is_rep=is_rep,
        node_feat=node_feat,
        tlbr=tlbr,
        num_patches=num_patches,
        payload_nodes=payload_nodes,
    )
