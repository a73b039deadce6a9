"""Slow, obviously-correct NumPy oracle for STTM quadtree merging.

Written independently from the spec in DESIGN.md (recursive quadtree, explicit
block loops) so it can serve as a golden reference for the dense TPU
implementation. Node output order: raster order of (t, top-left leaf).
"""

from __future__ import annotations

import math

import numpy as np


def blocks_1d(size: int):
    """Output block index -> list of input coords, stripe semantics."""
    new = math.ceil(size / 2)
    out = []
    for i in range(new):
        if size % 2 == 0:
            out.append([2 * i, 2 * i + 1])
        elif i == 0:
            out.append([0])
        else:
            out.append([2 * i - 1, 2 * i])
    return out


def pool_once(x: np.ndarray, mode: str) -> np.ndarray:
    """x: [T, H, W, C] -> [T, ceil(H/2), ceil(W/2), C]."""
    t, h, w, c = x.shape
    rb, cb = blocks_1d(h), blocks_1d(w)
    out = np.zeros((t, len(rb), len(cb), c), dtype=np.float64)
    for i, rows in enumerate(rb):
        for j, cols in enumerate(cb):
            cells = x[:, rows][:, :, cols].reshape(t, -1, c)
            out[:, i, j] = cells.sum(1) if mode == "sum" else cells.mean(1)
    return out


def level_sizes(h, w):
    sizes = [(h, w)]
    while h != 2 and w != 2:
        h, w = math.ceil(h / 2), math.ceil(w / 2)
        sizes.insert(0, (h, w))
    return sizes


def cosine(a, b, head_dim=None):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    if head_dim is not None:
        a = a.reshape(-1, head_dim)
        b = b.reshape(-1, head_dim)
        sims = [
            float(np.dot(u, v) / max(np.linalg.norm(u) * np.linalg.norm(v), 1e-8))
            for u, v in zip(a, b)
        ]
        return float(np.mean(sims))
    return float(np.dot(a, b) / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-8))


class OracleNode:
    def __init__(self, t, box, feat, num_patches):
        self.t = t
        self.box = box  # (top, left, bot_excl, right_excl) in leaf units
        self.feat = feat
        self.num_patches = num_patches

    @property
    def raster_id(self):
        return self.box[0], self.box[1]


def quadtree_spatial_oracle(feat, thresh, root_level=0, weighted_avg=False, head_dim=None):
    """feat: [T, H, W, C] float. Returns list of per-frame node lists."""
    t, h, w, c = feat.shape
    sizes = level_sizes(h, w)
    root_idx = root_level if root_level >= 0 else len(sizes) + root_level
    sizes = sizes[root_idx:]
    n_level = len(sizes)
    mode = "sum" if weighted_avg else "avg"

    # pyramid, finest -> coarsest, then reverse
    feats = [feat.astype(np.float64)]
    for _ in range(n_level - 1):
        feats.append(pool_once(feats[-1], mode))
    feats.reverse()

    # per-level cell -> leaf box, and parent -> children map
    boxes, children = [], []
    cur_rows = [[y] for y in range(h)]
    cur_cols = [[x] for x in range(w)]
    rows_per_level = [cur_rows]
    cols_per_level = [cur_cols]
    for _ in range(n_level - 1):
        rb = blocks_1d(len(rows_per_level[-1]))
        cb = blocks_1d(len(cols_per_level[-1]))
        rows_per_level.append([sorted(sum((rows_per_level[-1][i] for i in blk), [])) for blk in rb])
        cols_per_level.append([sorted(sum((cols_per_level[-1][j] for j in blk), [])) for blk in cb])
    rows_per_level.reverse()
    cols_per_level.reverse()

    child_map = []
    for lvl in range(n_level - 1):
        rb = blocks_1d(sizes[lvl + 1][0])
        cb = blocks_1d(sizes[lvl + 1][1])
        m = {}
        for pi, rows in enumerate(rb):
            for pj, cols in enumerate(cb):
                m[(pi, pj)] = [(ci, cj) for ci in rows for cj in cols]
        child_map.append(m)

    def box_of(lvl, i, j):
        rows = rows_per_level[lvl][i]
        cols = cols_per_level[lvl][j]
        return (min(rows), min(cols), max(rows) + 1, max(cols) + 1)

    nodes_per_frame = [[] for _ in range(t)]

    def visit(ti, lvl, i, j):
        if lvl < n_level - 1:
            kids = child_map[lvl][(i, j)]
            sims = [cosine(feats[lvl][ti, i, j], feats[lvl + 1][ti, ci, cj], head_dim) for ci, cj in kids]
            # reference quirk: unused child slots (stripe parents) default to
            # coords (0, 0) and still enter the all() stop decision
            for _ in range(4 - len(kids)):
                sims.append(cosine(feats[lvl][ti, i, j], feats[lvl + 1][ti, 0, 0], head_dim))
            stop = all(s >= thresh for s in sims)
        else:
            stop = True
        if stop:
            box = box_of(lvl, i, j)
            area = (box[2] - box[0]) * (box[3] - box[1])
            nodes_per_frame[ti].append(OracleNode(ti, box, feats[lvl][ti, i, j].copy(), area))
        else:
            for ci, cj in child_map[lvl][(i, j)]:
                visit(ti, lvl + 1, ci, cj)

    for ti in range(t):
        for i in range(sizes[0][0]):
            for j in range(sizes[0][1]):
                visit(ti, 0, i, j)
        nodes_per_frame[ti].sort(key=lambda nd: nd.raster_id)
    return nodes_per_frame


def contains(b1, b2):
    return b1[0] <= b2[0] and b1[1] <= b2[1] and b1[2] >= b2[2] and b1[3] >= b2[3]


def reference_union(pairs, n):
    """The reference's iterative scatter-amin union (its exact semantics)."""
    rep = np.arange(n, dtype=np.int64)
    if not pairs:
        return rep
    dst = np.array([p[0] for p in pairs])
    src = np.array([p[1] for p in pairs])
    while True:
        m = np.minimum(rep[dst], rep[src])
        np.minimum.at(rep, dst, m)
        np.minimum.at(rep, src, m)
        rep = rep[rep]
        if np.array_equal(rep, rep[rep]):
            break
    return rep


def sttm_oracle(
    feat,
    thresh,
    temporal_thresh=-1.0,
    root_level=0,
    weighted_avg=False,
    head_dim=None,
):
    """Full STTM oracle. Returns list of (raster_1d_id, feature, num_patches)
    for surviving tokens in raster order. raster_1d_id = t*H*W + top*W + left.
    """
    t, h, w, c = feat.shape
    nodes_per_frame = quadtree_spatial_oracle(feat, thresh, root_level, weighted_avg, head_dim)
    all_nodes = [nd for fr in nodes_per_frame for nd in fr]

    def nid(nd):
        return nd.t * h * w + nd.box[0] * w + nd.box[1]

    if temporal_thresh <= 0:
        out = []
        for nd in all_nodes:
            f = nd.feat / nd.num_patches if weighted_avg else nd.feat
            out.append((nid(nd), f, nd.num_patches))
        return out

    # candidate pairs: containment either way + cosine >= thresh
    pairs = []
    id2node = {nid(nd): nd for nd in all_nodes}
    for ti in range(t - 1):
        for n1 in nodes_per_frame[ti]:
            for n2 in nodes_per_frame[ti + 1]:
                if contains(n1.box, n2.box) or contains(n2.box, n1.box):
                    if cosine(n1.feat, n2.feat, head_dim) >= temporal_thresh:
                        pairs.append((nid(n1), nid(n2)))

    rep = reference_union(pairs, t * h * w)
    groups = {}
    for nd in all_nodes:
        groups.setdefault(int(rep[nid(nd)]), []).append(nd)

    out = []
    for rid in sorted(groups):
        members = groups[rid]
        acc = sum(m.feat for m in members)
        npatch = sum(m.num_patches for m in members)
        f = acc / npatch if weighted_avg else acc / len(members)
        out.append((rid, f, npatch))
    return out
