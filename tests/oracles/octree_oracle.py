"""Recursive NumPy oracle for the octree merger (3D stripe pooling)."""

from __future__ import annotations

import numpy as np

from .quadtree_oracle import blocks_1d, cosine, level_sizes, quadtree_spatial_oracle


def pool3d_once(x):
    """[B, T, H, W, C] -> stripe-pooled halves on t/h/w (avg)."""
    b, t, h, w, c = x.shape
    tb, hb, wb = blocks_1d(t), blocks_1d(h), blocks_1d(w)
    out = np.zeros((b, len(tb), len(hb), len(wb), c))
    for i, ts in enumerate(tb):
        for j, hs in enumerate(hb):
            for k, ws in enumerate(wb):
                cells = x[:, ts][:, :, hs][:, :, :, ws].reshape(b, -1, c)
                out[:, i, j, k] = cells.mean(1)
    return out


def octree_oracle(video, threshold, root_level=0):
    """video: [T, H, W, C] with H == W. Returns (keep [T*H*W] bool,
    features at kept raster positions in order)."""
    t_total, h, w, c = video.shape
    s = w
    ns, rem = t_total // s, t_total % s
    keep = np.zeros(t_total * h * w, bool)
    feats = {}

    if ns == 0:
        nodes = quadtree_spatial_oracle(video, threshold, root_level)
        for fr in nodes:
            for nd in fr:
                rid = nd.t * h * w + nd.box[0] * w + nd.box[1]
                keep[rid] = True
                feats[rid] = nd.feat
        return keep, [feats[i] for i in np.nonzero(keep)[0]]

    sizes = level_sizes(s, s)
    root_idx = root_level if root_level >= 0 else len(sizes) + root_level
    side_ladder = [sz[0] for sz in sizes[root_idx:]]
    n_level = len(side_ladder)

    cube = video[: ns * s].reshape(ns, s, s, s, c).astype(np.float64)
    pyr = [cube]
    for _ in range(n_level - 1):
        pyr.append(pool3d_once(pyr[-1]))
    pyr.reverse()

    # per-level axis member lists (same on t/h/w, square ladder)
    ax = [[[u] for u in range(s)]]
    for _ in range(n_level - 1):
        blocks = blocks_1d(len(ax[-1]))
        ax.append([sorted(sum((ax[-1][i] for i in blk), [])) for blk in blocks])
    ax.reverse()

    child_map = []
    for lvl in range(n_level - 1):
        blk = blocks_1d(side_ladder[lvl + 1])
        m = {}
        for pi, members in enumerate(blk):
            m[pi] = members
        child_map.append(m)

    def visit(b, lvl, ti, yi, xi, out):
        if lvl < n_level - 1:
            kids = [
                (ci, cj, ck)
                for ci in child_map[lvl][ti]
                for cj in child_map[lvl][yi]
                for ck in child_map[lvl][xi]
            ]
            sims = [cosine(pyr[lvl][b, ti, yi, xi], pyr[lvl + 1][b, ci, cj, ck]) for ci, cj, ck in kids]
            # reference quirk: unused child slots default to (0, 0, 0)
            for _ in range(8 - len(kids)):
                sims.append(cosine(pyr[lvl][b, ti, yi, xi], pyr[lvl + 1][b, 0, 0, 0]))
            stop = all(sv >= threshold for sv in sims)
        else:
            stop = True
        if stop:
            tt, yy, xx = min(ax[lvl][ti]), min(ax[lvl][yi]), min(ax[lvl][xi])
            rid = (b * s + tt) * h * w + yy * w + xx
            out[rid] = pyr[lvl][b, ti, yi, xi].copy()
        else:
            for ci in child_map[lvl][ti]:
                for cj in child_map[lvl][yi]:
                    for ck in child_map[lvl][xi]:
                        visit(b, lvl + 1, ci, cj, ck, out)

    for b in range(ns):
        for ti in range(side_ladder[0]):
            for yi in range(side_ladder[0]):
                for xi in range(side_ladder[0]):
                    visit(b, 0, ti, yi, xi, feats)

    if rem > 0:
        nodes = quadtree_spatial_oracle(video[ns * s :], threshold, root_level)
        for fr in nodes:
            for nd in fr:
                rid = (ns * s + nd.t) * h * w + nd.box[0] * w + nd.box[1]
                feats[rid] = nd.feat

    for rid in feats:
        keep[rid] = True
    return keep, [feats[i] for i in np.nonzero(keep)[0]]
