"""Static quadtree level geometry.

Everything in this module runs on the host at trace time (shapes are static
under jit) and produces small numpy tables that the dense TPU kernels gather
from. This replaces the reference's per-level index bookkeeping
(ref: token_merging_utils/quadtree_spatial_merger.py:155-271) with closed-form
maps.

Pooling convention (matches the reference's odd-size "stripe" scheme,
ref: token_merging_utils/quadtree_spatial_merger.py:9-56): pooling a side of
size ``s`` produces ``ceil(s/2)`` cells. For even ``s``, output cell ``i``
covers input ``[2i, 2i+1]``. For odd ``s``, output cell 0 covers input ``[0]``
(a stripe) and cell ``i>0`` covers ``[2i-1, 2i]``.
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache

import numpy as np

__all__ = [
    "level_sizes",
    "up_map",
    "LevelGeometry",
    "QuadtreeGeometry",
    "build_geometry",
]


def level_sizes(h: int, w: int) -> list[tuple[int, int]]:
    """Size ladder from coarsest to finest.

    Mirrors the reference's ladder construction (quadtree_builder.py:101-106):
    halve (ceil) both sides until either side reaches 2. Returned list is
    ordered coarsest -> finest; ``root_level`` indexes into it from the front.
    """
    sizes = [(h, w)]
    while h != 2 and w != 2:
        h = math.ceil(h / 2)
        w = math.ceil(w / 2)
        sizes.insert(0, (h, w))
    return sizes


def up_map(child_size: int) -> np.ndarray:
    """Map child coordinate -> parent coordinate for one pooling step."""
    y = np.arange(child_size, dtype=np.int32)
    if child_size % 2 == 0:
        return y // 2
    return (y + 1) // 2


@dataclasses.dataclass(frozen=True)
class LevelGeometry:
    """Static tables for one pyramid level, in finest-grid (leaf) units."""

    h: int
    w: int
    # leaf coordinate -> this level's cell coordinate, shape [H_leaf]/[W_leaf]
    leaf_to_cell_y: np.ndarray
    leaf_to_cell_x: np.ndarray
    # cell coordinate -> top-left / bottom-right(inclusive) leaf coordinate
    cell_top_y: np.ndarray
    cell_left_x: np.ndarray
    cell_bot_y: np.ndarray
    cell_right_x: np.ndarray


@dataclasses.dataclass(frozen=True)
class QuadtreeGeometry:
    """All static geometry for a quadtree over a (H, W) leaf grid.

    ``levels[0]`` is the root (coarsest retained) level; ``levels[-1]`` is the
    leaf level (H, W). ``n_level == len(levels)``.
    """

    leaf_h: int
    leaf_w: int
    root_level: int
    levels: tuple[LevelGeometry, ...]

    @property
    def n_level(self) -> int:
        return len(self.levels)


@lru_cache(maxsize=64)
def build_geometry(h: int, w: int, root_level: int) -> QuadtreeGeometry:
    """Build static geometry tables for all retained pyramid levels.

    root_level indexes the size ladder (coarsest == 0), matching the
    reference's ``size_per_level[root_level]`` semantics
    (quadtree_builder.py:101-111). Negative indices work like Python indexing
    (root_level=-1 -> a single leaf-level "pyramid", i.e. temporal-only).
    """
    ladder = level_sizes(h, w)
    root_idx = root_level if root_level >= 0 else len(ladder) + root_level
    if not 0 <= root_idx < len(ladder):
        raise ValueError(f"root_level {root_level} out of range for ladder {ladder}")
    sizes = ladder[root_idx:]  # coarsest retained -> finest

    # Compose leaf->cell maps bottom-up.
    maps_y: list[np.ndarray] = [np.arange(h, dtype=np.int32)]
    maps_x: list[np.ndarray] = [np.arange(w, dtype=np.int32)]
    cur_h, cur_w = h, w
    for _ in range(len(sizes) - 1):
        step_y, step_x = up_map(cur_h), up_map(cur_w)
        maps_y.append(step_y[maps_y[-1]])
        maps_x.append(step_x[maps_x[-1]])
        cur_h, cur_w = math.ceil(cur_h / 2), math.ceil(cur_w / 2)
    maps_y.reverse()  # now coarsest -> finest
    maps_x.reverse()

    levels = []
    for (lh, lw), my, mx in zip(sizes, maps_y, maps_x):
        top = np.full(lh, h, dtype=np.int32)
        bot = np.full(lh, -1, dtype=np.int32)
        np.minimum.at(top, my, np.arange(h, dtype=np.int32))
        np.maximum.at(bot, my, np.arange(h, dtype=np.int32))
        left = np.full(lw, w, dtype=np.int32)
        right = np.full(lw, -1, dtype=np.int32)
        np.minimum.at(left, mx, np.arange(w, dtype=np.int32))
        np.maximum.at(right, mx, np.arange(w, dtype=np.int32))
        levels.append(
            LevelGeometry(
                h=lh,
                w=lw,
                leaf_to_cell_y=my,
                leaf_to_cell_x=mx,
                cell_top_y=top,
                cell_left_x=left,
                cell_bot_y=bot,
                cell_right_x=right,
            )
        )
    return QuadtreeGeometry(leaf_h=h, leaf_w=w, root_level=root_idx, levels=tuple(levels))
