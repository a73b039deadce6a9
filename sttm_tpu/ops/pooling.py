"""Stride-2 pooling with the reference's odd-size "stripe" semantics.

Reference behavior (token_merging_utils/quadtree_spatial_merger.py:9-153):
pooling an odd-sized side keeps the first row/col as 1-wide stripes. We get
identical numerics with a padding trick instead of the reference's four-branch
slice assembly:

  * avg/min/max: duplicate the first row/col when the side is odd, then do a
    plain 2x2 pool. The duplicated cell pairs reduce to the original value for
    min/max and to the exact stripe mean for avg (mean(a, a, b, c) over a
    duplicated row equals mean over the 1x2 stripe only when the stripe is
    duplicated along the OTHER axis, which is exactly what happens: the (0, j)
    block becomes {x[0, 2j-1], x[0, 2j]} duplicated once each).
  * sum: zero-pad instead, so nothing is double counted.

Layout is channel-last [T, H, W, C] (C on TPU lanes).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pool_to_even_side", "pool_leaf_sim_min"]


def _pad_front(x: jnp.ndarray, axis: int, mode: str) -> jnp.ndarray:
    """Prepend one slice along axis: duplicate for avg/min/max, zeros for sum."""
    first = jnp.take(x, jnp.array([0]), axis=axis)
    if mode == "sum":
        first = jnp.zeros_like(first)
    return jnp.concatenate([first, x], axis=axis)


def _pool2x2(x: jnp.ndarray, mode: str) -> jnp.ndarray:
    t, h, w, c = x.shape
    x = x.reshape(t, h // 2, 2, w // 2, 2, c)
    if mode == "avg":
        return x.mean(axis=(2, 4))
    if mode == "sum":
        return x.sum(axis=(2, 4))
    if mode == "min":
        return x.min(axis=(2, 4))
    if mode == "max":
        return x.max(axis=(2, 4))
    raise ValueError(f"unknown pool mode {mode!r}")


def pool_to_even_side(x: jnp.ndarray, mode: str = "avg") -> jnp.ndarray:
    """Pool [T, H, W, C] -> [T, ceil(H/2), ceil(W/2), C] with stripe semantics."""
    _, h, w, _ = x.shape
    if h % 2 == 1:
        x = _pad_front(x, axis=1, mode=mode)
    if w % 2 == 1:
        x = _pad_front(x, axis=2, mode=mode)
    return _pool2x2(x, mode)


def pool_leaf_sim_min(sim: jnp.ndarray) -> jnp.ndarray:
    """Min-pool a child-grid map [T, H, W] to the parent grid.

    Used for the quadtree stop decision: ``stop = min(child sims) >= thresh``
    is the dense equivalent of the reference's ``(sim >= t).all(dim=-1)`` over
    valid children (quadtree_builder.py:68); stripe cells simply contribute
    fewer distinct children via the duplicate pad.
    """
    return pool_to_even_side(sim[..., None], mode="min")[..., 0]
