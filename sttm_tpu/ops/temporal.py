"""Cross-frame (temporal) node merging — TPU-native.

The reference pads per-frame node lists into [T-1, M, M] and tests all-pairs
box containment (token_merging_utils/quadtree_temporal_merger.py:8-56). Key
observation used here: if nodes n1 (frame t) and n2 (frame t+1) satisfy the
containment condition, they share the top-left leaf of the smaller box, and at
that leaf frame t's owner is n1 and frame t+1's owner is n2. Hence the
per-leaf candidate set {(owner_t(y,x), owner_{t+1}(y,x))} covers every valid
pair at O(T*H*W) instead of O(T*M^2), with no dynamic shapes. Duplicate
candidates are harmless: the union step is an idempotent scatter-min, exactly
as in the reference fast path (which also feeds unfiltered pairs in).

The union step reproduces the reference's vectorized algorithm *exactly*
(scatter-amin + one pointer-doubling hop per iteration, convergence when
rep == rep[rep]; quadtree_temporal_merger.py:223-269) — including its
non-textbook fixpoint criterion — so merged groups match the reference
bit-for-bit on identical inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quadtree import DenseQuadtree, _per_head_cosine

__all__ = ["union_find_reference", "temporal_merge_dense"]


def union_find_reference(dst: jnp.ndarray, src: jnp.ndarray, valid: jnp.ndarray, n: int) -> jnp.ndarray:
    """Reference-equivalent vectorized union: returns final_representative [n].

    dst/src: [E] int32 node ids; valid: [E] bool. Invalid edges become
    self-edges (no-ops under scatter-amin).
    """
    dst = jnp.where(valid, dst, 0)
    src = jnp.where(valid, src, 0)
    rep0 = jnp.arange(n, dtype=jnp.int32)

    def body(state):
        rep, _ = state
        m = jnp.minimum(rep[dst], rep[src])
        rep = rep.at[dst].min(m).at[src].min(m)
        rep = rep[rep]
        done = jnp.all(rep[rep] == rep)
        return rep, done

    def cond(state):
        return ~state[1]

    rep, _ = jax.lax.while_loop(cond, body, (rep0, jnp.array(False)))
    return rep


def temporal_merge_dense(
    qt: DenseQuadtree,
    temporal_thresh: float,
    head_dim: int | None = None,
    t_valid=None,
):
    """Merge same-layout, high-similarity nodes across consecutive frames.

    Returns (keep [N] bool, final_rep [N] int32, merge_count [N] int32) over
    the flattened leaf grid N = T*H*W, where node ids are raster rep-leaf
    indices. ``keep`` marks surviving representatives;
    ``final_rep`` maps every node id to its surviving representative.
    Aggregation of features/metadata is done by the caller (it owns the
    weighted-avg policy), see :func:`sttm_tpu.ops.sttm.sttm_merge`.
    """
    t, h, w = qt.assign_level.shape
    n = t * h * w
    owner = qt.owner_1d  # [T, H, W]

    # Candidate pairs at every leaf between consecutive frames.
    cur, nxt = owner[:-1], owner[1:]  # [T-1, H, W]
    box_cur, box_nxt = qt.tlbr[:-1], qt.tlbr[1:]  # [T-1, H, W, 4]
    diff = box_cur.astype(jnp.int32) - box_nxt.astype(jnp.int32)
    cur_contains = (diff[..., :2] <= 0).all(-1) & (diff[..., 2:] >= 0).all(-1)
    nxt_contains = (diff[..., :2] >= 0).all(-1) & (diff[..., 2:] <= 0).all(-1)
    contain = cur_contains | nxt_contains

    sim = _per_head_cosine(qt.node_feat[:-1], qt.node_feat[1:], head_dim)  # [T-1, H, W]
    valid = contain & (sim >= temporal_thresh)
    if t_valid is not None:
        # frame bucketing: edges must stay within the real frames
        fidx = jnp.arange(t - 1)[:, None, None]
        valid = valid & (fidx + 1 < t_valid)

    final_rep = union_find_reference(cur.reshape(-1), nxt.reshape(-1), valid.reshape(-1), n)

    # A node survives iff it is some node's final representative. Count the
    # merge-group size per representative (only rep leaves are real nodes).
    is_node = qt.is_rep.reshape(-1)
    if t_valid is not None:
        tid = jnp.repeat(jnp.arange(t, dtype=jnp.int32), h * w)
        is_node = is_node & (tid < t_valid)
    node_ids = jnp.arange(n, dtype=jnp.int32)
    tgt = jnp.where(is_node, final_rep[node_ids], n)  # park non-nodes out of range
    count = jnp.zeros((n,), jnp.int32).at[tgt].add(1, mode="drop")
    keep = count > 0
    return keep, final_rep, count
