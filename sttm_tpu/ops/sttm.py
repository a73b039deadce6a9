"""STTM: multi-granular spatio-temporal token merging (top-level op).

Functional equivalent of the reference's ``quadtree_build_video``
(token_merging_utils/quadtree_builder.py:85-235) +
``cross_frame_node_merging_fast`` (quadtree_temporal_merger.py:271-287),
re-architected densely for TPU (see DESIGN.md §1-3). Output token order is
raster order of surviving nodes' top-left leaves — identical to the
reference's 1d-index sort (quadtree_builder.py:197-203).
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax.numpy as jnp

from .quadtree import quadtree_spatial
from .temporal import temporal_merge_dense

__all__ = ["MergeResult", "sttm_merge", "compact_tokens"]


@dataclasses.dataclass
class MergeResult:
    """Dense merge result over the flattened leaf grid N = T*H*W.

    ``keep`` marks surviving tokens at their raster positions; gathering the
    kept entries of ``feat`` in raster order reproduces the reference's merged
    token sequence exactly. ``src_1d`` at kept positions is the surviving
    node's (t, y_tl, x_tl) raster id (== the position itself), used for
    position-id / M-RoPE remapping after merging.
    """

    keep: jnp.ndarray  # [N] bool
    feat: jnp.ndarray  # [N, C]
    num_patch: jnp.ndarray  # [N] int32
    tlbr: jnp.ndarray  # [N, 5] int32 (t, top, left, bot_excl, right_excl)
    payloads: dict  # name -> [N, D]

    @property
    def n_kept(self) -> jnp.ndarray:
        return self.keep.sum()


def sttm_merge(
    video_feat: jnp.ndarray,
    spatial_thresh: float,
    temporal_thresh: float = -1.0,
    root_level: int = 0,
    weighted_avg: bool = False,
    head_dim: int | None = None,
    payloads: Mapping[str, tuple[jnp.ndarray, str]] | None = None,
    payload_weighted_avg: bool = False,
    t_valid=None,
) -> MergeResult:
    """Merge video tokens. ``video_feat``: [T, H, W, C].

    ``t_valid`` (traced scalar, optional): only the first t_valid frames are
    real — trailing pad frames are fully excluded from pairing, aggregation
    and the keep set, making bucketed runs exactly equal to unbucketed ones.

    ``payloads``: name -> ([T, H, W, D] tensor, pool_mode) pooled through the
    quadtree and aggregated across frames alongside features (the reference's
    pos-emb ablation path, quadtree_builder.py:92-117).
    """
    t, h, w, c = video_feat.shape
    n = t * h * w
    qt = quadtree_spatial(
        video_feat, spatial_thresh, root_level, weighted_avg, head_dim, payloads
    )

    flat_feat = qt.node_feat.reshape(n, c).astype(jnp.float32)
    flat_np = qt.num_patches.reshape(n)
    tid = jnp.repeat(jnp.arange(t, dtype=jnp.int32), h * w)
    flat_tlbr = jnp.concatenate([tid[:, None], qt.tlbr.reshape(n, 4)], axis=-1)
    flat_payload = {k: v.reshape(n, -1).astype(jnp.float32) for k, v in qt.payload_nodes.items()}
    is_node = qt.is_rep.reshape(n)
    if t_valid is not None:
        is_node = is_node & (tid < t_valid)

    if temporal_thresh <= 0:
        # Spatial only: every rep node survives.
        feat = flat_feat
        num_patch = flat_np
        if weighted_avg:
            feat = feat / jnp.maximum(num_patch[:, None], 1)
        pay = flat_payload
        if payload_weighted_avg:
            pay = {k: v / jnp.maximum(num_patch[:, None], 1) for k, v in pay.items()}
        return MergeResult(
            keep=is_node,
            feat=feat.astype(video_feat.dtype),
            num_patch=num_patch,
            tlbr=flat_tlbr,
            payloads=pay,
        )

    keep, final_rep, count = temporal_merge_dense(qt, temporal_thresh, head_dim, t_valid)

    # Aggregate features/metadata over merge groups (reference
    # agg_feature_and_metadata, quadtree_temporal_merger.py:123-171).
    ids = jnp.arange(n, dtype=jnp.int32)
    tgt = jnp.where(is_node, final_rep, n)  # park non-node leaves out of range
    zero_nonnode = is_node[:, None].astype(flat_feat.dtype)
    feat_accum = jnp.zeros((n, c), jnp.float32).at[tgt].add(flat_feat * zero_nonnode, mode="drop")
    np_accum = jnp.zeros((n,), jnp.int32).at[tgt].add(jnp.where(is_node, flat_np, 0), mode="drop")

    if weighted_avg:
        denom = jnp.maximum(np_accum, 1)[:, None].astype(jnp.float32)
    else:
        denom = jnp.maximum(count, 1)[:, None].astype(jnp.float32)
    feat = feat_accum / denom

    pay_out = {}
    for k, v in flat_payload.items():
        acc = jnp.zeros_like(v).at[tgt].add(v * zero_nonnode, mode="drop")
        pd = (
            jnp.maximum(np_accum, 1)[:, None].astype(jnp.float32)
            if payload_weighted_avg
            else jnp.maximum(count, 1)[:, None].astype(jnp.float32)
        )
        pay_out[k] = acc / pd

    return MergeResult(
        keep=keep,
        feat=feat.astype(video_feat.dtype),
        num_patch=np_accum,
        tlbr=flat_tlbr,
        payloads=pay_out,
    )


def compact_tokens(keep: jnp.ndarray, budget: int, *tensors: jnp.ndarray):
    """Pack kept rows to the front of a static ``budget``-sized buffer.

    Returns (n_kept, src_idx [budget] int32, packed tensors...). Rows past the
    budget (raster-last) are dropped; ``src_idx`` holds each packed slot's
    source row (arbitrary value at invalid slots — mask with ``arange <
    n_kept``). This is the static-shape stand-in for the reference's
    boolean-mask indexing (DESIGN.md §3).
    """
    n = keep.shape[0]
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1  # rank among kept, -1 pad
    slot = jnp.where(keep, rank, budget)  # park dropped rows out of range
    slot = jnp.where(slot < budget, slot, budget)
    src_idx = jnp.zeros((budget,), jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    n_kept = jnp.minimum(keep.sum(), budget)
    packed = tuple(
        jnp.zeros((budget,) + t.shape[1:], t.dtype).at[slot].set(t, mode="drop") for t in tensors
    )
    return (n_kept, src_idx) + packed
