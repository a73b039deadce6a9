"""TokenReducer: first-class mid-layer token-reduction hook.

Replaces the reference's class-level monkey patching
(token_merging_monkey_patch/quadtree_attn_monkey_patch.py:88-117): the decoder
invokes ``apply_reducer`` once, during prefill, between layer groups. The
contract is the one the reference proves sufficient: slice
``[sys | video | inst]``, merge the video span, re-pack, and report the new
valid length; position embeddings for the shortened sequence are recomputed by
the caller (truncate-and-recompute, ref :114-115) or gathered from source
positions (pos_emb_ver 2, ..._for_abl_pos.py:100-136 / M-RoPE,
token_merging_qwen2vl_monkey_patch/...:109-113) via the returned ``src_pos``.

Static-shape contract (DESIGN.md §3): the merged sequence lives in a buffer of
static length ``s_merged = s_full - n_video + video_budget``; tokens are
packed [sys | merged video | inst] with traced valid length.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.dycoke import dycoke_output_len, dycoke_ttm
from ..ops.sttm import sttm_merge
from ..ops.tome import tome_merge, tome_schedule

__all__ = ["ReducerSpec", "apply_reducer", "merged_buffer_len"]


@dataclasses.dataclass(frozen=True)
class ReducerSpec:
    """Static reduction config (hashable; safe as a jit static arg).

    Mirrors the reference's sa_* flag family (llava/train/train.py:130-151).
    """

    kind: str  # "quadtree" | "tome" | "dycoke" | "fastv" | "pyrd" | "none"
    layer_idx: int
    t: int
    h: int
    w: int
    video_budget: int = -1  # quadtree merged-video buffer; -1 = no reduction in shape
    spatial_thresh: float = 0.9
    temporal_thresh: float = -1.0
    root_level: int = 0
    weighted_avg: bool = False
    sim_head_dim: int | None = None  # per-head similarity (sim_per_head)
    prune_ratio: float = 0.5  # tome / dycoke / fastv (FASTV_r eviction ratio)
    tome_per: str = "video"
    tome_n_head: int = 1
    pyrd_size: int = -1  # pyramid-drop output grid side (sa_pyrd_size_list)
    # 0: truncate+recompute; 1: pool/merge rope cos/sin maps through the
    # quadtree itself; 2: gather source position ids
    # (quadtree_attn_monkey_patch_for_abl_pos.py:100-136)
    pos_emb_ver: int = 0
    pos_emb_weighted_avg: bool = False
    # Round the merged BUFFER length up to this multiple (semantics
    # unchanged — the extra slots are padding past the valid length, masked
    # everywhere). Non-128-multiple merged lengths silently fall back from
    # the splash attention kernel to the XLA path; the harness pads to 128+.
    pad_multiple: int = 1

    @property
    def n_video(self) -> int:
        return self.t * self.h * self.w

    @property
    def needs_scores(self) -> bool:
        """FastV ranks tokens by the previous layer's last-token attention."""
        return self.kind == "fastv"

    @property
    def gathers_positions(self) -> bool:
        """fastv keeps source position ids (modeling_qwen2_baseline.py:296);
        pos_emb_ver 2 is the explicit gather ablation."""
        return self.pos_emb_ver == 2 or self.kind == "fastv"

    def video_out_len(self) -> int:
        """Static length of the merged-video buffer."""
        if self.kind == "quadtree":
            return self.n_video if self.video_budget < 0 else self.video_budget
        if self.kind == "tome":
            n = self.n_video if self.tome_per == "video" else self.h * self.w
            out = n - sum(tome_schedule(n, self.prune_ratio))
            return out * (1 if self.tome_per == "video" else self.t)
        if self.kind == "dycoke":
            return dycoke_output_len(self.t, self.h * self.w, self.prune_ratio)
        if self.kind == "octree":
            return self.n_video if self.video_budget < 0 else self.video_budget
        if self.kind == "fastv":
            # round() matches the reference's keep count (:286)
            return round(self.n_video * (1 - self.prune_ratio))
        if self.kind == "pyrd":
            return self.t * self.pyrd_size * self.pyrd_size
        if self.kind == "none":
            return self.n_video
        raise ValueError(f"unknown reducer kind {self.kind!r}")

    def out_grid(self) -> tuple[int, int, int]:
        """(t, h, w) seen by a subsequent chained reducer (pyrd stages
        shrink the grid; other kinds break the grid structure)."""
        if self.kind == "pyrd":
            return (self.t, self.pyrd_size, self.pyrd_size)
        if self.kind == "none":
            return (self.t, self.h, self.w)
        raise ValueError(f"{self.kind} output is not a regular grid")


def merged_buffer_len(spec: ReducerSpec, s_full: int) -> int:
    m = s_full - spec.n_video + spec.video_out_len()
    pm = spec.pad_multiple
    return ((m + pm - 1) // pm) * pm


def apply_reducer(
    spec: ReducerSpec, hidden: jnp.ndarray, video_start, valid_len, scores=None,
    rope_maps=None, t_valid=None,
):
    """Reduce the video span of ``hidden`` [1, S_full, D].

    ``scores``: [S_full] fp32 last-token attention over the sequence from the
    layer below the boundary (FastV only). ``rope_maps``: (cos, sin) [S_full,
    hd] maps to pool/merge alongside the features (pos_emb_ver 1, quadtree
    only). Returns (new_hidden [1, S_merged, D], new_valid_len, n_video_kept,
    src_pos [S_merged] int32, merged_rope_maps|None, n_kept_raw) where src_pos
    maps each packed slot to its source position in the original sequence and
    n_kept_raw is the UNCLAMPED kept-token count: when the merge keeps more
    than the static ``video_budget`` the raster tail is dropped (a parity
    break vs the budget-free reference) — callers must surface
    ``n_kept_raw - n_kept`` as the budget overflow rather than hide it.
    """
    _, s_full, d = hidden.shape
    nv = spec.n_video
    video = jax.lax.dynamic_slice(hidden[0], (video_start, 0), (nv, d))
    vid_rope = None

    if spec.kind == "quadtree":
        grid = video.reshape(spec.t, spec.h, spec.w, d)
        payloads = {}
        if rope_maps is not None:
            for name, m in zip(("cos", "sin"), rope_maps):
                vm = jax.lax.dynamic_slice(m, (video_start, 0), (nv, m.shape[-1]))
                payloads[name] = (
                    vm.reshape(spec.t, spec.h, spec.w, -1),
                    "sum" if spec.pos_emb_weighted_avg else "avg",
                )
        res = sttm_merge(
            grid,
            spec.spatial_thresh,
            spec.temporal_thresh,
            spec.root_level,
            spec.weighted_avg,
            spec.sim_head_dim,
            payloads=payloads,
            payload_weighted_avg=spec.pos_emb_weighted_avg,
            t_valid=t_valid,
        )
        budget = spec.video_out_len()
        rank = jnp.cumsum(res.keep.astype(jnp.int32)) - 1
        slot = jnp.where(res.keep & (rank < budget), rank, budget)
        vid_feat = jnp.zeros((budget, d), hidden.dtype).at[slot].set(
            res.feat.astype(hidden.dtype), mode="drop"
        )
        vid_src = jnp.zeros((budget,), jnp.int32).at[slot].set(
            jnp.arange(nv, dtype=jnp.int32), mode="drop"
        )
        n_raw = res.keep.sum().astype(jnp.int32)
        n_kept = jnp.minimum(n_raw, budget).astype(jnp.int32)
        if rope_maps is not None:
            vid_rope = tuple(
                jnp.zeros((budget, res.payloads[name].shape[-1]), jnp.float32)
                .at[slot]
                .set(res.payloads[name], mode="drop")
                for name in ("cos", "sin")
            )
    elif spec.kind == "tome":
        grid = video.reshape(spec.t, spec.h * spec.w, d)
        vid_feat, vid_src = tome_merge(grid, spec.prune_ratio, spec.tome_n_head, spec.tome_per)
        vid_feat = vid_feat.astype(hidden.dtype)
        n_kept = jnp.int32(vid_feat.shape[0])
    elif spec.kind == "dycoke":
        vid_feat, vid_src = dycoke_ttm(video, spec.t, spec.prune_ratio)
        vid_feat = vid_feat.astype(hidden.dtype)
        n_kept = jnp.int32(vid_feat.shape[0])
    elif spec.kind == "octree":
        from ..ops.octree import octree_merge

        grid = video.reshape(spec.t, spec.h, spec.w, d)
        keep, feat = octree_merge(grid, spec.spatial_thresh, spec.root_level, spec.sim_head_dim)
        budget = spec.video_out_len()
        rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        slot = jnp.where(keep & (rank < budget), rank, budget)
        vid_feat = jnp.zeros((budget, d), hidden.dtype).at[slot].set(
            feat.astype(hidden.dtype), mode="drop"
        )
        vid_src = jnp.zeros((budget,), jnp.int32).at[slot].set(
            jnp.arange(nv, dtype=jnp.int32), mode="drop"
        )
        n_raw = keep.sum().astype(jnp.int32)
        n_kept = jnp.minimum(n_raw, budget).astype(jnp.int32)
    elif spec.kind == "fastv":
        # rank image tokens by last-token attention from the layer below
        # (modeling_qwen2_baseline.py:280-296); keep top (1-r), positional
        # order preserved by the rank-compaction below
        if scores is None:
            raise ValueError("fastv reducer requires attention scores")
        img_scores = jax.lax.dynamic_slice(scores, (video_start,), (nv,))
        n_keep = spec.video_out_len()
        _, top_idx = jax.lax.top_k(img_scores, n_keep)
        keep = jnp.zeros((nv,), bool).at[top_idx].set(True)
        rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        slot = jnp.where(keep, rank, n_keep)
        vid_feat = jnp.zeros((n_keep, d), hidden.dtype).at[slot].set(video, mode="drop")
        vid_src = jnp.zeros((n_keep,), jnp.int32).at[slot].set(
            jnp.arange(nv, dtype=jnp.int32), mode="drop"
        )
        n_kept = jnp.int32(n_keep)
    elif spec.kind == "pyrd":
        # pyramid-drop: nearest-neighbor grid resize (torch F.interpolate
        # default mode, pyrd_attn_monkey_patch.py:99-100)
        s_out = spec.pyrd_size
        iy = (jnp.arange(s_out) * spec.h) // s_out
        ix = (jnp.arange(s_out) * spec.w) // s_out
        grid = video.reshape(spec.t, spec.h, spec.w, d)
        resized = grid[:, iy][:, :, ix]  # [t, s_out, s_out, d]
        vid_feat = resized.reshape(spec.t * s_out * s_out, d)
        src_leaf = (
            jnp.arange(spec.t, dtype=jnp.int32)[:, None, None] * (spec.h * spec.w)
            + iy.astype(jnp.int32)[None, :, None] * spec.w
            + ix.astype(jnp.int32)[None, None, :]
        ).reshape(-1)
        vid_src = src_leaf
        n_kept = jnp.int32(vid_feat.shape[0])
    elif spec.kind == "none":
        vid_feat, vid_src = video, jnp.arange(nv, dtype=jnp.int32)
        n_kept = jnp.int32(nv)
    else:
        raise ValueError(f"unknown reducer kind {spec.kind!r}")

    if spec.kind not in ("quadtree", "octree"):
        n_raw = n_kept  # fixed-output kinds can't overflow
    budget = vid_feat.shape[0]
    s_merged = merged_buffer_len(spec, s_full)  # incl. pad_multiple rounding
    new_valid = valid_len - nv + n_kept

    # Re-pack [sys | merged video | inst] with one scatter per part.
    src_i = jnp.arange(s_full, dtype=jnp.int32)
    is_sys = src_i < video_start
    is_inst = src_i >= video_start + nv
    tgt = jnp.where(is_sys, src_i, jnp.where(is_inst, src_i - nv + n_kept, s_merged))
    tgt = jnp.where(tgt < s_merged, tgt, s_merged)
    new_hidden = jnp.zeros((s_merged, d), hidden.dtype).at[tgt].set(hidden[0], mode="drop")
    new_src = jnp.zeros((s_merged,), jnp.int32).at[tgt].set(src_i, mode="drop")

    vslot = jnp.arange(budget, dtype=jnp.int32)
    vtgt = jnp.where(vslot < n_kept, video_start + vslot, s_merged)
    new_hidden = new_hidden.at[vtgt].set(vid_feat, mode="drop")
    new_src = new_src.at[vtgt].set(vid_src + video_start, mode="drop")

    new_rope = None
    if rope_maps is not None:
        if vid_rope is None:
            raise ValueError("pos_emb_ver=1 rope pooling is quadtree-only")
        new_rope = []
        for m, vm in zip(rope_maps, vid_rope):
            packed = jnp.zeros((s_merged, m.shape[-1]), jnp.float32).at[tgt].set(
                m.astype(jnp.float32), mode="drop"
            )
            packed = packed.at[vtgt].set(vm, mode="drop")
            new_rope.append(packed)
        new_rope = tuple(new_rope)

    return new_hidden[None], new_valid, n_kept, new_src, new_rope, n_raw
