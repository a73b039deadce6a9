"""ToMe bipartite soft matching — static-shape TPU version.

Reference: token_merging_utils/tome_token_merger.py:13-152. The reference
loops "merge up to 50% per round" until the target count is reached; the
per-round removal counts depend only on (num_tokens, target), both static
under jit, so we unroll the rounds with fully static shapes.

Per round (on the current token list of length n, removing r):
  a = tokens[::2], b = tokens[1::2]; scores = cos(a, b);
  each a-token's best b-match; the r highest-similarity a-tokens merge into
  their match (size-weighted average); new order = [unmerged-a (by descending
  edge rank), b]. Original token indices are tracked for position reuse.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["tome_schedule", "tome_merge"]


def tome_schedule(num_tokens: int, prune_ratio: float) -> list[int]:
    """Static per-round removal counts (r_i), mirroring the reference loop."""
    tgt = math.ceil(num_tokens * (1 - prune_ratio))
    rs, cur, first = [], num_tokens, True
    while first or cur > tgt:
        first = False
        r = max(min(cur - tgt, cur // 2), 0)
        rs.append(r)
        cur -= r
    return rs


def _round(x, size, token_idx, r, n_head):
    """One bipartite-matching round. x: [B, n, C]; size: [B, n, 1]."""
    b, n, c = x.shape
    metric = x.astype(jnp.float32).reshape(b, n, n_head, c // n_head).mean(2)
    metric = metric / jnp.maximum(jnp.linalg.norm(metric, axis=-1, keepdims=True), 1e-8)
    ma, mb = metric[:, ::2], metric[:, 1::2]
    # similarity ranking is threshold/cutoff sensitive: force full fp32 MXU
    # precision (jax's default matmul precision is bf16-equivalent)
    scores = jnp.einsum("bic,bjc->bij", ma, mb, precision=jax.lax.Precision.HIGHEST)
    node_max = scores.max(-1)
    node_idx = scores.argmax(-1)  # [B, na]
    edge_idx = jnp.argsort(-node_max, axis=-1)  # descending similarity
    unm_idx = edge_idx[:, r:]
    src_idx = edge_idx[:, :r]
    dst_idx = jnp.take_along_axis(node_idx, src_idx, axis=-1)  # [B, r]

    def merge(v):
        src, dst = v[:, ::2], v[:, 1::2]
        unm = jnp.take_along_axis(src, unm_idx[..., None], axis=1)
        moved = jnp.take_along_axis(src, src_idx[..., None], axis=1)
        bi = jnp.arange(b)[:, None]
        dst = dst.at[bi, dst_idx].add(moved)
        return jnp.concatenate([unm, dst], axis=1)

    def gather_only(v):
        src, dst = v[:, ::2], v[:, 1::2]
        unm = jnp.take_along_axis(src, unm_idx[..., None], axis=1)
        return jnp.concatenate([unm, dst], axis=1)

    x = merge(x * size) / merge(size)
    size = merge(size)
    token_idx = gather_only(token_idx)
    return x, size, token_idx


def tome_merge(x: jnp.ndarray, prune_ratio: float, n_head: int = 1, per: str = "video"):
    """Merge tokens. x: [T, H, W, C] (or [T, P, C]).

    per="frame": each frame is a batch element (tome_per_frame,
    tome_token_merger.py:112). per="video": one sequence over all tokens
    (tome_per_video, :133). Returns (merged [B, n_out, C] flattened to
    [B*n_out, C], token_idx [B*n_out] int32 into the flattened input).
    """
    if x.ndim == 4:
        t, h, w, c = x.shape
        x = x.reshape(t, h * w, c)
    t, p, c = x.shape
    if per == "video":
        x = x.reshape(1, t * p, c)
    elif per != "frame":
        raise ValueError(f"per must be 'frame' or 'video', got {per!r}")
    b, n, _ = x.shape

    size = jnp.ones((b, n, 1), x.dtype)
    token_idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :, None], (b, n, 1))
    for r in tome_schedule(n, prune_ratio):
        if r <= 0:
            continue
        x, size, token_idx = _round(x, size, token_idx, r, n_head)

    n_out = x.shape[1]
    # flatten batch with per-frame index offsets (original flat positions)
    offs = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
    flat_idx = (token_idx[..., 0] + offs).reshape(-1)
    return x.reshape(b * n_out, c), flat_idx
