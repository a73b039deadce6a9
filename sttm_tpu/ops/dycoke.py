"""DyCoke stage-1 temporal token merging (TTM) — static-shape TPU version.

Reference: token_merging_utils/dycoke_merger.py:8-83. Semantics:

  * pass 1 (even pairs): for frames (2j, 2j+1), keep frame 2j fully; in frame
    2j+1 keep the ``int((1-prune_ratio) * P)`` tokens *least* similar (cosine,
    per token position) to frame 2j. A trailing unpaired frame is kept fully.
  * pass 2 (stride 4): for i in 0, 4, 8, ... (i <= T-5), frame i+2 (previously
    kept fully) is re-pruned to the K tokens least similar to frame i.

Kept-token order inside a pruned frame follows ascending similarity (the
reference's ``topk(largest=False)`` index order), not positional order. All
block sizes are static, so the output length is static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["dycoke_ttm", "dycoke_output_len"]


def _cos_per_token(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    num = (a * b).sum(-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    return num / jnp.maximum(den, 1e-8)


def _block_plan(num_frames: int, p: int, keep: int):
    """Static plan: per output block, (frame, kind) where kind is 'full' or
    ('pruned', ref_frame)."""
    plan: list[tuple[int, object]] = []
    for i in range(0, num_frames - 1, 2):
        plan.append((i, "full"))
        plan.append((i + 1, ("pruned", i)))
    if len(plan) < num_frames:
        plan.append((len(plan), "full"))
    # pass 2 overwrites blocks at even positions i+2
    for i in range(0, num_frames - 4, 4):
        plan[i + 2] = (i + 2, ("pruned", i))
    return plan


def dycoke_output_len(num_frames: int, num_tokens_per_frame: int, prune_ratio: float) -> int:
    keep = int((1 - prune_ratio) * num_tokens_per_frame)
    plan = _block_plan(num_frames, num_tokens_per_frame, keep)
    return sum(num_tokens_per_frame if kind == "full" else keep for _, kind in plan)


def dycoke_ttm(image_feature: jnp.ndarray, num_frames: int, prune_ratio: float = 0.7):
    """image_feature: [T*P, C] flattened video tokens.

    Returns (kept_tokens [N_out, C], kept_indices [N_out] int32) with N_out
    static. Matches the reference's output ordering.
    """
    n, c = image_feature.shape
    p = n // num_frames
    keep = int((1 - prune_ratio) * p)
    frames = image_feature.reshape(num_frames, p, c)
    plan = _block_plan(num_frames, p, keep)

    pos = jnp.arange(p, dtype=jnp.int32)
    feats, idxs = [], []
    for frame, kind in plan:
        if kind == "full":
            feats.append(frames[frame])
            idxs.append(pos + frame * p)
        else:
            ref = kind[1]
            sim = _cos_per_token(frames[ref], frames[frame])
            # k least similar, in ascending-similarity order (reference topk
            # largest=False index order)
            _, sel = jax.lax.top_k(-sim, keep)
            feats.append(frames[frame][sel])
            idxs.append(sel.astype(jnp.int32) + frame * p)
    return jnp.concatenate(feats, 0), jnp.concatenate(idxs, 0)
