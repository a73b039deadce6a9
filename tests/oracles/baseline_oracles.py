"""NumPy oracles for ToMe and DyCoke, written plainly from the spec."""

from __future__ import annotations

import math

import numpy as np


def tome_oracle(x: np.ndarray, prune_ratio: float, n_head: int = 1, per: str = "video"):
    """x: [T, P, C]. Returns (merged [M, C], flat token indices [M])."""
    t, p, c = x.shape
    batches = x.reshape(1, t * p, c) if per == "video" else x
    outs, out_idx = [], []
    for bi, tokens in enumerate(batches):
        tokens = tokens.astype(np.float64)
        sizes = np.ones(len(tokens))
        idxs = np.arange(len(tokens))
        tgt = math.ceil(len(tokens) * (1 - prune_ratio))
        first = True
        while first or len(tokens) > tgt:
            first = False
            n = len(tokens)
            r = max(min(n - tgt, n // 2), 0)
            if r <= 0:
                break
            # similarity ranking in float32 — the implementation (and the
            # reference, which stays in model dtype) ranks in working
            # precision; fp64 ranking can flip near-tied edges at the cutoff
            metric = tokens.astype(np.float32).reshape(n, n_head, c // n_head).mean(1)
            metric = metric / np.maximum(np.linalg.norm(metric, axis=-1, keepdims=True), 1e-8)
            a, b = metric[::2], metric[1::2]
            scores = (a @ b.T).astype(np.float32)
            best = scores.max(1)
            match = scores.argmax(1)
            order = np.argsort(-best)  # descending similarity among a-tokens
            merged_a = order[:r]
            unmerged_a = order[r:]
            # size-weighted merge of a-tokens into their b matches
            wa = tokens * sizes[:, None]
            new_w = [wa[::2][unmerged_a]]
            dst_w = wa[1::2].copy()
            dst_s = sizes[1::2].copy()
            new_s = [sizes[::2][unmerged_a]]
            for ai in merged_a:
                dst_w[match[ai]] += wa[::2][ai]
                dst_s[match[ai]] += sizes[::2][ai]
            tokens = np.concatenate([np.concatenate(new_w), dst_w]) / np.concatenate(
                [np.concatenate(new_s), dst_s]
            )[:, None]
            sizes = np.concatenate([np.concatenate(new_s), dst_s])
            idxs = np.concatenate([idxs[::2][unmerged_a], idxs[1::2]])
        offset = bi * p if per == "frame" else 0
        outs.append(tokens)
        out_idx.append(idxs + offset)
    return np.concatenate(outs), np.concatenate(out_idx)


def dycoke_oracle(x: np.ndarray, num_frames: int, prune_ratio: float):
    """x: [T*P, C]. Returns (kept [M, C], kept flat indices [M])."""
    n, c = x.shape
    p = n // num_frames
    keep = int((1 - prune_ratio) * p)
    frames = x.reshape(num_frames, p, c).astype(np.float64)

    def cos(a, b):
        return (a * b).sum(-1) / np.maximum(
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), 1e-8
        )

    blocks, indices = [], []
    for i in range(0, num_frames - 1, 2):
        blocks.append(frames[i])
        indices.append(np.arange(p) + i * p)
        sim = cos(frames[i], frames[i + 1])
        sel = np.argsort(sim, kind="stable")[:keep]  # least similar, ascending
        blocks.append(frames[i + 1][sel])
        indices.append(sel + (i + 1) * p)
    if len(blocks) < num_frames:
        i = len(blocks)
        blocks.append(frames[i])
        indices.append(np.arange(p) + i * p)
    for i in range(0, num_frames - 4, 4):
        sim = cos(frames[i], frames[i + 2])
        sel = np.argsort(sim, kind="stable")[:keep]
        blocks[i + 2] = frames[i + 2][sel]
        indices[i + 2] = sel + (i + 2) * p
    return np.concatenate(blocks), np.concatenate(indices)
