"""FrameFusion: layerwise progressive merge-then-prune under a FLOP budget.

Behavioral port of the reference baseline (llava/model/framefusion/main.py:
9-287): at every prefill layer, merge consecutive same-patch-position tokens
whose cosine similarity >= 0.6 (runs merge into the run's first token,
averaged) until the per-layer budget from ``cost`` is exhausted; then one
attention-score pruning pass (head- and query-mean) drops the least-attended
image tokens to hit the budget (``_compute_pruning_ratio``, main.py:264-286).

TPU-native redesign: the sequence stays at a static length with a dense
``alive`` mask; "consecutive same-patch tokens" become previous-alive-neighbor
gathers in static by-patch order; run merging is a cummax segment-average; the
data-dependent phase flags (finish_merging/finish_pruning) are traced booleans
gating lax.cond branches. Attention masks dead tokens instead of reshaping.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import qwen2
from ..models.config import DecoderConfig
from ..ops.attention import mha

__all__ = ["FrameFusionSpec", "build_prefill_framefusion"]

IGNORE = -2.0


@dataclasses.dataclass(frozen=True)
class FrameFusionSpec:
    cost: float  # FLOP budget fraction (sa_framefusion_cost)
    t: int = 0
    h: int = 0
    w: int = 0
    similarity_lower_bound: float = 0.6
    ratio_lower_bound: float = 0.1
    # False = merge-only variant (the reference's replace_Qwen2_merging mode,
    # framefusion interface mode="merging")
    enable_prune: bool = True
    # Explicit per-token patch types over the FULL static sequence (-1 =
    # text, >= 0 = patch group), host-known at trace time. This is the
    # front-end contract the reference's non-LLaVA families emit: MiniCPM-V
    # assigns position-within-frame indices (including its +2 slice-boundary
    # quirk, framefusion/models/minicpmv/modeling_minicpmv.py:92-98) and
    # LLaVA-NeXT-Video assigns per-FRAME indices
    # (framefusion/models/llava_next_video/modeling_llava_next_video.py:
    # 230-237). When set, (t, h, w) geometry and the traced video_start are
    # ignored — the layout is fully static.
    patch_type: tuple | None = None
    # Compaction: at layer ``compact_at_layer`` (> 0), gather the surviving
    # tokens into a static budget buffer so layers >= C actually run at the
    # reduced length — the compute saving the reference gets from physically
    # shrinking the sequence (framefusion/main.py:100-117), which the dense
    # alive-mask design alone does not. Exact whenever merging AND pruning
    # finished before layer C (reported as ``compact_exact``; with typical
    # cost budgets both finish within the first few layers). Surviving video
    # tokens beyond ``compact_budget`` are dropped raster-last and reported
    # as ``compact_overflow``. 0 = off (pure mask mode).
    compact_at_layer: int = 0
    compact_budget: int = 0  # video slots after compaction (0 = auto)

    @property
    def compact_video_budget(self) -> int:
        if self.compact_budget:
            return self.compact_budget
        # auto: the FLOP-budget share of video tokens plus 10% + 8 slack
        return min(self.n_video, int(np.ceil(self.cost * self.n_video * 1.1)) + 8)

    @property
    def n_video(self) -> int:
        if self.patch_type is not None:
            return int((np.asarray(self.patch_type) >= 0).sum())
        return self.t * self.h * self.w

    @property
    def patch_num(self) -> int:
        if self.patch_type is not None:
            return int(max(self.patch_type)) + 1
        return self.h * self.w


def _patch_layout(spec: FrameFusionSpec):
    """Static by-patch traversal: (offsets-or-indices [N], patch types [N],
    absolute video indices [N] or None).

    Reference semantics (compute_similarity_and_token_index_by_patch,
    main.py:148-152): group tokens by patch-type value, within a group keep
    sequence order (torch.where over ``pt == arange(patch_num)[:, None]``).
    Geometry mode returns video-relative offsets (add the traced video_start);
    explicit mode returns absolute indices (layout is static).
    """
    if spec.patch_type is not None:
        ptf = np.asarray(spec.patch_type, np.int64)
        vid_idx = np.where(ptf >= 0)[0]
        o = np.argsort(ptf[vid_idx], kind="stable")
        return (
            np.asarray(vid_idx[o], np.int32),
            np.asarray(ptf[vid_idx][o], np.int32),
            np.asarray(vid_idx, np.int32),
        )
    p, t = spec.patch_num, spec.t
    offs = np.arange(t * p).reshape(t, p).T.reshape(-1)  # [P*T] video offsets
    pt = np.arange(p, dtype=np.int32).repeat(t)
    return np.asarray(offs, np.int32), pt, None


def _merge_step(spec: FrameFusionSpec, x, alive, video_start, state, layer_idx, n_layers):
    """One layer's merging phase. x: [S, D] fp32-accumulatable; alive: [S];
    state: (s_prod, total_calc, finish_merging, finish_pruning)."""
    s_prod, total_calc, fin_m, fin_p = state
    offs, pt_np, abs_idx = _patch_layout(spec)
    if abs_idx is None:
        order = jnp.asarray(offs) + video_start  # [N] seq indices
    else:
        order = jnp.asarray(offs)  # already absolute (static layout)
    n = order.shape[0]
    pt = jnp.asarray(pt_np)

    xv = x[order]  # by-patch video tokens [N, D]
    av = alive[order]
    idx = jnp.arange(n, dtype=jnp.int32)

    # previous alive same-patch neighbor in by-patch order
    prev = jax.lax.cummax(jnp.where(av, idx, -1))
    prev_excl = jnp.concatenate([jnp.full((1,), -1, jnp.int32), prev[:-1]])
    has_prev = (prev_excl >= 0) & (pt[jnp.maximum(prev_excl, 0)] == pt)

    a = xv.astype(jnp.float32)
    b = a[jnp.maximum(prev_excl, 0)]
    num = (a * b).sum(-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    sim = jnp.where(av & has_prev, num / jnp.maximum(den, 1e-8), IGNORE)

    frame_token_num = av.sum()
    cand = sim >= spec.similarity_lower_bound
    n_cand = cand.sum()
    ratio = n_cand / jnp.maximum(frame_token_num, 1)

    # budget solver (main.py:264-286)
    remain = n_layers * spec.cost - total_calc
    frac = remain / jnp.maximum((n_layers - layer_idx) * s_prod, 1e-8)
    bound = jnp.where(frac > 1.0, 0.0, 1.0 - frac)

    under = ratio < bound
    # over-budget branch: merge only the top (bound * frame_tokens) similar
    k = jnp.floor(bound * frame_token_num).astype(jnp.int32)
    rank = jnp.argsort(jnp.argsort(-sim))  # descending rank per entry
    m_over = cand & (rank < k)
    m = jnp.where(under, cand, m_over)
    m = m & ~fin_m  # no-op once merging finished

    # run merging: members accumulate into the run-start token (average).
    # run starts must be alive AND unmerged (dead tokens were removed from
    # the reference's sequence, so runs skip them)
    rep = jax.lax.cummax(jnp.where(~m & av, idx, -1))  # run start per entry
    cnt = jnp.zeros((n,), jnp.int32).at[rep].add(av.astype(jnp.int32), mode="drop")
    acc = jnp.zeros_like(a).at[rep].add(jnp.where(av[:, None], a, 0.0), mode="drop")
    merged = acc / jnp.maximum(cnt, 1)[:, None]
    new_xv = jnp.where((~m & av)[:, None], jnp.where((cnt > 1)[:, None], merged, a), a)
    new_av = av & ~m

    x = x.at[order].set(new_xv.astype(x.dtype))
    alive = alive.at[order].set(new_av)

    # budget bookkeeping (only under-budget merge layers append sparsity,
    # main.py:92-99) + phase transitions
    n_merged = (m & av).sum()
    layer_sparsity = n_merged / jnp.maximum(frame_token_num, 1)
    upd = ~fin_m & under
    s_prod2 = jnp.where(upd, s_prod * (1.0 - layer_sparsity), s_prod)
    total2 = jnp.where(upd, total_calc + s_prod2, total_calc)
    new_fin_m = jnp.where(
        fin_m, fin_m, jnp.where(under, ratio < spec.ratio_lower_bound, True)
    )
    new_fin_p = jnp.where(fin_m, fin_p, jnp.where(under, fin_p, True))
    return x, alive, (s_prod2, total2, new_fin_m, new_fin_p)


def _attention_colsum(q, k, alive, valid_len):
    """Head- and query-mean attention each key receives (main.py:56-58),
    computed in query chunks to bound memory. q: [1, S, H, hd]; k: [1, S, KV, hd]."""
    _, s, hq, hd = q.shape
    kvh = k.shape[2]
    g = hq // kvh
    qf = q.astype(jnp.float32).reshape(s, kvh, g, hd)
    kf = k.astype(jnp.float32)[0]
    kpos = jnp.arange(s)
    kmask = (kpos < valid_len) & alive

    chunk = 512
    n_chunks = (s + chunk - 1) // chunk
    qpad = jnp.pad(qf, ((0, n_chunks * chunk - s), (0, 0), (0, 0), (0, 0)))

    def body(carry, ci):
        acc = carry
        qc = jax.lax.dynamic_slice(qpad, (ci * chunk, 0, 0, 0), (chunk, kvh, g, hd))
        sc = jnp.einsum("qhgd,shd->hgqs", qc, kf, precision=jax.lax.Precision.HIGHEST)
        sc = sc * (hd**-0.5)
        qpos = ci * chunk + jnp.arange(chunk)
        qmask = (qpos < valid_len) & alive[jnp.minimum(qpos, s - 1)] & (qpos < s)
        mask = qmask[:, None] & kmask[None, :] & (kpos[None, :] <= qpos[:, None])
        sc = jnp.where(mask[None, None], sc, -1e30)
        probs = jax.nn.softmax(sc, axis=-1)
        probs = jnp.where(mask[None, None], probs, 0.0)
        return acc + probs.sum((0, 1, 2)), None

    colsum, _ = jax.lax.scan(body, jnp.zeros((s,), jnp.float32), jnp.arange(n_chunks))
    n_alive_q = jnp.maximum((kmask).sum(), 1)
    return colsum / (hq * n_alive_q)


@functools.lru_cache(maxsize=8)
def build_prefill_framefusion(cfg: DecoderConfig, spec: FrameFusionSpec, s_full: int):
    """Jitted FrameFusion prefill: (params, embeds, valid_len, video_start)
    -> (logits [1, V], KVCache, alive_mask [s_full]). Decode must pass
    ``alive`` as the KV mask.

    Mask mode (compact_at_layer == 0): a single full-length cache group, dead
    slots masked. Compact mode (> 0): at layer C the surviving tokens are
    gathered into a budget buffer and layers >= C run short — the cache
    splits into two groups like the STTM reducer's. The return gains a 4th
    element (new_valid, compact_exact, compact_overflow).
    """
    from .generate import MAX_DECODE

    n_layers = cfg.num_layers
    mrope = bool(cfg.mrope_section)
    compact_at = spec.compact_at_layer
    if compact_at and not (0 < compact_at < n_layers):
        raise ValueError(f"compact_at_layer {compact_at} out of range (0, {n_layers})")
    s_c = s_full - spec.n_video + spec.compact_video_budget if compact_at else s_full

    def fn(params, embeds, valid_len, video_start, position_ids=None):
        layers = params["layers"]
        if position_ids is None:
            position_ids = jnp.arange(s_full, dtype=jnp.int32)
        pos = position_ids
        cos, sin = qwen2.rope_cos_sin(cfg, pos)
        x = embeds
        alive = jnp.arange(s_full) < valid_len
        state = (jnp.float32(1.0), jnp.float32(0.0), jnp.array(False), jnp.array(False))

        valid = valid_len
        compacted = False
        new_valid = jnp.asarray(valid_len, jnp.int32)
        compact_exact = jnp.array(True)
        compact_overflow = jnp.int32(0)
        ks, vs = [], []
        ks_b, vs_b = [], []
        for li in range(n_layers):
            if compact_at and li == compact_at:
                # --- compaction: pack surviving tokens into the budget buffer
                # (raster order preserved -> causal masking stays valid) ---
                s_prod, total, fin_m, fin_p = state
                compact_exact = fin_m & fin_p  # no merge/prune would follow
                seq = jnp.arange(s_full)
                if spec.patch_type is not None:
                    _, _, abs_idx = _patch_layout(spec)
                    vid_mask = jnp.zeros((s_full,), bool).at[jnp.asarray(abs_idx)].set(True)
                else:
                    vid_mask = (seq >= video_start) & (seq < video_start + spec.n_video)
                vrank = jnp.cumsum((alive & vid_mask).astype(jnp.int32)) - 1
                drop = vid_mask & alive & (vrank >= spec.compact_video_budget)
                keep = alive & ~drop
                alive = keep  # decode sees exactly the surviving tokens
                compact_overflow = drop.sum().astype(jnp.int32)
                perm = jnp.argsort(~keep, stable=True)[:s_c]
                x = x[0, perm][None]
                cos = cos[perm]
                sin = sin[perm]
                new_valid = keep.sum().astype(jnp.int32)
                valid = new_valid
                compacted = True
            s_prod, total, fin_m, fin_p = state

            def do_merge(args):
                x, alive, state = args
                return _merge_step(spec, x[0], alive, video_start, state, li, n_layers)

            def no_merge(args):
                x, alive, state = args
                return x[0], alive, state

            if not compacted:
                x0, alive, state = jax.lax.cond(~fin_m, do_merge, no_merge, (x, alive, state))
                x = x0[None]

            lp = {k: v[li] for k, v in layers.items()}

            # run the layer, capturing q/k for the pruning colsum
            b, s, d = x.shape
            h = qwen2.rms_norm(x, lp["ln1"], cfg.rms_eps, cfg.rms_offset)
            q, k, v = qwen2.qkv_proj(lp, h, cfg)
            q = qwen2.apply_rope(q, cos, sin)
            k = qwen2.apply_rope(k, cos, sin)
            o = mha(q, k, v, kv_valid_len=valid, causal=True, impl="xla",
                    kv_mask=None if compacted else alive)
            aq = cfg.act_quant
            x = x + qwen2._mat(o.reshape(b, s, cfg.q_dim), lp["wo"], aq)
            h = qwen2.rms_norm(x, lp["ln2"], cfg.rms_eps, cfg.rms_offset)
            x = x + qwen2._mat(
                qwen2.mlp_act(qwen2._mat(h, lp["wg"], aq), cfg) * qwen2._mat(h, lp["wu"], aq),
                lp["wd"], aq,
            )
            (ks_b if compacted else ks).append(k)
            (vs_b if compacted else vs).append(v)
            if compacted:
                continue  # no further merge/prune on the compacted buffer

            # pruning pass: once merging just finished (main.py:49-74)
            s_prod, total, fin_m, fin_p = state

            def do_prune(alive):
                colsum = _attention_colsum(q, k, alive, valid_len)
                _, _, abs_idx = _patch_layout(spec)
                if abs_idx is None:
                    vid = jax.lax.dynamic_slice(colsum, (video_start,), (spec.n_video,))
                    vid_alive = jax.lax.dynamic_slice(alive, (video_start,), (spec.n_video,))
                else:  # explicit patch types: static video positions
                    vid = colsum[abs_idx]
                    vid_alive = alive[abs_idx]
                img_len = vid_alive.sum()
                remain = n_layers * spec.cost - total
                frac = remain / jnp.maximum((n_layers - (li + 1)) * s_prod, 1e-8)
                pr = jnp.clip(jnp.where(frac > 1.0, 0.0, 1.0 - frac), 0.0, 1.0)
                n_keep = jnp.round(img_len * (1.0 - pr)).astype(jnp.int32)
                scores = jnp.where(vid_alive, vid, -jnp.inf)
                rank = jnp.argsort(jnp.argsort(-scores))
                keep_vid = vid_alive & (rank < n_keep)
                if abs_idx is None:
                    return jax.lax.dynamic_update_slice(alive, keep_vid, (video_start,))
                return alive.at[jnp.asarray(abs_idx)].set(keep_vid)

            should_prune = fin_m & ~fin_p & (li + 1 < n_layers) & spec.enable_prune
            alive = jax.lax.cond(should_prune, do_prune, lambda a: a, alive)
            state = (s_prod, total, fin_m, jnp.where(should_prune, True, fin_p))

        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
        last = jax.lax.dynamic_slice(h, (0, valid - 1, 0), (1, 1, cfg.hidden_size))
        logits = qwen2.lm_head(params, cfg, last)[:, 0]

        if mrope:  # rope-delta decode base (modeling_qwen2vl.py:1779)
            pos_base = (jnp.max(pos[..., valid_len - 1]) + 1).astype(jnp.int32)
        else:
            pos_base = jnp.asarray(valid_len, jnp.int32)

        def with_tail(stack):
            arr = jnp.stack(stack)
            tail = jnp.zeros(
                (arr.shape[0], 1, MAX_DECODE, cfg.num_kv_heads, cfg.head_dim), arr.dtype
            )
            return jnp.concatenate([arr, tail], axis=2)

        if not compact_at:
            cache = qwen2.KVCache(
                ks=(with_tail(ks),),
                vs=(with_tail(vs),),
                lens=(jnp.asarray(valid_len, jnp.int32),),
                pos_base=pos_base,
            )
            return logits, cache, alive
        cache = qwen2.KVCache(
            ks=(with_tail(ks), with_tail(ks_b)),
            vs=(with_tail(vs), with_tail(vs_b)),
            lens=(jnp.asarray(valid_len, jnp.int32), new_valid),
            pos_base=pos_base,
        )
        return logits, cache, alive, (new_valid, compact_exact, compact_overflow)

    return jax.jit(fn)
