"""Attention dispatch: Pallas flash attention on TPU, XLA einsum fallback.

Layouts: q [B, Sq, Hq, hd]; k/v [B, Skv, Hkv, hd] (GQA: Hq % Hkv == 0).
``kv_valid_len`` masks padding keys; prefill is causal with q_offset == 0,
decode passes the absolute query position via ``q_offset``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["mha"]


def _xla_mha(q, k, v, kv_valid_len, causal, q_offset, sm_scale, attn_sinks=0, attn_window=0, kv_mask=None, kv_mask_per_head=False, k_scale=None, v_scale=None):
    b, sq, hq, hd = q.shape
    _, skv, hkv, _ = k.shape
    g = hq // hkv
    # fp32 accumulation WITHOUT materializing fp32 copies of K/V: decode reads
    # the whole cache every token, so upcasting it would double HBM traffic.
    # int8 K/V (kv_int8 mode): the int8->f32 operand convert fuses into the
    # dot's HBM read and dequantization scales the score/prob matrices
    # instead of K/V (runtime/paged.py pool pattern — never materializes a
    # dequantized cache copy).
    if k.dtype == jnp.int8:
        k = k.astype(jnp.float32)
    if v.dtype == jnp.int8:
        v = v.astype(jnp.float32)
    qf = q.reshape(b, sq, hkv, g, hd)
    scores = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qf, k,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    scores = scores * sm_scale
    if k_scale is not None:  # [B, Skv, Hkv] -> [B, Hkv, 1, 1, Skv]
        scores = scores * k_scale.transpose(0, 2, 1)[:, :, None, None, :]
    kpos = jnp.arange(skv)[None, :]
    mask = kpos < kv_valid_len
    if causal:
        qpos = jnp.arange(sq)[:, None] + q_offset
        mask = mask & (kpos <= qpos)
    if attn_sinks > 0 or attn_window > 0:
        # StreamingLLM A-shape: initial sink tokens + local window
        qpos = jnp.arange(sq)[:, None] + q_offset
        mask = mask & ((kpos < attn_sinks) | (qpos - kpos < attn_window))
    # scores: [b, hkv, g, q, k]; kv_mask may be [Skv] (shared), [B, Skv]
    # (per-row, batched decode), or [Hkv, Skv] (per-KV-head, head-packed
    # batched decode — kv_mask_per_head=True since B == Hkv is ambiguous)
    if kv_mask is None:
        mask5 = mask[None, None, None]
    elif kv_mask.ndim == 1:
        mask5 = (mask & kv_mask[None, :])[None, None, None]
    elif kv_mask_per_head:
        mask5 = mask[None, None, None] & kv_mask[None, :, None, None, :]
    else:
        mask5 = mask[None, None, None] & kv_mask[:, None, None, None, :]
    scores = jnp.where(mask5, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:  # dequantize V by scaling the prob rows
        probs = probs * v_scale.transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", probs, v,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, sq, hq, hd).astype(q.dtype)


def _pick_block(s: int, prefer: int) -> int:
    for cand in (prefer, 1280, 1024, 512, 256, 128):
        if cand <= s and s % cand == 0:
            return cand
    # No candidate divides s (mha only routes here when s % 128 == 0, so
    # this is a belt-and-braces path): largest power-of-two divisor <= 128.
    blk = 1
    while blk < 128 and s % (blk * 2) == 0:
        blk *= 2
    return blk


@functools.partial(jax.named_call, name="splash_mha")
def _splash_mha(q, k, v, kv_valid_len, sm_scale, interpret=False,
                block_q=1280, block_kv=2560, block_kv_compute=256,
                q_transposed=False, k_seq_minor=None, v_seq_minor=None,
                q_seq_minor=False, bwd_blocks=False):
    """GQA-native causal flash attention via the splash MQA kernel.

    Unlike the stock flash_attention path, K/V are NOT broadcast to all query
    heads (the round-1 kernel repeated K/V 7x to 28 heads, materializing ~180MB
    of extra HBM traffic per layer at 25.6k tokens). Each KV head runs the MQA
    kernel over its G query heads via vmap; padding keys are masked with
    segment ids (valid tokens segment 0, pad segment 1).
    """
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    # Tuning/debug knob for whole-model A/Bs (scripts/ab_merged_splash.py):
    # STTM_SPLASH_BLOCKS="bq,bkv,bkc" overrides the block sizes and
    # STTM_SPLASH_VSM="0"/"1" forces the V layout. Read at TRACE time — use
    # from a fresh process only (module-level jit caches don't key on env).
    import os as _os

    _blk = _os.environ.get("STTM_SPLASH_BLOCKS")
    if _blk:
        block_q, block_kv, block_kv_compute = map(int, _blk.split(","))
    _vsm = _os.environ.get("STTM_SPLASH_VSM")
    if _vsm is not None and v_seq_minor is None:
        v_seq_minor = bool(int(_vsm))

    if q_transposed:  # [B, Hkv, G, Sq, hd], already roped + sm_scaled
        b, hkv_t, g, sq, hd = q.shape
        hq = hkv_t * g
    else:
        b, sq, hq, hd = q.shape
    _, skv, hkv, _ = k.shape
    g = hq // hkv
    mask = sm.MultiHeadMask([sm.CausalMask((sq, skv)) for _ in range(g)])
    # Swept on v5e at 25.6k tokens (round 2): 1280/2560 blocks with a 256
    # compute sub-block measured 34.2 ms vs 41.7 ms for 1024/1024/full —
    # the small kv-compute block keeps the MXU fed while the next 2560-wide
    # K/V block streams in. Fallback: largest candidate dividing the seq.
    if v_seq_minor is None:
        # swept on v5e (BENCH_SPLASH_SWEEP.json, round 4): SEQ_MINOR V wins
        # at the merged length (7.3-7.6 vs 8.4 ms, MFU ~0.79-0.82 vs 0.710
        # at 12.8k) but loses at 25.6k (35.0 vs 30.7 ms) — shorter
        # sequences have proportionally more diagonal/epilogue work, where
        # the NN PV matmul's missing in-kernel transpose matters most.
        # The crossover is placed by BENCH_VSM_CROSSOVER.json (round 5,
        # ADVICE r4 #2): vS 1.036x at 15360, 1.012x at 17920, then 0.83x
        # at 19200 and 0.79x at 23040 — threshold at the last winning
        # length.
        # K SEQ_MINOR ties vS isolated (7.16 vs 7.25 ms head-to-head) but
        # measured WORSE in-model (splash 223.4 vs 220.2 ms over 26
        # layers, whole-model merged 0.967 vs 0.958 s) — kept OFF.
        v_seq_minor = sq <= 17920
    if k_seq_minor is None:
        k_seq_minor = False
    bq = _pick_block(sq, block_q)
    bkv = _pick_block(skv, block_kv)
    bkc = block_kv_compute if bkv % block_kv_compute == 0 else bkv
    bwd = {}
    if bwd_blocks:
        # training path: the kernel's fused backward (dq+dkv in one pass)
        # needs its own block sizes; without them jax.grad raises "Need to
        # specify backward blocks".
        bq_d = _pick_block(sq, min(512, bq))
        bkv_d = _pick_block(skv, min(1024, bkv))
        bwd = dict(
            block_q_dkv=bq_d,
            block_kv_dkv=bkv_d,
            block_kv_dkv_compute=bkv_d if bkv_d % 256 else 256,
            use_fused_bwd_kernel=True,
        )
    bs = sk.BlockSizes(
        block_q=bq,
        block_kv=bkv,
        block_kv_compute=min(bkc, bkv),
        **bwd,
        # SEQ_MINOR makes the kernel read K/V blocks as [hd, bkv] (QK^T runs
        # NN dim numbers — no in-kernel transpose); the kernel swaps axes on
        # the XLA side itself, so callers still pass [Skv, hd].
        q_layout=sk.QKVLayout.SEQ_MINOR if q_seq_minor
        else sk.QKVLayout.HEAD_DIM_MINOR,
        k_layout=sk.QKVLayout.SEQ_MINOR if k_seq_minor
        else sk.QKVLayout.HEAD_DIM_MINOR,
        v_layout=sk.QKVLayout.SEQ_MINOR if v_seq_minor
        else sk.QKVLayout.HEAD_DIM_MINOR,
    )
    kernel = sk.make_splash_mqa_single_device(mask, block_sizes=bs, interpret=interpret)

    qf = q if q_transposed else (
        (q * sm_scale).reshape(b, sq, hkv, g, hd).transpose(0, 2, 3, 1, 4))
    kt = k.transpose(0, 2, 1, 3)  # [B, Hkv, Skv, hd]
    vt = v.transpose(0, 2, 1, 3)
    pos_q = jnp.arange(sq, dtype=jnp.int32)[None, :]
    pos_k = jnp.arange(skv, dtype=jnp.int32)[None, :]
    q_seg = jnp.broadcast_to((pos_q >= kv_valid_len).astype(jnp.int32), (b, sq))
    kv_seg = jnp.broadcast_to((pos_k >= kv_valid_len).astype(jnp.int32), (b, skv))

    def per_batch(qb, kb, vb, qs, ks):
        seg = sk.SegmentIds(q=qs, kv=ks)
        return jax.vmap(lambda q3, k2, v2: kernel(q3, k2, v2, segment_ids=seg))(qb, kb, vb)

    out = jax.vmap(per_batch)(qf, kt, vt, q_seg, kv_seg)  # [B, Hkv, G, Sq, hd]
    return out.transpose(0, 3, 1, 2, 4).reshape(b, sq, hq, hd).astype(q.dtype)


@functools.partial(jax.named_call, name="flash_mha")
def _flash_mha(q, k, v, kv_valid_len, causal, sm_scale):
    """Pallas TPU flash attention (prefill path: Sq == Skv, q_offset == 0)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, sq, hq, hd = q.shape
    _, skv, hkv, _ = k.shape
    if hkv != hq:  # GQA: broadcast KV heads to Q heads for the kernel
        rep = hq // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    qt = q.transpose(0, 2, 1, 3)  # [B, H, S, hd]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    # padding mask via segment ids: valid tokens segment 0, pad segment 1
    pos = jnp.arange(sq, dtype=jnp.int32)[None, :]
    seg = (pos >= kv_valid_len).astype(jnp.int32)
    seg_ids = SegmentIds(q=seg, kv=seg)
    # 1024-blocks measured ~8% faster than 512 at 25.6k tokens on v5e
    blk = 1024 if sq % 1024 == 0 else (512 if sq % 512 == 0 else min(128, sq))
    block_sizes = BlockSizes(
        block_q=blk,
        block_k_major=blk,
        block_k=blk,
        block_b=1,
    )
    out = flash_attention(
        qt, kt, vt, segment_ids=seg_ids, causal=causal, sm_scale=sm_scale, block_sizes=block_sizes
    )
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def flash_decode_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    block_kv: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Pallas single-token GQA decode attention (flash-decode).

    q: [B, KV, G, hd] (pre-scaled by 1/sqrt(hd)); k/v: [B, S, KV, hd] in the
    cache's STORED layout; mask: [B, S] bool shared across KV heads, or
    [B, KV, S] per-KV-head (head-packed batched serving folds the batch into
    the KV-head axis, so each packed head carries its own row's visibility) —
    the complete visibility set (packed prefix, decode-tail bound, and any
    KV mask), computed by the caller. Returns [B, KV, G, hd].

    Motivation: expressing decode attention as XLA einsums makes layout
    assignment want a (hd, S)-tiled cache while the cache update wants a
    different tiling — for batch > 1 XLA reconciles them with full per-layer
    cache copies every step (measured 10x decode slowdown at batch 4 on
    v5e). The kernel reads K/V blocks HBM->VMEM in the stored layout, so the
    cache has exactly one layout and zero copies; softmax is the standard
    online (running max/sum) accumulation over KV blocks.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:  # CPU (tests) runs the interpreter automatically
        interpret = jax.default_backend() == "cpu"
    b, s, kvh, hd = k.shape
    g = q.shape[2]
    if mask.ndim == 2:  # shared across KV heads -> per-head form
        mask = jnp.broadcast_to(mask[:, None, :], (b, kvh, mask.shape[-1]))
    blk = min(block_kv, s)
    n_blk = (s + blk - 1) // blk
    if s % blk:  # pad S; padded keys are masked out
        pad = n_blk * blk - s
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, pad)))
    mask3 = mask  # [B, KV, S]
    kg = kvh * g

    # one program per (row, KV block) handles ALL KV heads: blocking the KV
    # axis to 1 would violate the TPU last-two-dims tiling rule, and reading
    # all heads per block costs nothing extra (the block is read once).
    def kern(q_ref, k_ref, v_ref, mask_ref, o_ref, m_ref, l_ref, acc_ref):
        si = pl.program_id(1)

        @pl.when(si == 0)
        def _():
            m_ref[...] = jnp.full_like(m_ref, -1e30)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        qb = q_ref[0].astype(jnp.float32)  # [KV, G, hd]
        kb = k_ref[0].astype(jnp.float32)  # [blk, KV, hd]
        vb = v_ref[0].astype(jnp.float32)
        mb = mask_ref[0]  # [KV, blk] per-KV-head visibility
        # per-head unrolled dots (Mosaic's tpu.matmul requires batch dims in
        # matching positions, which [KV,G,hd] x [blk,KV,hd] is not)
        scores = jnp.concatenate(
            [
                jnp.where(
                    mb[h][None, :],
                    jax.lax.dot_general(
                        qb[h], kb[:, h, :], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ),
                    -1e30,
                )
                for h in range(kvh)
            ],
            axis=0,
        )  # [KV*G, blk]

        m_prev = m_ref[0:kg, 0:1]  # [KV*G, 1]
        l_prev = l_ref[0:kg, 0:1]
        m_new = jnp.maximum(m_prev, scores.max(axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)  # [KV*G, blk]
        l_new = alpha * l_prev + p.sum(axis=-1, keepdims=True)
        pv = jnp.concatenate(
            [
                jax.lax.dot_general(
                    p[h * g : (h + 1) * g], vb[:, h, :], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for h in range(kvh)
            ],
            axis=0,
        )  # [KV*G, hd]
        acc_ref[0:kg, :] = acc_ref[0:kg, :] * alpha + pv
        m_ref[0:kg, 0:1] = m_new
        l_ref[0:kg, 0:1] = l_new

        @pl.when(si == pl.num_programs(1) - 1)
        def _():
            l = jnp.maximum(l_ref[0:kg, 0:1], 1e-30)
            o_ref[0] = (acc_ref[0:kg, :] / l).reshape(kvh, g, hd).astype(o_ref.dtype)

    kgpad = max(kg, 8)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, kvh, g, hd), q.dtype),
        grid=(b, n_blk),
        in_specs=[
            pl.BlockSpec((1, kvh, g, hd), lambda bi, si: (bi, 0, 0, 0)),
            pl.BlockSpec((1, blk, kvh, hd), lambda bi, si: (bi, si, 0, 0)),
            pl.BlockSpec((1, blk, kvh, hd), lambda bi, si: (bi, si, 0, 0)),
            pl.BlockSpec((1, kvh, blk), lambda bi, si: (bi, 0, si)),
        ],
        out_specs=pl.BlockSpec((1, kvh, g, hd), lambda bi, si: (bi, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((kgpad, 128), jnp.float32),
            pltpu.VMEM((kgpad, 128), jnp.float32),
            pltpu.VMEM((kgpad, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, mask3)
    return out


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    kv_valid_len,
    causal: bool = True,
    q_offset=0,
    impl: str = "xla",
    attn_sinks: int = 0,
    attn_window: int = 0,
    kv_mask=None,
    kv_mask_per_head: bool = False,
    k_scale=None,
    v_scale=None,
) -> jnp.ndarray:
    sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    if k_scale is not None or v_scale is not None:
        # int8 K/V with per-(position, KV-head) dequant scales [B, Skv, Hkv]
        # (the kv_int8 live-cache mode) — XLA path only. Reject an explicit
        # kernel request rather than silently running the slow path.
        if impl not in ("xla",):
            raise ValueError(
                f"impl={impl!r} does not support int8-KV dequant scales; "
                "use impl='xla' (the kv_int8 decode path is XLA-only)")
        return _xla_mha(q, k, v, kv_valid_len, causal, q_offset, sm_scale,
                        attn_sinks, attn_window, kv_mask, kv_mask_per_head,
                        k_scale, v_scale)
    # The Pallas kernels need 128-tileable sequence lengths; odd sizes fall
    # back to the (correct, slower) XLA path rather than mis-tiling the tail.
    # Off-TPU, flash impls fall back to XLA too (the splash kernel only has
    # a Mosaic lowering; the XLA path is the same math and differentiable,
    # so CPU tests exercise flash/flash_train call sites end-to-end).
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if impl in ("flash", "flash_legacy", "flash_train") and on_tpu \
            and q.shape[1] > 1 \
            and causal and not (attn_sinks or attn_window) and kv_mask is None \
            and q.shape[1] % 128 == 0 and k.shape[1] % 128 == 0:
        if impl == "flash_legacy":  # stock kernel with KV broadcast to q heads
            return _flash_mha(q, k, v, kv_valid_len, causal, sm_scale)
        # flash_train: differentiable splash (fused-backward blocks set) for
        # the training forward — no S^2 score materialization in fwd OR bwd
        return _splash_mha(q, k, v, kv_valid_len, sm_scale,
                           bwd_blocks=impl == "flash_train")
    return _xla_mha(q, k, v, kv_valid_len, causal, q_offset, sm_scale, attn_sinks, attn_window, kv_mask, kv_mask_per_head)


def mha_prefill_rope_qk(q_unroped, k_unroped, v, cos, sin, *, kv_valid_len,
                        impl: str = "xla", attn_sinks: int = 0,
                        attn_window: int = 0):
    """Causal prefill attention that applies BOTH ropes itself; returns
    (o, k_roped) — k_roped is what the KV cache stores.

    On the splash path, q's rope + sm_scale + GQA transpose AND k's rope
    run as ONE Pallas pass (ops.kernels.rope_qk_scale_transpose): the
    stock XLA K-rope materializes f32 intermediates and re-reads the rope
    tables per layer, DMA traffic that overlaps (and contends with) the
    splash kernel's HBM streaming — the in-model-vs-isolated splash
    penalty round 4 quantified at ~0.9 ms/layer (PROFILE_PREFILL.json;
    whole-model block/layout A/Bs all measured neutral, pointing at the
    operand side). Every other configuration applies the stock rope to
    both and defers to mha() — identical math."""
    sm_scale = 1.0 / (q_unroped.shape[-1] ** 0.5)
    hkv = k_unroped.shape[2]
    sq = q_unroped.shape[1]
    if impl == "flash" and jax.default_backend() in ("tpu", "axon") \
            and sq > 1 and not (attn_sinks or attn_window) \
            and sq % 128 == 0 and k_unroped.shape[1] % 128 == 0 \
            and cos.ndim == 2 and q_unroped.shape[-1] % 128 == 0:
        from .kernels import rope_qk_scale_transpose

        qf, k = rope_qk_scale_transpose(
            q_unroped, k_unroped, cos, sin, hkv, sm_scale)
        o = _splash_mha(qf, k, v, kv_valid_len, sm_scale, q_transposed=True)
        return o, k
    # stock rope on k (apply_rope semantics), then the rope-q dispatcher
    x = k_unroped.astype(jnp.float32)
    x1, x2 = jnp.split(x, 2, axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    if cos.ndim == 3:
        c, s = cos[:, :, None, :], sin[:, :, None, :]
    else:
        c, s = cos[None, :, None, :], sin[None, :, None, :]
    k = (x * c + rot * s).astype(k_unroped.dtype)
    o = mha_prefill_rope_q(q_unroped, k, v, cos, sin,
                           kv_valid_len=kv_valid_len, impl=impl,
                           attn_sinks=attn_sinks, attn_window=attn_window)
    return o, k


def mha_prefill_rope_q(q_unroped, k, v, cos, sin, *, kv_valid_len,
                       impl: str = "xla", attn_sinks: int = 0,
                       attn_window: int = 0) -> jnp.ndarray:
    """Causal prefill attention that applies q's RoPE itself.

    On the splash path, q's rope + sm_scale + GQA transpose run as ONE
    Pallas pass emitting the kernel's [B, Hkv, G, S, hd] layout
    (ops.kernels.rope_scale_transpose) — the unfused chain materializes
    ~500 MB of f32 rope intermediates + a layout copy per layer at the
    merged headline point (PROFILE_PREFILL.json). k must already be roped
    (it is what the KV cache stores). Every other configuration applies
    the stock apply_rope and defers to mha() — identical math."""
    sm_scale = 1.0 / (q_unroped.shape[-1] ** 0.5)
    hkv = k.shape[2]
    sq = q_unroped.shape[1]
    if impl == "flash" and jax.default_backend() in ("tpu", "axon") \
            and sq > 1 and not (attn_sinks or attn_window) \
            and sq % 128 == 0 and k.shape[1] % 128 == 0 and cos.ndim == 2 \
            and q_unroped.shape[-1] % 128 == 0:
        from .kernels import rope_scale_transpose

        qf = rope_scale_transpose(q_unroped, cos, sin, hkv, sm_scale)
        return _splash_mha(qf, k, v, kv_valid_len, sm_scale,
                           q_transposed=True)
    # stock rope (models/qwen2.py apply_rope semantics, inlined to avoid a
    # module cycle), then the standard dispatcher
    x = q_unroped.astype(jnp.float32)
    x1, x2 = jnp.split(x, 2, axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    if cos.ndim == 3:
        c, s = cos[:, :, None, :], sin[:, :, None, :]
    else:
        c, s = cos[None, :, None, :], sin[None, :, None, :]
    q = (x * c + rot * s).astype(q_unroped.dtype)
    return mha(q, k, v, kv_valid_len=kv_valid_len, causal=True, impl=impl,
               attn_sinks=attn_sinks, attn_window=attn_window)
