"""Prefill/decode runtime with TTFT + decode-time instrumentation.

Mirrors the reference's forked ``_sample`` measurement semantics
(llava/model/language_model/llava_qwen.py:238-331): the first forward's
device-synchronized wall-clock is ``ttft_llm``; subsequent single-token
forwards accumulate ``time_decoding``; the merged token count is read from the
last layer group's cache length (llava_qwen.py:258). Greedy decoding, ≤
``max_new_tokens`` (the harness uses 32, eval_vidqa_by_feat_llavavideo.py:164).

Token reduction splits the layer stack into groups: reducers fire between
groups at their ``layer_idx`` (one reducer = the STTM/ToMe/DyCoke/FastV case;
several = pyramid-drop's multi-stage schedule, pyrd_attn_monkey_patch.py).
All shapes are static per (config, specs, s_full); functions are built once
and cached; the host loop only feeds scalars.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models import qwen2
from ..models.config import DecoderConfig
from .reducer import ReducerSpec

__all__ = [
    "GenerateConfig", "build_prefill", "build_decode_step", "generate",
    "generate_batch", "generate_from_prefix", "generate_batch_from_prefix",
    "prefix_prefill", "spec_from_pattern",
]


# The runtime family split out of this module (round-3 refactor); every name
# remains importable from here for backward compatibility.
from .common import (  # noqa: F401
    MAX_DECODE,
    DycokeDecodeOptions,
    DycokeState,
    GenerateConfig,
    _buffer_lens,
    _group_bounds,
    _normalize_specs,
)
from .prefill import build_prefill  # noqa: F401
from .decode import (  # noqa: F401
    _batched_greedy_decode,
    _batched_like,
    _build_decode_step_masked,
    _build_decode_step_masked2,
    _chunked_greedy_loop,
    build_decode_chunk,
    build_decode_chunk_batch,
    build_decode_step,
    build_decode_step_dycoke,
)
from .spec import (  # noqa: F401
    _batched_spec_decode,
    _make_update_mask,
    _reset_mask_row,
    _spec_batch_builders,
    _verify_pos_tail,
    _verify_tokens,
    build_selfspec_step,
    build_verify_chunk_batch,
    build_verify_step,
    ngram_draft,
)
from .cascade import (  # noqa: F401
    CascadeTail,
    _cascade_tail_like,
    build_decode_chunk_cascade,
    build_extend,
    build_verify_chunk_cascade,
    generate_batch_from_prefix,
    generate_from_prefix,
    prefix_prefill,
)
from .paged import (  # noqa: F401
    PrefixPool,
    build_paged_admit,
    build_paged_decode_chunk,
    build_paged_verify_chunk,
    build_prefix_pool,
)
from .sampling import (  # noqa: F401
    SamplingParams,
    make_key,
    select_token,
    static_sample_key,
)

def _token_logprob(logits, token) -> float:
    """log P(token) under logits [1, V] — the output_scores surface."""
    lp = jax.nn.log_softmax(logits[0].astype(jnp.float32))
    return float(lp[token[0]])


def generate(
    params,
    cfg: DecoderConfig,
    embeds: jnp.ndarray,
    valid_len: int,
    video_start: int,
    spec,
    gen: GenerateConfig = GenerateConfig(),
    impl: str = "xla",
    position_ids=None,
    attn_sinks: int = 0,
    attn_window: int = 0,
    dycoke: DycokeDecodeOptions | None = None,
    pos_base=None,
    t_valid=None,
    decode_chunk_size: int = 1,
    spec_decode_k: int = 0,
    draft_fn=None,
    prompt_ids=None,
    spec_draft_layers: int = 0,
    decode_unroll: bool = False,
    return_logprobs: bool = False,
    kv_int8: bool = False,
):
    """Greedy generation. Returns (token_ids list, runtime dict).

    ``kv_int8`` builds the int8 KV cache with per-(position, head) scales
    DIRECTLY in the prefill scan (build_prefill kv_int8 — the bf16 cache
    never materializes, so there is no handoff pass and no bf16+int8
    transient); every decoded token is quantized at its write slot. Halves cache HBM and
    per-step KV read traffic — single-stream decode is weight-read-bound
    so the win there is small, but batched decode reads B caches per
    weight read (generate_batch) and cache HBM caps the flat batch size.
    Bounded approximation (like the int8 prefix pool). Composes with every
    decode family on this path: chunked decode, speculative decoding —
    n-gram AND self-speculative (draft scan + verify dispatch both read
    the int8 cache) — FrameFusion specs (masked/compacted decode), and
    dycoke stage-2 pruning (the attention-ranking read dequantizes like
    the attention read).

    ``return_logprobs`` adds runtime["logprobs"] — the log-probability of
    each emitted token (the reference's output_scores surface,
    llava_qwen.py return_dict_in_generate). Forces the per-step decode
    path (chunked/speculative buffers carry tokens, not distributions).

    ``spec`` may also be a FrameFusionSpec (layerwise budgeted merge-prune,
    runtime/framefusion.py), which uses its own prefill and a masked decode.

    ``decode_chunk_size`` > 1 generates tokens in on-device chunks (one
    dispatch per chunk, lax.scan over the step body — build_decode_chunk):
    token-exact vs the per-step loop, but ``time_decoding`` is then measured
    per chunk rather than per step. The final sub-chunk tail falls back to
    per-step dispatch so exactly max_new_tokens are respected.

    ``spec_decode_k`` >= 2 enables greedy speculative decoding: a drafter
    proposes k-1 tokens, one verify dispatch scores all of them
    (build_verify_step), and the accepted prefix plus the model's own
    correction advance the sequence — every emitted token is the model's
    own argmax, for any drafter, with up to k tokens per weight-read when
    drafts hit. Exactness caveat: the verify program's attention reduces in
    a different order than the single-step program (exactly like prefill vs
    decode), so argmax NEAR-TIES can resolve differently — bit-exact on the
    CPU fp32 tests; measured on v5e int8w8a with random weights (margins
    near zero) ~1 flipped token per 30 (logit deltas ~0.3 vs margins ~0.02,
    BENCH_EXTRA speculative_decode_round2); real checkpoints have decisive
    margins. ``draft_fn(history_ids, n) -> list[n]`` defaults to n-gram
    prompt-lookup over ``prompt_ids`` (if given) + generated ids
    (ngram_draft). Takes precedence over decode_chunk_size; unsupported
    with dycoke/StreamingLLM windows (falls back to their paths).
    ``spec_draft_layers`` = E > 0 switches to SELF-speculative drafting
    (build_selfspec_step): the draft runs the first E layers on device,
    fused with the verify in one dispatch — no token-history repetition
    needed, acceptance set by how well the early-exit head predicts the
    full model.

    ``gen.sampling`` (runtime/sampling.py SamplingParams) with
    temperature > 0 switches token selection to temperature/top-k/top-p
    sampling with a seed-deterministic per-step key. Sampling uses the
    per-step decode path (speculative/chunked decode are greedy machinery
    and are bypassed while sampling is on).

    ``decode_unroll`` unrolls the chunked decode's layer loop with STATIC
    weight indices — required for Pallas GEMV weights (int4): a custom-call
    cannot consume a scan's dynamic-slice in place, so the scanned form
    materializes a full weight copy per layer per token (CLAUDE.md); XLA
    matmuls fuse the gather for free, so bf16/int8 paths keep the
    (faster-compiling) scan default.
    """
    from .framefusion import FrameFusionSpec

    if isinstance(spec, FrameFusionSpec):
        return _generate_framefusion(
            params, cfg, embeds, valid_len, video_start, spec, gen,
            position_ids, kv_int8=kv_int8,
        )
    s_full = embeds.shape[1]
    spec_key = spec if (spec is None or isinstance(spec, ReducerSpec)) else tuple(spec)
    prefill = build_prefill(cfg, spec_key, s_full, impl, attn_sinks, attn_window,
                            kv_int8=kv_int8)
    if dycoke is not None:
        decode = build_decode_step_dycoke(cfg, spec_key, dycoke)
    else:
        decode = build_decode_step(
            cfg, spec_key, attn_sinks=attn_sinks, attn_window=attn_window
        )

    t0 = time.perf_counter()
    logits, cache = prefill(
        params, embeds, jnp.int32(valid_len), jnp.int32(video_start), position_ids,
        None if pos_base is None else jnp.int32(pos_base),
        None if t_valid is None else jnp.int32(t_valid),
    )
    logits.block_until_ready()
    ttft = time.perf_counter() - t0
    # kv_int8 needs no handoff here: the prefill wrote int8 + scales
    # directly (the old quantize_kv_cache pass held bf16 + int8 copies
    # simultaneously — that transient capped flat-batch capacity)

    sp = gen.sampling
    sampling_on = sp is not None and not sp.greedy
    skey = make_key(sp.seed) if sampling_on else None
    token = select_token(logits, sp, skey, 0)
    ids = [int(token[0])]
    logprobs = []
    if return_logprobs:
        logprobs.append(_token_logprob(logits, token))
    merged_len = int(cache.merged_len)
    overflow = 0 if cache.budget_overflow is None else int(cache.budget_overflow)
    if overflow > 0:
        from ..utils.logging import rank0_print

        rank0_print(
            f"WARNING: merge kept {overflow} tokens beyond video_budget; "
            f"raster-last tokens dropped (raise --video_budget_ratio for parity)"
        )

    dstate = None
    if dycoke is not None:
        s_c = cache.ks[-1].shape[2]  # the (single) non-empty group's buffer
        dstate = DycokeState(
            keep_mask=jnp.ones((s_c,), bool),
            attn_score=jnp.zeros((dycoke.img_len,), jnp.float32),
            has_score=jnp.array(False),
        )

    time_decoding = 0.0
    step = 0
    spec_stats = None
    speculative = (
        spec_decode_k > 1 and dycoke is None and attn_sinks == 0
        and attn_window == 0 and not sampling_on and not return_logprobs
    )
    if speculative:
        k = max(2, min(spec_decode_k, MAX_DECODE))
        selfspec = spec_draft_layers > 0
        if selfspec:  # layer-skip drafting happens on device, fused w/ verify
            vstep = build_selfspec_step(cfg, spec_key, k, spec_draft_layers)
        else:
            verify = build_verify_step(cfg, spec_key, k)
            drafter = draft_fn or ngram_draft
        history = (list(prompt_ids) if prompt_ids is not None else []) + ids
        n_drafted = n_hit = 0
        while (
            len(ids) < gen.max_new_tokens
            and ids[-1] not in gen.eos_token_ids
            and step + k <= MAX_DECODE
        ):
            t0 = time.perf_counter()
            if selfspec:
                out, cache = vstep(
                    params, jnp.asarray([ids[-1]], jnp.int32), cache, jnp.int32(step)
                )
                out = np.asarray(out)  # ONE host sync: preds [k] ++ drafts [k-1]
                preds, drafts = out[:k], [int(t) for t in out[k:]]
            else:
                drafts = [int(t) for t in drafter(history, k - 1)]
                feed = jnp.asarray([ids[-1]] + drafts, jnp.int32)
                logits, cache = verify(params, feed, cache, jnp.int32(step))
                preds = np.asarray(jnp.argmax(logits, -1))  # host sync
            time_decoding += time.perf_counter() - t0
            # preds[j] = model's next token after feed[j]; accept drafts
            # while they match, then append the model's own token (the
            # correction, or the bonus token when every draft matched)
            a = 0
            while a < k - 1 and drafts[a] == int(preds[a]):
                a += 1
            n_drafted += k - 1
            n_hit += a
            for t in (int(preds[j]) for j in range(a + 1)):
                ids.append(t)
                history.append(t)
                if t in gen.eos_token_ids or len(ids) >= gen.max_new_tokens:
                    break
            # feed[0..a] hold real history in slots step..step+a; the next
            # feed's first token (preds[a]) writes at step+a+1. Rejected
            # slots beyond sit past the next write bound and are overwritten.
            step += a + 1
        token = jnp.asarray([ids[-1]], jnp.int32)  # per-step tail fallback
        spec_stats = {"spec_drafted": n_drafted, "spec_accepted": n_hit}
    chunk = max(1, min(decode_chunk_size, gen.max_new_tokens - 1))
    if sampling_on or return_logprobs:
        chunk = 1  # chunked decode buffers tokens only (on-device argmax)
    if chunk > 1 and dycoke is None and not speculative:
        dchunk = build_decode_chunk(
            cfg, spec_key, chunk, attn_sinks=attn_sinks, attn_window=attn_window,
            unroll=decode_unroll,
        )
        eos_arr = jnp.asarray(list(gen.eos_token_ids) or [-1], jnp.int32)
        done = jnp.asarray(ids[-1] in gen.eos_token_ids)
        while step < gen.max_new_tokens - 1 and not bool(done):
            n_this = min(chunk, gen.max_new_tokens - 1 - step)
            t0 = time.perf_counter()
            token, cache, done, buf, n_run = dchunk(
                params, token, cache, jnp.int32(step), done, eos_arr, jnp.int32(n_this)
            )
            buf = np.asarray(buf)  # host sync
            time_decoding += time.perf_counter() - t0
            ids.extend(int(t) for t in buf if t >= 0)
            step += int(n_run)
    while len(ids) < gen.max_new_tokens and ids[-1] not in gen.eos_token_ids:
        t0 = time.perf_counter()
        if dycoke is not None:
            logits, cache, dstate = decode(
                params, token, cache, jnp.int32(step), dstate, jnp.int32(video_start)
            )
        else:
            logits, cache = decode(params, token, cache, jnp.int32(step))
        logits = jax.block_until_ready(logits)
        time_decoding += time.perf_counter() - t0
        token = select_token(logits, sp, skey, len(ids))
        ids.append(int(token[0]))
        if return_logprobs:
            logprobs.append(_token_logprob(logits, token))
        step += 1

    runtime = {
        "ttft_llm": ttft,
        "time_decoding": time_decoding,
        "num_dec_token": len(ids),
        "merged_len": merged_len,
        "full_len": int(valid_len),
        "budget_overflow": overflow,
    }
    if kv_int8:  # inline quantization: no handoff pass exists anymore
        runtime["kv_int8_handoff"] = 0.0
    if return_logprobs:
        runtime["logprobs"] = logprobs
    if spec_stats is not None:
        runtime.update(spec_stats)
    return ids, runtime

def _generate_framefusion(params, cfg, embeds, valid_len, video_start, spec, gen,
                          position_ids=None, kv_int8: bool = False):
    from .framefusion import build_prefill_framefusion

    s_full = embeds.shape[1]
    prefill = build_prefill_framefusion(cfg, spec, s_full)
    if spec.compact_at_layer:
        return _generate_framefusion_compact(
            params, cfg, embeds, valid_len, video_start, spec, gen, prefill,
            position_ids, kv_int8=kv_int8,
        )
    decode = _build_decode_step_masked(cfg)

    t0 = time.perf_counter()
    logits, cache, alive = prefill(
        params, embeds, jnp.int32(valid_len), jnp.int32(video_start), position_ids
    )
    logits.block_until_ready()
    ttft = time.perf_counter() - t0
    if kv_int8:
        cache = qwen2.quantize_kv_cache(cache)

    # extend the mask over the decode tail (new tokens are always visible;
    # fixed-slot decode writes land there, and the [valid_len, s_full) pad
    # gap is hidden by decode_layers' composite mask)
    kv_mask = jnp.concatenate([alive, jnp.ones((MAX_DECODE,), bool)])
    sp = gen.sampling
    skey = make_key(sp.seed) if sp is not None and not sp.greedy else None
    token = select_token(logits, sp, skey, 0)
    ids = [int(token[0])]
    merged_len = int(alive.sum())

    time_decoding = 0.0
    step = 0
    while len(ids) < gen.max_new_tokens and ids[-1] not in gen.eos_token_ids:
        t0 = time.perf_counter()
        logits, cache = decode(params, token, cache, jnp.int32(step), kv_mask)
        logits = jax.block_until_ready(logits)
        time_decoding += time.perf_counter() - t0
        token = select_token(logits, sp, skey, len(ids))
        ids.append(int(token[0]))
        step += 1

    runtime = {
        "ttft_llm": ttft,
        "time_decoding": time_decoding,
        "num_dec_token": len(ids),
        "merged_len": merged_len,
        "full_len": int(valid_len),
    }
    return ids, runtime


def _generate_framefusion_compact(params, cfg, embeds, valid_len, video_start,
                                  spec, gen, prefill, position_ids=None,
                                  kv_int8: bool = False):
    """FrameFusion with compaction: layers >= compact_at_layer run at the
    budget length (real TTFT saving, framefusion.py compact mode)."""
    s_full = embeds.shape[1]
    decode = _build_decode_step_masked2(cfg, spec.compact_at_layer)

    t0 = time.perf_counter()
    logits, cache, alive, (new_valid, exact, overflow) = prefill(
        params, embeds, jnp.int32(valid_len), jnp.int32(video_start), position_ids
    )
    logits.block_until_ready()
    ttft = time.perf_counter() - t0
    if kv_int8:
        cache = qwen2.quantize_kv_cache(cache)

    # group-0 mask: surviving tokens; the decode tail is always visible and
    # the pad gap is hidden by decode_layers' composite mask
    kv_mask0 = jnp.concatenate([alive, jnp.ones((MAX_DECODE,), bool)])
    sp = gen.sampling
    skey = make_key(sp.seed) if sp is not None and not sp.greedy else None
    token = select_token(logits, sp, skey, 0)
    ids = [int(token[0])]
    merged_len = int(new_valid)

    time_decoding = 0.0
    step = 0
    while len(ids) < gen.max_new_tokens and ids[-1] not in gen.eos_token_ids:
        t0 = time.perf_counter()
        logits, cache = decode(params, token, cache, jnp.int32(step), kv_mask0)
        logits = jax.block_until_ready(logits)
        time_decoding += time.perf_counter() - t0
        token = select_token(logits, sp, skey, len(ids))
        ids.append(int(token[0]))
        step += 1

    runtime = {
        "ttft_llm": ttft,
        "time_decoding": time_decoding,
        "num_dec_token": len(ids),
        "merged_len": merged_len,
        "full_len": int(valid_len),
        "compact_exact": bool(exact),
        "compact_overflow": int(overflow),
    }
    if not runtime["compact_exact"]:
        from ..utils.logging import rank0_print

        rank0_print(
            "WARNING: FrameFusion compaction fired before merge/prune finished "
            "(compact_exact=False); raise compact_at_layer for exact semantics"
        )
    return ids, runtime

def spec_from_pattern(pattern: str, t: int, h: int, w: int, **kw):
    """Library-level dispatcher mirroring the reference's
    replace_qwen2_by_sparse_attn(sa_pattern, ...) interface
    (token_merging_utils/monkey_patch_interface.py:17-38). Returns the
    reducer spec(s) for ``generate`` (None for origin/streamingllm —
    streaming is an attention-pattern flag, see generate(attn_sinks=...)).
    """
    from .framefusion import FrameFusionSpec

    nv = t * h * w
    layer = kw.get("sa_start_layer_idx", 2)
    pad = kw.get("pad_multiple", 1)
    if pattern == "origin" or pattern == "streamingllm":
        return None
    if pattern == "quadtree":
        return ReducerSpec(
            kind="quadtree", layer_idx=layer, t=t, h=h, w=w,
            video_budget=kw.get("video_budget", int(0.6 * nv)),
            spatial_thresh=kw.get("sa_tree_thresh", 0.9),
            temporal_thresh=kw.get("sa_tree_temporal_thresh", -1.0),
            root_level=kw.get("sa_tree_root_level", 0),
            weighted_avg=kw.get("sa_tree_weighted_avg", False),
            sim_head_dim=kw.get("sim_head_dim"),
            pos_emb_ver=kw.get("pos_emb_ver", 0),
            pad_multiple=pad,
        )
    if pattern == "tome":
        return ReducerSpec(kind="tome", layer_idx=layer, t=t, h=h, w=w,
                           prune_ratio=kw.get("sa_prune_ratio", 0.5),
                           tome_per=kw.get("sa_tome_ver", "video"),
                           pad_multiple=pad)
    if pattern in ("dycoke-stage1", "dycoke"):
        return ReducerSpec(kind="dycoke", layer_idx=layer, t=t, h=h, w=w,
                           prune_ratio=kw.get("sa_prune_ratio", 0.7),
                           pad_multiple=pad)
    if pattern == "fastv":
        return ReducerSpec(kind="fastv", layer_idx=layer, t=t, h=h, w=w,
                           prune_ratio=kw.get("sa_fastv_evict_ratio", 0.5),
                           pad_multiple=pad)
    if pattern == "octree":
        return ReducerSpec(kind="octree", layer_idx=layer, t=t, h=h, w=w,
                           video_budget=kw.get("video_budget", int(0.6 * nv)),
                           spatial_thresh=kw.get("sa_tree_thresh", 0.9),
                           root_level=kw.get("sa_tree_root_level", 0),
                           pad_multiple=pad)
    if pattern == "pyrd":
        specs, hh, ww = [], h, w
        for loc, size in zip(kw["sa_pyrd_loc_list"], kw["sa_pyrd_size_list"]):
            specs.append(ReducerSpec(kind="pyrd", layer_idx=loc, t=t, h=hh, w=ww,
                                     pyrd_size=size, pad_multiple=pad))
            hh = ww = size
        return tuple(specs)
    if pattern in ("framefusion", "merging"):
        return FrameFusionSpec(cost=kw.get("sa_framefusion_cost", 0.3), t=t, h=h, w=w,
                               enable_prune=pattern == "framefusion",
                               compact_at_layer=kw.get("sa_framefusion_compact_layer", 0),
                               compact_budget=kw.get("sa_framefusion_compact_budget", 0))
    raise ValueError(f"unknown sa_pattern {pattern!r}")

def generate_batch(
    params,
    cfg: DecoderConfig,
    embeds: jnp.ndarray,
    valid_lens,
    video_starts,
    spec,
    gen: GenerateConfig = GenerateConfig(),
    impl: str = "xla",
    position_ids=None,
    decode_chunk_size: int = 1,
    decode_attn_kernel: bool = False,
    pos_bases=None,
    t_valids=None,
    spec_decode_k: int = 0,
    histories=None,
    draft_fn=None,
    kv_int8: bool = False,
):
    """Batched greedy generation — beyond the reference's strict batch=1
    (eval_vidqa_by_feat_llavavideo.py:208). Samples share (s_full, spec);
    per-sample valid lengths/video starts vary. embeds: [B, s_full, D];
    valid_lens/video_starts: [B]. position_ids: optional [B, ...] per-sample.

    Implementation (the standard serving split): prefills run SEQUENTIALLY
    (a 25k-token prefill's activations are per-sample and large), then decode
    runs HEAD-PACKED: the batch is folded into the cache's KV-head axis
    ([Lg, 1, S, B*KV, hd]) so the batched decode program is shape-identical
    to the single-sample one and each step reads the weights once (decode is
    weight-bandwidth-bound). Attention is per-head independent, so the
    folding is exact. A real batch axis — via vmap OR natively — makes
    XLA:TPU's attention-read and cache-update layout preferences collide and
    the per-layer cache updates stop aliasing in place (measured 10x decode
    slowdown at batch 2-4 at the 7B operating point, see decode_layers).
    Returns (ids list-of-lists, runtime dict).

    ``spec_decode_k >= 2`` runs BATCHED greedy speculative decoding instead
    of the chunked loop (build_verify_chunk_batch): per-row n-gram drafts,
    one dispatch verifies B*k tokens for ~one weight read. Token-exact for
    any drafter. ``histories`` (optional, per-row prompt token ids) seeds
    the drafter like generate()'s prompt_ids.

    ``gen.sampling`` (temperature > 0) samples ON DEVICE inside the chunked
    decode, folding the GLOBAL step index into the key — chunk size cannot
    change the draws and a seed replays exactly. Overrides spec_decode_k
    (the verify machinery is greedy).
    """
    b, s_full, _ = embeds.shape
    spec_key = spec if (spec is None or isinstance(spec, ReducerSpec)) else tuple(spec)
    prefill = build_prefill(cfg, spec_key, s_full, impl, kv_int8=kv_int8)
    chunk = max(1, min(decode_chunk_size, gen.max_new_tokens))
    samp = static_sample_key(gen.sampling)  # None = greedy programs
    speculative = spec_decode_k > 1 and samp is None  # spec verify is greedy
    if speculative:
        k, tail_slots, (init_row_buf, insert_row, update_mask, verify_chunk) = (
            _spec_batch_builders(cfg, spec_key, spec_decode_k, gen)
        )
        _batched_init = lambda x: init_row_buf(x, b)
    else:
        insert_row, decode_chunk = build_decode_chunk_batch(
            cfg, spec_key, chunk, tuple(gen.eos_token_ids), cfg.num_kv_heads,
            attn_kernel=decode_attn_kernel, sample=samp,
        )

        # Prefill samples sequentially, inserting each cache row into the
        # batched buffer in place (donated): ks/vs rows land in the cache's
        # KV-HEAD axis at offset i*KV (head packing), scalar leaves (lens,
        # pos_base) become [B]. Holding all per-sample caches and stacking at
        # the end would peak at 2x the batched-cache footprint — which OOMs
        # one v5e chip at the full 28-layer 7B point.
        def _batched_init(x):
            return _batched_like(x, b)

    vl = jnp.asarray(valid_lens, jnp.int32)
    vs = jnp.asarray(video_starts, jnp.int32)

    t0 = time.perf_counter()
    logits_rows, cache = [], None
    for i in range(b):
        p = None if position_ids is None else jnp.asarray(position_ids)[i]
        pb = None if pos_bases is None else jnp.int32(pos_bases[i])
        tv = None if t_valids is None else jnp.int32(t_valids[i])
        out = prefill(params, embeds[i : i + 1], vl[i], vs[i], p, pb, tv)
        jax.block_until_ready(out[0])
        logits_rows.append(out[0])
        ci = out[1]  # kv_int8: the prefill already wrote int8 + scales —
        # no per-row quantize pass, so the bf16 row transient is gone too
        if cache is None:
            cache = jax.tree.map(_batched_init, ci)
        cache = insert_row(cache, ci, jnp.int32(i))
        del out, ci
    logits = jnp.concatenate(logits_rows)  # [B, V]
    logits.block_until_ready()
    ttft = time.perf_counter() - t0

    merged_lens = [int(m) for m in cache.merged_len]
    spec_stats = {}
    if speculative:
        ids, time_decoding, spec_stats = _batched_spec_decode(
            params, logits, cache, gen, k, tail_slots, update_mask,
            verify_chunk, histories=histories, draft_fn=draft_fn,
        )
    else:
        ids, time_decoding = _batched_greedy_decode(
            params, logits, cache, gen, decode_chunk, chunk
        )

    runtime = {
        "ttft_llm": ttft,
        "time_decoding": time_decoding,
        "num_dec_token": [len(x) for x in ids],
        "merged_len": merged_lens,
        "full_len": [int(v) for v in vl],
        **spec_stats,
    }
    return ids, runtime
