"""Video-QA eval harness: resumable, instrumented, flush-per-sample.

Behavioral port of the reference eval entry points
(llava/eval/eval_vidqa_by_feat_llavavideo.py): per-sample greedy generation
(<=32 new tokens), append-mode JSONL predictions so crashed runs resume
(:182-204), one warm-up generation to de-noise latency (:220-231), per-sample
runtime + prompt-stat streams (:233-252), then accuracy metrics.

TPU specifics: sequence buffers are padded to a multiple of ``pad_multiple``
(one compile per bucket, cached); the video grid (T, H, W) is exact per
sample so merge decisions match the reference's dynamic shapes.
"""

from __future__ import annotations

import dataclasses
import math
import os
import time
from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..models import llava, qwen2
from ..models.config import DecoderConfig
from ..models.llava import LlavaConfig
from ..runtime.generate import GenerateConfig, generate
from ..runtime.reducer import ReducerSpec
from . import metrics as metrics_mod
from .reporting import append_jsonl, prompt_stat_ratios, read_jsonl

__all__ = ["EvalConfig", "LlavaEvaluator", "run_name"]


@dataclasses.dataclass
class EvalConfig:
    out_dir: str
    dataset_name: str
    max_new_tokens: int = 32
    pad_multiple: int = 128
    warmup: bool = True
    attention_impl: str = "flash"
    eos_token_ids: tuple = (151645, 151643)
    # StreamingLLM A-shape attention (0 = off)
    attn_sinks: int = 0
    attn_window: int = 0
    # DyCoke stage-2 decode pruning (None = off): (dycoke_l, dycoke_p)
    dycoke_decode: tuple | None = None
    # Bucket frame counts to multiples of this (0 = off) by repeating the
    # last frame: bounds jit recompiles across mixed-length videos. Repeated
    # frames temporally merge into their source nodes, so the merged token
    # set/features are unchanged; EXACT when the merge layer is 0 (72B
    # config), approximate for k>0 (pad tokens participate in pre-merge
    # attention). Requires temporal merging (quadtree temporal_thresh > 0).
    frame_bucket: int = 0
    # Decode tokens per device dispatch (1 = per-step, reference-style
    # per-token timing; > 1 = on-device chunked decode, token-exact,
    # amortizes dispatch overhead at the cost of per-chunk timing
    # granularity — runtime/generate.py build_decode_chunk).
    decode_chunk_size: int = 1
    # >= 2 enables greedy speculative decoding (token-exact): an n-gram
    # prompt-lookup drafter proposes k-1 tokens and one verify dispatch
    # scores them all — runtime/generate.py build_verify_step. Takes
    # precedence over decode_chunk_size. Composes with batch_size > 1
    # (one dispatch verifies B*k tokens, build_verify_chunk_batch) and,
    # batched, with prefix_cache on both layouts (flat, or prefix_cascade
    # via build_verify_chunk_cascade), and with prefix_pool (paged verify).
    spec_decode_k: int = 0
    # With spec_decode_k >= 2: draft on device through the first E layers
    # (self-speculative / layer-skip, build_selfspec_step) instead of the
    # host n-gram drafter — one fused draft+verify dispatch per cycle.
    # Per-sample path only (batched/pooled serving keeps the host drafter).
    spec_draft_layers: int = 0
    # Sampling (runtime/sampling.py): temperature > 0 switches token
    # selection from greedy (the reference's do_sample=False default,
    # eval_vidqa_by_feat_llavavideo.py:167) to temperature/top-k/top-p
    # sampling with a seed-deterministic global-step-folded key. Per-sample
    # generation samples per step; batched serving samples ON DEVICE inside
    # the chunked decode (chunk-size invariant). Speculative decode and the
    # continuous/paged pools stay greedy (sampling overrides spec_decode_k).
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    sample_seed: int = 0
    # Sequence-parallel prefill devices (1 = off): ring-attention prefill
    # over an sp mesh for prompts beyond one chip's HBM (>128-frame
    # prefills), merged/decoded on device 0 — parallel/ring.py sp_generate.
    # Supports the origin pattern and single non-scoring reducers (quadtree/
    # octree/tome/dycoke-stage1) with 1D RoPE; per-sample path only.
    sp: int = 1
    # Samples per generate call (1 = reference-style per-sample eval;
    # > 1 = head-packed batched serving: samples are grouped by compile key
    # (same padded length / spec) and decoded together — runtime/generate.py
    # generate_batch. TTFT/decode times are then reported per sample as
    # batch totals divided by the batch. Unsupported for FrameFusion,
    # DyCoke stage-2, and StreamingLLM decode (falls back to per-sample).
    batch_size: int = 1
    # Reuse the [sys|video] prefill cache across questions of the same video
    # (every annotation set asks several questions per vid; the reference
    # re-prefills the whole prompt per question,
    # eval_vidqa_by_feat_llavavideo.py:236-244). Causal attention makes the
    # prefix prefill — merge included — question-independent, so its cache is
    # token-exactly reusable (runtime/generate.py prefix_prefill). ttft_llm
    # then reports the per-question EXTENSION cost; each group's first row
    # additionally carries prefix_prefill_time (paid once per video).
    # LLaVA + Qwen2-VL. Composes with batch_size > 1 (each video's questions
    # run head-packed-batched over the shared cache) and, when batched, with
    # decode_chunk_size or spec_decode_k (flat or cascade layout). Ignored
    # when combined with sp/dycoke-decode/streaming/frame_bucket or
    # score-based reducers (falls back to per-sample full prefill).
    prefix_cache: bool = False
    # With prefix_cache + batch_size > 1: keep ONE shared read-only prefix
    # cache in HBM (cascade KV layout, qwen2.cascade_attention) instead of a
    # copy per batch slot — decode reads the prefix once per step for the
    # whole group and (B-1) prefix copies of HBM are freed. Exact online-
    # softmax combine (math equals the flat path up to fp reassociation).
    prefix_cascade: bool = False
    # With prefix_cache: pool up to this many VIDEOS' prefix caches into one
    # paged pool (runtime/serving.py serve_continuous_paged) and run ALL
    # their questions through one continuous pool of batch_size slots —
    # each video's prefix prefilled once, resident once, read once per
    # decode step; questions of different videos interleave. Composes with
    # spec_decode_k (serve_continuous_paged_spec). Videos cluster by
    # compile key (same spec + unified buffer shapes); mutually exclusive
    # with prefix_cascade (the pool IS the cascade layout, paged). 0 = off.
    prefix_pool: int = 0
    # With prefix_pool: store pool pages as int8 (half the pool HBM and
    # prefix read traffic, 2x resident videos per chip; bounded
    # approximation — runtime/generate.py build_prefix_pool).
    pool_int8: bool = False
    # int8 LIVE KV cache on the per-sample and flat-batched decode paths
    # (qwen2.quantize_kv_cache + per-write-slot quantization in
    # decode_layers): halves cache HBM and per-step KV read traffic —
    # decisive for batched decode (B cache reads per weight read; cache
    # HBM caps the flat batch size), small for single-stream (weight-read-
    # bound). Bounded approximation like pool_int8; composes with
    # decode_chunk_size, spec_decode_k incl. self-speculative drafting
    # (int8 draft + verify reads), all sa_patterns, and the batched FLAT
    # prefix layout (each extended row quantized before packing — the
    # layout whose b=8 leg OOMs in bf16); cascade/pooled prefixes have
    # pool_int8 instead.
    kv_int8: bool = False

    def gen_config(self) -> GenerateConfig:
        sp = None
        if self.temperature > 0.0:
            from ..runtime.sampling import SamplingParams

            sp = SamplingParams(
                self.temperature, self.top_k, self.top_p, self.sample_seed
            )
        return GenerateConfig(self.max_new_tokens, self.eos_token_ids, sp)


def _prefix_compatible(spec) -> bool:
    """Whether a reducer spec supports the question-independent prefix
    cache: FrameFusion-style specs merge layerwise (no reusable prefix),
    and score-based reducers (fastv) rank by the last INSTRUCTION token,
    which a [sys|video] prefix doesn't contain (prefix_prefill raises)."""
    if spec is None:
        return True
    if not isinstance(spec, (ReducerSpec, tuple)):
        return False
    specs = spec if isinstance(spec, tuple) else (spec,)
    return not any(sp.needs_scores for sp in specs)


def _spec_histories(samples):
    """Per-row prompt token ids that seed the speculative drafter
    (n-gram prompt lookup) — one place so every batched path drafts from
    the same history definition."""
    return [
        [int(t) for t in np.asarray(s["input_ids"]).reshape(-1)]
        for s in samples
    ]


def run_name(model_name: str, dataset: str, spec: ReducerSpec | None, frames: int) -> str:
    """Config-encoding run directory (the reference's experiment tracking is
    the output-dir name, eval_utils.py:136-204)."""
    if spec is None:
        sa = "full"
    elif isinstance(spec, tuple):  # multi-stage (pyrd)
        sa = "-".join(f"{s.kind}{s.layer_idx}x{s.pyrd_size}" for s in spec)
    elif not isinstance(spec, ReducerSpec):  # FrameFusionSpec
        sa = f"framefusion_cost-{spec.cost}" + ("" if spec.enable_prune else "_merge-only")
    elif spec.kind in ("quadtree", "octree"):
        sa = (
            f"{spec.kind}_l-{spec.layer_idx}_root-{spec.root_level}"
            f"_thr-{spec.spatial_thresh}_tthr-{spec.temporal_thresh}"
        )
    else:
        sa = f"{spec.kind}_l-{spec.layer_idx}_ratio-{spec.prune_ratio}"
    return f"{model_name}_{dataset}_F-{frames}_{sa}"


class SmokeTokenizer:
    """Checkpoint-free byte tokenizer for CLI smoke runs (--smoke): maps
    characters to small ids and decodes ids to letters so the MCQ letter
    extraction has something to chew on. A debug affordance in the spirit of
    the reference's first_sample/temporal_skip_freq (video_dataset.py:316)."""

    def encode(self, text, add_special_tokens=False):
        return [ord(c) % 250 for c in text][:40]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(65 + (i % 26)) for i in ids[:3])


class Qwen2VLEvaluator:
    """Qwen2-VL feature-based evaluator: embeds assembled by scattering cached
    features over the video-pad run (eval_vidqa_by_feat_qwen2vl.py:161-176),
    M-RoPE positions built per sample, 3D position gather after merging."""

    def __init__(self, decoder_params, decoder_cfg: DecoderConfig, tokenizer, spec_factory):
        self.decoder_params = decoder_params
        self.decoder_cfg = decoder_cfg
        self.tokenizer = tokenizer
        self.spec_factory = spec_factory

    def run_sample(self, sample: dict, cfg: EvalConfig):
        from ..models.qwen2vl import assemble_video_embeds, build_video_mrope_positions

        t, gh, gw = sample["grid"]
        raw_len = len(sample["input_ids"])
        s_full = math.ceil(raw_len / cfg.pad_multiple) * cfg.pad_multiple
        embeds, valid, video_start, n_video = assemble_video_embeds(
            self.decoder_params, sample["input_ids"], jnp.asarray(sample["feature"]), s_full
        )
        pre_len = video_start
        post_len = valid - video_start - n_video
        pos, _ = build_video_mrope_positions(pre_len, t, gh, gw, post_len, s_full)
        spec = self.spec_factory(t, gh, gw)
        t0 = time.perf_counter()
        ids, runtime = generate(
            self.decoder_params, self.decoder_cfg, embeds, valid, video_start, spec,
            cfg.gen_config(),
            impl=cfg.attention_impl, position_ids=pos,
            attn_sinks=cfg.attn_sinks, attn_window=cfg.attn_window,
            decode_chunk_size=cfg.decode_chunk_size,
            spec_decode_k=cfg.spec_decode_k,
            prompt_ids=[int(i) for i in sample["input_ids"]]
            if cfg.spec_decode_k > 1 else None,
            spec_draft_layers=cfg.spec_draft_layers,
            kv_int8=cfg.kv_int8,
        )
        runtime["all"] = time.perf_counter() - t0
        text = self.tokenizer.decode(
            [i for i in ids if i not in cfg.eos_token_ids], skip_special_tokens=True
        ).strip()
        merged_input = runtime["merged_len"]
        stat = prompt_stat_ratios({
            "sys": pre_len, "video": n_video, "inst": post_len,
            "merged_video": merged_input - (valid - n_video),
            "merged_input": merged_input,
        })
        return text, runtime, stat

    def compile_key(self, sample: dict, cfg: EvalConfig):
        """Jit-compile cache key for this sample (per-key warm-up)."""
        raw_len = len(sample["input_ids"])
        s_full = math.ceil(raw_len / cfg.pad_multiple) * cfg.pad_multiple
        return (s_full, self.spec_factory(*sample["grid"]))

    def _prefix_key(self, sample: dict):
        """Prefix-cache grouping key: (vid, tokens up to and including the
        <|video_pad|> run). Tokens after the video are the question suffix."""
        from ..models.qwen2vl import VIDEO_PAD_TOKEN_ID

        ids = np.asarray(sample["input_ids"]).reshape(-1)
        pad_pos = np.nonzero(ids == VIDEO_PAD_TOKEN_ID)[0]
        if len(pad_pos) == 0 or pad_pos[-1] - pad_pos[0] + 1 != len(pad_pos):
            return None
        return (sample["vid"], tuple(ids[: int(pad_pos[-1]) + 1].tolist()))

    def _prefix_plan(self, key, grp, cfg: EvalConfig, s_sfx_min: int = 0,
                     s_full_min: int = 0, sizes_only: bool = False):
        """Qwen2-VL prefix plan: scatter features over the video-pad run of
        the shared prefix, build M-RoPE positions for it, and embed each
        question's post-video tokens as the suffix. The extension's
        pos_base = max unmerged prefix position + 1 (prefix_prefill), which
        is exactly where get_rope_index puts post-video text
        (modeling_qwen2vl.py:1452-1581), so positions match the full path.
        ``s_sfx_min``/``s_full_min`` unify buffer shapes across videos of a
        prefix-pool cluster (one compile key per pool); ``sizes_only``
        returns just the clustering scalars WITHOUT assembling device
        embeds (the pooled path sizes every video upfront — holding real
        plans for the whole eval set would pin all prefix embeds in HBM)."""
        from ..models.qwen2vl import assemble_video_embeds, build_video_mrope_positions
        from ..runtime.generate import prefix_prefill

        t, gh, gw = grp[0]["grid"]
        spec = self.spec_factory(t, gh, gw)
        if not _prefix_compatible(spec):
            return None
        prefix_ids = np.asarray(key[1], np.int32)
        prefix_valid = len(prefix_ids)
        insts = [np.asarray(s["input_ids"]).reshape(-1)[prefix_valid:] for s in grp]
        s_sfx = max(16, math.ceil(max(len(i) for i in insts) / 16) * 16, s_sfx_min)
        s_full = max(
            math.ceil((prefix_valid + s_sfx) / cfg.pad_multiple) * cfg.pad_multiple,
            s_full_min,
        )
        if sizes_only:
            return dict(spec=spec, prefix_valid=prefix_valid, s_sfx=s_sfx)
        embeds, _, video_start, n_video = assemble_video_embeds(
            self.decoder_params, prefix_ids, jnp.asarray(grp[0]["feature"]), s_full
        )
        pos, _ = build_video_mrope_positions(video_start, t, gh, gw, 0, s_full)

        def suffix_embeds(inst):
            e = qwen2.embed_tokens(
                self.decoder_params, jnp.asarray(inst, jnp.int32), self.decoder_cfg
            )
            return jnp.pad(e, ((0, s_sfx - len(inst)), (0, 0)))[None]

        def run_prefill():
            return prefix_prefill(
                self.decoder_params, self.decoder_cfg, embeds, prefix_valid,
                video_start, spec, impl=cfg.attention_impl, position_ids=pos,
            )

        return dict(
            spec=spec, sys_len=video_start, n_video=n_video,
            prefix_valid=prefix_valid, insts=insts, s_sfx=s_sfx, s_full=s_full,
            run_prefill=run_prefill, suffix_embeds=suffix_embeds,
        )

    # assigned below (share LlavaEvaluator's loops)
    evaluate = None
    _evaluate_prefix_cached = None
    _evaluate_prefix_pooled = None
    _emit = None
    _sample_features = None


class LlavaEvaluator:
    def __init__(
        self,
        decoder_params,
        decoder_cfg: DecoderConfig,
        llava_cfg: LlavaConfig,
        mm_params,
        tokenizer,
        spec_factory: Callable[[int, int, int], ReducerSpec | None],
    ):
        self.decoder_params = decoder_params
        self.decoder_cfg = decoder_cfg
        self.llava_cfg = llava_cfg
        self.mm_params = mm_params
        self.tokenizer = tokenizer
        self.spec_factory = spec_factory

    def _prepare(self, sample: dict, pad_multiple: int, frame_bucket: int = 0):
        feats = jnp.asarray(sample["feature"])
        t = feats.shape[0]
        t_real = t
        if frame_bucket > 0 and t % frame_bucket:
            t_b = math.ceil(t / frame_bucket) * frame_bucket
            reps = jnp.repeat(feats[-1:], t_b - t, axis=0)
            feats = jnp.concatenate([feats, reps], axis=0)
            t = t_b
        side = self.llava_cfg.pooled_side
        per_frame = self.llava_cfg.tokens_per_frame()
        n_video = t * per_frame
        raw_len = sample["sys_len"] + n_video + sample["inst_len"]
        s_full = math.ceil(raw_len / pad_multiple) * pad_multiple
        embeds, valid, video_start, nv = llava.build_multimodal_embeds(
            self.decoder_params, self.llava_cfg, self.mm_params,
            sample["input_ids"], feats, s_full,
        )
        spec = self.spec_factory(t, side, side)
        # decode positions continue from the REAL (unbucketed) prompt length;
        # t_valid tells the merger which frames are real
        pos_base = sample["sys_len"] + t_real * per_frame + sample["inst_len"]
        t_valid = t_real if t_real != t else None
        return embeds, valid, video_start, nv, spec, pos_base, t_valid

    def run_sample(self, sample: dict, cfg: EvalConfig):
        embeds, valid, video_start, n_video, spec, pos_base, t_valid = self._prepare(
            sample, cfg.pad_multiple, cfg.frame_bucket
        )
        dyc = None
        if cfg.dycoke_decode is not None and isinstance(spec, ReducerSpec) and spec.kind == "dycoke":
            from ..runtime.generate import DycokeDecodeOptions

            dyc = DycokeDecodeOptions(
                layer_idx=cfg.dycoke_decode[0], ratio=cfg.dycoke_decode[1],
                img_len=spec.video_out_len(),
            )
        t0 = time.perf_counter()
        if cfg.sp > 1:
            from ..parallel.ring import create_sp_mesh, sp_generate

            if dyc is not None or cfg.attn_sinks or cfg.attn_window:
                raise ValueError("--sp is unsupported with dycoke decode / streamingllm")
            ids, runtime = sp_generate(
                self.decoder_params, self.decoder_cfg, embeds, valid, video_start,
                spec, create_sp_mesh(cfg.sp),
                gen=cfg.gen_config(),
                impl=cfg.attention_impl, pos_base=pos_base, t_valid=t_valid,
                kv_int8=cfg.kv_int8,
            )
        else:
            ids, runtime = generate(
                self.decoder_params, self.decoder_cfg, embeds, valid, video_start, spec,
                cfg.gen_config(), impl=cfg.attention_impl,
                attn_sinks=cfg.attn_sinks, attn_window=cfg.attn_window, dycoke=dyc,
                pos_base=pos_base, t_valid=t_valid,
                decode_chunk_size=cfg.decode_chunk_size,
                spec_decode_k=cfg.spec_decode_k,
                prompt_ids=[int(i) for i in sample["input_ids"]]
                if cfg.spec_decode_k > 1 else None,
                spec_draft_layers=cfg.spec_draft_layers,
                kv_int8=cfg.kv_int8,
            )
        runtime["all"] = time.perf_counter() - t0
        text = self.tokenizer.decode(
            [i for i in ids if i not in cfg.eos_token_ids], skip_special_tokens=True
        ).strip()
        merged_input = runtime["merged_len"]
        stat = prompt_stat_ratios(
            {
                "sys": sample["sys_len"],
                "video": n_video,
                "inst": sample["inst_len"],
                "merged_video": merged_input - (valid - n_video),
                "merged_input": merged_input,
            }
        )
        return text, runtime, stat

    def compile_key(self, sample: dict, cfg: EvalConfig):
        """Jit-compile cache key for this sample. Warm-up must run once per
        NEW key, not once per eval: every new (s_full, spec) bucket triggers
        a fresh jit compile that would otherwise pollute the first timed
        ttft_llm of the bucket (the reference's single warm-up,
        eval_vidqa_by_feat_llavavideo.py:220-231, suffices only because torch
        has no shape recompiles)."""
        t = sample["frame_len"]
        t_real = t
        if cfg.frame_bucket > 0 and t % cfg.frame_bucket:
            t = math.ceil(t / cfg.frame_bucket) * cfg.frame_bucket
        per_frame = self.llava_cfg.tokens_per_frame()
        raw_len = sample["sys_len"] + t * per_frame + sample["inst_len"]
        s_full = math.ceil(raw_len / cfg.pad_multiple) * cfg.pad_multiple
        side = self.llava_cfg.pooled_side
        # t_valid None vs scalar changes the traced prefill signature
        return (s_full, self.spec_factory(t, side, side), t_real != t)

    def _sample_features(self, sample: dict):
        return jnp.asarray(sample["feature"])

    def _emit(self, sample, text, runtime, stat, pred_path, rt_path, stat_path):
        append_jsonl(pred_path, {
            "question_id": sample["id"], "vid": sample["vid"],
            "answer": text, "gt": sample["answer"],
        })
        append_jsonl(rt_path, {"question_id": sample["id"], **runtime})
        append_jsonl(stat_path, {"question_id": sample["id"], **stat})

    def _prefix_key(self, sample: dict):
        """Grouping key for prefix caching: (vid, the question-independent
        token prefix — everything up to and including the image token).
        None = no shareable prefix (run the sample on the normal path)."""
        from ..models.llava import IMAGE_TOKEN_INDEX

        ids = np.asarray(sample["input_ids"]).reshape(-1)
        img_pos = np.nonzero(ids == IMAGE_TOKEN_INDEX)[0]
        if len(img_pos) != 1:
            return None
        return (sample["vid"], tuple(ids[: int(img_pos[0]) + 1].tolist()))

    def _prefix_plan(self, key, grp, cfg: EvalConfig, s_sfx_min: int = 0,
                     s_full_min: int = 0, sizes_only: bool = False):
        """Build a group's prefix-prefill plan, or None to fall back to the
        per-sample path (e.g. FrameFusion specs, which merge layerwise and
        have no question-independent prefix cache). ``s_sfx_min``/
        ``s_full_min`` unify buffer shapes across videos of a prefix-pool
        cluster (one compile key per pool); ``sizes_only`` returns just the
        clustering scalars without assembling device embeds."""
        from ..runtime.generate import prefix_prefill

        feats = self._sample_features(grp[0])
        side = self.llava_cfg.pooled_side
        spec = self.spec_factory(feats.shape[0], side, side)
        if not _prefix_compatible(spec):
            return None
        prefix_ids = np.asarray(key[1], np.int32)
        sys_len = len(prefix_ids) - 1  # prefix = sys tokens + image token
        n_video = feats.shape[0] * self.llava_cfg.tokens_per_frame()
        prefix_valid = sys_len + n_video
        insts = [np.asarray(s["input_ids"]).reshape(-1)[sys_len + 1 :] for s in grp]
        s_sfx = max(16, math.ceil(max(len(i) for i in insts) / 16) * 16, s_sfx_min)
        s_full = max(
            math.ceil((prefix_valid + s_sfx) / cfg.pad_multiple) * cfg.pad_multiple,
            s_full_min,
        )
        if sizes_only:
            return dict(spec=spec, prefix_valid=prefix_valid, s_sfx=s_sfx)
        embeds, _, video_start, _ = llava.build_multimodal_embeds(
            self.decoder_params, self.llava_cfg, self.mm_params,
            prefix_ids, feats, s_full,
        )

        def suffix_embeds(inst):
            e = qwen2.embed_tokens(
                self.decoder_params, jnp.asarray(inst, jnp.int32), self.decoder_cfg
            )
            return jnp.pad(e, ((0, s_sfx - len(inst)), (0, 0)))[None]

        def run_prefill():
            return prefix_prefill(
                self.decoder_params, self.decoder_cfg, embeds, prefix_valid,
                video_start, spec, impl=cfg.attention_impl,
            )

        return dict(
            spec=spec, sys_len=sys_len, n_video=n_video, prefix_valid=prefix_valid,
            insts=insts, s_sfx=s_sfx, s_full=s_full,
            run_prefill=run_prefill, suffix_embeds=suffix_embeds,
        )

    def _evaluate_prefix_cached(self, samples, cfg: EvalConfig, pred_path, rt_path, stat_path):
        """Prefix-cached serving: questions grouped by (vid, system prefix);
        each group prefills the question-independent prefix once (merge
        included) and every question runs as a cache extension + decode.
        Token-exact vs the per-question full prefill
        (tests/test_prefix_cache.py); family specifics live in
        _prefix_key/_prefix_plan."""
        from collections import defaultdict

        import jax

        from ..runtime.generate import generate_from_prefix

        groups: dict = defaultdict(list)
        for s in samples:
            key = self._prefix_key(s)
            groups[key if key is not None else ("solo", s["id"])].append(s)

        gen = cfg.gen_config()
        warmed: set = set()
        for key, grp in groups.items():
            plan = None
            if key[0] != "solo" and len(grp) > 1:
                plan = self._prefix_plan(key, grp, cfg)
            if plan is None:
                # singletons / FrameFusion etc.: normal per-sample path,
                # warmed per compile key like the unbatched loop
                for s in grp:
                    k = self.compile_key(s, cfg)
                    if cfg.warmup and k not in warmed:
                        self.run_sample(s, cfg)
                        warmed.add(k)
                    self._emit(s, *self.run_sample(s, cfg), pred_path, rt_path, stat_path)
                continue

            if cfg.batch_size > 1:
                self._run_prefix_group_batched(
                    grp, plan, cfg, gen, warmed, pred_path, rt_path, stat_path
                )
                continue

            spec = plan["spec"]
            run_prefill = plan["run_prefill"]
            suffix_embeds = plan["suffix_embeds"]
            insts = plan["insts"]
            wkey = ("prefix", plan["s_full"], plan["s_sfx"], spec)
            if cfg.warmup and wkey not in warmed:
                generate_from_prefix(
                    self.decoder_params, self.decoder_cfg, run_prefill(),
                    suffix_embeds(insts[0]), len(insts[0]), spec, gen,
                )
                warmed.add(wkey)

            t0 = time.perf_counter()
            cache = jax.block_until_ready(run_prefill())
            prefill_time = time.perf_counter() - t0
            for i, (s, inst) in enumerate(zip(grp, insts)):
                t0 = time.perf_counter()
                ids, runtime = generate_from_prefix(
                    self.decoder_params, self.decoder_cfg, cache,
                    suffix_embeds(inst), len(inst), spec, gen,
                )
                runtime["all"] = time.perf_counter() - t0
                if i == 0:
                    runtime["prefix_prefill_time"] = prefill_time
                text = self.tokenizer.decode(
                    [t for t in ids if t not in cfg.eos_token_ids],
                    skip_special_tokens=True,
                ).strip()
                merged_input = runtime["merged_len"]
                valid = plan["prefix_valid"] + len(inst)
                stat = prompt_stat_ratios({
                    "sys": plan["sys_len"], "video": plan["n_video"],
                    "inst": len(inst),
                    "merged_video": merged_input - (valid - plan["n_video"]),
                    "merged_input": merged_input,
                })
                self._emit(s, text, runtime, stat, pred_path, rt_path, stat_path)

    def _run_prefix_group_batched(
        self, grp, plan, cfg: EvalConfig, gen, warmed, pred_path, rt_path, stat_path
    ):
        """The two serving levers composed for one video's question group:
        prefix prefill once, then the questions run in head-packed batches of
        ``cfg.batch_size`` over the shared cache (generate_batch_from_prefix,
        token-exact). Timing rows carry batch totals divided by the batch
        (like _evaluate_batched) plus prefix_prefill_time on the first row."""
        import jax

        from ..runtime.generate import generate_batch_from_prefix

        spec = plan["spec"]
        run_prefill = plan["run_prefill"]
        suffix_embeds = plan["suffix_embeds"]
        insts = plan["insts"]

        def run_batch(cache, chunk_insts, chunk_samples=None):
            sfx = jnp.concatenate([suffix_embeds(i) for i in chunk_insts])
            speculative = cfg.spec_decode_k > 1
            return generate_batch_from_prefix(
                self.decoder_params, self.decoder_cfg, cache, sfx,
                [len(i) for i in chunk_insts], spec, gen,
                decode_chunk_size=cfg.decode_chunk_size,
                cascade=cfg.prefix_cascade,
                spec_decode_k=cfg.spec_decode_k if speculative else 0,
                histories=_spec_histories(chunk_samples)
                if speculative and chunk_samples is not None else None,
                kv_int8=cfg.kv_int8,
            )

        # The traced batch size is part of the compiled program (head-packed
        # cache [Lg, 1, S, B*KV, hd]), so each distinct chunk size (incl. the
        # tail) warms separately; the warm-up prefill also compiles the
        # prefix program untimed.
        if cfg.warmup:
            wcache = None
            for i in range(0, len(grp), cfg.batch_size):
                bsz = len(grp[i : i + cfg.batch_size])
                wkey = ("prefix-batch", plan["s_full"], plan["s_sfx"], spec,
                        bsz, cfg.decode_chunk_size, cfg.prefix_cascade,
                        cfg.spec_decode_k)
                if wkey in warmed:
                    continue
                if wcache is None:
                    wcache = run_prefill()
                run_batch(wcache, [insts[0]] * bsz)
                warmed.add(wkey)
            del wcache

        t0 = time.perf_counter()
        cache = jax.block_until_ready(run_prefill())
        prefill_time = time.perf_counter() - t0
        first = True
        for i in range(0, len(grp), cfg.batch_size):
            chunk_s = grp[i : i + cfg.batch_size]
            chunk_i = insts[i : i + cfg.batch_size]
            b = len(chunk_s)
            t0 = time.perf_counter()
            ids_list, rt = run_batch(cache, chunk_i, chunk_s)
            total = time.perf_counter() - t0
            for bi, (s, inst) in enumerate(zip(chunk_s, chunk_i)):
                text = self.tokenizer.decode(
                    [t for t in ids_list[bi] if t not in cfg.eos_token_ids],
                    skip_special_tokens=True,
                ).strip()
                merged_input = rt["merged_len"][bi]
                valid = plan["prefix_valid"] + len(inst)
                stat = prompt_stat_ratios({
                    "sys": plan["sys_len"], "video": plan["n_video"],
                    "inst": len(inst),
                    "merged_video": merged_input - (valid - plan["n_video"]),
                    "merged_input": merged_input,
                })
                runtime = {
                    "ttft_llm": rt["ttft_llm"] / b,
                    "time_decoding": rt["time_decoding"] / b,
                    "num_dec_token": rt["num_dec_token"][bi],
                    "merged_len": merged_input,
                    "full_len": rt["full_len"][bi],
                    "budget_overflow": rt["budget_overflow"][bi],
                    "all": total / b,
                    "batch_size": b,
                    "prefix_cached": True,
                    # batch totals, present under --spec_decode_k
                    **{k: rt[k] for k in
                       ("spec_drafted", "spec_accepted", "spec_dispatches")
                       if k in rt},
                }
                if first:
                    runtime["prefix_prefill_time"] = prefill_time
                    first = False
                self._emit(s, text, runtime, stat, pred_path, rt_path, stat_path)

    def _evaluate_prefix_pooled(self, samples, cfg: EvalConfig, pred_path,
                                rt_path, stat_path):
        """Paged-pool serving over the eval set (--prefix_pool P): videos
        sharing one compile key (same spec; buffer shapes unified via
        _prefix_plan's s_sfx_min/s_full_min) are clustered into pools of up
        to P pages, and ALL their questions run through ONE continuous
        paged pool of batch_size slots (serve_continuous_paged, or
        serve_continuous_paged_spec under spec_decode_k). Each video's
        prefix is prefilled once, lives once in HBM (int8 under pool_int8),
        and is read once per decode step however many slots reference it;
        questions of different videos interleave mid-wave.

        Timing semantics: prefix_prefill_time on each video's first row;
        ttft_llm = that video's prefill amortized over its questions (the
        true per-question prefill cost under pooling — admissions run
        inside the pool); time_decoding = pool wall / questions."""
        from collections import defaultdict

        import jax

        from ..runtime.serving import (
            PagedRequest,
            make_prefix_pool,
            serve_continuous_paged,
            serve_continuous_paged_spec,
        )

        groups: dict = defaultdict(list)
        fallback = []
        for s in samples:
            key = self._prefix_key(s)
            if key is None:
                fallback.append(s)
            else:
                groups[key].append(s)
        plans = {}  # sizes only — full plans (device embeds) built per chunk
        for key, grp in groups.items():
            plan = self._prefix_plan(key, grp, cfg, sizes_only=True)
            if plan is None:
                fallback.extend(grp)
            else:
                plans[key] = plan

        warmed: set = set()
        for s in fallback:  # FrameFusion / videoless: per-sample path
            k = self.compile_key(s, cfg)
            if cfg.warmup and k not in warmed:
                self.run_sample(s, cfg)
                warmed.add(k)
            self._emit(s, *self.run_sample(s, cfg), pred_path, rt_path, stat_path)

        clusters: dict = defaultdict(list)
        for key, plan in plans.items():
            clusters[plan["spec"]].append(key)
        gen = cfg.gen_config()
        for spec, keys in clusters.items():
            s_sfx_u = max(plans[k]["s_sfx"] for k in keys)
            s_full_u = max(
                math.ceil((plans[k]["prefix_valid"] + s_sfx_u) / cfg.pad_multiple)
                * cfg.pad_multiple
                for k in keys
            )
            for c0 in range(0, len(keys), cfg.prefix_pool):
                chunk_keys = keys[c0 : c0 + cfg.prefix_pool]
                cplans = [
                    self._prefix_plan(k, groups[k], cfg, s_sfx_min=s_sfx_u,
                                      s_full_min=s_full_u)
                    for k in chunk_keys
                ]
                caches, prefill_times, overflows, merged_bases = [], [], [], []
                for pl in cplans:
                    t0 = time.perf_counter()
                    cache = jax.block_until_ready(pl["run_prefill"]())
                    prefill_times.append(time.perf_counter() - t0)
                    overflows.append(
                        0 if cache.budget_overflow is None
                        else int(cache.budget_overflow)
                    )
                    merged_bases.append(int(cache.lens[-1]))
                    caches.append(cache)
                    # release the prefix embeds captured by the prefill
                    # closure — they'd otherwise stay resident through the
                    # whole pool serve
                    pl["run_prefill"] = None
                del cache  # the loop variable pins the last source cache
                pool = make_prefix_pool(
                    self.decoder_cfg, spec, caches, int8=cfg.pool_int8
                )
                reqs, meta, histories = [], [], {}
                for vi, (k, pl) in enumerate(zip(chunk_keys, cplans)):
                    for s, inst in zip(groups[k], pl["insts"]):
                        reqs.append(PagedRequest(
                            rid=s["id"], page=vi,
                            suffix_embeds=pl["suffix_embeds"](inst),
                            suffix_valid=len(inst),
                        ))
                        histories[s["id"]] = [
                            int(t) for t in np.asarray(s["input_ids"]).reshape(-1)
                        ]
                        meta.append((s, vi, len(inst), pl))

                def serve(request_list):
                    if cfg.spec_decode_k > 1:
                        return serve_continuous_paged_spec(
                            self.decoder_params, self.decoder_cfg, pool,
                            request_list, spec, gen,
                            batch_slots=max(cfg.batch_size, 1),
                            spec_decode_k=cfg.spec_decode_k,
                            histories=histories,
                        )
                    return serve_continuous_paged(
                        self.decoder_params, self.decoder_cfg, pool,
                        request_list, spec, gen,
                        batch_slots=max(cfg.batch_size, 1),
                        decode_chunk_size=max(cfg.decode_chunk_size, 1),
                    )

                wkey = ("prefix-pool", s_full_u, s_sfx_u, spec,
                        len(chunk_keys), max(cfg.batch_size, 1),
                        cfg.spec_decode_k, cfg.decode_chunk_size,
                        cfg.pool_int8)
                if cfg.warmup and wkey not in warmed:
                    # ONE request compiles the same fixed-shape admit/decode/
                    # verify programs (pool pages, slots, buffers are all
                    # compile-time constants) without decoding the whole
                    # workload twice; the pool is read-only and reusable
                    serve(reqs[:1])
                    warmed.add(wkey)
                t0 = time.perf_counter()
                results, stats = serve(reqs)
                wall = time.perf_counter() - t0
                nq = len(reqs)
                first_rows: set = set()
                for s, vi, inst_len, pl in meta:
                    ids = results[s["id"]]
                    text = self.tokenizer.decode(
                        [t for t in ids if t not in cfg.eos_token_ids],
                        skip_special_tokens=True,
                    ).strip()
                    merged_input = merged_bases[vi] + inst_len
                    valid = pl["prefix_valid"] + inst_len
                    stat = prompt_stat_ratios({
                        "sys": pl["sys_len"], "video": pl["n_video"],
                        "inst": inst_len,
                        "merged_video": merged_input - (valid - pl["n_video"]),
                        "merged_input": merged_input,
                    })
                    nq_v = len(groups[chunk_keys[vi]])
                    runtime = {
                        "ttft_llm": prefill_times[vi] / nq_v,
                        "time_decoding": wall / nq,
                        "num_dec_token": len(ids),
                        "merged_len": merged_input,
                        "full_len": valid,
                        "budget_overflow": overflows[vi],
                        "all": (wall + sum(prefill_times)) / nq,
                        "batch_size": max(cfg.batch_size, 1),
                        "prefix_cached": True,
                        "pooled": True,
                        "pool_pages": len(chunk_keys),
                        "pool_int8": cfg.pool_int8,
                        # pool totals under --spec_decode_k (reporting.py
                        # derives spec_accept_rate from drafted/accepted)
                        **{k2: stats[k2] for k2 in
                           ("n_verify_dispatches", "spec_drafted",
                            "spec_accepted") if k2 in stats},
                    }
                    if vi not in first_rows:
                        runtime["prefix_prefill_time"] = prefill_times[vi]
                        first_rows.add(vi)
                    self._emit(s, text, runtime, stat, pred_path, rt_path,
                               stat_path)

    def _evaluate_batched(self, samples, cfg: EvalConfig, pred_path, rt_path, stat_path):
        """Head-packed batched serving over the eval set: samples grouped by
        compile key (identical padded length / spec), decoded together via
        generate_batch (beyond the reference's strict batch=1). Timing rows
        carry batch totals divided by the batch plus a batch_size field."""
        from collections import defaultdict

        from ..runtime.generate import generate_batch

        groups = defaultdict(list)
        for s in samples:
            groups[self.compile_key(s, cfg)].append(s)
        chunked = cfg.decode_chunk_size  # 1 = per-step dispatch, as documented
        warmed: set = set()
        for key, grp in groups.items():
            for i in range(0, len(grp), cfg.batch_size):
                chunk = grp[i : i + cfg.batch_size]
                preps = [self._prepare(s, cfg.pad_multiple, cfg.frame_bucket) for s in chunk]
                spec = preps[0][4]
                if not (spec is None or isinstance(spec, (ReducerSpec, tuple))):
                    # FrameFusion etc.: no batched path — per-sample fallback
                    # (warmed per compile key like the unbatched loop, so the
                    # first timed row doesn't absorb the jit compile)
                    for s in chunk:
                        if cfg.warmup and ("sample", key) not in warmed:
                            self.run_sample(s, cfg)
                            warmed.add(("sample", key))
                        text, runtime, stat = self.run_sample(s, cfg)
                        append_jsonl(pred_path, {
                            "question_id": s["id"], "vid": s["vid"],
                            "answer": text, "gt": s["answer"],
                        })
                        append_jsonl(rt_path, {"question_id": s["id"], **runtime})
                        append_jsonl(stat_path, {"question_id": s["id"], **stat})
                    continue
                import jax.numpy as jnp

                embs = jnp.concatenate([p[0] for p in preps], axis=0)
                valids = [int(p[1]) for p in preps]
                vstarts = [int(p[2]) for p in preps]
                pos_bases = [p[5] for p in preps]
                t_valids = [p[6] for p in preps]
                pb = None if all(v is None for v in pos_bases) else pos_bases
                tv = None if all(v is None for v in t_valids) else t_valids

                def run():
                    return generate_batch(
                        self.decoder_params, self.decoder_cfg, embs, valids,
                        vstarts, spec,
                        cfg.gen_config(),
                        impl=cfg.attention_impl, decode_chunk_size=chunked,
                        pos_bases=pb, t_valids=tv,
                        spec_decode_k=cfg.spec_decode_k,
                        histories=_spec_histories(chunk)
                        if cfg.spec_decode_k > 1 else None,
                        kv_int8=cfg.kv_int8,
                    )

                # The traced batch size is part of the compiled program's
                # shape (head-packed cache [Lg, 1, S, B*KV, hd]), so a tail
                # chunk smaller than batch_size needs its own warm-up.
                wkey = (key, len(chunk))
                if cfg.warmup and wkey not in warmed:
                    run()
                    warmed.add(wkey)
                t0 = time.perf_counter()
                ids_list, rt = run()
                total = time.perf_counter() - t0
                b = len(chunk)
                for bi, s in enumerate(chunk):
                    ids = ids_list[bi]
                    text = self.tokenizer.decode(
                        [t for t in ids if t not in cfg.eos_token_ids],
                        skip_special_tokens=True,
                    ).strip()
                    nv = preps[bi][3]
                    merged_input = rt["merged_len"][bi]
                    stat = prompt_stat_ratios({
                        "sys": vstarts[bi],
                        "video": nv,
                        "inst": valids[bi] - vstarts[bi] - nv,
                        "merged_video": merged_input - (valids[bi] - nv),
                        "merged_input": merged_input,
                    })
                    runtime = {
                        "ttft_llm": rt["ttft_llm"] / b,
                        "time_decoding": rt["time_decoding"] / b,
                        "num_dec_token": rt["num_dec_token"][bi],
                        "merged_len": merged_input,
                        "full_len": valids[bi],
                        "all": total / b,
                        "batch_size": b,
                        # batch totals, present under --spec_decode_k
                        **{k: rt[k] for k in
                           ("spec_drafted", "spec_accepted", "spec_dispatches")
                           if k in rt},
                    }
                    append_jsonl(pred_path, {
                        "question_id": s["id"], "vid": s["vid"],
                        "answer": text, "gt": s["answer"],
                    })
                    append_jsonl(rt_path, {"question_id": s["id"], **runtime})
                    append_jsonl(stat_path, {"question_id": s["id"], **stat})

    def evaluate(self, dataset, cfg: EvalConfig, gts: list[dict] | None = None):
        os.makedirs(cfg.out_dir, exist_ok=True)
        pred_path = os.path.join(cfg.out_dir, "predictions.jsonl")
        rt_path = os.path.join(cfg.out_dir, "runtime.jsonl")
        stat_path = os.path.join(cfg.out_dir, "prompt_stat.jsonl")

        done = {r["question_id"] for r in read_jsonl(pred_path)}
        pending = [s for s in dataset if s["id"] not in done]
        batchable = (
            cfg.batch_size > 1
            and hasattr(self, "_prepare")
            and cfg.dycoke_decode is None
            and cfg.attn_sinks == 0
            and cfg.attn_window == 0
        )
        base_prefix_ok = (
            cfg.prefix_cache
            and cfg.sp == 1
            and cfg.dycoke_decode is None
            and cfg.attn_sinks == 0
            and cfg.attn_window == 0
            and cfg.frame_bucket == 0
        )
        pool_ok = (
            base_prefix_ok
            and cfg.prefix_pool > 0
            and not cfg.prefix_cascade
            and getattr(self, "_evaluate_prefix_pooled", None) is not None
        )
        prefix_ok = (
            base_prefix_ok
            and getattr(self, "_evaluate_prefix_cached", None) is not None
            # speculative decode composes with the batched prefix path
            # (flat or cascade layout)
            and (cfg.spec_decode_k <= 1 or cfg.batch_size > 1)
            # chunked decode composes with the batched prefix path only
            and (cfg.batch_size > 1 or cfg.decode_chunk_size == 1)
        )
        if pool_ok:
            self._evaluate_prefix_pooled(pending, cfg, pred_path, rt_path, stat_path)
            pending = []
        elif prefix_ok:
            self._evaluate_prefix_cached(pending, cfg, pred_path, rt_path, stat_path)
            pending = []
        elif batchable:
            self._evaluate_batched(pending, cfg, pred_path, rt_path, stat_path)
            pending = []
        warmed_keys: set = set()
        n_done = 0
        for sample in pending:
            if cfg.warmup:  # one untimed warm-up per NEW compile key
                key = self.compile_key(sample, cfg)
                if key not in warmed_keys:
                    self.run_sample(sample, cfg)
                    warmed_keys.add(key)
            text, runtime, stat = self.run_sample(sample, cfg)
            append_jsonl(pred_path, {
                "question_id": sample["id"], "vid": sample["vid"],
                "answer": text, "gt": sample["answer"],
            })
            append_jsonl(rt_path, {"question_id": sample["id"], **runtime})
            append_jsonl(stat_path, {"question_id": sample["id"], **stat})
            n_done += 1

        preds = read_jsonl(pred_path)
        result = metrics_mod.evaluate_predictions(cfg.dataset_name, preds, gts)
        if "total" in result:
            metrics_mod.write_metrics_csv(
                result, os.path.join(cfg.out_dir, "accuracy.csv"), os.path.basename(cfg.out_dir)
            )
        return result


# Qwen2VLEvaluator shares the resumable-JSONL evaluation loop.
Qwen2VLEvaluator.evaluate = LlavaEvaluator.evaluate
Qwen2VLEvaluator._evaluate_prefix_cached = LlavaEvaluator._evaluate_prefix_cached
Qwen2VLEvaluator._run_prefix_group_batched = LlavaEvaluator._run_prefix_group_batched
Qwen2VLEvaluator._evaluate_prefix_pooled = LlavaEvaluator._evaluate_prefix_pooled
Qwen2VLEvaluator._emit = LlavaEvaluator._emit
Qwen2VLEvaluator._sample_features = LlavaEvaluator._sample_features


class RawVideoLlavaEvaluator(LlavaEvaluator):
    """Raw-video eval (eval_vidqa_by_video_llavavideo.py): the vision tower
    runs per sample on decoded frames, then the normal feature pipeline."""

    def __init__(self, *args, tower_params=None, tower_cfg=None, tower_chunk=64, **kwargs):
        super().__init__(*args, **kwargs)
        self.tower_params = tower_params
        self.tower_cfg = tower_cfg
        self.tower_chunk = tower_chunk

    def _prepare(self, sample: dict, pad_multiple: int, frame_bucket: int = 0):
        return super()._prepare(self._encode(sample), pad_multiple, frame_bucket)

    def _sample_features(self, sample: dict):
        return super()._sample_features(self._encode(sample))

    def _encode(self, sample: dict) -> dict:
        if "feature" in sample:
            return sample
        from ..data.video import siglip_preprocess
        from ..models.siglip import encode_video_frames

        px = siglip_preprocess(np.asarray(sample["frames"]))
        sample = dict(sample)
        sample["feature"] = encode_video_frames(
            self.tower_params, self.tower_cfg, px, self.tower_chunk
        )
        return sample
