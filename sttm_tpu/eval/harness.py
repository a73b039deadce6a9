"""Video-QA eval harness: resumable, instrumented, flush-per-sample.

Behavioral port of the reference eval entry points
(llava/eval/eval_vidqa_by_feat_llavavideo.py): per-sample greedy generation
(<=32 new tokens), append-mode JSONL predictions so crashed runs resume
(:182-204), one warm-up generation to de-noise latency (:220-231), per-sample
runtime + prompt-stat streams (:233-252), then accuracy metrics.

TPU specifics: sequence buffers are padded to a multiple of ``pad_multiple``
(one compile per bucket, cached); the video grid (T, H, W) is exact per
sample so merge decisions match the reference's dynamic shapes.

Module layout (split round 4 — each serving mode owns a file):
  harness_common.py   EvalConfig, run_name, SmokeTokenizer, group helpers
  harness_prefix.py   prefix-cached loops (per-sample + head-packed batched)
  harness_pooled.py   continuous paged-pool loop
  harness_batched.py  head-packed batched loop + the evaluate() dispatcher
  harness.py          the evaluator classes (family specifics: prompt
                      assembly, compile keys, prefix plans)
"""

from __future__ import annotations

import math
import time
from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..models import llava, qwen2
from ..models.config import DecoderConfig
from ..models.llava import LlavaConfig
from ..runtime.generate import GenerateConfig, generate  # noqa: F401
from ..runtime.reducer import ReducerSpec
from .harness_batched import BatchedMixin, EvaluateLoopMixin
from .harness_common import (  # noqa: F401 — public re-exports
    EvalConfig,
    SmokeTokenizer,
    _prefix_compatible,
    _spec_histories,
    run_name,
)
from .harness_pooled import PrefixPooledMixin
from .harness_prefix import PrefixCachedMixin
from .reporting import prompt_stat_ratios

__all__ = [
    "EvalConfig", "LlavaEvaluator", "Qwen2VLEvaluator",
    "RawVideoLlavaEvaluator", "SmokeTokenizer", "run_name",
]


class EvaluatorBase(PrefixCachedMixin, PrefixPooledMixin, BatchedMixin,
                    EvaluateLoopMixin):
    """Shared serving loops; subclasses provide the family specifics:
    run_sample / compile_key / _prefix_key / _prefix_plan (and _prepare for
    the batched path)."""


class Qwen2VLEvaluator(EvaluatorBase):
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


class LlavaEvaluator(EvaluatorBase):
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
