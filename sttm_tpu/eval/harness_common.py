"""Shared eval-harness pieces: the run config, grouping helpers, run
naming, and the smoke tokenizer. Split out of harness.py (round 4) so the
per-serving-mode loops (harness_prefix / harness_pooled / harness_batched)
import one-way from here; behavioral port context lives on each item's
docstring (reference: llava/eval/eval_vidqa_by_feat_llavavideo.py)."""

from __future__ import annotations

import dataclasses

import numpy as np

from ..runtime.generate import GenerateConfig
from ..runtime.reducer import ReducerSpec

__all__ = [
    "EvalConfig", "run_name", "SmokeTokenizer",
    "_prefix_compatible", "_spec_histories",
]


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
