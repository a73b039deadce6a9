"""CLI: feature-based video-QA evaluation (the reference's main entry point).

Mirrors eval_vidqa_by_feat_llavavideo.py's flag surface (the sa_* family from
llava/train/train.py:130-151 + data/eval args) on argparse. Example:

    python -m sttm_tpu.eval.run_vidqa \
        --model_name_or_path ckpts/LLaVA-Video-7B-Qwen2-Video-Only \
        --dataset_name videomme --anno_filepath .../videomme_v2.json \
        --feature_dir .../features --metadata_dir .../metadata \
        --sa_pattern quadtree --sa_start_layer_idx 2 \
        --sa_tree_thresh 0.85 --sa_tree_temporal_thresh 0.65 \
        --sa_tree_root_level 1 --reproduce

``--reproduce`` fixes seeds (reference: seed 42 + deterministic kernels,
eval_utils.py:86-92; TPU/XLA execution is deterministic by construction, so
seeding covers the remaining nondeterminism).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import random

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    # model
    p.add_argument("--model_name_or_path", required=True)
    p.add_argument("--model_family", choices=["llava", "qwen2vl"], default="llava",
                   help="llava = LLaVA-Video/OneVision feature eval "
                        "(eval_vidqa_by_feat_llavavideo.py); qwen2vl = Qwen2-VL "
                        "feature eval (eval_vidqa_by_feat_qwen2vl.py)")
    p.add_argument("--model_size", choices=["7b", "72b"], default="7b")
    p.add_argument("--smoke", action="store_true",
                   help="random-init tiny decoder + byte mock tokenizer (CI "
                        "smoke of the full CLI path, no checkpoint needed)")
    p.add_argument("--mm_newline_position", default="no_token")
    p.add_argument("--rope_scaling_factor", type=float, default=1.0)
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel devices")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel prefill devices (ring attention "
                        "over an sp mesh; for >128-frame prefills beyond one "
                        "chip's HBM). origin / single non-scoring reducer "
                        "patterns, llava family, batch_size 1 only")
    # data
    p.add_argument("--dataset_name", required=True)
    p.add_argument("--anno_filepath", required=True)
    p.add_argument("--input_mode", choices=["feature", "video"], default="feature",
                   help="feature = cached vision features (the main path); "
                        "video = decode raw videos + run the tower per sample "
                        "(eval_vidqa_by_video_llavavideo.py)")
    p.add_argument("--feature_dir", default="")
    p.add_argument("--metadata_dir", default="")
    p.add_argument("--video_dir", default="")
    p.add_argument("--tgt_fps", type=float, default=1.0)
    p.add_argument("--vision_tower_path", default="",
                   help="SigLIP checkpoint dir for --input_mode video "
                        "(defaults to model_name_or_path)")
    p.add_argument("--frames_upbound", type=int, default=128)
    p.add_argument("--mm_spatial_pool_stride", type=int, default=2)
    p.add_argument("--add_time_instruction", action="store_true")
    p.add_argument("--first_sample", action="store_true")
    p.add_argument("--temporal_skip_freq", type=int, default=-1)
    # token reduction (sa_*)
    p.add_argument("--sa_pattern", default="origin",
                   choices=["origin", "quadtree", "tome", "dycoke-stage1", "dycoke",
                            "fastv", "pyrd", "octree", "streamingllm",
                            "framefusion", "merging"])
    p.add_argument("--dycoke_l", type=int, default=3)
    p.add_argument("--dycoke_p", type=float, default=0.8)
    p.add_argument("--sa_framefusion_cost", type=float, default=0.3)
    p.add_argument("--sa_framefusion_compact_layer", type=int, default=0,
                   help="compact the surviving tokens into a static budget "
                        "buffer at this layer so later layers run short "
                        "(real TTFT saving; 0 = pure mask mode)")
    p.add_argument("--sa_framefusion_compact_budget", type=int, default=0,
                   help="video slots after compaction (0 = auto from cost)")
    p.add_argument("--sa_start_layer_idx", type=int, default=2)
    p.add_argument("--sa_tree_thresh", type=float, default=0.9)
    p.add_argument("--sa_tree_temporal_thresh", type=float, default=-1.0)
    p.add_argument("--sa_tree_root_level", type=int, default=0)
    p.add_argument("--sa_tree_weighted_avg", action="store_true")
    p.add_argument("--sim_per_head", action="store_true")
    p.add_argument("--sa_prune_ratio", type=float, default=0.5)
    p.add_argument("--sa_tome_ver", default="video", choices=["video", "frame"])
    p.add_argument("--sa_fastv_evict_ratio", type=float, default=0.5)
    p.add_argument("--sa_pyrd_loc_list", type=int, nargs="+", default=[2, 8, 16])
    p.add_argument("--sa_pyrd_size_list", type=int, nargs="+", default=[12, 10, 8])
    p.add_argument("--sa_sink_tokens", type=int, default=16)
    p.add_argument("--sa_local_window", type=int, default=4096)
    p.add_argument("--video_budget_ratio", type=float, default=0.6,
                   help="static merged-video buffer as a fraction of video tokens")
    # eval
    p.add_argument("--output_dir", default="outputs")
    p.add_argument("--max_new_tokens", type=int, default=32)
    p.add_argument("--temperature", type=float, default=0.0,
                   help="> 0 enables temperature/top-k/top-p sampling "
                        "(seed-deterministic, runtime/sampling.py) on the "
                        "per-sample and batched decode paths; 0 = greedy, "
                        "the reference's do_sample=False eval default. "
                        "Speculative decode and the continuous/paged pools "
                        "stay greedy.")
    p.add_argument("--top_k", type=int, default=0)
    p.add_argument("--top_p", type=float, default=1.0)
    p.add_argument("--sample_seed", type=int, default=0)
    p.add_argument("--reproduce", action="store_true")
    p.add_argument("--batch_size", type=int, default=1,
                   help="samples per generate call (>1 = head-packed batched "
                        "serving, grouped by compile key; beyond the "
                        "reference's batch=1)")
    p.add_argument("--decode_chunk_size", type=int, default=1,
                   help="decode tokens per device dispatch (1 = per-step "
                        "reference-style timing; >1 = on-device chunked "
                        "decode, token-exact, lower dispatch overhead)")
    p.add_argument("--spec_decode_k", type=int, default=0,
                   help=">=2 enables greedy speculative decoding (token-"
                        "exact): n-gram prompt-lookup drafts k-1 tokens, "
                        "one verify dispatch scores them all")
    p.add_argument("--spec_draft_layers", type=int, default=0,
                   help="with --spec_decode_k: draft through the first E "
                        "layers on device (self-speculative / layer-skip) "
                        "instead of the n-gram drafter; one fused draft+"
                        "verify dispatch per cycle (per-sample path only)")
    p.add_argument("--kv_int8", action="store_true",
                   help="int8 live KV cache with per-(position, head) "
                        "scales (bounded approximation, like --pool_int8 "
                        "but for the writable decode cache): halves cache "
                        "HBM and per-step KV reads — decisive for batched "
                        "decode and flat-batch capacity. Per-sample and "
                        "flat-batched paths only")
    p.add_argument("--prefix_cache", action="store_true",
                   help="reuse the [sys|video] prefill cache across "
                        "questions of the same video (token-exact; ttft_llm "
                        "becomes the per-question extension cost, the "
                        "group's first runtime row carries "
                        "prefix_prefill_time). With --batch_size N each "
                        "video's questions also decode head-packed-batched "
                        "over the shared cache")
    p.add_argument("--prefix_cascade", action="store_true",
                   help="with --prefix_cache --batch_size N: cascade KV "
                        "layout — keep ONE shared prefix cache in HBM "
                        "(decode reads it once per step for the whole group) "
                        "instead of a copy per batch slot; exact online-"
                        "softmax combine")
    p.add_argument("--prefix_pool", type=int, default=0,
                   help="with --prefix_cache: pool up to N videos' prefix "
                        "caches into one paged pool and run ALL their "
                        "questions through a continuous pool of batch_size "
                        "slots (each prefix prefilled once, resident once, "
                        "read once per decode step; questions of different "
                        "videos interleave). Composes with --spec_decode_k; "
                        "excludes --prefix_cascade (the pool IS the cascade "
                        "layout, paged)")
    p.add_argument("--pool_int8", action="store_true",
                   help="with --prefix_pool: int8 pool pages (half the pool "
                        "HBM and prefix read traffic, 2x resident videos; "
                        "bounded approximation)")
    p.add_argument("--frame_bucket", type=int, default=0,
                   help="bucket frame counts to multiples of N (bounds jit "
                        "recompiles); exact for sa_start_layer_idx 0")
    p.add_argument("--attention_impl", default="flash", choices=["flash", "xla"])
    return p.parse_args(argv)


def make_spec_factory(args, head_dim: int):
    from ..runtime.generate import spec_from_pattern

    def factory(t, h, w):
        nv = t * h * w
        return spec_from_pattern(
            args.sa_pattern, t, h, w,
            sa_start_layer_idx=args.sa_start_layer_idx,
            video_budget=int(args.video_budget_ratio * nv),
            sa_tree_thresh=args.sa_tree_thresh,
            sa_tree_temporal_thresh=args.sa_tree_temporal_thresh,
            sa_tree_root_level=args.sa_tree_root_level,
            sa_tree_weighted_avg=args.sa_tree_weighted_avg,
            sim_head_dim=head_dim if args.sim_per_head else None,
            sa_prune_ratio=args.sa_prune_ratio,
            sa_tome_ver=args.sa_tome_ver,
            sa_fastv_evict_ratio=args.sa_fastv_evict_ratio,
            sa_pyrd_loc_list=args.sa_pyrd_loc_list,
            sa_pyrd_size_list=args.sa_pyrd_size_list,
            sa_framefusion_cost=args.sa_framefusion_cost,
            sa_framefusion_compact_layer=args.sa_framefusion_compact_layer,
            sa_framefusion_compact_budget=args.sa_framefusion_compact_budget,
            # merged buffers tile for the splash kernel (matches the
            # harness's s_full padding; non-128-multiples would silently
            # fall back to XLA attention for the post-merge layer group)
            pad_multiple=32 if args.smoke else 128,
        )

    return factory


def _load_tokenizer(args):
    if args.smoke:
        from .harness import SmokeTokenizer

        return SmokeTokenizer()
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(args.model_name_or_path)


def _eval_config(args, name):
    from ..eval.harness import EvalConfig

    streaming = args.sa_pattern == "streamingllm"
    return EvalConfig(
        out_dir=os.path.join(args.output_dir, name), dataset_name=args.dataset_name,
        max_new_tokens=args.max_new_tokens, attention_impl=args.attention_impl,
        attn_sinks=args.sa_sink_tokens if streaming else 0,
        attn_window=args.sa_local_window if streaming else 0,
        dycoke_decode=(args.dycoke_l, args.dycoke_p) if args.sa_pattern == "dycoke" else None,
        frame_bucket=args.frame_bucket,
        decode_chunk_size=args.decode_chunk_size,
        spec_decode_k=args.spec_decode_k,
        spec_draft_layers=args.spec_draft_layers,
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
        sample_seed=args.sample_seed,
        batch_size=args.batch_size,
        sp=args.sp,
        prefix_cache=args.prefix_cache,
        prefix_cascade=args.prefix_cascade,
        prefix_pool=args.prefix_pool,
        pool_int8=args.pool_int8,
        kv_int8=args.kv_int8,
        pad_multiple=32 if args.smoke else 128,
        eos_token_ids=() if args.smoke else (151645, 151643),
    )


def main(argv=None):
    args = parse_args(argv)
    # Fail fast on missing inputs (the argparse defaults are '' so that
    # --smoke / --input_mode video runs don't need them): a feature-mode run
    # without --feature_dir would otherwise die mid-eval with an opaque
    # FileNotFoundError from the dataset loader.
    if not args.smoke:
        if args.input_mode == "feature" and not args.feature_dir:
            raise SystemExit("--feature_dir is required for --input_mode feature")
        if args.input_mode == "video" and not args.video_dir:
            raise SystemExit("--video_dir is required for --input_mode video")
    if args.prefix_cache:
        if (
            args.sp > 1 or args.frame_bucket > 0
            or args.sa_pattern in ("streamingllm", "dycoke", "fastv")
        ):
            raise SystemExit(
                "--prefix_cache excludes sp / frame_bucket / streamingllm / "
                "dycoke decode pruning / fastv (ranks by the last "
                "instruction token, which the prefix doesn't contain)"
            )
        # the paged pool serves through its own slot pool, so the batched-
        # path requirements below only apply without --prefix_pool
        if args.spec_decode_k > 1 and args.batch_size == 1 and args.prefix_pool == 0:
            raise SystemExit(
                "--prefix_cache composes with --spec_decode_k only when "
                "batched (--batch_size > 1) or pooled (--prefix_pool)"
            )
        if args.decode_chunk_size > 1 and args.batch_size == 1 and args.prefix_pool == 0:
            raise SystemExit(
                "--prefix_cache composes with --decode_chunk_size only "
                "when batched (--batch_size > 1) or pooled (--prefix_pool)"
            )
    if args.kv_int8 and (
        args.prefix_cascade or args.prefix_pool
        or (args.prefix_cache and args.batch_size <= 1)
    ):
        raise SystemExit(
            "--kv_int8 supports the per-sample, flat-batched, and batched "
            "flat-prefix (--prefix_cache --batch_size N) decode paths "
            "(all sa_patterns, incl. --spec_decode_k/--spec_draft_layers); "
            "cascade/pooled serving has --pool_int8 for its read-only pages"
        )
    if args.spec_draft_layers > 0:
        if args.spec_decode_k < 2:
            raise SystemExit("--spec_draft_layers requires --spec_decode_k >= 2")
        if args.batch_size > 1 or args.prefix_cache or args.prefix_pool or args.sp > 1:
            raise SystemExit(
                "--spec_draft_layers supports the per-sample path only; "
                "batched/pooled/sp serving uses the host n-gram drafter"
            )
    if args.prefix_cascade and not (args.prefix_cache and args.batch_size > 1):
        raise SystemExit(
            "--prefix_cascade requires --prefix_cache and --batch_size > 1"
        )
    if (args.prefix_cache and args.batch_size >= 8
            and not (args.prefix_cascade or args.prefix_pool)):
        print(
            "WARNING: the flat batched-prefix layout holds one full prefix "
            "cache per slot; at batch >= 8 this exceeds one v5e's HBM at the "
            "7B/128-frame point (measured: compile fails, BENCH_SERVING.json "
            "batched.8.flat). Use --prefix_cascade or --prefix_pool — one "
            "shared prefix copy, and faster at every measured batch size.",
            flush=True,
        )
    if args.prefix_pool > 0 and not args.prefix_cache:
        raise SystemExit("--prefix_pool requires --prefix_cache")
    if args.prefix_pool > 0 and args.prefix_cascade:
        raise SystemExit(
            "--prefix_pool excludes --prefix_cascade (the pool IS the "
            "cascade layout, paged)"
        )
    if args.pool_int8 and args.prefix_pool == 0:
        raise SystemExit("--pool_int8 requires --prefix_pool")
    if args.sp > 1:
        ok_patterns = {"origin", "quadtree", "tome", "dycoke-stage1", "octree"}
        if args.sa_pattern not in ok_patterns:
            raise SystemExit(f"--sp supports sa_pattern in {sorted(ok_patterns)}")
        if args.model_family != "llava":
            raise SystemExit("--sp supports the llava family only (1D RoPE)")
        if args.batch_size > 1 or args.spec_decode_k > 1 or args.decode_chunk_size > 1:
            raise SystemExit("--sp is per-sample, per-step decode only")
        if args.tp > 1:
            raise SystemExit("--sp and --tp are mutually exclusive")
    if args.reproduce:
        random.seed(42)
        np.random.seed(42)

    import jax

    from ..data.datasets import DataConfig
    from ..eval.harness import run_name
    from ..models import qwen2
    from ..models.weights import load_safetensors_dir
    from ..parallel.sharding import create_mesh, shard_params

    dcfg = DataConfig(
        args.dataset_name, args.anno_filepath, args.feature_dir, args.metadata_dir,
        add_time_instruction=args.add_time_instruction,
        first_sample=args.first_sample, temporal_skip_freq=args.temporal_skip_freq,
    )
    gts = json.load(open(args.anno_filepath))
    tokenizer = _load_tokenizer(args)
    model_name = os.path.basename(args.model_name_or_path.rstrip("/"))

    if args.model_family == "qwen2vl":
        # Qwen2-VL feature eval (eval_vidqa_by_feat_qwen2vl.py:158-222):
        # M-RoPE trunk, features scattered over the <|video_pad|> run.
        from ..data.datasets import Qwen2VLFeatureDataset
        from ..eval.harness import Qwen2VLEvaluator
        from ..models.config import QWEN2VL_7B, TINY_MROPE

        dec_cfg = dataclasses.replace(
            TINY_MROPE if args.smoke else QWEN2VL_7B,
            rope_scaling_factor=args.rope_scaling_factor,
        )
        if args.smoke:
            params = qwen2.init_params(dec_cfg, jax.random.key(0))
        else:
            params = load_safetensors_dir(dec_cfg, args.model_name_or_path)
        if args.tp > 1:
            params = shard_params(params, create_mesh(dp=1, tp=args.tp))

        dataset = Qwen2VLFeatureDataset(dcfg, tokenizer)
        spec_factory = make_spec_factory(args, dec_cfg.head_dim)
        name = run_name(
            model_name, args.dataset_name,
            spec_factory(args.frames_upbound, 2, 2), args.frames_upbound,
        )
        ecfg = _eval_config(args, name)
        if ecfg.frame_bucket:
            raise ValueError("frame_bucket is not supported on the qwen2vl path")
        ev = Qwen2VLEvaluator(params, dec_cfg, tokenizer, spec_factory)
    else:
        from ..data.datasets import FeatureVidQADataset
        from ..eval.harness import LlavaEvaluator
        from ..models import llava as llava_mod
        from ..models.config import QWEN2_72B, QWEN2_7B, TINY
        from ..models.llava import LlavaConfig

        dec_cfg = dataclasses.replace(
            TINY if args.smoke else (QWEN2_72B if args.model_size == "72b" else QWEN2_7B),
            rope_scaling_factor=args.rope_scaling_factor,
        )
        llava_cfg = LlavaConfig(
            decoder=dec_cfg,
            spatial_pool_stride=args.mm_spatial_pool_stride,
            newline_position=args.mm_newline_position,
            **({"vision_hidden_size": 16, "vision_patches_per_side": 6} if args.smoke else {}),
        )
        if llava_cfg.newline_position != "no_token" and args.sa_pattern != "origin":
            raise ValueError("token merging requires mm_newline_position=no_token "
                             "(square per-frame grids)")

        if args.smoke:
            params = qwen2.init_params(dec_cfg, jax.random.key(0))
            mm_params = llava_mod.init_multimodal_params(llava_cfg, jax.random.key(1))
        else:
            params = load_safetensors_dir(dec_cfg, args.model_name_or_path)
            mm_params = llava_mod.load_projector_safetensors(llava_cfg, args.model_name_or_path)
        if args.tp > 1:
            params = shard_params(params, create_mesh(dp=1, tp=args.tp))

        spec_factory = make_spec_factory(args, dec_cfg.head_dim)
        name = run_name(
            model_name, args.dataset_name,
            spec_factory(args.frames_upbound, llava_cfg.pooled_side, llava_cfg.pooled_side),
            args.frames_upbound,
        )
        ecfg = _eval_config(args, name)
        if args.input_mode == "video":
            # raw-video path (eval_vidqa_by_video_llavavideo.py): native
            # decode + per-sample SigLIP tower forward
            from ..data.datasets import RawVideoVidQADataset
            from ..eval.harness import RawVideoLlavaEvaluator
            from ..models import siglip as sig

            if args.smoke:
                tower_cfg = sig.SiglipConfig(
                    hidden_size=llava_cfg.vision_hidden_size, intermediate_size=32,
                    num_layers=2, num_heads=4, image_size=84, patch_size=14,
                    dtype=np.float32,
                )
                tower_params = sig.init_siglip_params(tower_cfg, jax.random.key(7))
            else:
                from safetensors import safe_open

                tower_cfg = sig.SIGLIP_SO400M
                tower_path = args.vision_tower_path or args.model_name_or_path
                tensors = {}
                for shard in [f for f in os.listdir(tower_path) if f.endswith(".safetensors")]:
                    with safe_open(os.path.join(tower_path, shard), framework="np") as f:
                        for n in f.keys():
                            tensors[n] = f.get_tensor(n)
                tower_params = sig.load_siglip_state_dict(tower_cfg, tensors)
            dataset = RawVideoVidQADataset(
                dcfg, tokenizer, args.video_dir, tgt_fps=args.tgt_fps,
                frames_upbound=args.frames_upbound, image_size=tower_cfg.image_size,
            )
            ev = RawVideoLlavaEvaluator(
                params, dec_cfg, llava_cfg, mm_params, tokenizer, spec_factory,
                tower_params=tower_params, tower_cfg=tower_cfg,
            )
        else:
            dataset = FeatureVidQADataset(dcfg, tokenizer)
            ev = LlavaEvaluator(params, dec_cfg, llava_cfg, mm_params, tokenizer, spec_factory)

    result = ev.evaluate(dataset, ecfg, gts=gts)
    print(json.dumps(result, indent=2, default=str))


if __name__ == "__main__":
    main()
