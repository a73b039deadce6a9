"""CLI: SFT training loop (the reference's train_mem.py role, train.py:1519).

TPU-native: dp x tp ``jax.sharding.Mesh`` with the Megatron-style param
specs from parallel/sharding.py, length-grouped batching
(llava_trainer.py:196-238), optional per-module LRs, orbax checkpoints with
resume. ``--smoke`` runs the whole loop on a tiny random-init model with the
byte tokenizer (no checkpoint/tokenizer download needed).

    python -m sttm_tpu.train.run_sft --data_path anns.json --smoke \\
        --steps 4 --batch_size 4 --seq_len 64 --output_dir /tmp/ckpt
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_name_or_path", default="")
    p.add_argument("--smoke", action="store_true",
                   help="tiny random-init decoder + byte tokenizer")
    p.add_argument("--data_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=8, help="global batch")
    p.add_argument("--seq_len", type=int, default=2048)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--attn_impl", default="auto",
                   choices=["auto", "xla", "flash_train"],
                   help="auto: the splash kernel with its fused backward on "
                        "TPU (dominates every measured point — "
                        "BENCH_TRAIN.json flash_* rows: 1.4-1.65x over XLA "
                        "attention and it un-OOMs the S=4096 dots / L=4 "
                        "frontiers), XLA attention elsewhere. The "
                        "dispatcher falls back to XLA per-call for "
                        "non-128-multiple sequence lengths either way.")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the layer scan (memory for FLOPs)")
    p.add_argument("--multimodal", action="store_true",
                   help="train the multimodal forward: features -> projector "
                        "(trainable) -> splice at the image token -> trunk CE "
                        "(reference llava_arch.py:324 in training mode)")
    p.add_argument("--feature_dir", default="",
                   help="dir of per-video {vid}.npy SigLIP features "
                        "[T, P_vis, C_vis]; smoke mode synthesizes them")
    p.add_argument("--frames", type=int, default=8,
                   help="frames per video in the multimodal batch")
    p.add_argument("--max_images", type=int, default=0,
                   help="max image placeholders per sample in multimodal "
                        "batches (0 = video-only collate); each image splices "
                        "P_vis projector tokens (reference base image path, "
                        "llava_arch.py:533-587 multi-sentinel loop)")
    p.add_argument("--mm_projector_lr", type=float, default=0.0,
                   help="split LR for the projector group (reference "
                        "llava_trainer.py:356 mm_projector_lr); 0 = shared LR")
    p.add_argument("--save_every", type=int, default=50)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--conv_version", default="qwen",
                   help="chat template: qwen | v1/vicuna_v1 (the reference's "
                        "per-version preprocess dispatch, train.py:1009-1035)")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models import qwen2
    from ..models.config import QWEN2_7B, TINY
    from ..models.weights import load_safetensors_dir
    from ..parallel.sharding import create_mesh, param_specs, shard_params
    from ..utils.logging import rank0_print
    from .data import length_grouped_indices, load_checkpoint, save_checkpoint
    from .dataset import SFTDataset, pad_collate
    from .sft import init_train_state, make_train_step

    if args.smoke:
        from ..eval.harness import SmokeTokenizer

        cfg = TINY
        tokenizer = SmokeTokenizer()
        params = qwen2.init_params(cfg, jax.random.key(args.seed))
    else:
        from transformers import AutoTokenizer

        cfg = QWEN2_7B
        tokenizer = AutoTokenizer.from_pretrained(args.model_name_or_path)
        params = load_safetensors_dir(cfg, args.model_name_or_path)

    lcfg = None
    if args.multimodal:
        from ..models.llava import (
            LlavaConfig, init_multimodal_params, load_projector_safetensors,
        )
        from .sft import make_mm_train_step

        if args.smoke:
            lcfg = LlavaConfig(decoder=cfg, vision_hidden_size=24,
                               vision_patches_per_side=4, spatial_pool_stride=2)
            mm = init_multimodal_params(lcfg, jax.random.key(args.seed + 1))
        else:
            lcfg = LlavaConfig(decoder=cfg)
            mm = load_projector_safetensors(lcfg, args.model_name_or_path)
        params = {"lm": params, "mm": mm}
        n_video = args.frames * lcfg.tokens_per_frame()
        p_vis = lcfg.vision_patches_per_side ** 2

    mesh = None
    if args.dp * args.tp > 1:
        mesh = create_mesh(dp=args.dp, tp=args.tp)
        if args.multimodal:
            params = {"lm": shard_params(params["lm"], mesh), "mm": params["mm"]}
        else:
            params = shard_params(params, mesh)

    dataset = SFTDataset(args.data_path, tokenizer, max_len=args.seq_len,
                         conv_version=args.conv_version)
    rank0_print(f"loaded {len(dataset)} samples from {args.data_path}")

    module_lrs = {"mm": args.mm_projector_lr} if (
        args.multimodal and args.mm_projector_lr > 0) else None
    tx, opt_state = init_train_state(
        params, args.learning_rate, args.weight_decay, module_lrs=module_lrs
    )
    import jax

    attn = args.attn_impl
    if attn == "auto":
        attn = ("flash_train"
                if jax.default_backend() in ("tpu", "axon") else "xla")
    if args.multimodal:
        step_fn = make_mm_train_step(lcfg, tx, remat=args.remat,
                                     attn_impl=attn)
    else:
        step_fn = make_train_step(cfg, tx, remat=args.remat, attn_impl=attn)

    def ckpt_path(step):
        return os.path.abspath(os.path.join(args.output_dir, f"checkpoint_{step}"))

    start_step = 0
    existing = sorted(
        (int(d.rsplit("_", 1)[1]) for d in os.listdir(args.output_dir)
         if d.startswith("checkpoint_")) if os.path.isdir(args.output_dir) else []
    )
    if existing:
        restored = load_checkpoint(
            ckpt_path(existing[-1]),
            {"params": params, "opt_state": opt_state, "step": 0},
        )
        params, opt_state = restored["params"], restored["opt_state"]
        start_step = int(restored["step"])
        rank0_print(f"resumed from step {start_step}")

    if mesh is not None:
        def to_sharding(tree):
            def rec(s):
                if isinstance(s, dict):
                    return {k: rec(v) for k, v in s.items()}
                return NamedSharding(mesh, s)

            return rec(tree)

        if args.multimodal:
            pshard = {
                "lm": to_sharding(param_specs(params["lm"])),
                "mm": jax.tree.map(lambda _: NamedSharding(mesh, P()), params["mm"]),
            }
        else:
            pshard = to_sharding(param_specs(params))
        data_sharding = NamedSharding(mesh, P("dp", None))
        if args.multimodal:
            row_sharding = NamedSharding(mesh, P("dp"))
            batch_shardings = {
                "input_ids": data_sharding, "labels": data_sharding,
                "video_start": row_sharding, "has_video": row_sharding,
                "video_feats": NamedSharding(mesh, P("dp", None, None, None)),
            }
            if args.max_images > 0:
                batch_shardings.update({
                    "image_starts": data_sharding, "image_mask": data_sharding,
                    "image_feats": NamedSharding(mesh, P("dp", None, None, None)),
                })
            jstep = jax.jit(step_fn, in_shardings=(pshard, None, batch_shardings),
                            out_shardings=(pshard, None, None))
        else:
            jstep = jax.jit(step_fn, in_shardings=(pshard, None, data_sharding, data_sharding),
                            out_shardings=(pshard, None, None))
    else:
        data_sharding = None
        jstep = jax.jit(step_fn)

    rng = np.random.default_rng(args.seed)
    order = length_grouped_indices(dataset.lengths(), args.batch_size, 1, rng)
    cursor = 0
    loss = float("nan")  # resume past args.steps: loop body never runs
    for step in range(start_step, args.steps):
        if cursor + args.batch_size > len(order):  # new epoch
            order = length_grouped_indices(dataset.lengths(), args.batch_size, 1, rng)
            cursor = 0
        batch = [dataset[i] for i in order[cursor : cursor + args.batch_size]]
        cursor += args.batch_size
        if args.multimodal:
            from .dataset import mm_collate

            mb = mm_collate(batch, args.seq_len, n_video,
                            n_image=p_vis if args.max_images > 0 else 0,
                            max_images=args.max_images or None)
            feats = np.zeros(
                (len(batch), args.frames, p_vis, lcfg.vision_hidden_size), np.float32
            )
            frng = np.random.default_rng(args.seed + step)
            for i, s in enumerate(batch):
                if not mb["has_video"][i]:
                    continue
                if args.feature_dir and s.get("media"):
                    vid = os.path.splitext(os.path.basename(str(s["media"])))[0]
                    f = np.load(os.path.join(args.feature_dir, f"{vid}.npy"))
                    feats[i] = f[: args.frames]
                else:  # smoke: synthetic features
                    feats[i] = frng.normal(size=feats[i].shape)
            mb["video_feats"] = feats
            if args.max_images > 0:
                ifeats = np.zeros(
                    (len(batch), mb["image_mask"].shape[1], p_vis,
                     lcfg.vision_hidden_size), np.float32)
                for i, s in enumerate(batch):
                    k = int(mb["image_mask"][i].sum())
                    if k == 0:
                        continue
                    media = s.get("media")
                    paths = media if isinstance(media, list) else [media] * k
                    for j in range(k):
                        if args.feature_dir and paths[j]:
                            iid = os.path.splitext(os.path.basename(str(paths[j])))[0]
                            ifeats[i, j] = np.load(
                                os.path.join(args.feature_dir, f"{iid}.npy"))
                        else:  # smoke: synthetic features
                            ifeats[i, j] = frng.normal(size=ifeats[i, j].shape)
                mb["image_feats"] = ifeats
            if (mb["labels"] != -100).sum() == 0:
                rank0_print(f"WARNING: step {step + 1}: no supervised tokens in batch")
            mb = {k: jnp.asarray(v) for k, v in mb.items()}
            if mesh is not None:
                mb = {k: jax.device_put(v, batch_shardings[k]) for k, v in mb.items()}
            params, opt_state, loss = jstep(params, opt_state, mb)
        else:
            ids, labels = pad_collate(batch, args.seq_len)
            if (labels != -100).sum() == 0:
                rank0_print(
                    f"WARNING: step {step + 1}: no supervised tokens in batch "
                    f"(seq_len {args.seq_len} may truncate every assistant span)"
                )
            ids, labels = jnp.asarray(ids), jnp.asarray(labels)
            if data_sharding is not None:
                ids = jax.device_put(ids, data_sharding)
                labels = jax.device_put(labels, data_sharding)
            params, opt_state, loss = jstep(params, opt_state, ids, labels)
        if (step + 1) % args.log_every == 0 or step == start_step:
            rank0_print(f"step {step + 1}/{args.steps} loss {float(loss):.4f}")
        if (step + 1) % args.save_every == 0 or step + 1 == args.steps:
            if not os.path.isdir(ckpt_path(step + 1)):
                save_checkpoint(ckpt_path(step + 1), params, opt_state, step + 1)
                rank0_print(f"saved checkpoint at step {step + 1}")
    rank0_print("training done")
    return float(loss)


if __name__ == "__main__":
    main()
