"""CLI: DPO training loop (the reference's train_dpo.py role, ~1.8k LoC of
vendored-TRL wiring collapsed onto make_dpo_train_step).

Annotation format: a JSON list of {"prompt": [conversation turns ending with
the user turn], "chosen": str, "rejected": str}; each pair is rendered with
the same chat-template preprocessing as SFT (prompt masked, answers
supervised). ``--smoke`` runs on a tiny random-init model.
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_name_or_path", default="")
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--data_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--seq_len", type=int, default=1024)
    p.add_argument("--learning_rate", type=float, default=5e-7)
    p.add_argument("--beta", type=float, default=0.1)
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--multimodal", action="store_true",
                   help="DPO over multimodal batches: the sample's video "
                        "features are spliced in-graph for both the chosen "
                        "and rejected forward (reference train_dpo.py)")
    p.add_argument("--feature_dir", default="",
                   help="dir of per-video {vid}.npy features; smoke synthesizes")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--remat", action="store_true",
                   help="per-layer checkpointing — DPO runs four trunk "
                        "forwards per step, so this is what fits 7B-width "
                        "pairs on one chip")
    p.add_argument("--attn_impl", default="auto",
                   choices=["auto", "xla", "flash_train"],
                   help="auto: splash attention + fused backward on TPU "
                        "(run_sft's default; BENCH_TRAIN.json), XLA "
                        "elsewhere")
    p.add_argument("--save_every", type=int, default=50)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def _pair_tokens(sample, tokenizer, answer, seq_len):
    from .dataset import preprocess_qwen_chat

    convs = list(sample["prompt"]) + [{"from": "gpt", "value": answer}]
    ids, labels = preprocess_qwen_chat(convs, tokenizer)
    return ids[:seq_len], labels[:seq_len]


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
    from .data import save_checkpoint
    from .dataset import pad_collate
    from .dpo import make_dpo_train_step
    from .sft import init_train_state

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
        from .dpo import make_mm_dpo_train_step

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

    ref_params = params  # frozen reference policy (pre-update weights)
    mesh = None
    if args.dp * args.tp > 1:
        mesh = create_mesh(dp=args.dp, tp=args.tp)
        if args.multimodal:
            params = {"lm": shard_params(params["lm"], mesh), "mm": params["mm"]}
        else:
            params = shard_params(params, mesh)
        ref_params = params if args.multimodal else shard_params(ref_params, mesh)

    with open(args.data_path) as fp:
        data = json.load(fp)
    rank0_print(f"loaded {len(data)} preference pairs")

    tx, opt_state = init_train_state(params, args.learning_rate)
    import jax

    attn = args.attn_impl
    if attn == "auto":
        attn = ("flash_train"
                if jax.default_backend() in ("tpu", "axon") else "xla")
    if args.multimodal:
        step_fn = make_mm_dpo_train_step(lcfg, tx, beta=args.beta,
                                         remat=args.remat, attn_impl=attn)
    else:
        step_fn = make_dpo_train_step(cfg, tx, beta=args.beta,
                                      remat=args.remat, attn_impl=attn)
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
        dsh = NamedSharding(mesh, P("dp", None))
        bshard = {k: dsh for k in ("chosen_ids", "chosen_labels", "rejected_ids", "rejected_labels")}
        if args.multimodal:
            bshard["video_feats"] = NamedSharding(mesh, P("dp", None, None, None))
            bshard["video_start"] = NamedSharding(mesh, P("dp"))
            bshard["has_video"] = NamedSharding(mesh, P("dp"))
        jstep = jax.jit(step_fn, in_shardings=(pshard, pshard, None, bshard),
                        out_shardings=(pshard, None, None, None))
    else:
        dsh = None
        jstep = jax.jit(step_fn)

    rng = np.random.default_rng(args.seed)
    loss = acc = float("nan")
    for step in range(args.steps):
        idx = rng.choice(len(data), size=args.batch_size, replace=len(data) < args.batch_size)
        rows = [data[i] for i in idx]
        batch = {}
        if args.multimodal:
            from .dataset import mm_collate

            for side in ("chosen", "rejected"):
                toks = [_pair_tokens(r, tokenizer, r[side], args.seq_len) for r in rows]
                mb = mm_collate(
                    [{"input_ids": t[0], "labels": t[1]} for t in toks],
                    args.seq_len, n_video,
                )
                batch[f"{side}_ids"] = jnp.asarray(mb["input_ids"])
                batch[f"{side}_labels"] = jnp.asarray(mb["labels"])
            # chosen/rejected share the prompt, so the video span matches
            batch["video_start"] = jnp.asarray(mb["video_start"])
            batch["has_video"] = jnp.asarray(mb["has_video"])
            feats = np.zeros(
                (len(rows), args.frames, p_vis, lcfg.vision_hidden_size), np.float32
            )
            frng = np.random.default_rng(args.seed + step)
            for i, r in enumerate(rows):
                if not mb["has_video"][i]:
                    continue
                if args.feature_dir and r.get("video"):
                    vid = os.path.splitext(os.path.basename(str(r["video"])))[0]
                    feats[i] = np.load(
                        os.path.join(args.feature_dir, f"{vid}.npy"))[: args.frames]
                else:
                    feats[i] = frng.normal(size=feats[i].shape)
            batch["video_feats"] = jnp.asarray(feats)
        else:
            for side in ("chosen", "rejected"):
                toks = [_pair_tokens(r, tokenizer, r[side], args.seq_len) for r in rows]
                ids, labels = pad_collate(
                    [{"input_ids": t[0], "labels": t[1]} for t in toks], args.seq_len
                )
                batch[f"{side}_ids"] = jnp.asarray(ids)
                batch[f"{side}_labels"] = jnp.asarray(labels)
        if dsh is not None:
            batch = {k: jax.device_put(v, bshard.get(k, dsh)) for k, v in batch.items()}
        params, opt_state, loss, acc = jstep(params, ref_params, opt_state, batch)
        if (step + 1) % args.log_every == 0 or step == 0:
            rank0_print(f"step {step + 1}/{args.steps} loss {float(loss):.4f} "
                        f"reward_acc {float(acc):.2f}")
        if (step + 1) % args.save_every == 0 or step + 1 == args.steps:
            path = os.path.abspath(os.path.join(args.output_dir, f"checkpoint_{step + 1}"))
            if not os.path.isdir(path):
                save_checkpoint(path, params, opt_state, step + 1)
    rank0_print("dpo done")
    return float(loss)


if __name__ == "__main__":
    main()
