"""CLI: reward-model training loop (the reference's vendored-TRL
RewardTrainer role, trl/trainer/reward_trainer.py — never run by STTM
itself; SURVEY.md §2.6).

Data format matches run_dpo: a JSON list of {"prompt": [...], "chosen": str,
"rejected": str} (optional "margin": float with --use_margin). Loss is
-logsigmoid(r_chosen - r_rejected [- margin]) over value-head scores at the
last non-pad token. Checkpoints save the trunk via orbax AND the scalar head
as ``value_head.npz`` — the artifact run_ppo's --reward_model_path expects.
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
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--use_margin", action="store_true")
    p.add_argument("--save_every", type=int, default=50)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..models import qwen2
    from ..models.config import QWEN2_7B, TINY
    from ..models.weights import load_safetensors_dir
    from ..utils.logging import rank0_print
    from .data import save_checkpoint
    from .dataset import pad_collate, preprocess_qwen_chat
    from . import rlhf

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
    v_head = rlhf.init_value_head(jax.random.key(args.seed + 1), cfg)

    with open(args.data_path) as fp:
        data = json.load(fp)
    rank0_print(f"loaded {len(data)} preference pairs")

    def side_tokens(sample, answer):
        convs = list(sample["prompt"]) + [{"from": "gpt", "value": answer}]
        ids, _ = preprocess_qwen_chat(convs, tokenizer)
        return ids[: args.seq_len]

    tx = optax.adam(args.learning_rate)
    opt_state = tx.init((params, v_head))
    step_fn = jax.jit(rlhf.make_reward_train_step(cfg, tx, args.use_margin))

    rng = np.random.default_rng(args.seed)
    loss = acc = float("nan")
    for step in range(args.steps):
        idx = rng.choice(len(data), size=args.batch_size,
                         replace=len(data) < args.batch_size)
        rows = [data[i] for i in idx]
        batch = {}
        for side in ("chosen", "rejected"):
            toks = [side_tokens(r, r[side]) for r in rows]
            ids, _ = pad_collate(
                [{"input_ids": t, "labels": t} for t in toks], args.seq_len
            )
            batch[f"{side}_ids"] = jnp.asarray(ids)
            # attention mask: 1 up to each row's true length (right padding)
            mask = np.zeros((len(toks), args.seq_len), np.float32)
            for i, t in enumerate(toks):
                mask[i, : len(t)] = 1.0
            batch[f"{side}_mask"] = jnp.asarray(mask)
        if args.use_margin:
            batch["margin"] = jnp.asarray(
                [float(r.get("margin", 0.0)) for r in rows], jnp.float32)
        params, v_head, opt_state, loss, acc = step_fn(params, v_head, opt_state, batch)
        if (step + 1) % args.log_every == 0 or step == 0:
            rank0_print(f"step {step + 1}/{args.steps} loss {float(loss):.4f} "
                        f"acc {float(acc):.2f}")
        if (step + 1) % args.save_every == 0 or step + 1 == args.steps:
            path = os.path.abspath(os.path.join(args.output_dir, f"checkpoint_{step + 1}"))
            if not os.path.isdir(path):
                save_checkpoint(path, params, opt_state, step + 1)
                np.savez(os.path.join(args.output_dir, "value_head.npz"),
                         w=np.asarray(v_head["w"]), b=np.asarray(v_head["b"]))
    rank0_print("rm done")
    return float(loss)


if __name__ == "__main__":
    main()
