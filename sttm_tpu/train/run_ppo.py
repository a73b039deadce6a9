"""CLI: PPO training loop (the reference's vendored-TRL PPOTrainer role,
trl/trainer/ppo_trainer.py — never run by STTM itself; SURVEY.md §2.6).

Pipeline per step: sample prompts -> on-policy rollout (make_sample_rollout)
-> reward-model scores (reward_score; its trunk is the frozen reference
policy + a value head, the TRL AutoModelForCausalLMWithValueHead shape) ->
experience (ppo_make_experience) -> ppo_epochs clipped-surrogate updates ->
adaptive-KL coefficient update.

Annotation format: JSON list of {"prompt": [conversation turns ending with
the user turn]}. ``--smoke`` runs TINY with random weights and a random-init
reward model (exercises the full loop; rewards are meaningless by design —
this environment ships no checkpoints).
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_name_or_path", default="")
    p.add_argument("--reward_model_path", default="")
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--data_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--prompt_len", type=int, default=256)
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--learning_rate", type=float, default=1e-6)
    p.add_argument("--ppo_epochs", type=int, default=4)
    p.add_argument("--init_kl_coef", type=float, default=0.2)
    p.add_argument("--adap_kl_ctrl", action="store_true", default=True)
    p.add_argument("--no_adap_kl_ctrl", dest="adap_kl_ctrl", action="store_false")
    p.add_argument("--kl_target", type=float, default=6.0)
    p.add_argument("--kl_horizon", type=float, default=10_000.0)
    p.add_argument("--cliprange", type=float, default=0.2)
    p.add_argument("--vf_coef", type=float, default=0.1)
    p.add_argument("--whiten_rewards", action="store_true")
    p.add_argument("--save_every", type=int, default=25)
    p.add_argument("--log_every", type=int, default=5)
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models import qwen2
    from ..models.config import QWEN2_7B, TINY
    from ..models.weights import load_safetensors_dir
    from ..utils.logging import rank0_print
    from .data import save_checkpoint
    from . import rlhf

    if args.smoke:
        from ..eval.harness import SmokeTokenizer

        cfg = TINY
        tokenizer = SmokeTokenizer()
        params = qwen2.init_params(cfg, jax.random.key(args.seed))
        rm_params = qwen2.init_params(cfg, jax.random.key(args.seed + 1))
    else:
        from transformers import AutoTokenizer

        cfg = QWEN2_7B
        tokenizer = AutoTokenizer.from_pretrained(args.model_name_or_path)
        params = load_safetensors_dir(cfg, args.model_name_or_path)
        rm_params = (load_safetensors_dir(cfg, args.reward_model_path)
                     if args.reward_model_path else params)
    ref_params = params  # frozen pre-update policy (KL anchor)
    v_head = rlhf.init_value_head(jax.random.key(args.seed + 2), cfg)
    rm_head = rlhf.init_value_head(jax.random.key(args.seed + 3), cfg)
    if args.reward_model_path:
        # the trunk loader covers decoder weights only; the scalar reward
        # head ships as value_head.npz (w [D,1], b [1]) next to them —
        # without it the "reward" is a random readout, so refuse to proceed
        vh_path = os.path.join(args.reward_model_path, "value_head.npz")
        if os.path.exists(vh_path):
            import numpy as _np

            vh = _np.load(vh_path)
            rm_head = {"w": jnp.asarray(vh["w"], jnp.float32),
                       "b": jnp.asarray(vh["b"], jnp.float32)}
        else:
            raise SystemExit(
                f"--reward_model_path has no value_head.npz at {vh_path}; "
                "a reward model without its trained head scores noise")

    ppo_cfg = rlhf.PPOConfig(
        cliprange=args.cliprange, cliprange_value=args.cliprange,
        vf_coef=args.vf_coef, whiten_rewards=args.whiten_rewards,
        init_kl_coef=args.init_kl_coef, target=args.kl_target,
        horizon=args.kl_horizon)
    kl_ctl = (rlhf.AdaptiveKLController(args.init_kl_coef, args.kl_target, args.kl_horizon)
              if args.adap_kl_ctrl else rlhf.FixedKLController(args.init_kl_coef))

    with open(args.data_path) as fp:
        data = json.load(fp)
    rank0_print(f"loaded {len(data)} prompts")

    from .dataset import _encode_with_image, preprocess_qwen_chat

    # generation header, NOT a closed empty assistant turn: the rollout must
    # be conditioned on "<|im_start|>assistant\n" with no <|im_end|>, or the
    # policy samples a brand-new turn after a terminated (empty) answer
    gen_header = _encode_with_image("<|im_start|>assistant\n", tokenizer)

    def prompt_tokens(sample):
        ids, _ = preprocess_qwen_chat(list(sample["prompt"]), tokenizer)
        ids = list(ids) + list(gen_header)
        # left-truncate: keep the final user turn + generation header
        ids = ids[-args.prompt_len :]
        pad_id = getattr(tokenizer, "pad_token_id", 0) or 0
        return [pad_id] * (args.prompt_len - len(ids)) + ids

    import optax

    tx = optax.adam(args.learning_rate)
    opt_state = tx.init((params, v_head))
    # frozen trees (rm_params/ref_params) are jit ARGUMENTS, not closures:
    # closed-over params bake the full weights into the executable as
    # constants (7 GB per program at the 7B point; CLAUDE.md numerics rules)
    rollout = jax.jit(rlhf.make_sample_rollout(
        cfg, args.prompt_len, args.max_new_tokens, args.temperature))
    score_fn = jax.jit(lambda rp, rh, ids, m: rlhf.reward_score(rp, rh, cfg, ids, m))
    exp_fn = jax.jit(lambda p, refp, vh, ids, mask, scores, coef:
                     rlhf.ppo_make_experience(p, refp, vh, cfg, ids, mask,
                                              scores, ppo_cfg, coef))
    step_fn = jax.jit(rlhf.make_ppo_train_step(cfg, ppo_cfg, tx))

    s_total = args.prompt_len + args.max_new_tokens
    resp_mask = np.zeros((args.batch_size, s_total - 1), np.float32)
    resp_mask[:, args.prompt_len - 1 :] = 1.0
    resp_mask = jnp.asarray(resp_mask)
    attn_mask = jnp.ones((args.batch_size, s_total), jnp.float32)

    rng = np.random.default_rng(args.seed)
    key = jax.random.key(args.seed + 4)
    loss = float("nan")
    for step in range(args.steps):
        idx = rng.choice(len(data), size=args.batch_size,
                         replace=len(data) < args.batch_size)
        prompts = jnp.asarray([prompt_tokens(data[i]) for i in idx], jnp.int32)
        key, kroll = jax.random.split(key)
        ids = rollout(params, prompts, kroll)
        scores = score_fn(rm_params, rm_head, ids, attn_mask)
        batch, mean_kl = exp_fn(params, ref_params, v_head, ids, resp_mask,
                                scores, kl_ctl.value)
        for _ in range(args.ppo_epochs):
            params, v_head, opt_state, loss, stats = step_fn(
                params, v_head, opt_state, batch)
        kl_ctl.update(float(mean_kl), args.batch_size)
        if (step + 1) % args.log_every == 0 or step == 0:
            rank0_print(
                f"step {step + 1}/{args.steps} loss {float(loss):.4f} "
                f"reward {float(scores.mean()):.3f} kl {float(mean_kl):.4f} "
                f"kl_coef {kl_ctl.value:.4f}")
        if (step + 1) % args.save_every == 0 or step + 1 == args.steps:
            path = os.path.abspath(os.path.join(args.output_dir, f"checkpoint_{step + 1}"))
            if not os.path.isdir(path):
                # v_head rides the payload: opt_state is shaped for
                # (params, v_head), so resume needs both trees
                save_checkpoint(path, {"policy": params, "v_head": v_head},
                                opt_state, step + 1)
    rank0_print("ppo done")
    return float(loss)


if __name__ == "__main__":
    main()
