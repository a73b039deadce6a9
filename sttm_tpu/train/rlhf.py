"""RLHF training steps: reward modeling + PPO (capability parity with the
reference's vendored TRL 0.7.11 — trl/trainer/reward_trainer.py:196-218,
trl/trainer/ppo_trainer.py:1031-1198, trl/models/modeling_value_head.py:21-51,
trl/trainer/utils.py:35-60 — which STTM itself never runs; SURVEY.md §2.6).

TPU-native design: the per-sample Python loops of the reference (e.g.
``compute_rewards`` iterating the batch, the reversed-``range`` GAE loop)
become batched jnp programs (`lax.scan` over reversed time for GAE, one-hot
scatter for the terminal score), so the whole PPO minibatch step is a single
jittable function. The value head rides the same trunk forward as the policy
logits (one prefill, two heads) instead of a second model pass.

Shapes follow TRL's convention: ``mask`` marks RESPONSE tokens (the positions
whose logprobs/values/rewards participate), aligned with per-token logprobs of
``ids[:, 1:]`` under ``logits[:, :-1]``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from ..models import qwen2
from ..models.config import DecoderConfig

__all__ = [
    "PPOConfig", "AdaptiveKLController", "FixedKLController",
    "masked_mean", "masked_var", "masked_whiten",
    "init_value_head", "forward_with_value", "token_logprobs",
    "reward_score", "reward_loss", "make_reward_train_step",
    "compute_rewards", "compute_advantages", "ppo_loss", "make_ppo_train_step",
    "make_sample_rollout", "ppo_make_experience", "make_best_of_n",
]


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Defaults mirror the reference's trl/trainer/ppo_config.py:73-125."""

    gamma: float = 1.0
    lam: float = 0.95
    cliprange: float = 0.2
    cliprange_value: float = 0.2
    vf_coef: float = 0.1
    ratio_threshold: float = 10.0
    whiten_rewards: bool = False
    kl_penalty: str = "kl"  # kl | abs | mse
    init_kl_coef: float = 0.2
    target: float = 6.0
    horizon: float = 10_000.0


class AdaptiveKLController:
    """KL coefficient controller (trl/trainer/utils.py:35-50); host-side state
    updated between jitted steps."""

    def __init__(self, init_kl_coef: float, target: float, horizon: float):
        self.value = float(init_kl_coef)
        self.target = float(target)
        self.horizon = float(horizon)

    def update(self, current: float, n_steps: int) -> None:
        err = min(max(current / self.target - 1.0, -0.2), 0.2)
        self.value *= 1.0 + err * n_steps / self.horizon


class FixedKLController:
    def __init__(self, kl_coef: float):
        self.value = float(kl_coef)

    def update(self, current: float, n_steps: int) -> None:
        pass


def masked_mean(values, mask, axis=None):
    return jnp.sum(values * mask, axis=axis) / jnp.sum(mask, axis=axis)


def masked_var(values, mask, unbiased: bool = True):
    mean = masked_mean(values, mask)
    var = masked_mean((values - mean) ** 2, mask)
    if unbiased:
        n = jnp.sum(mask)
        var = var * n / jnp.maximum(n - 1, 1)
    return var


def masked_whiten(values, mask, shift_mean: bool = True):
    mean, var = masked_mean(values, mask), masked_var(values, mask)
    out = (values - mean) * jax.lax.rsqrt(var + 1e-8)
    return out if shift_mean else out + mean


# --------------------------------------------------------------------------
# Trunk forwards: one prefill, two heads.
# --------------------------------------------------------------------------


def init_value_head(key: jax.Array, cfg: DecoderConfig) -> dict:
    """Scalar head on hidden states (ValueHead.summary, modeling_value_head.py:45)."""
    w = jax.random.normal(key, (cfg.hidden_size, 1), dtype=jnp.float32) * 0.02
    return {"w": w, "b": jnp.zeros((1,), jnp.float32)}


def _trunk_hidden(params, cfg: DecoderConfig, input_ids):
    x = qwen2.embed_tokens(params, input_ids, cfg)
    _, s, _ = x.shape
    cos, sin = qwen2.rope_cos_sin(cfg, jnp.arange(s, dtype=jnp.int32))
    x, _, _ = qwen2.prefill_layers(params["layers"], 0, cfg.num_layers, x, cos, sin, s, cfg, "xla")
    return qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)


def forward_with_value(params, v_head, cfg: DecoderConfig, input_ids):
    """(logits [B,S,V], values [B,S]) from one trunk pass."""
    h = _trunk_hidden(params, cfg, input_ids)
    logits = qwen2.lm_head(params, cfg, h)
    values = (h.astype(jnp.float32) @ v_head["w"] + v_head["b"])[..., 0]
    return logits, values


def token_logprobs(logits, input_ids):
    """Logprob of ids[:, t+1] under logits[:, t]; returns [B, S-1]."""
    lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(lp, input_ids[:, 1:, None], axis=-1)[..., 0]


# --------------------------------------------------------------------------
# Reward modeling (reward_trainer.py:196-218).
# --------------------------------------------------------------------------


def reward_score(params, v_head, cfg: DecoderConfig, input_ids, attn_mask):
    """Scalar reward per sequence: value head at the last non-pad token."""
    h = _trunk_hidden(params, cfg, input_ids)
    scores = (h.astype(jnp.float32) @ v_head["w"] + v_head["b"])[..., 0]  # [B, S]
    s = input_ids.shape[1]
    last = (s - 1) - jnp.argmax(attn_mask[:, ::-1].astype(jnp.int32), axis=1)
    return jnp.take_along_axis(scores, last[:, None], axis=1)[:, 0]


def reward_loss(params, v_head, cfg, chosen_ids, chosen_mask, rejected_ids,
                rejected_mask, margin=None):
    """-logsigmoid(r_c - r_r [- margin]).mean() (reward_trainer.py:214-218)."""
    rc = reward_score(params, v_head, cfg, chosen_ids, chosen_mask)
    rr = reward_score(params, v_head, cfg, rejected_ids, rejected_mask)
    delta = rc - rr if margin is None else rc - rr - margin
    loss = -jax.nn.log_sigmoid(delta).mean()
    acc = (delta > 0).mean()
    return loss, acc


def make_reward_train_step(cfg: DecoderConfig, tx, use_margin: bool = False):
    def step(params, v_head, opt_state, batch):
        def lf(pv):
            p, vh = pv
            return reward_loss(
                p, vh, cfg, batch["chosen_ids"], batch["chosen_mask"],
                batch["rejected_ids"], batch["rejected_mask"],
                batch["margin"] if use_margin else None,
            )

        (loss, acc), grads = jax.value_and_grad(lf, has_aux=True)((params, v_head))
        updates, opt_state = tx.update(grads, opt_state, (params, v_head))
        params, v_head = optax.apply_updates((params, v_head), updates)
        return params, v_head, opt_state, loss, acc

    return step


# --------------------------------------------------------------------------
# PPO (ppo_trainer.py:1031-1198), batched.
# --------------------------------------------------------------------------


def _kl_penalty(logprob, ref_logprob, kind: str):
    d = logprob - ref_logprob
    if kind == "kl":
        return d
    if kind == "abs":
        return jnp.abs(d)
    if kind == "mse":
        return 0.5 * d * d
    raise NotImplementedError(kind)


def compute_rewards(scores, logprobs, ref_logprobs, masks, kl_coef,
                    kl_penalty: str = "kl"):
    """Per-token rewards = -kl_coef*KL, plus the sequence score at the last
    masked position (ppo_trainer.py:1031-1068) — batched, no Python loop."""
    kl = _kl_penalty(logprobs, ref_logprobs, kl_penalty)
    non_score = -kl_coef * kl
    t = masks.shape[1]
    last = (t - 1) - jnp.argmax(masks[:, ::-1].astype(jnp.int32), axis=1)
    bonus = jax.nn.one_hot(last, t, dtype=scores.dtype) * scores[:, None]
    return non_score + bonus, non_score, kl


def compute_advantages(values, rewards, mask, cfg: PPOConfig):
    """GAE over the response axis (ppo_trainer.py:1085-1111); the reference's
    reversed Python loop becomes a reversed `lax.scan` carry."""
    values = values * mask
    rewards = rewards * mask
    if cfg.whiten_rewards:
        rewards = masked_whiten(rewards, mask, shift_mean=False)

    next_values = jnp.concatenate([values[:, 1:], jnp.zeros_like(values[:, :1])], axis=1)
    deltas = rewards + cfg.gamma * next_values - values  # [B, T]

    def body(carry, delta_t):
        gae = delta_t + cfg.gamma * cfg.lam * carry
        return gae, gae

    _, adv_rev = jax.lax.scan(body, jnp.zeros(values.shape[0], values.dtype),
                              jnp.flip(deltas, axis=1).T)
    advantages = jnp.flip(adv_rev.T, axis=1)
    returns = advantages + values
    advantages = jax.lax.stop_gradient(masked_whiten(advantages, mask))
    return values, advantages, returns


def ppo_loss(old_logprobs, values, logits, vpreds, logprobs, mask, advantages,
             returns, cfg: PPOConfig):
    """Clipped policy + clipped value loss with the reference's batch-skip
    ratio guard (ppo_trainer.py:1113-1198; the warn-and-zero becomes a
    jnp.where so the step stays jittable)."""
    vpredclipped = jnp.clip(vpreds, values - cfg.cliprange_value,
                            values + cfg.cliprange_value)
    vf1 = (vpreds - returns) ** 2
    vf2 = (vpredclipped - returns) ** 2
    vf_loss = 0.5 * masked_mean(jnp.maximum(vf1, vf2), mask)
    vf_clipfrac = masked_mean((vf2 > vf1).astype(jnp.float32), mask)

    ratio = jnp.exp(logprobs - old_logprobs)
    pg1 = -advantages * ratio
    pg2 = -advantages * jnp.clip(ratio, 1.0 - cfg.cliprange, 1.0 + cfg.cliprange)
    pg_loss = masked_mean(jnp.maximum(pg1, pg2), mask)
    pg_clipfrac = masked_mean((pg2 > pg1).astype(jnp.float32), mask)

    avg_ratio = masked_mean(ratio, mask)
    keep = (avg_ratio <= cfg.ratio_threshold).astype(pg_loss.dtype)
    pg_loss, vf_loss = pg_loss * keep, vf_loss * keep
    loss = pg_loss + cfg.vf_coef * vf_loss

    lp_full = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    entropy = masked_mean(-jnp.sum(jnp.exp(lp_full) * lp_full, axis=-1), mask)
    stats = {
        "loss/policy": pg_loss, "loss/value": cfg.vf_coef * vf_loss, "loss/total": loss,
        "policy/entropy": entropy,
        "policy/approxkl": 0.5 * masked_mean((logprobs - old_logprobs) ** 2, mask),
        "policy/policykl": masked_mean(old_logprobs - logprobs, mask),
        "policy/clipfrac": pg_clipfrac, "policy/ratio": avg_ratio,
        "val/clipfrac": vf_clipfrac, "val/vpred": masked_mean(vpreds, mask),
        "val/error": masked_mean((vpreds - returns) ** 2, mask),
        "returns/mean": masked_mean(returns, mask),
    }
    return loss, stats


def make_sample_rollout(cfg: DecoderConfig, prompt_len: int, max_new: int,
                        temperature: float = 1.0):
    """Jittable on-policy rollout (the reference PPOTrainer's
    ``generate`` + experience stage): prefill the prompt, then a `lax.scan`
    of single-token decode steps with categorical sampling.

    Returns rollout(params, prompt_ids [B, prompt_len], key) ->
    ids [B, prompt_len + max_new] (prompt + sampled response).
    """
    s_c = prompt_len + max_new

    def rollout(params, prompt_ids, key):
        b = prompt_ids.shape[0]
        x = qwen2.embed_tokens(params, prompt_ids, cfg)
        cos, sin = qwen2.rope_cos_sin(cfg, jnp.arange(prompt_len, dtype=jnp.int32))
        x, k_all, v_all = qwen2.prefill_layers(
            params["layers"], 0, cfg.num_layers, x, cos, sin, prompt_len, cfg, "xla")
        cache_k = jnp.zeros(
            (cfg.num_layers, b, s_c, cfg.num_kv_heads, cfg.head_dim), k_all.dtype
        ).at[:, :, :prompt_len].set(k_all)
        cache_v = jnp.zeros_like(cache_k).at[:, :, :prompt_len].set(v_all)

        h = qwen2.rms_norm(x[:, -1:], params["norm"], cfg.rms_eps, cfg.rms_offset)
        logits0 = qwen2.lm_head(params, cfg, h)[:, 0].astype(jnp.float32)
        key, k0 = jax.random.split(key)
        tok0 = jax.random.categorical(k0, logits0 / temperature, axis=-1)

        def step(carry, t):
            tok, ck, cv, key = carry
            pos = jnp.full((1,), prompt_len, jnp.int32) + t
            cos_t, sin_t = qwen2.rope_cos_sin(cfg, pos)
            x = qwen2.embed_tokens(params, tok[:, None], cfg)
            # unroll: the rollout cache has a REAL batch axis, and the
            # scan-form layer loop pays a full cache layout copy per layer
            # per token on TPU in that case (decode_layers docstring /
            # CLAUDE.md); static layer indexing keeps the update in place
            x, ck, cv, _ = qwen2.decode_layers(
                params["layers"], 0, cfg.num_layers, x, cos_t, sin_t,
                ck, cv, prompt_len, t, prompt_len, cfg, unroll=True)
            h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
            logits = qwen2.lm_head(params, cfg, h)[:, 0].astype(jnp.float32)
            key, kt = jax.random.split(key)
            nxt = jax.random.categorical(kt, logits / temperature, axis=-1)
            return (nxt, ck, cv, key), tok

        (_, _, _, _), toks = jax.lax.scan(
            step, (tok0, cache_k, cache_v, key),
            jnp.arange(max_new, dtype=jnp.int32))
        return jnp.concatenate([prompt_ids, toks.T.astype(prompt_ids.dtype)], axis=1)

    return rollout


def ppo_make_experience(params, ref_params, v_head, cfg: DecoderConfig,
                        ids, response_mask, scores, ppo_cfg: PPOConfig,
                        kl_coef: float):
    """Score a rollout into a PPO minibatch (the reference's
    ``batched_forward_pass`` + compute_rewards + compute_advantages stage,
    ppo_trainer.py:659-710,1031-1111). ids [B, S]; response_mask [B, S-1]
    marks sampled-token positions; scores [B] from the reward model."""
    logits, vals_full = forward_with_value(params, v_head, cfg, ids)
    old_lp = jax.lax.stop_gradient(token_logprobs(logits, ids))
    values = jax.lax.stop_gradient(vals_full[:, :-1])
    ref_logits = qwen2.lm_head(ref_params, cfg, _trunk_hidden(ref_params, cfg, ids))
    ref_lp = jax.lax.stop_gradient(token_logprobs(ref_logits, ids))
    rewards, _, kl = compute_rewards(scores, old_lp, ref_lp, response_mask,
                                     kl_coef, ppo_cfg.kl_penalty)
    values_m, adv, ret = compute_advantages(values, rewards, response_mask, ppo_cfg)
    mean_kl = masked_mean(kl, response_mask)
    return {
        "input_ids": ids, "mask": response_mask, "old_logprobs": old_lp,
        "values": values_m, "advantages": adv, "returns": ret,
    }, mean_kl


def make_ppo_train_step(cfg: DecoderConfig, ppo_cfg: PPOConfig, tx):
    """One PPO minibatch step over a rolled-out batch.

    batch: input_ids [B,S] (query+response), mask [B,S-1] response-token mask,
    old_logprobs / values / advantages / returns [B,S-1] from the rollout
    (compute_rewards + compute_advantages on the sampled experience).
    """

    def step(params, v_head, opt_state, batch):
        def lf(pv):
            p, vh = pv
            logits, vpred_full = forward_with_value(p, vh, cfg, batch["input_ids"])
            logprobs = token_logprobs(logits, batch["input_ids"])
            vpreds = vpred_full[:, :-1]
            return ppo_loss(
                batch["old_logprobs"], batch["values"], logits[:, :-1], vpreds,
                logprobs, batch["mask"], batch["advantages"], batch["returns"],
                ppo_cfg,
            )

        (loss, stats), grads = jax.value_and_grad(lf, has_aux=True)((params, v_head))
        updates, opt_state = tx.update(grads, opt_state, (params, v_head))
        params, v_head = optax.apply_updates((params, v_head), updates)
        return params, v_head, opt_state, loss, stats

    return step


def make_best_of_n(cfg: DecoderConfig, prompt_len: int, max_new: int,
                   sample_size: int = 4, n_candidates: int = 1,
                   temperature: float = 1.0):
    """Best-of-N sampling over the reward head (the vendored TRL
    BestOfNSampler, trl/extras/best_of_n_sampler.py:62-113).

    The reference loops queries on the host, repeats each query
    ``sample_size`` times, generates, decodes to text, and scores via a
    host callable; here the whole thing is ONE jittable program: tile the
    prompt batch, run the batched sampling rollout, score every candidate
    with ``reward_score``, and gather the top ``n_candidates`` rows per
    query with a static top-k.

    Returns best_of_n(params, v_head, prompt_ids [B, prompt_len], key) ->
    (ids [B, n_candidates, prompt_len + max_new], scores [B, n_candidates]).
    Pass ``score_fn(ids, mask) -> [B*N]`` to ``best_of_n`` via functools
    partial-application at call sites that need a custom scorer (the
    reference's queries_to_scores hook) by wrapping this builder.
    """
    if n_candidates > sample_size:
        raise ValueError(f"n_candidates {n_candidates} > sample_size {sample_size}")
    rollout = make_sample_rollout(cfg, prompt_len, max_new, temperature)
    s_c = prompt_len + max_new

    def best_of_n(params, v_head, prompt_ids, key, score_fn=None):
        b = prompt_ids.shape[0]
        tiled = jnp.repeat(prompt_ids, sample_size, axis=0)  # [B*N, P]
        ids = rollout(params, tiled, key)  # [B*N, P+T]
        mask = jnp.ones((b * sample_size, s_c), jnp.int32)
        if score_fn is None:
            scores = reward_score(params, v_head, cfg, ids, mask)
        else:
            scores = score_fn(ids, mask)
        scores = scores.reshape(b, sample_size)
        top_scores, top_idx = jax.lax.top_k(scores, n_candidates)
        cand = ids.reshape(b, sample_size, s_c)
        best = jnp.take_along_axis(cand, top_idx[:, :, None], axis=1)
        return best, top_scores

    return best_of_n
