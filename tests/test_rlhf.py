"""RLHF steps (train/rlhf.py) vs loop oracles of the reference TRL semantics
(trl/trainer/ppo_trainer.py:1031-1198, trl/core.py:138-177,
trl/trainer/reward_trainer.py:196-218)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.train import rlhf


def _np_masked_mean(v, m):
    return (v * m).sum() / m.sum()


def _np_masked_whiten(v, m, shift_mean=True, unbiased=True):
    mean = _np_masked_mean(v, m)
    var = _np_masked_mean((v - mean) ** 2, m)
    if unbiased:
        n = m.sum()
        var = var * n / max(n - 1, 1)
    out = (v - mean) / np.sqrt(var + 1e-8)
    return out if shift_mean else out + mean


def test_masked_whiten_matches_oracle():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(4, 9)).astype(np.float32)
    m = (rng.random((4, 9)) > 0.4).astype(np.float32)
    got = np.asarray(rlhf.masked_whiten(jnp.asarray(v), jnp.asarray(m)))
    np.testing.assert_allclose(got, _np_masked_whiten(v, m), rtol=2e-5, atol=2e-5)
    got2 = np.asarray(rlhf.masked_whiten(jnp.asarray(v), jnp.asarray(m), shift_mean=False))
    np.testing.assert_allclose(got2, _np_masked_whiten(v, m, shift_mean=False),
                               rtol=2e-5, atol=2e-5)


def test_compute_rewards_semantics():
    rng = np.random.default_rng(1)
    b, t = 3, 7
    scores = rng.normal(size=b).astype(np.float32)
    lp = rng.normal(size=(b, t)).astype(np.float32)
    ref_lp = rng.normal(size=(b, t)).astype(np.float32)
    masks = np.zeros((b, t), np.float32)
    lasts = [4, 6, 2]
    for i, last in enumerate(lasts):
        masks[i, 1 : last + 1] = 1.0
    for kind, f in [("kl", lambda d: d), ("abs", np.abs), ("mse", lambda d: 0.5 * d * d)]:
        rew, non_score, kl = rlhf.compute_rewards(
            jnp.asarray(scores), jnp.asarray(lp), jnp.asarray(ref_lp),
            jnp.asarray(masks), kl_coef=0.3, kl_penalty=kind)
        want_kl = f(lp - ref_lp)
        np.testing.assert_allclose(np.asarray(kl), want_kl, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(non_score), -0.3 * want_kl, rtol=1e-6)
        want = -0.3 * want_kl
        for i, last in enumerate(lasts):  # score lands on the LAST masked index
            want = want.copy()
            want[i, last] += scores[i]
        np.testing.assert_allclose(np.asarray(rew), want, rtol=1e-6)


def test_gae_matches_loop_oracle():
    rng = np.random.default_rng(2)
    b, t = 2, 11
    cfg = rlhf.PPOConfig(gamma=0.98, lam=0.9)
    values = rng.normal(size=(b, t)).astype(np.float32)
    rewards = rng.normal(size=(b, t)).astype(np.float32)
    mask = (rng.random((b, t)) > 0.3).astype(np.float32)

    # reference loop (ppo_trainer.py:1085-1111)
    v, r = values * mask, rewards * mask
    lastgaelam = np.zeros(b, np.float32)
    adv_rev = []
    for i in reversed(range(t)):
        nxt = v[:, i + 1] if i < t - 1 else 0.0
        delta = r[:, i] + cfg.gamma * nxt - v[:, i]
        lastgaelam = delta + cfg.gamma * cfg.lam * lastgaelam
        adv_rev.append(lastgaelam)
    adv = np.stack(adv_rev[::-1], axis=1)
    want_returns = adv + v
    want_adv = _np_masked_whiten(adv, mask)

    got_v, got_adv, got_ret = rlhf.compute_advantages(
        jnp.asarray(values), jnp.asarray(rewards), jnp.asarray(mask), cfg)
    np.testing.assert_allclose(np.asarray(got_v), v, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_ret), want_returns, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_adv), want_adv, rtol=1e-4, atol=1e-4)


def test_ppo_loss_ratio_guard_and_clip():
    rng = np.random.default_rng(3)
    b, t, v = 2, 5, 13
    cfg = rlhf.PPOConfig()
    old_lp = jnp.asarray(rng.normal(size=(b, t)).astype(np.float32))
    mask = jnp.ones((b, t), jnp.float32)
    logits = jnp.asarray(rng.normal(size=(b, t, v)).astype(np.float32))
    values = jnp.asarray(rng.normal(size=(b, t)).astype(np.float32))
    adv = jnp.asarray(rng.normal(size=(b, t)).astype(np.float32))
    ret = values + adv

    loss, stats = rlhf.ppo_loss(old_lp, values, logits, values, old_lp, mask, adv, ret, cfg)
    # ratio == 1 everywhere -> pg_loss = masked_mean(-adv), no clipping
    np.testing.assert_allclose(float(stats["policy/ratio"]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(stats["policy/clipfrac"]), 0.0)
    np.testing.assert_allclose(
        float(stats["loss/policy"]), float(rlhf.masked_mean(-adv, mask)), rtol=1e-5)

    # huge ratio -> batch-skip guard zeroes the loss (ppo_trainer.py:1162-1167)
    big_lp = old_lp + 5.0
    loss2, stats2 = rlhf.ppo_loss(old_lp, values, logits, values, big_lp, mask, adv, ret, cfg)
    assert float(stats2["policy/ratio"]) > cfg.ratio_threshold
    np.testing.assert_allclose(float(loss2), 0.0)


def test_adaptive_kl_controller():
    ctl = rlhf.AdaptiveKLController(0.2, target=6.0, horizon=10_000.0)
    ctl.update(12.0, 256)  # over target -> clipped +0.2 error -> coef grows
    np.testing.assert_allclose(ctl.value, 0.2 * (1 + 0.2 * 256 / 10_000))
    ctl2 = rlhf.FixedKLController(0.1)
    ctl2.update(99.0, 256)
    assert ctl2.value == 0.1


@pytest.fixture(scope="module")
def tiny_params():
    return qwen2.init_params(TINY, jax.random.PRNGKey(0))


def test_reward_step_learns_preference(tiny_params):
    key = jax.random.PRNGKey(1)
    v_head = rlhf.init_value_head(key, TINY)
    b, s = 4, 12
    kc, kr = jax.random.split(key)
    chosen = jax.random.randint(kc, (b, s), 0, TINY.vocab_size)
    rejected = jax.random.randint(kr, (b, s), 0, TINY.vocab_size)
    mask = jnp.ones((b, s), jnp.float32)
    batch = {"chosen_ids": chosen, "chosen_mask": mask,
             "rejected_ids": rejected, "rejected_mask": mask}

    tx = optax.adam(5e-3)
    opt_state = tx.init((tiny_params, v_head))
    step = jax.jit(rlhf.make_reward_train_step(TINY, tx))
    params = tiny_params
    loss0 = None
    for i in range(8):
        params, v_head, opt_state, loss, acc = step(params, v_head, opt_state, batch)
        if i == 0:
            loss0 = float(loss)
    assert float(loss) < loss0
    assert float(acc) == 1.0  # this fixed pair is fully separable


def test_ppo_step_runs_and_updates(tiny_params):
    cfg = rlhf.PPOConfig()
    key = jax.random.PRNGKey(2)
    v_head = rlhf.init_value_head(key, TINY)
    b, s = 2, 10
    ids = jax.random.randint(key, (b, s), 0, TINY.vocab_size)
    mask = jnp.zeros((b, s - 1), jnp.float32).at[:, 3:].set(1.0)  # response tokens

    logits, vals_full = rlhf.forward_with_value(tiny_params, v_head, TINY, ids)
    old_lp = rlhf.token_logprobs(logits, ids)
    values = vals_full[:, :-1]
    ref_lp = old_lp - 0.01
    scores = jnp.asarray([1.0, -0.5], jnp.float32)
    rewards, _, _ = rlhf.compute_rewards(scores, old_lp, ref_lp, mask, kl_coef=0.2)
    values_m, adv, ret = rlhf.compute_advantages(values, rewards, mask, cfg)
    batch = {"input_ids": ids, "mask": mask, "old_logprobs": old_lp,
             "values": values_m, "advantages": adv, "returns": ret}

    tx = optax.adam(1e-3)
    opt_state = tx.init((tiny_params, v_head))
    step = jax.jit(rlhf.make_ppo_train_step(TINY, cfg, tx))
    params, v_head2, opt_state, loss, stats = step(tiny_params, v_head, opt_state, batch)
    assert np.isfinite(float(loss))
    # ratio starts at 1 (same params as rollout): no clipping on step 1
    np.testing.assert_allclose(float(stats["policy/ratio"]), 1.0, rtol=1e-4)
    # params actually moved
    delta = jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(lambda a, b_: (a.astype(jnp.float32) - b_.astype(jnp.float32)),
                     params, tiny_params), 0.0)
    assert delta > 0.0


def test_best_of_n_selects_highest_reward():
    """make_best_of_n: one batched rollout + reward-head scoring must return
    the same candidates a host-side loop over the scored samples picks
    (the vendored TRL BestOfNSampler semantics,
    trl/extras/best_of_n_sampler.py:100-113)."""
    cfg = TINY
    params = qwen2.init_params(cfg, jax.random.key(0))
    v_head = rlhf.init_value_head(jax.random.key(1), cfg)
    b, prompt_len, max_new, n = 2, 6, 5, 4
    prompts = jnp.asarray(
        np.random.default_rng(2).integers(1, 200, size=(b, prompt_len)), jnp.int32)

    bon = rlhf.make_best_of_n(cfg, prompt_len, max_new, sample_size=n,
                              n_candidates=2)
    best, top_scores = jax.jit(bon)(params, v_head, prompts, jax.random.key(3))
    assert best.shape == (b, 2, prompt_len + max_new)
    assert top_scores.shape == (b, 2)
    # prompts preserved in every returned candidate
    for q in range(b):
        for c in range(2):
            np.testing.assert_array_equal(
                np.asarray(best[q, c, :prompt_len]), np.asarray(prompts[q]))
    # oracle: rescore the rollout directly and check the argmax row matches
    rollout = rlhf.make_sample_rollout(cfg, prompt_len, max_new)
    ids = rollout(params, jnp.repeat(prompts, n, axis=0), jax.random.key(3))
    mask = jnp.ones(ids.shape, jnp.int32)
    scores = np.asarray(rlhf.reward_score(params, v_head, cfg, ids, mask)).reshape(b, n)
    cand = np.asarray(ids).reshape(b, n, -1)
    for q in range(b):
        order = np.argsort(-scores[q])
        np.testing.assert_array_equal(np.asarray(best[q, 0]), cand[q, order[0]])
        np.testing.assert_allclose(np.asarray(top_scores[q, 0]),
                                   scores[q, order[0]], rtol=1e-5)
    # scores strictly ordered
    assert float(top_scores[0, 0]) >= float(top_scores[0, 1])
    with pytest.raises(ValueError):
        rlhf.make_best_of_n(cfg, prompt_len, max_new, sample_size=2, n_candidates=3)


def test_best_of_n_custom_score_fn():
    cfg = TINY
    params = qwen2.init_params(cfg, jax.random.key(0))
    v_head = rlhf.init_value_head(jax.random.key(1), cfg)
    prompts = jnp.asarray(
        np.random.default_rng(4).integers(1, 200, size=(1, 4)), jnp.int32)
    bon = rlhf.make_best_of_n(cfg, 4, 3, sample_size=3, n_candidates=1)

    def score_fn(ids, mask):  # favor the candidate with the largest last token
        return ids[:, -1].astype(jnp.float32)

    best, sc = bon(params, v_head, prompts, jax.random.key(5), score_fn=score_fn)
    assert float(sc[0, 0]) == float(best[0, 0, -1])
