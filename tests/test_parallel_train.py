"""Sharding + sharded SFT step on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.parallel.sharding import create_mesh, param_specs, shard_params
from sttm_tpu.train.sft import init_train_state, loss_fn, make_train_step


def test_param_sharding_placement():
    mesh = create_mesh(dp=2, tp=4)
    params = qwen2.init_params(TINY, jax.random.key(0))
    sharded = shard_params(params, mesh)
    wq = sharded["layers"]["wq"]
    assert wq.sharding.spec == P(None, None, "tp")
    # each tp shard holds 1/4 of the output dim
    shard_shapes = {s.data.shape for s in wq.addressable_shards}
    assert shard_shapes == {(TINY.num_layers, TINY.hidden_size, TINY.q_dim // 4)}


def test_sharded_train_step_matches_single_device():
    mesh = create_mesh(dp=2, tp=4)
    params = qwen2.init_params(TINY, jax.random.key(1))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, TINY.vocab_size, size=(4, 32)), jnp.int32)
    labels = ids

    ref_loss = float(loss_fn(params, TINY, ids, labels))

    sharded = shard_params(params, mesh)
    tx, opt_state = init_train_state(sharded)
    step = make_train_step(TINY, tx)

    def to_sharding(tree):
        def rec(s):
            if isinstance(s, dict):
                return {k: rec(v) for k, v in s.items()}
            return NamedSharding(mesh, s)

        return rec(tree)

    pshard = to_sharding(param_specs(sharded))
    data_sharding = NamedSharding(mesh, P("dp", None))
    jstep = jax.jit(
        step,
        in_shardings=(pshard, None, data_sharding, data_sharding),
        out_shardings=(pshard, None, None),
    )
    new_params, _, loss = jstep(
        sharded, opt_state, jax.device_put(ids, data_sharding), jax.device_put(labels, data_sharding)
    )
    assert abs(float(loss) - ref_loss) < 1e-3
    # params actually changed and stayed sharded
    assert new_params["layers"]["wq"].sharding.spec == P(None, None, "tp")
    delta = np.abs(np.asarray(new_params["norm"]) - np.asarray(params["norm"])).max()
    assert delta > 0


def test_sharded_prefill_matches_single_device():
    """Tensor-parallel inference: logits equal the unsharded run."""
    from sttm_tpu.runtime.generate import build_prefill

    params = qwen2.init_params(TINY, jax.random.key(2))
    rng = np.random.default_rng(1)
    s_full = 64
    embeds = jnp.asarray(rng.normal(size=(1, s_full, TINY.hidden_size)), jnp.float32)
    prefill = build_prefill(TINY, None, s_full, "xla")
    ref_logits, _ = prefill(params, embeds, jnp.int32(40), jnp.int32(0))

    mesh = create_mesh(dp=1, tp=8)
    sharded = shard_params(params, mesh)
    logits, _ = prefill(sharded, embeds, jnp.int32(40), jnp.int32(0))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=2e-3, atol=2e-3)


def test_sharded_serving_levers_match_single_device():
    """Tensor-parallel SERVING: the prefix pool (cascade x continuous) and
    batched speculative decoding produce the same tokens with tp=8-sharded
    params as unsharded — the 72B serving shape composes with the serving
    levers, not just per-sample generate."""
    from sttm_tpu.runtime.generate import (
        GenerateConfig,
        generate_batch,
        generate_from_prefix,
        prefix_prefill,
    )
    from sttm_tpu.runtime.reducer import ReducerSpec
    from sttm_tpu.runtime.serving import (
        PagedRequest,
        make_prefix_pool,
        serve_continuous_paged,
    )

    t = h = w = 4
    nv = t * h * w
    sys_len, s_full, s_sfx = 4, 96, 16
    spec = ReducerSpec(
        kind="quadtree", layer_idx=2, t=t, h=h, w=w, video_budget=nv // 2,
        spatial_thresh=0.85, temporal_thresh=0.65, root_level=0,
    )
    params = qwen2.init_params(TINY, jax.random.key(3))
    mesh = create_mesh(dp=1, tp=8)
    sharded = shard_params(params, mesh)
    rng = np.random.default_rng(5)
    gen = GenerateConfig(max_new_tokens=6, eos_token_ids=())

    # paged pool: unsharded per-sample reference vs sharded pool serving
    emb = np.zeros((1, s_full, TINY.hidden_size), np.float32)
    emb[0, : sys_len + nv] = rng.normal(size=(sys_len + nv, TINY.hidden_size)) * 0.2
    emb = jnp.asarray(emb)
    reqs, want = [], {}
    for i in range(3):
        n = 6 + i
        sfx = np.zeros((1, s_sfx, TINY.hidden_size), np.float32)
        sfx[0, :n] = rng.normal(size=(n, TINY.hidden_size)) * 0.2
        sfx = jnp.asarray(sfx)
        reqs.append(PagedRequest(rid=f"q{i}", page=0, suffix_embeds=sfx,
                                 suffix_valid=n))
        cache = prefix_prefill(params, TINY, emb, sys_len + nv, sys_len, spec)
        want[f"q{i}"], _ = generate_from_prefix(
            params, TINY, cache, sfx, n, spec, gen
        )
    pool = make_prefix_pool(
        TINY, spec,
        [prefix_prefill(sharded, TINY, emb, sys_len + nv, sys_len, spec)],
    )
    got, _ = serve_continuous_paged(
        sharded, TINY, pool, reqs, spec, gen, batch_slots=2,
        decode_chunk_size=2,
    )
    assert got == want

    # batched speculative decode under sharded params
    embs, valids = [], []
    for i in range(2):
        v = sys_len + nv + 7 + i
        e = np.zeros((1, s_full, TINY.hidden_size), np.float32)
        e[0, :v] = rng.normal(size=(v, TINY.hidden_size)) * 0.2
        embs.append(e)
        valids.append(v)
    embeds_b = jnp.asarray(np.concatenate(embs))
    want_b, _ = generate_batch(params, TINY, embeds_b, valids,
                               [sys_len] * 2, spec, gen)
    got_b, rt = generate_batch(sharded, TINY, embeds_b, valids,
                               [sys_len] * 2, spec, gen, spec_decode_k=3)
    assert got_b == want_b
    assert rt["spec_dispatches"] >= 1


def test_sharded_ppo_step_matches_single_device():
    """PPO minibatch step under the dp x tp mesh: loss equals the unsharded
    run and params stay sharded (the reference's PPO runs via accelerate DDP
    only; here the same step jits over the mesh like SFT/DPO)."""
    import optax

    from sttm_tpu.train import rlhf

    mesh = create_mesh(dp=2, tp=4)
    params = qwen2.init_params(TINY, jax.random.key(3))
    v_head = rlhf.init_value_head(jax.random.key(4), TINY)
    rng = np.random.default_rng(7)
    b, s = 4, 24
    ids = jnp.asarray(rng.integers(0, TINY.vocab_size, size=(b, s)), jnp.int32)
    mask = jnp.zeros((b, s - 1), jnp.float32).at[:, 8:].set(1.0)

    logits, vals_full = rlhf.forward_with_value(params, v_head, TINY, ids)
    old_lp = rlhf.token_logprobs(logits, ids)
    values = vals_full[:, :-1]
    scores = jnp.asarray(rng.normal(size=b), jnp.float32)
    rewards, _, _ = rlhf.compute_rewards(scores, old_lp, old_lp - 0.01, mask, 0.2)
    cfg = rlhf.PPOConfig()
    values_m, adv, ret = rlhf.compute_advantages(values, rewards, mask, cfg)
    batch = {"input_ids": ids, "mask": mask, "old_logprobs": old_lp,
             "values": values_m, "advantages": adv, "returns": ret}

    tx = optax.adam(1e-3)
    step = rlhf.make_ppo_train_step(TINY, cfg, tx)
    _, _, _, ref_loss, _ = jax.jit(step)(params, v_head, tx.init((params, v_head)), batch)

    sharded = shard_params(params, mesh)
    opt_state = tx.init((sharded, v_head))

    def to_sharding(tree):
        def rec(s):
            if isinstance(s, dict):
                return {k: rec(v) for k, v in s.items()}
            return NamedSharding(mesh, s)

        return rec(tree)

    pshard = to_sharding(param_specs(sharded))
    dsh = NamedSharding(mesh, P("dp", None))
    bshard = {k: dsh for k in batch}
    jstep = jax.jit(step, in_shardings=(pshard, None, None, bshard),
                    out_shardings=(pshard, None, None, None, None))
    batch_put = {k: jax.device_put(v, dsh) for k, v in batch.items()}
    new_params, new_vh, _, loss, stats = jstep(sharded, v_head, opt_state, batch_put)
    assert abs(float(loss) - float(ref_loss)) < 1e-3
    assert new_params["layers"]["wq"].sharding.spec == P(None, None, "tp")
