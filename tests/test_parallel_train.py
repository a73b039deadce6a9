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
