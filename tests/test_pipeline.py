"""Pipeline parallelism: GPipe schedule parity with the single-device step.

The pipelined forward/step must be numerically the same program as
train/sft.py's — the microbatch split only reorders the batch axis — so
loss, logits and gradients are compared directly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "float32")

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.parallel.pipeline import (
    create_pp_mesh,
    make_pp_train_step,
    pp_forward_fn,
    shard_params_pp,
)
from sttm_tpu.train.sft import init_train_state, loss_fn, make_train_step


@pytest.fixture(scope="module")
def setup():
    params = qwen2.init_params(TINY, jax.random.key(0))
    rng = np.random.default_rng(0)
    b, s = 4, 24
    ids = jnp.asarray(rng.integers(0, TINY.vocab_size, size=(b, s)), jnp.int32)
    labels = ids
    return params, ids, labels


def test_pp_forward_matches_plain(setup):
    params, ids, _ = setup
    mesh = create_pp_mesh(4)  # 1 layer per stage
    fwd = jax.jit(pp_forward_fn(TINY, mesh, n_micro=2))
    logits_pp = fwd(shard_params_pp(params, mesh), ids)

    x = qwen2.embed_tokens(params, ids, TINY)
    pos = jnp.arange(ids.shape[1], dtype=jnp.int32)
    cos, sin = qwen2.rope_cos_sin(TINY, pos)
    y, _, _ = qwen2.prefill_layers(
        params["layers"], 0, TINY.num_layers, x, cos, sin, ids.shape[1], TINY, "xla"
    )
    h = qwen2.rms_norm(y, params["norm"], TINY.rms_eps, TINY.rms_offset)
    ref = qwen2.lm_head(params, TINY, h)
    np.testing.assert_allclose(np.asarray(logits_pp), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pp_train_step_matches_plain(setup):
    params, ids, labels = setup
    mesh = create_pp_mesh(2)  # 2 layers per stage

    tx, opt_state = init_train_state(params)
    ref_step = make_train_step(TINY, tx)
    ref_params, _, ref_loss = jax.jit(ref_step)(params, opt_state, ids, labels)

    pparams = shard_params_pp(params, mesh)
    tx2, opt_state2 = init_train_state(pparams)
    pp_step = jax.jit(make_pp_train_step(TINY, tx2, mesh, n_micro=2))
    new_params, _, pp_loss = pp_step(pparams, opt_state2, ids, labels)

    np.testing.assert_allclose(float(pp_loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_params["layers"]["wq"]),
        np.asarray(ref_params["layers"]["wq"]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(new_params["embed"]),
        np.asarray(ref_params["embed"]),
        rtol=1e-4, atol=1e-4,
    )


def test_pp_remat_matches(setup):
    params, ids, labels = setup
    mesh = create_pp_mesh(2)
    pparams = shard_params_pp(params, mesh)
    tx, opt_state = init_train_state(pparams)
    loss_plain = float(loss_fn(params, TINY, ids, labels))
    step = jax.jit(make_pp_train_step(TINY, tx, mesh, n_micro=2, remat=True))
    _, _, loss = step(pparams, opt_state, ids, labels)
    np.testing.assert_allclose(float(loss), loss_plain, rtol=1e-5)
