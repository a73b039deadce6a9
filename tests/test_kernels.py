"""Pallas blocked cosine-similarity kernel (interpreter mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from sttm_tpu.ops.kernels import cosine_rows


def test_cosine_rows_interpret_matches_jnp():
    rng = np.random.default_rng(0)
    for n, c in [(300, 128), (256, 384), (7, 256)]:  # incl. row padding cases
        a = jnp.asarray(rng.normal(size=(n, c)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(n, c)), jnp.bfloat16)
        ref = np.asarray(cosine_rows(a, b, force="jnp"))
        got = np.asarray(cosine_rows(a, b, force="interpret"))
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_cosine_rows_nd_shapes():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(4, 6, 5, 128)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(4, 6, 5, 128)), jnp.float32)
    ref = np.asarray(cosine_rows(a, b, force="jnp"))
    got = np.asarray(cosine_rows(a, b, force="interpret"))
    assert got.shape == (4, 6, 5)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
