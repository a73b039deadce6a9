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


def test_splash_mha_interpret_matches_xla():
    """GQA splash path (interpret mode) matches the XLA reference attention,
    including padding masking via segment ids."""
    from sttm_tpu.ops.attention import _splash_mha, _xla_mha

    rng = np.random.default_rng(0)
    b, sq, hq, hkv, hd = 1, 256, 8, 2, 64
    q = jnp.asarray(rng.normal(size=(b, sq, hq, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, sq, hkv, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, sq, hkv, hd)), jnp.float32)
    valid = jnp.int32(200)
    sm_scale = hd**-0.5
    ref = _xla_mha(q, k, v, valid, True, 0, sm_scale)
    out = _splash_mha(q, k, v, valid, sm_scale, interpret=True,
                      block_q=128, block_kv=128)
    # only valid rows are meaningful (pad queries are segment-masked)
    np.testing.assert_allclose(
        np.asarray(out)[:, :200], np.asarray(ref)[:, :200], rtol=2e-3, atol=2e-3
    )

def test_splash_mha_kv_compute_subblock_matches():
    """The kv-compute sub-block (block_kv_compute < block_kv, the swept
    production config's shape) is numerically identical."""
    from sttm_tpu.ops.attention import _splash_mha, _xla_mha

    rng = np.random.default_rng(1)
    b, sq, hq, hkv, hd = 1, 256, 8, 2, 64
    q = jnp.asarray(rng.normal(size=(b, sq, hq, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, sq, hkv, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, sq, hkv, hd)), jnp.float32)
    valid = jnp.int32(256)
    sm_scale = hd**-0.5
    ref = _xla_mha(q, k, v, valid, True, 0, sm_scale)
    out = _splash_mha(q, k, v, valid, sm_scale, interpret=True,
                      block_q=128, block_kv=256, block_kv_compute=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)
