"""Golden tests: static-shape ToMe / DyCoke vs NumPy oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from sttm_tpu.ops.dycoke import dycoke_output_len, dycoke_ttm
from sttm_tpu.ops.tome import tome_merge, tome_schedule
from tests.oracles.baseline_oracles import dycoke_oracle, tome_oracle


def test_tome_schedule():
    assert sum(tome_schedule(196, 0.5)) == 196 - 98
    assert sum(tome_schedule(196, 0.85)) == 196 - 30
    assert tome_schedule(10, 0.0) == [0]


@pytest.mark.parametrize("per", ["frame", "video"])
@pytest.mark.parametrize("ratio", [0.5, 0.7, 0.85])
def test_tome_matches_oracle(per, ratio):
    rng = np.random.default_rng(7)
    t, p, c = 6, 25, 16
    x = rng.normal(size=(t, p, c)).astype(np.float32)
    got_f, got_i = tome_merge(jnp.asarray(x), ratio, n_head=4, per=per)
    exp_f, exp_i = tome_oracle(x, ratio, n_head=4, per=per)
    assert np.asarray(got_i).tolist() == exp_i.tolist()
    np.testing.assert_allclose(np.asarray(got_f, np.float64), exp_f, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("t", [8, 9, 12])
@pytest.mark.parametrize("ratio", [0.7, 0.925])
def test_dycoke_matches_oracle(t, ratio):
    rng = np.random.default_rng(t)
    p, c = 36, 16
    x = rng.normal(size=(t * p, c)).astype(np.float32)
    got_f, got_i = dycoke_ttm(jnp.asarray(x), t, ratio)
    exp_f, exp_i = dycoke_oracle(x, t, ratio)
    assert got_f.shape[0] == dycoke_output_len(t, p, ratio)
    assert np.asarray(got_i).tolist() == exp_i.tolist()
    np.testing.assert_allclose(np.asarray(got_f, np.float64), exp_f, rtol=2e-4, atol=2e-4)
