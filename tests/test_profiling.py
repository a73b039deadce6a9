"""Profiling utilities."""

import os

from sttm_tpu.utils.profiling import sync_timer, trace


def test_sync_timer():
    result = {}
    with sync_timer(result, "step"):
        sum(range(1000))
    assert result["step"] > 0


def test_trace_writes_profile(tmp_path):
    import jax.numpy as jnp

    with trace(str(tmp_path)):
        jnp.ones((8, 8)).sum().block_until_ready()
    # jax writes plugins/profile/<ts>/*.pb under the log dir
    found = any("profile" in r for r, d, f in os.walk(tmp_path) for _ in [0])
    assert found
