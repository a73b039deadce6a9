"""Profiling / tracing utilities.

The reference instruments latency with manual device-synchronized wall-clock
brackets inside its generation loop (llava_qwen.py:250-262) — our runtime
does the same (runtime/generate.py). This module adds the TPU-native extras:
jax.profiler trace capture (viewable in XProf/TensorBoard) and a simple
synchronized timer.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "sync_timer"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace around the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def sync_timer(result: dict, key: str):
    """Device-synchronized wall-clock bracket; adds seconds to result[key].

    Note: under remote-TPU tunnels, callers must fetch outputs to host to
    synchronize (see bench.py time_fn) — this timer only wraps the block.
    """
    t0 = time.perf_counter()
    yield
    result[key] = result.get(key, 0.0) + (time.perf_counter() - t0)
