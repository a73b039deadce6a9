import os

# Tests run on CPU with a virtual 8-device mesh so no TPU is needed
# (SURVEY.md §4: the reference has no tests; jax's CPU backend is our
# substitute for a fake backend).
#
# The container's sitecustomize registers an 'axon' remote-TPU backend at
# interpreter startup and forces JAX_PLATFORMS=axon, so setdefault is not
# enough — override the platform selection explicitly before any test runs.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402

# XLA:CPU's LLVM backend segfaulted deterministically (rc=139, three full-
# suite runs on 2026-08-19) while compiling a quadtree program in
# tests/test_sttm_merge.py after ~250 programs had been compiled in the
# process — the same case compiles fine in a fresh process or a half-suite
# run. Dropping the accumulated executables before each new test MODULE
# keeps the compiler's working set bounded; per-module granularity costs a
# few recompiles of shared TINY programs, not a per-test recompile storm.
_last_module = [None]


@pytest.fixture(autouse=True)
def _compiler_pressure_relief(request):
    mod = getattr(request, "module", None)
    name = getattr(mod, "__name__", None)
    if name is not None and name != _last_module[0]:
        if _last_module[0] is not None:
            jax.clear_caches()
        _last_module[0] = name
    yield
