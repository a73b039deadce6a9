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
