"""Reference-parity sweep as a test: runs scripts/parity_sweep.py against the
actual torch reference when it is mounted (VERDICT r1 #7 — the parity evidence
must be reproducible from the repo, not from throwaway scripts).

Runs in a subprocess: the sweep sets global jax config (fp32 matmul
precision) that must not leak into other tests.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("STTM_REFERENCE", "/root/reference")


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_parity_sweep_regenerates_and_matches():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "parity_sweep.py")],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    result = json.load(open(os.path.join(REPO, "PARITY_SWEEP.json")))
    assert result["all_match"] is True
    assert len(result["cases"]) == 14  # quadtree sweep
    kinds = {e["kind"] for e in result["extras"]}
    assert {"tome", "dycoke", "octree", "framefusion-merge"} <= kinds
    # round-2 RLHF math vs the vendored TRL torch code
    assert {"trl-masked-whiten", "trl-ppo-loss"} <= kinds
    assert any(k.startswith("trl-compute-rewards") for k in kinds)
    assert any(k.startswith("trl-gae") for k in kinds)
