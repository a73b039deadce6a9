"""Octree merger vs recursive NumPy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from sttm_tpu.ops.octree import octree_merge
from tests.oracles.octree_oracle import octree_oracle


@pytest.mark.parametrize(
    "t,side,thresh,root",
    [
        (16, 8, 0.35, 0),   # 2 full cubes
        (19, 8, 0.35, 0),   # remainder frames -> quadtree
        (14, 7, 0.4, 0),    # odd cube side (stripe pooling on 3 axes)
        (8, 8, 0.3, 1),     # non-default root level
        (3, 8, 0.4, 0),     # fewer frames than a cube -> pure quadtree
    ],
)
def test_octree_matches_oracle(t, side, thresh, root):
    rng = np.random.default_rng(t + side)
    base = rng.normal(size=(1, 1, 1, 8))
    video = (base + 0.75 * rng.normal(size=(t, side, side, 8))).astype(np.float32)
    keep, feat = octree_merge(jnp.asarray(video), thresh, root)
    ref_keep, ref_feats = octree_oracle(video.astype(np.float64), thresh, root)
    assert np.asarray(keep).tolist() == ref_keep.tolist()
    got = np.asarray(feat, np.float64)[np.asarray(keep)]
    np.testing.assert_allclose(got, np.stack(ref_feats), rtol=2e-4, atol=2e-4)
