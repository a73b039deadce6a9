"""Golden tests: dense TPU-style STTM merge vs the NumPy recursive oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from sttm_tpu.ops.sttm import sttm_merge, compact_tokens
from tests.oracles.quadtree_oracle import sttm_oracle


def _run_both(feat, **kw):
    res = sttm_merge(jnp.asarray(feat, jnp.float32), **kw)
    keep = np.asarray(res.keep)
    ids = np.nonzero(keep)[0]
    feats = np.asarray(res.feat, np.float64)[ids]
    npatch = np.asarray(res.num_patch)[ids]
    oracle = sttm_oracle(feat.astype(np.float64), kw.get("spatial_thresh", 0.0),
                         kw.get("temporal_thresh", -1.0), kw.get("root_level", 0),
                         kw.get("weighted_avg", False), kw.get("head_dim"))
    return ids, feats, npatch, oracle


def _check(feat, **kw):
    # map kw names: sttm_merge uses positional-ish names
    ids, feats, npatch, oracle = _run_both(feat, **kw)
    o_ids = np.array([o[0] for o in oracle])
    assert ids.tolist() == o_ids.tolist(), (
        f"kept-token sets differ: dense {len(ids)} vs oracle {len(o_ids)}"
    )
    o_np = np.array([o[2] for o in oracle])
    np.testing.assert_array_equal(npatch, o_np)
    o_feat = np.stack([o[1] for o in oracle])
    np.testing.assert_allclose(feats, o_feat, rtol=2e-4, atol=2e-4)


CASES = [
    dict(shape=(4, 8, 8, 8), spatial_thresh=0.3, root_level=0),
    dict(shape=(5, 14, 14, 8), spatial_thresh=0.4, root_level=1),
    dict(shape=(3, 7, 7, 8), spatial_thresh=0.5, root_level=0),
    dict(shape=(3, 5, 6, 8), spatial_thresh=0.2, root_level=0),
    dict(shape=(4, 14, 14, 8), spatial_thresh=0.4, root_level=1, temporal_thresh=0.25),
    dict(shape=(6, 8, 8, 8), spatial_thresh=0.35, root_level=0, temporal_thresh=0.3),
    dict(shape=(3, 7, 9, 8), spatial_thresh=0.3, root_level=0, temporal_thresh=0.2),
    dict(shape=(4, 8, 8, 8), spatial_thresh=0.3, root_level=0, temporal_thresh=0.3,
         weighted_avg=True),
    dict(shape=(4, 8, 8, 16), spatial_thresh=0.35, root_level=0, temporal_thresh=0.25,
         head_dim=4),
    # root at leaf level (temporal-only merging)
    dict(shape=(4, 4, 4, 8), spatial_thresh=0.5, root_level=-1, temporal_thresh=0.2),
]


@pytest.mark.parametrize("case", CASES)
def test_sttm_matches_oracle(case):
    case = dict(case)
    shape = case.pop("shape")
    rng = np.random.default_rng(hash(str(sorted(case.items()))) % 2**31)
    # correlated features so merges actually happen at moderate thresholds
    base = rng.normal(size=(1, 1, 1, shape[-1]))
    feat = (base + 0.8 * rng.normal(size=shape)).astype(np.float32)
    _check(feat, **case)


def test_extremes():
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(3, 8, 8, 8)).astype(np.float32)
    # threshold so low everything merges spatially to the root level
    _check(feat, spatial_thresh=-2.0, root_level=0)
    # threshold above any cosine: every leaf survives
    _check(feat, spatial_thresh=1.5, root_level=0)
    # identical frames: temporal merging collapses across all frames
    one = rng.normal(size=(1, 8, 8, 8)).astype(np.float32)
    feat = np.repeat(one, 4, axis=0)
    _check(feat, spatial_thresh=1.5, root_level=0, temporal_thresh=0.99)


def test_compact_tokens():
    keep = jnp.asarray(np.array([1, 0, 1, 1, 0, 1], bool))
    x = jnp.arange(6, dtype=jnp.float32)[:, None] * 10
    n_kept, src_idx, packed = compact_tokens(keep, 4, x)
    assert int(n_kept) == 4
    assert np.asarray(src_idx).tolist() == [0, 2, 3, 5]
    assert np.asarray(packed)[:, 0].tolist() == [0.0, 20.0, 30.0, 50.0]
    # budget smaller than kept count: raster-last tokens dropped
    n_kept, src_idx, packed = compact_tokens(keep, 3, x)
    assert int(n_kept) == 3
    assert np.asarray(src_idx).tolist() == [0, 2, 3]


def test_t_valid_equals_truncated_run():
    """Padding frames + t_valid must give exactly the truncated video's merge."""
    rng = np.random.default_rng(3)
    t_real, t_pad, h, w, c = 6, 8, 8, 8, 8
    base = rng.normal(size=(1, 1, 1, c))
    vid = (base + 0.8 * rng.normal(size=(t_real, h, w, c))).astype(np.float32)
    padded = np.concatenate([vid, np.repeat(vid[-1:], t_pad - t_real, 0)], 0)

    ref = sttm_merge(jnp.asarray(vid), 0.4, 0.3, root_level=0)
    got = sttm_merge(jnp.asarray(padded), 0.4, 0.3, root_level=0, t_valid=jnp.int32(t_real))

    ref_ids = np.nonzero(np.asarray(ref.keep))[0]
    got_ids = np.nonzero(np.asarray(got.keep))[0]
    assert ref_ids.tolist() == got_ids.tolist()
    np.testing.assert_array_equal(
        np.asarray(ref.num_patch)[ref_ids], np.asarray(got.num_patch)[got_ids]
    )
    np.testing.assert_allclose(
        np.asarray(ref.feat)[ref_ids], np.asarray(got.feat)[got_ids], rtol=1e-6
    )
