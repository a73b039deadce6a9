"""Native libav video decoder: encode a synthetic clip, decode it back."""

import numpy as np
import pytest

from sttm_tpu import native


@pytest.mark.skipif(not native.available(), reason=f"native build failed: {native.build_error()}")
def test_roundtrip(tmp_path):
    path = str(tmp_path / "clip.mp4")
    native.encode_test_video(path, n=30, w=64, h=48, fps=10)

    info = native.probe(path)
    assert info["width"] == 64 and info["height"] == 48
    assert 2.5 <= info["duration"] <= 3.5
    assert abs(info["fps"] - 10) < 0.5

    frames, ts = native.decode_uniform(path, 8, 32, 32)
    assert frames.shape == (8, 32, 32, 3)
    assert frames.dtype == np.uint8
    # timestamps monotonically nondecreasing, roughly uniform
    assert (np.diff(ts) >= -1e-9).all()
    assert ts[-1] > ts[0]
    # moving bars: frames differ over time
    assert np.abs(frames[0].astype(int) - frames[-1].astype(int)).mean() > 2

    frames2, ts2 = native.decode_at(path, [0.0, 1.0, 2.0], 64, 48)
    assert frames2.shape == (3, 48, 64, 3)  # (n, out_h, out_w, 3)
    assert ts2[1] >= 0.9
