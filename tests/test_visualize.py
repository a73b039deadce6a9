"""Visualization metadata: partition + grouping invariants."""

import numpy as np

from sttm_tpu.eval.visualize import quadtree_node_metadata, render_overlays


def test_node_metadata_partitions_video():
    rng = np.random.default_rng(0)
    t, h, w = 4, 8, 8
    base = rng.normal(size=(1, 1, 1, 8))
    video = (base + 0.8 * rng.normal(size=(t, h, w, 8))).astype(np.float32)
    meta = quadtree_node_metadata(video, 0.4, 0.3, root_level=0)

    # every leaf covered exactly once across all member boxes
    cover = np.zeros((t, h, w), int)
    for dst, boxes in meta.items():
        assert dst in {ti * h * w + top * w + left for (ti, top, left, _, _) in boxes}
        for (ti, top, left, bot, right) in boxes:
            cover[ti, top:bot, left:right] += 1
    assert (cover == 1).all()

    frames = rng.integers(0, 255, size=(t, 64, 64, 3), dtype=np.uint8)
    out = render_overlays(frames, meta, (h, w))
    assert out.shape == frames.shape
    assert (out != frames).any()
