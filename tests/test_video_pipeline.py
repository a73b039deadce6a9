"""Video preprocessing: frame sampling, smart_resize, patchify-vs-HF parity,
and the end-to-end extraction CLI on a synthetic clip."""

import os
import pickle

import numpy as np
import pytest

from sttm_tpu import native
from sttm_tpu.data.video import qwen2vl_patchify, sample_frame_times, smart_resize


def test_sample_frame_times():
    times, s = sample_frame_times(10.0, 1.0, 128)
    assert len(times) == 10 and s.startswith("0.00s,1.00s")
    times, _ = sample_frame_times(300.0, 1.0, 128)  # capped + uniform
    assert len(times) == 128
    assert times[-1] < 300.0


def test_smart_resize():
    h, w = smart_resize(480, 640)
    assert h % 28 == 0 and w % 28 == 0
    h, w = smart_resize(2000, 2000, max_pixels=1280 * 28 * 28)
    assert h * w <= 1280 * 28 * 28


def test_patchify_matches_hf_processor():
    pytest.importorskip("torch")
    from transformers import Qwen2VLImageProcessor

    rng = np.random.default_rng(0)
    t, hh, ww = 4, 56, 84  # already 28-multiples
    frames = rng.integers(0, 255, size=(t, hh, ww, 3), dtype=np.uint8)
    proc = Qwen2VLImageProcessor(do_resize=False)
    # deprecated-but-present video path (Qwen2VLVideoProcessor needs
    # torchvision, absent here)
    out = proc.preprocess(images=None, videos=[list(frames)], return_tensors="np")
    ref_patches = np.asarray(out["pixel_values_videos"])
    ref_grid = tuple(int(v) for v in np.asarray(out["video_grid_thw"])[0])

    mean = np.array(proc.image_mean, np.float32)
    std = np.array(proc.image_std, np.float32)
    px = ((frames.astype(np.float32) / 255.0) - mean) / std
    patches, grid = qwen2vl_patchify(px)
    assert tuple(ref_grid) == grid
    np.testing.assert_allclose(patches, ref_patches, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not native.available(), reason="native decoder unavailable")
def test_extract_features_cli_llava(tmp_path, monkeypatch):
    """Full extraction flow on a synthetic clip with a tiny SigLIP."""
    import jax

    from sttm_tpu.eval import extract_features as ef
    from sttm_tpu.models import siglip as sig

    vids = tmp_path / "videos"
    vids.mkdir()
    native.encode_test_video(str(vids / "clip_a.mp4"), n=24, w=64, h=48, fps=8)

    tiny = sig.SIGLIP_TINY
    monkeypatch.setattr(sig, "SIGLIP_SO400M", tiny)
    monkeypatch.setattr(ef, "extract_llava", ef.extract_llava)
    params = sig.init_siglip_params(tiny, jax.random.key(0))
    monkeypatch.setattr(sig, "load_siglip_state_dict", lambda cfg, tensors: params)

    tower = tmp_path / "tower"
    tower.mkdir()
    # one dummy safetensors shard so the loader path executes
    from safetensors.numpy import save_file

    save_file({"dummy": np.zeros(1, np.float32)}, str(tower / "model.safetensors"))

    out = tmp_path / "cache"
    ef.main([
        "--model_family", "llava", "--tower_path", str(tower),
        "--video_dir", str(vids), "--out_dir", str(out),
        "--frames_upbound", "8", "--tgt_video_fps", "2", "--chunk", "4",
    ])
    feats = np.load(out / "features" / "clip_a.npy")
    # ~3s clip at 2 fps; container duration rounding may drop one frame
    assert feats.shape[0] in (5, 6)
    assert feats.shape[1:] == (tiny.num_patches, tiny.hidden_size)
    with open(out / "metadata" / "clip_a.pkl", "rb") as fp:
        meta = pickle.load(fp)
    assert meta["num_frames"] == feats.shape[0] and "frame_time" in meta
    # resume: second run skips
    ef.main([
        "--model_family", "llava", "--tower_path", str(tower),
        "--video_dir", str(vids), "--out_dir", str(out),
        "--frames_upbound", "8", "--tgt_video_fps", "2", "--chunk", "4",
    ])


def test_smart_nframes():
    from sttm_tpu.data.video import smart_nframes

    # 60s @ 30fps video, 2fps target -> 120 frames
    assert smart_nframes(1800, 30.0) == 120
    # long video capped at 768
    assert smart_nframes(30000, 30.0) == 768
    # short video clamped up to min 4
    assert smart_nframes(30, 30.0) == 4
    # explicit nframes rounded to the 2-frame factor
    assert smart_nframes(1000, 30.0, nframes=33) == 32
