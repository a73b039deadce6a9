"""LLaVA pipeline parity: pooling vs torch bilinear, newline layout, splice."""

import numpy as np
import pytest

import jax.numpy as jnp

from sttm_tpu.models import llava, qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.models.llava import IMAGE_TOKEN_INDEX, LlavaConfig


def test_pool2d_bilinear_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    t, side, d = 3, 27, 8
    x = rng.normal(size=(t, side * side, d)).astype(np.float32)
    got = np.asarray(llava.pool_2d(jnp.asarray(x), side, 2, "bilinear"))
    tv = torch.from_numpy(x).view(t, side, side, d).permute(0, 3, 1, 2)
    ref = F.interpolate(tv, size=(14, 14), mode="bilinear").permute(0, 2, 3, 1).reshape(t, 196, d)
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_newline_policies():
    rng = np.random.default_rng(1)
    t, side, d = 2, 3, 4
    feats = jnp.asarray(rng.normal(size=(t, side * side, d)).astype(np.float32))
    nl = jnp.asarray(np.arange(d, dtype=np.float32) + 100)

    assert llava.apply_newline_policy(feats, side, nl, "no_token").shape == (t * 9, d)
    one = llava.apply_newline_policy(feats, side, nl, "one_token")
    assert one.shape == (t * 9 + 1, d)
    np.testing.assert_array_equal(np.asarray(one[-1]), np.asarray(nl))
    fr = llava.apply_newline_policy(feats, side, nl, "frame")
    assert fr.shape == (t * 10, d)
    np.testing.assert_array_equal(np.asarray(fr[9]), np.asarray(nl))
    gr = llava.apply_newline_policy(feats, side, nl, "grid")
    assert gr.shape == (t * side * (side + 1), d)
    # newline at the end of each row
    grid = np.asarray(gr).reshape(t, side, side + 1, d)
    np.testing.assert_array_equal(grid[:, :, -1], np.broadcast_to(np.asarray(nl), (t, side, d)))
    np.testing.assert_allclose(grid[:, :, :-1].reshape(t, 9, d), np.asarray(feats))


def test_build_multimodal_embeds_layout():
    import jax

    cfg = LlavaConfig(decoder=TINY, vision_hidden_size=16, vision_patches_per_side=6)
    dec_params = qwen2.init_params(TINY, jax.random.key(0))
    mm_params = llava.init_multimodal_params(cfg, jax.random.key(1))
    rng = np.random.default_rng(2)
    t = 4
    vis = jnp.asarray(rng.normal(size=(t, 36, 16)).astype(np.float32))
    ids = [3, 5, 7, IMAGE_TOKEN_INDEX, 11, 13]
    embeds, valid, video_start, n_video = llava.build_multimodal_embeds(
        dec_params, cfg, mm_params, ids, vis, s_full=64
    )
    assert video_start == 3
    assert n_video == t * 9  # 6x6 pooled to 3x3
    assert valid == 3 + n_video + 2
    assert embeds.shape == (1, 64, TINY.hidden_size)
    # text embeds in place
    np.testing.assert_allclose(
        np.asarray(embeds[0, :3]),
        np.asarray(qwen2.embed_tokens(dec_params, jnp.asarray([3, 5, 7]))),
    )
    np.testing.assert_allclose(
        np.asarray(embeds[0, 3 + n_video : valid]),
        np.asarray(qwen2.embed_tokens(dec_params, jnp.asarray([11, 13]))),
    )
    # padding zeroed
    assert np.abs(np.asarray(embeds[0, valid:])).max() == 0


def test_projector_depths():
    import jax

    from sttm_tpu.models.llava import LlavaConfig

    for ptype, depth in [("mlp2x_gelu", 2), ("mlp3x_gelu", 3), ("linear", 1)]:
        cfg = LlavaConfig(decoder=TINY, vision_hidden_size=16, projector_type=ptype)
        assert cfg.projector_depth == depth
        mm = llava.init_multimodal_params(cfg, jax.random.key(0))
        assert sum(1 for k in mm if k.startswith("proj_w")) == depth
        x = jnp.ones((2, 4, 16), jnp.float32)
        out = llava.project_features(mm, x)
        assert out.shape == (2, 4, TINY.hidden_size)
