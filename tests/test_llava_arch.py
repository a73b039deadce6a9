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


# ---------------------------------------------------------------------------
# AnyRes / image / multi-image branches (llava_arch.py:365-527)
# ---------------------------------------------------------------------------


def _ref_mm_utils():
    """Import the reference's mm_utils with a stubbed llava.constants."""
    import importlib.util
    import os
    import sys
    import types

    ref = "/root/reference"
    if not os.path.isdir(ref):
        pytest.skip("reference not mounted")
    pkg = types.ModuleType("llava")
    const = types.ModuleType("llava.constants")
    const.IMAGE_TOKEN_INDEX = -200
    pkg.constants = const
    sys.modules.setdefault("llava", pkg)
    sys.modules["llava.constants"] = const
    spec = importlib.util.spec_from_file_location(
        "ref_mm_utils", os.path.join(ref, "llava", "mm_utils.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_anyres_geometry_matches_reference():
    from sttm_tpu.models.anyres import get_anyres_image_grid_shape, select_best_resolution

    ref = _ref_mm_utils()
    pinpoints = [[384, 384], [768, 384], [384, 768], [768, 768], [1152, 384], [384, 1152]]
    sizes = [(640, 480), (480, 640), (1920, 1080), (100, 900), (384, 384), (77, 13)]
    for s in sizes:
        assert select_best_resolution(s, [tuple(p) for p in pinpoints]) == tuple(
            ref.select_best_resolution(s, pinpoints)
        ), s
        assert get_anyres_image_grid_shape(s, pinpoints, 384) == tuple(
            ref.get_anyres_image_grid_shape(s, pinpoints, 384)
        ), s
    # range-string pinpoints ("(1x1),...,(3x3)")
    assert get_anyres_image_grid_shape((1000, 500), "(1x1),...,(3x3)", 384) == tuple(
        ref.get_anyres_image_grid_shape((1000, 500), "(1x1),...,(3x3)", 384)
    )


def test_unpad_image_matches_oracle():
    """unpad_image_hwd vs a direct NumPy transcription of the reference's
    [C, H, W] unpad_image (llava_arch.py:129-160)."""
    from sttm_tpu.models.anyres import unpad_image_hwd

    def oracle_chw(x, original_size):
        ow, oh = original_size
        ch, cw = x.shape[1], x.shape[2]
        if ow / oh > cw / ch:
            scale = cw / ow
            nh = int(oh * scale)
            pad = (ch - nh) // 2
            return x[:, pad : ch - pad, :]
        scale = ch / oh
        nw = int(ow * scale)
        pad = (cw - nw) // 2
        return x[:, :, pad : cw - pad]

    rng = np.random.default_rng(0)
    for (h, w), size in [((54, 54), (1000, 400)), ((54, 81), (400, 1000)),
                         ((27, 54), (640, 480)), ((54, 54), (384, 384))]:
        x = rng.normal(size=(h, w, 5)).astype(np.float32)
        ours = np.asarray(unpad_image_hwd(jnp.asarray(x), size))
        ref = oracle_chw(x.transpose(2, 0, 1), size).transpose(1, 2, 0)
        np.testing.assert_array_equal(ours, ref)


def test_assemble_anyres_image_tokens_layout():
    from sttm_tpu.models.anyres import assemble_anyres_image_tokens

    side, d = 6, 4
    p = side * side
    pinpoints = [[384, 384], [768, 384], [384, 768], [768, 768]]
    rng = np.random.default_rng(1)
    newline = jnp.asarray(rng.normal(size=(d,)), jnp.float32)

    # 1000x400 -> best fit 768x384 -> grid 2x1 (npw=2, nph=1) -> 2 tiles + base
    feats = jnp.asarray(rng.normal(size=(3, p, d)), jnp.float32)
    out = assemble_anyres_image_tokens(
        feats, (1000, 400), side, newline, "anyres", "spatial_unpad", pinpoints, 384
    )
    # unpad: grid 6 x 12, original aspect 2.5 > 2 -> crop rows to int(400*(12/1000))=4
    # -> pad (6-4)//2 = 1 -> rows 1..4 (4 rows), 12 cols + newline col
    assert out.shape == (p + 4 * 13, d)
    np.testing.assert_array_equal(np.asarray(out[:p]), np.asarray(feats[0]))  # base first
    # newline sits at each row end
    row = np.asarray(out[p : p + 13])
    np.testing.assert_array_equal(row[-1], np.asarray(newline))
    # first row of the unpadded map = tile0 row1 then tile1 row1
    grid = np.asarray(feats[1:]).reshape(1, 2, side, side, d)
    np.testing.assert_array_equal(row[:side], grid[0, 0, 1])
    np.testing.assert_array_equal(row[side:-1], grid[0, 1, 1])

    # nobase drops the base tile
    out_nb = assemble_anyres_image_tokens(
        feats, (1000, 400), side, newline, "anyres", "spatial_unpad_nobase", pinpoints, 384
    )
    assert out_nb.shape == (4 * 13, d)

    # single image (+unpad): feature + trailing newline
    one = assemble_anyres_image_tokens(
        feats[:1], (384, 384), side, newline, "anyres", "spatial_unpad", pinpoints, 384
    )
    assert one.shape == (p + 1, d)
    np.testing.assert_array_equal(np.asarray(one[-1]), np.asarray(newline))

    # anyres_max downscale triggers when tiles exceed the budget
    out_max = assemble_anyres_image_tokens(
        feats, (1000, 400), side, newline, "anyres_max_1", "spatial_unpad", pinpoints, 384
    )
    assert out_max.shape[0] < out.shape[0]

    # maxpool2x2 halves each side of the reassembled map
    out_mp = assemble_anyres_image_tokens(
        feats, (1000, 400), side, newline, "anyres", "spatial_maxpool2x2", pinpoints, 384
    )
    assert out_mp.shape == (p + (side // 2) * side, d)


def test_multi_image_splice():
    from sttm_tpu.models.llava import build_multimodal_embeds_multi

    cfg = LlavaConfig(decoder=TINY, vision_hidden_size=16, vision_patches_per_side=6)
    params = qwen2.init_params(TINY, __import__("jax").random.key(0))
    rng = np.random.default_rng(2)
    img1 = jnp.asarray(rng.normal(size=(5, TINY.hidden_size)), jnp.float32)
    img2 = jnp.asarray(rng.normal(size=(3, TINY.hidden_size)), jnp.float32)
    ids = [1, 2, IMAGE_TOKEN_INDEX, 3, IMAGE_TOKEN_INDEX, 4, 5]
    embeds, valid, spans = build_multimodal_embeds_multi(params, cfg, ids, [img1, img2], 32)
    assert valid == 2 + 5 + 1 + 3 + 2
    assert spans == [(2, 5), (8, 3)]
    e = np.asarray(embeds[0])
    np.testing.assert_array_equal(e[2:7], np.asarray(img1))
    np.testing.assert_array_equal(e[8:11], np.asarray(img2))
    txt = np.asarray(qwen2.embed_tokens(params, jnp.asarray([1, 2], jnp.int32)))
    np.testing.assert_array_equal(e[:2], txt)
    assert not e[valid:].any()

    with pytest.raises(ValueError):
        build_multimodal_embeds_multi(params, cfg, ids, [img1], 32)


def test_build_multimodal_embeds_gemma_scale():
    """Text embeddings in the multimodal splice carry Gemma's sqrt(hidden)
    embed scale — the same scaling decode steps apply (a mismatch would make
    prefill text embeds ~sqrt(D)x smaller than decode-step embeds)."""
    import jax

    from sttm_tpu.models.config import TINY_GEMMA

    cfg = LlavaConfig(decoder=TINY_GEMMA, vision_hidden_size=16, vision_patches_per_side=6)
    dec_params = qwen2.init_params(TINY_GEMMA, jax.random.key(0))
    mm_params = llava.init_multimodal_params(cfg, jax.random.key(1))
    rng = np.random.default_rng(3)
    vis = jnp.asarray(rng.normal(size=(2, 36, 16)).astype(np.float32))
    ids = [3, 5, 7, IMAGE_TOKEN_INDEX, 11, 13]
    embeds, valid, video_start, n_video = llava.build_multimodal_embeds(
        dec_params, cfg, mm_params, ids, vis, s_full=64
    )
    want = qwen2.embed_tokens(dec_params, jnp.asarray([3, 5, 7]), TINY_GEMMA)
    np.testing.assert_allclose(np.asarray(embeds[0, :3]), np.asarray(want), rtol=1e-6)
    # and the scale really is sqrt(hidden), not 1
    unscaled = qwen2.embed_tokens(dec_params, jnp.asarray([3, 5, 7]))
    assert not np.allclose(np.asarray(want), np.asarray(unscaled))
