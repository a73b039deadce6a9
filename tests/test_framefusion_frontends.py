"""FrameFusion front-ends: explicit patch-type layouts (MiniCPM-V,
LLaVA-NeXT-Video) and their embed-assembly paths."""

import numpy as np

import jax
import jax.numpy as jnp

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY, VICUNA_7B
from sttm_tpu.models.llava_next_video import (
    VIDEO_TOKEN_INDEX,
    build_lnv_embeds,
    framefusion_spec_lnv,
    llava_next_video_token_types,
)
from sttm_tpu.models.minicpmv import (
    assemble_minicpmv_embeds,
    framefusion_spec_minicpmv,
    minicpmv_patch_types,
)
from sttm_tpu.runtime.framefusion import FrameFusionSpec, build_prefill_framefusion
from sttm_tpu.runtime.generate import GenerateConfig, generate


def _embeds(valid, s_full, d, seed=0, video=None):
    rng = np.random.default_rng(seed)
    emb = np.zeros((1, s_full, d), np.float32)
    emb[0, :valid] = rng.normal(size=(valid, d)) * 0.2
    if video is not None:
        vs, t, hw = video  # make same-patch tokens similar for heavy merging
        frame = rng.normal(size=(hw, d)) * 0.2
        emb[0, vs : vs + t * hw] = (
            frame[None] + 0.001 * rng.normal(size=(t, hw, d))
        ).reshape(t * hw, -1)
    return jnp.asarray(emb)


def test_explicit_patch_type_matches_geometry_layout():
    """An explicit position-within-frame patch-type stream over the same span
    must reproduce the geometry-mode (t, h, w) result exactly."""
    params = qwen2.init_params(TINY, jax.random.key(0))
    t, h, w = 6, 2, 2
    nv, vs = t * h * w, 5
    valid = vs + nv + 7
    s_full = 48
    emb = _embeds(valid, s_full, TINY.hidden_size, video=(vs, t, h * w))

    geo = FrameFusionSpec(cost=0.3, t=t, h=h, w=w)
    pt = np.full((s_full,), -1, np.int64)
    pt[vs : vs + nv] = np.tile(np.arange(h * w), t)  # raster: position-in-frame
    exp = FrameFusionSpec(cost=0.3, patch_type=tuple(int(v) for v in pt))

    f_geo = build_prefill_framefusion(TINY, geo, s_full)
    f_exp = build_prefill_framefusion(TINY, exp, s_full)
    lg, _, ag = f_geo(params, emb, jnp.int32(valid), jnp.int32(vs))
    le, _, ae = f_exp(params, emb, jnp.int32(valid), jnp.int32(vs))
    np.testing.assert_array_equal(np.asarray(ag), np.asarray(ae))
    np.testing.assert_allclose(np.asarray(lg), np.asarray(le), rtol=1e-6, atol=1e-6)


def test_minicpmv_patch_type_formula():
    """Reference formula incl. the +2 tail quirk and separator counting
    (modeling_minicpmv.py:92-104)."""
    # 2 frames x 2 slices, 4 tokens per slice, 1 separator between slices,
    # 2 separators between frames: frame stride = 4 + 1 + 4 + 2 = 11
    ib = np.array([[10, 14], [15, 19], [21, 25], [26, 30]])
    pt, patch_num, start, end, length = minicpmv_patch_types(40, ib, num_frames=2)
    assert patch_num == 11  # image_bound[2,0] - image_bound[0,0]
    assert start == 10
    assert end == 31  # last bound end 30 + 2 quirk - 1
    assert length == 22
    np.testing.assert_array_equal(pt[10:32], np.arange(22) % 11)
    assert (pt[:10] == -1).all() and (pt[32:] == -1).all()


def test_minicpmv_assemble_and_framefusion_generate():
    params = qwen2.init_params(TINY, jax.random.key(0))
    rng = np.random.default_rng(0)
    n_frames, q = 4, 6
    # frame i occupies [5 + 7i, 5 + 7i + 6); separator token after each
    ib = np.array([[5 + 7 * i, 5 + 7 * i + q] for i in range(n_frames)])
    s_full = 64
    valid = int(ib[-1, 1]) + 10
    ids = rng.integers(0, TINY.vocab_size, size=(valid,))
    # near-identical frames -> merging across frames at same patch position
    frame = rng.normal(size=(q, TINY.hidden_size)) * 0.2
    vis = frame[None] + 0.001 * rng.normal(size=(n_frames, q, TINY.hidden_size))

    emb, v = assemble_minicpmv_embeds(
        params, ids, vis.astype(np.float32), ib, s_full, dtype=jnp.float32
    )
    assert v == valid
    # vision rows actually landed at the bounds
    np.testing.assert_allclose(
        np.asarray(emb[0, ib[0, 0] : ib[0, 1]]), vis[0].astype(np.float32), rtol=1e-5, atol=1e-5
    )

    spec = framefusion_spec_minicpmv(0.3, s_full, ib, n_frames)
    assert spec.patch_num == 7 and spec.n_video == 7 * (n_frames - 1) + q + 2
    out, rt = generate(
        params, TINY, emb, valid, int(ib[0, 0]), spec,
        GenerateConfig(max_new_tokens=4, eos_token_ids=()),
    )
    assert len(out) == 4
    assert rt["merged_len"] < valid  # merging happened


def test_lnv_token_types_and_generate():
    tt = llava_next_video_token_types(20, video_start=4, n_frames=3, token_per_frame=4)
    np.testing.assert_array_equal(tt[4:16], np.arange(3).repeat(4))
    assert (tt[:4] == -1).all() and (tt[16:] == -1).all()

    cfg = TINY
    params = qwen2.init_params(cfg, jax.random.key(1))
    rng = np.random.default_rng(1)
    n_frames, tpf = 4, 6
    pre = rng.integers(0, cfg.vocab_size, size=(5,)).tolist()
    post = rng.integers(0, cfg.vocab_size, size=(7,)).tolist()
    ids = pre + [VIDEO_TOKEN_INDEX] + post
    # consecutive tokens within a frame similar -> within-frame merging under
    # the frame-index grouping convention
    tok = rng.normal(size=(1, cfg.hidden_size)) * 0.2
    video = (tok[None] + 0.001 * rng.normal(size=(n_frames, tpf, cfg.hidden_size))).reshape(
        n_frames * tpf, -1
    )
    s_full = 48
    emb, valid, vstart = build_lnv_embeds(params, ids, video.astype(np.float32), s_full, dtype=jnp.float32)
    assert vstart == len(pre) and valid == len(pre) + n_frames * tpf + len(post)

    spec = framefusion_spec_lnv(0.3, s_full, vstart, n_frames, tpf)
    assert spec.patch_num == n_frames
    out, rt = generate(
        params, cfg, emb, valid, vstart, spec,
        GenerateConfig(max_new_tokens=4, eos_token_ids=()),
    )
    assert len(out) == 4
    assert rt["merged_len"] < valid


def test_lnv_vicuna_trunk_config_smoke():
    """The LLaVA-NeXT-Video trunk is Llama-architecture (VICUNA_7B,
    attention_bias=False) — front-end + FrameFusion on a tiny Llama trunk."""
    import dataclasses

    cfg = dataclasses.replace(
        VICUNA_7B, num_layers=2, hidden_size=32, intermediate_size=64,
        num_heads=4, num_kv_heads=4, head_dim=8, vocab_size=128,
        dtype=jnp.float32,
    )
    params = qwen2.init_params(cfg, jax.random.key(2))
    assert "bq" not in params["layers"]  # no attention bias on this family
    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, size=(4,)).tolist() + [VIDEO_TOKEN_INDEX] + [5, 6]
    video = (rng.normal(size=(1, cfg.hidden_size)) * 0.2 + 0.001 * rng.normal(size=(6, cfg.hidden_size)))
    emb, valid, vstart = build_lnv_embeds(params, ids, video.astype(np.float32), 32, dtype=jnp.float32)
    spec = framefusion_spec_lnv(0.3, 32, vstart, 3, 2)
    out, rt = generate(params, cfg, emb, valid, vstart, spec, GenerateConfig(max_new_tokens=3, eos_token_ids=()))
    assert len(out) == 3 and rt["merged_len"] <= valid
