"""NaViT SigLIP tower (MiniCPM-V vpm): parity vs HF Idefics2VisionTransformer
(the same NaViT-SigLIP architecture) and degeneracy vs the plain tower."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "float32")

from sttm_tpu.models.navit_siglip import (
    NAVIT_SIGLIP_TINY,
    NavitSiglipConfig,
    init_navit_siglip_params,
    load_navit_siglip_state_dict,
    navit_position_ids,
    navit_siglip_encode,
    pack_image_patches,
)


def test_navit_position_ids_full_grid_is_identity():
    # tgt == native grid -> buckets are the identity raster
    cfg = NAVIT_SIGLIP_TINY  # side 4
    ids = navit_position_ids(cfg, jnp.asarray([[4, 4]], jnp.int32), 16)
    np.testing.assert_array_equal(np.asarray(ids[0]), np.arange(16))


def test_navit_position_ids_matches_torch_bucketize():
    torch = pytest.importorskip("torch")
    cfg = NavitSiglipConfig(num_patches_per_side=7)
    side = 7
    for th, tw in [(3, 5), (7, 2), (1, 1), (6, 7), (7, 7)]:
        ids = np.asarray(navit_position_ids(cfg, jnp.asarray([[th, tw]], jnp.int32), th * tw)[0])
        # torch reference formula (MiniCPM-V 2.6 modeling_navit_siglip)
        boundaries = torch.arange(1 / side, 1.0, 1 / side)
        h_idx = torch.arange(0, 1 - 1e-6, 1 / th)
        w_idx = torch.arange(0, 1 - 1e-6, 1 / tw)
        bh = torch.bucketize(h_idx, boundaries, right=True)
        bw = torch.bucketize(w_idx, boundaries, right=True)
        want = (bh[:, None] * side + bw).flatten().numpy()
        np.testing.assert_array_equal(ids, want, err_msg=f"tgt=({th},{tw})")


def test_navit_degenerates_to_plain_siglip():
    from sttm_tpu.models.siglip import SIGLIP_TINY, init_siglip_params, siglip_encode

    # same param layout: run the identical pytree through both towers
    params = init_siglip_params(SIGLIP_TINY, jax.random.key(0))
    cfg = NavitSiglipConfig(
        hidden_size=32, intermediate_size=64, num_layers=2, num_heads=4,
        patch_size=14, num_patches_per_side=2, dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    want = np.asarray(siglip_encode(params, SIGLIP_TINY, jnp.asarray(img)))

    packed = np.stack([pack_image_patches(img[i], 14)[0] for i in range(2)])
    tgt = jnp.asarray([[2, 2], [2, 2]], jnp.int32)
    got = np.asarray(navit_siglip_encode(params, cfg, jnp.asarray(packed), tgt))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_navit_padding_invariance():
    cfg = NAVIT_SIGLIP_TINY
    params = init_navit_siglip_params(cfg, jax.random.key(1))
    rng = np.random.default_rng(1)
    th, tw = 3, 2
    patches = rng.normal(size=(1, th * tw, 3 * 14 * 14)).astype(np.float32)
    tgt = jnp.asarray([[th, tw]], jnp.int32)
    out_tight = np.asarray(navit_siglip_encode(params, cfg, jnp.asarray(patches), tgt))
    # pad with garbage rows — valid outputs must not move
    pad = rng.normal(size=(1, 5, 3 * 14 * 14)).astype(np.float32) * 10
    padded = np.concatenate([patches, pad], axis=1)
    out_pad = np.asarray(navit_siglip_encode(params, cfg, jnp.asarray(padded), tgt))
    np.testing.assert_allclose(out_pad[:, : th * tw], out_tight, rtol=1e-5, atol=1e-5)


def test_navit_matches_idefics2_vision_transformer():
    torch = pytest.importorskip("torch")
    from transformers.models.idefics2.configuration_idefics2 import Idefics2VisionConfig
    from transformers.models.idefics2.modeling_idefics2 import Idefics2VisionTransformer

    torch.manual_seed(0)
    # side 5 with grids (4,3)/(2,4): no fractional coord k/nb lands exactly
    # on a m/5 boundary, where our MiniCPM-V tie-goes-up formula and the
    # newer Idefics2 (1-1e-6)-scaled formula diverge (see navit_position_ids)
    H, P, SIDE = 32, 14, 5
    tcfg = Idefics2VisionConfig(
        hidden_size=H, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=SIDE * P, patch_size=P,
    )
    ref = Idefics2VisionTransformer(tcfg).eval().float()

    cfg = NavitSiglipConfig(
        hidden_size=H, intermediate_size=64, num_layers=2, num_heads=4,
        patch_size=P, num_patches_per_side=SIDE, dtype=jnp.float32,
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = load_navit_siglip_state_dict(cfg, sd, prefix="")

    # two samples with different sub-grids inside the 4x4 padded canvas
    rng = np.random.default_rng(0)
    grids = [(4, 3), (2, 4)]
    dense = np.zeros((2, SIDE * P, SIDE * P, 3), np.float32)
    for i, (th, tw) in enumerate(grids):
        dense[i, : th * P, : tw * P] = rng.normal(size=(th * P, tw * P, 3))

    # torch: dense NCHW image + rectangular patch mask
    px = torch.from_numpy(dense.transpose(0, 3, 1, 2))
    mask = torch.zeros(2, SIDE, SIDE, dtype=torch.bool)
    for i, (th, tw) in enumerate(grids):
        mask[i, :th, :tw] = True
    with torch.no_grad():
        want_dense = ref(px, patch_attention_mask=mask).last_hidden_state.numpy()

    # jax: packed patches + tgt_sizes
    n_max = SIDE * SIDE
    packed = np.zeros((2, n_max, 3 * P * P), np.float32)
    for i, (th, tw) in enumerate(grids):
        pp, _ = pack_image_patches(dense[i, : th * P, : tw * P], P)
        packed[i, : th * tw] = pp
    tgt = jnp.asarray(grids, jnp.int32)
    got = np.asarray(navit_siglip_encode(params, cfg, jnp.asarray(packed), tgt))

    for i, (th, tw) in enumerate(grids):
        # valid positions of the dense grid in row-major order == packed order
        sel = mask[i].flatten().numpy()
        np.testing.assert_allclose(
            got[i, : th * tw], want_dense[i][sel], rtol=2e-5, atol=2e-5,
            err_msg=f"sample {i} grid {(th, tw)}",
        )
