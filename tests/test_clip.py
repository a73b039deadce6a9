"""CLIP vision tower parity vs transformers (select_layer=-2 surgery)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "float32")

from sttm_tpu.models.clip import CLIP_TINY, clip_encode, load_clip_state_dict


def _tiny_hf():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=CLIP_TINY.hidden_size,
        intermediate_size=CLIP_TINY.intermediate_size,
        num_hidden_layers=CLIP_TINY.num_layers + 1,  # select_layer=-2 drops one
        num_attention_heads=CLIP_TINY.num_heads,
        image_size=CLIP_TINY.image_size,
        patch_size=CLIP_TINY.patch_size,
        hidden_act="quick_gelu",
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return torch, CLIPVisionModel(hf_cfg).eval()


def test_clip_matches_transformers_select_layer_minus2():
    torch, hf = _tiny_hf()
    rng = np.random.default_rng(0)
    pix = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        out = hf.vision_model(torch.from_numpy(pix), output_hidden_states=True)
    # reference feature_select: hidden_states[-2], drop CLS
    # (clip_encoder.py:59-62)
    ref = out.hidden_states[-2][:, 1:].numpy()

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = load_clip_state_dict(CLIP_TINY, sd)
    got = clip_encode(params, CLIP_TINY, jnp.asarray(pix.transpose(0, 2, 3, 1)))
    assert got.shape == (2, CLIP_TINY.num_patches, CLIP_TINY.hidden_size)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-4, atol=3e-4)


def test_clip_cls_patch_keeps_cls():
    torch, hf = _tiny_hf()
    rng = np.random.default_rng(1)
    pix = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        out = hf.vision_model(torch.from_numpy(pix), output_hidden_states=True)
    ref = out.hidden_states[-2].numpy()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = load_clip_state_dict(CLIP_TINY, sd)
    got = clip_encode(
        params, CLIP_TINY, jnp.asarray(pix.transpose(0, 2, 3, 1)), select_feature="cls_patch"
    )
    assert got.shape == (1, CLIP_TINY.num_patches + 1, CLIP_TINY.hidden_size)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-4, atol=3e-4)
