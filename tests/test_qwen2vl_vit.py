"""Qwen2-VL vision transformer parity vs transformers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "float32")

from sttm_tpu.models.qwen2vl_vit import QWEN2VL_VIT_TINY, load_vit_state_dict, vit_encode


def test_vit_matches_transformers():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    cfg = QWEN2VL_VIT_TINY
    hf_cfg = Qwen2VLConfig(
        text_config=dict(
            vocab_size=256, hidden_size=cfg.out_hidden_size, intermediate_size=64,
            num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
            rope_scaling=dict(type="mrope", mrope_section=[2, 3, 3]),
        ),
        vision_config=dict(
            depth=cfg.depth, embed_dim=cfg.embed_dim, num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio, hidden_size=cfg.out_hidden_size,
            patch_size=cfg.patch_size, temporal_patch_size=cfg.temporal_patch_size,
            spatial_merge_size=cfg.spatial_merge_size, in_chans=3,
            attn_implementation="eager",
        ),
    )
    torch.manual_seed(0)
    hf = Qwen2VLForConditionalGeneration(hf_cfg).eval()

    t, h, w = 3, 4, 6  # patch-grid units (pre-merge)
    n = t * h * w
    rng = np.random.default_rng(0)
    patches = rng.normal(size=(n, cfg.patch_dim)).astype(np.float32)
    grid = torch.tensor([[t, h, w]])
    with torch.no_grad():
        ref = hf.model.visual(torch.from_numpy(patches), grid_thw=grid).numpy()

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items() if "visual" in k}
    sd = {k.replace("model.visual.", "visual."): v for k, v in sd.items()}
    params = load_vit_state_dict(cfg, sd)
    got = vit_encode(params, cfg, jnp.asarray(patches), (t, h, w))
    assert got.shape == ref.shape == (n // 4, cfg.out_hidden_size)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=5e-4, atol=5e-4)
