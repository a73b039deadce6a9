"""SigLIP tower parity vs transformers (with the reference's layer surgery)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "float32")

from sttm_tpu.models.siglip import SIGLIP_TINY, load_siglip_state_dict, siglip_encode


def test_siglip_matches_transformers_with_surgery():
    torch = pytest.importorskip("torch")
    from transformers import SiglipVisionConfig, SiglipVisionModel

    hf_cfg = SiglipVisionConfig(
        hidden_size=SIGLIP_TINY.hidden_size,
        intermediate_size=SIGLIP_TINY.intermediate_size,
        num_hidden_layers=SIGLIP_TINY.num_layers + 1,  # last layer gets dropped
        num_attention_heads=SIGLIP_TINY.num_heads,
        image_size=SIGLIP_TINY.image_size,
        patch_size=SIGLIP_TINY.patch_size,
        hidden_act="gelu_pytorch_tanh",
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = SiglipVisionModel(hf_cfg).eval()
    # reference surgery: drop last encoder layer, no pooling head
    del hf.vision_model.encoder.layers[-1:]

    rng = np.random.default_rng(0)
    pix = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = hf.vision_model(torch.from_numpy(pix)).last_hidden_state.numpy()

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = load_siglip_state_dict(SIGLIP_TINY, sd)
    got = siglip_encode(params, SIGLIP_TINY, jnp.asarray(pix.transpose(0, 2, 3, 1)))
    assert got.shape == (2, 4, SIGLIP_TINY.hidden_size)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-4, atol=3e-4)
