"""Qwen2-VL path: M-RoPE parity vs transformers + merged-position gather."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "float32")

from sttm_tpu.models import qwen2, qwen2vl
from sttm_tpu.models.config import TINY_MROPE
from sttm_tpu.models.qwen2vl import (
    VIDEO_PAD_TOKEN_ID,
    VISION_START_TOKEN_ID,
    assemble_video_embeds,
    build_video_mrope_positions,
)
from sttm_tpu.runtime.generate import build_prefill
from sttm_tpu.runtime.reducer import ReducerSpec


def test_mrope_positions_match_transformers():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    cfg = Qwen2VLConfig(
        text_config=dict(
            vocab_size=152064, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_scaling=dict(type="mrope", mrope_section=[4, 6, 6]),
        ),
        vision_config=dict(depth=2, embed_dim=32, hidden_size=64, num_heads=2),
    )
    model = Qwen2VLForConditionalGeneration(cfg)

    t, h, w = 3, 2, 2  # llm grid (post spatial merge)
    pre = [101, 102, VISION_START_TOKEN_ID]
    vid = [VIDEO_PAD_TOKEN_ID] * (t * h * w)
    post = [103, 104, 105]
    ids = torch.tensor([pre + vid + post])
    sm = cfg.vision_config.spatial_merge_size
    grid = torch.tensor([[t, h * sm, w * sm]])
    ref_pos, ref_delta = model.model.get_rope_index(
        ids, video_grid_thw=grid, attention_mask=torch.ones_like(ids)
    )

    s_full = len(pre) + t * h * w + len(post)
    pos, delta = build_video_mrope_positions(len(pre), t, h, w, len(post), s_full)
    np.testing.assert_array_equal(np.asarray(pos), ref_pos[:, 0].numpy())
    assert delta == int(ref_delta[0])


def test_mrope_trunk_matches_transformers():
    """Our trunk with 3-row positions == HF Qwen2VL text model with the same
    position_ids and weights."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    cfg = Qwen2VLConfig(
        text_config=dict(
            vocab_size=TINY_MROPE.vocab_size, hidden_size=TINY_MROPE.hidden_size,
            intermediate_size=TINY_MROPE.intermediate_size,
            num_hidden_layers=TINY_MROPE.num_layers,
            num_attention_heads=TINY_MROPE.num_heads,
            num_key_value_heads=TINY_MROPE.num_kv_heads,
            rope_theta=TINY_MROPE.rope_theta,
            rms_norm_eps=TINY_MROPE.rms_eps,
            rope_scaling=dict(type="mrope", mrope_section=list(TINY_MROPE.mrope_section)),
            tie_word_embeddings=False,
        ),
        vision_config=dict(depth=2, embed_dim=32, hidden_size=TINY_MROPE.hidden_size, num_heads=2),
    )
    torch.manual_seed(0)
    hf = Qwen2VLForConditionalGeneration(cfg).eval()
    sd = {
        k: v.detach().numpy()
        for k, v in hf.state_dict().items()
        if not k.startswith("model.visual")
    }
    sd = { (k.replace("model.language_model.", "model.") if "language_model" in k else k): v
           for k, v in sd.items() }
    from sttm_tpu.models.weights import params_from_state_dict

    params = params_from_state_dict(TINY_MROPE, sd)

    rng = np.random.default_rng(0)
    s = 20
    ids = rng.integers(0, 200, size=(1, s))
    pos, _ = build_video_mrope_positions(4, 2, 2, 2, s - 4 - 8, s)
    with torch.no_grad():
        ref = hf.model(
            input_ids=torch.from_numpy(ids),
            position_ids=torch.from_numpy(np.asarray(pos))[:, None, :],
        ).last_hidden_state
        ref_logits = hf.lm_head(ref).numpy()

    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    prefill = build_prefill(TINY_MROPE, None, s, "xla")
    logits, _ = prefill(params, embeds, jnp.int32(s), jnp.int32(0), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(logits[0]), ref_logits[0, -1], rtol=3e-4, atol=3e-4)


def test_assemble_and_merged_position_gather():
    params = qwen2.init_params(TINY_MROPE, jax.random.key(0))
    t, h, w = 4, 2, 2
    nv = t * h * w
    pre = [7, 8, 9]
    post = [11, 12]
    ids = pre + [VIDEO_PAD_TOKEN_ID] * nv + post
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(nv, TINY_MROPE.hidden_size)), jnp.float32)
    s_full = 32
    embeds, valid, vstart, n_video = assemble_video_embeds(params, ids, feats, s_full)
    assert (valid, vstart, n_video) == (len(ids), 3, nv)
    np.testing.assert_allclose(np.asarray(embeds[0, 3 : 3 + nv]), np.asarray(feats), rtol=1e-6)

    pos, delta = build_video_mrope_positions(len(pre), t, h, w, len(post), s_full)
    # none-reducer with M-RoPE positions must reproduce the unmerged logits
    spec = ReducerSpec(kind="none", layer_idx=1, t=t, h=h, w=w)
    base = build_prefill(TINY_MROPE, None, s_full, "xla")
    ref_logits, ref_cache = base(params, embeds, jnp.int32(valid), jnp.int32(vstart), pos)
    fn = build_prefill(TINY_MROPE, spec, s_full, "xla")
    logits, cache = fn(params, embeds, jnp.int32(valid), jnp.int32(vstart), pos)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5)
    # decode position base includes the rope delta
    assert int(cache.pos_base) == valid + delta
