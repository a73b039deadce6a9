"""Front-end parity vs the ACTUAL reference torch hooks (when mounted):
MiniCPM-V's get_vllm_embedding (embed scatter + patch-type stream) and
LLaVA-NeXT-Video's _merge_input_ids_with_image_features (embed merge +
token-type stream)."""

import importlib.util
import os
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "float32")

REFERENCE = os.environ.get("STTM_REFERENCE", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference not mounted"
)


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REFERENCE, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_minicpmv_scatter_and_patch_types_match_reference():
    torch = pytest.importorskip("torch")
    mod = _load("llava/model/framefusion/models/minicpmv/modeling_minicpmv.py", "ref_minicpmv")

    vocab, d, n_frames, q = 64, 16, 4, 6
    rng = np.random.default_rng(0)
    ib = np.array([[5 + 7 * i, 5 + 7 * i + q] for i in range(n_frames)])
    seq_len = int(ib[-1, 1]) + 8
    ids = rng.integers(0, vocab, size=(1, seq_len))
    vis = rng.normal(size=(n_frames, q, d)).astype(np.float32)

    # fake model: embed table + framefusion.prepare capture; vision tower is
    # skipped because data provides vision_hidden_states (:67-68)
    captured = {}

    class FF:
        def prepare(self, patch_type, patch_num, start, end, length, orig):
            captured.update(
                patch_type=patch_type.numpy()[0], patch_num=int(patch_num),
                start=int(start), end=int(end), length=int(length), orig=int(orig),
            )

    torch.manual_seed(0)
    embed = torch.nn.Embedding(vocab, d)
    self = types.SimpleNamespace(
        llm=types.SimpleNamespace(
            model=types.SimpleNamespace(embed_tokens=embed),
            config=types.SimpleNamespace(),  # no scale_emb (Qwen2-based 2.6)
        ),
        config=types.SimpleNamespace(vision_batch_size=8),
        num_frames=n_frames,
        framefusion=FF(),
    )
    data = {
        "input_ids": torch.from_numpy(ids),
        "image_bound": [torch.from_numpy(ib)],
        "vision_hidden_states": [torch.from_numpy(vis)],
    }
    ref_emb, _ = mod.get_vllm_embedding(self, data)
    ref_emb = ref_emb.detach().numpy()[0]

    from sttm_tpu.models.minicpmv import assemble_minicpmv_embeds, minicpmv_patch_types

    params = {"embed": jnp.asarray(embed.weight.detach().numpy())}
    got_emb, valid = assemble_minicpmv_embeds(
        params, ids[0], vis, ib, seq_len, dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(got_emb[0, :valid]), ref_emb, rtol=1e-6, atol=1e-6)

    pt, patch_num, start, end, length = minicpmv_patch_types(seq_len, ib, n_frames)
    np.testing.assert_array_equal(pt, captured["patch_type"])
    assert patch_num == captured["patch_num"]
    assert (start, end, length) == (captured["start"], captured["end"], captured["length"])
    assert captured["orig"] == seq_len


def test_lnv_merge_and_token_types_match_reference():
    torch = pytest.importorskip("torch")
    mod = _load(
        "llava/model/framefusion/models/llava_next_video/modeling_llava_next_video.py",
        "ref_lnv",
    )

    vocab, d, n_frames, tpf = 64, 16, 3, 4
    video_token = vocab  # sentinel id outside the embed range is fine for ==
    rng = np.random.default_rng(1)
    pre = rng.integers(0, vocab, size=(5,)).tolist()
    post = rng.integers(0, vocab, size=(7,)).tolist()
    ids = np.asarray([pre + [video_token] + post])
    n_video = n_frames * tpf
    feats = rng.normal(size=(n_video, d)).astype(np.float32)

    torch.manual_seed(1)
    embed = torch.nn.Embedding(vocab + 1, d)
    self = types.SimpleNamespace(
        config=types.SimpleNamespace(image_token_index=video_token, ignore_index=-100),
        padding_side="left",
        training=False,
        pad_token_id=0,
        vision_tower=types.SimpleNamespace(
            vision_model=types.SimpleNamespace(
                embeddings=types.SimpleNamespace(num_patches=tpf * 4)
            )
        ),
        vision_resampler=types.SimpleNamespace(pool=types.SimpleNamespace(kernel_size=2)),
    )
    with torch.no_grad():
        # embed with the video sentinel present (the reference embeds the raw
        # ids; the placeholder row is overwritten by image features)
        inputs_embeds = embed(torch.from_numpy(ids))
    out = mod._merge_input_ids_with_image_features_get_token_type(
        self,
        torch.from_numpy(feats),
        torch.tensor([n_video]),
        inputs_embeds,
        torch.from_numpy(ids),
        torch.ones_like(torch.from_numpy(ids)),
    )
    ref_emb = out[0].detach().numpy()[0]
    ref_tt = self.token_type.numpy()[0]

    from sttm_tpu.models.llava_next_video import (
        VIDEO_TOKEN_INDEX,
        build_lnv_embeds,
        llava_next_video_token_types,
    )

    params = {"embed": jnp.asarray(embed.weight.detach().numpy())}
    our_ids = [video_token if t == video_token else t for t in ids[0]]
    our_ids = [VIDEO_TOKEN_INDEX if t == video_token else t for t in our_ids]
    s_full = len(pre) + n_video + len(post)
    got_emb, valid, vstart = build_lnv_embeds(params, our_ids, feats, s_full, dtype=jnp.float32)
    assert valid == s_full and vstart == len(pre)
    np.testing.assert_allclose(np.asarray(got_emb[0]), ref_emb, rtol=1e-6, atol=1e-6)

    tt = llava_next_video_token_types(s_full, vstart, n_frames, tpf)
    np.testing.assert_array_equal(tt, ref_tt)
