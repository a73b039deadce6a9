"""Vision resamplers: torch-parity (spatial pool, flamingo perceiver) and
behavioral tests (masked drop, MiniCPM-V resampler)."""

import importlib.util
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "float32")

from sttm_tpu.models.resampler import (
    MiniCPMVResamplerConfig,
    PerceiverConfig,
    init_minicpmv_resampler_params,
    init_perceiver_params,
    masked_drop,
    minicpmv_resample,
    perceiver_resample,
    sincos_pos_embed_2d,
)

REFERENCE = os.environ.get("STTM_REFERENCE", "/root/reference")


def test_spatial_pool_matches_torch_avgpool():
    torch = pytest.importorskip("torch")
    from sttm_tpu.models.resampler import spatial_pool

    rng = np.random.default_rng(0)
    # odd side exercises the floor-division window drop
    b, gh, gw, d, stride = 2, 7, 7, 16, 2
    feats = rng.normal(size=(b, gh * gw, d)).astype(np.float32)
    # torch reference semantics (spatial_pool.py:28-33)
    x = torch.from_numpy(feats).view(b, gh, gw, d).permute(0, 3, 1, 2)
    ref = torch.nn.AvgPool2d(stride, stride)(x).flatten(2).transpose(1, 2).numpy()
    got = spatial_pool(jnp.asarray(feats), gh, gw, stride, "average")
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6, atol=1e-6)

    ref_max = torch.nn.MaxPool2d(stride, stride)(x).flatten(2).transpose(1, 2).numpy()
    got_max = spatial_pool(jnp.asarray(feats), gh, gw, stride, "max")
    np.testing.assert_allclose(np.asarray(got_max), ref_max, rtol=1e-6, atol=1e-6)


def test_masked_drop_inference_noop_and_training_keep_count():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 10, 8)).astype(np.float32))
    out = masked_drop(feats, training=False)
    assert out is feats  # inference no-op (masked_drop.py:19-20)
    kept = masked_drop(feats, jax.random.key(0), ratio=0.5, training=True)
    assert kept.shape == (2, 5, 8)
    # every kept token is one of the originals (per sample)
    for bi in range(2):
        src = np.asarray(feats[bi])
        for tok in np.asarray(kept[bi]):
            assert any(np.allclose(tok, s) for s in src)
    cls = masked_drop(feats, mode="cls_only", training=True)
    np.testing.assert_array_equal(np.asarray(cls), np.asarray(feats[:, :1]))


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_perceiver_matches_reference_torch_module():
    torch = pytest.importorskip("torch")
    import einops

    path = os.path.join(REFERENCE, "llava/model/multimodal_resampler/perceiver.py")
    spec_ = importlib.util.spec_from_file_location("ref_perceiver", path)
    mod = importlib.util.module_from_spec(spec_)
    spec_.loader.exec_module(mod)
    # einops_exts is absent in this environment; rearrange_many is just a
    # per-tensor einops.rearrange
    mod.rearrange_many = lambda ts, pat, **kw: tuple(einops.rearrange(t, pat, **kw) for t in ts)

    torch.manual_seed(0)
    dim, depth, heads, dim_head, latents = 16, 2, 2, 8, 4
    ref = mod.PerceiverResamplerModule(
        dim=dim, depth=depth, dim_head=dim_head, heads=heads, num_latents=latents
    ).eval()

    cfg = PerceiverConfig(dim=dim, depth=depth, dim_head=dim_head, heads=heads, num_latents=latents)
    params = init_perceiver_params(cfg, jax.random.key(0))
    # copy torch weights into our layout
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    layers = {
        "nm_w": [], "nm_b": [], "nl_w": [], "nl_b": [],
        "wq": [], "wkv": [], "wo": [], "nf_w": [], "nf_b": [], "w1": [], "w2": [],
    }
    for i in range(depth):
        layers["nm_w"].append(sd[f"layers.{i}.0.norm_media.weight"])
        layers["nm_b"].append(sd[f"layers.{i}.0.norm_media.bias"])
        layers["nl_w"].append(sd[f"layers.{i}.0.norm_latents.weight"])
        layers["nl_b"].append(sd[f"layers.{i}.0.norm_latents.bias"])
        layers["wq"].append(sd[f"layers.{i}.0.to_q.weight"].T)
        layers["wkv"].append(sd[f"layers.{i}.0.to_kv.weight"].T)
        layers["wo"].append(sd[f"layers.{i}.0.to_out.weight"].T)
        layers["nf_w"].append(sd[f"layers.{i}.1.0.weight"])
        layers["nf_b"].append(sd[f"layers.{i}.1.0.bias"])
        layers["w1"].append(sd[f"layers.{i}.1.1.weight"].T)
        layers["w2"].append(sd[f"layers.{i}.1.3.weight"].T)
    params = {
        "latents": jnp.asarray(sd["latents"]),
        "layers": {k: jnp.asarray(np.stack(v)) for k, v in layers.items()},
        "norm_w": jnp.asarray(sd["norm.weight"]),
        "norm_b": jnp.asarray(sd["norm.bias"]),
    }

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(2, 9, dim)).astype(np.float32)
    with torch.no_grad():
        # the builder wrapper feeds [:, None, None] (perceiver.py:145)
        want = ref(torch.from_numpy(feats)[:, None, None]).squeeze(1).numpy()
    got = perceiver_resample(params, cfg, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_sincos_pos_embed_2d_properties():
    pe = sincos_pos_embed_2d(16, 3, 5)
    assert pe.shape == (15, 16)
    # same row -> identical first half; same col -> identical second half
    pe = pe.reshape(3, 5, 16)
    np.testing.assert_allclose(pe[1, 0, :8], pe[1, 4, :8])
    np.testing.assert_allclose(pe[0, 2, 8:], pe[2, 2, 8:])
    assert not np.allclose(pe[0, 0], pe[1, 1])


def test_minicpmv_resampler_shapes_and_position_sensitivity():
    cfg = MiniCPMVResamplerConfig(embed_dim=32, kv_dim=24, num_queries=8, num_heads=4)
    params = init_minicpmv_resampler_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(12, 24)).astype(np.float32)
    out = minicpmv_resample(params, cfg, jnp.asarray(feats), (3, 4))
    assert out.shape == (8, 32)
    assert np.isfinite(np.asarray(out)).all()
    # the 2D position embedding makes the output grid-shape dependent
    out2 = minicpmv_resample(params, cfg, jnp.asarray(feats), (4, 3))
    assert not np.allclose(np.asarray(out), np.asarray(out2), atol=1e-5)
    # permuting patches changes nothing except through positions: with a
    # 1-row grid, swapping two patches AND their positions is a no-op on the
    # attention pool only if we also permute positions — here we check the
    # plain permutation DOES change the output (keys carry positions)
    perm = rng.permutation(12)
    out3 = minicpmv_resample(params, cfg, jnp.asarray(feats[perm]), (3, 4))
    assert not np.allclose(np.asarray(out), np.asarray(out3), atol=1e-5)


# ---------------------------------------------------------------------------
# Q-Former (BLIP-2 query-only BERT) — parity vs the vendored reference module
# ---------------------------------------------------------------------------


def test_qformer_init_shapes_and_finite():
    from sttm_tpu.models.qformer import QFormerConfig, init_qformer_params, qformer_resample

    cfg = QFormerConfig(hidden_size=32, num_heads=4, intermediate_size=64, num_layers=3,
                        num_latents=6, encoder_width=20, cross_attention_freq=2)
    params = init_qformer_params(cfg, jax.random.key(0))
    # cross-attention only on layers 0 and 2 (freq=2, qformer.py:343)
    assert "cross" in params["layers"][0] and "cross" in params["layers"][2]
    assert "cross" not in params["layers"][1]
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 11, 20)).astype(np.float32))
    out = qformer_resample(params, cfg, feats)
    assert out.shape == (2, 6, 32)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_qformer_matches_reference_torch_module():
    torch = pytest.importorskip("torch")
    from sttm_tpu.models.qformer import QFormerConfig, qformer_params_from_torch, qformer_resample

    # the vendored module imports helpers that newer transformers moved to
    # pytorch_utils — shim them back before exec'ing the file
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for name in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices", "prune_linear_layer"):
        if not hasattr(mu, name):
            setattr(mu, name, getattr(pu, name))
    path = os.path.join(REFERENCE, "llava/model/multimodal_resampler/qformer.py")
    spec_ = importlib.util.spec_from_file_location("ref_qformer", path)
    mod = importlib.util.module_from_spec(spec_)
    spec_.loader.exec_module(mod)
    from transformers.models.bert.configuration_bert import BertConfig

    torch.manual_seed(0)
    # small geometry; construction mirrors build_Qformer (qformer.py:1119-1135)
    H, NH, F, L, NQ, DV, FREQ = 64, 4, 128, 5, 8, 48, 2
    bcfg = BertConfig(hidden_size=H, num_attention_heads=NH, intermediate_size=F,
                      num_hidden_layers=L, vocab_size=128, max_position_embeddings=32)
    bcfg.encoder_width = DV
    bcfg.add_cross_attention = True
    bcfg.cross_attention_freq = FREQ
    bcfg.query_length = NQ
    qf = mod.BertLMHeadModel(config=bcfg)
    query_tokens = torch.nn.Parameter(torch.zeros(1, NQ, H))
    query_tokens.data.normal_(mean=0.0, std=bcfg.initializer_range)
    qf.cls = None
    qf.bert.embeddings.word_embeddings = None
    qf.bert.embeddings.position_embeddings = None
    for layer in qf.bert.encoder.layer:
        layer.output = None
        layer.intermediate = None
    ln_vision = torch.nn.LayerNorm(DV)
    with torch.no_grad():  # non-identity LN so the test exercises its params
        ln_vision.weight.normal_(1.0, 0.1)
        ln_vision.bias.normal_(0.0, 0.1)
    qf.eval()

    B, N = 2, 17
    x = torch.randn(B, N, DV)
    with torch.no_grad():  # Qformer.forward (qformer.py:1137-1148)
        feats = ln_vision(x)
        image_atts = torch.ones(feats.size()[:-1], dtype=torch.long)
        qt = query_tokens.expand(feats.shape[0], -1, -1)
        out = qf.bert(query_embeds=qt, encoder_hidden_states=feats,
                      encoder_attention_mask=image_atts, return_dict=True)
        want = out.last_hidden_state.numpy()

    jcfg = QFormerConfig(hidden_size=H, num_heads=NH, intermediate_size=F, num_layers=L,
                         num_latents=NQ, encoder_width=DV, cross_attention_freq=FREQ)
    sd = {("Qformer." + k): v.numpy() for k, v in qf.state_dict().items()}
    sd["query_tokens"] = query_tokens.detach().numpy()
    sd["ln_vision.weight"] = ln_vision.weight.detach().numpy()
    sd["ln_vision.bias"] = ln_vision.bias.detach().numpy()
    params = qformer_params_from_torch(jcfg, sd)
    got = qformer_resample(params, jcfg, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)
