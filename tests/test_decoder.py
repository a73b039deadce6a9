"""Decoder correctness: HF-transformers parity, reducer invariants, KV decode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# Parity vs torch needs full fp32 matmuls; in production the trunk runs bf16
# on the MXU (XLA default) by design.
jax.config.update("jax_default_matmul_precision", "float32")

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.models.weights import params_from_state_dict
from sttm_tpu.runtime.generate import build_decode_step, build_prefill, generate
from sttm_tpu.runtime.reducer import ReducerSpec, apply_reducer, merged_buffer_len


@pytest.fixture(scope="module")
def hf_pair():
    """A tiny HF Qwen2 model and our params built from its state dict."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        num_key_value_heads=TINY.num_kv_heads,
        head_dim=TINY.head_dim,
        rope_theta=TINY.rope_theta,
        rms_norm_eps=TINY.rms_eps,
        max_position_embeddings=TINY.max_position_embeddings,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = params_from_state_dict(TINY, sd)
    return hf, params


def test_prefill_matches_transformers(hf_pair):
    import torch

    hf, params = hf_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, TINY.vocab_size, size=(1, 33))
    with torch.no_grad():
        ref_logits = hf(torch.from_numpy(ids)).logits.numpy()

    s_full = 48  # padded
    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    embeds = jnp.pad(embeds, ((0, 0), (0, s_full - 33), (0, 0)))
    prefill = build_prefill(TINY, None, s_full, "xla")
    logits, cache = prefill(params, embeds, jnp.int32(33), jnp.int32(0))
    np.testing.assert_allclose(
        np.asarray(logits[0]), ref_logits[0, -1], rtol=2e-4, atol=2e-4
    )
    assert int(cache.merged_len) == 33


def test_decode_matches_transformers(hf_pair):
    import torch

    hf, params = hf_pair
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, TINY.vocab_size, size=(1, 17))
    with torch.no_grad():
        out = hf.generate(
            torch.from_numpy(prompt), max_new_tokens=8, do_sample=False,
            pad_token_id=0, eos_token_id=None,
        )
    ref_ids = out[0, 17:].tolist()

    embeds = qwen2.embed_tokens(params, jnp.asarray(prompt))
    embeds = jnp.pad(embeds, ((0, 0), (0, 32 - 17), (0, 0)))
    from sttm_tpu.runtime.generate import GenerateConfig

    ids, runtime = generate(
        params, TINY, embeds, 17, 0, None, GenerateConfig(max_new_tokens=8, eos_token_ids=()),
    )
    assert ids == ref_ids
    assert runtime["num_dec_token"] == 8
    assert runtime["ttft_llm"] > 0


def test_llama_trunk_matches_transformers():
    """Llama-architecture trunk (no QKV bias — the Vicuna backbone of
    LLaVA-NeXT-Video, framefusion/models/llava_next_video/): prefill logits
    and greedy decode match HF LlamaForCausalLM."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from sttm_tpu.models.config import TINY_LLAMA
    from sttm_tpu.runtime.generate import GenerateConfig

    hf_cfg = LlamaConfig(
        vocab_size=TINY_LLAMA.vocab_size,
        hidden_size=TINY_LLAMA.hidden_size,
        intermediate_size=TINY_LLAMA.intermediate_size,
        num_hidden_layers=TINY_LLAMA.num_layers,
        num_attention_heads=TINY_LLAMA.num_heads,
        num_key_value_heads=TINY_LLAMA.num_kv_heads,
        head_dim=TINY_LLAMA.head_dim,
        rope_theta=TINY_LLAMA.rope_theta,
        rms_norm_eps=TINY_LLAMA.rms_eps,
        max_position_embeddings=TINY_LLAMA.max_position_embeddings,
        tie_word_embeddings=False,
        attention_bias=False,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    hf = LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = params_from_state_dict(TINY_LLAMA, sd)
    assert "bq" not in params["layers"]

    rng = np.random.default_rng(4)
    ids = rng.integers(0, TINY_LLAMA.vocab_size, size=(1, 21))
    with torch.no_grad():
        ref_logits = hf(torch.from_numpy(ids)).logits.numpy()
        out = hf.generate(torch.from_numpy(ids), max_new_tokens=6, do_sample=False,
                          pad_token_id=0, eos_token_id=None)
    ref_ids = out[0, 21:].tolist()

    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    embeds = jnp.pad(embeds, ((0, 0), (0, 32 - 21), (0, 0)))
    prefill = build_prefill(TINY_LLAMA, None, 32, "xla")
    logits, _ = prefill(params, embeds, jnp.int32(21), jnp.int32(0))
    np.testing.assert_allclose(np.asarray(logits[0]), ref_logits[0, -1], rtol=2e-4, atol=2e-4)

    gen_ids, _ = generate(params, TINY_LLAMA, embeds, 21, 0, None,
                          GenerateConfig(max_new_tokens=6, eos_token_ids=()))
    assert gen_ids == ref_ids


def test_none_reducer_is_identity(hf_pair):
    """Packing through a 'none' reducer must not change logits at all."""
    _, params = hf_pair
    rng = np.random.default_rng(2)
    s_full, valid, video_start, t, h, w = 64, 60, 10, 4, 3, 3
    embeds = jnp.asarray(rng.normal(size=(1, s_full, TINY.hidden_size)), jnp.float32)

    base = build_prefill(TINY, None, s_full, "xla")
    ref_logits, ref_cache = base(params, embeds, jnp.int32(valid), jnp.int32(0))

    spec = ReducerSpec(kind="none", layer_idx=2, t=t, h=h, w=w)
    assert merged_buffer_len(spec, s_full) == s_full
    fn = build_prefill(TINY, spec, s_full, "xla")
    logits, cache = fn(params, embeds, jnp.int32(valid), jnp.int32(video_start))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5)
    assert int(cache.len_a) == valid and int(cache.len_b) == valid
    # group split: 2 layers full-length cache, 2 layers merged-length cache
    assert cache.ks[0].shape[0] == 2 and cache.ks[1].shape[0] == 2


def test_mistral_trunk_sliding_window_matches_transformers():
    """Mistral-architecture trunk (Llama + architectural sliding window,
    cfg.sliding_window): prefill logits and greedy decode match HF
    MistralForCausalLM with a window SMALLER than the sequence, so the
    windowed mask is actually exercised."""
    import dataclasses

    import torch
    from transformers import MistralConfig, MistralForCausalLM

    from sttm_tpu.models.config import TINY_LLAMA
    from sttm_tpu.runtime.generate import GenerateConfig

    cfg = dataclasses.replace(TINY_LLAMA, sliding_window=8)
    hf_cfg = MistralConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_eps,
        max_position_embeddings=cfg.max_position_embeddings,
        sliding_window=8,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(2)
    hf = MistralForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = params_from_state_dict(cfg, sd)

    rng = np.random.default_rng(6)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 21))  # seq > window
    with torch.no_grad():
        ref_logits = hf(torch.from_numpy(ids)).logits.numpy()
        out = hf.generate(torch.from_numpy(ids), max_new_tokens=6, do_sample=False,
                          pad_token_id=0, eos_token_id=None)
    ref_ids = out[0, 21:].tolist()

    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    embeds = jnp.pad(embeds, ((0, 0), (0, 32 - 21), (0, 0)))
    prefill = build_prefill(cfg, None, 32, "xla")
    logits, _ = prefill(params, embeds, jnp.int32(21), jnp.int32(0))
    np.testing.assert_allclose(np.asarray(logits[0]), ref_logits[0, -1], rtol=2e-4, atol=2e-4)
    # the window must matter: a dense Llama run on the same weights differs
    dense = build_prefill(TINY_LLAMA, None, 32, "xla")
    dlogits, _ = dense(params, embeds, jnp.int32(21), jnp.int32(0))
    assert not np.allclose(np.asarray(dlogits[0]), ref_logits[0, -1], rtol=2e-4, atol=2e-4)

    gen_ids, _ = generate(params, cfg, embeds, 21, 0, None,
                          GenerateConfig(max_new_tokens=6, eos_token_ids=()))
    assert gen_ids == ref_ids


def test_gemma_trunk_matches_transformers():
    """Gemma-architecture trunk (GeGLU, (1+w) RMSNorm, sqrt(d)-scaled tied
    embeddings, decoupled head_dim — the reference's llava_gemma shim's
    backbone): prefill logits and greedy decode match HF GemmaForCausalLM."""
    import torch
    from transformers import GemmaConfig, GemmaForCausalLM

    from sttm_tpu.models.config import TINY_GEMMA
    from sttm_tpu.runtime.generate import GenerateConfig

    cfg = TINY_GEMMA
    hf_cfg = GemmaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_eps,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_activation="gelu_pytorch_tanh",
        tie_word_embeddings=True,
        attention_bias=False,
        attn_implementation="eager",
    )
    torch.manual_seed(3)
    hf = GemmaForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = params_from_state_dict(cfg, sd)
    assert "lm_head" not in params  # tied

    rng = np.random.default_rng(7)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 19))
    with torch.no_grad():
        ref_logits = hf(torch.from_numpy(ids)).logits.numpy()
        out = hf.generate(torch.from_numpy(ids), max_new_tokens=6, do_sample=False,
                          pad_token_id=0, eos_token_id=None)
    ref_ids = out[0, 19:].tolist()

    embeds = qwen2.embed_tokens(params, jnp.asarray(ids), cfg)  # sqrt(d) scale
    embeds = jnp.pad(embeds, ((0, 0), (0, 32 - 19), (0, 0)))
    prefill = build_prefill(cfg, None, 32, "xla")
    logits, _ = prefill(params, embeds, jnp.int32(19), jnp.int32(0))
    np.testing.assert_allclose(np.asarray(logits[0]), ref_logits[0, -1], rtol=3e-4, atol=3e-4)

    gen_ids, _ = generate(params, cfg, embeds, 19, 0, None,
                          GenerateConfig(max_new_tokens=6, eos_token_ids=()))
    assert gen_ids == ref_ids


def test_quadtree_reducer_end_to_end(hf_pair):
    """Merged prefill + decode runs; merged_len < full video length; decode
    continues from the merged cache without shape errors."""
    _, params = hf_pair
    rng = np.random.default_rng(3)
    t, h, w = 6, 4, 4
    nv = t * h * w
    sys_len, inst_len = 8, 12
    valid = sys_len + nv + inst_len
    s_full = 128
    assert valid <= s_full
    # correlated video embeds so the quadtree actually merges
    base_tok = rng.normal(size=(1, 1, TINY.hidden_size))
    video = base_tok + 0.3 * rng.normal(size=(nv, TINY.hidden_size))
    embeds = np.zeros((1, s_full, TINY.hidden_size), np.float32)
    embeds[0, :sys_len] = rng.normal(size=(sys_len, TINY.hidden_size))
    embeds[0, sys_len : sys_len + nv] = video
    embeds[0, sys_len + nv : valid] = rng.normal(size=(inst_len, TINY.hidden_size))

    spec = ReducerSpec(
        kind="quadtree", layer_idx=1, t=t, h=h, w=w, video_budget=nv // 2,
        spatial_thresh=0.5, temporal_thresh=0.4, root_level=0,
    )
    from sttm_tpu.runtime.generate import GenerateConfig

    ids, runtime = generate(
        params, TINY, jnp.asarray(embeds), valid, sys_len, spec,
        GenerateConfig(max_new_tokens=4, eos_token_ids=()),
    )
    assert len(ids) == 4
    assert runtime["merged_len"] < valid
    assert runtime["merged_len"] >= sys_len + inst_len + 1


def test_reducer_packing_layout():
    """apply_reducer packs [sys | merged video | inst] and reports src map."""
    t, h, w, d = 2, 2, 2, 8
    nv = t * h * w
    sys_len, inst_len, s_full = 3, 2, 16
    rng = np.random.default_rng(0)
    hidden = rng.normal(size=(1, s_full, d)).astype(np.float32)
    spec = ReducerSpec(kind="none", layer_idx=0, t=t, h=h, w=w)
    out, new_valid, n_kept, src, _, _ = apply_reducer(
        spec, jnp.asarray(hidden), jnp.int32(sys_len), jnp.int32(sys_len + nv + inst_len)
    )
    assert int(new_valid) == sys_len + nv + inst_len
    assert int(n_kept) == nv
    np.testing.assert_allclose(
        np.asarray(out[0, : sys_len + nv + inst_len]),
        hidden[0, : sys_len + nv + inst_len],
        rtol=1e-6,
    )
    assert np.asarray(src)[: sys_len + nv + inst_len].tolist() == list(range(sys_len + nv + inst_len))


def test_int8_quantized_matches_bf16(hf_pair):
    """Weight-only int8 params produce near-identical logits end-to-end."""
    from sttm_tpu.models.quant import quantize_params

    _, params = hf_pair
    qparams = quantize_params(params)
    assert qparams["layers"]["wq"]["q"].dtype.name == "int8"
    rng = np.random.default_rng(5)
    s_full = 48
    ids = rng.integers(0, TINY.vocab_size, size=(1, 33))
    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    embeds = jnp.pad(embeds, ((0, 0), (0, s_full - 33), (0, 0)))
    prefill = build_prefill(TINY, None, s_full, "xla")
    ref, _ = prefill(params, embeds, jnp.int32(33), jnp.int32(0))
    got, cache = prefill(qparams, embeds, jnp.int32(33), jnp.int32(0))
    # int8 weight error is ~0.4%; logits track closely
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    rel = err / (np.abs(np.asarray(ref)).max() + 1e-6)
    assert rel < 0.05, rel
    # decode also runs with quantized weights
    from sttm_tpu.runtime.generate import GenerateConfig, generate

    out, _ = generate(qparams, TINY, embeds, 33, 0, None,
                      GenerateConfig(max_new_tokens=3, eos_token_ids=()))
    assert len(out) == 3

    # w8a8 (dynamic activation quant on the int8 MXU path): looser tolerance,
    # logits still track and generation runs end-to-end
    import dataclasses as dc

    cfg8 = dc.replace(TINY, act_quant=True)
    prefill8 = build_prefill(cfg8, None, s_full, "xla")
    got8, _ = prefill8(qparams, embeds, jnp.int32(33), jnp.int32(0))
    rel8 = np.abs(np.asarray(got8) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-6
    )
    assert rel8 < 0.15, rel8
    out8, _ = generate(qparams, cfg8, embeds, 33, 0, None,
                       GenerateConfig(max_new_tokens=3, eos_token_ids=()))
    assert len(out8) == 3


def test_int4_quantized_matches_bf16(hf_pair):
    """Weight-only int4 params (nibble-packed, fused-unpack GEMV on TPU,
    two-dot XLA form elsewhere): bounded logit drift, end-to-end decode."""
    from sttm_tpu.models.quant import quantize_params, unpack_int4

    _, params = hf_pair
    qparams = quantize_params(params, bits=4)
    q4 = qparams["layers"]["wq"]["q4"]
    assert q4.dtype.name == "int8" and q4.shape[1] == TINY.hidden_size // 2

    # pack/unpack roundtrip is exact
    lo, hi = unpack_int4(q4)
    w = np.asarray(params["layers"]["wq"], np.float32)
    s = np.asarray(qparams["layers"]["wq"]["s"])
    qref = np.clip(np.round(w / s), -8, 7)
    np.testing.assert_array_equal(np.asarray(lo), qref[:, : TINY.hidden_size // 2])
    np.testing.assert_array_equal(np.asarray(hi), qref[:, TINY.hidden_size // 2 :])

    rng = np.random.default_rng(6)
    s_full = 48
    ids = rng.integers(0, TINY.vocab_size, size=(1, 33))
    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    embeds = jnp.pad(embeds, ((0, 0), (0, s_full - 33), (0, 0)))
    prefill = build_prefill(TINY, None, s_full, "xla")
    ref, _ = prefill(params, embeds, jnp.int32(33), jnp.int32(0))
    got, _ = prefill(qparams, embeds, jnp.int32(33), jnp.int32(0))
    rel = np.abs(np.asarray(got) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-6
    )
    assert rel < 0.35, rel  # 4-bit weights: coarser, but logits track

    from sttm_tpu.runtime.generate import GenerateConfig, generate

    out, rt = generate(qparams, TINY, embeds, 33, 0, None,
                       GenerateConfig(max_new_tokens=4, eos_token_ids=()),
                       decode_chunk_size=2)
    assert len(out) == 4 and rt["merged_len"] == 33


def test_decode_unroll_matches_scan(hf_pair):
    """The unrolled decode-layer loop (static layer indices, zero-copy cache
    views — decode_layers unroll=True) is logit-exact vs the scan form."""
    _, params = hf_pair
    rng = np.random.default_rng(9)
    s_full = 48
    ids = rng.integers(0, TINY.vocab_size, size=(1, 29))
    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    embeds = jnp.pad(embeds, ((0, 0), (0, s_full - 29), (0, 0)))
    prefill = build_prefill(TINY, None, s_full, "xla")
    logits, cache0 = prefill(params, embeds, jnp.int32(29), jnp.int32(0))

    scan_step = build_decode_step(TINY, None)
    unroll_step = build_decode_step(TINY, None, unroll=True)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    # real copies: both steps donate their cache argument
    c_scan = jax.tree.map(jnp.copy, cache0)
    c_unr = jax.tree.map(jnp.copy, cache0)
    for step in range(3):
        l_s, c_scan = scan_step(params, tok, c_scan, jnp.int32(step))
        l_u, c_unr = unroll_step(params, tok, c_unr, jnp.int32(step))
        np.testing.assert_allclose(
            np.asarray(l_s), np.asarray(l_u), rtol=1e-5, atol=1e-5
        )
        tok = jnp.argmax(l_s, -1).astype(jnp.int32)


def test_padded_merged_buffer_token_exact(hf_pair):
    """pad_multiple rounds the merged buffer up for kernel tiling; tokens
    and merged_len must be identical to the unpadded run (pads are masked
    everywhere, including across the decode-tail gap)."""
    import dataclasses as _dc

    from sttm_tpu.runtime.generate import GenerateConfig

    _, params = hf_pair
    rng = np.random.default_rng(9)
    t, h, w = 6, 4, 4
    nv = t * h * w
    sys_len, inst_len = 8, 12
    valid = sys_len + nv + inst_len
    s_full = 128
    base_tok = rng.normal(size=(1, 1, TINY.hidden_size))
    video = base_tok + 0.3 * rng.normal(size=(nv, TINY.hidden_size))
    embeds = np.zeros((1, s_full, TINY.hidden_size), np.float32)
    embeds[0, :sys_len] = rng.normal(size=(sys_len, TINY.hidden_size))
    embeds[0, sys_len : sys_len + nv] = video
    embeds[0, sys_len + nv : valid] = rng.normal(size=(inst_len, TINY.hidden_size))

    spec = ReducerSpec(
        kind="quadtree", layer_idx=1, t=t, h=h, w=w, video_budget=nv // 2,
        spatial_thresh=0.5, temporal_thresh=0.4, root_level=0,
    )
    # unpadded merged buffer: 128 - 96 + 48 = 80; padded to 32 -> 96
    spec_pad = _dc.replace(spec, pad_multiple=32)
    assert merged_buffer_len(spec, s_full) == 80
    assert merged_buffer_len(spec_pad, s_full) == 96

    gcfg = GenerateConfig(max_new_tokens=6, eos_token_ids=())
    ids_ref, rt_ref = generate(params, TINY, jnp.asarray(embeds), valid, sys_len, spec, gcfg)
    ids_pad, rt_pad = generate(params, TINY, jnp.asarray(embeds), valid, sys_len, spec_pad, gcfg)
    assert ids_pad == ids_ref
    assert rt_pad["merged_len"] == rt_ref["merged_len"]


def test_rope_qk_route_matches_stock_k_rope(monkeypatch):
    """prefill_layers' fused-QK-rope attend route (STTM_ROPE_QK=1, the
    default) must be bit-identical to the stock per-op K-rope route
    (STTM_ROPE_QK=0) on CPU — both resolve to the same apply_rope math in
    the fallback, so ANY divergence means the routing rewired semantics,
    not just scheduling. The TPU kernel itself is parity-tested in
    test_kernels.test_rope_qk_scale_transpose_parity."""
    params = qwen2.init_params(TINY, jax.random.key(2))
    rng = np.random.default_rng(5)
    b, s = 2, 64
    x0 = jnp.asarray(rng.normal(size=(b, s, TINY.hidden_size)) * 0.1,
                     jnp.float32)
    cos, sin = qwen2.rope_cos_sin(TINY, jnp.arange(s, dtype=jnp.int32))

    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("STTM_ROPE_QK", flag)
        y, k, v = qwen2.prefill_layers(
            params["layers"], 0, TINY.num_layers, x0, cos, sin, s, TINY,
            "xla")
        outs[flag] = (np.asarray(y), np.asarray(k), np.asarray(v))
    for a, b_ in zip(outs["1"], outs["0"]):
        np.testing.assert_array_equal(a, b_)
