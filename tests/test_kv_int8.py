"""int8 live KV cache (kv_int8): the writable decode cache carries int8 K/V
with per-(position, KV-head) scales (qwen2.quantize_kv_cache), each decoded
token re-quantized at its write slot (qwen2.decode_layers) and attention
dequantizing via the score/prob matrices (ops/attention._xla_mha) — the
same scheme as the read-only int8 prefix pool (runtime/paged.py), extended
to the live per-sample and head-packed batched caches. Outputs are a
bounded approximation of the bf16 cache; the chunked and batched layouts
must match the per-step int8 path token-exactly (identical quantization)."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

jax.config.update("jax_default_matmul_precision", "float32")

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.runtime.generate import GenerateConfig, generate, generate_batch
from sttm_tpu.runtime.reducer import ReducerSpec


def _case(seed=0):
    params = qwen2.init_params(TINY, jax.random.key(0))
    rng = np.random.default_rng(seed)
    t, h, w = 4, 4, 4
    nv = t * h * w
    sys_len, inst_len = 4, 8
    valid = sys_len + nv + inst_len
    s_full = 96
    emb = np.zeros((1, s_full, TINY.hidden_size), np.float32)
    emb[0, :valid] = rng.normal(size=(valid, TINY.hidden_size)) * 0.2
    spec = ReducerSpec(
        kind="quadtree", layer_idx=2, t=t, h=h, w=w, video_budget=nv // 2,
        spatial_thresh=0.85, temporal_thresh=0.65, root_level=0,
    )
    return params, jnp.asarray(emb), valid, sys_len, spec


def test_quantize_kv_roundtrip_bound():
    """Per-element dequant error <= scale/2; grid-aligned values are exact."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 5, 3, 8)).astype(np.float32))
    q, s = qwen2.quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == x.shape[:-1]
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s)[..., None] - np.asarray(x))
    assert (err <= np.asarray(s)[..., None] / 2 + 1e-7).all()
    # values already on the int8 grid survive exactly
    g = (q.astype(jnp.float32) * s[..., None]).astype(jnp.float32)
    q2, s2 = qwen2.quantize_kv(g)
    np.testing.assert_allclose(
        np.asarray(q2, np.float32) * np.asarray(s2)[..., None], np.asarray(g),
        rtol=0, atol=1e-6)


def test_kv_int8_decode_bounded_vs_bf16():
    """Greedy tokens under the int8 cache overwhelmingly agree with the
    exact bf16 path; the quantized cache buffers really are int8."""
    params, emb, valid, vs, spec = _case()
    gen = GenerateConfig(max_new_tokens=13, eos_token_ids=())
    ref, _ = generate(params, TINY, emb, valid, vs, spec, gen)
    got, rt = generate(params, TINY, emb, valid, vs, spec, gen, kv_int8=True)
    agree = sum(a == b for a, b in zip(got, ref))
    assert agree / len(ref) >= 0.8, f"kv_int8 agreement {agree}/{len(ref)}"
    assert rt["num_dec_token"] == len(got)

    # dtype check on the handoff itself
    from sttm_tpu.runtime.generate import build_prefill

    prefill = build_prefill(TINY, spec, emb.shape[1], "xla", 0, 0)
    _, cache = prefill(params, emb, jnp.int32(valid), jnp.int32(vs),
                       None, None, None)
    qc = qwen2.quantize_kv_cache(cache)
    assert all(k.dtype == jnp.int8 for k in qc.ks)
    assert all(v.dtype == jnp.int8 for v in qc.vs)
    assert qc.k_scales is not None and qc.k_scales[0].dtype == jnp.float32
    assert qc.k_scales[0].shape == qc.ks[0].shape[:-1]


def test_kv_int8_chunked_matches_per_step():
    """Chunked int8 decode reuses the per-step body — token-exact."""
    params, emb, valid, vs, spec = _case(seed=3)
    gen = GenerateConfig(max_new_tokens=12, eos_token_ids=())
    ref, _ = generate(params, TINY, emb, valid, vs, spec, gen, kv_int8=True)
    for chunk in (3, 5):
        got, _ = generate(params, TINY, emb, valid, vs, spec, gen,
                          kv_int8=True, decode_chunk_size=chunk)
        assert got == ref, (chunk, got, ref)


def test_kv_int8_batch_matches_single():
    """Head-packed batched int8 decode matches per-sample int8 generate
    (quantization is per row; head packing is exact)."""
    params, emb, valid, vs, spec = _case(seed=7)
    b = 3
    rng = np.random.default_rng(7)
    embs = np.asarray(jnp.broadcast_to(emb, (b,) + emb.shape[1:])).copy()
    embs += 0.01 * rng.normal(size=embs.shape).astype(np.float32)
    valids = [valid, valid - 2, valid - 4]
    gen = GenerateConfig(max_new_tokens=9, eos_token_ids=())
    want = [
        generate(params, TINY, jnp.asarray(embs[i : i + 1]), valids[i], vs,
                 spec, gen, kv_int8=True)[0]
        for i in range(b)
    ]
    ids, _ = generate_batch(
        params, TINY, jnp.asarray(embs), valids, [vs] * b, spec, gen,
        decode_chunk_size=4, kv_int8=True,
    )
    assert ids == want


def test_kv_int8_streaming_window_runs():
    """kv_int8 composes with the StreamingLLM decode window (mask path)."""
    params, emb, valid, vs, spec = _case(seed=5)
    gen = GenerateConfig(max_new_tokens=8, eos_token_ids=())
    ref, _ = generate(params, TINY, emb, valid, vs, spec, gen,
                      attn_sinks=2, attn_window=16)
    got, _ = generate(params, TINY, emb, valid, vs, spec, gen,
                      attn_sinks=2, attn_window=16, kv_int8=True)
    agree = sum(a == b for a, b in zip(got, ref))
    assert agree / len(ref) >= 0.75, f"windowed agreement {agree}/{len(ref)}"


def test_kv_int8_spec_decode_matches_plain_int8():
    """n-gram speculative decode over the int8 cache: the verify dispatch
    quantizes drafts at their write slots exactly like the per-step path,
    so emitted tokens match plain int8 decode (token-exact on CPU fp32 —
    the existing spec-decode exactness precedent)."""
    params, emb, valid, vs, spec = _case(seed=11)
    gen = GenerateConfig(max_new_tokens=10, eos_token_ids=())
    ref, _ = generate(params, TINY, emb, valid, vs, spec, gen, kv_int8=True)
    got, rt = generate(params, TINY, emb, valid, vs, spec, gen, kv_int8=True,
                       spec_decode_k=4)
    assert got == ref, (got, ref)
    assert rt["spec_drafted"] >= 0

    # batched spec over the int8 packed buffer matches per-sample int8 spec
    b = 2
    rng = np.random.default_rng(11)
    embs = np.asarray(jnp.broadcast_to(emb, (b,) + emb.shape[1:])).copy()
    embs += 0.01 * rng.normal(size=embs.shape).astype(np.float32)
    want = [
        generate(params, TINY, jnp.asarray(embs[i : i + 1]), valid, vs,
                 spec, gen, kv_int8=True, spec_decode_k=3)[0]
        for i in range(b)
    ]
    ids, _ = generate_batch(
        params, TINY, jnp.asarray(embs), [valid] * b, [vs] * b, spec, gen,
        spec_decode_k=3, kv_int8=True,
    )
    assert ids == want


def test_kv_int8_selfspec_matches_plain_int8():
    """Self-speculative decode over the int8 cache: the draft scan carries
    the scale stacks, and the verify rewrites the draft window's slots with
    identical quantized values — emitted tokens match plain int8 decode."""
    params, emb, valid, vs, spec = _case(seed=13)
    gen = GenerateConfig(max_new_tokens=9, eos_token_ids=())
    ref, _ = generate(params, TINY, emb, valid, vs, spec, gen, kv_int8=True)
    got, rt = generate(params, TINY, emb, valid, vs, spec, gen, kv_int8=True,
                       spec_decode_k=3, spec_draft_layers=2)
    assert got == ref, (got, ref)
    assert rt["spec_drafted"] > 0


def test_kv_int8_framefusion_bounded():
    """kv_int8 composes with the FrameFusion masked decode (and the
    compacted two-group variant): tokens overwhelmingly agree with the
    bf16-cache run."""
    from sttm_tpu.runtime.framefusion import FrameFusionSpec

    params, emb, valid, vs, _ = _case(seed=17)
    gen = GenerateConfig(max_new_tokens=8, eos_token_ids=())
    for ff in (
        FrameFusionSpec(cost=0.5, t=4, h=4, w=4),
        FrameFusionSpec(cost=0.5, t=4, h=4, w=4, compact_at_layer=3,
                        compact_budget=48),
    ):
        ref, _ = generate(params, TINY, emb, valid, vs, ff, gen)
        got, _ = generate(params, TINY, emb, valid, vs, ff, gen, kv_int8=True)
        agree = sum(a == b for a, b in zip(got, ref))
        assert agree / len(ref) >= 0.75, (ff.compact_at_layer, agree, ref, got)


def test_kv_int8_dycoke_ranking_dequant_exact():
    """The dycoke stage-2 ranking einsum over an int8 K read, dequantized
    by scaling the score rows, equals the ranking over the dequantized
    cache — the same identity the attention read relies on."""
    rng = np.random.default_rng(0)
    b, s, kvh, hd, g = 1, 24, 2, 8, 3
    k = jnp.asarray(rng.normal(size=(b, s, kvh, hd)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(b, kvh, g, hd)).astype(np.float32))
    kq, ksc = qwen2.quantize_kv(k)
    k_deq = kq.astype(jnp.float32) * ksc[..., None]
    att_ref = jnp.einsum("bhgd,bshd->bhgs", q, k_deq)
    att_int8 = jnp.einsum("bhgd,bshd->bhgs", q, kq.astype(jnp.float32))
    att_int8 = att_int8 * ksc.transpose(0, 2, 1)[:, :, None, :]
    np.testing.assert_allclose(np.asarray(att_ref), np.asarray(att_int8),
                               atol=1e-4)


def test_kv_int8_dycoke_runs():
    """kv_int8 composes with dycoke stage-2 decode pruning end to end. The
    prefill token must match bf16 (stage 2 is decode-only); later tokens
    may legitimately diverge — the top-k re-selection is tie-dense under
    random weights (near-flat attention), so quantization noise reorders
    the kept set (the CLAUDE.md tie-flip regime), exactly as bf16-vs-fp32
    would."""
    from sttm_tpu.ops.dycoke import dycoke_output_len
    from sttm_tpu.runtime.common import DycokeDecodeOptions

    params, emb, valid, vs, _ = _case(seed=19)
    spec = ReducerSpec(kind="dycoke", layer_idx=0, t=4, h=4, w=4,
                       prune_ratio=0.7)
    dyc = DycokeDecodeOptions(layer_idx=2, ratio=0.8,
                              img_len=dycoke_output_len(4, 16, 0.7))
    gen = GenerateConfig(max_new_tokens=8, eos_token_ids=())
    ref, rt_ref = generate(params, TINY, emb, valid, vs, spec, gen, dycoke=dyc)
    got, rt = generate(params, TINY, emb, valid, vs, spec, gen, dycoke=dyc,
                       kv_int8=True)
    assert got[0] == ref[0]  # prefill is bf16 in both runs
    assert len(got) == len(ref) == 8
    assert rt["merged_len"] == rt_ref["merged_len"]


def test_kv_int8_flat_prefix_batch():
    """kv_int8 on the batched FLAT prefix layout (the B-full-cache layout
    whose b=8 leg OOMs in bf16): rows quantize after extension; greedy
    tokens overwhelmingly agree with the exact flat run, and the spec-flat
    layout matches the plain int8 flat run token-exactly. The cascade
    layout rejects (its int8 prefix form is the paged pool)."""
    from sttm_tpu.runtime.generate import (
        generate_batch_from_prefix,
        prefix_prefill,
    )

    params, emb, valid, vs, spec = _case(seed=23)
    nv = 4 * 4 * 4
    gen = GenerateConfig(max_new_tokens=8, eos_token_ids=())
    cache = prefix_prefill(params, TINY, emb, vs + nv, vs, spec)
    rng = np.random.default_rng(23)
    s_sfx = 16
    sfx = np.zeros((3, s_sfx, TINY.hidden_size), np.float32)
    lens = [7, 12, 9]
    for i, n in enumerate(lens):
        sfx[i, :n] = rng.normal(size=(n, TINY.hidden_size)) * 0.2
    sfx = jnp.asarray(sfx)

    ref, _ = generate_batch_from_prefix(
        params, TINY, cache, sfx, lens, spec, gen, decode_chunk_size=3)
    got, _ = generate_batch_from_prefix(
        params, TINY, cache, sfx, lens, spec, gen, decode_chunk_size=3,
        kv_int8=True)
    total = agree = 0
    for r, g in zip(ref, got):
        for a, b_ in zip(r, g):
            total += 1
            agree += a == b_
    assert agree / total >= 0.8, (agree, total, ref, got)

    got_spec, _ = generate_batch_from_prefix(
        params, TINY, cache, sfx, lens, spec, gen, spec_decode_k=3,
        kv_int8=True)
    assert got_spec == got

    with pytest.raises(ValueError, match="kv_int8"):
        generate_batch_from_prefix(
            params, TINY, cache, sfx, lens, spec, gen, cascade=True,
            kv_int8=True)


def test_inline_prefill_matches_handoff_bitwise():
    """build_prefill(kv_int8=True) quantizes K/V inside the prefill scan;
    its cache must equal quantize_kv_cache(bf16 prefill cache) BITWISE —
    same per-layer bf16 values through the same quantize_kv, including the
    1e-8 decode-tail scales. (The inline form is what makes int8's
    capacity advantage real: the handoff held bf16 + int8 copies
    simultaneously — runtime/prefill.py build_prefill docstring.)"""
    from sttm_tpu.runtime.prefill import build_prefill

    params, emb, valid, vs, spec = _case()
    for sp in (None, spec):  # no-reducer and quadtree (two cache groups)
        p_bf = build_prefill(TINY, sp, emb.shape[1], "xla")
        p_i8 = build_prefill(TINY, sp, emb.shape[1], "xla", kv_int8=True)
        lg_a, cache_bf = p_bf(params, emb, jnp.int32(valid), jnp.int32(vs))
        lg_b, cache_i8 = p_i8(params, emb, jnp.int32(valid), jnp.int32(vs))
        np.testing.assert_array_equal(np.asarray(lg_a), np.asarray(lg_b))
        handoff = qwen2.quantize_kv_cache(jax.tree.map(jnp.copy, cache_bf))
        assert cache_i8.k_scales is not None
        for a, b in zip(cache_i8.ks, handoff.ks):
            assert a.dtype == jnp.int8
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(cache_i8.vs, handoff.vs):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(cache_i8.k_scales, handoff.k_scales):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(cache_i8.v_scales, handoff.v_scales):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(cache_i8.merged_len) == int(handoff.merged_len)


def test_inline_prefill_fastv_scores_exact():
    """FastV (needs_scores) + inline kv_int8: the score group quantizes
    AFTER the bf16 score einsum, so the merge decision (and therefore the
    whole cache) matches the handoff path bitwise."""
    from sttm_tpu.runtime.prefill import build_prefill

    params, emb, valid, vs, _ = _case()
    fastv = ReducerSpec(kind="fastv", layer_idx=2, t=4, h=4, w=4,
                        video_budget=32)
    p_bf = build_prefill(TINY, fastv, emb.shape[1], "xla")
    p_i8 = build_prefill(TINY, fastv, emb.shape[1], "xla", kv_int8=True)
    lg_a, cache_bf = p_bf(params, emb, jnp.int32(valid), jnp.int32(vs))
    lg_b, cache_i8 = p_i8(params, emb, jnp.int32(valid), jnp.int32(vs))
    np.testing.assert_array_equal(np.asarray(lg_a), np.asarray(lg_b))
    handoff = qwen2.quantize_kv_cache(jax.tree.map(jnp.copy, cache_bf))
    for a, b in zip(cache_i8.ks + cache_i8.vs, handoff.ks + handoff.vs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(cache_i8.k_scales + cache_i8.v_scales,
                    handoff.k_scales + handoff.v_scales):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
