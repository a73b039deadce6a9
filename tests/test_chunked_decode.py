"""Chunked on-device decode (build_decode_chunk): token-exact vs per-step."""

import numpy as np

import jax
import jax.numpy as jnp

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.runtime.generate import GenerateConfig, generate
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


def test_chunked_decode_token_exact_with_reducer():
    params, emb, valid, vs, spec = _case()
    gen = GenerateConfig(max_new_tokens=13, eos_token_ids=())
    ref, _ = generate(params, TINY, emb, valid, vs, spec, gen)
    for chunk in (4, 5, 16):
        got, rt = generate(
            params, TINY, emb, valid, vs, spec, gen, decode_chunk_size=chunk
        )
        assert got == ref, (chunk, got, ref)
        assert rt["num_dec_token"] == len(ref)


def test_chunked_decode_eos_semantics():
    params, emb, valid, vs, spec = _case(seed=3)
    probe = GenerateConfig(max_new_tokens=12, eos_token_ids=())
    seq, _ = generate(params, TINY, emb, valid, vs, spec, probe)
    # pick a mid-sequence token as EOS so the stop fires inside a chunk
    eos = seq[6]
    gen = GenerateConfig(max_new_tokens=12, eos_token_ids=(eos,))
    ref, _ = generate(params, TINY, emb, valid, vs, spec, gen)
    assert ref[-1] == eos and len(ref) <= 12
    for chunk in (4, 8):
        got, _ = generate(
            params, TINY, emb, valid, vs, spec, gen, decode_chunk_size=chunk
        )
        assert got == ref, (chunk, got, ref)


def test_generate_batch_chunked_matches_per_step():
    """Batched chunked decode (scan-based) is token-exact vs per-step
    batched decode, including per-row EOS freezing."""
    from sttm_tpu.runtime.generate import generate_batch

    params, emb, valid, vs, spec = _case(seed=7)
    b = 3
    rng = np.random.default_rng(7)
    embs = np.asarray(jnp.broadcast_to(emb, (b,) + emb.shape[1:])).copy()
    embs += 0.01 * rng.normal(size=embs.shape).astype(np.float32)
    valids = [valid, valid - 2, valid - 4]
    probe = GenerateConfig(max_new_tokens=10, eos_token_ids=())
    ref, _ = generate_batch(params, TINY, jnp.asarray(embs), valids, [vs] * b, spec, probe)
    # EOS from the middle of row 1 so one row freezes inside a chunk
    eos = ref[1][5]
    gen = GenerateConfig(max_new_tokens=10, eos_token_ids=(eos,))
    want, _ = generate_batch(params, TINY, jnp.asarray(embs), valids, [vs] * b, spec, gen)
    got, _ = generate_batch(
        params, TINY, jnp.asarray(embs), valids, [vs] * b, spec, gen,
        decode_chunk_size=4,
    )
    assert got == want


def test_generate_batch_flash_decode_kernel_token_exact():
    """The Pallas flash-decode kernel path (decode_attn_kernel=True, opt-in)
    is token-exact vs the default head-packed XLA attention path. Both runs
    are head-packed; the kernel sees the batch folded into the KV-head axis
    with a per-packed-head mask."""
    from sttm_tpu.runtime.generate import generate_batch

    params, emb, valid, vs, spec = _case(seed=11)
    b = 3
    rng = np.random.default_rng(11)
    embs = np.asarray(jnp.broadcast_to(emb, (b,) + emb.shape[1:])).copy()
    embs += 0.01 * rng.normal(size=embs.shape).astype(np.float32)
    valids = [valid, valid - 3, valid - 6]
    gen = GenerateConfig(max_new_tokens=6, eos_token_ids=())
    ref, _ = generate_batch(
        params, TINY, jnp.asarray(embs), valids, [vs] * b, spec, gen,
        decode_attn_kernel=False,
    )
    got, _ = generate_batch(
        params, TINY, jnp.asarray(embs), valids, [vs] * b, spec, gen,
        decode_attn_kernel=True, decode_chunk_size=3,
    )
    assert got == ref


def test_chunked_decode_streamingllm_windowed():
    params, emb, valid, vs, _ = _case(seed=5)
    gen = GenerateConfig(max_new_tokens=9, eos_token_ids=())
    ref, _ = generate(params, TINY, emb, valid, vs, None, gen, attn_sinks=4, attn_window=16)
    got, _ = generate(
        params, TINY, emb, valid, vs, None, gen,
        attn_sinks=4, attn_window=16, decode_chunk_size=4,
    )
    assert got == ref
