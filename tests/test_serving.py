"""Continuous batching (runtime/serving.py): token-parity with per-sample
generate() for every request, including requests admitted MID-WAVE into a
retired slot (the per-row tail_min mask keeps them from attending to the
zeroed tail slots before their admission step)."""

import numpy as np

import jax
import jax.numpy as jnp

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.runtime.generate import GenerateConfig, generate
from sttm_tpu.runtime.reducer import ReducerSpec
from sttm_tpu.runtime.serving import Request, serve_continuous


def _requests(n, seed=0):
    params = qwen2.init_params(TINY, jax.random.key(0))
    rng = np.random.default_rng(seed)
    t, h, w = 4, 4, 4
    nv = t * h * w
    s_full = 96
    spec = ReducerSpec(
        kind="quadtree", layer_idx=2, t=t, h=h, w=w, video_budget=nv // 2,
        spatial_thresh=0.85, temporal_thresh=0.65, root_level=0,
    )
    reqs = []
    for i in range(n):
        valid = 4 + nv + 8 - (i % 3)  # varied lengths, same padded buffer
        emb = np.zeros((1, s_full, TINY.hidden_size), np.float32)
        emb[0, :valid] = rng.normal(size=(valid, TINY.hidden_size)) * 0.2
        reqs.append(Request(rid=f"r{i}", embeds=jnp.asarray(emb),
                            valid_len=valid, video_start=4))
    return params, spec, reqs


def _per_sample(params, spec, reqs, gen):
    out = {}
    for r in reqs:
        ids, _ = generate(params, TINY, r.embeds, r.valid_len, r.video_start,
                          spec, gen)
        out[r.rid] = ids
    return out


def test_continuous_matches_per_sample():
    params, spec, reqs = _requests(5)
    gen = GenerateConfig(max_new_tokens=9, eos_token_ids=())
    want = _per_sample(params, spec, reqs, gen)
    got, stats = serve_continuous(params, TINY, reqs, spec, gen,
                                  batch_slots=2, decode_chunk_size=3)
    assert got == want
    assert stats["n_prefills"] == 5
    assert stats["total_tokens"] == sum(len(v) for v in want.values())


def test_continuous_mid_wave_admission():
    """An early EOS retires one slot mid-wave; the next request is admitted
    at a nonzero global step (tail_min > 0) and must still match its
    per-sample output exactly."""
    params, spec, reqs = _requests(4, seed=2)
    probe = GenerateConfig(max_new_tokens=12, eos_token_ids=())
    plain = _per_sample(params, spec, reqs, probe)
    # eos = request 0's 3rd token: r0 finishes early, later rows keep going
    eos = plain["r0"][2]
    gen = GenerateConfig(max_new_tokens=12, eos_token_ids=(eos,))
    want = _per_sample(params, spec, reqs, gen)
    got, stats = serve_continuous(params, TINY, reqs, spec, gen,
                                  batch_slots=2, decode_chunk_size=4)
    assert got == want
    # someone was admitted after step 0 (i.e. continuous, not grouped)
    assert stats["n_decode_chunks"] >= 3


def test_continuous_single_slot_degenerates_to_sequential():
    params, spec, reqs = _requests(3, seed=4)
    gen = GenerateConfig(max_new_tokens=6, eos_token_ids=())
    want = _per_sample(params, spec, reqs, gen)
    got, _ = serve_continuous(params, TINY, reqs, spec, gen,
                              batch_slots=1, decode_chunk_size=2)
    assert got == want


def test_continuous_prefix_requests_match_per_sample():
    """Per-slot prefix admission (PrefixRequest): two videos' prefix caches,
    questions of both interleaved through one pool — every answer must match
    its per-sample generate_from_prefix (and thus full-prefill) output, and
    no full prefill may run inside the pool."""
    from sttm_tpu.runtime.generate import generate_from_prefix, prefix_prefill
    from sttm_tpu.runtime.serving import PrefixRequest

    params = qwen2.init_params(TINY, jax.random.key(0))
    rng = np.random.default_rng(7)
    t, h, w = 4, 4, 4
    nv = t * h * w
    s_full, s_sfx, sys_len = 96, 16, 4
    spec = ReducerSpec(
        kind="quadtree", layer_idx=2, t=t, h=h, w=w, video_budget=nv // 2,
        spatial_thresh=0.85, temporal_thresh=0.65, root_level=0,
    )

    caches = []
    for _ in range(2):
        emb = np.zeros((1, s_full, TINY.hidden_size), np.float32)
        emb[0, : sys_len + nv] = rng.normal(size=(sys_len + nv, TINY.hidden_size)) * 0.2
        caches.append(prefix_prefill(
            params, TINY, jnp.asarray(emb), sys_len + nv, sys_len, spec,
        ))

    reqs, want = [], {}
    gen = GenerateConfig(max_new_tokens=7, eos_token_ids=())
    for i in range(5):
        cache = caches[i % 2]
        n = 6 + (i % 3)
        sfx = np.zeros((1, s_sfx, TINY.hidden_size), np.float32)
        sfx[0, :n] = rng.normal(size=(n, TINY.hidden_size)) * 0.2
        sfx = jnp.asarray(sfx)
        rid = f"q{i}"
        reqs.append(PrefixRequest(rid=rid, prefix_cache=cache,
                                  suffix_embeds=sfx, suffix_valid=n))
        ids, _ = generate_from_prefix(params, TINY, cache, sfx, n, spec, gen)
        want[rid] = ids

    got, stats = serve_continuous(params, TINY, reqs, spec, gen,
                                  batch_slots=2, decode_chunk_size=3)
    assert got == want
    assert stats["n_prefills"] == 0 and stats["n_extends"] == 5


def test_continuous_mixed_full_and_prefix_requests():
    """A pool can mix full-prefill Requests and PrefixRequests (same cache
    buffer shapes = one compile key)."""
    from sttm_tpu.runtime.generate import generate_from_prefix, prefix_prefill
    from sttm_tpu.runtime.serving import PrefixRequest

    params, spec, reqs = _requests(2, seed=9)
    gen = GenerateConfig(max_new_tokens=6, eos_token_ids=())
    want = _per_sample(params, spec, reqs, gen)

    rng = np.random.default_rng(11)
    t, h, w = spec.t, spec.h, spec.w
    nv = t * h * w
    s_full, s_sfx, sys_len = 96, 16, 4
    emb = np.zeros((1, s_full, TINY.hidden_size), np.float32)
    emb[0, : sys_len + nv] = rng.normal(size=(sys_len + nv, TINY.hidden_size)) * 0.2
    cache = prefix_prefill(params, TINY, jnp.asarray(emb), sys_len + nv,
                           sys_len, spec)
    sfx = np.zeros((1, s_sfx, TINY.hidden_size), np.float32)
    sfx[0, :7] = rng.normal(size=(7, TINY.hidden_size)) * 0.2
    sfx = jnp.asarray(sfx)
    preq = PrefixRequest(rid="p0", prefix_cache=cache, suffix_embeds=sfx,
                         suffix_valid=7)
    ids, _ = generate_from_prefix(params, TINY, cache, sfx, 7, spec, gen)
    want["p0"] = ids

    got, stats = serve_continuous(params, TINY, reqs + [preq], spec, gen,
                                  batch_slots=2, decode_chunk_size=2)
    assert got == want
    assert stats["n_prefills"] == 2 and stats["n_extends"] == 1
