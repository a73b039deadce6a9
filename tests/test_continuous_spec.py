"""Continuous batching x batched speculative decoding
(runtime/serving.py serve_continuous_spec): a pool of head-packed slots
where every dispatch verifies k candidate tokens per slot and retired slots
refill mid-wave. Greedy acceptance makes every emitted token the model's
own argmax, so outputs must match per-sample generate() /
generate_from_prefix exactly for ANY drafter."""

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "float32")

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.runtime.generate import (
    GenerateConfig,
    generate,
    generate_from_prefix,
    prefix_prefill,
)
from sttm_tpu.runtime.reducer import ReducerSpec
from sttm_tpu.runtime.serving import (
    PrefixRequest,
    Request,
    serve_continuous_spec,
)

T = H = W = 4
NV = T * H * W
S_FULL = 96


def _spec():
    return ReducerSpec(
        kind="quadtree", layer_idx=2, t=T, h=H, w=W, video_budget=NV // 2,
        spatial_thresh=0.85, temporal_thresh=0.65, root_level=0,
    )


def _requests(n, seed=0):
    params = qwen2.init_params(TINY, jax.random.key(0))
    rng = np.random.default_rng(seed)
    reqs = []
    for i in range(n):
        valid = 4 + NV + 8 - (i % 3)
        emb = np.zeros((1, S_FULL, TINY.hidden_size), np.float32)
        emb[0, :valid] = rng.normal(size=(valid, TINY.hidden_size)) * 0.2
        reqs.append(Request(rid=f"r{i}", embeds=jnp.asarray(emb),
                            valid_len=valid, video_start=4))
    return params, reqs


def _per_sample(params, reqs, gen):
    return {
        r.rid: generate(params, TINY, r.embeds, r.valid_len, r.video_start,
                        _spec(), gen)[0]
        for r in reqs
    }


def test_continuous_spec_matches_per_sample():
    params, reqs = _requests(5)
    gen = GenerateConfig(max_new_tokens=8, eos_token_ids=())
    want = _per_sample(params, reqs, gen)
    got, stats = serve_continuous_spec(params, TINY, reqs, _spec(), gen,
                                       batch_slots=2, spec_decode_k=3)
    assert got == want
    assert stats["n_prefills"] == 5 and stats["n_verify_dispatches"] >= 1


def test_continuous_spec_mid_wave_admission():
    """An early EOS retires a slot mid-wave; the next request is admitted at
    a nonzero dispatch (its acceptance-mask row is reset, hiding the
    previous occupant's tail) and must still match per-sample exactly."""
    params, reqs = _requests(4, seed=2)
    probe = GenerateConfig(max_new_tokens=10, eos_token_ids=())
    plain = _per_sample(params, reqs, probe)
    eos = plain["r0"][2]
    gen = GenerateConfig(max_new_tokens=10, eos_token_ids=(eos,))
    want = _per_sample(params, reqs, gen)
    got, stats = serve_continuous_spec(params, TINY, reqs, _spec(), gen,
                                       batch_slots=2, spec_decode_k=3)
    assert got == want
    # r0 retired early -> someone was admitted mid-wave (continuous)
    assert stats["n_verify_dispatches"] >= 3


def test_continuous_spec_oracle_drafter_fewer_dispatches():
    """An oracle drafter (fed each request's true continuation) collapses
    dispatch count toward ceil(n/k) per wave while outputs stay exact."""
    params, reqs = _requests(2, seed=4)
    gen = GenerateConfig(max_new_tokens=9, eos_token_ids=())
    want = _per_sample(params, reqs, gen)

    def oracle(history, n):
        rid = f"r{history[0]}"
        m = len(history) - 2  # [seed, token0, ...]
        nxt = list(want[rid][m + 1: m + 1 + n])
        while len(nxt) < n:
            nxt.append(history[-1])
        return nxt

    got, stats = serve_continuous_spec(
        params, TINY, reqs, _spec(), gen, batch_slots=2, spec_decode_k=4,
        draft_fn=oracle, histories={f"r{i}": [i] for i in range(2)},
    )
    assert got == want
    # both requests fit one wave: 8 tokens after token0 at k=4 -> ~3 dispatches
    assert stats["n_verify_dispatches"] <= 4


def test_continuous_paged_spec_all_levers():
    """serve_continuous_paged_spec: paged prefix pool + continuous batching
    + head packing + k-token verify — questions of 3 videos interleave
    through 2 slots, each prefix living once in the pool; every answer must
    match per-sample generate_from_prefix exactly."""
    from sttm_tpu.runtime.serving import (
        PagedRequest,
        make_prefix_pool,
        serve_continuous_paged_spec,
    )

    params = qwen2.init_params(TINY, jax.random.key(0))
    rng = np.random.default_rng(11)
    spec = _spec()
    sys_len, s_sfx = 4, 16
    caches = []
    for _ in range(3):
        emb = np.zeros((1, S_FULL, TINY.hidden_size), np.float32)
        emb[0, : sys_len + NV] = rng.normal(
            size=(sys_len + NV, TINY.hidden_size)) * 0.2
        caches.append(prefix_prefill(
            params, TINY, jnp.asarray(emb), sys_len + NV, sys_len, spec))
    gen = GenerateConfig(max_new_tokens=8, eos_token_ids=())
    reqs, want = [], {}
    for i in range(6):
        n = 6 + (i % 3)
        sfx = np.zeros((1, s_sfx, TINY.hidden_size), np.float32)
        sfx[0, :n] = rng.normal(size=(n, TINY.hidden_size)) * 0.2
        sfx = jnp.asarray(sfx)
        rid = f"q{i}"
        reqs.append(PagedRequest(rid=rid, page=i % 3, suffix_embeds=sfx,
                                 suffix_valid=n))
        want[rid] = generate_from_prefix(params, TINY, caches[i % 3], sfx, n,
                                         spec, gen)[0]
    pool = make_prefix_pool(TINY, spec, caches)
    got, stats = serve_continuous_paged_spec(
        params, TINY, pool, reqs, spec, gen, batch_slots=2, spec_decode_k=3,
    )
    assert got == want
    assert stats["n_extends"] == 6 and stats["n_pool_pages"] == 3
    assert stats["n_verify_dispatches"] >= 1


def test_continuous_paged_spec_mid_wave_and_eos():
    """Early EOS retires a paged slot mid-wave; the next request (a
    DIFFERENT page) is admitted at a nonzero dispatch and stays exact."""
    from sttm_tpu.runtime.serving import (
        PagedRequest,
        make_prefix_pool,
        serve_continuous_paged_spec,
    )

    params = qwen2.init_params(TINY, jax.random.key(0))
    rng = np.random.default_rng(13)
    spec = _spec()
    sys_len, s_sfx = 4, 16
    caches = []
    for _ in range(2):
        emb = np.zeros((1, S_FULL, TINY.hidden_size), np.float32)
        emb[0, : sys_len + NV] = rng.normal(
            size=(sys_len + NV, TINY.hidden_size)) * 0.2
        caches.append(prefix_prefill(
            params, TINY, jnp.asarray(emb), sys_len + NV, sys_len, spec))
    probe = GenerateConfig(max_new_tokens=9, eos_token_ids=())
    reqs, plain = [], {}
    for i in range(4):
        n = 6 + (i % 3)
        sfx = np.zeros((1, s_sfx, TINY.hidden_size), np.float32)
        sfx[0, :n] = rng.normal(size=(n, TINY.hidden_size)) * 0.2
        sfx = jnp.asarray(sfx)
        reqs.append(PagedRequest(rid=f"q{i}", page=i % 2, suffix_embeds=sfx,
                                 suffix_valid=n))
        plain[f"q{i}"] = generate_from_prefix(
            params, TINY, caches[i % 2], sfx, n, spec, probe)[0]
    eos = plain["q0"][2]
    gen = GenerateConfig(max_new_tokens=9, eos_token_ids=(eos,))
    want = {r.rid: generate_from_prefix(
        params, TINY, caches[r.page], r.suffix_embeds, r.suffix_valid, spec,
        gen)[0] for r in reqs}
    pool = make_prefix_pool(TINY, spec, caches)
    got, _ = serve_continuous_paged_spec(
        params, TINY, pool, reqs, spec, gen, batch_slots=2, spec_decode_k=3,
    )
    assert got == want


def test_continuous_spec_tight_ring_wave_resets():
    """ring_dispatches == max_new-1 (the minimum): admission only fits at
    d=0, so the pool degenerates to grouped waves with RING REUSE between
    waves — slots' acceptance masks and tail writes from the previous wave
    must not leak into the next (admission resets the mask row; the causal
    window bounds reads to freshly written slots)."""
    params, reqs = _requests(5, seed=6)
    gen = GenerateConfig(max_new_tokens=6, eos_token_ids=())
    want = _per_sample(params, reqs, gen)
    got, stats = serve_continuous_spec(
        params, TINY, reqs, _spec(), gen, batch_slots=2, spec_decode_k=3,
        ring_dispatches=gen.max_new_tokens - 1,
    )
    assert got == want
    # 5 requests / 2 slots with admission only at wave starts -> >= 3 waves
    assert stats["n_verify_dispatches"] >= 3


def test_continuous_spec_prefix_requests():
    """PrefixRequest admission (suffix extension) through the spec pool:
    questions of two videos interleave, zero in-pool prefills, exact."""
    params = qwen2.init_params(TINY, jax.random.key(0))
    rng = np.random.default_rng(7)
    spec = _spec()
    sys_len, s_sfx = 4, 16
    caches = []
    for _ in range(2):
        emb = np.zeros((1, S_FULL, TINY.hidden_size), np.float32)
        emb[0, : sys_len + NV] = rng.normal(
            size=(sys_len + NV, TINY.hidden_size)) * 0.2
        caches.append(prefix_prefill(
            params, TINY, jnp.asarray(emb), sys_len + NV, sys_len, spec))
    gen = GenerateConfig(max_new_tokens=7, eos_token_ids=())
    reqs, want = [], {}
    for i in range(5):
        cache = caches[i % 2]
        n = 6 + (i % 3)
        sfx = np.zeros((1, s_sfx, TINY.hidden_size), np.float32)
        sfx[0, :n] = rng.normal(size=(n, TINY.hidden_size)) * 0.2
        sfx = jnp.asarray(sfx)
        rid = f"q{i}"
        reqs.append(PrefixRequest(rid=rid, prefix_cache=cache,
                                  suffix_embeds=sfx, suffix_valid=n))
        want[rid] = generate_from_prefix(params, TINY, cache, sfx, n, spec,
                                         gen)[0]
    got, stats = serve_continuous_spec(params, TINY, reqs, spec, gen,
                                       batch_slots=2, spec_decode_k=3)
    assert got == want
    assert stats["n_prefills"] == 0 and stats["n_extends"] == 5
