"""Cascade x continuous batching (runtime/serving.py serve_continuous_paged):
a paged prefix pool holds each video's [sys|video] prefill ONCE; slots carry
page indices, admission extends straight from the pool page into the slot's
tail (qwen2.paged_extend_layers), and decode reads each page once per step
(qwen2.paged_cascade_attention). Every answer must match its per-sample
generate_from_prefix (and thus full-prefill) output."""

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "float32")

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.runtime.generate import (
    GenerateConfig,
    generate_from_prefix,
    prefix_prefill,
)
from sttm_tpu.runtime.reducer import ReducerSpec
from sttm_tpu.runtime.serving import (
    PagedRequest,
    make_prefix_pool,
    serve_continuous_paged,
)

T, H, W = 4, 4, 4
NV = T * H * W
SYS = 4
S_FULL, S_SFX = 96, 16
SPEC = ReducerSpec(
    kind="quadtree", layer_idx=2, t=T, h=H, w=W, video_budget=NV // 2,
    spatial_thresh=0.85, temporal_thresh=0.65, root_level=0,
)


def _setup(n_videos, n_questions, seed=0):
    params = qwen2.init_params(TINY, jax.random.key(0))
    rng = np.random.default_rng(seed)
    caches = []
    for _ in range(n_videos):
        emb = np.zeros((1, S_FULL, TINY.hidden_size), np.float32)
        emb[0, : SYS + NV] = rng.normal(size=(SYS + NV, TINY.hidden_size)) * 0.2
        caches.append(prefix_prefill(
            params, TINY, jnp.asarray(emb), SYS + NV, SYS, SPEC,
        ))
    reqs = []
    for i in range(n_questions):
        n = 6 + (i % 3)
        sfx = np.zeros((1, S_SFX, TINY.hidden_size), np.float32)
        sfx[0, :n] = rng.normal(size=(n, TINY.hidden_size)) * 0.2
        reqs.append(PagedRequest(rid=f"q{i}", page=i % n_videos,
                                 suffix_embeds=jnp.asarray(sfx),
                                 suffix_valid=n))
    return params, caches, reqs


def _per_sample(params, caches, reqs, gen):
    want = {}
    for r in reqs:
        ids, _ = generate_from_prefix(
            params, TINY, caches[r.page], r.suffix_embeds, r.suffix_valid,
            SPEC, gen,
        )
        want[r.rid] = ids
    return want


def test_paged_pool_matches_per_sample():
    """Questions of 2 videos interleave through a 2-slot pool over a 2-page
    prefix pool; concurrent slots reference DIFFERENT pages."""
    params, caches, reqs = _setup(2, 5)
    gen = GenerateConfig(max_new_tokens=7, eos_token_ids=())
    want = _per_sample(params, caches, reqs, gen)
    pool = make_prefix_pool(TINY, SPEC, caches)
    got, stats = serve_continuous_paged(
        params, TINY, pool, reqs, SPEC, gen, batch_slots=2,
        decode_chunk_size=3,
    )
    assert got == want
    assert stats["n_extends"] == 5 and stats["n_pool_pages"] == 2
    assert stats["total_tokens"] == sum(len(v) for v in want.values())


def test_paged_mid_wave_admission():
    """An early EOS retires a slot mid-wave; the next request is admitted at
    a nonzero global step (admit_step masks the previous occupant's tail
    K/V) and must still match its per-sample output exactly."""
    params, caches, reqs = _setup(3, 5, seed=3)
    probe = GenerateConfig(max_new_tokens=10, eos_token_ids=())
    plain = _per_sample(params, caches, reqs, probe)
    eos = plain["q0"][2]  # q0 finishes early, later rows keep going
    gen = GenerateConfig(max_new_tokens=10, eos_token_ids=(eos,))
    want = _per_sample(params, caches, reqs, gen)
    pool = make_prefix_pool(TINY, SPEC, caches)
    got, stats = serve_continuous_paged(
        params, TINY, pool, reqs, SPEC, gen, batch_slots=2,
        decode_chunk_size=4,
    )
    assert got == want
    assert stats["n_decode_chunks"] >= 3  # continuous, not grouped


def test_paged_pool_mrope_matches_per_sample():
    """M-RoPE trunk (TINY_MROPE): pool admission keeps ORIGINAL positions
    (pos_base[p] + j, get_rope_index rope-delta semantics) and decode
    advances all three rope rows together — still token-exact."""
    from sttm_tpu.models.config import TINY_MROPE

    cfg = TINY_MROPE
    params = qwen2.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(8)
    pos = jnp.broadcast_to(jnp.arange(S_FULL, dtype=jnp.int32)[None], (3, S_FULL))
    caches = []
    for _ in range(2):
        emb = np.zeros((1, S_FULL, cfg.hidden_size), np.float32)
        emb[0, : SYS + NV] = rng.normal(size=(SYS + NV, cfg.hidden_size)) * 0.2
        caches.append(prefix_prefill(
            params, cfg, jnp.asarray(emb, cfg.dtype), SYS + NV, SYS, SPEC,
            position_ids=pos,
        ))
    reqs = []
    for i in range(4):
        n = 5 + (i % 3)
        sfx = np.zeros((1, S_SFX, cfg.hidden_size), np.float32)
        sfx[0, :n] = rng.normal(size=(n, cfg.hidden_size)) * 0.2
        reqs.append(PagedRequest(rid=f"q{i}", page=i % 2,
                                 suffix_embeds=jnp.asarray(sfx, cfg.dtype),
                                 suffix_valid=n))
    gen = GenerateConfig(max_new_tokens=6, eos_token_ids=())
    want = {r.rid: generate_from_prefix(
        params, cfg, caches[r.page], r.suffix_embeds, r.suffix_valid,
        SPEC, gen)[0] for r in reqs}
    pool = make_prefix_pool(cfg, SPEC, caches)
    got, _ = serve_continuous_paged(
        params, cfg, pool, reqs, SPEC, gen, batch_slots=2,
        decode_chunk_size=2,
    )
    assert got == want


def test_paged_pool_int8_bounded():
    """int8 prefix pool (make_prefix_pool(int8=True)): pages are quantized
    once with per-(position, head) scales — half the pool HBM and prefix
    read traffic. Outputs are a bounded approximation of the bf16 pool:
    the serving loop must run end to end, buffers must actually be int8,
    and greedy tokens should overwhelmingly agree with the exact path on
    well-separated logits."""
    import jax.numpy as jnp2

    params, caches, reqs = _setup(2, 4, seed=9)
    gen = GenerateConfig(max_new_tokens=7, eos_token_ids=())
    want = _per_sample(params, caches, reqs, gen)
    pool = make_prefix_pool(TINY, SPEC, list(caches), int8=True)
    assert all(k.dtype == jnp2.int8 for k in pool.ks)
    assert pool.k_scales is not None and pool.k_scales[0].dtype == jnp2.float32
    got, stats = serve_continuous_paged(
        params, TINY, pool, reqs, SPEC, gen, batch_slots=2,
        decode_chunk_size=3,
    )
    assert stats["n_extends"] == 4
    total = agree = 0
    for rid, ids in got.items():
        for a, b_ in zip(ids, want[rid]):
            total += 1
            agree += a == b_
    assert agree / total >= 0.8, f"int8 pool token agreement {agree}/{total}"

    # spec pool over the int8 pages also runs (verify dispatches dequant)
    from sttm_tpu.runtime.serving import serve_continuous_paged_spec

    got2, stats2 = serve_continuous_paged_spec(
        params, TINY, pool, reqs, SPEC, gen, batch_slots=2, spec_decode_k=3,
    )
    assert stats2["n_extends"] == 4
    assert got2 == got  # decode and verify dequantize identically (greedy)


def test_paged_single_page_matches_cascade_semantics():
    """P=1 degenerates to the plain cascade layout (one shared prefix);
    single slot degenerates further to sequential — both stay exact."""
    params, caches, reqs = _setup(1, 3, seed=5)
    gen = GenerateConfig(max_new_tokens=6, eos_token_ids=())
    want = _per_sample(params, caches, reqs, gen)
    pool = make_prefix_pool(TINY, SPEC, caches)
    got, _ = serve_continuous_paged(
        params, TINY, pool, reqs, SPEC, gen, batch_slots=1,
        decode_chunk_size=2,
    )
    assert got == want
