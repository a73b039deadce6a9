"""Cascade batched prefix serving (runtime/generate.py cascade=True,
qwen2.cascade_attention/cascade_decode_layers): ONE shared read-only prefix
cache + small head-packed per-row suffix tails, merged per layer with the
exact online-softmax combine. Must match the flat batched prefix path (B
full cache copies) token-for-token, and must leave the prefix cache
reusable (nothing donates or mutates it)."""

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "float32")

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY, TINY_MROPE
from sttm_tpu.runtime.generate import (
    GenerateConfig,
    generate,
    generate_batch_from_prefix,
    prefix_prefill,
    spec_from_pattern,
)

T, H, W = 4, 4, 4
NV = T * H * W
SYS = 5
S_SFX = 16
S_FULL = 128
GEN = GenerateConfig(max_new_tokens=6, eos_token_ids=())


def _setup(cfg, seed=0):
    params = qwen2.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(seed)
    d = cfg.hidden_size
    video = rng.normal(size=(NV, d)) * 0.2
    sys_e = rng.normal(size=(SYS, d)) * 0.2
    return params, rng, video, sys_e


def _full_embeds(cfg, sys_e, video, inst, dtype):
    d = cfg.hidden_size
    emb = np.zeros((1, S_FULL, d), np.float32)
    emb[0, :SYS] = sys_e
    emb[0, SYS : SYS + NV] = video
    emb[0, SYS + NV : SYS + NV + len(inst)] = inst
    return jnp.asarray(emb, dtype)


def _suffix_embeds(cfg, inst, dtype):
    d = cfg.hidden_size
    emb = np.zeros((1, S_SFX, d), np.float32)
    emb[0, : len(inst)] = inst
    return jnp.asarray(emb, dtype)


def _quadtree_spec():
    return spec_from_pattern("quadtree", T, H, W, sa_tree_thresh=0.95,
                             sa_tree_temporal_thresh=0.6)


def _prefix_cache(params, cfg, sys_e, video, spec, pos=None):
    prefix = _full_embeds(cfg, sys_e, video, np.zeros((0, cfg.hidden_size)),
                          cfg.dtype)
    return prefix_prefill(params, cfg, prefix, SYS + NV, SYS, spec,
                          position_ids=pos)


def _run_pair(cfg, spec, seed, chunk, pos=None):
    params, rng, video, sys_e = _setup(cfg, seed)
    insts = [rng.normal(size=(n, cfg.hidden_size)) * 0.2 for n in (7, 12, 9)]
    cache = _prefix_cache(params, cfg, sys_e, video, spec, pos)
    sfx = jnp.concatenate([_suffix_embeds(cfg, i, cfg.dtype) for i in insts])
    lens = [len(i) for i in insts]
    flat_ids, flat_rt = generate_batch_from_prefix(
        params, cfg, cache, sfx, lens, spec, GEN, decode_chunk_size=chunk,
    )
    casc_ids, casc_rt = generate_batch_from_prefix(
        params, cfg, cache, sfx, lens, spec, GEN, decode_chunk_size=chunk,
        cascade=True,
    )
    return flat_ids, casc_ids, flat_rt, casc_rt, (params, cfg, cache, sfx,
                                                  lens, spec)


def test_cascade_matches_flat_quadtree():
    flat, casc, flat_rt, casc_rt, _ = _run_pair(TINY, _quadtree_spec(), 0, 1)
    assert casc == flat
    assert casc_rt["merged_len"] == flat_rt["merged_len"]
    assert casc_rt["full_len"] == flat_rt["full_len"]
    assert casc_rt["budget_overflow"] == flat_rt["budget_overflow"]
    assert casc_rt["prefix_cached"]


def test_cascade_matches_flat_no_reducer():
    flat, casc, _, _, _ = _run_pair(TINY, None, 1, 1)
    assert casc == flat


def test_cascade_matches_flat_chunked():
    flat, casc, _, _, _ = _run_pair(TINY, _quadtree_spec(), 2, 3)
    assert casc == flat


def test_cascade_matches_flat_mrope():
    """M-RoPE family: position-gathering merge + per-row rope-delta decode
    bases through the cascade layout."""
    pos = jnp.broadcast_to(jnp.arange(S_FULL, dtype=jnp.int32)[None],
                           (3, S_FULL))
    flat, casc, _, _, _ = _run_pair(TINY_MROPE, _quadtree_spec(), 3, 1,
                                    pos=pos)
    assert casc == flat


def test_cascade_leaves_prefix_reusable():
    """The cascade decode loop must not donate or mutate the shared prefix:
    a per-sample question answered before and after a cascade run (and a
    second cascade run itself) must reproduce identical tokens."""
    from sttm_tpu.runtime.generate import generate_from_prefix

    spec = _quadtree_spec()
    cfg = TINY
    params, rng, video, sys_e = _setup(cfg, seed=4)
    cache = _prefix_cache(params, cfg, sys_e, video, spec)
    probe = rng.normal(size=(8, cfg.hidden_size)) * 0.2
    insts = [rng.normal(size=(n, cfg.hidden_size)) * 0.2 for n in (7, 12)]
    sfx = jnp.concatenate([_suffix_embeds(cfg, i, cfg.dtype) for i in insts])
    lens = [len(i) for i in insts]

    before, _ = generate_from_prefix(
        params, cfg, cache, _suffix_embeds(cfg, probe, cfg.dtype), len(probe),
        spec, GEN,
    )
    run1, _ = generate_batch_from_prefix(
        params, cfg, cache, sfx, lens, spec, GEN, cascade=True,
    )
    run2, _ = generate_batch_from_prefix(
        params, cfg, cache, sfx, lens, spec, GEN, cascade=True,
    )
    after, _ = generate_from_prefix(
        params, cfg, cache, _suffix_embeds(cfg, probe, cfg.dtype), len(probe),
        spec, GEN,
    )
    assert run1 == run2
    assert before == after


def test_cascade_matches_per_sample_full_prefill():
    """End-to-end anchor: cascade batched answers equal per-question FULL
    prefill answers (not just the flat batched path)."""
    spec = _quadtree_spec()
    cfg = TINY
    params, rng, video, sys_e = _setup(cfg, seed=5)
    insts = [rng.normal(size=(n, cfg.hidden_size)) * 0.2 for n in (7, 12, 9)]

    wants = []
    for inst in insts:
        full = _full_embeds(cfg, sys_e, video, inst, cfg.dtype)
        ids, _ = generate(params, cfg, full, SYS + NV + len(inst), SYS, spec,
                          GEN)
        wants.append(ids)

    cache = _prefix_cache(params, cfg, sys_e, video, spec)
    sfx = jnp.concatenate([_suffix_embeds(cfg, i, cfg.dtype) for i in insts])
    got, _ = generate_batch_from_prefix(
        params, cfg, cache, sfx, [len(i) for i in insts], spec, GEN,
        cascade=True,
    )
    assert got == wants
