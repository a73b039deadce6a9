"""Prefix caching (runtime/generate.py: prefix_prefill / build_extend /
generate_from_prefix): the [sys|video] prefill — merge included — is
question-independent (causal attention), so its cache is exactly reusable
across questions of the same video. Token-exactness vs the full prefill
path, and cache purity under reuse."""

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "float32")

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY, TINY_MROPE
from sttm_tpu.runtime.generate import (
    GenerateConfig,
    generate,
    generate_from_prefix,
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


def _spec(kind):
    if kind is None:
        return None
    return spec_from_pattern("quadtree", T, H, W, sa_tree_thresh=0.95,
                             sa_tree_temporal_thresh=0.6)


def _run_pair(cfg, spec, seed=0):
    params, rng, video, sys_e = _setup(cfg, seed)
    inst = rng.normal(size=(11, cfg.hidden_size)) * 0.2
    valid = SYS + NV + len(inst)
    # M-RoPE needs [3, S] ids (all-equal rows = a valid text-style layout)
    pos = None
    if cfg.mrope_section:
        pos = jnp.broadcast_to(jnp.arange(S_FULL, dtype=jnp.int32)[None], (3, S_FULL))

    full = _full_embeds(cfg, sys_e, video, inst, cfg.dtype)
    want_ids, want_rt = generate(
        params, cfg, full, valid, SYS, spec, GEN, position_ids=pos
    )

    prefix = _full_embeds(cfg, sys_e, video, np.zeros((0, cfg.hidden_size)), cfg.dtype)
    cache = prefix_prefill(params, cfg, prefix, SYS + NV, SYS, spec, position_ids=pos)
    got_ids, got_rt = generate_from_prefix(
        params, cfg, cache, _suffix_embeds(cfg, inst, cfg.dtype), len(inst), spec, GEN
    )
    return want_ids, got_ids, want_rt, got_rt


def test_prefix_cached_matches_full_no_reducer():
    want, got, _, _ = _run_pair(TINY, None)
    assert want == got


def test_prefix_cached_matches_full_quadtree():
    want, got, want_rt, got_rt = _run_pair(TINY, _spec("quadtree"))
    assert want == got
    assert got_rt["merged_len"] == want_rt["merged_len"]
    assert got_rt["prefix_cached"]


def test_prefix_cached_matches_full_mrope():
    want, got, _, _ = _run_pair(TINY_MROPE, _spec("quadtree"))
    assert want == got


def test_prefix_rejects_score_based_reducers():
    """FastV ranks video tokens by the LAST prompt token's attention (the
    last instruction token in the reference); a [sys|video] prefix ends at
    the video, so caching it would silently rank by the wrong token —
    prefix_prefill must refuse."""
    import pytest

    from sttm_tpu.runtime.reducer import ReducerSpec

    params, rng, video, sys_e = _setup(TINY)
    prefix = _full_embeds(TINY, sys_e, video, np.zeros((0, TINY.hidden_size)),
                          TINY.dtype)
    fastv = ReducerSpec(kind="fastv", layer_idx=2, t=T, h=H, w=W,
                        prune_ratio=0.5)
    with pytest.raises(ValueError, match="fastv"):
        prefix_prefill(params, TINY, prefix, SYS + NV, SYS, fastv)


def test_batched_from_prefix_matches_per_sample():
    """generate_batch_from_prefix: all questions of a video batched over one
    shared prefix cache (head-packed decode) — token-exact vs per-question
    full prefill, at decode chunk sizes 1 and 3."""
    from sttm_tpu.runtime.generate import generate_batch_from_prefix

    cfg = TINY
    spec = _spec("quadtree")
    params, rng, video, sys_e = _setup(cfg, seed=5)
    insts = [rng.normal(size=(n, cfg.hidden_size)) * 0.2 for n in (7, 12, 9)]

    wants = []
    for inst in insts:
        full = _full_embeds(cfg, sys_e, video, inst, cfg.dtype)
        ids, _ = generate(params, cfg, full, SYS + NV + len(inst), SYS, spec, GEN)
        wants.append(ids)

    cache = prefix_prefill(
        params, cfg,
        _full_embeds(cfg, sys_e, video, np.zeros((0, cfg.hidden_size)), cfg.dtype),
        SYS + NV, SYS, spec,
    )
    sfx = jnp.concatenate([_suffix_embeds(cfg, i, cfg.dtype) for i in insts])
    for chunk in (1, 3):
        got, rt = generate_batch_from_prefix(
            params, cfg, cache, sfx, [len(i) for i in insts], spec, GEN,
            decode_chunk_size=chunk,
        )
        assert got == wants, f"chunk={chunk}"
        assert rt["prefix_cached"] and len(rt["merged_len"]) == 3


def test_prefix_cache_reuse_is_pure():
    """One prefix cache, three questions; re-asking question 1 after
    question 2 must reproduce its answer (no cache mutation leaks)."""
    cfg = TINY
    spec = _spec("quadtree")
    params, rng, video, sys_e = _setup(cfg, seed=3)
    cache = prefix_prefill(
        params, cfg,
        _full_embeds(cfg, sys_e, video, np.zeros((0, cfg.hidden_size)), cfg.dtype),
        SYS + NV, SYS, spec,
    )

    insts = [rng.normal(size=(n, cfg.hidden_size)) * 0.2 for n in (7, 12, 7)]
    runs = []
    for inst in insts + [insts[0]]:
        ids, _ = generate_from_prefix(
            params, cfg, cache, _suffix_embeds(cfg, inst, cfg.dtype), len(inst),
            spec, GEN,
        )
        runs.append(ids)
    assert runs[3] == runs[0]  # cache untouched by intervening questions

    # and each matches its own full-prefill run
    for inst, got in zip(insts, runs[:3]):
        full = _full_embeds(cfg, sys_e, video, inst, cfg.dtype)
        want, _ = generate(params, cfg, full, SYS + NV + len(inst), SYS, spec, GEN)
        assert want == got
