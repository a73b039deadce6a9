"""Batched speculative decoding (runtime/generate.py
build_verify_chunk_batch / _batched_spec_decode): head-packed batching x
multi-token verify — one dispatch scores B*k candidate tokens. Greedy
acceptance makes every emitted token the model's own argmax, so outputs
must be IDENTICAL to plain batched greedy decode for ANY drafter (good,
bad, or adversarial); only speed differs."""

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "float32")

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY, TINY_MROPE
from sttm_tpu.runtime.generate import (
    GenerateConfig,
    generate,
    generate_batch,
    generate_batch_from_prefix,
    prefix_prefill,
    spec_from_pattern,
)

T, H, W = 4, 4, 4
NV = T * H * W
SYS = 5
S_FULL = 128
GEN = GenerateConfig(max_new_tokens=8, eos_token_ids=())


def _spec():
    return spec_from_pattern("quadtree", T, H, W, sa_tree_thresh=0.95,
                             sa_tree_temporal_thresh=0.6)


def _batch(cfg, n, seed=0):
    params = qwen2.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(seed)
    d = cfg.hidden_size
    embs, valids = [], []
    for i in range(n):
        valid = SYS + NV + 9 + (i % 3)
        e = np.zeros((1, S_FULL, d), np.float32)
        e[0, :valid] = rng.normal(size=(valid, d)) * 0.2
        embs.append(e)
        valids.append(valid)
    return params, jnp.asarray(np.concatenate(embs), cfg.dtype), valids


def _oracle_drafter(want):
    """Per-row oracle: histories are seeded with [row_index], so the drafter
    can look up the row's true continuation — exercises FULL acceptance."""

    def drafter(history, n):
        r = history[0]
        m = len(history) - 1  # tokens generated so far (after the seed)
        nxt = want[r][m : m + n]
        while len(nxt) < n:
            nxt = nxt + [history[-1]]
        return nxt

    return drafter


def _adversarial_drafter(history, n):
    """Always-wrong drafts — exercises ZERO acceptance."""
    return [(history[-1] + 1) % 250] * n


def test_batched_spec_matches_plain_ngram():
    params, embeds, valids = _batch(TINY, 3)
    spec = _spec()
    want, _ = generate_batch(params, TINY, embeds, valids, [SYS] * 3, spec, GEN)
    got, rt = generate_batch(params, TINY, embeds, valids, [SYS] * 3, spec,
                             GEN, spec_decode_k=4)
    assert got == want
    assert rt["spec_dispatches"] >= 1 and rt["spec_drafted"] > 0


def test_batched_spec_oracle_full_acceptance():
    """With an oracle drafter every draft is accepted: tokens still match,
    and dispatch count collapses to ~max_new/k."""
    params, embeds, valids = _batch(TINY, 3, seed=1)
    spec = _spec()
    want, _ = generate_batch(params, TINY, embeds, valids, [SYS] * 3, spec, GEN)
    k = 4
    got, rt = generate_batch(
        params, TINY, embeds, valids, [SYS] * 3, spec, GEN, spec_decode_k=k,
        histories=[[r] for r in range(3)], draft_fn=_oracle_drafter(want),
    )
    assert got == want
    assert rt["spec_accepted"] == rt["spec_drafted"]
    assert rt["spec_dispatches"] <= -(-(GEN.max_new_tokens - 1) // k) + 1


def test_batched_spec_adversarial_zero_acceptance():
    params, embeds, valids = _batch(TINY, 2, seed=2)
    spec = _spec()
    want, _ = generate_batch(params, TINY, embeds, valids, [SYS] * 2, spec, GEN)
    got, rt = generate_batch(
        params, TINY, embeds, valids, [SYS] * 2, spec, GEN, spec_decode_k=3,
        draft_fn=_adversarial_drafter,
    )
    assert got == want
    assert rt["spec_accepted"] == 0
    # one accepted token per dispatch: max_new - 1 dispatches
    assert rt["spec_dispatches"] == GEN.max_new_tokens - 1


def test_batched_spec_eos_freeze():
    """A row hitting EOS mid-run freezes while others continue; its output
    matches the plain batched run (which applies the same EOS)."""
    params, embeds, valids = _batch(TINY, 3, seed=3)
    spec = _spec()
    probe, _ = generate_batch(params, TINY, embeds, valids, [SYS] * 3, spec, GEN)
    eos = probe[0][2]  # row 0's third token ends row 0 early
    gen = GenerateConfig(max_new_tokens=8, eos_token_ids=(eos,))
    want, _ = generate_batch(params, TINY, embeds, valids, [SYS] * 3, spec, gen)
    got, _ = generate_batch(params, TINY, embeds, valids, [SYS] * 3, spec,
                            gen, spec_decode_k=4)
    assert got == want


def test_batched_spec_from_prefix():
    """All three serving levers composed: one video prefill + per-question
    extensions + batched verify — tokens match per-question full prefill."""
    cfg = TINY
    spec = _spec()
    params = qwen2.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(5)
    d = cfg.hidden_size
    s_sfx = 16
    prefix = np.zeros((1, S_FULL, d), np.float32)
    prefix[0, : SYS + NV] = rng.normal(size=(SYS + NV, d)) * 0.2
    insts = [rng.normal(size=(n, d)) * 0.2 for n in (7, 12, 9)]

    wants = []
    for inst in insts:
        e = prefix.copy()
        e[0, SYS + NV : SYS + NV + len(inst)] = inst
        ids, _ = generate(params, cfg, jnp.asarray(e, cfg.dtype),
                          SYS + NV + len(inst), SYS, spec, GEN)
        wants.append(ids)

    cache = prefix_prefill(params, cfg, jnp.asarray(prefix, cfg.dtype),
                           SYS + NV, SYS, spec)
    sfx = np.zeros((3, s_sfx, d), np.float32)
    for i, inst in enumerate(insts):
        sfx[i, : len(inst)] = inst
    got, rt = generate_batch_from_prefix(
        params, cfg, cache, jnp.asarray(sfx, cfg.dtype),
        [len(i) for i in insts], spec, GEN, spec_decode_k=4,
    )
    assert got == wants
    assert rt["prefix_cached"] and rt["spec_dispatches"] >= 1


def test_batched_spec_cascade():
    """cascade=True + spec_decode_k: the verify dispatches keep ONE shared
    prefix copy (build_verify_chunk_cascade) — tokens must still match the
    per-question full-prefill path exactly."""
    cfg = TINY
    spec = _spec()
    params = qwen2.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(9)
    d = cfg.hidden_size
    s_sfx = 16
    prefix = np.zeros((1, S_FULL, d), np.float32)
    prefix[0, : SYS + NV] = rng.normal(size=(SYS + NV, d)) * 0.2
    insts = [rng.normal(size=(n, d)) * 0.2 for n in (7, 12, 9)]

    wants = []
    for inst in insts:
        e = prefix.copy()
        e[0, SYS + NV : SYS + NV + len(inst)] = inst
        ids, _ = generate(params, cfg, jnp.asarray(e, cfg.dtype),
                          SYS + NV + len(inst), SYS, spec, GEN)
        wants.append(ids)

    cache = prefix_prefill(params, cfg, jnp.asarray(prefix, cfg.dtype),
                           SYS + NV, SYS, spec)
    sfx = np.zeros((3, s_sfx, d), np.float32)
    for i, inst in enumerate(insts):
        sfx[i, : len(inst)] = inst
    got, rt = generate_batch_from_prefix(
        params, cfg, cache, jnp.asarray(sfx, cfg.dtype),
        [len(i) for i in insts], spec, GEN, cascade=True, spec_decode_k=4,
    )
    assert got == wants
    assert rt["prefix_cached"] and rt["spec_dispatches"] >= 1


def test_batched_spec_mrope():
    params, embeds, valids = _batch(TINY_MROPE, 2, seed=6)
    spec = _spec()
    pos = jnp.broadcast_to(jnp.arange(S_FULL, dtype=jnp.int32)[None],
                           (3, S_FULL))
    pos_b = jnp.broadcast_to(pos[None], (2, 3, S_FULL))
    want, _ = generate_batch(params, TINY_MROPE, embeds, valids, [SYS] * 2,
                             spec, GEN, position_ids=pos_b)
    got, _ = generate_batch(params, TINY_MROPE, embeds, valids, [SYS] * 2,
                            spec, GEN, position_ids=pos_b, spec_decode_k=3)
    assert got == want
