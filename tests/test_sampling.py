"""Sampling (runtime/sampling.py): temperature / top-k / top-p semantics,
determinism, and integration with generate()'s per-step decode path.

The reference evaluates greedy (do_sample=False,
eval_vidqa_by_feat_llavavideo.py:167); sampling extends the serving surface.
"""

import numpy as np

import jax
import jax.numpy as jnp

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.runtime.generate import GenerateConfig, generate
from sttm_tpu.runtime.reducer import ReducerSpec
from sttm_tpu.runtime.sampling import SamplingParams, sample_fn, select_token


def _draws(logits, n, top_k=0, top_p=1.0, temperature=1.0, seed=0):
    fn = sample_fn(top_k, top_p < 1.0)
    base = jax.random.key(seed)
    lg = jnp.asarray(logits, jnp.float32)[None, :]
    return [
        int(fn(lg, jax.random.fold_in(base, i), jnp.float32(temperature),
               jnp.float32(top_p))[0])
        for i in range(n)
    ]


def test_low_temperature_concentrates_on_argmax():
    logits = np.array([1.0, 3.0, 2.0, -1.0])
    assert set(_draws(logits, 20, temperature=0.01)) == {1}


def test_top_k_1_is_greedy_at_any_temperature():
    logits = np.array([1.0, 3.0, 2.0, -1.0])
    assert set(_draws(logits, 20, top_k=1, temperature=5.0)) == {1}


def test_top_k_restricts_support():
    logits = np.array([5.0, 4.9, 4.8, 4.7, -10.0])
    got = set(_draws(logits, 200, top_k=3, temperature=2.0))
    assert got <= {0, 1, 2} and len(got) > 1


def test_top_p_keeps_smallest_prefix_reaching_p():
    # probs ~ [0.5, 0.3, 0.15, 0.05]; exclusive cumsum [0, .5, .8, .95]
    # -> top_p=0.8 keeps {0, 1} (HF semantics: smallest set with mass >= p)
    probs = np.array([0.5, 0.3, 0.15, 0.05])
    logits = np.log(probs)
    got = set(_draws(logits, 300, top_p=0.8, temperature=1.0))
    assert got == {0, 1}


def test_top_p_tiny_is_greedy():
    logits = np.array([1.0, 3.0, 2.0, -1.0])
    assert set(_draws(logits, 20, top_p=1e-6, temperature=5.0)) == {1}


def test_same_seed_replays_exactly():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=64)
    a = _draws(logits, 16, top_k=8, top_p=0.9, seed=7)
    b = _draws(logits, 16, top_k=8, top_p=0.9, seed=7)
    c = _draws(logits, 16, top_k=8, top_p=0.9, seed=8)
    assert a == b
    assert a != c  # 16 iid draws over ~8 candidates collide with prob ~0


def test_select_token_greedy_paths():
    logits = jnp.asarray([[1.0, 3.0, 2.0]])
    assert int(select_token(logits, None)[0]) == 1
    assert int(select_token(logits, SamplingParams())[0]) == 1  # temp 0


def _case(seed=0):
    params = qwen2.init_params(TINY, jax.random.key(0))
    rng = np.random.default_rng(seed)
    t, h, w = 4, 4, 4
    nv = t * h * w
    valid = 4 + nv + 8
    s_full = 96
    emb = np.zeros((1, s_full, TINY.hidden_size), np.float32)
    emb[0, :valid] = rng.normal(size=(valid, TINY.hidden_size)) * 0.2
    spec = ReducerSpec(
        kind="quadtree", layer_idx=2, t=t, h=h, w=w, video_budget=nv // 2,
        spatial_thresh=0.85, temporal_thresh=0.65, root_level=0,
    )
    return params, jnp.asarray(emb), valid, 4, spec


def test_generate_sampling_topk1_matches_greedy():
    params, emb, valid, vs, spec = _case()
    greedy = GenerateConfig(max_new_tokens=9, eos_token_ids=())
    ref, _ = generate(params, TINY, emb, valid, vs, spec, greedy)
    sampled = GenerateConfig(
        max_new_tokens=9, eos_token_ids=(),
        sampling=SamplingParams(temperature=1.0, top_k=1),
    )
    got, _ = generate(params, TINY, emb, valid, vs, spec, sampled)
    assert got == ref


def test_generate_sampling_seed_deterministic():
    params, emb, valid, vs, spec = _case()
    mk = lambda seed: GenerateConfig(
        max_new_tokens=9, eos_token_ids=(),
        sampling=SamplingParams(temperature=1.5, top_k=0, top_p=0.95,
                                seed=seed),
    )
    a, rt = generate(params, TINY, emb, valid, vs, spec, mk(3))
    b, _ = generate(params, TINY, emb, valid, vs, spec, mk(3))
    assert a == b
    assert rt["num_dec_token"] == 9
    # chunked/speculative requests fall back to per-step sampling unchanged
    c, _ = generate(params, TINY, emb, valid, vs, spec, mk(3),
                    decode_chunk_size=4, spec_decode_k=3)
    assert c == a


def test_generate_from_prefix_sampling():
    from sttm_tpu.runtime.generate import generate_from_prefix, prefix_prefill

    params, emb, valid, vs, spec = _case()
    pfx_valid = 4 + 64  # sys + video only
    cache = prefix_prefill(params, TINY, emb[:, :80], pfx_valid, vs, spec)
    rng = np.random.default_rng(5)
    sfx = np.zeros((1, 16, TINY.hidden_size), np.float32)
    sfx[0, :8] = rng.normal(size=(8, TINY.hidden_size)) * 0.2
    gen = GenerateConfig(
        max_new_tokens=7, eos_token_ids=(),
        sampling=SamplingParams(temperature=1.2, top_p=0.9, seed=11),
    )
    a, rt = generate_from_prefix(params, TINY, cache, jnp.asarray(sfx), 8,
                                 spec, gen)
    cache2 = prefix_prefill(params, TINY, emb[:, :80], pfx_valid, vs, spec)
    b, _ = generate_from_prefix(params, TINY, cache2, jnp.asarray(sfx), 8,
                                spec, gen)
    assert a == b and len(a) == 7


def test_generate_batch_sampling_chunk_invariant():
    """Batched on-device sampling folds the GLOBAL step index into the key,
    so chunk size must not change the drawn tokens; top_k=1 must equal the
    greedy program's output."""
    from sttm_tpu.runtime.generate import generate_batch

    params, emb, valid, vs, spec = _case()
    b = 3
    embs = jnp.concatenate([emb] * b)
    vls = [valid, valid - 2, valid - 1]
    vss = [4] * b

    greedy = GenerateConfig(max_new_tokens=8, eos_token_ids=())
    ref, _ = generate_batch(params, TINY, embs, vls, vss, spec, greedy,
                            decode_chunk_size=4)

    topk1 = GenerateConfig(
        max_new_tokens=8, eos_token_ids=(),
        sampling=SamplingParams(temperature=1.0, top_k=1),
    )
    got, _ = generate_batch(params, TINY, embs, vls, vss, spec, topk1,
                            decode_chunk_size=4)
    assert got == ref

    samp = GenerateConfig(
        max_new_tokens=8, eos_token_ids=(),
        sampling=SamplingParams(temperature=1.5, top_p=0.95, seed=9),
    )
    a, _ = generate_batch(params, TINY, embs, vls, vss, spec, samp,
                          decode_chunk_size=1)
    c, _ = generate_batch(params, TINY, embs, vls, vss, spec, samp,
                          decode_chunk_size=4)
    assert a == c  # global-step key folding: chunking cannot change draws
    assert a != ref  # and at temperature 1.5 it is not the greedy chain


def test_generate_batch_from_prefix_sampling_layouts():
    """Sampled batched serving draws identically on the flat and cascade
    layouts up to near-ties (CPU fp32: exactly), and replays by seed."""
    from sttm_tpu.runtime.generate import (
        generate_batch_from_prefix,
        prefix_prefill,
    )

    params, emb, valid, vs, spec = _case()
    pfx_valid = 4 + 64
    b = 2
    rng = np.random.default_rng(3)
    sfx = np.zeros((b, 16, TINY.hidden_size), np.float32)
    sfx[:, :8] = rng.normal(size=(b, 8, TINY.hidden_size)) * 0.2
    lens = [8, 7]
    samp = GenerateConfig(
        max_new_tokens=6, eos_token_ids=(),
        sampling=SamplingParams(temperature=1.3, top_k=16, seed=21),
    )

    def run(cascade):
        cache = prefix_prefill(params, TINY, emb[:, :80], pfx_valid, vs, spec)
        ids, rt = generate_batch_from_prefix(
            params, TINY, cache, jnp.asarray(sfx), lens, spec, samp,
            decode_chunk_size=2, cascade=cascade,
        )
        return ids

    flat_a, flat_b = run(False), run(False)
    assert flat_a == flat_b  # seed replay
    casc = run(True)
    assert casc == flat_a  # same draws across layouts (fp32 exact on CPU)


def test_generate_return_logprobs():
    """runtime['logprobs'] carries log P(token) per emitted token (the
    reference's output_scores surface); greedy logprobs are the max."""
    import math

    params, emb, valid, vs, spec = _case()
    gen = GenerateConfig(max_new_tokens=5, eos_token_ids=())
    ids, rt = generate(params, TINY, emb, valid, vs, spec, gen,
                       return_logprobs=True, decode_chunk_size=4)
    lps = rt["logprobs"]
    assert len(lps) == len(ids) == 5
    assert all(lp <= 0.0 and math.isfinite(lp) for lp in lps)
    ref, rt2 = generate(params, TINY, emb, valid, vs, spec, gen)
    assert ids == ref  # logprobs collection doesn't change tokens
    assert "logprobs" not in rt2
