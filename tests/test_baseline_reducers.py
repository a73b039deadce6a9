"""FastV / pyrd / StreamingLLM through the layer-group runtime."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.runtime.generate import GenerateConfig, build_prefill, generate
from sttm_tpu.runtime.reducer import ReducerSpec, merged_buffer_len


@pytest.fixture(scope="module")
def setup():
    params = qwen2.init_params(TINY, jax.random.key(0))
    rng = np.random.default_rng(0)
    t, h, w = 4, 4, 4
    nv = t * h * w
    sys_len, inst_len = 6, 10
    valid = sys_len + nv + inst_len
    s_full = 128
    emb = np.zeros((1, s_full, TINY.hidden_size), np.float32)
    emb[0, :valid] = rng.normal(size=(valid, TINY.hidden_size)) * 0.2
    return params, jnp.asarray(emb), valid, sys_len, (t, h, w)


def test_fastv_reducer(setup):
    params, embeds, valid, sys_len, (t, h, w) = setup
    nv = t * h * w
    spec = ReducerSpec(kind="fastv", layer_idx=2, t=t, h=h, w=w, prune_ratio=0.5)
    assert spec.video_out_len() == nv // 2
    ids, rt = generate(
        params, TINY, embeds, valid, sys_len, spec,
        GenerateConfig(max_new_tokens=3, eos_token_ids=()),
    )
    assert rt["merged_len"] == valid - nv + nv // 2
    assert len(ids) == 3


def test_fastv_keeps_top_attended(setup):
    """With r=0 FastV keeps everything -> logits equal the none-reducer."""
    params, embeds, valid, sys_len, (t, h, w) = setup
    s_full = embeds.shape[1]
    spec0 = ReducerSpec(kind="fastv", layer_idx=2, t=t, h=h, w=w, prune_ratio=0.0)
    base = build_prefill(TINY, None, s_full, "xla")
    ref_logits, _ = base(params, embeds, jnp.int32(valid), jnp.int32(sys_len))
    fn = build_prefill(TINY, spec0, s_full, "xla")
    logits, _ = fn(params, embeds, jnp.int32(valid), jnp.int32(sys_len))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=2e-5, atol=2e-5)


def test_pyrd_multi_stage(setup):
    """Two pyramid-drop stages: 4x4 -> 2x2 at layer 1, 2x2 -> 1x1 at layer 3."""
    params, embeds, valid, sys_len, (t, h, w) = setup
    nv = t * h * w
    s1 = ReducerSpec(kind="pyrd", layer_idx=1, t=t, h=h, w=w, pyrd_size=2)
    s2 = ReducerSpec(kind="pyrd", layer_idx=3, t=t, h=2, w=2, pyrd_size=1)
    assert s1.out_grid() == (t, 2, 2)
    s_full = embeds.shape[1]
    assert merged_buffer_len(s2, merged_buffer_len(s1, s_full)) == s_full - nv + t
    ids, rt = generate(
        params, TINY, embeds, valid, sys_len, (s1, s2),
        GenerateConfig(max_new_tokens=3, eos_token_ids=()),
    )
    assert rt["merged_len"] == valid - nv + t
    assert len(ids) == 3


def test_streamingllm_pattern(setup):
    """A-shape attention runs and differs from full causal."""
    params, embeds, valid, sys_len, _ = setup
    s_full = embeds.shape[1]
    base = build_prefill(TINY, None, s_full, "xla")
    ref_logits, _ = base(params, embeds, jnp.int32(valid), jnp.int32(sys_len))
    fn = build_prefill(TINY, None, s_full, "xla", 4, 16)
    logits, cache = fn(params, embeds, jnp.int32(valid), jnp.int32(sys_len))
    assert int(cache.merged_len) == valid  # no token reduction
    assert np.abs(np.asarray(logits) - np.asarray(ref_logits)).max() > 1e-4


def test_budget_overflow_recorded(setup):
    """Silent budget truncation must be observable: with a threshold that
    keeps every leaf and a budget of nv/4, the overflow is reported in the
    runtime dict instead of being hidden by the clamped n_kept."""
    params, embeds, valid, sys_len, (t, h, w) = setup
    nv = t * h * w
    spec = ReducerSpec(
        kind="quadtree", layer_idx=1, t=t, h=h, w=w, video_budget=nv // 4,
        spatial_thresh=1.01, temporal_thresh=-1.0,  # sim <= 1 < thresh: keep all
    )
    ids, rt = generate(
        params, TINY, embeds, valid, sys_len, spec,
        GenerateConfig(max_new_tokens=2, eos_token_ids=()),
    )
    assert rt["budget_overflow"] == nv - nv // 4
    assert rt["merged_len"] == valid - nv + nv // 4

    # roomy budget: no overflow reported
    spec_ok = ReducerSpec(
        kind="quadtree", layer_idx=1, t=t, h=h, w=w, video_budget=nv,
        spatial_thresh=1.01, temporal_thresh=-1.0,
    )
    _, rt_ok = generate(
        params, TINY, embeds, valid, sys_len, spec_ok,
        GenerateConfig(max_new_tokens=2, eos_token_ids=()),
    )
    assert rt_ok["budget_overflow"] == 0


def test_streamingllm_decode_windowing(setup):
    """Decode windowing follows SinkCache semantics (reference
    framefusion/models/qwen2/modeling_qwen2_baseline.py:707,718): generated
    tokens attend to sinks + the recent window only. A window covering the
    whole cache is a no-op on decode logits; a tight window changes them."""
    from sttm_tpu.runtime.generate import MAX_DECODE, build_decode_step

    params, embeds, valid, sys_len, _ = setup
    s_full = embeds.shape[1]
    prefill = build_prefill(TINY, None, s_full, "xla")
    logits, cache = prefill(params, embeds, jnp.int32(valid), jnp.int32(sys_len))
    token = jnp.argmax(logits, -1).astype(jnp.int32)

    def run_decode(sinks, window):
        c = jax.tree.map(jnp.copy, cache)  # decode donates its cache arg
        d = build_decode_step(TINY, None, attn_sinks=sinks, attn_window=window)
        lg, _ = d(params, token, c, jnp.int32(0))
        return np.asarray(lg)

    unwindowed = run_decode(0, 0)
    wide = run_decode(4, s_full + MAX_DECODE)
    tight = run_decode(4, 8)
    np.testing.assert_allclose(wide, unwindowed, rtol=1e-6, atol=1e-6)
    assert np.abs(tight - unwindowed).max() > 1e-4

    # generate-level: a window covering everything reproduces the plain run
    gen = GenerateConfig(max_new_tokens=6, eos_token_ids=())
    ids_plain, _ = generate(params, TINY, embeds, valid, sys_len, None, gen)
    ids_wide, _ = generate(
        params, TINY, embeds, valid, sys_len, None, gen,
        attn_sinks=4, attn_window=s_full + MAX_DECODE,
    )
    ids_tight, _ = generate(
        params, TINY, embeds, valid, sys_len, None, gen,
        attn_sinks=4, attn_window=16,
    )
    assert ids_wide == ids_plain
    assert ids_tight != ids_plain


def test_pos_emb_ver1_pooled_rope(setup):
    """quadtree with pooled rope maps runs and differs from truncate policy."""
    import dataclasses as dc

    params, embeds, valid, sys_len, (t, h, w) = setup
    s_full = embeds.shape[1]
    base_spec = ReducerSpec(
        kind="quadtree", layer_idx=2, t=t, h=h, w=w, video_budget=t * h * w // 2,
        spatial_thresh=0.6, temporal_thresh=0.5,
    )
    spec1 = dc.replace(base_spec, pos_emb_ver=1)
    f0 = build_prefill(TINY, base_spec, s_full, "xla")
    f1 = build_prefill(TINY, spec1, s_full, "xla")
    l0, c0 = f0(params, embeds, jnp.int32(valid), jnp.int32(sys_len))
    l1, c1 = f1(params, embeds, jnp.int32(valid), jnp.int32(sys_len))
    assert int(c0.merged_len) == int(c1.merged_len)
    assert np.abs(np.asarray(l0) - np.asarray(l1)).max() > 1e-6


def test_generate_batch_matches_single(setup):
    """Batched generation token-exactly matches per-sample generation."""
    from sttm_tpu.runtime.generate import GenerateConfig, generate, generate_batch

    params, embeds, valid, sys_len, (t, h, w) = setup
    rng = np.random.default_rng(9)
    s_full = embeds.shape[1]
    b = 3
    embs = np.asarray(jnp.broadcast_to(embeds, (b,) + embeds.shape[1:])).copy()
    embs += 0.01 * rng.normal(size=embs.shape).astype(np.float32)
    valids = [valid, valid - 2, valid - 5]
    spec = ReducerSpec(kind="quadtree", layer_idx=2, t=t, h=h, w=w,
                       video_budget=t * h * w // 2, spatial_thresh=0.6,
                       temporal_thresh=0.5)
    gcfg = GenerateConfig(max_new_tokens=4, eos_token_ids=())
    batch_ids, brt = generate_batch(
        params, TINY, jnp.asarray(embs), valids, [sys_len] * b, spec, gcfg,
    )
    for i in range(b):
        one_ids, _ = generate(params, TINY, jnp.asarray(embs[i : i + 1]), valids[i],
                              sys_len, spec, gcfg)
        assert batch_ids[i] == one_ids, f"sample {i} diverged"
    assert brt["merged_len"][0] >= brt["merged_len"][2] - t * h * w


def test_reducer_option_combinations(setup):
    """Spec-option matrix: weighted avg, per-head sim, gathered positions,
    octree — all through the full prefill+decode path."""
    import dataclasses as dc

    from sttm_tpu.runtime.generate import GenerateConfig, generate

    params, embeds, valid, sys_len, (t, h, w) = setup
    nv = t * h * w
    base = ReducerSpec(kind="quadtree", layer_idx=2, t=t, h=h, w=w,
                       video_budget=nv // 2, spatial_thresh=0.6, temporal_thresh=0.5)
    variants = [
        dc.replace(base, weighted_avg=True),
        dc.replace(base, sim_head_dim=TINY.head_dim),
        dc.replace(base, pos_emb_ver=2),
        dc.replace(base, pos_emb_ver=1, pos_emb_weighted_avg=True),
        ReducerSpec(kind="octree", layer_idx=2, t=t, h=h, w=w,
                    video_budget=nv // 2, spatial_thresh=0.5),
    ]
    gcfg = GenerateConfig(max_new_tokens=2, eos_token_ids=())
    outs = []
    for sp in variants:
        ids, rt = generate(params, TINY, embeds, valid, sys_len, sp, gcfg)
        assert len(ids) == 2 and rt["merged_len"] <= valid
        outs.append((sp.kind, sp.pos_emb_ver, rt["merged_len"]))
    # octree on a t==h==w==4 grid forms cubes; merged length sane
    assert outs[-1][2] >= sys_len + (valid - sys_len - nv) + 1


def test_generate_batch_chunked_matches_unchunked(setup):
    from sttm_tpu.runtime.generate import GenerateConfig, generate_batch

    params, embeds, valid, sys_len, (t, h, w) = setup
    b = 2
    embs = jnp.broadcast_to(embeds, (b,) + embeds.shape[1:])
    spec = ReducerSpec(kind="quadtree", layer_idx=2, t=t, h=h, w=w,
                       video_budget=t * h * w // 2, spatial_thresh=0.6,
                       temporal_thresh=0.5)
    gcfg = GenerateConfig(max_new_tokens=5, eos_token_ids=())
    ids1, _ = generate_batch(params, TINY, embs, [valid] * b, [sys_len] * b,
                             spec, gcfg, decode_chunk_size=1)
    ids4, _ = generate_batch(params, TINY, embs, [valid] * b, [sys_len] * b,
                             spec, gcfg, decode_chunk_size=4)
    assert ids1 == ids4
