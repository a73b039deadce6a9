"""FrameFusion: budget behavior, merge invariants, end-to-end prefill."""

import numpy as np

import jax
import jax.numpy as jnp

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.runtime.framefusion import FrameFusionSpec, build_prefill_framefusion


def _setup(highly_similar: bool):
    params = qwen2.init_params(TINY, jax.random.key(0))
    rng = np.random.default_rng(0)
    t, h, w = 8, 3, 3
    nv = t * h * w
    sys_len, inst_len = 5, 7
    valid = sys_len + nv + inst_len
    s_full = 96
    emb = np.zeros((1, s_full, TINY.hidden_size), np.float32)
    emb[0, :valid] = rng.normal(size=(valid, TINY.hidden_size)) * 0.2
    if highly_similar:
        # same-patch tokens nearly identical across frames -> heavy merging
        frame = rng.normal(size=(1, h * w, TINY.hidden_size)) * 0.2
        emb[0, sys_len : sys_len + nv] = (
            frame + 0.001 * rng.normal(size=(t, h * w, TINY.hidden_size))
        ).reshape(nv, -1)
    return params, jnp.asarray(emb), valid, sys_len, (t, h, w)


def test_framefusion_compaction_token_exact():
    """Compact mode (layers >= C run at the budget length) must reproduce
    mask-mode tokens exactly whenever merge+prune finished before C
    (compact_exact=True), with matching merged_len."""
    import dataclasses as dc

    import jax.numpy as jnp

    from sttm_tpu.runtime.generate import GenerateConfig, generate

    params, emb, valid, sys_len, (t, h, w) = _setup(highly_similar=True)
    gen = GenerateConfig(max_new_tokens=6, eos_token_ids=())
    base_spec = FrameFusionSpec(cost=0.3, t=t, h=h, w=w)
    ref_ids, ref_rt = generate(params, TINY, emb, valid, sys_len, base_spec, gen)

    spec = dc.replace(base_spec, compact_at_layer=3, compact_budget=t * h * w)
    ids, rt = generate(params, TINY, emb, valid, sys_len, spec, gen)
    assert rt["compact_exact"], "merge/prune should finish before layer 3 here"
    assert rt["compact_overflow"] == 0
    assert rt["merged_len"] == ref_rt["merged_len"]
    assert ids == ref_ids, (ids, ref_ids)

    # tight budget: overflow recorded, still decodes
    tight = dc.replace(base_spec, compact_at_layer=3, compact_budget=4)
    ids2, rt2 = generate(params, TINY, emb, valid, sys_len, tight, gen)
    assert rt2["compact_overflow"] > 0
    assert rt2["merged_len"] < rt["merged_len"]
    assert len(ids2) == 6


def test_framefusion_merges_similar_video():
    params, emb, valid, sys_len, (t, h, w) = _setup(highly_similar=True)
    spec = FrameFusionSpec(cost=0.3, t=t, h=h, w=w)
    fn = build_prefill_framefusion(TINY, spec, emb.shape[1])
    logits, cache, alive = fn(params, emb, jnp.int32(valid), jnp.int32(sys_len))
    alive = np.asarray(alive)
    nv = t * h * w
    n_alive_video = alive[sys_len : sys_len + nv].sum()
    assert n_alive_video < nv * 0.6  # merged well below budget-free level
    # text tokens never touched
    assert alive[:sys_len].all() and alive[sys_len + nv : valid].all()
    assert not alive[valid:].any()
    assert np.isfinite(np.asarray(logits)).all()


def test_framefusion_dissimilar_video_prunes_to_budget():
    params, emb, valid, sys_len, (t, h, w) = _setup(highly_similar=False)
    spec = FrameFusionSpec(cost=0.3, t=t, h=h, w=w)
    fn = build_prefill_framefusion(TINY, spec, emb.shape[1])
    logits, cache, alive = fn(params, emb, jnp.int32(valid), jnp.int32(sys_len))
    alive = np.asarray(alive)
    nv = t * h * w
    n_alive_video = alive[sys_len : sys_len + nv].sum()
    # random video: few merges, so attention pruning must hit ~cost budget
    assert n_alive_video <= int(nv * 0.5)
    assert np.isfinite(np.asarray(logits)).all()


def test_framefusion_padded_decode_token_exact():
    """Buffer padding must not change decoded tokens.

    Regression for the round-1 decode bug: decode writes new K/V at
    valid_len+step, inside the padding region where ``alive`` is False, so
    generated tokens couldn't attend to themselves. With a merge-nothing
    spec the padded run must match both the unpadded run and the plain
    no-reducer run token for token (reference FrameFusion decode is standard
    attention over the shrunk sequence, framefusion/main.py:30-118).
    """
    from sttm_tpu.runtime.generate import GenerateConfig, generate

    params = qwen2.init_params(TINY, jax.random.key(0))
    rng = np.random.default_rng(0)
    t, h, w = 2, 3, 3
    nv = t * h * w
    sys_len, inst_len = 4, 4
    valid = sys_len + nv + inst_len  # 26
    emb_valid = (rng.normal(size=(1, valid, TINY.hidden_size)) * 0.2).astype(np.float32)
    # similarity bound > 1 => no merges; prune off => alive == (pos < valid)
    spec = FrameFusionSpec(cost=1.0, t=t, h=h, w=w,
                           similarity_lower_bound=1.1, enable_prune=False)
    gen = GenerateConfig(max_new_tokens=8, eos_token_ids=())

    def run(s_full, sp):
        emb = np.zeros((1, s_full, TINY.hidden_size), np.float32)
        emb[:, :valid] = emb_valid
        ids, _ = generate(params, TINY, jnp.asarray(emb), valid, sys_len, sp, gen)
        return ids

    unpadded = run(valid, spec)
    padded = run(64, spec)
    plain = run(64, None)
    assert padded == unpadded
    assert padded == plain


def test_framefusion_llama_trunk():
    """FrameFusion over the Llama-architecture trunk (LLaVA-NeXT-Video's
    Vicuna LM, framefusion/models/llava_next_video/): merges and decodes."""
    from sttm_tpu.models.config import TINY_LLAMA
    from sttm_tpu.runtime.generate import GenerateConfig, generate

    params = qwen2.init_params(TINY_LLAMA, jax.random.key(0))
    rng = np.random.default_rng(0)
    t, h, w = 8, 3, 3
    nv = t * h * w
    sys_len, inst_len = 5, 7
    valid = sys_len + nv + inst_len
    emb = np.zeros((1, 96, TINY_LLAMA.hidden_size), np.float32)
    emb[0, :valid] = rng.normal(size=(valid, TINY_LLAMA.hidden_size)) * 0.2
    frame = rng.normal(size=(1, h * w, TINY_LLAMA.hidden_size)) * 0.2
    emb[0, sys_len : sys_len + nv] = (
        frame + 0.001 * rng.normal(size=(t, h * w, TINY_LLAMA.hidden_size))
    ).reshape(nv, -1)
    spec = FrameFusionSpec(cost=0.3, t=t, h=h, w=w)
    ids, rt = generate(params, TINY_LLAMA, jnp.asarray(emb), valid, sys_len, spec,
                       GenerateConfig(max_new_tokens=3, eos_token_ids=()))
    assert len(ids) == 3
    assert rt["merged_len"] < valid - nv * 0.3


def test_framefusion_mrope_trunk():
    """FrameFusion over the M-RoPE trunk (Qwen2-VL,
    framefusion/models/qwen2vl/): with a merge-nothing spec, the padded
    FrameFusion run decodes the same tokens as the plain M-RoPE run."""
    from sttm_tpu.models.config import TINY_MROPE
    from sttm_tpu.models.qwen2vl import build_video_mrope_positions
    from sttm_tpu.runtime.generate import GenerateConfig, generate

    params = qwen2.init_params(TINY_MROPE, jax.random.key(0))
    rng = np.random.default_rng(0)
    t, gh, gw = 4, 2, 3
    nv = t * gh * gw
    sys_len, inst_len = 4, 4
    valid = sys_len + nv + inst_len
    s_full = 48
    emb = np.zeros((1, s_full, TINY_MROPE.hidden_size), np.float32)
    emb[0, :valid] = (rng.normal(size=(valid, TINY_MROPE.hidden_size)) * 0.2)
    pos, _ = build_video_mrope_positions(sys_len, t, gh, gw, inst_len, s_full)
    gen = GenerateConfig(max_new_tokens=6, eos_token_ids=())

    nothing = FrameFusionSpec(cost=1.0, t=t, h=gh, w=gw,
                              similarity_lower_bound=1.1, enable_prune=False)
    ids_ff, _ = generate(params, TINY_MROPE, jnp.asarray(emb), valid, sys_len,
                         nothing, gen, position_ids=pos)
    ids_plain, _ = generate(params, TINY_MROPE, jnp.asarray(emb), valid, sys_len,
                            None, gen, position_ids=pos)
    assert ids_ff == ids_plain

    # and a merging spec actually merges on similar video
    frame = rng.normal(size=(1, gh * gw, TINY_MROPE.hidden_size)) * 0.2
    emb[0, sys_len : sys_len + nv] = (
        frame + 0.001 * rng.normal(size=(t, gh * gw, TINY_MROPE.hidden_size))
    ).reshape(nv, -1)
    spec = FrameFusionSpec(cost=0.3, t=t, h=gh, w=gw)
    ids, rt = generate(params, TINY_MROPE, jnp.asarray(emb), valid, sys_len, spec,
                       GenerateConfig(max_new_tokens=3, eos_token_ids=()),
                       position_ids=pos)
    assert len(ids) == 3 and rt["merged_len"] < valid


def test_framefusion_generate_and_dispatcher():
    from sttm_tpu.runtime.generate import GenerateConfig, generate, spec_from_pattern

    params, emb, valid, sys_len, (t, h, w) = _setup(highly_similar=True)
    spec = spec_from_pattern("framefusion", t, h, w, sa_framefusion_cost=0.3)
    ids, rt = generate(params, TINY, emb, valid, sys_len, spec,
                       GenerateConfig(max_new_tokens=3, eos_token_ids=()))
    assert len(ids) == 3
    assert rt["merged_len"] < valid

    merge_only = spec_from_pattern("merging", t, h, w)
    assert merge_only.enable_prune is False
    qt = spec_from_pattern("quadtree", t, h, w, sa_tree_thresh=0.8)
    assert qt.kind == "quadtree" and qt.spatial_thresh == 0.8
    py = spec_from_pattern("pyrd", t, 4, 4, sa_pyrd_loc_list=[1, 2], sa_pyrd_size_list=[2, 1])
    assert len(py) == 2 and py[1].h == 2


def test_spec_from_pattern_compact_wiring():
    from sttm_tpu.runtime.generate import spec_from_pattern

    spec = spec_from_pattern(
        "framefusion", t=4, h=4, w=4,
        sa_framefusion_cost=0.4, sa_framefusion_compact_layer=3,
        sa_framefusion_compact_budget=24)
    assert spec.compact_at_layer == 3 and spec.compact_budget == 24
    assert spec.enable_prune
