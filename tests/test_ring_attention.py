"""Sequence-parallel ring attention on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.ops.attention import _xla_mha
from sttm_tpu.parallel.ring import ring_attention_local, sp_prefill


def _mesh(p=8, axis="sp"):
    return Mesh(np.asarray(jax.devices()[:p]).reshape(p), (axis,))


def test_ring_attention_matches_single_device():
    rng = np.random.default_rng(0)
    b, s, hq, hkv, hd = 1, 128, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(b, s, hq, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, hkv, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, hkv, hd)), jnp.float32)
    valid = jnp.int32(100)
    ref = _xla_mha(q, k, v, valid, True, 0, hd**-0.5)

    mesh = _mesh()
    p = 8
    sl = s // p

    def local(q, k, v):
        off = jax.lax.axis_index("sp") * sl
        return ring_attention_local(q, k, v, off, valid, "sp")

    out = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"),
        check_vma=False,
    ))(q, k, v)
    # only valid rows are meaningful
    np.testing.assert_allclose(
        np.asarray(out)[:, :100], np.asarray(ref)[:, :100], rtol=2e-5, atol=2e-5
    )


def test_sp_generate_token_parity():
    """Sequence-parallel generate == single-device generate, token for token,
    with and without a quadtree reducer at the group boundary."""
    from sttm_tpu.parallel.ring import sp_generate
    from sttm_tpu.runtime.generate import GenerateConfig, generate
    from sttm_tpu.runtime.reducer import ReducerSpec

    cfg = TINY
    params = qwen2.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(3)
    t, h, w = 4, 4, 4
    nv = t * h * w
    sys_len, inst_len = 4, 8
    valid = sys_len + nv + inst_len
    s_full = 96
    emb = np.zeros((1, s_full, cfg.hidden_size), np.float32)
    emb[0, :valid] = rng.normal(size=(valid, cfg.hidden_size)) * 0.2
    emb = jnp.asarray(emb, cfg.dtype)
    gen = GenerateConfig(max_new_tokens=6, eos_token_ids=())
    mesh = _mesh()
    quadtree = ReducerSpec(
        kind="quadtree", layer_idx=2, t=t, h=h, w=w, video_budget=nv // 2,
        spatial_thresh=0.85, temporal_thresh=0.65, root_level=0,
    )
    tome = ReducerSpec(kind="tome", layer_idx=2, t=t, h=h, w=w, prune_ratio=0.5)
    dycoke = ReducerSpec(kind="dycoke", layer_idx=2, t=t, h=h, w=w, prune_ratio=0.7)
    for spec in (None, quadtree, tome, dycoke):
        ref_ids, ref_rt = generate(params, cfg, emb, valid, sys_len, spec, gen)
        sp_ids, rt = sp_generate(params, cfg, emb, valid, sys_len, spec, mesh, gen=gen)
        assert sp_ids == ref_ids, (spec and spec.kind, sp_ids, ref_ids)
        assert rt["merged_len"] == ref_rt["merged_len"]
        assert rt["sp"] == 8

    # sp prefill + int8 live-cache decode matches single-device kv_int8
    ref8, _ = generate(params, cfg, emb, valid, sys_len, quadtree, gen,
                       kv_int8=True)
    sp8, _ = sp_generate(params, cfg, emb, valid, sys_len, quadtree, mesh,
                         gen=gen, kv_int8=True)
    assert sp8 == ref8, (sp8, ref8)


def test_sp_prefill_matches_single_device():
    """Full sequence-parallel decoder prefill == single-device prefill."""
    from sttm_tpu.runtime.generate import build_prefill

    params = qwen2.init_params(TINY, jax.random.key(0))
    rng = np.random.default_rng(1)
    s_full, valid = 64, 50
    embeds = jnp.asarray(rng.normal(size=(1, s_full, TINY.hidden_size)) * 0.2,
                         jnp.float32)
    ref_logits, ref_cache = build_prefill(TINY, None, s_full, "xla")(
        params, embeds, jnp.int32(valid), jnp.int32(0)
    )

    mesh = _mesh()
    logits, k_all, v_all = sp_prefill(params, TINY, embeds, valid, mesh)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )
    # K/V are the same values, sequence-sharded (compare vs the cache prefix)
    ref_k = np.asarray(ref_cache.ks[0])[:, :, :s_full]
    np.testing.assert_allclose(np.asarray(k_all), ref_k, rtol=2e-4, atol=2e-4)
