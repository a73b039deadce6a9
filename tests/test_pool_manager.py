"""LRU prefix-pool manager (runtime/serving.py PrefixPoolManager): videos
map to pool pages; misses prefill + insert (donated in-place overwrite of
the LRU unpinned page); answers served through the managed pool must match
per-sample prefix generation across hits, misses, and evictions."""

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
    PrefixPoolManager,
    serve_continuous_paged,
)

T = H = W = 4
NV = T * H * W
SYS = 4
S_FULL, S_SFX = 96, 16
SPEC = ReducerSpec(
    kind="quadtree", layer_idx=2, t=T, h=H, w=W, video_budget=NV // 2,
    spatial_thresh=0.85, temporal_thresh=0.65, root_level=0,
)
GEN = GenerateConfig(max_new_tokens=6, eos_token_ids=())


def _setup(n_videos, seed=0):
    params = qwen2.init_params(TINY, jax.random.key(0))
    rng = np.random.default_rng(seed)
    video_embs = []
    for _ in range(n_videos):
        emb = np.zeros((1, S_FULL, TINY.hidden_size), np.float32)
        emb[0, : SYS + NV] = rng.normal(size=(SYS + NV, TINY.hidden_size)) * 0.2
        video_embs.append(jnp.asarray(emb))
    sfxs = []
    for i in range(n_videos):
        n = 6 + (i % 3)
        s = np.zeros((1, S_SFX, TINY.hidden_size), np.float32)
        s[0, :n] = rng.normal(size=(n, TINY.hidden_size)) * 0.2
        sfxs.append((jnp.asarray(s), n))
    return params, video_embs, sfxs


def _prefill(params, emb):
    return prefix_prefill(params, TINY, emb, SYS + NV, SYS, SPEC)


def test_pool_manager_lru_eviction_stays_exact():
    """Capacity-2 manager over 3 videos: serve A+B, then C (evicts the LRU
    A), then A again (re-prefill into B's page). Every serve's answers must
    match per-sample generation; hit/miss/eviction counters track the
    access pattern."""
    params, embs, sfxs = _setup(3)
    want = {}
    for v in range(3):
        cache = _prefill(params, embs[v])
        want[v], _ = generate_from_prefix(
            params, TINY, cache, sfxs[v][0], sfxs[v][1], SPEC, GEN
        )

    mgr = PrefixPoolManager(TINY, SPEC, pages=2)

    def serve(vids):
        reqs = []
        for v in vids:
            page = mgr.get_page(v, lambda v=v: _prefill(params, embs[v]))
            reqs.append(PagedRequest(rid=v, page=page,
                                     suffix_embeds=sfxs[v][0],
                                     suffix_valid=sfxs[v][1]))
        got, _ = serve_continuous_paged(
            params, TINY, mgr.pool, reqs, SPEC, GEN, batch_slots=2,
            decode_chunk_size=3,
        )
        return got

    got = serve([0, 1])  # two misses, pool filled
    assert got == {0: want[0], 1: want[1]}
    assert mgr.stats()["misses"] == 2 and mgr.stats()["evictions"] == 0

    got = serve([1, 2])  # 1 hits; 2 misses -> evicts 0 (LRU)
    assert got == {1: want[1], 2: want[2]}
    s = mgr.stats()
    assert s["misses"] == 3 and s["evictions"] == 1 and s["hits"] >= 1
    assert mgr.lookup(0) is None  # evicted

    got = serve([0, 2])  # 0 re-prefills into the LRU page (1's); 2 hits
    assert got == {0: want[0], 2: want[2]}
    assert mgr.stats()["evictions"] == 2
    assert mgr.lookup(1) is None


def test_pool_manager_pinning_blocks_eviction():
    params, embs, sfxs = _setup(2, seed=3)
    mgr = PrefixPoolManager(TINY, SPEC, pages=1)
    p0 = mgr.get_page(0, lambda: _prefill(params, embs[0]))
    mgr.pin(p0)
    import pytest

    with pytest.raises(RuntimeError, match="pinned"):
        mgr.get_page(1, lambda: _prefill(params, embs[1]))
    mgr.unpin(p0)
    p1 = mgr.get_page(1, lambda: _prefill(params, embs[1]))
    assert p1 == p0 and mgr.lookup(0) is None
