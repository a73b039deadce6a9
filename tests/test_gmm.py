"""Grouped-matmul Pallas kernel (ops/gmm.py): layout oracle + numerics
(interpret mode on CPU) + the moe_mlp "gmm" dispatch mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "float32")

from sttm_tpu.ops.gmm import gmm, grouped_layout, pick_tile_n


def _np_layout(flat_g, n_groups, tm):
    """Independent numpy oracle for grouped_layout."""
    order = np.argsort(flat_g, kind="stable")
    sizes = np.bincount(flat_g, minlength=n_groups)
    tiles = -(-sizes // tm)
    padded_start = tm * (np.cumsum(tiles) - tiles)
    row_dst = np.empty(len(flat_g), np.int64)
    seen = np.zeros(n_groups, np.int64)
    for j, src in enumerate(order):
        e = flat_g[src]
        row_dst[j] = padded_start[e] + seen[e]
        seen[e] += 1
    return order, row_dst, tiles


@pytest.mark.parametrize("seed,m,e,tm", [(0, 64, 5, 8), (1, 200, 7, 16), (2, 24, 9, 8)])
def test_grouped_layout_matches_oracle(seed, m, e, tm):
    rng = np.random.default_rng(seed)
    flat_g = rng.integers(0, e, size=m).astype(np.int32)
    order, row_dst, tile_group, m_pad = grouped_layout(jnp.asarray(flat_g), e, tm)
    o_order, o_dst, o_tiles = _np_layout(flat_g, e, tm)
    np.testing.assert_array_equal(np.asarray(order), o_order)
    np.testing.assert_array_equal(np.asarray(row_dst), o_dst)
    assert m_pad % tm == 0 and m_pad >= int(o_tiles.sum()) * tm
    # every real tile is owned by its group
    tg = np.asarray(tile_group)
    t = 0
    for g in range(e):
        for _ in range(o_tiles[g]):
            assert tg[t] == g, (t, g)
            t += 1
    # padding tiles stay in bounds
    assert (tg >= 0).all() and (tg < e).all()


def test_grouped_layout_row_dsts_disjoint():
    rng = np.random.default_rng(3)
    flat_g = rng.integers(0, 4, size=100).astype(np.int32)
    _, row_dst, _, m_pad = grouped_layout(jnp.asarray(flat_g), 4, 8)
    d = np.asarray(row_dst)
    assert len(np.unique(d)) == len(d) and d.min() >= 0 and d.max() < m_pad


@pytest.mark.parametrize("seed,e,sizes", [
    (0, 4, [5, 0, 17, 2]),          # empty group
    (1, 3, [8, 8, 8]),              # exact tile multiples
    (2, 6, [1, 1, 1, 1, 1, 31]),    # skewed
])
def test_gmm_matches_per_group_matmul(seed, e, sizes):
    tm, d, f = 8, 16, 32
    rng = np.random.default_rng(seed)
    flat_g = np.repeat(np.arange(e), sizes).astype(np.int32)
    rng.shuffle(flat_g)
    m = len(flat_g)
    x = rng.normal(size=(m, d)).astype(np.float32)
    w = rng.normal(size=(e, d, f)).astype(np.float32) * 0.1

    order, row_dst, tile_group, m_pad = grouped_layout(jnp.asarray(flat_g), e, tm)
    xs = jnp.zeros((m_pad, d), jnp.float32).at[row_dst].set(jnp.asarray(x)[order])
    out_pad = gmm(xs, jnp.asarray(w), tile_group, tm, interpret=True)
    got = np.asarray(out_pad)[np.asarray(row_dst)]  # back to sorted order

    want = np.stack([x[src] @ w[flat_g[src]] for src in np.asarray(order)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # padding rows must not leak garbage (zero rows -> zero outputs)
    mask = np.ones(m_pad, bool)
    mask[np.asarray(row_dst)] = False
    np.testing.assert_array_equal(np.asarray(out_pad)[mask], 0.0)


def test_pick_tile_n():
    assert pick_tile_n(1408) == 128   # 1408 = 11 * 128
    assert pick_tile_n(2048) == 512
    assert pick_tile_n(512) == 512
    assert pick_tile_n(96) == 96      # no 128-multiple divides -> whole width


@pytest.mark.parametrize("mode", ["gmm", "gmm_fused"])
def test_moe_gmm_matches_dense(mode):
    from sttm_tpu.models.config import TINY_MOE
    from sttm_tpu.models.moe import init_moe_layer_params, moe_mlp

    def scale_fn(k, shape):
        return jax.random.normal(k, shape, jnp.float32) * 0.05

    params = init_moe_layer_params(TINY_MOE, jax.random.key(0), scale_fn)
    lp = jax.tree.map(lambda a: a[0], params)
    rng = np.random.default_rng(5)
    h = jnp.asarray(rng.normal(size=(2, 37, TINY_MOE.hidden_size)) * 0.3, jnp.float32)
    y_dense = moe_mlp(lp, h, TINY_MOE, mode="dense")
    y_gmm = moe_mlp(lp, h, TINY_MOE, mode=mode)
    np.testing.assert_allclose(
        np.asarray(y_dense), np.asarray(y_gmm), rtol=1e-4, atol=1e-5
    )


def test_gmm_mlp_fused_matches_unfused_multi_ftile():
    """Fused SwiGLU kernel with several f-tiles per expert (accumulation path)."""
    from sttm_tpu.ops.gmm import gmm_mlp_fused

    tm, d, f, e = 8, 16, 48, 3
    rng = np.random.default_rng(6)
    flat_g = rng.integers(0, e, size=40).astype(np.int32)
    order, row_dst, tile_group, m_pad = grouped_layout(jnp.asarray(flat_g), e, tm)
    xs = jnp.asarray(rng.normal(size=(m_pad, d)).astype(np.float32))
    wg = jnp.asarray(rng.normal(size=(e, d, f)).astype(np.float32) * 0.2)
    wu = jnp.asarray(rng.normal(size=(e, d, f)).astype(np.float32) * 0.2)
    wd = jnp.asarray(rng.normal(size=(e, f, d)).astype(np.float32) * 0.2)

    got = gmm_mlp_fused(xs, wg, wu, wd, tile_group, tm, tf=16, interpret=True)
    g = gmm(xs, wg, tile_group, tm, interpret=True)
    u = gmm(xs, wu, tile_group, tm, interpret=True)
    want = gmm(jax.nn.silu(g) * u, wd, tile_group, tm, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
