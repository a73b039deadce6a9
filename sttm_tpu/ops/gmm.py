"""Grouped matmul (MegaBlocks-style) Pallas kernel for MoE dispatch.

``lax.ragged_dot`` is the natural TPU primitive for dropless sorted MoE
dispatch, but its XLA lowering lands far under MXU peak (measured ~16
TFLOP/s on the selected FLOPs at Qwen1.5-MoE-A2.7B geometry — GAPS.md #9).
This kernel takes the standard grouped-GEMM shortcut instead: pad each
group's rows to a multiple of the m-tile so EVERY m-tile belongs to exactly
one group, then run a plain blocked matmul whose weight-block index map
reads the tile's group id from a scalar-prefetched table — no ragged
boundaries inside the kernel, full-size MXU tiles throughout.

Layout contract (build it with ``grouped_layout``):
  * rows sorted by group id, each group right-padded with zero rows to a
    multiple of ``tm``;
  * ``tile_group[i]`` = the group id of m-tile ``i`` (padding tiles carry
    any in-bounds id — their rows are zero and their outputs are never
    gathered back).

The reference has no grouped-GEMM equivalent (its MoE shim,
llava/model/language_model/llava_qwen_moe.py, defers to HF's per-expert
python loop); this is TPU-native infrastructure for the Qwen2-MoE trunk's
prefill path (models/moe.py mode="gmm").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["grouped_layout", "gmm", "gmm_mlp_fused", "pick_tile_n"]


def grouped_layout(flat_g: jnp.ndarray, n_groups: int, tm: int):
    """Sorted-and-padded layout for a flat group assignment.

    flat_g: [M] int32 group id per row (e.g. flattened top-k expert ids).
    Returns (order, row_dst, tile_group, m_pad):
      order      [M]  — argsort(flat_g), stable (preserves row order in group)
      row_dst    [M]  — destination row of sorted row j in the padded buffer
      tile_group [m_pad // tm] — group id owning each m-tile
      m_pad      int  — static padded row count (multiple of tm)
    """
    m = flat_g.shape[0]
    order = jnp.argsort(flat_g)  # stable
    sorted_g = flat_g[order]
    sizes = jnp.bincount(flat_g, length=n_groups)
    tiles = (sizes + tm - 1) // tm
    # static bound: sum(ceil(s/tm)) <= ceil(M/tm) + n_groups
    n_tiles = (m + tm - 1) // tm + n_groups
    padded_start = tm * (jnp.cumsum(tiles) - tiles)
    group_start = jnp.cumsum(sizes) - sizes
    rank = jnp.arange(m, dtype=jnp.int32) - group_start[sorted_g]
    row_dst = padded_start[sorted_g] + rank
    # tile t belongs to the group whose cumulative tile count first exceeds t;
    # tiles past sum(tiles) are padding — clamp to any in-bounds id
    tile_group = jnp.searchsorted(
        jnp.cumsum(tiles), jnp.arange(n_tiles), side="right"
    ).astype(jnp.int32)
    tile_group = jnp.minimum(tile_group, n_groups - 1)
    return order, row_dst, tile_group, int(n_tiles) * tm


def pick_tile_n(f: int, cap: int = 512) -> int:
    """Largest divisor of f that is a lane-aligned (128-multiple) tile <= cap,
    falling back to f itself (whole-width block) when none divides."""
    for tf in range(cap, 0, -128):
        if f % tf == 0:
            return tf
    return f


def _gmm_kernel(tg_ref, x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tf", "interpret"))
def _gmm_call(xs, w, tile_group, tm, tf, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, d = xs.shape
    _, _, f = w.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // tm, f // tf),
        in_specs=[
            pl.BlockSpec((tm, d), lambda i, j, tg: (i, 0)),
            pl.BlockSpec((1, d, tf), lambda i, j, tg: (tg[i], 0, j)),
        ],
        out_specs=pl.BlockSpec((tm, tf), lambda i, j, tg: (i, j)),
    )
    return pl.pallas_call(
        _gmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, f), xs.dtype),
        interpret=interpret,
    )(tile_group, xs, w)


def _gmm_mlp_kernel(tg_ref, x_ref, wg_ref, wu_ref, wd_ref, o_ref, acc_ref):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    dn = (((1,), (0,)), ((), ()))
    g = jax.lax.dot_general(x, wg_ref[0], dn, preferred_element_type=jnp.float32)
    u = jax.lax.dot_general(x, wu_ref[0], dn, preferred_element_type=jnp.float32)
    h = (g * jax.lax.logistic(g) * u).astype(x.dtype)  # SiLU in f32 (Mosaic: no bf16 ALU)
    acc_ref[...] += jax.lax.dot_general(h, wd_ref[0], dn, preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tf", "interpret"))
def _gmm_mlp_call(xs, wg, wu, wd, tile_group, tm, tf, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, d = xs.shape
    f = wg.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // tm, f // tf),
        in_specs=[
            pl.BlockSpec((tm, d), lambda i, j, tg: (i, 0)),
            pl.BlockSpec((1, d, tf), lambda i, j, tg: (tg[i], 0, j)),
            pl.BlockSpec((1, d, tf), lambda i, j, tg: (tg[i], 0, j)),
            pl.BlockSpec((1, tf, d), lambda i, j, tg: (tg[i], j, 0)),
        ],
        out_specs=pl.BlockSpec((tm, d), lambda i, j, tg: (i, 0)),
        scratch_shapes=[pltpu.VMEM((tm, d), jnp.float32)],
    )
    return pl.pallas_call(
        _gmm_mlp_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, d), xs.dtype),
        interpret=interpret,
    )(tile_group, xs, wg, wu, wd)


def gmm_mlp_fused(
    xs: jnp.ndarray,
    wg: jnp.ndarray,
    wu: jnp.ndarray,
    wd: jnp.ndarray,
    tile_group: jnp.ndarray,
    tm: int = 256,
    tf: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Whole grouped SwiGLU MLP in ONE kernel: per m-tile, sweep the expert's
    hidden width in tf-chunks computing gate/up/SiLU and accumulating the
    down-projection — one HBM pass over all three weight matrices, no [M, F]
    intermediates in HBM. SiLU only (the Qwen2-MoE activation).

    xs: [M, D] grouped_layout rows; wg/wu: [E, D, F]; wd: [E, F, D].
    Returns [M, D] in xs.dtype.
    """
    m, d = xs.shape
    if m % tm:
        raise ValueError(f"gmm rows {m} not a multiple of tm={tm}")
    f = wg.shape[-1]
    if tf is None:
        tf = pick_tile_n(f, cap=256)  # three weight blocks live at once
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _gmm_mlp_call(xs, wg, wu, wd, tile_group, tm, tf, interpret)


def gmm(
    xs: jnp.ndarray,
    w: jnp.ndarray,
    tile_group: jnp.ndarray,
    tm: int = 256,
    tf: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Grouped matmul: out[i*tm : (i+1)*tm] = xs[i*tm : (i+1)*tm] @ w[tile_group[i]].

    xs: [M, D] rows in grouped_layout order (M a multiple of tm);
    w: [E, D, F]; tile_group: [M // tm] int32. Returns [M, F] in xs.dtype
    (f32 accumulation on the MXU).
    """
    m, d = xs.shape
    if m % tm:
        raise ValueError(f"gmm rows {m} not a multiple of tm={tm}")
    if tile_group.shape[0] != m // tm:
        raise ValueError(
            f"tile_group has {tile_group.shape[0]} entries for {m // tm} tiles"
        )
    f = w.shape[-1]
    if tf is None:
        tf = pick_tile_n(f)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _gmm_call(xs, w, tile_group, tm, tf, interpret)
