"""Custom Pallas TPU kernels for the merge hot path.

``cosine_rows``: blocked row-wise cosine similarity (the north-star's
"blocked cosine-similarity" kernel): bf16 inputs stream HBM->VMEM once per
row block, products/norms accumulate in fp32 on the VPU, and only the [N]
similarity vector is written back — no [N, C] fp32 intermediates. Used by the
quadtree split decision and temporal pairing (ops/quadtree.py) where XLA
would otherwise materialize upcast temporaries.

Falls back to plain jnp off-TPU (tests run the kernel in interpreter mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["cosine_rows"]

_BLOCK_ROWS = 256


def _cos_kernel(a_ref, b_ref, o_ref):
    a = a_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    num = (a * b).sum(axis=-1, keepdims=True)
    na = (a * a).sum(axis=-1, keepdims=True)
    nb = (b * b).sum(axis=-1, keepdims=True)
    den = jnp.sqrt(na) * jnp.sqrt(nb)
    o_ref[:] = num / jnp.maximum(den, 1e-8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cosine_rows_pallas(a, b, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = a.shape
    nb = -(-n // _BLOCK_ROWS)
    pad = nb * _BLOCK_ROWS - n
    if pad:
        a = jnp.pad(a, ((0, pad), (0, 0)))
        b = jnp.pad(b, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        _cos_kernel,
        out_shape=jax.ShapeDtypeStruct((nb * _BLOCK_ROWS, 1), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, b)
    return out[:n, 0]


def cosine_rows(a: jnp.ndarray, b: jnp.ndarray, force: str | None = None) -> jnp.ndarray:
    """Row-wise cosine similarity. a, b: [..., C] -> [...] fp32.

    force: None (auto: Pallas on TPU), "pallas", "interpret", or "jnp".
    """
    shape = a.shape[:-1]
    c = a.shape[-1]
    a2 = a.reshape(-1, c)
    b2 = b.reshape(-1, c)
    mode = force
    if mode is None:
        mode = "pallas" if jax.default_backend() == "tpu" and c % 128 == 0 else "jnp"
    if mode in ("pallas", "interpret"):
        out = _cosine_rows_pallas(a2, b2, interpret=(mode == "interpret"))
    else:
        af = a2.astype(jnp.float32)
        bf = b2.astype(jnp.float32)
        num = (af * bf).sum(-1)
        den = jnp.linalg.norm(af, axis=-1) * jnp.linalg.norm(bf, axis=-1)
        out = num / jnp.maximum(den, 1e-8)
    return out.reshape(shape)
