"""NaViT-style SigLIP vision tower (MiniCPM-V 2.6's ``vpm``).

MiniCPM-V's vision tower is a SigLIP encoder modified for variable-resolution
inputs (the architecture HF ships as the Idefics2 vision tower): image slices
arrive as PACKED PATCH SEQUENCES with per-slice target grids ``tgt_sizes``
[th, tw], position embeddings are assigned by BUCKETIZING each patch's
fractional (row, col) coordinate onto the tower's native
``num_patches_per_side`` grid, and padded patches are masked out of
attention. The reference feeds it pre-packed patches
(framefusion/models/minicpmv/modeling_minicpmv.py:16-46: slices are
patch-flattened, right-padded to the batch max, and passed with a
``patch_attention_mask`` + ``tgt_sizes``); the tower itself lives in the
upstream MiniCPM-V checkpoint, not the reference repo.

Input contract here is the packed form directly: ``patches [B, N, 3*p*p]``
(torch (C, ph, pw) flatten order, matching ``models/siglip.py``) +
``tgt_sizes [B, 2]`` int32. Valid patches are the first ``th*tw`` of each
row. Static shapes: N is the padded max; tgt_sizes are runtime values.

Parity: bit-comparable to HF's Idefics2VisionTransformer in fp32
(tests/test_navit_siglip.py), which implements the same NaViT embedding
formula (bucketize right=True over ``arange(1/side, 1, 1/side)`` boundaries)
and masked encoder. Degenerates exactly to the plain tower when
``tgt = (side, side)`` and N = side².
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "NavitSiglipConfig",
    "NAVIT_SIGLIP_MINICPMV",
    "init_navit_siglip_params",
    "load_navit_siglip_state_dict",
    "navit_position_ids",
    "navit_siglip_encode",
]


@dataclasses.dataclass(frozen=True)
class NavitSiglipConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_layers: int = 27  # full stack — no last-layer surgery here
    num_heads: int = 16
    patch_size: int = 14
    num_patches_per_side: int = 70  # 980px native grid (MiniCPM-V 2.6 vpm)
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def num_positions(self) -> int:
        return self.num_patches_per_side**2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


NAVIT_SIGLIP_MINICPMV = NavitSiglipConfig()

NAVIT_SIGLIP_TINY = NavitSiglipConfig(
    hidden_size=32, intermediate_size=64, num_layers=2, num_heads=4,
    patch_size=14, num_patches_per_side=4, dtype=jnp.float32,
)


def init_navit_siglip_params(cfg: NavitSiglipConfig, key: jax.Array) -> dict:
    ks = jax.random.split(key, 10)
    d, f, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    pdim = 3 * cfg.patch_size * cfg.patch_size

    def w(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * shape[-2] ** -0.5).astype(cfg.dtype)

    return {
        "patch_w": w(ks[0], (pdim, d)),
        "patch_b": jnp.zeros((d,), cfg.dtype),
        "pos_emb": (jax.random.normal(ks[1], (cfg.num_positions, d)) * 0.02).astype(cfg.dtype),
        "layers": {
            "ln1_w": jnp.ones((l, d), cfg.dtype), "ln1_b": jnp.zeros((l, d), cfg.dtype),
            "ln2_w": jnp.ones((l, d), cfg.dtype), "ln2_b": jnp.zeros((l, d), cfg.dtype),
            "wq": w(ks[2], (l, d, d)), "bq": jnp.zeros((l, d), cfg.dtype),
            "wk": w(ks[3], (l, d, d)), "bk": jnp.zeros((l, d), cfg.dtype),
            "wv": w(ks[4], (l, d, d)), "bv": jnp.zeros((l, d), cfg.dtype),
            "wo": w(ks[5], (l, d, d)), "bo": jnp.zeros((l, d), cfg.dtype),
            "w1": w(ks[6], (l, d, f)), "b1": jnp.zeros((l, f), cfg.dtype),
            "w2": w(ks[7], (l, f, d)), "b2": jnp.zeros((l, d), cfg.dtype),
        },
        "post_ln_w": jnp.ones((d,), cfg.dtype),
        "post_ln_b": jnp.zeros((d,), cfg.dtype),
    }


def load_navit_siglip_state_dict(cfg: NavitSiglipConfig, tensors: dict, prefix: str = "vpm.") -> dict:
    """Map an Idefics2VisionTransformer / MiniCPM-V ``vpm`` state dict (numpy
    values) onto the pytree. Same tensor layout as the plain SigLIP tower but
    keeps ALL encoder layers and the 70x70 position table."""
    from .siglip import SiglipConfig, load_siglip_state_dict

    shim = SiglipConfig(
        hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
        num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        image_size=cfg.num_patches_per_side * cfg.patch_size,
        patch_size=cfg.patch_size, layer_norm_eps=cfg.layer_norm_eps, dtype=cfg.dtype,
    )
    return load_siglip_state_dict(shim, tensors, prefix=prefix)


def navit_position_ids(cfg: NavitSiglipConfig, tgt_sizes: jnp.ndarray, n_max: int) -> jnp.ndarray:
    """Bucketized position ids for packed patches. tgt_sizes [B, 2] int32 ->
    [B, n_max] int32; padded slots get id 0 (masked out of attention anyway).

    MiniCPM-V vpm formula: patch (r, c) of a th x tw slice maps to fractional
    coords ``torch.arange(0, 1 - 1e-6, 1/nb)`` — i.e. (r/th, c/tw) — and is
    bucketized (right=True) over boundaries arange(1/side, 1, 1/side), giving
    a cell of the side x side native grid; id = bucket_h * side + bucket_w.
    Boundary TIES go to the upper bucket, so a full side x side grid maps to
    the identity raster. (Newer HF Idefics2 scales coords by (1 - 1e-6),
    pushing exact-boundary coords DOWN a bucket — a real divergence; we follow
    the MiniCPM-V checkpoint's own modeling code.)
    """
    side = cfg.num_patches_per_side
    boundaries = jnp.arange(1, side, dtype=jnp.float32) / side
    idx = jnp.arange(n_max, dtype=jnp.int32)

    def one(tgt):
        th, tw = tgt[0], tgt[1]
        r = idx // jnp.maximum(tw, 1)
        c = idx % jnp.maximum(tw, 1)
        frac_h = r.astype(jnp.float32) / th.astype(jnp.float32)
        frac_w = c.astype(jnp.float32) / tw.astype(jnp.float32)
        bh = jnp.searchsorted(boundaries, frac_h, side="right").astype(jnp.int32)
        bw = jnp.searchsorted(boundaries, frac_w, side="right").astype(jnp.int32)
        ids = bh * side + bw
        return jnp.where(idx < th * tw, ids, 0)

    return jax.vmap(one)(tgt_sizes)


def _layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


def navit_siglip_encode(
    params: dict, cfg: NavitSiglipConfig, patches: jnp.ndarray, tgt_sizes: jnp.ndarray
) -> jnp.ndarray:
    """patches [B, N, 3*p*p] packed slices + tgt_sizes [B, 2] -> [B, N, D].

    Rows past ``th*tw`` are padding: masked out of every key set, their
    outputs are garbage and must be ignored by the caller (the MiniCPM-V
    resampler masks by tgt_sizes again).
    """
    b, n, _ = patches.shape
    x = patches.astype(cfg.dtype) @ params["patch_w"] + params["patch_b"]
    pos_ids = navit_position_ids(cfg, tgt_sizes, n)
    x = x + jnp.take(params["pos_emb"], pos_ids, axis=0)

    valid = jnp.arange(n, dtype=jnp.int32)[None, :] < (tgt_sizes[:, 0] * tgt_sizes[:, 1])[:, None]
    key_bias = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)[:, None, None, :]

    def step(carry, lp):
        y = carry
        h = _layer_norm(y, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        q = (h @ lp["wq"] + lp["bq"]).reshape(b, n, cfg.num_heads, cfg.head_dim)
        k = (h @ lp["wk"] + lp["bk"]).reshape(b, n, cfg.num_heads, cfg.head_dim)
        v = (h @ lp["wv"] + lp["bv"]).reshape(b, n, cfg.num_heads, cfg.head_dim)
        scale = cfg.head_dim**-0.5
        scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
        probs = jax.nn.softmax(scores + key_bias, axis=-1).astype(y.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, cfg.hidden_size)
        y = y + (o @ lp["wo"] + lp["bo"])
        h = _layer_norm(y, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        h = h @ lp["w1"] + lp["b1"]
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(y.dtype)
        y = y + (h @ lp["w2"] + lp["b2"])
        return y, None

    x, _ = jax.lax.scan(step, x, params["layers"])
    return _layer_norm(x, params["post_ln_w"], params["post_ln_b"], cfg.layer_norm_eps)


def pack_image_patches(image: np.ndarray, patch_size: int) -> tuple[np.ndarray, tuple[int, int]]:
    """Dense [H, W, 3] image -> (packed patches [th*tw, 3*p*p], (th, tw)).

    Row-major patch order with torch (C, ph, pw) flatten — the layout the
    reference's front-end produces before padding (modeling_minicpmv.py:18).
    """
    h, w, _ = image.shape
    p = patch_size
    th, tw = h // p, w // p
    x = image[: th * p, : tw * p].reshape(th, p, tw, p, 3)
    x = x.transpose(0, 2, 4, 1, 3).reshape(th * tw, 3 * p * p)
    return x, (th, tw)
