"""Vision resamplers (the reference's multimodal_resampler family).

The reference builder (llava/model/multimodal_resampler/builder.py:21-35)
dispatches over: ``spatial_pool`` (LLaVA-NeXT-Video's per-frame 2D pooling,
spatial_pool.py:6-42), ``masked_drop`` (training-time random token masking,
masked_drop.py:7-43), ``perceiver`` (flamingo-style latent resampler,
perceiver.py:74-130), ``qformer`` (BLIP-2 query-only BERT — see
``sttm_tpu.models.qformer``), and the IdentityMap default used by every
STTM experiment. This module implements the first three functionally, plus
the MiniCPM-V 2.6-style cross-attention resampler that FrameFusion's MiniCPM-V
front-end feeds through (framefusion/models/minicpmv/modeling_minicpmv.py:47
calls ``self.resampler(vision_embedding, tgt_sizes)``; the module itself lives
in the upstream MiniCPM-V checkpoint, not the reference repo).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "spatial_pool",
    "masked_drop",
    "PerceiverConfig",
    "init_perceiver_params",
    "perceiver_resample",
    "MiniCPMVResamplerConfig",
    "init_minicpmv_resampler_params",
    "minicpmv_resample",
    "sincos_pos_embed_2d",
]


# ---------------------------------------------------------------------------
# spatial_pool (LLaVA-NeXT-Video: per-frame 2D pooling, stride 2 average)
# ---------------------------------------------------------------------------


def spatial_pool(
    features: jnp.ndarray, grid_h: int, grid_w: int, stride: int = 2, mode: str = "average"
) -> jnp.ndarray:
    """[B, grid_h*grid_w, D] -> [B, (grid_h//stride)*(grid_w//stride), D].

    Torch nn.{Avg,Max}Pool2d(kernel=stride, stride=stride) semantics
    (spatial_pool.py:15-18): trailing rows/cols that don't fill a window are
    dropped (floor division).
    """
    b, n, d = features.shape
    assert n == grid_h * grid_w, (n, grid_h, grid_w)
    oh, ow = grid_h // stride, grid_w // stride
    x = features.reshape(b, grid_h, grid_w, d)[:, : oh * stride, : ow * stride]
    x = x.reshape(b, oh, stride, ow, stride, d)
    if mode == "average":
        x = x.astype(jnp.float32).mean(axis=(2, 4)).astype(features.dtype)
    elif mode == "max":
        x = x.max(axis=(2, 4))
    else:
        raise ValueError(f"unknown pooling mode {mode!r}")
    return x.reshape(b, oh * ow, d)


# ---------------------------------------------------------------------------
# masked_drop (training-time random masking, MAE-style shuffle)
# ---------------------------------------------------------------------------


def masked_drop(
    features: jnp.ndarray,
    key: jax.Array | None = None,
    ratio: float = 0.5,
    mode: str = "fixed",
    training: bool = False,
) -> jnp.ndarray:
    """[B, N, D] -> [B, keep, D]. Inference is a no-op (masked_drop.py:19-20).

    ``fixed`` keeps ``int(N * ratio)`` tokens per sample via per-sample random
    shuffle (argsort of uniform noise — masked_drop.py:58-76 random_masking);
    ``cls_only`` keeps the first token.
    """
    if not training:
        return features
    b, n, d = features.shape
    if mode == "cls_only":
        return features[:, :1]
    if mode != "fixed":
        raise ValueError(f"unsupported masked_drop mode {mode!r}")
    keep = int(n * ratio)
    noise = jax.random.uniform(key, (b, n))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_keep = ids_shuffle[:, :keep]
    return jnp.take_along_axis(features, ids_keep[:, :, None], axis=1)


# ---------------------------------------------------------------------------
# Flamingo-style perceiver (perceiver.py:74-130)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PerceiverConfig:
    dim: int
    depth: int = 6
    dim_head: int = 64
    heads: int = 8
    num_latents: int = 64
    ff_mult: int = 4
    layer_norm_eps: float = 1e-5

    @property
    def inner_dim(self) -> int:
        return self.dim_head * self.heads


def init_perceiver_params(cfg: PerceiverConfig, key: jax.Array) -> dict:
    ks = jax.random.split(key, 6)
    d, inner, f, l = cfg.dim, cfg.inner_dim, int(cfg.dim * cfg.ff_mult), cfg.depth

    def w(k, shape):
        return jax.random.normal(k, shape, jnp.float32) * shape[-2] ** -0.5

    return {
        "latents": jax.random.normal(ks[0], (cfg.num_latents, d), jnp.float32),
        "layers": {
            # PerceiverAttention (perceiver.py:30-71): separate media/latent
            # pre-norms, fused kv over concat(media, latents), no biases
            "nm_w": jnp.ones((l, d)), "nm_b": jnp.zeros((l, d)),
            "nl_w": jnp.ones((l, d)), "nl_b": jnp.zeros((l, d)),
            "wq": w(ks[1], (l, d, inner)),
            "wkv": w(ks[2], (l, d, 2 * inner)),
            "wo": w(ks[3], (l, inner, d)),
            # FeedForward (perceiver.py:20-27): LN -> Linear -> GELU -> Linear
            "nf_w": jnp.ones((l, d)), "nf_b": jnp.zeros((l, d)),
            "w1": w(ks[4], (l, d, f)),
            "w2": w(ks[5], (l, f, d)),
        },
        "norm_w": jnp.ones((d,)),
        "norm_b": jnp.zeros((d,)),
    }


def _ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def perceiver_resample(params: dict, cfg: PerceiverConfig, features: jnp.ndarray) -> jnp.ndarray:
    """[B, N, D] image features -> [B, num_latents, D] (perceiver.py:145:
    the wrapper feeds image_features[:, None, None] so T=F=1)."""
    eps = cfg.layer_norm_eps
    b = features.shape[0]
    x = features.astype(jnp.float32)
    latents = jnp.broadcast_to(params["latents"][None], (b, cfg.num_latents, cfg.dim))

    def step(latents, lp):
        xm = _ln(x, lp["nm_w"], lp["nm_b"], eps)
        lt = _ln(latents, lp["nl_w"], lp["nl_b"], eps)
        q = (lt @ lp["wq"]).reshape(b, -1, cfg.heads, cfg.dim_head)
        kv_in = jnp.concatenate([xm, lt], axis=1)
        kv = kv_in @ lp["wkv"]
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(b, -1, cfg.heads, cfg.dim_head)
        v = v.reshape(b, -1, cfg.heads, cfg.dim_head)
        sim = jnp.einsum("bqhd,bkhd->bhqk", q * cfg.dim_head**-0.5, k)
        sim = sim - jax.lax.stop_gradient(sim.max(-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, -1, cfg.inner_dim)
        latents = latents + o @ lp["wo"]
        h = _ln(latents, lp["nf_w"], lp["nf_b"], eps)
        h = jax.nn.gelu(h @ lp["w1"], approximate=False)
        return latents + h @ lp["w2"], None

    latents, _ = jax.lax.scan(step, latents, params["layers"])
    return _ln(latents, params["norm_w"], params["norm_b"], eps).astype(features.dtype)


# ---------------------------------------------------------------------------
# MiniCPM-V 2.6-style resampler (cross-attention, 2D sincos key positions)
# ---------------------------------------------------------------------------


def sincos_pos_embed_2d(dim: int, h: int, w: int) -> np.ndarray:
    """Fixed 2D sine-cosine position embedding [h*w, dim] (the MiniCPM-V
    resampler's key positions; standard get_2d_sincos_pos_embed layout:
    first half encodes the row coordinate, second half the column)."""
    assert dim % 4 == 0
    quarter = dim // 4
    omega = 1.0 / (10000.0 ** (np.arange(quarter, dtype=np.float64) / quarter))
    gy, gx = np.meshgrid(np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64), indexing="ij")

    def enc(coord):
        out = coord.reshape(-1)[:, None] * omega[None, :]
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    return np.concatenate([enc(gy), enc(gx)], axis=1).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class MiniCPMVResamplerConfig:
    embed_dim: int  # LLM hidden size (3584 for MiniCPM-V 2.6 / Qwen2-7B)
    kv_dim: int  # vision tower hidden size
    num_queries: int = 64
    num_heads: int = 8
    layer_norm_eps: float = 1e-6
    max_size: tuple = (70, 70)

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


def init_minicpmv_resampler_params(cfg: MiniCPMVResamplerConfig, key: jax.Array) -> dict:
    ks = jax.random.split(key, 5)
    d = cfg.embed_dim

    def w(k, shape):
        return jax.random.normal(k, shape, jnp.float32) * shape[-2] ** -0.5

    return {
        "query": jax.random.normal(ks[0], (cfg.num_queries, d), jnp.float32) * 0.02,
        "kv_proj": w(ks[1], (cfg.kv_dim, d)),  # bias-free
        # single MultiheadAttention block: fused in-proj + out-proj
        "in_w": w(ks[2], (d, 3 * d)),
        "in_b": jnp.zeros((3 * d,)),
        "out_w": w(ks[3], (d, d)),
        "out_b": jnp.zeros((d,)),
        "ln_q_w": jnp.ones((d,)), "ln_q_b": jnp.zeros((d,)),
        "ln_kv_w": jnp.ones((d,)), "ln_kv_b": jnp.zeros((d,)),
        "ln_post_w": jnp.ones((d,)), "ln_post_b": jnp.zeros((d,)),
        "proj": jax.random.normal(ks[4], (d, d), jnp.float32) * d**-0.5,
    }


def minicpmv_resample(
    params: dict,
    cfg: MiniCPMVResamplerConfig,
    features: jnp.ndarray,
    tgt_size: tuple,
) -> jnp.ndarray:
    """One image slice [N, kv_dim] (N = tgt_h * tgt_w patches) ->
    [num_queries, embed_dim].

    MiniCPM-V 2.6 resampler semantics: project vision features to the LLM
    width, layer-norm, add a fixed 2D sincos position embedding over the
    slice's (tgt_h, tgt_w) patch grid to the KEYS, then one multi-head
    cross-attention from ``num_queries`` learned (layer-normed) queries,
    followed by a post layer-norm and an output projection matrix.
    """
    eps = cfg.layer_norm_eps
    th, tw = tgt_size
    x = features.astype(jnp.float32) @ params["kv_proj"]
    x = _ln(x, params["ln_kv_w"], params["ln_kv_b"], eps)
    q = _ln(params["query"], params["ln_q_w"], params["ln_q_b"], eps)

    pos = jnp.asarray(sincos_pos_embed_2d(cfg.embed_dim, th, tw))
    k_in = x + pos

    d = cfg.embed_dim
    wq, wk, wv = jnp.split(params["in_w"], 3, axis=1)
    bq, bk, bv = jnp.split(params["in_b"], 3)
    qh = (q @ wq + bq).reshape(cfg.num_queries, cfg.num_heads, cfg.head_dim)
    kh = (k_in @ wk + bk).reshape(-1, cfg.num_heads, cfg.head_dim)
    vh = (x @ wv + bv).reshape(-1, cfg.num_heads, cfg.head_dim)
    sim = jnp.einsum("qhd,khd->hqk", qh * cfg.head_dim**-0.5, kh)
    attn = jax.nn.softmax(sim, axis=-1)
    o = jnp.einsum("hqk,khd->qhd", attn, vh).reshape(cfg.num_queries, d)
    o = o @ params["out_w"] + params["out_b"]
    o = _ln(o, params["ln_post_w"], params["ln_post_b"], eps)
    return (o @ params["proj"]).astype(features.dtype)
