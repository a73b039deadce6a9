"""BLIP-2 Q-Former resampler (the reference's ``qformer`` resampler option).

The reference builds a BertLMHeadModel in query-only mode
(multimodal_resampler/qformer.py:1102-1162): ``num_latents`` learned query
tokens self-attend, cross-attend to the layer-normed image features every
``cross_attention_freq`` layers (``mm_qformer_depth`` is passed as the
frequency, :1119-1126), and run the query FFN branch; the text FFN branches
are deleted (:1133-1135) and there is no word/position embedding. This is a
faithful eval-mode (dropout-free) rewrite: plain functions over a params
pytree, fp32 LayerNorms, exact (erf) GELU — bit-comparable to the torch
module (tests/test_resamplers.py).

Layers are a Python loop, not a scan: cross-attention layers have extra
params (non-uniform stack), and the whole module is 12 layers over
``num_latents`` ≈ 32 tokens — negligible next to the decoder.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "QFormerConfig",
    "init_qformer_params",
    "qformer_params_from_torch",
    "qformer_resample",
]


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    """bert-base geometry (qformer.py:1120 from_pretrained bert-base-uncased)."""

    hidden_size: int = 768
    num_heads: int = 12
    intermediate_size: int = 3072
    num_layers: int = 12
    num_latents: int = 32  # mm_qformer_latents (query tokens)
    encoder_width: int = 1152  # vision feature dim (SigLIP hidden)
    cross_attention_freq: int = 2  # mm_qformer_depth (reference naming quirk)
    ln_eps: float = 1e-12  # BertConfig.layer_norm_eps
    ln_vision_eps: float = 1e-5  # plain nn.LayerNorm default (:1135)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _dense_init(key, d_in, d_out, scale=0.02):
    return {
        "w": jax.random.normal(key, (d_in, d_out), jnp.float32) * scale,
        "b": jnp.zeros((d_out,), jnp.float32),
    }


def _ln_init(d):
    return {"w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


def init_qformer_params(cfg: QFormerConfig, key: jax.Array) -> dict:
    h, dv, f = cfg.hidden_size, cfg.encoder_width, cfg.intermediate_size
    keys = iter(jax.random.split(key, 8 * cfg.num_layers + 4))

    def attn(kv_dim):
        return {
            "q": _dense_init(next(keys), h, h),
            "k": _dense_init(next(keys), kv_dim, h),
            "v": _dense_init(next(keys), kv_dim, h),
            "o": _dense_init(next(keys), h, h),
            "ln": _ln_init(h),
        }

    layers = []
    for i in range(cfg.num_layers):
        lp = {"self": attn(h), "ffn": {
            "i": _dense_init(next(keys), h, f),
            "o": _dense_init(next(keys), f, h),
            "ln": _ln_init(h),
        }}
        if i % cfg.cross_attention_freq == 0:
            lp["cross"] = attn(dv)
        layers.append(lp)
    return {
        "query_tokens": jax.random.normal(next(keys), (1, cfg.num_latents, h), jnp.float32) * 0.02,
        "ln_vision": _ln_init(dv),
        "emb_ln": _ln_init(h),
        "layers": layers,
    }


def qformer_params_from_torch(cfg: QFormerConfig, sd: dict) -> dict:
    """Map the reference Qformer module's state dict (numpy values) into the
    pytree. Linear weights are [out, in] and get transposed."""

    def dense(prefix):
        return {
            "w": jnp.asarray(np.asarray(sd[prefix + ".weight"]).T, jnp.float32),
            "b": jnp.asarray(sd[prefix + ".bias"], jnp.float32),
        }

    def ln(prefix):
        return {
            "w": jnp.asarray(sd[prefix + ".weight"], jnp.float32),
            "b": jnp.asarray(sd[prefix + ".bias"], jnp.float32),
        }

    def attn(prefix, out_prefix):
        return {
            "q": dense(prefix + ".query"),
            "k": dense(prefix + ".key"),
            "v": dense(prefix + ".value"),
            "o": dense(out_prefix + ".dense"),
            "ln": ln(out_prefix + ".LayerNorm"),
        }

    layers = []
    for i in range(cfg.num_layers):
        base = f"Qformer.bert.encoder.layer.{i}"
        lp = {
            "self": attn(f"{base}.attention.self", f"{base}.attention.output"),
            "ffn": {
                "i": dense(f"{base}.intermediate_query.dense"),
                "o": dense(f"{base}.output_query.dense"),
                "ln": ln(f"{base}.output_query.LayerNorm"),
            },
        }
        if i % cfg.cross_attention_freq == 0:
            lp["cross"] = attn(f"{base}.crossattention.self", f"{base}.crossattention.output")
        layers.append(lp)
    return {
        "query_tokens": jnp.asarray(sd["query_tokens"], jnp.float32),
        "ln_vision": ln("ln_vision"),
        "emb_ln": ln("Qformer.bert.embeddings.LayerNorm"),
        "layers": layers,
    }


def _layer_norm(x, p, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * p["w"] + p["b"]).astype(x.dtype)


def _dense(x, p):
    return x @ p["w"] + p["b"]


def _attention(h_q, kv, p, cfg: QFormerConfig):
    """Bidirectional multi-head attention + output proj + residual LN
    (BertSelfAttention :153-238 + BertSelfOutput :239-251, no mask — the
    resampler passes all-ones image_atts, :1141)."""
    b, sq, _ = h_q.shape
    skv = kv.shape[1]
    nh, hd = cfg.num_heads, cfg.head_dim
    q = _dense(h_q, p["q"]).reshape(b, sq, nh, hd)
    k = _dense(kv, p["k"]).reshape(b, skv, nh, hd)
    v = _dense(kv, p["v"]).reshape(b, skv, nh, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (hd ** 0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, sq, cfg.hidden_size)
    return _layer_norm(_dense(o, p["o"]) + h_q, p["ln"], cfg.ln_eps)


def qformer_resample(params: dict, cfg: QFormerConfig, features: jnp.ndarray) -> jnp.ndarray:
    """[B, N, encoder_width] image features -> [B, num_latents, hidden_size]
    (Qformer.forward :1137-1148)."""
    x = _layer_norm(features, params["ln_vision"], cfg.ln_vision_eps)
    b = features.shape[0]
    h = jnp.broadcast_to(params["query_tokens"], (b, cfg.num_latents, cfg.hidden_size))
    h = _layer_norm(h, params["emb_ln"], cfg.ln_eps)
    for lp in params["layers"]:
        h = _attention(h, h, lp["self"], cfg)
        if "cross" in lp:
            h = _attention(h, x, lp["cross"], cfg)
        # query FFN branch (feed_forward_chunk_query :428-431), exact GELU
        f = jax.nn.gelu(_dense(h, lp["ffn"]["i"]).astype(jnp.float32), approximate=False)
        h = _layer_norm(_dense(f.astype(h.dtype), lp["ffn"]["o"]) + h, lp["ffn"]["ln"], cfg.ln_eps)
    return h
