"""SigLIP-so400m vision tower in JAX (feature extraction backbone).

The tower the reference actually uses (multimodal_encoder/builder.py:22-23):
so400m/384 — hidden 1152, 27 encoder layers, 16 heads, MLP 4304, patch 14,
384px -> 27x27 = 729 patch tokens (siglip_encoder.py:79-100). Following the
reference's model surgery, the LAST encoder layer is dropped and no pooling
head is applied (siglip_encoder.py:607-611): features come from the
post-layernorm over layer-26 outputs.

Functional: params pytree with stacked encoder layers, lax.scan execution,
bf16-friendly. Patch embedding as a reshaped matmul (MXU) instead of conv.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SiglipConfig", "SIGLIP_SO400M", "init_siglip_params", "siglip_encode", "load_siglip_state_dict"]


@dataclasses.dataclass(frozen=True)
class SiglipConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_layers: int = 26  # 27 in the checkpoint; last layer dropped
    num_heads: int = 16
    image_size: int = 384
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.patches_per_side**2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


SIGLIP_SO400M = SiglipConfig()

SIGLIP_TINY = SiglipConfig(
    hidden_size=32, intermediate_size=64, num_layers=2, num_heads=4,
    image_size=28, patch_size=14, dtype=jnp.float32,
)


def init_siglip_params(cfg: SiglipConfig, key: jax.Array) -> dict:
    ks = jax.random.split(key, 10)
    d, f, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    pdim = 3 * cfg.patch_size * cfg.patch_size

    def w(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * shape[-2] ** -0.5).astype(cfg.dtype)

    return {
        "patch_w": w(ks[0], (pdim, d)),
        "patch_b": jnp.zeros((d,), cfg.dtype),
        "pos_emb": (jax.random.normal(ks[1], (cfg.num_patches, d)) * 0.02).astype(cfg.dtype),
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


def _layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


def siglip_encode(params: dict, cfg: SiglipConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels: [B, H, W, 3] (preprocessed, channel-last) -> [B, 729, D]."""
    b, hh, ww, _ = pixels.shape
    p = cfg.patch_size
    gh, gw = hh // p, ww // p
    # conv-as-matmul: extract non-overlapping patches, flatten (C, ph, pw) in
    # torch Conv2d weight order
    x = pixels.reshape(b, gh, p, gw, p, 3).transpose(0, 1, 3, 5, 2, 4)
    x = x.reshape(b, gh * gw, 3 * p * p).astype(cfg.dtype)
    x = x @ params["patch_w"] + params["patch_b"]
    x = x + params["pos_emb"][None]

    def step2(carry, lp):
        y = carry
        h = _layer_norm(y, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        n = h.shape[1]
        q = (h @ lp["wq"] + lp["bq"]).reshape(b, n, cfg.num_heads, cfg.head_dim)
        k = (h @ lp["wk"] + lp["bk"]).reshape(b, n, cfg.num_heads, cfg.head_dim)
        v = (h @ lp["wv"] + lp["bv"]).reshape(b, n, cfg.num_heads, cfg.head_dim)
        scale = cfg.head_dim**-0.5
        scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
        probs = jax.nn.softmax(scores, axis=-1).astype(y.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, cfg.hidden_size)
        y = y + (o @ lp["wo"] + lp["bo"])
        h = _layer_norm(y, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        h = h @ lp["w1"] + lp["b1"]
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(y.dtype)
        y = y + (h @ lp["w2"] + lp["b2"])
        return y, None

    x, _ = jax.lax.scan(step2, x, params["layers"])
    return _layer_norm(x, params["post_ln_w"], params["post_ln_b"], cfg.layer_norm_eps)


def encode_video_frames(params: dict, cfg: SiglipConfig, pixels, chunk: int = 64):
    """Chunked tower forward over video frames (the reference encodes in
    <=512-frame chunks, video_feat_llavavideo.py:80-89). pixels: normalized
    [T, H, W, 3] numpy/array -> features [T, P, D] float32 numpy."""
    import numpy as np

    encode = jax.jit(lambda px: siglip_encode(params, cfg, px))
    out = []
    t = pixels.shape[0]
    for i in range(0, t, chunk):
        part = pixels[i : i + chunk]
        pad = chunk - part.shape[0]
        if pad:
            part = jnp.concatenate([jnp.asarray(part), jnp.zeros((pad,) + part.shape[1:], jnp.float32)])
        f = np.asarray(encode(jnp.asarray(part)), np.float32)
        out.append(f[: min(chunk, t - i)])
    return np.concatenate(out)


def load_siglip_state_dict(cfg: SiglipConfig, tensors: dict, prefix: str = "vision_model.") -> dict:
    """Map a HF SiglipVisionModel state dict (numpy values) to our layout,
    dropping the last encoder layer and the pooling head (reference surgery,
    siglip_encoder.py:607-611)."""
    l = cfg.num_layers
    lm = {
        "layer_norm1.weight": ("ln1_w", False), "layer_norm1.bias": ("ln1_b", False),
        "layer_norm2.weight": ("ln2_w", False), "layer_norm2.bias": ("ln2_b", False),
        "self_attn.q_proj.weight": ("wq", True), "self_attn.q_proj.bias": ("bq", False),
        "self_attn.k_proj.weight": ("wk", True), "self_attn.k_proj.bias": ("bk", False),
        "self_attn.v_proj.weight": ("wv", True), "self_attn.v_proj.bias": ("bv", False),
        "self_attn.out_proj.weight": ("wo", True), "self_attn.out_proj.bias": ("bo", False),
        "mlp.fc1.weight": ("w1", True), "mlp.fc1.bias": ("b1", False),
        "mlp.fc2.weight": ("w2", True), "mlp.fc2.bias": ("b2", False),
    }
    stacks = {k: [None] * l for k, _ in lm.values()}
    params = {"layers": {}}
    for name, val in tensors.items():
        if not name.startswith(prefix):
            continue
        rest = name[len(prefix):]
        if rest == "embeddings.patch_embedding.weight":
            # conv [D, 3, p, p] -> [3*p*p, D] matching our patch flatten order
            arr = np.asarray(val).reshape(cfg.hidden_size, -1).T
            params["patch_w"] = jnp.asarray(arr, cfg.dtype)
        elif rest == "embeddings.patch_embedding.bias":
            params["patch_b"] = jnp.asarray(val, cfg.dtype)
        elif rest == "embeddings.position_embedding.weight":
            params["pos_emb"] = jnp.asarray(val, cfg.dtype)
        elif rest == "post_layernorm.weight":
            params["post_ln_w"] = jnp.asarray(val, cfg.dtype)
        elif rest == "post_layernorm.bias":
            params["post_ln_b"] = jnp.asarray(val, cfg.dtype)
        elif rest.startswith("encoder.layers."):
            idx_str, sub = rest[len("encoder.layers."):].split(".", 1)
            idx = int(idx_str)
            if idx >= l:  # dropped last layer
                continue
            if sub in lm:
                key, transpose = lm[sub]
                arr = np.asarray(val)
                stacks[key][idx] = arr.T if transpose else arr
    for key, stack in stacks.items():
        params["layers"][key] = jnp.asarray(np.stack(stack), cfg.dtype)
    return params
