"""CLIP vision tower in JAX (LLaVA-NeXT-Video's image/video encoder).

The reference's CLIPVisionTower (llava/model/multimodal_encoder/
clip_encoder.py:12-80) wraps HF CLIPVisionModel and selects
``hidden_states[select_layer]`` (default -2: the output of the second-to-last
encoder layer, before the final layer and post-layernorm) with
``select_feature='patch'`` (drop the CLS token, clip_encoder.py:61-66).
We mirror that surgery the same way the SigLIP tower does: ``num_layers`` is
the number of layers actually RUN (checkpoint layers beyond it are dropped at
load time) and no post-layernorm is applied.

Architectural deltas vs SigLIP: a learned CLS token, a pre-layernorm after
the embeddings, no patch-embedding bias, and quick-GELU activations
(openai/clip-vit-large-patch14 family).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ClipConfig",
    "CLIP_VIT_L_336",
    "init_clip_params",
    "clip_encode",
    "load_clip_state_dict",
]


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 23  # 24 in the checkpoint; select_layer=-2 drops the last
    num_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
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


CLIP_VIT_L_336 = ClipConfig()

CLIP_TINY = ClipConfig(
    hidden_size=32, intermediate_size=64, num_layers=2, num_heads=4,
    image_size=28, patch_size=14, dtype=jnp.float32,
)


def init_clip_params(cfg: ClipConfig, key: jax.Array) -> dict:
    ks = jax.random.split(key, 10)
    d, f, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    pdim = 3 * cfg.patch_size * cfg.patch_size

    def w(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * shape[-2] ** -0.5).astype(cfg.dtype)

    return {
        "cls_emb": (jax.random.normal(ks[8], (d,)) * 0.02).astype(cfg.dtype),
        "patch_w": w(ks[0], (pdim, d)),  # CLIP's patch conv has no bias
        "pos_emb": (jax.random.normal(ks[1], (cfg.num_patches + 1, d)) * 0.02).astype(cfg.dtype),
        "pre_ln_w": jnp.ones((d,), cfg.dtype),
        "pre_ln_b": jnp.zeros((d,), cfg.dtype),
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
    }


def _layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


def clip_encode(
    params: dict, cfg: ClipConfig, pixels: jnp.ndarray, select_feature: str = "patch"
) -> jnp.ndarray:
    """pixels: [B, H, W, 3] (preprocessed, channel-last) -> features.

    Returns hidden_states[-2]-equivalent features: [B, num_patches, D] for
    ``select_feature='patch'`` (CLS dropped, clip_encoder.py:61-62) or
    [B, num_patches+1, D] for 'cls_patch'.
    """
    b, hh, ww, _ = pixels.shape
    p = cfg.patch_size
    gh, gw = hh // p, ww // p
    x = pixels.reshape(b, gh, p, gw, p, 3).transpose(0, 1, 3, 5, 2, 4)
    x = x.reshape(b, gh * gw, 3 * p * p).astype(cfg.dtype)
    x = x @ params["patch_w"]
    cls = jnp.broadcast_to(params["cls_emb"][None, None], (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_emb"][None]
    x = _layer_norm(x, params["pre_ln_w"], params["pre_ln_b"], cfg.layer_norm_eps)

    def step(carry, lp):
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
        h = (h.astype(jnp.float32) * jax.nn.sigmoid(1.702 * h.astype(jnp.float32))).astype(y.dtype)  # quick_gelu
        y = y + (h @ lp["w2"] + lp["b2"])
        return y, None

    x, _ = jax.lax.scan(step, x, params["layers"])
    if select_feature == "patch":
        return x[:, 1:]
    if select_feature == "cls_patch":
        return x
    raise ValueError(f"unexpected select feature {select_feature!r}")


def load_clip_state_dict(cfg: ClipConfig, tensors: dict, prefix: str = "vision_model.") -> dict:
    """Map a HF CLIPVisionModel state dict (numpy values) to our layout,
    keeping only the first ``cfg.num_layers`` encoder layers (select_layer=-2
    surgery) and dropping the post layernorm / projection head."""
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
        if rest == "embeddings.class_embedding":
            params["cls_emb"] = jnp.asarray(val, cfg.dtype)
        elif rest == "embeddings.patch_embedding.weight":
            arr = np.asarray(val).reshape(cfg.hidden_size, -1).T
            params["patch_w"] = jnp.asarray(arr, cfg.dtype)
        elif rest == "embeddings.position_embedding.weight":
            params["pos_emb"] = jnp.asarray(val, cfg.dtype)
        elif rest == "pre_layrnorm.weight":  # HF's (sic) spelling
            params["pre_ln_w"] = jnp.asarray(val, cfg.dtype)
        elif rest == "pre_layrnorm.bias":
            params["pre_ln_b"] = jnp.asarray(val, cfg.dtype)
        elif rest.startswith("encoder.layers."):
            idx_str, sub = rest[len("encoder.layers."):].split(".", 1)
            idx = int(idx_str)
            if idx >= l:
                continue
            if sub in lm:
                key, transpose = lm[sub]
                arr = np.asarray(val)
                stacks[key][idx] = arr.T if transpose else arr
    for key, stack in stacks.items():
        params["layers"][key] = jnp.asarray(np.stack(stack), cfg.dtype)
    return params
