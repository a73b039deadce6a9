"""Qwen2-VL vision transformer in JAX.

Behavioral port of the vendored reference ViT
(llava/model/qwen2vl/modeling_qwen2vl.py:258-1135): Conv3d patch embed
(2x14x14, as a matmul), 2D vision rotary embeddings over (h, w) with tokens in
2x2 merge-window order (rot_pos_emb, :1089-1115), full bidirectional attention
within each temporal slice (cu_seqlens segments, :1122-1126), and the 2x2
PatchMerger MLP into the LLM width (:296).

TPU-native twist: all temporal slices of one video have equal length (h*w),
so segment attention becomes plain batched attention over [T_slices, HW, D] —
no masks, no varlen kernels.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Qwen2VLVitConfig", "QWEN2VL_VIT_7B", "init_vit_params", "vit_encode", "load_vit_state_dict"]


@dataclasses.dataclass(frozen=True)
class Qwen2VLVitConfig:
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: int = 4
    out_hidden_size: int = 3584  # LLM width
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    in_channels: int = 3
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size**2

    @property
    def mlp_hidden(self) -> int:
        return self.embed_dim * self.mlp_ratio


QWEN2VL_VIT_7B = Qwen2VLVitConfig()

QWEN2VL_VIT_TINY = Qwen2VLVitConfig(
    embed_dim=32, depth=2, num_heads=4, out_hidden_size=64, dtype=jnp.float32
)


def init_vit_params(cfg: Qwen2VLVitConfig, key: jax.Array) -> dict:
    ks = jax.random.split(key, 8)
    d, f, l = cfg.embed_dim, cfg.mlp_hidden, cfg.depth
    merged = d * cfg.spatial_merge_size**2

    def w(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * shape[-2] ** -0.5).astype(cfg.dtype)

    return {
        "patch_w": w(ks[0], (cfg.patch_dim, d)),
        "layers": {
            "ln1_w": jnp.ones((l, d), cfg.dtype), "ln1_b": jnp.zeros((l, d), cfg.dtype),
            "ln2_w": jnp.ones((l, d), cfg.dtype), "ln2_b": jnp.zeros((l, d), cfg.dtype),
            "wqkv": w(ks[1], (l, d, 3 * d)), "bqkv": jnp.zeros((l, 3 * d), cfg.dtype),
            "wo": w(ks[2], (l, d, d)), "bo": jnp.zeros((l, d), cfg.dtype),
            "w1": w(ks[3], (l, d, f)), "b1": jnp.zeros((l, f), cfg.dtype),
            "w2": w(ks[4], (l, f, d)), "b2": jnp.zeros((l, d), cfg.dtype),
        },
        "merger_ln_w": jnp.ones((d,), cfg.dtype),
        "merger_ln_b": jnp.zeros((d,), cfg.dtype),
        "merger_w1": w(ks[5], (merged, merged)),
        "merger_b1": jnp.zeros((merged,), cfg.dtype),
        "merger_w2": w(ks[6], (merged, cfg.out_hidden_size)),
        "merger_b2": jnp.zeros((cfg.out_hidden_size,), cfg.dtype),
    }


def _window_order_pos(h: int, w: int, m: int) -> np.ndarray:
    """(h, w) coords of tokens in 2x2 merge-window order (rot_pos_emb)."""
    hh = np.arange(h, dtype=np.int32)[:, None] * np.ones((1, w), np.int32)
    ww = np.ones((h, 1), np.int32) * np.arange(w, dtype=np.int32)[None, :]

    def reorder(x):
        return x.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)

    return np.stack([reorder(hh), reorder(ww)], axis=-1)  # [h*w, 2]


def _vision_rope(cfg: Qwen2VLVitConfig, h: int, w: int):
    """cos/sin [h*w, head_dim] fp32 for window-ordered tokens."""
    dim = cfg.head_dim // 2
    inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    pos = _window_order_pos(h, w, cfg.spatial_merge_size)  # [N, 2]
    fh = pos[:, 0:1].astype(np.float64) * inv[None]  # [N, dim/2]
    fw = pos[:, 1:2].astype(np.float64) * inv[None]
    freqs = np.concatenate([fh, fw], axis=-1)  # [N, head_dim/2]
    emb = np.concatenate([freqs, freqs], axis=-1)  # rotate-half convention
    return jnp.asarray(np.cos(emb), jnp.float32), jnp.asarray(np.sin(emb), jnp.float32)


def _rope_apply(x, cos, sin):
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos[None, :, None, :] + rot * sin[None, :, None, :]).astype(x.dtype)


def _layer_norm(x, w, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


def vit_encode(params: dict, cfg: Qwen2VLVitConfig, patches: jnp.ndarray, grid_thw: tuple):
    """patches: [N, patch_dim] flattened Conv3d inputs in window order
    (N = t * h * w); grid_thw: static (t, h, w) in PATCH units (h, w are
    pre-merge). Returns merged features [t * h/m * w/m, out_hidden_size]."""
    t, h, w = grid_thw
    n = t * h * w
    assert patches.shape[0] == n, (patches.shape, grid_thw)
    d = cfg.embed_dim

    x = patches.astype(cfg.dtype) @ params["patch_w"]  # conv-as-matmul
    x = x.reshape(t, h * w, d)  # temporal slices = attention segments
    cos, sin = _vision_rope(cfg, h, w)

    nh, hd = cfg.num_heads, cfg.head_dim

    def step(carry, lp):
        y = carry
        hln = _layer_norm(y, lp["ln1_w"], lp["ln1_b"])
        qkv = hln @ lp["wqkv"] + lp["bqkv"]  # [t, hw, 3d]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _rope_apply(q.reshape(t, h * w, nh, hd), cos, sin)
        k = _rope_apply(k.reshape(t, h * w, nh, hd), cos, sin)
        v = v.reshape(t, h * w, nh, hd)
        scores = jnp.einsum(
            "tqhd,tkhd->thqk", q.astype(jnp.float32), k.astype(jnp.float32)
        ) * (hd**-0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(y.dtype)
        o = jnp.einsum("thqk,tkhd->tqhd", probs, v).reshape(t, h * w, d)
        y = y + (o @ lp["wo"] + lp["bo"])
        hln = _layer_norm(y, lp["ln2_w"], lp["ln2_b"])
        hln = hln @ lp["w1"] + lp["b1"]
        hln = (jax.nn.sigmoid(1.702 * hln.astype(jnp.float32)) * hln.astype(jnp.float32)).astype(y.dtype)  # quick_gelu
        y = y + (hln @ lp["w2"] + lp["b2"])
        return y, None

    x, _ = jax.lax.scan(step, x, params["layers"])

    # PatchMerger: ln over embed_dim, group 2x2 windows (token order is
    # already window-grouped), MLP to LLM width
    x = _layer_norm(x.reshape(n, d), params["merger_ln_w"], params["merger_ln_b"])
    m2 = cfg.spatial_merge_size**2
    x = x.reshape(n // m2, m2 * d)
    x = x @ params["merger_w1"] + params["merger_b1"]
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(cfg.dtype)
    return x @ params["merger_w2"] + params["merger_b2"]


def load_vit_state_dict(cfg: Qwen2VLVitConfig, tensors: dict, prefix: str = "visual.") -> dict:
    lm = {
        "norm1.weight": ("ln1_w", False), "norm1.bias": ("ln1_b", False),
        "norm2.weight": ("ln2_w", False), "norm2.bias": ("ln2_b", False),
        "attn.qkv.weight": ("wqkv", True), "attn.qkv.bias": ("bqkv", False),
        "attn.proj.weight": ("wo", True), "attn.proj.bias": ("bo", False),
        "mlp.fc1.weight": ("w1", True), "mlp.fc1.bias": ("b1", False),
        "mlp.fc2.weight": ("w2", True), "mlp.fc2.bias": ("b2", False),
    }
    stacks = {k: [None] * cfg.depth for k, _ in lm.values()}
    params = {"layers": {}}
    for name, val in tensors.items():
        if not name.startswith(prefix):
            continue
        rest = name[len(prefix):]
        arr = np.asarray(val)
        if rest == "patch_embed.proj.weight":
            params["patch_w"] = jnp.asarray(arr.reshape(cfg.embed_dim, -1).T, cfg.dtype)
        elif rest == "merger.ln_q.weight":
            params["merger_ln_w"] = jnp.asarray(arr, cfg.dtype)
        elif rest == "merger.ln_q.bias":
            params["merger_ln_b"] = jnp.asarray(arr, cfg.dtype)
        elif rest == "merger.mlp.0.weight":
            params["merger_w1"] = jnp.asarray(arr.T, cfg.dtype)
        elif rest == "merger.mlp.0.bias":
            params["merger_b1"] = jnp.asarray(arr, cfg.dtype)
        elif rest == "merger.mlp.2.weight":
            params["merger_w2"] = jnp.asarray(arr.T, cfg.dtype)
        elif rest == "merger.mlp.2.bias":
            params["merger_b2"] = jnp.asarray(arr, cfg.dtype)
        elif rest.startswith("blocks."):
            idx_str, sub = rest[len("blocks."):].split(".", 1)
            if sub in lm:
                key, transpose = lm[sub]
                stacks[key][int(idx_str)] = arr.T if transpose else arr
    for key, stack in stacks.items():
        params["layers"][key] = jnp.asarray(np.stack(stack), cfg.dtype)
    return params
