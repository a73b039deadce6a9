"""HF checkpoint loading: safetensors -> stacked-layer params pytree.

The reference loads HF ``from_pretrained`` directories
(llava/model/builder.py:27-315); our equivalent maps Qwen2-family state dicts
into the stacked [L, ...] layout used by the scan-based decoder.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

__all__ = ["params_from_state_dict", "load_safetensors_dir"]

_LAYER_MAP = {
    "input_layernorm.weight": ("ln1", False),
    "post_attention_layernorm.weight": ("ln2", False),
    "self_attn.q_proj.weight": ("wq", True),
    "self_attn.q_proj.bias": ("bq", False),
    "self_attn.k_proj.weight": ("wk", True),
    "self_attn.k_proj.bias": ("bk", False),
    "self_attn.v_proj.weight": ("wv", True),
    "self_attn.v_proj.bias": ("bv", False),
    "self_attn.o_proj.weight": ("wo", True),
    "mlp.gate_proj.weight": ("wg", True),
    "mlp.up_proj.weight": ("wu", True),
    "mlp.down_proj.weight": ("wd", True),
}

# Qwen2-MoE sparse block (HF Qwen2MoeSparseMoeBlock): router + shared expert
# submodules; the per-expert weights are handled separately (nested index)
_MOE_LAYER_MAP = {
    "mlp.gate.weight": ("router", True),
    "mlp.shared_expert.gate_proj.weight": ("ws_g", True),
    "mlp.shared_expert.up_proj.weight": ("ws_u", True),
    "mlp.shared_expert.down_proj.weight": ("ws_d", True),
    "mlp.shared_expert_gate.weight": ("wsg", True),
}
_MOE_EXPERT_MAP = {
    "gate_proj.weight": "we_g",
    "up_proj.weight": "we_u",
    "down_proj.weight": "we_d",
}


def merge_lora_state_dict(tensors: dict, alpha: float | None = None) -> dict:
    """Fold LoRA adapters into base weights: W + (alpha/r) * B @ A.

    The reference merges LoRA checkpoints at load time
    (llava/model/builder.py:54-126, peft merge_and_unload). Keys follow the
    peft convention ``<base>.lora_A.weight`` / ``<base>.lora_B.weight``
    alongside ``<base>.weight`` (optionally with ``base_model.model.``
    prefixes, which are stripped).
    """
    out = {}
    loras: dict[str, dict] = {}
    for name, val in tensors.items():
        clean = name.replace("base_model.model.", "")
        if ".lora_A." in clean or ".lora_B." in clean:
            base, _, rest = clean.partition(".lora_")
            ab = rest[0]  # 'A' or 'B'
            loras.setdefault(base, {})[ab] = np.asarray(val)
        else:
            out[clean.replace(".base_layer", "")] = val
    for base, ab in loras.items():
        if "A" not in ab or "B" not in ab:
            raise ValueError(f"incomplete LoRA pair for {base}")
        a, b = ab["A"], ab["B"]  # [r, in], [out, r]
        r = a.shape[0]
        scale = (alpha / r) if alpha is not None else 1.0
        key = f"{base}.weight"
        if key not in out:
            raise ValueError(f"LoRA target {key} missing from base weights")
        out[key] = np.asarray(out[key]) + scale * (b @ a)
    return out


def params_from_state_dict(cfg, tensors: dict, prefix: str = "model.") -> dict:
    """Build the params pytree from a {name: numpy array} state dict.

    ``tensors`` values must be numpy arrays (call ``.numpy()`` on torch
    tensors first). HF linear weights are [out, in] and get transposed.
    """
    l = cfg.num_layers
    moe = getattr(cfg, "num_experts", 0) > 0
    layer_map = dict(_LAYER_MAP)
    keys = {k for k, _ in _LAYER_MAP.values()}
    if moe:  # Qwen2-MoE: sparse block replaces the dense MLP
        keys -= {"wg", "wu", "wd"}
        layer_map.update(_MOE_LAYER_MAP)
        keys |= {k for k, _ in _MOE_LAYER_MAP.values()}
    if not cfg.attention_bias:  # Llama/Vicuna family: no QKV biases
        keys -= {"bq", "bk", "bv"}
    layer_stacks: dict[str, list] = {k: [None] * l for k in keys}
    expert_stacks: dict[str, list] = {
        k: [[None] * cfg.num_experts for _ in range(l)] for k in _MOE_EXPERT_MAP.values()
    } if moe else {}
    params = {"layers": {}}
    for name, val in tensors.items():
        if name == f"{prefix}embed_tokens.weight":
            params["embed"] = jnp.asarray(val, cfg.dtype)
        elif name == f"{prefix}norm.weight":
            params["norm"] = jnp.asarray(val, cfg.dtype)
        elif name == "lm_head.weight":
            params["lm_head"] = jnp.asarray(np.asarray(val).T, cfg.dtype)
        elif name.startswith(f"{prefix}layers."):
            rest = name[len(f"{prefix}layers.") :]
            idx_str, sub = rest.split(".", 1)
            if moe and sub.startswith("mlp.experts."):
                e_str, esub = sub[len("mlp.experts.") :].split(".", 1)
                if esub in _MOE_EXPERT_MAP:
                    expert_stacks[_MOE_EXPERT_MAP[esub]][int(idx_str)][int(e_str)] = (
                        np.asarray(val).T
                    )
            elif sub in layer_map:
                key, transpose = layer_map[sub]
                if key not in layer_stacks:
                    continue
                arr = np.asarray(val)
                layer_stacks[key][int(idx_str)] = arr.T if transpose else arr
    for key, stack in layer_stacks.items():
        if any(s is None for s in stack):
            missing = [i for i, s in enumerate(stack) if s is None]
            raise ValueError(f"missing layer weights for {key}: layers {missing}")
        params["layers"][key] = jnp.asarray(np.stack(stack), cfg.dtype)
    for key, stack in expert_stacks.items():
        if any(s is None for row in stack for s in row):
            raise ValueError(f"missing expert weights for {key}")
        params["layers"][key] = jnp.asarray(
            np.stack([np.stack(row) for row in stack]), cfg.dtype
        )
    if cfg.tie_word_embeddings:
        params.pop("lm_head", None)
    elif "lm_head" not in params:
        raise ValueError("lm_head.weight not found and embeddings not tied")
    return params


def load_safetensors_dir(cfg, path: str, prefix: str = "model.") -> dict:
    """Load a HF checkpoint directory (one or more .safetensors shards)."""
    from safetensors import safe_open

    index_file = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index_file):
        with open(index_file) as fp:
            weight_map = json.load(fp)["weight_map"]
        shards = sorted(set(weight_map.values()))
    else:
        shards = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    tensors = {}
    for shard in shards:
        with safe_open(os.path.join(path, shard), framework="np") as f:
            for name in f.keys():
                tensors[name] = f.get_tensor(name)
    return params_from_state_dict(cfg, tensors, prefix)
