"""HF checkpoint loading: sharded safetensors roundtrip."""

import json

import numpy as np

import jax

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.models.weights import load_safetensors_dir


def test_sharded_safetensors_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    params = qwen2.init_params(TINY, jax.random.key(0))
    # write an HF-layout state dict split over two shards + an index
    sd = {}
    l = TINY.num_layers
    name_map = {
        "ln1": ("input_layernorm.weight", False),
        "ln2": ("post_attention_layernorm.weight", False),
        "wq": ("self_attn.q_proj.weight", True),
        "bq": ("self_attn.q_proj.bias", False),
        "wk": ("self_attn.k_proj.weight", True),
        "bk": ("self_attn.k_proj.bias", False),
        "wv": ("self_attn.v_proj.weight", True),
        "bv": ("self_attn.v_proj.bias", False),
        "wo": ("self_attn.o_proj.weight", True),
        "wg": ("mlp.gate_proj.weight", True),
        "wu": ("mlp.up_proj.weight", True),
        "wd": ("mlp.down_proj.weight", True),
    }
    for key, (hf, transpose) in name_map.items():
        for i in range(l):
            arr = np.asarray(params["layers"][key][i], np.float32)
            sd[f"model.layers.{i}.{hf}"] = arr.T.copy() if transpose else arr
    sd["model.embed_tokens.weight"] = np.asarray(params["embed"], np.float32)
    sd["model.norm.weight"] = np.asarray(params["norm"], np.float32)
    sd["lm_head.weight"] = np.asarray(params["lm_head"], np.float32).T.copy()

    names = sorted(sd)
    half = len(names) // 2
    save_file({k: sd[k] for k in names[:half]}, str(tmp_path / "model-00001.safetensors"))
    save_file({k: sd[k] for k in names[half:]}, str(tmp_path / "model-00002.safetensors"))
    index = {"weight_map": {k: ("model-00001.safetensors" if k in names[:half] else "model-00002.safetensors") for k in names}}
    (tmp_path / "model.safetensors.index.json").write_text(json.dumps(index))

    loaded = load_safetensors_dir(TINY, str(tmp_path))
    for key in params["layers"]:
        np.testing.assert_allclose(
            np.asarray(loaded["layers"][key], np.float32),
            np.asarray(params["layers"][key], np.float32), rtol=1e-6,
        )
    np.testing.assert_allclose(
        np.asarray(loaded["lm_head"], np.float32), np.asarray(params["lm_head"], np.float32)
    )
