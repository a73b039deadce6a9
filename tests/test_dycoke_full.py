"""DyCoke full (stage-1 prefill TTM + stage-2 decode KV pruning)."""

import numpy as np

import jax
import jax.numpy as jnp

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.ops.dycoke import dycoke_output_len
from sttm_tpu.runtime.generate import (
    DycokeDecodeOptions,
    GenerateConfig,
    generate,
)
from sttm_tpu.runtime.reducer import ReducerSpec


def test_dycoke_full_decode_pruning():
    params = qwen2.init_params(TINY, jax.random.key(0))
    rng = np.random.default_rng(0)
    t, h, w = 8, 4, 4
    nv = t * h * w
    sys_len, inst_len = 5, 9
    valid = sys_len + nv + inst_len
    s_full = 192
    emb = np.zeros((1, s_full, TINY.hidden_size), np.float32)
    emb[0, :valid] = rng.normal(size=(valid, TINY.hidden_size)) * 0.2

    # stage 1 at layer 0 (the reference's dycoke cfg), stage 2 at layer 2
    spec = ReducerSpec(kind="dycoke", layer_idx=0, t=t, h=h, w=w, prune_ratio=0.7)
    img_len = dycoke_output_len(t, h * w, 0.7)
    dyc = DycokeDecodeOptions(layer_idx=2, ratio=0.8, img_len=img_len)

    ids, rt = generate(
        params, TINY, jnp.asarray(emb), valid, sys_len, spec,
        GenerateConfig(max_new_tokens=5, eos_token_ids=()), dycoke=dyc,
    )
    assert len(ids) == 5
    assert rt["merged_len"] == valid - nv + img_len

    # pruning changes decode outputs vs plain decode on the same cache
    ids_plain, _ = generate(
        params, TINY, jnp.asarray(emb), valid, sys_len, spec,
        GenerateConfig(max_new_tokens=5, eos_token_ids=()),
    )
    assert ids[0] == ids_plain[0]  # prefill identical (stage 2 is decode-only)
    assert ids != ids_plain  # decode diverges once KV is pruned
