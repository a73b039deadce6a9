"""Device mesh + parameter sharding (TPU-native scaling layer).

Replaces the reference's multi-GPU story (HF ``device_map="auto"`` layer
placement for the 72B, eval_vidqa_by_feat_llavavideo.py:104) with proper
SPMD: a (dp, tp) ``jax.sharding.Mesh`` over ICI, Megatron-style tensor
partitioning of the stacked-layer params, and XLA-inserted collectives.

Layer weights are stacked [L, ...], so one PartitionSpec shards every layer
at once:
  wq/wk/wv [L, D, heads*hd]  -> shard out dim on tp (column parallel)
  wo       [L, heads*hd, D]  -> shard in dim on tp (row parallel)
  wg/wu    [L, D, F]         -> shard F on tp
  wd       [L, F, D]         -> shard F on tp
  embed [V, D], lm_head [D, V] -> shard vocab on tp
Activations are batch-sharded on dp.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "param_specs", "shard_params", "batch_spec"]


def create_mesh(dp: int = 1, tp: int = 1, ep: int = 1, devices=None) -> Mesh:
    """(dp, tp[, ep]) device mesh. The ``ep`` axis appears only when > 1
    (expert parallelism for the MoE trunk); existing dp x tp call sites keep
    their two-axis mesh."""
    devices = devices if devices is not None else jax.devices()
    n = dp * tp * ep
    if n > len(devices):
        raise ValueError(f"mesh {dp}x{tp}x{ep} needs {n} devices, have {len(devices)}")
    if ep > 1:
        arr = np.asarray(devices[:n]).reshape(dp, tp, ep)
        return Mesh(arr, ("dp", "tp", "ep"))
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def param_specs(params: dict, ep: bool = False) -> dict:
    """PartitionSpec pytree matching the qwen2 params layout.

    ``ep=True`` shards the MoE expert axis over the mesh's "ep" axis: every
    device computes its local experts at full density and the combine
    einsum's expert-sum becomes one psum (dense-masked expert parallelism,
    models/moe.py). Router / shared-expert weights stay replicated or
    tp-sharded like the dense MLP.
    """
    e_ax = "ep" if ep else None
    layer_specs = {
        "ln1": P(None, None),
        "ln2": P(None, None),
        "wq": P(None, None, "tp"),
        "bq": P(None, "tp"),
        "wk": P(None, None, "tp"),
        "bk": P(None, "tp"),
        "wv": P(None, None, "tp"),
        "bv": P(None, "tp"),
        "wo": P(None, "tp", None),
        "wg": P(None, None, "tp"),
        "wu": P(None, None, "tp"),
        "wd": P(None, "tp", None),
        # MoE (Qwen2-MoE family): experts on ep, shared expert on tp
        "router": P(None, None, None),
        "we_g": P(None, e_ax, None, None),
        "we_u": P(None, e_ax, None, None),
        "we_d": P(None, e_ax, None, None),
        "ws_g": P(None, None, "tp"),
        "ws_u": P(None, None, "tp"),
        "ws_d": P(None, "tp", None),
        "wsg": P(None, None, None),
    }
    def lspec(k, v):
        base = layer_specs[k]
        if isinstance(v, dict):  # int8-quantized {"q", "s"}: same partitioning
            return {"q": base, "s": base}
        return base

    specs = {
        "embed": P("tp", None),
        "norm": P(None),
        "layers": {k: lspec(k, v) for k, v in params["layers"].items()},
    }
    if "lm_head" in params:
        specs["lm_head"] = P(None, "tp")
    # extra param groups (projector etc.) default to replicated
    for k in params:
        if k not in specs:
            specs[k] = jax.tree.map(lambda _: P(), params[k])
    return specs


def shard_params(params: dict, mesh: Mesh) -> dict:
    specs = param_specs(params, ep="ep" in mesh.axis_names)

    def rec(p, s):
        if isinstance(p, dict):
            return {k: rec(p[k], s[k]) for k in p}
        return jax.device_put(p, NamedSharding(mesh, s))

    return rec(params, specs)


def batch_spec() -> P:
    return P("dp")
