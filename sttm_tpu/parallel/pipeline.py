"""Pipeline parallelism: stage-sharded layer stack + GPipe microbatching.

The reference's only multi-accelerator inference mechanism is HF
``device_map="auto"`` — decoder layers placed across GPUs and executed
sequentially, one device busy at a time
(llava/eval/eval_vidqa_by_feat_llavavideo.py:104). The TPU-native version
exploits the decoder's stacked [L, ...] weight layout: shard the LAYER axis
over a ``pp`` mesh axis so each device owns a contiguous block of layers,
and move activations stage-to-stage with ``jax.lax.ppermute`` inside
``jax.shard_map``.

Training runs the GPipe schedule: the batch is split into ``n_micro``
microbatches that stream through the stages, so all ``pp`` devices compute
concurrently once the pipe fills (bubble fraction (pp-1)/(n_micro+pp-1)).
The whole schedule is a ``lax.scan``, so ``jax.grad`` differentiates
through it — the backward pass is the reverse-order pipeline XLA derives
from the ppermute transposes; no hand-written 1F1B is needed for
correctness (1F1B would only shrink activation liveness, which
``jax.checkpoint`` over the stage body also addresses).

Composition: pp shards the layer axis (axis 0 of every stacked leaf), which
is orthogonal to tensor parallelism's head/ffn-dim sharding
(parallel/sharding.py) — a (pp, tp) mesh applies both. Embedding / final
norm / lm_head are replicated and run outside the pipelined region.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import qwen2
from ..models.config import DecoderConfig

__all__ = [
    "create_pp_mesh",
    "pp_param_specs",
    "shard_params_pp",
    "pp_forward_fn",
    "make_pp_train_step",
]


def create_pp_mesh(pp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if pp > len(devices):
        raise ValueError(f"pp={pp} needs {pp} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:pp]).reshape(pp), ("pp",))


def pp_param_specs(params: dict) -> dict:
    """Layer stacks sharded on the layer axis over "pp"; everything else
    replicated. (The layer axis is axis 0 of every stacked leaf, so one spec
    covers ln/proj/bias/MoE leaves alike.)"""

    def lspec(v):
        if isinstance(v, dict):  # quantized {"q", "s"}
            return {k: lspec(vv) for k, vv in v.items()}
        return P("pp")

    specs = {k: jax.tree.map(lambda _: P(), v) for k, v in params.items() if k != "layers"}
    specs["layers"] = {k: lspec(v) for k, v in params["layers"].items()}
    return specs


def shard_params_pp(params: dict, mesh: Mesh) -> dict:
    specs = pp_param_specs(params)

    def rec(p, s):
        if isinstance(p, dict):
            return {k: rec(p[k], s[k]) for k in p}
        return jax.device_put(p, NamedSharding(mesh, s))

    return rec(params, specs)


def _pipeline_body(local_layers, mb_embeds, cos, sin, valid_len, cfg, pp, n_micro, remat):
    """Runs per-shard under shard_map. local_layers: this stage's [L/pp, ...]
    slice; mb_embeds: [n_micro, mb, S, D] (replicated — only stage 0 reads
    them). Returns [n_micro, mb, S, D] post-layer activations, replicated."""
    stage = jax.lax.axis_index("pp")
    l_local = jax.tree.leaves(local_layers)[0].shape[0]
    mb, s, d = mb_embeds.shape[1:]

    def run_stage(x):
        y, _, _ = qwen2.prefill_layers(
            local_layers, 0, l_local, x, cos, sin, valid_len, cfg, "xla", remat=remat
        )
        return y

    def step(carry, i):
        state, outputs = carry
        # stage 0 injects microbatch i (clamped — the drain steps feed the
        # last microbatch again; its result is never collected)
        inject = jax.lax.dynamic_index_in_dim(
            mb_embeds, jnp.clip(i, 0, n_micro - 1), 0, keepdims=False
        )
        x = jnp.where(stage == 0, inject, state)
        y = run_stage(x)
        # last stage collects microbatch i - (pp-1) once the pipe is full
        out_i = jnp.clip(i - (pp - 1), 0, n_micro - 1)
        take = (stage == pp - 1) & (i >= pp - 1)
        cur = jax.lax.dynamic_index_in_dim(outputs, out_i, 0, keepdims=False)
        outputs = jax.lax.dynamic_update_index_in_dim(
            outputs, jnp.where(take, y, cur), out_i, 0
        )
        # rotate stage outputs forward; stage 0's inbound value is unused
        state = jax.lax.ppermute(y, "pp", [(j, (j + 1) % pp) for j in range(pp)])
        return (state, outputs), None

    # the carry is device-varying (each stage computes different values);
    # mark the replicated zero inits as varying so the scan types check
    state0 = jax.lax.pcast(jnp.zeros((mb, s, d), mb_embeds.dtype), "pp", to="varying")
    outputs0 = jax.lax.pcast(
        jnp.zeros((n_micro, mb, s, d), mb_embeds.dtype), "pp", to="varying"
    )
    (state, outputs), _ = jax.lax.scan(
        step, (state0, outputs0), jnp.arange(n_micro + pp - 1)
    )
    # replicate the last stage's collected outputs to every device so the
    # (replicated) loss head can run outside the pipelined region
    outputs = jax.lax.psum(jnp.where(stage == pp - 1, outputs, 0.0), "pp")
    return outputs


def pp_forward_fn(cfg: DecoderConfig, mesh: Mesh, n_micro: int, remat: bool = False):
    """Returns ``forward(params, input_ids) -> logits [B, S, V]`` running the
    decoder layers as a GPipe pipeline over the mesh's "pp" axis.
    B must divide into n_micro equal microbatches; num_layers % pp == 0."""
    pp = mesh.shape["pp"]

    def forward(params, input_ids):
        if cfg.num_layers % pp:
            raise ValueError(f"num_layers {cfg.num_layers} not divisible by pp={pp}")
        b, s = input_ids.shape
        if b % n_micro:
            raise ValueError(f"batch {b} not divisible by n_micro={n_micro}")
        x = qwen2.embed_tokens(params, input_ids, cfg)
        mb_embeds = x.reshape(n_micro, b // n_micro, s, -1)
        pos = jnp.arange(s, dtype=jnp.int32)
        cos, sin = qwen2.rope_cos_sin(cfg, pos)

        body = functools.partial(
            _pipeline_body, cfg=cfg, pp=pp, n_micro=n_micro, remat=remat,
            valid_len=s,
        )
        layer_specs = jax.tree.map(lambda _: P("pp"), params["layers"])
        outputs = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(layer_specs, P(), P(), P()),
            out_specs=P(),
        )(params["layers"], mb_embeds, cos, sin)
        x = outputs.reshape(b, s, -1)
        h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
        return qwen2.lm_head(params, cfg, h)

    return forward


def make_pp_train_step(cfg: DecoderConfig, tx, mesh: Mesh, n_micro: int,
                       remat: bool = False):
    """GPipe-pipelined SFT step: same loss as train/sft.py's ``loss_fn`` (the
    microbatch split only reorders the batch axis), differentiated straight
    through the shard_map pipeline."""
    import optax

    from ..train.sft import IGNORE_INDEX

    forward = pp_forward_fn(cfg, mesh, n_micro, remat)

    def loss_fn(params, input_ids, labels):
        logits = forward(params, input_ids)
        tgt = labels[:, 1:]
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        mask = tgt != IGNORE_INDEX
        safe_tgt = jnp.where(mask, tgt, 0)
        nll = -jnp.take_along_axis(lp, safe_tgt[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)

    def step(params, opt_state, input_ids, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, input_ids, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
