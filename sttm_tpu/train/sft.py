"""SFT training step (capability parity with the reference training stack,
llava/train/train.py — which STTM itself never runs; SURVEY.md §2.6).

A sharded next-token cross-entropy step over the Qwen2 decoder: dp-sharded
batches, tp-sharded params, optax adamw. The full-sequence forward reuses
``prefill_layers`` with per-sample valid lengths; labels of -100 are masked
(HF convention the reference's preprocessing emits).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..models import qwen2
from ..models.config import DecoderConfig

__all__ = ["make_train_step", "init_train_state", "loss_fn"]

IGNORE_INDEX = -100


def loss_fn(params, cfg: DecoderConfig, input_ids, labels, remat: bool = False):
    """Mean next-token CE over non-ignored labels.

    input_ids/labels: [B, S] int32; labels already shifted HF-style
    (label[t] supervises logits[t-1]... we shift internally: predict t+1).
    """
    x = qwen2.embed_tokens(params, input_ids, cfg)
    b, s, _ = x.shape
    pos = jnp.arange(s, dtype=jnp.int32)
    cos, sin = qwen2.rope_cos_sin(cfg, pos)
    x, _, _ = qwen2.prefill_layers(
        params["layers"], 0, cfg.num_layers, x, cos, sin, s, cfg, "xla", remat=remat
    )
    h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
    logits = qwen2.lm_head(params, cfg, h)  # [B, S, V] fp32
    tgt = labels[:, 1:]
    lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    mask = tgt != IGNORE_INDEX
    safe_tgt = jnp.where(mask, tgt, 0)
    nll = -jnp.take_along_axis(lp, safe_tgt[..., None], axis=-1)[..., 0]
    total = jnp.sum(nll * mask)
    count = jnp.maximum(jnp.sum(mask), 1)
    return total / count


def init_train_state(params, learning_rate: float = 1e-5, weight_decay: float = 0.0,
                     module_lrs: dict | None = None):
    """adamw; ``module_lrs`` maps top-level param groups to their own LR (the
    reference trainer's split projector / vision-tower LRs,
    llava/train/llava_trainer.py:356), e.g. {"mm": 2e-5}."""
    if not module_lrs:
        tx = optax.adamw(learning_rate, weight_decay=weight_decay)
        return tx, tx.init(params)

    def label(p):
        return {k: jax.tree.map(lambda _: k if k in module_lrs else "default", v)
                for k, v in p.items()}

    transforms = {"default": optax.adamw(learning_rate, weight_decay=weight_decay)}
    for name, lr in module_lrs.items():
        transforms[name] = optax.adamw(lr, weight_decay=weight_decay)
    tx = optax.multi_transform(transforms, label)
    return tx, tx.init(params)


def make_train_step(cfg: DecoderConfig, tx, remat: bool = False):
    """Returns a jittable (params, opt_state, input_ids, labels) ->
    (params, opt_state, loss) step. Callers jit it with shardings
    (see parallel/sharding.py and __graft_entry__.dryrun_multichip)."""

    def step(params, opt_state, input_ids, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, cfg, input_ids, labels, remat)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
