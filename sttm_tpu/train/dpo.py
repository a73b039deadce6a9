"""DPO training step (capability parity with the reference's vendored
TRL 0.7.11 DPO trainer + llava/train/train_dpo.py; unused by STTM runs).

Standard sigmoid DPO: loss = -logsigmoid(beta * ((pi_c - pi_r) -
(ref_c - ref_r))) over per-sequence summed token logprobs with -100 label
masking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..models import qwen2
from ..models.config import DecoderConfig
from .sft import IGNORE_INDEX, mm_forward

__all__ = [
    "sequence_logprobs", "dpo_loss", "make_dpo_train_step",
    "mm_sequence_logprobs", "mm_dpo_loss", "make_mm_dpo_train_step",
]


def sequence_logprobs(params, cfg: DecoderConfig, input_ids, labels,
                      remat: bool | str = False, attn_impl: str = "xla"):
    """Summed next-token logprobs per sequence. input_ids/labels: [B, S].

    remat / attn_impl as in sft.loss_fn — DPO runs FOUR trunk forwards per
    step (policy + reference x chosen/rejected), so per-layer remat and the
    fused-backward splash attention matter even more here than for SFT
    (only the two policy forwards carry gradients; the reference passes are
    stop-gradient and pay no backward either way)."""
    x = qwen2.embed_tokens(params, input_ids, cfg)
    b, s, _ = x.shape
    cos, sin = qwen2.rope_cos_sin(cfg, jnp.arange(s, dtype=jnp.int32))
    x, _, _ = qwen2.prefill_layers(params["layers"], 0, cfg.num_layers, x,
                                   cos, sin, s, cfg, attn_impl, remat=remat)
    h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
    logits = qwen2.lm_head(params, cfg, h)
    tgt = labels[:, 1:]
    lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    mask = tgt != IGNORE_INDEX
    tok_lp = jnp.take_along_axis(lp, jnp.where(mask, tgt, 0)[..., None], axis=-1)[..., 0]
    return jnp.sum(tok_lp * mask, axis=-1)


def dpo_loss(params, ref_params, cfg, chosen_ids, chosen_labels, rejected_ids,
             rejected_labels, beta: float = 0.1,
             remat: bool | str = False, attn_impl: str = "xla"):
    pc = sequence_logprobs(params, cfg, chosen_ids, chosen_labels, remat,
                           attn_impl)
    pr = sequence_logprobs(params, cfg, rejected_ids, rejected_labels, remat,
                           attn_impl)
    rc = jax.lax.stop_gradient(sequence_logprobs(
        ref_params, cfg, chosen_ids, chosen_labels, remat, attn_impl))
    rr = jax.lax.stop_gradient(sequence_logprobs(
        ref_params, cfg, rejected_ids, rejected_labels, remat, attn_impl))
    logits = (pc - pr) - (rc - rr)
    loss = -jax.nn.log_sigmoid(beta * logits).mean()
    reward_acc = (logits > 0).mean()
    return loss, reward_acc


def _summed_token_logprobs(logits, labels):
    tgt = labels[:, 1:]
    lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    mask = tgt != IGNORE_INDEX
    tok_lp = jnp.take_along_axis(lp, jnp.where(mask, tgt, 0)[..., None], axis=-1)[..., 0]
    return jnp.sum(tok_lp * mask, axis=-1)


def mm_sequence_logprobs(params, lcfg, input_ids, labels, video_feats,
                         video_start, has_video,
                         remat: bool | str = False, attn_impl: str = "xla"):
    """Summed per-sequence logprobs through the multimodal training forward
    (video features spliced in-graph; gradients reach the projector). The
    reference's DPO trainer computes the same over multimodal batches
    (llava/train/train_dpo.py)."""
    logits = mm_forward(params, lcfg, input_ids, video_feats, video_start,
                        has_video, remat, attn_impl=attn_impl)
    return _summed_token_logprobs(logits, labels)


def mm_dpo_loss(params, ref_params, lcfg, batch, beta: float = 0.1,
                remat: bool | str = False, attn_impl: str = "xla"):
    """Sigmoid DPO over a multimodal batch: chosen/rejected responses share
    the sample's video (train_dpo.py pairs both over one clip). batch keys:
    chosen_ids/chosen_labels/rejected_ids/rejected_labels [B, S],
    video_feats [B, T, P, C], video_start [B], has_video [B]."""
    vf, vs, hv = batch["video_feats"], batch["video_start"], batch["has_video"]
    pc = mm_sequence_logprobs(params, lcfg, batch["chosen_ids"],
                              batch["chosen_labels"], vf, vs, hv, remat,
                              attn_impl)
    pr = mm_sequence_logprobs(params, lcfg, batch["rejected_ids"],
                              batch["rejected_labels"], vf, vs, hv, remat,
                              attn_impl)
    rc = jax.lax.stop_gradient(
        mm_sequence_logprobs(ref_params, lcfg, batch["chosen_ids"],
                             batch["chosen_labels"], vf, vs, hv, remat,
                             attn_impl))
    rr = jax.lax.stop_gradient(
        mm_sequence_logprobs(ref_params, lcfg, batch["rejected_ids"],
                             batch["rejected_labels"], vf, vs, hv, remat,
                             attn_impl))
    logits = (pc - pr) - (rc - rr)
    loss = -jax.nn.log_sigmoid(beta * logits).mean()
    reward_acc = (logits > 0).mean()
    return loss, reward_acc


def make_mm_dpo_train_step(lcfg, tx, beta: float = 0.1,
                           remat: bool | str = False,
                           attn_impl: str = "xla"):
    """(params, ref_params, opt_state, batch) -> (params, opt_state, loss,
    acc); params = {"lm", "mm"} as in sft.mm_forward."""

    def step(params, ref_params, opt_state, batch):
        def lf(p):
            return mm_dpo_loss(p, ref_params, lcfg, batch, beta, remat,
                               attn_impl)

        (loss, acc), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    return step


def make_dpo_train_step(cfg: DecoderConfig, tx, beta: float = 0.1,
                        remat: bool | str = False, attn_impl: str = "xla"):
    def step(params, ref_params, opt_state, batch):
        def lf(p):
            return dpo_loss(
                p, ref_params, cfg, batch["chosen_ids"], batch["chosen_labels"],
                batch["rejected_ids"], batch["rejected_labels"], beta,
                remat, attn_impl,
            )

        (loss, acc), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    return step
