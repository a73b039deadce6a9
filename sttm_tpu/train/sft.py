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

__all__ = [
    "make_train_step", "init_train_state", "loss_fn", "masked_ce",
    "mm_forward", "mm_loss_fn", "make_mm_train_step", "IterativeSFT",
]

IGNORE_INDEX = -100


def masked_ce(logits, labels):
    """Mean next-token CE over non-ignored labels (labels [B, S], logits
    [B, S, V]; supervise t+1 from position t, HF shift)."""
    tgt = labels[:, 1:]
    lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    mask = tgt != IGNORE_INDEX
    safe_tgt = jnp.where(mask, tgt, 0)
    nll = -jnp.take_along_axis(lp, safe_tgt[..., None], axis=-1)[..., 0]
    total = jnp.sum(nll * mask)
    count = jnp.maximum(jnp.sum(mask), 1)
    return total / count


def loss_fn(params, cfg: DecoderConfig, input_ids, labels,
            remat: bool | str = False, attn_impl: str = "xla"):
    """Mean next-token CE over non-ignored labels.

    input_ids/labels: [B, S] int32; labels already shifted HF-style
    (label[t] supervises logits[t-1]... we shift internally: predict t+1).

    attn_impl="flash_train" runs the forward's attention through the
    splash kernel with its fused backward (no [B, H, S, S] score
    materialization in either direction); "xla" is the reference-exact
    default. Requires S % 128 == 0 on TPU; other shapes fall back to XLA
    inside the dispatcher.
    """
    x = qwen2.embed_tokens(params, input_ids, cfg)
    b, s, _ = x.shape
    pos = jnp.arange(s, dtype=jnp.int32)
    cos, sin = qwen2.rope_cos_sin(cfg, pos)
    x, _, _ = qwen2.prefill_layers(
        params["layers"], 0, cfg.num_layers, x, cos, sin, s, cfg, attn_impl,
        remat=remat
    )
    h = qwen2.rms_norm(x, params["norm"], cfg.rms_eps, cfg.rms_offset)
    logits = qwen2.lm_head(params, cfg, h)  # [B, S, V] fp32
    return masked_ce(logits, labels)


def mm_forward(params, lcfg, input_ids, video_feats, video_start, has_video,
               remat: bool | str = False, tower_cfg=None, pixels=None,
               image_feats=None, image_starts=None, image_mask=None,
               attn_impl: str = "xla"):
    """Multimodal training forward: vision features -> mm_projector ->
    (videos: 2D pool + newline policy) -> splice into the text embeddings at
    the (host-expanded) media spans -> trunk -> logits [B, S, V].

    The differentiable counterpart of ``models.llava.build_multimodal_embeds``
    / ``build_multimodal_embeds_multi`` — the reference runs
    prepare_inputs_labels_for_multimodal inside the training forward
    (llava/model/llava_arch.py:324, multi-sentinel splice loop :533-587) so
    gradients reach the projector; trainability of projector/tower mirrors
    initialize_vision_modules (llava/train/train.py:1641).

    params: {"lm": decoder params, "mm": projector params[, "tower": ...]}
    — the top-level "mm"/"tower" groups are what ``init_train_state``'s
    ``module_lrs`` routes split learning rates to (llava_trainer.py:356).

    input_ids [B, S] (media-span positions hold pad id — see
    ``dataset.mm_collate``), video_feats [B, T, P_vis, C_vis],
    video_start [B] int32, has_video [B] bool. When ``pixels``
    [B, T, H, W, 3] and ``tower_cfg`` are given, features are computed by
    the SigLIP tower in-graph (params["tower"] receives gradients —
    unfreeze_mm_vision_tower); otherwise pre-extracted ``video_feats`` are
    used and only the projector trains.

    Multi-image / interleaved batches: ``image_feats`` [B, MI, P_img, C_vis]
    with ``image_starts``/``image_mask`` [B, MI] (``mm_collate(n_image=
    P_img)``) splices up to MI projected images per sample at their
    placeholder offsets, interleaved with the text and the video span.
    Image chunks take the projector only — the reference's base
    (non-anyres) image path, llava_arch.py:428 encode_images; anyres tile
    training is descoped (inference has it in models/anyres.py). The
    fixed-shape dynamic_update_slice splice (vs the reference's per-sample
    torch.cat loop) is what keeps the training step a single static XLA
    program.
    """
    from ..models.llava import apply_newline_policy, pool_2d, project_features

    cfg = lcfg.decoder
    lm = params["lm"]
    x = qwen2.embed_tokens(lm, input_ids, cfg)

    if pixels is not None:
        from ..models import siglip

        feats = jax.vmap(
            lambda px: siglip.siglip_encode(params["tower"], tower_cfg, px)
        )(pixels)
    else:
        feats = video_feats

    if feats is not None:
        def splice_one(xb, fb, st, hv):
            proj = project_features(params["mm"], fb)
            proj = pool_2d(proj, lcfg.vision_patches_per_side,
                           lcfg.spatial_pool_stride, lcfg.spatial_pool_mode)
            vid = apply_newline_policy(
                proj, lcfg.pooled_side, params["mm"]["image_newline"],
                lcfg.newline_position,
            ).astype(xb.dtype)
            upd = jax.lax.dynamic_update_slice(xb, vid, (st, 0))
            return jnp.where(hv, upd, xb)

        x = jax.vmap(splice_one)(x, feats, video_start, has_video)

    if image_feats is not None and image_feats.shape[1] > 0:
        def splice_images(xb, fb, starts, mask):
            proj = project_features(params["mm"], fb).astype(xb.dtype)

            def one(acc, tup):
                st, m, pj = tup
                upd = jax.lax.dynamic_update_slice(acc, pj, (st, 0))
                return jnp.where(m, upd, acc), None

            out, _ = jax.lax.scan(one, xb, (starts, mask, proj))
            return out

        x = jax.vmap(splice_images)(x, image_feats, image_starts, image_mask)
    b, s, _ = x.shape
    cos, sin = qwen2.rope_cos_sin(cfg, jnp.arange(s, dtype=jnp.int32))
    x, _, _ = qwen2.prefill_layers(
        lm["layers"], 0, cfg.num_layers, x, cos, sin, s, cfg, attn_impl,
        remat=remat
    )
    h = qwen2.rms_norm(x, lm["norm"], cfg.rms_eps, cfg.rms_offset)
    return qwen2.lm_head(lm, cfg, h)


def mm_loss_fn(params, lcfg, batch, remat: bool | str = False, tower_cfg=None,
               attn_impl: str = "xla"):
    """Multimodal CE loss over a ``dataset.mm_collate`` batch dict."""
    logits = mm_forward(
        params, lcfg, batch["input_ids"], batch.get("video_feats"),
        batch["video_start"], batch["has_video"], remat, tower_cfg,
        batch.get("pixels"),
        batch.get("image_feats"), batch.get("image_starts"),
        batch.get("image_mask"),
        attn_impl=attn_impl,
    )
    return masked_ce(logits, batch["labels"])


def make_mm_train_step(lcfg, tx, remat: bool | str = False, tower_cfg=None,
                       attn_impl: str = "xla"):
    """(params, opt_state, batch) -> (params, opt_state, loss) over the
    multimodal forward; params = {"lm", "mm"[, "tower"]}.
    attn_impl as in make_train_step ("flash_train" = splash fwd + fused
    splash bwd on TPU; the dispatcher falls back to XLA per-call for
    non-tiling sequence lengths)."""

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(mm_loss_fn)(
            params, lcfg, batch, remat, tower_cfg, attn_impl
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


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


def make_train_step(cfg: DecoderConfig, tx, remat: bool | str = False,
                    attn_impl: str = "xla"):
    """Returns a jittable (params, opt_state, input_ids, labels) ->
    (params, opt_state, loss) step. Callers jit it with shardings
    (see parallel/sharding.py and __graft_entry__.dryrun_multichip).

    remat: False | True (full per-layer checkpoint) | "dots" (save GEMM
    outputs, recompute only elementwise+attention — models/qwen2.py
    ``_remat_policy``; measured in BENCH_TRAIN.json remat_dots).
    attn_impl: "xla" | "flash_train" (splash fwd + fused splash bwd — see
    loss_fn; measured in BENCH_TRAIN.json attn_flash)."""

    def step(params, opt_state, input_ids, labels):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, cfg, input_ids, labels, remat, attn_impl)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


class IterativeSFT:
    """Step-wise SFT on ad-hoc batches — the vendored TRL
    IterativeSFTTrainer (trl/trainer/iterative_sft_trainer.py:207-300):
    ``step()`` accepts token-id lists OR raw texts, pads to a fixed
    ``max_length`` (stable compile shape), defaults labels to input_ids
    (pad positions ignored), and runs one jitted CE update.

    The reference subclasses HF Trainer to smuggle per-step batches through
    its dataloader machinery; here the trainer IS the step function plus a
    pad-and-call wrapper.
    """

    def __init__(self, cfg: DecoderConfig, params, tokenizer=None,
                 learning_rate: float = 1e-5, max_length: int = 512,
                 pad_id: int = 0):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.pad_id = pad_id
        self.tx, self.opt_state = init_train_state(params, learning_rate)
        self._jstep = jax.jit(make_train_step(cfg, self.tx))
        self.global_step = 0

    def _pad(self, rows, fill):
        import numpy as np

        buf = np.full((len(rows), self.max_length), fill, np.int32)
        for i, r in enumerate(rows):
            r = list(r)[: self.max_length]
            buf[i, : len(r)] = r
        return jnp.asarray(buf)

    def step(self, input_ids=None, labels=None, texts=None):
        """One optimisation step; returns the loss. texts overrides
        input_ids (tokenized with the bound tokenizer); labels default to
        input_ids with pad positions masked."""
        if input_ids is None and texts is None:
            raise ValueError("step needs input_ids or texts")
        if texts is not None:
            if self.tokenizer is None:
                raise ValueError("texts given but no tokenizer bound")
            input_ids = [self.tokenizer.encode(t, add_special_tokens=False)
                         for t in texts]
        if labels is None:
            labels = [[tok for tok in row] for row in input_ids]
        ids = self._pad(input_ids, self.pad_id)
        lab = self._pad(labels, IGNORE_INDEX)
        self.params, self.opt_state, loss = self._jstep(
            self.params, self.opt_state, ids, lab)
        self.global_step += 1
        return float(loss)
