"""Multimodal training forward: gradients through the projector splice.

The reference trains the *multimodal* model — prepare_inputs_labels_for_
multimodal runs inside the training forward (llava/model/llava_arch.py:324)
and initialize_vision_modules (llava/train/train.py:1641) makes the
projector (and optionally the tower) trainable with split LRs
(llava/train/llava_trainer.py:356). These tests assert the TPU rebuild's
equivalents: mm_collate expansion, nonzero projector grads, a decreasing
loss, split-LR routing, and the multimodal DPO step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.models.llava import IMAGE_TOKEN_INDEX, LlavaConfig, init_multimodal_params
from sttm_tpu.train.dataset import IGNORE_INDEX, mm_collate
from sttm_tpu.train.dpo import make_mm_dpo_train_step
from sttm_tpu.train.sft import (
    init_train_state,
    make_mm_train_step,
    mm_forward,
    mm_loss_fn,
)

LCFG = LlavaConfig(
    decoder=TINY,
    vision_hidden_size=24,
    vision_patches_per_side=4,
    spatial_pool_stride=2,
    newline_position="no_token",
    projector_type="mlp2x_gelu",
)
T_FRAMES = 2
N_VIDEO = T_FRAMES * LCFG.tokens_per_frame()  # 2 * 4 = 8


def _mm_params(seed=0):
    k1, k2 = jax.random.split(jax.random.key(seed))
    return {
        "lm": qwen2.init_params(TINY, k1),
        "mm": init_multimodal_params(LCFG, k2),
    }


def _batch(seed=0, b=2, s=32, text_only_row=None):
    rng = np.random.default_rng(seed)
    samples = []
    for i in range(b):
        ids = rng.integers(1, 200, size=12).tolist()
        labels = [IGNORE_INDEX] * 6 + ids[6:]
        if text_only_row is None or i != text_only_row:
            ids = ids[:3] + [IMAGE_TOKEN_INDEX] + ids[3:]
            labels = labels[:3] + [IGNORE_INDEX] + labels[3:]
        samples.append({"input_ids": ids, "labels": labels})
    batch = mm_collate(samples, s, N_VIDEO)
    p_vis = LCFG.vision_patches_per_side ** 2
    batch["video_feats"] = jnp.asarray(
        rng.normal(size=(b, T_FRAMES, p_vis, LCFG.vision_hidden_size)), jnp.float32
    )
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_mm_collate_expands_video_span():
    ids = [5, 6, IMAGE_TOKEN_INDEX, 7, 8]
    labels = [IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 7, 8]
    out = mm_collate([{"input_ids": ids, "labels": labels}], 20, N_VIDEO, pad_id=0)
    assert out["video_start"][0] == 2 and out["has_video"][0]
    row, lab = out["input_ids"][0], out["labels"][0]
    # video slots hold pad/IGNORE; text resumes after the span
    assert (row[2 : 2 + N_VIDEO] == 0).all()
    assert (lab[2 : 2 + N_VIDEO] == IGNORE_INDEX).all()
    assert row[2 + N_VIDEO] == 7 and row[3 + N_VIDEO] == 8
    assert lab[2 + N_VIDEO] == 7 and lab[3 + N_VIDEO] == 8
    # text-only sample: no expansion, has_video False
    out2 = mm_collate([{"input_ids": [5, 6, 7], "labels": [5, 6, 7]}], 20, N_VIDEO)
    assert not out2["has_video"][0] and out2["input_ids"][0][2] == 7


def test_mm_collate_rejects_overflow_and_bad_modalities():
    ids = [5, IMAGE_TOKEN_INDEX]
    with pytest.raises(ValueError, match="exceeds pad_to"):
        mm_collate([{"input_ids": ids, "labels": ids}], N_VIDEO, N_VIDEO)
    # two video placeholders in one sample: at most one clip per sample
    ids2 = [IMAGE_TOKEN_INDEX, 5, IMAGE_TOKEN_INDEX]
    with pytest.raises(ValueError, match="video placeholders"):
        mm_collate([{"input_ids": ids2, "labels": ids2,
                     "modalities": ["video", "video"]}], 64, N_VIDEO)
    # image placeholders without a per-image token count
    with pytest.raises(ValueError, match="n_image"):
        mm_collate([{"input_ids": ids2, "labels": ids2,
                     "modalities": ["image", "image"]}], 64, N_VIDEO)


N_IMAGE = 4  # tokens per image span in the multi-image tests


def test_mm_collate_multi_image_interleaved():
    """Every sentinel expands in placeholder order, interleaved with text —
    the reference's multi-image splice loop (llava_arch.py:533-587)."""
    ids = [7, IMAGE_TOKEN_INDEX, 8, 9, IMAGE_TOKEN_INDEX, 10]
    labs = [IGNORE_INDEX, IGNORE_INDEX, 8, 9, IGNORE_INDEX, 10]
    out = mm_collate(
        [{"input_ids": ids, "labels": labs, "modalities": ["image", "image"]}],
        40, N_VIDEO, n_image=N_IMAGE)
    st = out["image_starts"][0]
    assert out["image_mask"][0].all() and not out["has_video"][0]
    assert st[0] == 1 and st[1] == 1 + N_IMAGE + 2  # text 8,9 between spans
    row, lab = out["input_ids"][0], out["labels"][0]
    assert row[0] == 7
    assert (row[st[0]: st[0] + N_IMAGE] == 0).all()
    assert row[st[0] + N_IMAGE] == 8 and row[st[0] + N_IMAGE + 1] == 9
    assert (lab[st[1]: st[1] + N_IMAGE] == IGNORE_INDEX).all()
    assert row[st[1] + N_IMAGE] == 10 and lab[st[1] + N_IMAGE] == 10

    # mixed video + image in ONE sample, in placeholder order
    ids3 = [IMAGE_TOKEN_INDEX, 5, IMAGE_TOKEN_INDEX, 6]
    out3 = mm_collate(
        [{"input_ids": ids3, "labels": ids3, "modalities": ["image", "video"]}],
        40, N_VIDEO, n_image=N_IMAGE)
    assert out3["image_starts"][0][0] == 0
    assert out3["video_start"][0] == N_IMAGE + 1 and out3["has_video"][0]
    assert out3["input_ids"][0][N_IMAGE] == 5
    assert out3["input_ids"][0][N_IMAGE + 1 + N_VIDEO] == 6


def _mixed_batch(seed=0, s=48):
    """The directive's target batch: {2-image sample, video sample,
    text-only sample} in one mm_collate call."""
    rng = np.random.default_rng(seed)
    two_img = {
        "input_ids": [7, IMAGE_TOKEN_INDEX, 8, IMAGE_TOKEN_INDEX, 9, 11, 12],
        "labels": [IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX,
                   9, 11, 12],
        "modalities": ["image", "image"],
    }
    vid_ids = rng.integers(1, 200, size=10).tolist()
    video = {
        "input_ids": vid_ids[:3] + [IMAGE_TOKEN_INDEX] + vid_ids[3:],
        "labels": [IGNORE_INDEX] * 4 + vid_ids[3:],
        "modalities": ["video"],
    }
    text = {"input_ids": [21, 22, 23, 24], "labels": [21, 22, 23, 24],
            "modalities": []}
    batch = mm_collate([two_img, video, text], s, N_VIDEO, n_image=N_IMAGE)
    p_vis = LCFG.vision_patches_per_side ** 2
    batch["video_feats"] = jnp.asarray(
        rng.normal(size=(3, T_FRAMES, p_vis, LCFG.vision_hidden_size)),
        jnp.float32)
    # image features: P_img patches per image; projector preserves count so
    # n_image must equal P_img = N_IMAGE
    batch["image_feats"] = jnp.asarray(
        rng.normal(size=(3, batch["image_mask"].shape[1], N_IMAGE,
                         LCFG.vision_hidden_size)), jnp.float32)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_mm_train_mixed_image_video_text_batch():
    """Train on a batch mixing {2-image, video, text-only} samples: finite
    decreasing loss, nonzero projector grads, image features affect logits
    (the round-4 directive's done-criterion)."""
    params = _mm_params()
    batch = _mixed_batch()
    grads = jax.grad(mm_loss_fn)(params, LCFG, batch)
    for k in ("proj_w1", "proj_b1", "proj_w2", "proj_b2"):
        assert float(jnp.linalg.norm(grads["mm"][k])) > 0, k
    # image features reach the logits (zeroing them changes the output)
    logits = mm_forward(params, LCFG, batch["input_ids"], batch["video_feats"],
                        batch["video_start"], batch["has_video"],
                        image_feats=batch["image_feats"],
                        image_starts=batch["image_starts"],
                        image_mask=batch["image_mask"])
    logits_zero = mm_forward(params, LCFG, batch["input_ids"],
                             batch["video_feats"], batch["video_start"],
                             batch["has_video"],
                             image_feats=jnp.zeros_like(batch["image_feats"]),
                             image_starts=batch["image_starts"],
                             image_mask=batch["image_mask"])
    assert not np.allclose(np.asarray(logits), np.asarray(logits_zero))
    # and only at/after the image rows' spans: the text-only row is identical
    assert np.allclose(np.asarray(logits)[2], np.asarray(logits_zero)[2])
    tx, opt_state = init_train_state(params, 5e-3, module_lrs={"mm": 2e-2})
    step = jax.jit(make_mm_train_step(LCFG, tx))
    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses[-1]) and losses[-1] < losses[0] * 0.95, losses


def test_projector_grads_nonzero_and_splice_matters():
    params = _mm_params()
    batch = _batch()
    grads = jax.grad(mm_loss_fn)(params, LCFG, batch)
    gnorm = {k: float(jnp.linalg.norm(v)) for k, v in grads["mm"].items()}
    for k in ("proj_w1", "proj_b1", "proj_w2", "proj_b2"):
        assert gnorm[k] > 0, f"projector grad {k} is zero"
    # trunk grads flow too
    assert float(jnp.linalg.norm(grads["lm"]["norm"])) > 0
    # the spliced features actually change the logits at the video span
    logits = mm_forward(params, LCFG, batch["input_ids"], batch["video_feats"],
                        batch["video_start"], batch["has_video"])
    logits_zero = mm_forward(params, LCFG, batch["input_ids"],
                             jnp.zeros_like(batch["video_feats"]),
                             batch["video_start"], batch["has_video"])
    assert not np.allclose(np.asarray(logits), np.asarray(logits_zero))


def test_mm_sft_loss_decreases_with_split_lrs():
    params = _mm_params()
    batch = _batch()
    tx, opt_state = init_train_state(params, 5e-3, module_lrs={"mm": 2e-2})
    step = jax.jit(make_mm_train_step(LCFG, tx), static_argnames=())
    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses
    # the projector moved (split LR actually routed to the "mm" group)
    fresh = _mm_params()
    assert not np.allclose(np.asarray(params["mm"]["proj_w1"]),
                           np.asarray(fresh["mm"]["proj_w1"]))


def test_text_only_sample_in_mixed_batch():
    params = _mm_params()
    batch = _batch(text_only_row=1)
    assert bool(batch["has_video"][0]) and not bool(batch["has_video"][1])
    loss = mm_loss_fn(params, LCFG, batch)
    assert np.isfinite(float(loss))
    grads = jax.grad(mm_loss_fn)(params, LCFG, batch)
    assert float(jnp.linalg.norm(grads["mm"]["proj_w1"])) > 0


def test_run_sft_multimodal_smoke(tmp_path):
    import json
    import os

    from sttm_tpu.train.run_sft import main as sft_main

    data = [
        {"conversations": [
            {"from": "human", "value": f"<image>\nquestion {i}?"},
            {"from": "gpt", "value": f"answer {i}."}],
         "video": f"v{i}"}
        for i in range(4)
    ]
    # one text-only sample in the mix
    data.append({"conversations": [
        {"from": "human", "value": "plain question?"},
        {"from": "gpt", "value": "plain answer."}]})
    p = tmp_path / "anns.json"
    p.write_text(json.dumps(data))
    out = tmp_path / "run"
    loss = sft_main([
        "--data_path", str(p), "--output_dir", str(out), "--smoke",
        "--multimodal", "--frames", "2", "--steps", "2", "--batch_size", "2",
        "--seq_len", "96", "--save_every", "2", "--log_every", "1",
        "--mm_projector_lr", "2e-3",
    ])
    assert np.isfinite(loss) and loss > 0.1
    assert os.path.isdir(out / "checkpoint_2")


def test_run_dpo_multimodal_smoke(tmp_path):
    import json
    import os

    from sttm_tpu.train.run_dpo import main as dpo_main

    data = [
        {"prompt": [{"from": "human", "value": f"<image>\nq{i}?"}],
         "chosen": f"good answer {i}.", "rejected": f"bad {i}.",
         "video": f"v{i}"}
        for i in range(4)
    ]
    p = tmp_path / "pairs.json"
    p.write_text(json.dumps(data))
    out = tmp_path / "run"
    loss = dpo_main([
        "--data_path", str(p), "--output_dir", str(out), "--smoke",
        "--multimodal", "--frames", "2", "--steps", "2", "--batch_size", "2",
        "--seq_len", "96", "--save_every", "2", "--log_every", "1",
    ])
    assert np.isfinite(loss) and loss > 0
    assert os.path.isdir(out / "checkpoint_2")


def test_mm_dpo_step_runs_and_improves_margin():
    params = _mm_params()
    ref_params = _mm_params()
    rng = np.random.default_rng(1)
    b, s = 2, 32
    base = _batch(b=b, s=s)
    chosen = np.asarray(base["input_ids"])
    rejected = chosen.copy()
    rejected[:, -4:] = rng.integers(1, 200, size=(b, 4))
    lab_c = np.asarray(base["labels"])
    lab_r = lab_c.copy()
    lab_r[:, -4:] = rejected[:, -4:]
    batch = {
        "chosen_ids": jnp.asarray(chosen), "chosen_labels": jnp.asarray(lab_c),
        "rejected_ids": jnp.asarray(rejected), "rejected_labels": jnp.asarray(lab_r),
        "video_feats": base["video_feats"],
        "video_start": base["video_start"], "has_video": base["has_video"],
    }
    tx, opt_state = init_train_state(params, 5e-3)
    step = jax.jit(make_mm_dpo_train_step(LCFG, tx))
    first = None
    for _ in range(5):
        params, opt_state, loss, acc = step(params, ref_params, opt_state, batch)
        if first is None:
            first = float(loss)
    assert np.isfinite(float(loss)) and float(loss) < first
