"""DPO step, length-grouped samplers, orbax checkpointing."""

import numpy as np

import jax
import jax.numpy as jnp

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.train.data import (
    length_grouped_indices,
    load_checkpoint,
    modality_length_grouped_indices,
    save_checkpoint,
)
from sttm_tpu.train.dpo import dpo_loss, make_dpo_train_step
from sttm_tpu.train.sft import init_train_state


def test_dpo_step_improves_margin():
    params = qwen2.init_params(TINY, jax.random.key(0))
    ref_params = jax.tree.map(lambda x: x, params)
    rng = np.random.default_rng(0)
    b, s = 2, 24
    batch = {
        "chosen_ids": jnp.asarray(rng.integers(0, TINY.vocab_size, (b, s)), jnp.int32),
        "chosen_labels": jnp.asarray(rng.integers(0, TINY.vocab_size, (b, s)), jnp.int32),
        "rejected_ids": jnp.asarray(rng.integers(0, TINY.vocab_size, (b, s)), jnp.int32),
        "rejected_labels": jnp.asarray(rng.integers(0, TINY.vocab_size, (b, s)), jnp.int32),
    }
    loss0, _ = dpo_loss(params, ref_params, TINY, batch["chosen_ids"],
                        batch["chosen_labels"], batch["rejected_ids"],
                        batch["rejected_labels"])
    assert np.isfinite(float(loss0))
    tx, opt_state = init_train_state(params, learning_rate=1e-3)
    step = jax.jit(make_dpo_train_step(TINY, tx))
    p = params
    for _ in range(3):
        p, opt_state, loss, acc = step(p, ref_params, opt_state, batch)
    assert float(loss) < float(loss0)  # optimizing the DPO objective works


def test_length_grouped_indices():
    lengths = list(np.random.default_rng(0).integers(1, 100, 64))
    idx = length_grouped_indices(lengths, batch_size=4, world_size=2, rng=np.random.default_rng(1))
    assert sorted(idx) == list(range(64))
    # within each megabatch, lengths descend
    mega = 8
    for i in range(0, 64, mega):
        ls = [lengths[j] for j in idx[i : i + mega]]
        assert ls == sorted(ls, reverse=True)


def test_modality_grouped_indices():
    lengths = [10, -5, 20, -8, 30, -2, 15, -9] * 4
    idx = modality_length_grouped_indices(lengths, 2, 2, rng=np.random.default_rng(0))
    assert sorted(idx) == list(range(len(lengths)))


def test_checkpoint_roundtrip(tmp_path):
    params = qwen2.init_params(TINY, jax.random.key(3))
    save_checkpoint(str(tmp_path / "ckpt"), params, step=7)
    template = {"params": jax.tree.map(np.zeros_like, params), "step": 0}
    restored = load_checkpoint(str(tmp_path / "ckpt"), template)
    assert restored["step"] == 7
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["layers"]["wq"]), np.asarray(params["layers"]["wq"])
    )


def test_module_lrs():
    import optax
    import jax.numpy as jnp
    from sttm_tpu.train.sft import init_train_state

    params = {"layers": {"w": jnp.ones((4, 4))}, "mm": {"p": jnp.ones((4,))}}
    tx, state = init_train_state(params, learning_rate=1e-3, module_lrs={"mm": 1e-1})
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    d_default = float(jnp.abs(new["layers"]["w"] - 1).max())
    d_mm = float(jnp.abs(new["mm"]["p"] - 1).max())
    assert d_mm > 10 * d_default  # mm group stepped with the larger LR


def test_iterative_sft_trainer():
    """IterativeSFT: ad-hoc per-step batches, labels default to input_ids,
    texts path tokenizes (trl/trainer/iterative_sft_trainer.py:207-300)."""
    import pytest

    from sttm_tpu.models import qwen2
    from sttm_tpu.models.config import TINY
    from sttm_tpu.train.sft import IterativeSFT

    class ByteTok:
        def encode(self, text, add_special_tokens=False):
            return [ord(c) % 250 for c in text]

    params = qwen2.init_params(TINY, jax.random.key(0))
    tr = IterativeSFT(TINY, params, tokenizer=ByteTok(), learning_rate=5e-3,
                      max_length=32)
    rows = [[5, 6, 7, 8, 9, 10] * 3, [11, 12, 13] * 5]
    losses = [tr.step(input_ids=rows) for _ in range(5)]
    assert losses[-1] < losses[0]
    assert tr.global_step == 5
    # texts path
    l = tr.step(texts=["hello world", "iterate me"])
    assert np.isfinite(l)
    with pytest.raises(ValueError, match="input_ids or texts"):
        tr.step()


def test_remat_modes_equivalent():
    """remat=False / True / "dots" are the same math: identical loss and
    (up to fp tolerance) identical grads — "dots" saves the projection GEMM
    outputs (dots_with_no_batch_dims_saveable) instead of recomputing them
    in the backward (models/qwen2.py:_remat_policy)."""
    from sttm_tpu.train.sft import loss_fn

    params = qwen2.init_params(TINY, jax.random.key(3))
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, TINY.vocab_size, (2, 48)), jnp.int32)

    vals, grads = {}, {}
    for mode in (False, True, "dots"):
        v, g = jax.value_and_grad(loss_fn)(params, TINY, ids, ids, mode)
        vals[mode], grads[mode] = float(v), g
    assert vals[True] == vals[False] == vals["dots"]
    for mode in (True, "dots"):
        diffs = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                      - np.asarray(b, np.float32)).max()),
            grads[False], grads[mode])
        assert max(jax.tree.leaves(diffs)) < 1e-5, (mode, diffs)


def test_flash_train_step_runs_on_cpu():
    """attn_impl="flash_train" end-to-end through the train step on CPU:
    off-TPU the mha dispatcher falls back to the XLA attention (same math,
    differentiable), so the training call site is exercised without Mosaic.
    S=128 is kernel-tileable on purpose — on TPU this exact program takes
    the splash fused-backward path (grad parity: test_kernels.py)."""
    import optax

    from sttm_tpu.train.sft import loss_fn, make_train_step

    params = qwen2.init_params(TINY, jax.random.key(5))
    rng = np.random.default_rng(11)
    ids = jnp.asarray(rng.integers(0, TINY.vocab_size, (2, 128)), jnp.int32)

    v_x, g_x = jax.value_and_grad(loss_fn)(params, TINY, ids, ids, False, "xla")
    v_f, g_f = jax.value_and_grad(loss_fn)(
        params, TINY, ids, ids, False, "flash_train")
    assert float(v_f) == float(v_x)  # CPU fallback IS the xla path
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32)).max()),
        g_x, g_f)
    assert max(jax.tree.leaves(diffs)) == 0.0

    tx = optax.sgd(1e-3)
    step = jax.jit(make_train_step(TINY, tx, remat=True,
                                   attn_impl="flash_train"))
    params2, _, loss = step(params, tx.init(params), ids, ids)
    assert np.isfinite(float(loss))
    assert np.isfinite(
        float(jnp.sum(params2["embed"].astype(jnp.float32) ** 2)))


def test_dpo_remat_and_flash_modes_equivalent():
    """dpo_loss with remat=True and/or attn_impl="flash_train" is the same
    math as the plain form (CPU: flash falls back to XLA, remat only
    changes the backward schedule) — DPO runs four trunk forwards per
    step, so these are the knobs that fit 7B pairs on one chip."""
    from sttm_tpu.train.dpo import dpo_loss

    params = qwen2.init_params(TINY, jax.random.key(0))
    ref = qwen2.init_params(TINY, jax.random.key(1))
    rng = np.random.default_rng(9)
    b, s = 2, 128
    ids = {k: jnp.asarray(rng.integers(0, TINY.vocab_size, (b, s)), jnp.int32)
           for k in ("ci", "cl", "ri", "rl")}

    def lf(remat, attn):
        loss, acc = dpo_loss(params, ref, TINY, ids["ci"], ids["cl"],
                             ids["ri"], ids["rl"], 0.1, remat, attn)
        return float(loss), float(acc)

    base = lf(False, "xla")
    for remat, attn in ((True, "xla"), (False, "flash_train"),
                        (True, "flash_train")):
        got = lf(remat, attn)
        assert got == base, (remat, attn, got, base)
