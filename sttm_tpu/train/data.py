"""Training data utilities: length-grouped sampling + checkpointing.

Length-grouped sampler mirrors the reference LLaVATrainer's
get_length_grouped_indices / modality grouping (llava/train/llava_trainer.py:
196-238): shuffle, slice into megabatches of world_size * batch_size, sort
each megabatch by length descending, shuffle megabatch order. The modality
variant groups multimodal and language-only samples separately first.

Checkpointing uses orbax (the TPU-native replacement for the reference's
HF Trainer / DeepSpeed checkpoint path, llava_trainer.py:435-465).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "length_grouped_indices",
    "modality_length_grouped_indices",
    "save_checkpoint",
    "load_checkpoint",
]


def length_grouped_indices(lengths, batch_size: int, world_size: int, rng=None):
    rng = rng or np.random.default_rng(0)
    n = len(lengths)
    indices = rng.permutation(n)
    mega = batch_size * world_size
    out = []
    for i in range(0, n, mega):
        chunk = indices[i : i + mega]
        chunk = chunk[np.argsort([-lengths[j] for j in chunk], kind="stable")]
        out.append(chunk)
    order = rng.permutation(len(out))
    return np.concatenate([out[i] for i in order]).tolist()


def modality_length_grouped_indices(lengths, batch_size: int, world_size: int, rng=None):
    """lengths: positive = multimodal, negative = language-only (the
    reference's sign convention)."""
    rng = rng or np.random.default_rng(0)
    lengths = np.asarray(lengths)
    mm = np.nonzero(lengths > 0)[0]
    lang = np.nonzero(lengths <= 0)[0]
    if len(mm) == 0 or len(lang) == 0:
        return length_grouped_indices(np.abs(lengths), batch_size, world_size, rng)
    mm_order = [mm[i] for i in length_grouped_indices(lengths[mm], batch_size, world_size, rng)]
    lg_order = [lang[i] for i in length_grouped_indices(-lengths[lang], batch_size, world_size, rng)]
    mega = batch_size * world_size
    batches = [mm_order[i : i + mega] for i in range(0, len(mm_order), mega)] + [
        lg_order[i : i + mega] for i in range(0, len(lg_order), mega)
    ]
    order = rng.permutation(len(batches))
    return [int(i) for b in order for i in batches[b]]


def save_checkpoint(path: str, params, opt_state=None, step: int = 0):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params, "step": step}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(path, payload)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, template):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)
