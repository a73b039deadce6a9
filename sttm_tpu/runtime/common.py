"""Shared runtime types + spec/layer-group helpers.

Split from runtime/generate.py (round-3 refactor): the generate module had
grown to 2,287 lines holding every decode/spec/cascade/paged builder; the
family now lives in runtime/{decode,spec,cascade,paged}.py with this module
holding the shared dataclasses and the reducer-spec plumbing. All public
names remain importable from runtime.generate (backward compatibility).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..models.config import DecoderConfig
from .reducer import ReducerSpec, merged_buffer_len

MAX_DECODE = 64


@dataclasses.dataclass(frozen=True)
class GenerateConfig:
    max_new_tokens: int = 32
    eos_token_ids: tuple = (151645, 151643)  # Qwen2 <|im_end|>, <|endoftext|>
    # None or SamplingParams(temperature=0) = greedy (the reference's eval
    # default, do_sample=False); see runtime/sampling.py for semantics.
    sampling: "object" = None


@dataclasses.dataclass(frozen=True)
class DycokeDecodeOptions:
    """DyCoke stage-2 decode-time KV pruning (dycoke_attn_monkey_patch.py:
    25-100): at decode layer ``layer_idx``, rank cached image tokens by the
    current token's head-mean attention; when the attention distribution
    drifts (cosine < drift_thresh vs the previous step), re-select the top
    (1 - ratio) image tokens; layers above ``layer_idx`` see the new
    selection immediately, layers below on the next step. TPU-native: a
    boolean KV mask instead of cache gathering (static shapes). Requires a
    single layer group (the reference runs stage 1 at layer 0)."""

    layer_idx: int  # dycoke_l
    ratio: float  # dycoke_p
    img_len: int  # post-stage-1 image token count (static)
    drift_thresh: float = 0.9


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DycokeState:
    keep_mask: jnp.ndarray  # [S_cache] bool
    attn_score: jnp.ndarray  # [img_len] fp32
    has_score: jnp.ndarray  # scalar bool


def _normalize_specs(spec) -> tuple:
    if spec is None:
        return ()
    if isinstance(spec, ReducerSpec):
        return (spec,)
    return tuple(sorted(spec, key=lambda s: s.layer_idx))


def _group_bounds(cfg: DecoderConfig, specs: tuple) -> list[tuple[int, int]]:
    """Layer ranges [lo, hi) for each group; len == len(specs) + 1."""
    cuts = [max(0, min(s.layer_idx, cfg.num_layers)) for s in specs]
    edges = [0] + cuts + [cfg.num_layers]
    return [(edges[i], edges[i + 1]) for i in range(len(edges) - 1)]


def _buffer_lens(specs: tuple, s_full: int) -> list[int]:
    lens = [s_full]
    for sp in specs:
        lens.append(merged_buffer_len(sp, lens[-1]))
    return lens

