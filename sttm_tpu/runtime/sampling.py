"""On-device token sampling: temperature / top-k / top-p (nucleus).

The reference evaluates with HF ``model.generate(do_sample=False)`` (e.g.
llava/eval/eval_vidqa_by_feat_llavavideo.py:166-167) but the HF generation
surface it rides exposes sampling; a serving framework needs it. TPU-native
design:

- One jitted sampler per (top_k, use_top_p) *shape* key (lru-cached builder,
  CLAUDE.md: inner jits must be module-level + cached). ``temperature`` and
  ``top_p`` are traced scalars — changing them does NOT recompile; changing
  ``top_k`` does (it is a gather width).
- top-p uses a full-vocab descending sort; at V=152k that is a few hundred
  microseconds on one v5e — negligible against a 7B decode step (~13 ms) and
  exact, so no truncated-candidate approximation.
- HF semantics: top-p keeps the smallest prefix of the descending
  distribution whose mass reaches ``top_p`` (exclusive-cumsum < p), always
  keeping the argmax; top-k keeps the k highest logits. Logit ties AT the
  cut survive together here (mask by threshold value, not sorted position) —
  a superset of HF's positional cut only on exact ties.
- Greedy is ``temperature == 0.0`` (the default everywhere, preserving the
  framework's token-exactness guarantees). Composition with the decode
  machinery: the *batched* chunked loop (runtime/decode.py
  ``_chunked_greedy_loop(sample=...)``, used by the flat / cascade / paged
  paths) samples ON DEVICE via ``sample_body`` with a per-global-step
  ``fold_in`` key — chunk-size invariant (tests/test_sampling.py). The
  *single-stream* ``generate`` path falls back to its per-step loop when
  sampling is on (generate.py:252), and speculative decode remains
  greedy-only (draft verification is defined against argmax).

Determinism: callers derive the step key via ``jax.random.fold_in(base,
step)`` from a seed, so a (seed, prompt) pair replays exactly —
the reference's --reproduce contract extended to sampling.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

__all__ = [
    "SamplingParams", "sample_fn", "sample_body", "select_token", "make_key",
    "static_sample_key", "sample_args_of",
]


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Sampling knobs, HF-compatible meanings. temperature == 0 -> greedy."""

    temperature: float = 0.0
    top_k: int = 0  # 0 = disabled
    top_p: float = 1.0  # 1.0 = disabled
    seed: int = 0

    @property
    def greedy(self) -> bool:
        return self.temperature <= 0.0


def sample_body(top_k: int, use_top_p: bool):
    """Traceable (logits [B, V], key, temperature, top_p) -> token [B] int32
    — the sampler body for composition INSIDE other jitted programs (the
    batched chunked-decode scan); sample_fn is its jitted standalone form."""

    def fn(logits, key, temperature, top_p):
        lg = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
        if top_k > 0:
            kth = jax.lax.top_k(lg, top_k)[0][..., -1:]
            lg = jnp.where(lg < kth, -jnp.inf, lg)
        if use_top_p:
            srt = jnp.sort(lg, axis=-1)[..., ::-1]  # descending
            probs = jax.nn.softmax(srt, axis=-1)
            excl = jnp.cumsum(probs, axis=-1) - probs
            keep = excl < top_p  # position 0 always kept
            thr = jnp.min(
                jnp.where(keep, srt, jnp.inf), axis=-1, keepdims=True
            )
            lg = jnp.where(lg < thr, -jnp.inf, lg)
        return jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)

    return fn


@functools.lru_cache(maxsize=8)
def sample_fn(top_k: int, use_top_p: bool):
    """Jitted (logits [B, V], key, temperature, top_p) -> token [B] int32."""
    return jax.jit(sample_body(top_k, use_top_p))


def make_key(seed: int):
    return jax.random.key(seed)


def static_sample_key(sp: SamplingParams | None) -> tuple | None:
    """The (top_k, use_top_p) STATIC part of a SamplingParams — the builder
    cache key for sampled decode-chunk programs (None = greedy program)."""
    if sp is None or sp.greedy:
        return None
    return (int(sp.top_k), sp.top_p < 1.0)


def sample_args_of(sp: SamplingParams | None):
    """The traced-argument part: (key, temperature, top_p), or None."""
    if sp is None or sp.greedy:
        return None
    return (
        make_key(sp.seed),
        jnp.float32(sp.temperature),
        jnp.float32(sp.top_p),
    )


def select_token(logits, sp: SamplingParams | None, key=None, step: int = 0):
    """argmax when greedy/None; else sample with the step-folded key."""
    if sp is None or sp.greedy:
        return jnp.argmax(logits, -1).astype(jnp.int32)
    k = jax.random.fold_in(key, step)
    return sample_fn(int(sp.top_k), sp.top_p < 1.0)(
        logits, k, jnp.float32(sp.temperature), jnp.float32(sp.top_p)
    )
