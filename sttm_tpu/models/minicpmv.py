"""MiniCPM-V 2.6 FrameFusion front-end (vision-embed assembly + patch types).

Behavioral port of the reference's MiniCPM-V hook
(framefusion/models/minicpmv/modeling_minicpmv.py:7-109): vision slices are
encoded by the tower, resampled to ``num_queries`` tokens per slice
(``self.resampler(vision_embedding, tgt_sizes)``, :47 — resampler:
models/resampler.py:minicpmv_resample), scattered into the token embeddings
over the ``image_bound`` ranges (:78-86), and a per-token **patch-type
stream** is derived for FrameFusion (:90-107): every token from the first
image bound to two past the last gets ``position % token_per_frame`` — the
position-within-frame convention, including the reference's ``+2`` tail quirk
and its counting of slice-separator text tokens inside ``token_per_frame``.

MiniCPM-V 2.6's LM is Qwen2-7B, so the decoder trunk is our standard Qwen2
stack; FrameFusion runs through runtime/framefusion.py with the explicit
``patch_type`` layout (static at trace time — image bounds are host data).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import qwen2

__all__ = [
    "minicpmv_patch_types",
    "assemble_minicpmv_embeds",
    "framefusion_spec_minicpmv",
]


def minicpmv_patch_types(seq_len: int, image_bound, num_frames: int):
    """Per-token patch types for FrameFusion (modeling_minicpmv.py:92-104).

    image_bound: [n_img, 2] (start, end) vision-embed ranges in token space,
    ``n_img = num_frames * slices_per_frame``. Returns
    (patch_type [seq_len] int64 with -1 = text, patch_num,
    image_token_start_index, image_token_end_index, image_token_length).
    """
    ib = np.asarray(image_bound, np.int64)
    if ib.ndim != 2 or ib.shape[1] != 2 or ib.shape[0] % num_frames:
        raise ValueError(f"bad image_bound shape {ib.shape} for {num_frames} frames")
    patch_per_frame = ib.shape[0] // num_frames
    # frame stride in token space — includes any separator text between
    # slices of the same frame (the reference counts them, :97)
    if patch_per_frame < ib.shape[0]:
        token_per_frame = int(ib[patch_per_frame, 0] - ib[0, 0])
    else:  # single frame: distance start->end covers the frame
        token_per_frame = int(ib[-1, 1] - ib[0, 0])
    lo = int(ib[0, 0])
    hi = int(ib[-1, 1] + 2)  # the reference extends 2 tokens past the last bound
    if hi > seq_len:
        raise ValueError(f"patch span [{lo}, {hi}) exceeds sequence {seq_len}")
    pt = np.full((seq_len,), -1, np.int64)
    pt[lo:hi] = np.arange(hi - lo, dtype=np.int64) % token_per_frame
    start = int(np.argmax(pt >= 0))
    end = seq_len - 1 - int(np.argmax(pt[::-1] >= 0))
    return pt, token_per_frame, start, end, end - start + 1


def assemble_minicpmv_embeds(
    decoder_params: dict,
    input_ids,
    vision_embeds,
    image_bound,
    s_full: int,
    scale_emb: float | None = None,
    dtype=jnp.bfloat16,
    cfg=None,
):
    """Token embeds with resampled vision slices scattered over image_bound
    ranges (modeling_minicpmv.py:70-86). vision_embeds: [n_img, Q, D] (one
    resampled block per image bound). Returns (embeds [1, s_full, D], valid).

    ``scale_emb`` multiplies the text embeddings when the LM config carries
    one (:70-73; MiniCPM LMs — Qwen2-based 2.6 has none).
    """
    ids = np.asarray(input_ids).reshape(-1)
    valid = len(ids)
    if valid > s_full:
        raise ValueError(f"sequence {valid} exceeds buffer {s_full}")
    emb = qwen2.embed_tokens(decoder_params, jnp.asarray(ids, jnp.int32), cfg)
    if scale_emb is not None:
        emb = emb * scale_emb
    ib = np.asarray(image_bound, np.int64)
    ve = jnp.asarray(vision_embeds, emb.dtype)
    if ve.ndim != 3 or ve.shape[0] != ib.shape[0]:
        raise ValueError(f"vision_embeds {ve.shape} vs {ib.shape[0]} bounds")
    for i, (r0, r1) in enumerate(ib):
        if r1 - r0 != ve.shape[1]:
            raise ValueError(f"bound {i} length {r1 - r0} != {ve.shape[1]} queries")
        emb = emb.at[int(r0) : int(r1)].set(ve[i])
    emb = jnp.pad(emb, ((0, s_full - valid), (0, 0))).astype(dtype)
    return emb[None], valid


def framefusion_spec_minicpmv(
    cost: float, s_full: int, image_bound, num_frames: int, **kw
):
    """FrameFusionSpec with the MiniCPM-V explicit patch-type layout."""
    from ..runtime.framefusion import FrameFusionSpec

    pt, _, _, _, _ = minicpmv_patch_types(s_full, image_bound, num_frames)
    return FrameFusionSpec(cost=cost, patch_type=tuple(int(v) for v in pt), **kw)


def encode_minicpmv_slices(
    vpm_params: dict,
    resampler_params: dict,
    patches,
    tgt_sizes,
    vpm_cfg=None,
    resampler_cfg=None,
):
    """Pixels -> per-slice resampled vision embeds (get_vllm_embedding's
    vision half, modeling_minicpmv.py:16-47): packed patch slices through the
    NaViT SigLIP tower (``self.vpm``, models/navit_siglip.py), then the
    cross-attention resampler per slice with its (th, tw) grid.

    patches: [n_img, N_max, 3*p*p]; tgt_sizes: [n_img, 2] int.
    Returns [n_img, num_queries, embed_dim] ready for
    ``assemble_minicpmv_embeds``.
    """
    from .navit_siglip import NAVIT_SIGLIP_MINICPMV, navit_siglip_encode
    from .resampler import minicpmv_resample

    vpm_cfg = vpm_cfg or NAVIT_SIGLIP_MINICPMV
    feats = navit_siglip_encode(vpm_params, vpm_cfg, jnp.asarray(patches), jnp.asarray(tgt_sizes, jnp.int32))
    out = []
    tg = np.asarray(tgt_sizes, np.int64)
    for i in range(feats.shape[0]):
        th, tw = int(tg[i, 0]), int(tg[i, 1])
        out.append(minicpmv_resample(resampler_params, resampler_cfg, feats[i, : th * tw], (th, tw)))
    return jnp.stack(out)
