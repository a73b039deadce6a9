"""CLI: extract vision-tower features from raw videos to the .npy/.pkl cache.

Role of the reference's video_feat_llavavideo.py / video_feat_qwen2vl.py:
decode + sample frames (native libav decoder instead of decord), run the
vision tower on TPU in frame chunks, save per-video features + metadata.
Existing outputs are skipped (crash-resume, video_feat_llavavideo.py:70).

    python -m sttm_tpu.eval.extract_features --model_family llava \
        --tower_path ckpts/siglip-so400m --video_dir vids/ --out_dir feats/ \
        --frames_upbound 128 --tgt_video_fps 1
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_family", choices=["llava", "qwen2vl"], default="llava")
    p.add_argument("--tower_path", required=True, help="HF checkpoint dir")
    p.add_argument("--video_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--frames_upbound", type=int, default=128)
    p.add_argument("--tgt_video_fps", type=float, default=1.0)
    p.add_argument("--chunk", type=int, default=64, help="frames per tower call")
    p.add_argument("--max_pixels", type=int, default=14 * 14 * 4 * 1280)
    return p.parse_args(argv)


def extract_llava(args, video_paths):
    import jax
    import jax.numpy as jnp

    from ..data.video import load_video_frames, siglip_preprocess
    from ..models.siglip import SIGLIP_SO400M, load_siglip_state_dict, siglip_encode
    from safetensors import safe_open

    tensors = {}
    for shard in [f for f in os.listdir(args.tower_path) if f.endswith(".safetensors")]:
        with safe_open(os.path.join(args.tower_path, shard), framework="np") as f:
            for name in f.keys():
                tensors[name] = f.get_tensor(name)
    params = load_siglip_state_dict(SIGLIP_SO400M, tensors)
    cfg = SIGLIP_SO400M
    encode = jax.jit(lambda px: siglip_encode(params, cfg, px))

    feat_dir = os.path.join(args.out_dir, "features")
    meta_dir = os.path.join(args.out_dir, "metadata")
    os.makedirs(feat_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)
    for path in video_paths:
        vid = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(feat_dir, f"{vid}.npy")
        if os.path.exists(out):
            continue
        frames, meta = load_video_frames(
            path, args.tgt_video_fps, args.frames_upbound, cfg.image_size, cfg.image_size
        )
        px = siglip_preprocess(frames)
        feats = []
        for i in range(0, len(px), args.chunk):
            chunk = px[i : i + args.chunk]
            pad = args.chunk - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros_like(chunk[:1]).repeat(pad, 0)])
            f = np.asarray(encode(jnp.asarray(chunk)), np.float32)
            feats.append(f[: len(px[i : i + args.chunk])])
        feats = np.concatenate(feats)  # [T, 729, 1152]
        np.save(out, feats.astype(np.float16))
        with open(os.path.join(meta_dir, f"{vid}.pkl"), "wb") as fp:
            pickle.dump(meta, fp)
        print(f"{vid}: {feats.shape}")


def extract_qwen2vl(args, video_paths):
    import jax
    import jax.numpy as jnp

    from ..data.video import load_video_frames, qwen2vl_patchify, smart_resize
    from ..models.qwen2vl_vit import QWEN2VL_VIT_7B, load_vit_state_dict, vit_encode
    from safetensors import safe_open

    tensors = {}
    for shard in [f for f in os.listdir(args.tower_path) if f.endswith(".safetensors")]:
        with safe_open(os.path.join(args.tower_path, shard), framework="np") as f:
            for name in f.keys():
                if name.startswith("visual."):
                    tensors[name] = f.get_tensor(name)
    cfg = QWEN2VL_VIT_7B
    params = load_vit_state_dict(cfg, tensors)

    feat_dir = os.path.join(args.out_dir, "features")
    meta_dir = os.path.join(args.out_dir, "metadata")
    os.makedirs(feat_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)
    # Qwen2-VL normalization (OPENAI_CLIP mean/std, qwen_vl_utils defaults)
    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
    for path in video_paths:
        vid = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(feat_dir, f"{vid}.npy")
        if os.path.exists(out):
            continue
        from .. import native

        info = native.probe(path)
        hh, ww = smart_resize(info["height"], info["width"], max_pixels=args.max_pixels)
        frames, meta = load_video_frames(path, args.tgt_video_fps, args.frames_upbound, ww, hh)
        px = ((frames.astype(np.float32) / 255.0) - mean) / std
        patches, grid = qwen2vl_patchify(px)
        feats = np.asarray(
            jax.jit(vit_encode, static_argnums=(1, 3))(
                params, cfg, jnp.asarray(patches), grid
            ),
            np.float32,
        )
        t, gh, gw = grid
        feats = feats.reshape(t, gh // 2, gw // 2, -1)
        np.save(out, feats.astype(np.float16))
        meta["video_grid_thw"] = [t, gh, gw]
        with open(os.path.join(meta_dir, f"{vid}.pkl"), "wb") as fp:
            pickle.dump(meta, fp)
        print(f"{vid}: {feats.shape}")


def main(argv=None):
    args = parse_args(argv)
    vids = sorted(
        os.path.join(args.video_dir, f)
        for f in os.listdir(args.video_dir)
        if f.endswith((".mp4", ".mkv", ".webm", ".avi"))
    )
    if args.model_family == "llava":
        extract_llava(args, vids)
    else:
        extract_qwen2vl(args, vids)


if __name__ == "__main__":
    main()
