"""Reference-parity sweep: run the ACTUAL reference torch code against our
jax ops on identical inputs and regenerate PARITY_SWEEP.json.

Usage:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/parity_sweep.py

Covers (VERDICT r1 #7):
  - quadtree spatial+temporal sweep vs quadtree_build_video
    (token_merging_utils/quadtree_builder.py:85)
  - ToMe per-video vs tome_per_video (tome_token_merger.py:133)
  - DyCoke stage-1 vs dycoke_ttm (dycoke_merger.py:8)
  - octree vs octree_build (octree_utils.py:293)
  - FrameFusion merge phase vs FrameFusion.forward (framefusion/main.py:30)

"Bit-match" = identical kept-token id sequences / integer metadata; features
agree to fp32 tolerance. The reference package root is importable directly
(token_merging_utils/__init__.py is empty); framefusion/main.py is loaded by
file path because the llava package __init__ imports stale transformers APIs.
"""

from __future__ import annotations

import importlib.util
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("STTM_REFERENCE", "/root/reference")
sys.path.insert(0, REPO)

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
# threshold/ranking decisions are fp32-sensitive; jax's default matmul
# precision is bf16-equivalent even on CPU (CLAUDE.md numerics rules)
jax.config.update("jax_default_matmul_precision", "float32")

import jax.numpy as jnp
import numpy as np
import torch


def _import_reference():
    sys.path.insert(0, REFERENCE)
    import token_merging_utils.dycoke_merger as ref_dycoke
    import token_merging_utils.octree_utils as ref_octree
    import token_merging_utils.quadtree_builder as ref_qt
    import token_merging_utils.tome_token_merger as ref_tome

    ff_path = os.path.join(REFERENCE, "llava", "model", "framefusion", "main.py")
    spec = importlib.util.spec_from_file_location("ref_framefusion_main", ff_path)
    ref_ff = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_ff)
    return ref_qt, ref_tome, ref_dycoke, ref_octree, ref_ff


def synth_video(t, h, w, c, seed, level_noise=0.22, temporal_noise=0.08):
    """Hierarchically correlated video so merge decisions are mixed at the
    tuned thresholds: coarse-to-fine pyramid noise (spatial structure) plus a
    slow per-frame drift (temporal structure)."""
    rng = np.random.default_rng(seed)
    sizes = [(h, w)]
    hh, ww = h, w
    while hh != 2 and ww != 2:
        hh, ww = math.ceil(hh / 2), math.ceil(ww / 2)
        sizes.insert(0, (hh, ww))
    feat = rng.normal(size=(sizes[0][0], sizes[0][1], c))
    for h2, w2 in sizes[1:]:
        iy = np.minimum(np.arange(h2) // 2, feat.shape[0] - 1)
        ix = np.minimum(np.arange(w2) // 2, feat.shape[1] - 1)
        feat = feat[iy][:, ix] + level_noise * rng.normal(size=(h2, w2, c))
    drift = rng.normal(size=(t, 1, 1, c)) * temporal_noise
    video = feat[None] + np.cumsum(drift, axis=0) * 0.5
    video += 0.02 * rng.normal(size=(t, h, w, c))
    return video.astype(np.float32)


def sweep_quadtree(ref_qt):
    """Kept-token sets, num_patches and features vs quadtree_build_video."""
    cases = [
        # (spatial, temporal, root_level, T, H, W) — the tuned operating
        # points (run_vidqa.sh:54-90) + shape/root-level edge cases
        (0.85, 0.65, 1, 12, 14, 14),
        (0.80, 0.60, 1, 12, 14, 14),
        (0.85, 0.55, 1, 12, 14, 14),
        (0.80, 0.50, 1, 12, 14, 14),
        (0.90, 0.65, 1, 12, 14, 14),
        (0.95, 0.65, 1, 12, 14, 14),
        (0.85, -1.0, 1, 12, 14, 14),  # spatial-only
        (0.94, 0.82, 1, 12, 14, 14),  # 72B tuned point
        (0.90, 0.90, 1, 12, 14, 14),
        (0.75, 0.50, 1, 12, 14, 14),
        (0.85, 0.65, 0, 6, 14, 14),
        (0.85, 0.65, 1, 8, 13, 17),  # non-square
        (0.80, 0.60, -1, 10, 8, 8),  # root at leaf ladder end
        (0.85, 0.65, 2, 5, 14, 14),
    ]
    from sttm_tpu.ops.sttm import sttm_merge

    out = []
    for i, (st, tt, rl, t, h, w) in enumerate(cases):
        video = synth_video(t, h, w, 64, seed=100 + i)

        ref_in = torch.from_numpy(video).permute(0, 3, 1, 2).contiguous()
        ref_feat, ref_np, ref_tlbr = ref_qt.quadtree_build_video(
            ref_in, st, temporal_thresh=tt, root_level=rl
        )
        offs = torch.tensor([h * w, w, 1], dtype=ref_tlbr.dtype)
        ref_ids = (ref_tlbr[:, :3] * offs).sum(-1).numpy()

        res = sttm_merge(jnp.asarray(video), st, tt, rl)
        keep = np.asarray(res.keep)
        ids = np.nonzero(keep)[0]
        ok = (
            ids.tolist() == ref_ids.tolist()
            and np.asarray(res.num_patch)[keep].tolist() == ref_np.numpy().tolist()
        )
        err = float(np.abs(np.asarray(res.feat, np.float32)[keep] - ref_feat.numpy()).max())
        ok = ok and err < 3e-4
        out.append({"st": st, "tt": tt, "rl": rl, "T": t, "H": h, "W": w,
                    "tokens": int(len(ids)), "ok": bool(ok), "feat_maxerr": err})
        print(f"quadtree st={st} tt={tt} rl={rl} {t}x{h}x{w}: "
              f"{len(ids)} tokens ok={ok} err={err:.2e}")
    return out


def sweep_tome(ref_tome):
    from sttm_tpu.ops.tome import tome_merge

    out = []
    for i, (ratio, n_head, t, h, w) in enumerate([(0.6, 4, 8, 6, 6), (0.5, 1, 6, 8, 8)]):
        video = synth_video(t, h, w, 64, seed=200 + i)
        ref_in = torch.from_numpy(video).permute(0, 3, 1, 2).contiguous()
        ref_feat, ref_idx = ref_tome.tome_per_video(ref_in, ratio, n_head)
        feat, idx = tome_merge(jnp.asarray(video), ratio, n_head, "video")
        ok = np.asarray(idx).tolist() == ref_idx.numpy().tolist()
        err = float(np.abs(np.asarray(feat, np.float32) - ref_feat.numpy()).max())
        ok = ok and err < 3e-4
        out.append({"kind": "tome", "ratio": ratio, "n_head": n_head,
                    "tokens": int(len(np.asarray(idx))), "ok": bool(ok), "feat_maxerr": err})
        print(f"tome ratio={ratio} heads={n_head}: ok={ok} err={err:.2e}")
    return out


def sweep_dycoke(ref_dycoke):
    from sttm_tpu.ops.dycoke import dycoke_ttm

    out = []
    for i, (t, ratio) in enumerate([(9, 0.7), (12, 0.7), (16, 0.925), (12, 0.925)]):
        p = 36
        # wide similarity spread: the hierarchical quadtree input clusters
        # sims within ~1e-7 of each other, where torch-vs-jax fp noise flips
        # adjacent topk ranks (pure tie-order, sets still matched)
        rng = np.random.default_rng(300 + i)
        base = rng.normal(size=(1, p, 64))
        video = (base + 0.6 * rng.normal(size=(t, p, 64))).reshape(t * p, 64).astype(np.float32)
        ref_feat, ref_idx = ref_dycoke.dycoke_ttm(torch.from_numpy(video), t, ratio)
        feat, idx = dycoke_ttm(jnp.asarray(video), t, ratio)
        ok = np.asarray(idx).tolist() == ref_idx.numpy().tolist()
        err = float(np.abs(np.asarray(feat, np.float32) - ref_feat.numpy()).max())
        ok = ok and err == 0.0  # pure selection: bit-exact
        out.append({"kind": "dycoke", "T": t, "ratio": ratio,
                    "tokens": int(len(np.asarray(idx))), "ok": bool(ok), "feat_maxerr": err})
        print(f"dycoke T={t} ratio={ratio}: ok={ok} err={err:.2e}")
    return out


def sweep_octree(ref_octree):
    from sttm_tpu.ops.octree import octree_merge

    out = []
    for i, (thr, rl, t, h, w) in enumerate(
        [(0.5, 0, 8, 14, 14), (0.7, 0, 8, 14, 14), (0.9, 0, 8, 14, 14),
         (0.7, 0, 9, 14, 14), (0.7, 1, 8, 14, 14), (0.6, 0, 6, 13, 13)]
    ):
        video = synth_video(t, h, w, 64, seed=400 + i)
        ref_in = torch.from_numpy(video).permute(0, 3, 1, 2).contiguous()
        ref_feat = ref_octree.octree_build(ref_in, thr, rl)
        keep, feat = octree_merge(jnp.asarray(video), thr, rl)
        keep = np.asarray(keep)
        ours = np.asarray(feat, np.float32)[keep]
        ok = ours.shape == tuple(ref_feat.shape)
        err = float(np.abs(ours - ref_feat.numpy()).max()) if ok else float("inf")
        ok = ok and err < 3e-4
        out.append({"kind": "octree", "thr": thr, "rl": rl, "T": t, "H": h, "W": w,
                    "tokens": int(keep.sum()), "ok": bool(ok), "feat_maxerr": err})
        print(f"octree thr={thr} rl={rl} T={t}: {keep.sum()} tokens ok={ok} err={err:.2e}")
    return out


def sweep_framefusion(ref_ff):
    """Merge phase only (the pruning pass needs live attention weights, which
    this harness has no model to produce): iterate the per-layer merge on the
    same hidden states and compare survivors + features + budget accounting."""
    from sttm_tpu.runtime.framefusion import FrameFusionSpec, _merge_step

    out = []
    for i, (cost, t, h, w, noise) in enumerate(
        [(0.3, 8, 4, 4, 0.01), (0.5, 6, 4, 4, 0.02), (0.3, 8, 4, 4, 0.3)]
    ):
        rng = np.random.default_rng(500 + i)
        p = h * w
        nv = t * p
        sys_len, inst_len = 5, 7
        s = sys_len + nv + inst_len
        d = 64
        frame = rng.normal(size=(1, p, d))
        video = (frame + noise * rng.normal(size=(t, p, d))).reshape(nv, d)
        hidden = rng.normal(size=(s, d)).astype(np.float32)
        hidden[sys_len : sys_len + nv] = video

        # the reference's budget solver hardcodes num_layers=28
        # (main.py _compute_pruning_ratio default); drive ours at 28 too
        n_layers = 28
        ff = ref_ff.FrameFusion(cost=cost, similarity_lower_bound=0.6, ratio_lower_bound=0.1)
        patch_type = np.full((1, s), ref_ff.TEXT_TOKEN, np.int64)
        patch_type[0, sys_len : sys_len + nv] = np.tile(np.arange(p), t)
        ff.prepare(
            patch_type=torch.from_numpy(patch_type), patch_num=p,
            image_token_start_index=torch.tensor([sys_len]),
            image_token_end_index=torch.tensor([sys_len + nv]),
            image_token_length=nv, original_length=s,
        )
        # copy: the reference's index_add_ mutates its input buffer in place
        rh = torch.from_numpy(hidden.copy())[None]
        cos = torch.zeros(1, s, 8)
        pos = [cos, cos.clone()]
        for li in range(n_layers):
            if ff.finish_merging:
                break
            rh, pos, _ = ff(rh, pos, None)
        ref_surv = rh[0].numpy()

        spec = FrameFusionSpec(cost=cost, t=t, h=h, w=w)
        x = jnp.asarray(hidden)
        alive = jnp.ones((s,), bool)
        state = (jnp.float32(1.0), jnp.float32(0.0), jnp.array(False), jnp.array(False))
        for li in range(n_layers):
            x, alive, state = _merge_step(spec, x, alive, sys_len, state, li, n_layers)
        ours = np.asarray(x, np.float32)[np.asarray(alive)]

        ok = ours.shape == ref_surv.shape
        err = float(np.abs(ours - ref_surv).max()) if ok else float("inf")
        ok = ok and err < 3e-4
        # budget accounting: our running product equals prod(1 - sparsity_i)
        s_prod = float(state[0])
        ref_prod = float(np.prod([1.0 - v for v in ff.sparsity_list])) if ff.sparsity_list else 1.0
        ok = ok and abs(s_prod - ref_prod) < 1e-5
        out.append({"kind": "framefusion-merge", "cost": cost, "T": t, "noise": noise,
                    "tokens": int(np.asarray(alive).sum()), "ok": bool(ok),
                    "feat_maxerr": err, "s_prod": s_prod, "ref_s_prod": ref_prod})
        print(f"framefusion cost={cost} noise={noise}: {ours.shape[0]} survivors "
              f"ok={ok} err={err:.2e}")
    return out


def _import_reference_trl():
    """Load the reference's vendored TRL PPO math without its heavy package
    __init__ chain: register trl/{core,import_utils} and the trainer modules
    ppo_trainer pulls from `.` under their package names, stubbing the two
    external deps (tyro, trl.models) that the math never touches."""
    import types

    tyro = types.ModuleType("tyro")

    class _Conf:
        class Suppress:
            def __class_getitem__(cls, item):
                return item

        @staticmethod
        def arg(**kw):
            return object()

    tyro.conf = _Conf
    sys.modules.setdefault("tyro", tyro)

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        m = importlib.util.module_from_spec(spec)
        sys.modules[name] = m
        spec.loader.exec_module(m)
        return m

    trl_dir = os.path.join(REFERENCE, "trl")
    pkg = types.ModuleType("trl")
    pkg.__path__ = [trl_dir]
    sys.modules["trl"] = pkg
    load("trl.import_utils", os.path.join(trl_dir, "import_utils.py"))
    core = load("trl.core", os.path.join(trl_dir, "core.py"))
    models = types.ModuleType("trl.models")
    models.SUPPORTED_ARCHITECTURES = ()
    models.PreTrainedModelWrapper = type("PreTrainedModelWrapper", (), {})
    models.create_reference_model = lambda *a, **k: None
    sys.modules["trl.models"] = models
    pkg.models = models
    trainer = types.ModuleType("trl.trainer")
    trainer.__path__ = [os.path.join(trl_dir, "trainer")]
    sys.modules["trl.trainer"] = trainer
    utils = load("trl.trainer.utils", os.path.join(trl_dir, "trainer", "utils.py"))
    base = load("trl.trainer.base", os.path.join(trl_dir, "trainer", "base.py"))
    ppo_config = load("trl.trainer.ppo_config", os.path.join(trl_dir, "trainer", "ppo_config.py"))
    trainer.AdaptiveKLController = utils.AdaptiveKLController
    trainer.FixedKLController = utils.FixedKLController
    trainer.RunningMoments = utils.RunningMoments
    trainer.BaseTrainer = base.BaseTrainer
    trainer.PPOConfig = ppo_config.PPOConfig
    ppo = load("trl.trainer.ppo_trainer", os.path.join(trl_dir, "trainer", "ppo_trainer.py"))
    return core, ppo


def sweep_rlhf():
    """train/rlhf.py vs the ACTUAL vendored TRL math (trl/core.py:138-177,
    trl/trainer/ppo_trainer.py:1031-1198) on identical random inputs. The
    PPOTrainer methods are called unbound with a duck-typed `self` carrying
    only `.config` / `.kl_ctl` — no trainer construction needed."""
    import types

    from sttm_tpu.train import rlhf

    core, ppo = _import_reference_trl()
    rng = np.random.default_rng(77)
    out = []

    b, t = 4, 13
    v = rng.normal(size=(b, t)).astype(np.float32)
    m = np.zeros((b, t), np.float32)
    for i, (lo, hi) in enumerate([(1, 9), (2, 13), (0, 7), (3, 11)]):
        m[i, lo:hi] = 1.0

    got = np.asarray(rlhf.masked_whiten(jnp.asarray(v), jnp.asarray(m)))
    ref = core.masked_whiten(torch.from_numpy(v), torch.from_numpy(m)).numpy()
    err = float(np.abs(got - ref).max())
    out.append({"kind": "trl-masked-whiten", "ok": bool(err < 1e-5), "maxerr": err})
    print(f"trl masked_whiten: err={err:.2e}")

    scores = rng.normal(size=b).astype(np.float32)
    lp = rng.normal(size=(b, t)).astype(np.float32)
    rlp = rng.normal(size=(b, t)).astype(np.float32)
    for kind in ("kl", "abs", "mse"):
        stub = types.SimpleNamespace(
            config=types.SimpleNamespace(kl_penalty=kind),
            kl_ctl=types.SimpleNamespace(value=0.3))
        stub._kl_penalty = lambda a, c: ppo.PPOTrainer._kl_penalty(stub, a, c)
        ref_rew, ref_ns, ref_kl = ppo.PPOTrainer.compute_rewards(
            stub, torch.from_numpy(scores), torch.from_numpy(lp),
            torch.from_numpy(rlp), torch.from_numpy(m).long())
        got_rew, got_ns, got_kl = rlhf.compute_rewards(
            jnp.asarray(scores), jnp.asarray(lp), jnp.asarray(rlp),
            jnp.asarray(m), kl_coef=0.3, kl_penalty=kind)
        err = float(np.abs(np.asarray(got_rew) - ref_rew.numpy()).max())
        err = max(err, float(np.abs(np.asarray(got_kl) - ref_kl.numpy()).max()))
        out.append({"kind": f"trl-compute-rewards-{kind}", "ok": bool(err < 1e-5),
                    "maxerr": err})
        print(f"trl compute_rewards[{kind}]: err={err:.2e}")

    values = rng.normal(size=(b, t)).astype(np.float32)
    rewards = rng.normal(size=(b, t)).astype(np.float32)
    for gamma, lam, whiten in [(1.0, 0.95, False), (0.98, 0.9, True)]:
        stub = types.SimpleNamespace(config=types.SimpleNamespace(
            gamma=gamma, lam=lam, whiten_rewards=whiten))
        rv, ra, rr = ppo.PPOTrainer.compute_advantages(
            stub, torch.from_numpy(values), torch.from_numpy(rewards),
            torch.from_numpy(m))
        cfg = rlhf.PPOConfig(gamma=gamma, lam=lam, whiten_rewards=whiten)
        gv, ga, gr = rlhf.compute_advantages(
            jnp.asarray(values), jnp.asarray(rewards), jnp.asarray(m), cfg)
        err = max(float(np.abs(np.asarray(ga) - ra.numpy()).max()),
                  float(np.abs(np.asarray(gr) - rr.numpy()).max()))
        out.append({"kind": f"trl-gae-g{gamma}-l{lam}-w{int(whiten)}",
                    "ok": bool(err < 1e-4), "maxerr": err})
        print(f"trl compute_advantages[g={gamma} lam={lam} whiten={whiten}]: err={err:.2e}")

    # full PPO loss: pg + vf + stats on one random minibatch
    vocab = 11
    old_lp = rng.normal(size=(b, t)).astype(np.float32)
    new_lp = (old_lp + 0.1 * rng.normal(size=(b, t))).astype(np.float32)
    logits = rng.normal(size=(b, t, vocab)).astype(np.float32)
    vpreds = (values + 0.2 * rng.normal(size=(b, t))).astype(np.float32)
    adv = rng.normal(size=(b, t)).astype(np.float32)
    ret = (values + adv).astype(np.float32)
    stub = types.SimpleNamespace(config=types.SimpleNamespace(
        cliprange=0.2, cliprange_value=0.2, vf_coef=0.1, ratio_threshold=10.0))
    ref_pg, ref_vf, ref_stats = ppo.PPOTrainer.loss(
        stub, torch.from_numpy(old_lp), torch.from_numpy(values),
        torch.from_numpy(logits), torch.from_numpy(vpreds),
        torch.from_numpy(new_lp), torch.from_numpy(m).long(),
        torch.from_numpy(adv), torch.from_numpy(ret))
    loss, stats = rlhf.ppo_loss(
        jnp.asarray(old_lp), jnp.asarray(values), jnp.asarray(logits),
        jnp.asarray(vpreds), jnp.asarray(new_lp), jnp.asarray(m),
        jnp.asarray(adv), jnp.asarray(ret), rlhf.PPOConfig())
    err = max(
        abs(float(stats["loss/policy"]) - float(ref_pg)),
        abs(float(stats["loss/value"]) - float(ref_vf)),
        abs(float(stats["policy/entropy"]) - float(ref_stats["policy/entropy"])),
        abs(float(stats["policy/approxkl"]) - float(ref_stats["policy/approxkl"])),
    )
    out.append({"kind": "trl-ppo-loss", "ok": bool(err < 1e-5), "maxerr": err})
    print(f"trl ppo loss: err={err:.2e}")
    return out


def main():
    if not os.path.isdir(REFERENCE):
        print(f"reference not found at {REFERENCE}; set STTM_REFERENCE")
        return 2
    ref_qt, ref_tome, ref_dycoke, ref_octree, ref_ff = _import_reference()
    cases = sweep_quadtree(ref_qt)
    extras = sweep_tome(ref_tome) + sweep_dycoke(ref_dycoke)
    extras += sweep_octree(ref_octree) + sweep_framefusion(ref_ff)
    extras += sweep_rlhf()
    all_ok = all(c["ok"] for c in cases + extras)
    result = {
        "note": "kept-token sets, num_patches and features vs the reference "
                "torch implementation (regenerate: python scripts/parity_sweep.py)",
        "all_match": all_ok,
        "cases": cases,
        "extras": extras,
    }
    out_path = os.path.join(REPO, "PARITY_SWEEP.json")
    with open(out_path, "w") as fp:
        json.dump(result, fp, indent=1)
    print(f"\nall_match={all_ok} -> {out_path}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
