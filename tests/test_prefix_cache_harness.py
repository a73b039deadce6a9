"""Harness-level prefix caching (EvalConfig.prefix_cache): questions of the
same video share one [sys|video] prefill cache; answers must be identical to
the per-question full-prefill path (runtime/generate.py prefix_prefill is
token-exact — tests/test_prefix_cache.py covers the runtime layer)."""

import json
import os

import numpy as np

import jax

from sttm_tpu.data.datasets import DataConfig, FeatureVidQADataset
from sttm_tpu.eval.harness import EvalConfig, LlavaEvaluator
from sttm_tpu.eval.reporting import read_jsonl
from sttm_tpu.models import llava, qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.models.llava import LlavaConfig
from sttm_tpu.runtime.reducer import ReducerSpec


class MockTokenizer:
    def encode(self, text, add_special_tokens=False):
        return [ord(c) % 250 for c in text][:40]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(65 + (i % 26)) for i in ids[:3])


def _benchmark(tmp_path):
    """2 videos x 2 questions + 1 single-question video (solo fallback)."""
    rng = np.random.default_rng(0)
    annos = []
    feat_dir = tmp_path / "features"
    meta_dir = tmp_path / "metadata"
    feat_dir.mkdir()
    meta_dir.mkdir()
    qid = 0
    for i, (vid, t, nq) in enumerate([("vidA", 4, 2), ("vidB", 5, 2), ("vidC", 4, 1)]):
        np.save(feat_dir / f"{vid}.npy", rng.normal(size=(t, 36, 16)).astype(np.float32))
        for j in range(nq):
            annos.append({
                "question_id": f"q{qid}", "videoID": vid,
                "question": f"What happens in part {j} of clip {i}?"[: 20 + 3 * j],
                "options": ["A. cat", "B. dog", "C. bird", "D. fish"],
                "answer": "A", "duration": "short", "domain": "test",
                "task_type": "tt",
            })
            qid += 1
    anno_path = tmp_path / "annos.json"
    anno_path.write_text(json.dumps(annos))
    return anno_path, feat_dir, meta_dir, annos


def _spec_factory(t, h, w):
    return ReducerSpec(
        kind="quadtree", layer_idx=1, t=t, h=h, w=w, video_budget=t * h * w // 2,
        spatial_thresh=0.7, temporal_thresh=0.6, root_level=0,
    )


def test_prefix_cached_eval_matches_per_sample(tmp_path):
    anno_path, feat_dir, meta_dir, annos = _benchmark(tmp_path)
    cfg = LlavaConfig(decoder=TINY, vision_hidden_size=16, vision_patches_per_side=6)
    dec_params = qwen2.init_params(TINY, jax.random.key(0))
    mm_params = llava.init_multimodal_params(cfg, jax.random.key(1))
    tok = MockTokenizer()
    dcfg = DataConfig("videomme", str(anno_path), str(feat_dir), str(meta_dir))

    ev = LlavaEvaluator(dec_params, TINY, cfg, mm_params, tok, _spec_factory)
    base = dict(dataset_name="videomme", max_new_tokens=3, pad_multiple=64,
                attention_impl="xla", eos_token_ids=())
    ecfg1 = EvalConfig(out_dir=str(tmp_path / "per"), **base)
    ev.evaluate(FeatureVidQADataset(dcfg, tok), ecfg1, gts=annos)
    ecfg2 = EvalConfig(out_dir=str(tmp_path / "pfx"), prefix_cache=True, **base)
    ev.evaluate(FeatureVidQADataset(dcfg, tok), ecfg2, gts=annos)

    p1 = {r["question_id"]: r["answer"]
          for r in read_jsonl(os.path.join(ecfg1.out_dir, "predictions.jsonl"))}
    p2 = {r["question_id"]: r["answer"]
          for r in read_jsonl(os.path.join(ecfg2.out_dir, "predictions.jsonl"))}
    assert p1 == p2 and len(p2) == 5

    rts = {r["question_id"]: r
           for r in read_jsonl(os.path.join(ecfg2.out_dir, "runtime.jsonl"))}
    # shared-video questions ran as cache extensions; each group's first row
    # carries the once-per-video prefill cost
    assert rts["q0"]["prefix_cached"] and rts["q1"]["prefix_cached"]
    assert rts["q2"]["prefix_cached"] and rts["q3"]["prefix_cached"]
    assert rts["q0"]["prefix_prefill_time"] > 0
    assert rts["q2"]["prefix_prefill_time"] > 0
    assert "prefix_prefill_time" not in rts["q1"]
    # the single-question video fell back to the normal full-prefill path
    assert "prefix_cached" not in rts["q4"]
    # merged stats agree with the per-sample run
    s1 = {r["question_id"]: r["visual_merged_ratio"]
          for r in read_jsonl(os.path.join(ecfg1.out_dir, "prompt_stat.jsonl"))}
    s2 = {r["question_id"]: r["visual_merged_ratio"]
          for r in read_jsonl(os.path.join(ecfg2.out_dir, "prompt_stat.jsonl"))}
    assert s1 == s2


def test_cli_smoke_prefix_cache(tmp_path):
    """--prefix_cache drives the CLI end to end and rejects unsupported
    serving-mode combinations."""
    import pytest

    from sttm_tpu.eval.run_vidqa import main as cli_main

    anno_path, feat_dir, meta_dir, _ = _benchmark(tmp_path)
    out_dir = tmp_path / "cli_out"
    args = [
        "--dataset_name", "videomme",
        "--anno_filepath", str(anno_path), "--metadata_dir", str(meta_dir),
        "--smoke", "--max_new_tokens", "2",
        "--attention_impl", "xla", "--output_dir", str(out_dir),
        "--sa_pattern", "quadtree", "--sa_start_layer_idx", "1",
        "--sa_tree_thresh", "0.7", "--sa_tree_temporal_thresh", "0.6",
        "--model_name_or_path", "ckpts/tiny-llava",
        "--feature_dir", str(feat_dir), "--prefix_cache",
    ]
    cli_main(args)
    (run,) = os.listdir(out_dir)
    rows = read_jsonl(os.path.join(out_dir, run, "runtime.jsonl"))
    assert len(rows) == 5
    assert sum(1 for r in rows if r.get("prefix_cached")) == 4

    with pytest.raises(SystemExit):  # chunked decode needs the batched path
        cli_main(args + ["--decode_chunk_size", "4"])
    with pytest.raises(SystemExit):
        cli_main(args + ["--sp", "2"])


def test_prefix_cached_batched_matches_per_sample(tmp_path):
    """--prefix_cache + batch_size 2: each video's questions decode
    head-packed-batched over the shared prefix cache; answers must match the
    per-sample full-prefill path."""
    anno_path, feat_dir, meta_dir, annos = _benchmark(tmp_path)
    cfg = LlavaConfig(decoder=TINY, vision_hidden_size=16, vision_patches_per_side=6)
    dec_params = qwen2.init_params(TINY, jax.random.key(0))
    mm_params = llava.init_multimodal_params(cfg, jax.random.key(1))
    tok = MockTokenizer()
    dcfg = DataConfig("videomme", str(anno_path), str(feat_dir), str(meta_dir))

    ev = LlavaEvaluator(dec_params, TINY, cfg, mm_params, tok, _spec_factory)
    base = dict(dataset_name="videomme", max_new_tokens=4, pad_multiple=64,
                attention_impl="xla", eos_token_ids=())
    ecfg1 = EvalConfig(out_dir=str(tmp_path / "bper"), **base)
    ev.evaluate(FeatureVidQADataset(dcfg, tok), ecfg1, gts=annos)
    ecfg2 = EvalConfig(out_dir=str(tmp_path / "bpfx"), prefix_cache=True,
                       batch_size=2, decode_chunk_size=2, **base)
    ev.evaluate(FeatureVidQADataset(dcfg, tok), ecfg2, gts=annos)

    p1 = {r["question_id"]: r["answer"]
          for r in read_jsonl(os.path.join(ecfg1.out_dir, "predictions.jsonl"))}
    p2 = {r["question_id"]: r["answer"]
          for r in read_jsonl(os.path.join(ecfg2.out_dir, "predictions.jsonl"))}
    assert p1 == p2 and len(p2) == 5
    rts = {r["question_id"]: r
           for r in read_jsonl(os.path.join(ecfg2.out_dir, "runtime.jsonl"))}
    assert rts["q0"]["batch_size"] == 2 and rts["q0"]["prefix_cached"]
    assert rts["q0"]["prefix_prefill_time"] > 0
    assert "prefix_prefill_time" not in rts["q1"]
    # the single-question video fell back to the per-sample path
    assert "batch_size" not in rts["q4"] and "prefix_cached" not in rts["q4"]


def test_prefix_batched_spec_decode_matches_per_sample(tmp_path):
    """--prefix_cache + batch_size 2 + spec_decode_k: all three serving
    levers through the harness; answers must match per-sample full prefill."""
    anno_path, feat_dir, meta_dir, annos = _benchmark(tmp_path)
    cfg = LlavaConfig(decoder=TINY, vision_hidden_size=16, vision_patches_per_side=6)
    dec_params = qwen2.init_params(TINY, jax.random.key(0))
    mm_params = llava.init_multimodal_params(cfg, jax.random.key(1))
    tok = MockTokenizer()
    dcfg = DataConfig("videomme", str(anno_path), str(feat_dir), str(meta_dir))

    ev = LlavaEvaluator(dec_params, TINY, cfg, mm_params, tok, _spec_factory)
    base = dict(dataset_name="videomme", max_new_tokens=4, pad_multiple=64,
                attention_impl="xla", eos_token_ids=())
    ecfg1 = EvalConfig(out_dir=str(tmp_path / "sper"), **base)
    ev.evaluate(FeatureVidQADataset(dcfg, tok), ecfg1, gts=annos)
    ecfg2 = EvalConfig(out_dir=str(tmp_path / "spfx"), prefix_cache=True,
                       batch_size=2, spec_decode_k=3, **base)
    ev.evaluate(FeatureVidQADataset(dcfg, tok), ecfg2, gts=annos)

    p1 = {r["question_id"]: r["answer"]
          for r in read_jsonl(os.path.join(ecfg1.out_dir, "predictions.jsonl"))}
    p2 = {r["question_id"]: r["answer"]
          for r in read_jsonl(os.path.join(ecfg2.out_dir, "predictions.jsonl"))}
    assert p1 == p2 and len(p2) == 5
    rts = {r["question_id"]: r
           for r in read_jsonl(os.path.join(ecfg2.out_dir, "runtime.jsonl"))}
    assert rts["q0"]["batch_size"] == 2 and rts["q0"]["prefix_cached"]
    assert rts["q0"]["spec_dispatches"] >= 1

    # cascade layout + spec decode through the harness (one shared prefix
    # copy, B*k verify dispatches) — same answers again
    ecfg3 = EvalConfig(out_dir=str(tmp_path / "cspfx"), prefix_cache=True,
                       batch_size=2, spec_decode_k=3, prefix_cascade=True,
                       **base)
    ev.evaluate(FeatureVidQADataset(dcfg, tok), ecfg3, gts=annos)
    p3 = {r["question_id"]: r["answer"]
          for r in read_jsonl(os.path.join(ecfg3.out_dir, "predictions.jsonl"))}
    assert p3 == p1


def test_prefix_cascade_matches_per_sample(tmp_path):
    """--prefix_cache + batch_size 2 + prefix_cascade: groups decode over ONE
    shared prefix cache (cascade KV layout); answers must still match the
    per-sample full-prefill path."""
    anno_path, feat_dir, meta_dir, annos = _benchmark(tmp_path)
    cfg = LlavaConfig(decoder=TINY, vision_hidden_size=16, vision_patches_per_side=6)
    dec_params = qwen2.init_params(TINY, jax.random.key(0))
    mm_params = llava.init_multimodal_params(cfg, jax.random.key(1))
    tok = MockTokenizer()
    dcfg = DataConfig("videomme", str(anno_path), str(feat_dir), str(meta_dir))

    ev = LlavaEvaluator(dec_params, TINY, cfg, mm_params, tok, _spec_factory)
    base = dict(dataset_name="videomme", max_new_tokens=4, pad_multiple=64,
                attention_impl="xla", eos_token_ids=())
    ecfg1 = EvalConfig(out_dir=str(tmp_path / "cper"), **base)
    ev.evaluate(FeatureVidQADataset(dcfg, tok), ecfg1, gts=annos)
    ecfg2 = EvalConfig(out_dir=str(tmp_path / "cpfx"), prefix_cache=True,
                       batch_size=2, prefix_cascade=True, **base)
    ev.evaluate(FeatureVidQADataset(dcfg, tok), ecfg2, gts=annos)

    p1 = {r["question_id"]: r["answer"]
          for r in read_jsonl(os.path.join(ecfg1.out_dir, "predictions.jsonl"))}
    p2 = {r["question_id"]: r["answer"]
          for r in read_jsonl(os.path.join(ecfg2.out_dir, "predictions.jsonl"))}
    assert p1 == p2 and len(p2) == 5
    rts = {r["question_id"]: r
           for r in read_jsonl(os.path.join(ecfg2.out_dir, "runtime.jsonl"))}
    assert rts["q0"]["batch_size"] == 2 and rts["q0"]["prefix_cached"]


def test_prefix_pooled_matches_per_sample(tmp_path):
    """--prefix_pool: videos pooled into one paged prefix pool, ALL
    questions served through one continuous pool — answers must match
    per-sample full prefill. vidA/vidC (4 frames) share a compile key and
    pool together; vidB (5 frames, different spec) pools alone."""
    anno_path, feat_dir, meta_dir, annos = _benchmark(tmp_path)
    cfg = LlavaConfig(decoder=TINY, vision_hidden_size=16, vision_patches_per_side=6)
    dec_params = qwen2.init_params(TINY, jax.random.key(0))
    mm_params = llava.init_multimodal_params(cfg, jax.random.key(1))
    tok = MockTokenizer()
    dcfg = DataConfig("videomme", str(anno_path), str(feat_dir), str(meta_dir))

    ev = LlavaEvaluator(dec_params, TINY, cfg, mm_params, tok, _spec_factory)
    base = dict(dataset_name="videomme", max_new_tokens=4, pad_multiple=64,
                attention_impl="xla", eos_token_ids=())
    ecfg1 = EvalConfig(out_dir=str(tmp_path / "pper"), **base)
    ev.evaluate(FeatureVidQADataset(dcfg, tok), ecfg1, gts=annos)
    ecfg2 = EvalConfig(out_dir=str(tmp_path / "ppool"), prefix_cache=True,
                       prefix_pool=2, batch_size=2, **base)
    ev.evaluate(FeatureVidQADataset(dcfg, tok), ecfg2, gts=annos)

    p1 = {r["question_id"]: r["answer"]
          for r in read_jsonl(os.path.join(ecfg1.out_dir, "predictions.jsonl"))}
    p2 = {r["question_id"]: r["answer"]
          for r in read_jsonl(os.path.join(ecfg2.out_dir, "predictions.jsonl"))}
    assert p1 == p2 and len(p2) == 5
    rts = {r["question_id"]: r
           for r in read_jsonl(os.path.join(ecfg2.out_dir, "runtime.jsonl"))}
    # vidA (q0, q1) and vidC (q4) are both 4-frame -> one 2-page pool
    assert rts["q0"]["pooled"] and rts["q0"]["pool_pages"] == 2
    assert rts["q4"]["pooled"] and rts["q4"]["pool_pages"] == 2
    # vidB (5 frames, its own spec) pools alone
    assert rts["q2"]["pooled"] and rts["q2"]["pool_pages"] == 1
    assert rts["q0"]["prefix_prefill_time"] > 0
    assert "prefix_prefill_time" not in rts["q1"]

    # spec decode through the pool: same answers again
    ecfg3 = EvalConfig(out_dir=str(tmp_path / "ppools"), prefix_cache=True,
                       prefix_pool=2, batch_size=2, spec_decode_k=3, **base)
    ev.evaluate(FeatureVidQADataset(dcfg, tok), ecfg3, gts=annos)
    p3 = {r["question_id"]: r["answer"]
          for r in read_jsonl(os.path.join(ecfg3.out_dir, "predictions.jsonl"))}
    assert p3 == p1
    rts3 = {r["question_id"]: r
            for r in read_jsonl(os.path.join(ecfg3.out_dir, "runtime.jsonl"))}
    assert rts3["q0"]["n_verify_dispatches"] >= 1


def test_cli_smoke_prefix_pool(tmp_path):
    """--prefix_pool drives the CLI end to end; gates reject bad combos."""
    import pytest

    from sttm_tpu.eval.run_vidqa import main as cli_main

    anno_path, feat_dir, meta_dir, _ = _benchmark(tmp_path)
    out_dir = tmp_path / "pool_cli"
    args = [
        "--dataset_name", "videomme",
        "--anno_filepath", str(anno_path), "--metadata_dir", str(meta_dir),
        "--smoke", "--max_new_tokens", "2",
        "--attention_impl", "xla", "--output_dir", str(out_dir),
        "--sa_pattern", "quadtree", "--sa_start_layer_idx", "1",
        "--sa_tree_thresh", "0.7", "--sa_tree_temporal_thresh", "0.6",
        "--model_name_or_path", "ckpts/tiny-llava",
        "--feature_dir", str(feat_dir), "--prefix_cache",
        "--prefix_pool", "2", "--batch_size", "2", "--pool_int8",
    ]
    cli_main(args)
    (run,) = os.listdir(out_dir)
    rows = read_jsonl(os.path.join(out_dir, run, "runtime.jsonl"))
    assert len(rows) == 5
    assert sum(1 for r in rows if r.get("pooled")) == 5
    assert all(r["pool_int8"] for r in rows if r.get("pooled"))

    with pytest.raises(SystemExit):  # pool excludes cascade
        cli_main(args + ["--prefix_cascade"])
    with pytest.raises(SystemExit):  # pool_int8 needs prefix_pool
        cli_main([a for a in args if a not in ("--prefix_pool", "2")])


def _qwen2vl_benchmark(tmp_path):
    """2 videos x 2 questions + 1 single-question video, qwen2vl feature
    layout ([t, gh/2, gw/2, C] + grid metadata pkl)."""
    import pickle

    from sttm_tpu.models.config import TINY_MROPE

    rng = np.random.default_rng(1)
    annos = []
    feat_dir = tmp_path / "qfeatures"
    meta_dir = tmp_path / "qmetadata"
    feat_dir.mkdir()
    meta_dir.mkdir()
    qid = 0
    for i, (vid, t, nq) in enumerate([("vidA", 4, 2), ("vidB", 6, 2), ("vidC", 4, 1)]):
        gh, gw = 4, 6
        np.save(feat_dir / f"{vid}.npy",
                rng.normal(size=(t, gh // 2, gw // 2, TINY_MROPE.hidden_size))
                .astype(np.float32) * 0.2)
        with open(meta_dir / f"{vid}.pkl", "wb") as fp:
            pickle.dump({"video_grid_thw": [t, gh, gw]}, fp)
        for j in range(nq):
            annos.append({
                "question_id": f"q{qid}", "videoID": vid,
                "question": f"What happens in part {j} of clip {i}?"[: 20 + 3 * j],
                "options": ["A. cat", "B. dog", "C. bird", "D. fish"],
                "answer": "A", "duration": "short", "domain": "test",
                "task_type": "tt",
            })
            qid += 1
    anno_path = tmp_path / "qannos.json"
    anno_path.write_text(json.dumps(annos))
    return anno_path, feat_dir, meta_dir, annos


def test_prefix_cached_qwen2vl_matches_per_sample(tmp_path):
    """Qwen2-VL family: prefix-cached eval (M-RoPE positions, 3D position
    gather through the merge) produces the same answers as per-sample."""
    from sttm_tpu.data.datasets import Qwen2VLFeatureDataset
    from sttm_tpu.eval.harness import Qwen2VLEvaluator
    from sttm_tpu.models.config import TINY_MROPE

    anno_path, feat_dir, meta_dir, annos = _qwen2vl_benchmark(tmp_path)
    params = qwen2.init_params(TINY_MROPE, jax.random.key(0))
    tok = MockTokenizer()
    dcfg = DataConfig("videomme", str(anno_path), str(feat_dir), str(meta_dir))

    ev = Qwen2VLEvaluator(params, TINY_MROPE, tok, _spec_factory)
    base = dict(dataset_name="videomme", max_new_tokens=3, pad_multiple=64,
                attention_impl="xla", eos_token_ids=())
    ecfg1 = EvalConfig(out_dir=str(tmp_path / "qper"), **base)
    ev.evaluate(Qwen2VLFeatureDataset(dcfg, tok), ecfg1, gts=annos)
    ecfg2 = EvalConfig(out_dir=str(tmp_path / "qpfx"), prefix_cache=True, **base)
    ev.evaluate(Qwen2VLFeatureDataset(dcfg, tok), ecfg2, gts=annos)

    p1 = {r["question_id"]: r["answer"]
          for r in read_jsonl(os.path.join(ecfg1.out_dir, "predictions.jsonl"))}
    p2 = {r["question_id"]: r["answer"]
          for r in read_jsonl(os.path.join(ecfg2.out_dir, "predictions.jsonl"))}
    assert p1 == p2 and len(p2) == 5
    rts = {r["question_id"]: r
           for r in read_jsonl(os.path.join(ecfg2.out_dir, "runtime.jsonl"))}
    assert all(rts[f"q{i}"].get("prefix_cached") for i in range(4))
    assert "prefix_cached" not in rts["q4"]
    s1 = {r["question_id"]: r["visual_merged_ratio"]
          for r in read_jsonl(os.path.join(ecfg1.out_dir, "prompt_stat.jsonl"))}
    s2 = {r["question_id"]: r["visual_merged_ratio"]
          for r in read_jsonl(os.path.join(ecfg2.out_dir, "prompt_stat.jsonl"))}
    assert s1 == s2


def test_cli_smoke_prefix_cache_qwen2vl(tmp_path):
    """--prefix_cache --model_family qwen2vl drives the CLI end to end."""
    from sttm_tpu.eval.run_vidqa import main as cli_main

    anno_path, feat_dir, meta_dir, _ = _qwen2vl_benchmark(tmp_path)
    out_dir = tmp_path / "qcli_out"
    cli_main([
        "--dataset_name", "videomme",
        "--anno_filepath", str(anno_path), "--metadata_dir", str(meta_dir),
        "--smoke", "--max_new_tokens", "2",
        "--attention_impl", "xla", "--output_dir", str(out_dir),
        "--sa_pattern", "quadtree", "--sa_start_layer_idx", "1",
        "--sa_tree_thresh", "0.7", "--sa_tree_temporal_thresh", "0.6",
        "--model_name_or_path", "ckpts/tiny-qwen2vl",
        "--feature_dir", str(feat_dir), "--model_family", "qwen2vl",
        "--prefix_cache",
    ])
    (run,) = os.listdir(out_dir)
    rows = read_jsonl(os.path.join(out_dir, run, "runtime.jsonl"))
    assert len(rows) == 5
    assert sum(1 for r in rows if r.get("prefix_cached")) == 4
