"""End-to-end eval harness test: synthetic benchmark, tiny model, resume."""

import json
import os

import numpy as np
import pytest

import jax

from sttm_tpu.data.chat import IMAGE_TOKEN_INDEX
from sttm_tpu.data.datasets import DataConfig, FeatureVidQADataset
from sttm_tpu.eval.harness import EvalConfig, LlavaEvaluator, run_name
from sttm_tpu.eval.metrics import evaluate_predictions, extract_letter
from sttm_tpu.eval.reporting import read_jsonl, summarize_prompt_stat, summarize_runtime
from sttm_tpu.models import llava, qwen2
from sttm_tpu.models.config import TINY
from sttm_tpu.models.llava import LlavaConfig
from sttm_tpu.runtime.reducer import ReducerSpec


class MockTokenizer:
    """Maps characters to token ids; decode letters back."""

    def encode(self, text, add_special_tokens=False):
        return [ord(c) % 250 for c in text][:40]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(65 + (i % 26)) for i in ids[:3])


def test_extract_letter():
    assert extract_letter("The best answer is B.") == "B"
    assert extract_letter("(C)") == "C"
    assert extract_letter("I think the answer might be option D", "ABCD") == "D"
    assert extract_letter("no letter here at all in this very long response text ok") == ""


@pytest.fixture()
def synthetic_benchmark(tmp_path):
    rng = np.random.default_rng(0)
    annos = []
    feat_dir = tmp_path / "features"
    meta_dir = tmp_path / "metadata"
    feat_dir.mkdir()
    meta_dir.mkdir()
    for i in range(3):
        vid = f"vid{i}"
        annos.append({
            "question_id": f"q{i}", "videoID": vid,
            "question": f"What is shown {i}?",
            "options": ["A. cat", "B. dog", "C. bird", "D. fish"],
            "answer": "A", "duration": "short", "domain": "test", "task_type": "tt",
        })
        t = 4 + i  # varying frame counts exercise per-T specs
        np.save(feat_dir / f"{vid}.npy", rng.normal(size=(t, 36, 16)).astype(np.float32))
    anno_path = tmp_path / "annos.json"
    anno_path.write_text(json.dumps(annos))
    return anno_path, feat_dir, meta_dir, annos


def test_eval_end_to_end_with_resume(tmp_path, synthetic_benchmark):
    anno_path, feat_dir, meta_dir, annos = synthetic_benchmark
    cfg = LlavaConfig(decoder=TINY, vision_hidden_size=16, vision_patches_per_side=6)
    dec_params = qwen2.init_params(TINY, jax.random.key(0))
    mm_params = llava.init_multimodal_params(cfg, jax.random.key(1))
    tok = MockTokenizer()

    dcfg = DataConfig("videomme", str(anno_path), str(feat_dir), str(meta_dir))
    ds = FeatureVidQADataset(dcfg, tok)
    assert len(ds) == 3
    s0 = ds[0]
    assert s0["input_ids"].count(IMAGE_TOKEN_INDEX) == 1
    assert s0["frame_len"] == 4

    def spec_factory(t, h, w):
        return ReducerSpec(
            kind="quadtree", layer_idx=1, t=t, h=h, w=w, video_budget=t * h * w // 2,
            spatial_thresh=0.7, temporal_thresh=0.6, root_level=0,
        )

    ev = LlavaEvaluator(dec_params, TINY, cfg, mm_params, tok, spec_factory)
    ecfg = EvalConfig(
        out_dir=str(tmp_path / "out"), dataset_name="videomme",
        max_new_tokens=3, pad_multiple=64, attention_impl="xla",
        eos_token_ids=(),
    )
    result = ev.evaluate(ds, ecfg, gts=annos)
    assert result["n"] == 3
    assert 0.0 <= result["answered_ratio"] <= 100.0
    assert "short" in result["per_group"]["duration"]

    preds = read_jsonl(os.path.join(ecfg.out_dir, "predictions.jsonl"))
    assert len(preds) == 3
    rts = read_jsonl(os.path.join(ecfg.out_dir, "runtime.jsonl"))
    stats = read_jsonl(os.path.join(ecfg.out_dir, "prompt_stat.jsonl"))
    assert all(r["merged_len"] < r["full_len"] for r in rts)
    assert all(0 < s["visual_merged_ratio"] <= 100 for s in stats)
    assert os.path.exists(os.path.join(ecfg.out_dir, "accuracy.csv"))

    # resume: nothing new runs, results stable
    ds2 = FeatureVidQADataset(dcfg, tok, skip_qids={p["question_id"] for p in preds})
    assert len(ds2) == 0
    result2 = ev.evaluate(ds2, ecfg, gts=annos)
    assert result2["n"] == 3

    summary = summarize_runtime(rts)
    assert summary["n"] == 3 and summary["ttft_llm"] > 0
    assert "spec_accept_rate" not in summary  # no speculative rows here
    ps = summarize_prompt_stat(stats)
    assert 0 < ps["visual_merged_ratio"] <= 100

    spec_rows = [{"spec_drafted": 10, "spec_accepted": 4},
                 {"spec_drafted": 10, "spec_accepted": 2}]
    assert summarize_runtime(spec_rows)["spec_accept_rate"] == 0.3

    name = run_name("tiny", "videomme", spec_factory(4, 3, 3), 4)
    assert "quadtree" in name and "thr-0.7" in name


def test_eval_batched_matches_per_sample(tmp_path, synthetic_benchmark):
    """batch_size > 1: samples grouped by compile key decode together
    (head-packed batched serving) with answers identical to per-sample
    evaluation; runtime rows record the batch size."""
    anno_path, feat_dir, meta_dir, annos = synthetic_benchmark
    cfg = LlavaConfig(decoder=TINY, vision_hidden_size=16, vision_patches_per_side=6)
    dec_params = qwen2.init_params(TINY, jax.random.key(0))
    mm_params = llava.init_multimodal_params(cfg, jax.random.key(1))
    tok = MockTokenizer()
    dcfg = DataConfig("videomme", str(anno_path), str(feat_dir), str(meta_dir))

    def spec_factory(t, h, w):
        return ReducerSpec(
            kind="quadtree", layer_idx=1, t=t, h=h, w=w, video_budget=t * h * w // 2,
            spatial_thresh=0.7, temporal_thresh=0.6, root_level=0,
        )

    ev = LlavaEvaluator(dec_params, TINY, cfg, mm_params, tok, spec_factory)
    base = dict(dataset_name="videomme", max_new_tokens=3, pad_multiple=64,
                attention_impl="xla", eos_token_ids=(), frame_bucket=4)
    # frame counts 4/5/6 bucket to 4/8/8 -> q1+q2 share a compile key
    ecfg1 = EvalConfig(out_dir=str(tmp_path / "per"), **base)
    ev.evaluate(FeatureVidQADataset(dcfg, tok), ecfg1, gts=annos)
    ecfg2 = EvalConfig(out_dir=str(tmp_path / "bat"), batch_size=2, **base)
    ev.evaluate(FeatureVidQADataset(dcfg, tok), ecfg2, gts=annos)

    p1 = {r["question_id"]: r["answer"] for r in read_jsonl(os.path.join(ecfg1.out_dir, "predictions.jsonl"))}
    p2 = {r["question_id"]: r["answer"] for r in read_jsonl(os.path.join(ecfg2.out_dir, "predictions.jsonl"))}
    assert p1 == p2
    rts = read_jsonl(os.path.join(ecfg2.out_dir, "runtime.jsonl"))
    assert len(rts) == 3
    bs = {r["question_id"]: r["batch_size"] for r in rts}
    assert bs["q1"] == 2 and bs["q2"] == 2 and bs["q0"] == 1
    s2 = read_jsonl(os.path.join(ecfg2.out_dir, "prompt_stat.jsonl"))
    s1 = read_jsonl(os.path.join(ecfg1.out_dir, "prompt_stat.jsonl"))
    m1 = {r["question_id"]: r["visual_merged_ratio"] for r in s1}
    m2 = {r["question_id"]: r["visual_merged_ratio"] for r in s2}
    assert m1 == m2


def test_eval_batched_spec_decode_matches_per_sample(tmp_path, synthetic_benchmark):
    """batch_size > 1 + spec_decode_k: batched speculative decoding through
    the harness produces answers identical to per-sample evaluation."""
    anno_path, feat_dir, meta_dir, annos = synthetic_benchmark
    cfg = LlavaConfig(decoder=TINY, vision_hidden_size=16, vision_patches_per_side=6)
    dec_params = qwen2.init_params(TINY, jax.random.key(0))
    mm_params = llava.init_multimodal_params(cfg, jax.random.key(1))
    tok = MockTokenizer()
    dcfg = DataConfig("videomme", str(anno_path), str(feat_dir), str(meta_dir))

    def spec_factory(t, h, w):
        return ReducerSpec(
            kind="quadtree", layer_idx=1, t=t, h=h, w=w, video_budget=t * h * w // 2,
            spatial_thresh=0.7, temporal_thresh=0.6, root_level=0,
        )

    ev = LlavaEvaluator(dec_params, TINY, cfg, mm_params, tok, spec_factory)
    base = dict(dataset_name="videomme", max_new_tokens=4, pad_multiple=64,
                attention_impl="xla", eos_token_ids=(), frame_bucket=4)
    ecfg1 = EvalConfig(out_dir=str(tmp_path / "per"), **base)
    ev.evaluate(FeatureVidQADataset(dcfg, tok), ecfg1, gts=annos)
    ecfg2 = EvalConfig(out_dir=str(tmp_path / "bat"), batch_size=2,
                       spec_decode_k=3, **base)
    ev.evaluate(FeatureVidQADataset(dcfg, tok), ecfg2, gts=annos)

    p1 = {r["question_id"]: r["answer"] for r in read_jsonl(os.path.join(ecfg1.out_dir, "predictions.jsonl"))}
    p2 = {r["question_id"]: r["answer"] for r in read_jsonl(os.path.join(ecfg2.out_dir, "predictions.jsonl"))}
    assert p1 == p2
    rts = {r["question_id"]: r for r in read_jsonl(os.path.join(ecfg2.out_dir, "runtime.jsonl"))}
    assert rts["q1"]["batch_size"] == 2


def test_egoschema_submission():
    preds = [
        {"question_id": "a", "answer": "The best answer is B."},
        {"question_id": "b", "answer": "garbage with no valid letter at all xyz" * 3},
    ]
    out = evaluate_predictions("egoschema", preds)
    assert out["submission"] == {"a": 1, "b": -1}


def test_qwen2vl_eval_end_to_end(tmp_path):
    import pickle

    from sttm_tpu.data.datasets import Qwen2VLFeatureDataset
    from sttm_tpu.eval.harness import Qwen2VLEvaluator
    from sttm_tpu.models.config import TINY_MROPE

    rng = np.random.default_rng(0)
    feat_dir = tmp_path / "features"
    meta_dir = tmp_path / "metadata"
    feat_dir.mkdir(); meta_dir.mkdir()
    annos = []
    for i in range(2):
        vid = f"v{i}"
        t, gh, gw = 4, 4, 6  # llm grid 4 x 2 x 3
        np.save(feat_dir / f"{vid}.npy",
                rng.normal(size=(t, gh // 2, gw // 2, TINY_MROPE.hidden_size)).astype(np.float32))
        with open(meta_dir / f"{vid}.pkl", "wb") as fp:
            pickle.dump({"video_grid_thw": [t, gh, gw]}, fp)
        annos.append({
            "question_id": f"q{i}", "videoID": vid, "question": "What?",
            "options": ["A. x", "B. y", "C. z", "D. w"], "answer": "B",
            "duration": "short", "domain": "d", "task_type": "tt",
        })
    anno_path = tmp_path / "a.json"
    anno_path.write_text(json.dumps(annos))

    dcfg = DataConfig("videomme", str(anno_path), str(feat_dir), str(meta_dir))
    tok = MockTokenizer()
    ds = Qwen2VLFeatureDataset(dcfg, tok)
    s0 = ds[0]
    assert s0["feature"].shape[0] == 4 * 2 * 3
    assert s0["input_ids"].count(Qwen2VLFeatureDataset.VIDEO_PAD) == 24

    dec_params = qwen2.init_params(TINY_MROPE, jax.random.key(0))

    def spec_factory(t, h, w):
        return ReducerSpec(kind="quadtree", layer_idx=1, t=t, h=h, w=w,
                           video_budget=t * h * w // 2, spatial_thresh=0.6,
                           temporal_thresh=0.5, root_level=0)

    ev = Qwen2VLEvaluator(dec_params, TINY_MROPE, tok, spec_factory)
    ecfg = EvalConfig(out_dir=str(tmp_path / "out"), dataset_name="videomme",
                      max_new_tokens=2, pad_multiple=32, attention_impl="xla",
                      eos_token_ids=())
    result = ev.evaluate(ds, ecfg, gts=annos)
    assert result["n"] == 2
    rts = read_jsonl(os.path.join(ecfg.out_dir, "runtime.jsonl"))
    assert all(r["merged_len"] < r["full_len"] for r in rts)


def test_per_compile_key_warmup(tmp_path, synthetic_benchmark):
    """Warm-up runs once per NEW (s_full, spec) compile key, not once per
    eval: every new shape bucket would otherwise pollute its first timed
    ttft_llm with a fresh jit compile (reference intent:
    eval_vidqa_by_feat_llavavideo.py:220-231)."""
    anno_path, feat_dir, meta_dir, annos = synthetic_benchmark
    # make sample 3 share sample 0's frame count -> same compile key
    rng = np.random.default_rng(1)
    np.save(feat_dir / "vid3.npy", rng.normal(size=(4, 36, 16)).astype(np.float32))
    annos = annos + [{
        "question_id": "q3", "videoID": "vid3", "question": "What is shown 3?",
        "options": ["A. cat", "B. dog", "C. bird", "D. fish"],
        "answer": "A", "duration": "short", "domain": "test", "task_type": "tt",
    }]
    anno_path.write_text(json.dumps(annos))

    cfg = LlavaConfig(decoder=TINY, vision_hidden_size=16, vision_patches_per_side=6)
    dec_params = qwen2.init_params(TINY, jax.random.key(0))
    mm_params = llava.init_multimodal_params(cfg, jax.random.key(1))
    tok = MockTokenizer()
    dcfg = DataConfig("videomme", str(anno_path), str(feat_dir), str(meta_dir))
    ds = FeatureVidQADataset(dcfg, tok)
    assert len(ds) == 4

    def spec_factory(t, h, w):
        return ReducerSpec(kind="quadtree", layer_idx=1, t=t, h=h, w=w,
                           video_budget=t * h * w // 2, spatial_thresh=0.7,
                           temporal_thresh=0.6, root_level=0)

    calls = []

    class CountingEvaluator(LlavaEvaluator):
        def run_sample(self, sample, ecfg):
            calls.append(sample["id"])
            return super().run_sample(sample, ecfg)

    ev = CountingEvaluator(dec_params, TINY, cfg, mm_params, tok, spec_factory)
    ecfg = EvalConfig(out_dir=str(tmp_path / "out"), dataset_name="videomme",
                      max_new_tokens=2, pad_multiple=64, attention_impl="xla",
                      eos_token_ids=())
    ev.evaluate(ds, ecfg, gts=annos)
    # frame counts 4, 5, 6, 4: three unique keys -> 3 warm-ups + 4 timed runs
    assert len(calls) == 7
    # q3 (key seen at q0) gets NO extra warm-up
    assert calls.count("q3") == 1


def test_cli_smoke_both_families(tmp_path, synthetic_benchmark):
    """run_vidqa --smoke drives the full CLI path for both model families
    and produces predictions/runtime/prompt_stat JSONLs (reference entries:
    eval_vidqa_by_feat_llavavideo.py and eval_vidqa_by_feat_qwen2vl.py:158-222)."""
    import pickle

    from sttm_tpu.eval.run_vidqa import main as cli_main
    from sttm_tpu.models.config import TINY_MROPE

    anno_path, feat_dir, meta_dir, annos = synthetic_benchmark
    out_dir = tmp_path / "cli_out"
    common = [
        "--dataset_name", "videomme",
        "--anno_filepath", str(anno_path), "--metadata_dir", str(meta_dir),
        "--smoke", "--first_sample", "--max_new_tokens", "2",
        "--attention_impl", "xla", "--output_dir", str(out_dir),
        "--sa_pattern", "quadtree", "--sa_start_layer_idx", "1",
        "--sa_tree_thresh", "0.7", "--sa_tree_temporal_thresh", "0.6",
    ]
    cli_main(common + ["--model_name_or_path", "ckpts/tiny-llava",
                       "--feature_dir", str(feat_dir)])

    # qwen2vl family: features [t, gh/2, gw/2, C] + grid metadata
    rng = np.random.default_rng(0)
    qfeat_dir = tmp_path / "qfeat"
    qfeat_dir.mkdir()
    for a in annos:
        vid = a["videoID"]
        t, gh, gw = 4, 4, 6
        np.save(qfeat_dir / f"{vid}.npy",
                rng.normal(size=(t, gh // 2, gw // 2, TINY_MROPE.hidden_size)).astype(np.float32))
        with open(meta_dir / f"{vid}.pkl", "wb") as fp:
            pickle.dump({"video_grid_thw": [t, gh, gw]}, fp)
    cli_main(common + ["--model_name_or_path", "ckpts/tiny-qwen2vl",
                       "--feature_dir", str(qfeat_dir), "--model_family", "qwen2vl"])

    runs = sorted(os.listdir(out_dir))
    assert len(runs) == 2
    for run in runs:
        for f in ("predictions.jsonl", "runtime.jsonl", "prompt_stat.jsonl"):
            rows = read_jsonl(os.path.join(out_dir, run, f))
            assert len(rows) == 1, (run, f)


def test_cli_smoke_sp(tmp_path, synthetic_benchmark):
    """run_vidqa --sp 2 drives the sequence-parallel prefill path end-to-end
    (ring-attention prefill over a 2-device mesh, merge + decode on device 0)
    and produces the same JSONL outputs as the single-device path."""
    from sttm_tpu.eval.run_vidqa import main as cli_main

    anno_path, feat_dir, meta_dir, annos = synthetic_benchmark
    out_dir = tmp_path / "sp_out"
    cli_main([
        "--dataset_name", "videomme",
        "--anno_filepath", str(anno_path), "--metadata_dir", str(meta_dir),
        "--smoke", "--first_sample", "--max_new_tokens", "2",
        "--attention_impl", "xla", "--output_dir", str(out_dir),
        "--sa_pattern", "quadtree", "--sa_start_layer_idx", "1",
        "--sa_tree_thresh", "0.7", "--sa_tree_temporal_thresh", "0.6",
        "--model_name_or_path", "ckpts/tiny-llava",
        "--feature_dir", str(feat_dir), "--sp", "2",
    ])
    (run,) = os.listdir(out_dir)
    rows = read_jsonl(os.path.join(out_dir, run, "runtime.jsonl"))
    assert len(rows) == 1 and rows[0]["sp"] == 2


def test_cli_smoke_raw_video(tmp_path):
    """run_vidqa --input_mode video drives native decode -> tower -> eval
    (reference entry: eval_vidqa_by_video_llavavideo.py)."""
    from sttm_tpu import native

    if not native.available():
        pytest.skip("native decoder unavailable")
    from sttm_tpu.eval.run_vidqa import main as cli_main

    vids = tmp_path / "videos"
    vids.mkdir()
    native.encode_test_video(str(vids / "clip.mp4"), n=16, w=96, h=96, fps=8)
    annos = [{
        "question_id": "q0", "videoID": "clip", "question": "What?",
        "options": ["A. x", "B. y", "C. z", "D. w"], "answer": "A",
        "duration": "short", "domain": "d", "task_type": "t",
    }]
    anno_path = tmp_path / "a.json"
    anno_path.write_text(json.dumps(annos))
    out = tmp_path / "out"
    cli_main([
        "--model_name_or_path", "ck/tiny", "--dataset_name", "videomme",
        "--anno_filepath", str(anno_path), "--input_mode", "video",
        "--video_dir", str(vids), "--tgt_fps", "2", "--frames_upbound", "6",
        "--smoke", "--max_new_tokens", "2", "--attention_impl", "xla",
        "--output_dir", str(out), "--sa_pattern", "quadtree",
        "--sa_start_layer_idx", "1", "--sa_tree_thresh", "0.7",
        "--sa_tree_temporal_thresh", "0.6",
    ])
    run = os.listdir(out)[0]
    assert len(read_jsonl(os.path.join(out, run, "predictions.jsonl"))) == 1


def test_raw_video_evaluator(tmp_path):
    """Raw-video path: native decode -> tower -> pipeline, end to end."""
    from sttm_tpu import native

    if not native.available():
        pytest.skip("native decoder unavailable")
    from sttm_tpu.data.datasets import RawVideoVidQADataset
    from sttm_tpu.eval.harness import RawVideoLlavaEvaluator
    from sttm_tpu.models import siglip as sig

    vids = tmp_path / "videos"
    vids.mkdir()
    native.encode_test_video(str(vids / "clip.mp4"), n=20, w=64, h=64, fps=8)
    annos = [{
        "question_id": "q0", "videoID": "clip", "question": "What?",
        "options": ["A. x", "B. y", "C. z", "D. w"], "answer": "A",
        "duration": "short", "domain": "d", "task_type": "t",
    }]
    anno_path = tmp_path / "a.json"
    anno_path.write_text(json.dumps(annos))

    tiny_tower = sig.SiglipConfig(hidden_size=32, intermediate_size=64, num_layers=2,
                                  num_heads=4, image_size=28, patch_size=14,
                                  dtype=np.float32)
    tower_params = sig.init_siglip_params(tiny_tower, jax.random.key(0))
    cfg = LlavaConfig(decoder=TINY, vision_hidden_size=32, vision_patches_per_side=2,
                      spatial_pool_stride=1)
    dec_params = qwen2.init_params(TINY, jax.random.key(1))
    mm_params = llava.init_multimodal_params(cfg, jax.random.key(2))
    tok = MockTokenizer()

    dcfg = DataConfig("videomme", str(anno_path), "", "", add_time_instruction=True)
    ds = RawVideoVidQADataset(dcfg, tok, str(vids), tgt_fps=2, frames_upbound=6,
                              image_size=tiny_tower.image_size)
    ev = RawVideoLlavaEvaluator(
        dec_params, TINY, cfg, mm_params, tok,
        lambda t, h, w: ReducerSpec(kind="none", layer_idx=1, t=t, h=h, w=w),
        tower_params=tower_params, tower_cfg=tiny_tower, tower_chunk=4,
    )
    ecfg = EvalConfig(out_dir=str(tmp_path / "out"), dataset_name="videomme",
                      max_new_tokens=2, pad_multiple=32, attention_impl="xla",
                      eos_token_ids=(), warmup=False)
    result = ev.evaluate(ds, ecfg, gts=annos)
    assert result["n"] == 1


def test_frame_bucketing_exact_at_k0(tmp_path, synthetic_benchmark):
    """Repeat-padded frames merge into their source nodes: with merge layer 0,
    bucketed and unbucketed runs give identical merged lengths and tokens."""
    anno_path, feat_dir, meta_dir, annos = synthetic_benchmark
    cfg = LlavaConfig(decoder=TINY, vision_hidden_size=16, vision_patches_per_side=6)
    dec_params = qwen2.init_params(TINY, jax.random.key(0))
    mm_params = llava.init_multimodal_params(cfg, jax.random.key(1))
    tok = MockTokenizer()
    dcfg = DataConfig("videomme", str(anno_path), str(feat_dir), str(meta_dir))
    ds = FeatureVidQADataset(dcfg, tok)

    def spec_factory(t, h, w):
        return ReducerSpec(kind="quadtree", layer_idx=0, t=t, h=h, w=w,
                           video_budget=t * h * w, spatial_thresh=0.7,
                           temporal_thresh=0.6, root_level=0)

    ev = LlavaEvaluator(dec_params, TINY, cfg, mm_params, tok, spec_factory)
    base_cfg = EvalConfig(out_dir=str(tmp_path / "a"), dataset_name="videomme",
                          max_new_tokens=3, pad_multiple=64, attention_impl="xla",
                          eos_token_ids=(), warmup=False)
    bucket_cfg = EvalConfig(out_dir=str(tmp_path / "b"), dataset_name="videomme",
                            max_new_tokens=3, pad_multiple=64, attention_impl="xla",
                            eos_token_ids=(), warmup=False, frame_bucket=8)
    import jax.numpy as jnp2

    from sttm_tpu.runtime.generate import build_prefill

    for i in range(len(ds)):
        s = ds[i]
        outs = []
        for c in (base_cfg, bucket_cfg):
            embeds, valid, vstart, nv, spec, pos_base, t_valid = ev._prepare(
                s, c.pad_multiple, c.frame_bucket
            )
            fn = build_prefill(TINY, spec, embeds.shape[1], "xla")
            logits, cache = fn(
                ev.decoder_params, embeds, jnp2.int32(valid), jnp2.int32(vstart),
                None, None if pos_base is None else jnp2.int32(pos_base),
                None if t_valid is None else jnp2.int32(t_valid),
            )
            outs.append((np.asarray(logits), int(cache.merged_len)))
        (l0, m0), (l1, m1) = outs
        assert m0 == m1, s["id"]
        # t_valid fully excludes pad frames from the merge: exact at k=0
        np.testing.assert_allclose(l0, l1, rtol=1e-5, atol=1e-5)


def test_cli_smoke_framefusion_compact(tmp_path, synthetic_benchmark):
    """run_vidqa --sa_pattern framefusion with compaction drives the compact
    prefill (layers >= C at the budget length) through the full CLI path."""
    import json as _json

    from sttm_tpu.eval.run_vidqa import main as cli_main

    anno_path, feat_dir, meta_dir, annos = synthetic_benchmark
    out_dir = tmp_path / "cli_ff_compact"
    cli_main([
        "--dataset_name", "videomme",
        "--anno_filepath", str(anno_path), "--metadata_dir", str(meta_dir),
        "--smoke", "--first_sample", "--max_new_tokens", "2",
        "--attention_impl", "xla", "--output_dir", str(out_dir),
        "--sa_pattern", "framefusion", "--sa_framefusion_cost", "0.5",
        "--sa_framefusion_compact_layer", "3",
        "--model_name_or_path", "ckpts/tiny-llava",
        "--feature_dir", str(feat_dir),
    ])
    run_dirs = list(out_dir.iterdir())
    assert run_dirs, "no run dir created"
    rt_files = list(run_dirs[0].glob("*runtime*"))
    assert rt_files
    rows = [_json.loads(l) for l in rt_files[0].read_text().splitlines()]
    assert rows and any("compact_exact" in r for r in rows)


def test_cli_smoke_selfspec(tmp_path, synthetic_benchmark):
    """run_vidqa --spec_decode_k with --spec_draft_layers drives the fused
    layer-skip draft+verify path through the CLI; runtime rows carry the
    acceptance stats."""
    import json as _json

    from sttm_tpu.eval.run_vidqa import main as cli_main

    anno_path, feat_dir, meta_dir, annos = synthetic_benchmark
    out_dir = tmp_path / "cli_selfspec"
    cli_main([
        "--dataset_name", "videomme",
        "--anno_filepath", str(anno_path), "--metadata_dir", str(meta_dir),
        "--smoke", "--first_sample", "--max_new_tokens", "6",
        "--attention_impl", "xla", "--output_dir", str(out_dir),
        "--sa_pattern", "quadtree", "--sa_start_layer_idx", "1",
        "--sa_tree_thresh", "0.7", "--sa_tree_temporal_thresh", "0.6",
        "--spec_decode_k", "3", "--spec_draft_layers", "2",
        "--model_name_or_path", "ckpts/tiny-llava",
        "--feature_dir", str(feat_dir),
    ])
    run_dirs = list(out_dir.iterdir())
    rt_files = list(run_dirs[0].glob("*runtime*"))
    rows = [_json.loads(l) for l in rt_files[0].read_text().splitlines()]
    assert rows and any("spec_drafted" in r for r in rows)


def test_cli_smoke_kv_int8(tmp_path, synthetic_benchmark):
    """run_vidqa --kv_int8 drives the int8 live-KV decode through the CLI;
    rejects composition with --spec_decode_k."""
    import json as _json

    import pytest as _pytest

    from sttm_tpu.eval.run_vidqa import main as cli_main

    anno_path, feat_dir, meta_dir, annos = synthetic_benchmark
    out_dir = tmp_path / "cli_kv_int8"
    base = [
        "--dataset_name", "videomme",
        "--anno_filepath", str(anno_path), "--metadata_dir", str(meta_dir),
        "--smoke", "--first_sample", "--max_new_tokens", "5",
        "--attention_impl", "xla", "--output_dir", str(out_dir),
        "--sa_pattern", "quadtree", "--sa_start_layer_idx", "1",
        "--sa_tree_thresh", "0.7", "--sa_tree_temporal_thresh", "0.6",
        "--model_name_or_path", "ckpts/tiny-llava",
        "--feature_dir", str(feat_dir),
    ]
    cli_main(base + ["--kv_int8", "--decode_chunk_size", "3"])
    run_dir = next(iter(out_dir.iterdir()))
    pred = run_dir / "predictions.jsonl"
    rows = [_json.loads(l) for l in pred.read_text().splitlines()]
    assert rows and rows[0]["answer"] is not None

    with _pytest.raises(SystemExit, match="kv_int8"):
        cli_main(base + ["--kv_int8", "--prefix_cache"])


def test_cli_smoke_sampling(tmp_path, synthetic_benchmark):
    """run_vidqa --temperature/--top_p drives sampled decoding through the
    CLI (per-sample path); same seed is replay-deterministic."""
    import json as _json

    from sttm_tpu.eval.run_vidqa import main as cli_main

    anno_path, feat_dir, meta_dir, annos = synthetic_benchmark

    def run(tag):
        out_dir = tmp_path / tag
        cli_main([
            "--dataset_name", "videomme",
            "--anno_filepath", str(anno_path), "--metadata_dir", str(meta_dir),
            "--smoke", "--first_sample", "--max_new_tokens", "4",
            "--attention_impl", "xla", "--output_dir", str(out_dir),
            "--sa_pattern", "quadtree", "--sa_start_layer_idx", "1",
            "--sa_tree_thresh", "0.7", "--sa_tree_temporal_thresh", "0.6",
            "--temperature", "1.3", "--top_p", "0.9", "--sample_seed", "5",
            "--model_name_or_path", "ckpts/tiny-llava",
            "--feature_dir", str(feat_dir),
        ])
        run_dir = next(iter(out_dir.iterdir()))
        pred = run_dir / "predictions.jsonl"
        return [_json.loads(l) for l in pred.read_text().splitlines()]

    a, b = run("cli_sample_a"), run("cli_sample_b")
    assert a and a[0]["answer"] == b[0]["answer"]
