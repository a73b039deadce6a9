"""Annotation converters, LoRA merge, slow-fast tokens, report CLI."""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from sttm_tpu.data.converters import (
    convert_longvideobench,
    convert_mlvu,
    convert_nextqa_mcq,
    convert_vnbench,
    duration_category,
)
from sttm_tpu.models.weights import merge_lora_state_dict


def test_convert_vnbench():
    annos = [{
        "video": "videos/abc.mp4", "try": 2, "question": "q?",
        "options": ["red", "blue", "green", "pink"], "gt_option": 1,
        "type": "ret_insert1", "needle_time": [3.0],
    }]
    out = convert_vnbench(annos, duration_fn=lambda v: 90.0)
    a = out[0]
    assert a["videoID"] == "abc" and a["question_id"] == "abc_try2"
    assert a["options"][1] == "B. blue."
    assert a["answer"] == "B" and a["duration"] == "medium"


def test_convert_mlvu_and_nextqa():
    mlvu = convert_mlvu(
        [{"video": "v1.mp4", "question": "q", "candidates": ["x", "y"], "answer": "y"}],
        task_type="plotQA", duration_fn=lambda v: 30.0,
    )
    assert mlvu[0]["video_id"] == "plotQA-v1" and mlvu[0]["answer"] == "B"
    assert mlvu[0]["question_id"] == "plotQA-v1-1"

    nq = convert_nextqa_mcq(
        [{"video": 42, "qid": 3, "question": "q", "a0": "p", "a1": "q", "a2": "r",
          "a3": "s", "a4": "t", "answer": 4, "type": "CW"}],
        duration_fn=lambda v: 200.0,
    )
    assert nq[0]["question_id"] == "42_3" and nq[0]["answer"] == "E"
    assert nq[0]["duration"] == "long"


def test_convert_lvb_edge_case():
    out = convert_longvideobench([{
        "video_id": "user@x-realvid", "id": "user@x-q7", "duration_group": 600,
        "question_category": "S2E", "question": "q", "candidates": ["a", "b"],
        "correct_choice": 0,
    }])
    assert out[0]["videoID"] == "realvid" and out[0]["question_id"] == "q7"
    assert out[0]["answer"] == "A"
    assert duration_category(59) == "short"


def test_lora_merge():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 6)).astype(np.float32)
    a = rng.normal(size=(2, 6)).astype(np.float32)
    b = rng.normal(size=(8, 2)).astype(np.float32)
    sd = {
        "base_model.model.model.layers.0.self_attn.q_proj.base_layer.weight": w,
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": a,
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": b,
        "model.norm.weight": np.ones(6, np.float32),
    }
    merged = merge_lora_state_dict(sd, alpha=4.0)
    key = "model.layers.0.self_attn.q_proj.weight"
    np.testing.assert_allclose(merged[key], w + 2.0 * (b @ a), rtol=1e-6)
    assert "model.norm.weight" in merged


def test_slowfast_tokens():
    from sttm_tpu.models.config import TINY
    from sttm_tpu.models.llava import LlavaConfig, build_slowfast_video_tokens

    cfg = LlavaConfig(decoder=TINY, vision_hidden_size=TINY.hidden_size,
                      vision_patches_per_side=8)
    rng = np.random.default_rng(0)
    t = 7
    feats = jnp.asarray(rng.normal(size=(t, 64, TINY.hidden_size)).astype(np.float32))
    nl = jnp.asarray(np.arange(TINY.hidden_size, dtype=np.float32))
    out = build_slowfast_video_tokens(feats, cfg, nl, slow_path_stride=4, slow_pool_stride=1)
    fast_pf = 4 * 5  # 4x4 pooled grid + newline per row
    slow_pf = 8 * 9  # unpooled 8x8 + newline per row
    assert out.shape == (2 * slow_pf + t * fast_pf, TINY.hidden_size)
    # first slow frame's tokens lead the sequence
    np.testing.assert_allclose(np.asarray(out[:8]), np.asarray(feats[0, :8]))


def test_report_cli(tmp_path):
    from sttm_tpu.eval.report_cli import main

    run = tmp_path / "run"
    run.mkdir()
    with open(run / "runtime.jsonl", "w") as fp:
        for i in range(3):
            fp.write(json.dumps({"question_id": f"q{i}", "ttft_llm": 0.5 + i,
                                 "time_decoding": 0.1, "num_dec_token": 4, "all": 1.0}) + "\n")
    with open(run / "prompt_stat.jsonl", "w") as fp:
        for i in range(3):
            fp.write(json.dumps({"question_id": f"q{i}", "visual_merged_ratio": 50.0,
                                 "input_merged_ratio": 60.0}) + "\n")
    main([str(run)])
    csv = (run / "runtime_summary.csv").read_text().splitlines()
    assert csv[0].startswith("n,ttft_llm")
    assert csv[1].startswith("3,1.5")
