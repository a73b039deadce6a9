"""Qwen2-MoE trunk: HF parity, dispatch-mode exactness, expert parallelism.

The reference carries the (unused) llava_qwen_moe shim
(llava/model/language_model/llava_qwen_moe.py); our MoE trunk is a config
switch on the same stacked-scan decoder (models/moe.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "float32")

from sttm_tpu.models import qwen2
from sttm_tpu.models.config import TINY_MOE
from sttm_tpu.models.weights import params_from_state_dict
from sttm_tpu.runtime.generate import GenerateConfig, build_prefill, generate


@pytest.fixture(scope="module")
def hf_moe_pair():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    hf_cfg = Qwen2MoeConfig(
        vocab_size=TINY_MOE.vocab_size,
        hidden_size=TINY_MOE.hidden_size,
        intermediate_size=TINY_MOE.intermediate_size,
        num_hidden_layers=TINY_MOE.num_layers,
        num_attention_heads=TINY_MOE.num_heads,
        num_key_value_heads=TINY_MOE.num_kv_heads,
        rope_theta=TINY_MOE.rope_theta,
        rms_norm_eps=TINY_MOE.rms_eps,
        max_position_embeddings=TINY_MOE.max_position_embeddings,
        tie_word_embeddings=False,
        num_experts=TINY_MOE.num_experts,
        num_experts_per_tok=TINY_MOE.num_experts_per_tok,
        moe_intermediate_size=TINY_MOE.moe_intermediate_size,
        shared_expert_intermediate_size=TINY_MOE.shared_expert_intermediate_size,
        norm_topk_prob=TINY_MOE.norm_topk_prob,
        decoder_sparse_step=1,
        mlp_only_layers=[],
        attn_implementation="eager",
    )
    torch.manual_seed(7)
    hf = Qwen2MoeForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = params_from_state_dict(TINY_MOE, sd)
    return hf, params


def test_moe_params_layout(hf_moe_pair):
    _, params = hf_moe_pair
    lyr = params["layers"]
    l, e = TINY_MOE.num_layers, TINY_MOE.num_experts
    assert "wg" not in lyr and "router" in lyr
    assert lyr["router"].shape == (l, TINY_MOE.hidden_size, e)
    assert lyr["we_g"].shape == (l, e, TINY_MOE.hidden_size, TINY_MOE.moe_intermediate_size)
    assert lyr["we_d"].shape == (l, e, TINY_MOE.moe_intermediate_size, TINY_MOE.hidden_size)
    assert lyr["wsg"].shape == (l, TINY_MOE.hidden_size, 1)


def test_moe_prefill_matches_transformers(hf_moe_pair):
    import torch

    hf, params = hf_moe_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, TINY_MOE.vocab_size, size=(1, 33))
    with torch.no_grad():
        ref_logits = hf(torch.from_numpy(ids)).logits.numpy()

    s_full = 48
    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    embeds = jnp.pad(embeds, ((0, 0), (0, s_full - 33), (0, 0)))
    prefill = build_prefill(TINY_MOE, None, s_full, "xla")
    logits, cache = prefill(params, embeds, jnp.int32(33), jnp.int32(0))
    np.testing.assert_allclose(
        np.asarray(logits[0]), ref_logits[0, -1], rtol=2e-4, atol=2e-4
    )


def test_moe_decode_matches_transformers(hf_moe_pair):
    import torch

    hf, params = hf_moe_pair
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, TINY_MOE.vocab_size, size=(1, 17))
    with torch.no_grad():
        out = hf.generate(
            torch.from_numpy(prompt), max_new_tokens=8, do_sample=False,
            pad_token_id=0, eos_token_id=None,
        )
    ref_ids = out[0, 17:].tolist()

    embeds = qwen2.embed_tokens(params, jnp.asarray(prompt))
    embeds = jnp.pad(embeds, ((0, 0), (0, 32 - 17), (0, 0)))
    gen_ids, _ = generate(
        params, TINY_MOE, embeds, 17, 0, None,
        GenerateConfig(max_new_tokens=8, eos_token_ids=()),
    )
    assert gen_ids == ref_ids


def test_moe_gather_matches_dense(hf_moe_pair):
    """The decode-time top-k weight-gather dispatch is bit-comparable to the
    dense-masked form (same math, different data movement)."""
    from sttm_tpu.models.moe import moe_mlp

    _, params = hf_moe_pair
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.normal(size=(2, 3, TINY_MOE.hidden_size)) * 0.3, jnp.float32)
    y_dense = moe_mlp(lp, h, TINY_MOE, mode="dense")
    y_gather = moe_mlp(lp, h, TINY_MOE, mode="gather")
    np.testing.assert_allclose(
        np.asarray(y_dense), np.asarray(y_gather), rtol=1e-5, atol=1e-5
    )


def test_moe_sort_matches_dense(hf_moe_pair):
    """The dropless sorted ragged-dot dispatch matches the dense-masked form
    at prefill scale (same selected-expert math; different grouping and
    combine order, hence tolerance)."""
    from sttm_tpu.models.moe import moe_mlp

    _, params = hf_moe_pair
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    rng = np.random.default_rng(3)
    # enough tokens that every expert gets a non-trivial, uneven group
    h = jnp.asarray(rng.normal(size=(2, 37, TINY_MOE.hidden_size)) * 0.3, jnp.float32)
    y_dense = moe_mlp(lp, h, TINY_MOE, mode="dense")
    y_sort = moe_mlp(lp, h, TINY_MOE, mode="sort")
    np.testing.assert_allclose(
        np.asarray(y_dense), np.asarray(y_sort), rtol=1e-4, atol=1e-5
    )


def test_moe_sort_empty_expert_groups(hf_moe_pair):
    """Sort dispatch with few tokens: most experts get zero-size groups."""
    from sttm_tpu.models.moe import moe_mlp

    _, params = hf_moe_pair
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    rng = np.random.default_rng(4)
    h = jnp.asarray(rng.normal(size=(1, 1, TINY_MOE.hidden_size)) * 0.3, jnp.float32)
    y_dense = moe_mlp(lp, h, TINY_MOE, mode="dense")
    y_sort = moe_mlp(lp, h, TINY_MOE, mode="sort")
    np.testing.assert_allclose(
        np.asarray(y_dense), np.asarray(y_sort), rtol=1e-4, atol=1e-5
    )


def test_moe_expert_parallel_sharding(hf_moe_pair):
    """EP over the 8-device CPU mesh: one expert per device, prefill logits
    match the unsharded run (the expert-sum becomes a psum under the hood)."""
    from sttm_tpu.parallel.sharding import create_mesh, shard_params

    _, params = hf_moe_pair
    rng = np.random.default_rng(3)
    ids = rng.integers(0, TINY_MOE.vocab_size, size=(1, 21))
    s_full = 32
    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    embeds = jnp.pad(embeds, ((0, 0), (0, s_full - 21), (0, 0)))
    prefill = build_prefill(TINY_MOE, None, s_full, "xla")
    ref_logits, _ = prefill(params, embeds, jnp.int32(21), jnp.int32(0))

    mesh = create_mesh(dp=1, tp=1, ep=8)
    assert "ep" in mesh.axis_names
    sharded = shard_params(params, mesh)
    we_shard = sharded["layers"]["we_g"].sharding
    assert we_shard.spec[1] == "ep"
    logits, _ = prefill(sharded, embeds, jnp.int32(21), jnp.int32(0))
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )


def test_moe_random_init_generate_smoke():
    """init_params produces a runnable MoE trunk (dryrun/EP path)."""
    params = qwen2.init_params(TINY_MOE, jax.random.key(0))
    assert "router" in params["layers"] and "wg" not in params["layers"]
    rng = np.random.default_rng(4)
    emb = jnp.asarray(rng.normal(size=(1, 32, TINY_MOE.hidden_size)) * 0.2, jnp.float32)
    gen_ids, rt = generate(
        params, TINY_MOE, emb, 20, 0, None,
        GenerateConfig(max_new_tokens=4, eos_token_ids=()),
    )
    assert len(gen_ids) == 4


def test_moe_sp_prefill_matches_single_device(hf_moe_pair):
    """Sequence-parallel ring prefill supports the MoE trunk: last-token
    logits match the single-device prefill."""
    from sttm_tpu.parallel.ring import create_sp_mesh, sp_prefill

    _, params = hf_moe_pair
    rng = np.random.default_rng(5)
    valid, s_full = 29, 32
    emb = np.zeros((1, s_full, TINY_MOE.hidden_size), np.float32)
    emb[0, :valid] = rng.normal(size=(valid, TINY_MOE.hidden_size)) * 0.2
    emb = jnp.asarray(emb)

    prefill = build_prefill(TINY_MOE, None, s_full, "xla")
    ref_logits, _ = prefill(params, emb, jnp.int32(valid), jnp.int32(0))

    mesh = create_sp_mesh(8)
    logits, _, _ = sp_prefill(params, TINY_MOE, emb, jnp.int32(valid), mesh)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )
