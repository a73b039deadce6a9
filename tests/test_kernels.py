"""Pallas blocked cosine-similarity kernel (interpreter mode on CPU)."""

import jax
import numpy as np

import jax.numpy as jnp

from sttm_tpu.ops.kernels import cosine_rows


def test_cosine_rows_interpret_matches_jnp():
    rng = np.random.default_rng(0)
    for n, c in [(300, 128), (256, 384), (7, 256)]:  # incl. row padding cases
        a = jnp.asarray(rng.normal(size=(n, c)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(n, c)), jnp.bfloat16)
        ref = np.asarray(cosine_rows(a, b, force="jnp"))
        got = np.asarray(cosine_rows(a, b, force="interpret"))
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_cosine_rows_nd_shapes():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(4, 6, 5, 128)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(4, 6, 5, 128)), jnp.float32)
    ref = np.asarray(cosine_rows(a, b, force="jnp"))
    got = np.asarray(cosine_rows(a, b, force="interpret"))
    assert got.shape == (4, 6, 5)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_splash_mha_interpret_matches_xla():
    """GQA splash path (interpret mode) matches the XLA reference attention,
    including padding masking via segment ids."""
    from sttm_tpu.ops.attention import _splash_mha, _xla_mha

    rng = np.random.default_rng(0)
    b, sq, hq, hkv, hd = 1, 256, 8, 2, 64
    q = jnp.asarray(rng.normal(size=(b, sq, hq, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, sq, hkv, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, sq, hkv, hd)), jnp.float32)
    valid = jnp.int32(200)
    sm_scale = hd**-0.5
    ref = _xla_mha(q, k, v, valid, True, 0, sm_scale)
    out = _splash_mha(q, k, v, valid, sm_scale, interpret=True,
                      block_q=128, block_kv=128)
    # only valid rows are meaningful (pad queries are segment-masked)
    np.testing.assert_allclose(
        np.asarray(out)[:, :200], np.asarray(ref)[:, :200], rtol=2e-3, atol=2e-3
    )

def test_splash_mha_kv_compute_subblock_matches():
    """The kv-compute sub-block (block_kv_compute < block_kv, the swept
    production config's shape) is numerically identical."""
    from sttm_tpu.ops.attention import _splash_mha, _xla_mha

    rng = np.random.default_rng(1)
    b, sq, hq, hkv, hd = 1, 256, 8, 2, 64
    q = jnp.asarray(rng.normal(size=(b, sq, hq, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, sq, hkv, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, sq, hkv, hd)), jnp.float32)
    valid = jnp.int32(256)
    sm_scale = hd**-0.5
    ref = _xla_mha(q, k, v, valid, True, 0, sm_scale)
    out = _splash_mha(q, k, v, valid, sm_scale, interpret=True,
                      block_q=128, block_kv=256, block_kv_compute=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_splash_mha_seq_minor_layouts_match():
    """SEQ_MINOR K/V layouts (QK^T / PV with NN dim numbers — no in-kernel
    transpose) are numerically identical to the default HEAD_DIM_MINOR."""
    from sttm_tpu.ops.attention import _splash_mha, _xla_mha

    rng = np.random.default_rng(2)
    b, sq, hq, hkv, hd = 1, 256, 8, 2, 64
    q = jnp.asarray(rng.normal(size=(b, sq, hq, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, sq, hkv, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, sq, hkv, hd)), jnp.float32)
    valid = jnp.int32(200)
    sm_scale = hd**-0.5
    ref = _xla_mha(q, k, v, valid, True, 0, sm_scale)
    for ksm, vsm in ((True, False), (False, True), (True, True)):
        out = _splash_mha(q, k, v, valid, sm_scale, interpret=True,
                          block_q=128, block_kv=256, block_kv_compute=128,
                          k_seq_minor=ksm, v_seq_minor=vsm)
        np.testing.assert_allclose(
            np.asarray(out)[:, :200], np.asarray(ref)[:, :200],
            rtol=2e-3, atol=2e-3)


def test_splash_mha_fused_backward_matches_xla_grads():
    """bwd_blocks=True (the flash_train training path) must produce q/k/v
    gradients matching the XLA attention backward — the kernel's fused
    dq+dkv backward, no [H, S, S] score buffer in either direction."""
    from sttm_tpu.ops.attention import _splash_mha, _xla_mha

    rng = np.random.default_rng(4)
    b, s, hq, hkv, hd = 1, 256, 8, 2, 128
    q = jnp.asarray(rng.normal(size=(b, s, hq, hd)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, hkv, hd)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, hkv, hd)) * 0.3, jnp.float32)
    sm = hd**-0.5

    # full length AND a padded case (vl < s): the fused backward must respect
    # the segment-id masking too — compare grads on the valid prefix only
    # (pad-query grads are segment-masked and meaningless on both sides, and
    # the loss below only sums valid rows so pad K/V grads are zero).
    for valid in (s, 200):
        vl = jnp.int32(valid)

        def f_splash(q, k, v):
            o = _splash_mha(q, k, v, vl, sm, interpret=True, block_q=128,
                            block_kv=128, block_kv_compute=128,
                            bwd_blocks=True)
            return jnp.sum(o.astype(jnp.float32)[:, :valid] ** 2)

        def f_xla(q, k, v):
            o = _xla_mha(q, k, v, vl, True, 0, sm)
            return jnp.sum(o.astype(jnp.float32)[:, :valid] ** 2)

        g_s = jax.grad(f_splash, argnums=(0, 1, 2))(q, k, v)
        g_x = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g_s, g_x):
            a, b_ = a[:, :valid], b_[:, :valid]
            err = float(jnp.max(jnp.abs(a - b_))
                        / (float(jnp.max(jnp.abs(b_))) + 1e-9))
            assert err < 2e-3, (valid, err)


def test_residual_rmsq_bit_identical_to_unfused():
    """residual_rmsnorm_quantize_rows (one HBM pass for x+delta -> ln ->
    int8) must be BIT-identical to the two-op production path (bf16 add,
    then the rmsq kernel on the sum) — the kernel norms the rounded sum on
    purpose so swapping the fusion in cannot shift tokens."""
    from sttm_tpu.ops.kernels import (residual_rmsnorm_quantize_rows,
                                      rmsnorm_quantize_rows)

    rng = np.random.default_rng(3)
    n, k = 128, 512
    x = jnp.asarray(rng.normal(size=(1, n, k)), jnp.bfloat16)
    d = jnp.asarray(rng.normal(size=(1, n, k)) * 0.3, jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(k,)) * 0.1 + 1.0, jnp.bfloat16)
    for offset in (False, True):
        xo, q, s = residual_rmsnorm_quantize_rows(
            x, d, g, 1e-6, offset=offset, force="kernel")
        q_ref, s_ref = rmsnorm_quantize_rows(
            x + d, g, 1e-6, offset=offset, force="kernel")
        assert bool(jnp.all(xo == (x + d)))
        assert bool(jnp.all(q == q_ref))
        assert bool(jnp.all(s == s_ref))
    # XLA fallback path agrees within the documented +/-1-code class
    xo_f, q_f, s_f = residual_rmsnorm_quantize_rows(
        x, d, g, 1e-6, force="xla")
    assert bool(jnp.all(xo_f == (x + d)))
    q_k = residual_rmsnorm_quantize_rows(x, d, g, 1e-6, force="kernel")[1]
    assert int(jnp.max(jnp.abs(q_f.astype(jnp.int32)
                               - q_k.astype(jnp.int32)))) <= 1


def test_fuse_layer_projections_exact():
    """Fused wqkv/wgu (quant.fuse_layer_projections) must reproduce the
    unfused forward: same columns + same per-output-channel scales, so the
    int8 path is integer-exact and bf16 agrees to fp tolerance."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sttm_tpu.models import qwen2
    from sttm_tpu.models.config import TINY
    from sttm_tpu.models.quant import fuse_layer_projections, quantize_params

    cfg = dataclasses.replace(TINY, dtype=jnp.float32)
    params = qwen2.init_params(cfg, jax.random.key(0))
    fused = fuse_layer_projections(params)
    assert "wqkv" in fused["layers"] and "wq" not in fused["layers"]

    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, cfg.hidden_size)), jnp.float32)
    lp = jax.tree.map(lambda a: a[1], params["layers"])
    lpf = jax.tree.map(lambda a: a[1], fused["layers"])
    q0, k0, v0 = qwen2.qkv_proj(lp, x, cfg)
    q1, k1, v1 = qwen2.qkv_proj(lpf, x, cfg)
    np.testing.assert_allclose(np.asarray(q0), np.asarray(q1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(k0), np.asarray(k1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-5, atol=1e-5)
    m0 = qwen2.mlp_block(lp, x, cfg)
    m1 = qwen2.mlp_block(lpf, x, cfg)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(m1), rtol=1e-5, atol=1e-5)

    # int8 path: integer accumulation with identical scales -> exact match
    qparams = quantize_params(params, host=False)
    qcfg = dataclasses.replace(cfg, act_quant=True)
    qfused = fuse_layer_projections(qparams)
    lpq = jax.tree.map(lambda a: a[1], qparams["layers"])
    lpqf = jax.tree.map(lambda a: a[1], qfused["layers"])
    q0, k0, v0 = qwen2.qkv_proj(lpq, x, qcfg)
    q1, k1, v1 = qwen2.qkv_proj(lpqf, x, qcfg)
    np.testing.assert_array_equal(np.asarray(q0), np.asarray(q1))
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    m0 = qwen2.mlp_block(lpq, x, qcfg)
    m1 = qwen2.mlp_block(lpqf, x, qcfg)
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))

    # full generate() end-to-end: fused params produce the same tokens
    from sttm_tpu.runtime.generate import GenerateConfig, generate

    emb = jnp.asarray(np.random.default_rng(1).normal(size=(1, 64, cfg.hidden_size)) * 0.1, jnp.float32)
    gen = GenerateConfig(max_new_tokens=6, eos_token_ids=())
    ids0, _ = generate(params, cfg, emb, 40, 4, None, gen)
    ids1, _ = generate(fused, cfg, emb, 40, 4, None, gen)
    assert ids0 == ids1


def _assert_quant_close(q, s, q_ref, s_ref):
    """Cross-program quantize comparison: scales to 1 ulp (one program
    contracts /127 into a reciprocal multiply), codes off-by-one at exact
    rounding boundaries, both rare."""
    np.testing.assert_allclose(
        np.asarray(s), np.asarray(s_ref), rtol=1e-6, atol=0
    )
    diff = np.abs(np.asarray(q, np.int32) - np.asarray(q_ref, np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_quantize_rows_interpret_matches_xla():
    """Single-pass Pallas activation quantize (interpret mode) matches the
    XLA two-pass path up to cross-program rounding (same f32 math)."""
    from sttm_tpu.models.quant import quantize_act
    from sttm_tpu.ops.kernels import quantize_rows

    rng = np.random.default_rng(0)
    for n, k in [(64, 256), (96, 128), (128, 1024)]:
        x = jnp.asarray(rng.normal(size=(n, k)) * 3.0, jnp.bfloat16)
        q_ref, s_ref = quantize_act(x)
        q, s = quantize_rows(x, force="kernel")
        _assert_quant_close(q, s, q_ref, s_ref)


def test_quantize_rows_nd_and_fallback():
    from sttm_tpu.models.quant import quantize_act
    from sttm_tpu.ops.kernels import quantize_rows

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 48, 256)), jnp.bfloat16)
    q_ref, s_ref = quantize_act(x)
    q, s = quantize_rows(x, force="kernel")  # 96 rows -> bs 32
    assert q.shape == (2, 48, 256) and s.shape == (2, 48, 1)
    _assert_quant_close(q, s, q_ref, s_ref)
    # untileable shapes fall back to the XLA path transparently
    y = jnp.asarray(rng.normal(size=(7, 100)), jnp.bfloat16)
    q2, s2 = quantize_rows(y)
    q2_ref, s2_ref = quantize_act(y)
    _assert_quant_close(q2, s2, q2_ref, s2_ref)


def test_matmul_w8a8_kernel_flag_matches():
    from sttm_tpu.models.quant import matmul_w8a8, quantize_tensor

    rng = np.random.default_rng(2)
    w = quantize_tensor(jnp.asarray(rng.normal(size=(256, 128)), jnp.bfloat16))
    x = jnp.asarray(rng.normal(size=(64, 256)), jnp.bfloat16)
    a = np.asarray(matmul_w8a8(x, w))
    b = np.asarray(matmul_w8a8(x, w, kernel=True))
    np.testing.assert_array_equal(a, b)

def test_rmsnorm_quantize_rows_matches_two_op():
    """Fused rmsnorm+quantize kernel (interpret) matches the two-op path
    (rms_norm then quantize_act) up to f32-vs-bf16 intermediate rounding:
    codes within 1, scales within 1%, < 1% of codes differ."""
    from sttm_tpu.models.quant import quantize_act
    from sttm_tpu.models.qwen2 import rms_norm
    from sttm_tpu.ops.kernels import rmsnorm_quantize_rows

    rng = np.random.default_rng(2)
    for n, k, offset in [(64, 256, False), (96, 128, True)]:
        x = jnp.asarray(rng.normal(size=(n, k)) * 2.0, jnp.bfloat16)
        g = jnp.asarray(rng.normal(size=(k,)) * 0.1 + 1.0, jnp.bfloat16)
        q_ref, s_ref = quantize_act(rms_norm(x, g, 1e-6, offset))
        q, s = rmsnorm_quantize_rows(x, g, 1e-6, offset, force="kernel")
        # the fused kernel keeps the normed activations in f32 where the
        # two-op path rounds them to bf16 (ulp ~2^-9, HALF an int8 code
        # width for values near amax), so ~10% of codes legitimately shift
        # by +-1 — the kernel is the MORE accurate of the two. What matters
        # is the dequantized error staying inside the int8 bound.
        diff = np.abs(np.asarray(q, np.int32) - np.asarray(q_ref, np.int32))
        assert diff.max() <= 3 and (diff > 0).mean() < 0.15
        assert np.allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-2)  # two bf16 roundings in the 2-op path
        deq = np.asarray(q, np.float32) * np.asarray(s)
        deq_ref = np.asarray(q_ref, np.float32) * np.asarray(s_ref)
        denom = np.abs(deq_ref).max()
        assert np.abs(deq - deq_ref).max() / denom < 2.0 / 127
        # XLA fallback path is the exact two-op math
        q2, s2 = rmsnorm_quantize_rows(x, g, 1e-6, offset, force="xla")
        assert np.array_equal(np.asarray(q2), np.asarray(q_ref))
        assert np.allclose(np.asarray(s2), np.asarray(s_ref))


def test_matmul_w8a8_pre_matches_baseline():
    """Pre-quantized w8a8 GEMM (shared activation quantize) is bit-identical
    to matmul_w8a8 on the same quantized input."""
    from sttm_tpu.models.quant import (
        matmul_w8a8, matmul_w8a8_pre, quantize_act, quantize_tensor,
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(32, 128)), jnp.bfloat16)
    w = quantize_tensor(jnp.asarray(rng.normal(size=(128, 64)) * 0.05,
                                    jnp.bfloat16))
    ref = matmul_w8a8(x, w)
    xq, xs = quantize_act(x)
    out = matmul_w8a8_pre(xq, xs, w)
    assert np.array_equal(np.asarray(ref, np.float32),
                          np.asarray(out, np.float32))


def test_swiglu_quantize_rows_kernel_vs_fallback():
    """Fused SwiGLU+quantize (interpret mode) vs the two-op reference:
    codes within the bf16-rounding divergence class, dequantized error
    inside the int8 bound, scales tight."""
    from sttm_tpu.models.quant import quantize_act
    from sttm_tpu.ops.kernels import swiglu_quantize_rows

    rng = np.random.default_rng(4)
    for act in ("silu", "gelu_tanh"):
        g = jnp.asarray(rng.normal(size=(64, 256)) * 1.5, jnp.bfloat16)
        u = jnp.asarray(rng.normal(size=(64, 256)), jnp.bfloat16)
        if act == "silu":
            h = jax.nn.silu(g) * u
        else:
            h = jax.nn.gelu(g.astype(jnp.float32), approximate=True).astype(
                jnp.bfloat16) * u
        q_ref, s_ref = quantize_act(h)
        q, s = swiglu_quantize_rows(g, u, act=act, force="kernel")
        diff = np.abs(np.asarray(q, np.int32) - np.asarray(q_ref, np.int32))
        assert diff.max() <= 3 and (diff > 0).mean() < 0.15, act
        assert np.allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-2)
        deq = np.asarray(q, np.float32) * np.asarray(s)
        deq_ref = np.asarray(q_ref, np.float32) * np.asarray(s_ref)
        assert np.abs(deq - deq_ref).max() / np.abs(deq_ref).max() < 2.0 / 127


def test_matmul_w8a8_pre_ksplit_exact():
    """K-split contraction is EXACT vs the single int32 dot (integer adds
    commute); both against matmul_w8a8 on the same quantized input."""
    from sttm_tpu.models.quant import (
        matmul_w8a8_pre, quantize_act, quantize_tensor,
    )

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(16, 512)), jnp.bfloat16)
    w = quantize_tensor(jnp.asarray(rng.normal(size=(512, 64)) * 0.05,
                                    jnp.bfloat16))
    xq, xs = quantize_act(x)
    base = np.asarray(matmul_w8a8_pre(xq, xs, w), np.float32)
    for ks in (2, 4):
        out = np.asarray(matmul_w8a8_pre(xq, xs, w, k_splits=ks), np.float32)
        assert np.array_equal(base, out), ks


def test_fused_act_quant_prefill_parity():
    """act_quant='fused' prefill (fused producers + shared prequant +
    K-split down) vs act_quant=True on the TINY quantized model: logits
    within the int8-requantization tolerance, argmax tokens mostly equal
    (CPU fallback paths make the quantize math near-identical)."""
    import dataclasses

    from sttm_tpu.models import qwen2
    from sttm_tpu.models.config import TINY
    from sttm_tpu.models.quant import random_quantized_init

    cfg = dataclasses.replace(TINY, act_quant=True)
    params = random_quantized_init(cfg, jax.random.key(0), bits=8)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, 64, cfg.hidden_size)) * 0.3,
                    cfg.dtype)
    cos, sin = qwen2.rope_cos_sin(cfg, jnp.arange(64))

    def run(aq):
        c = dataclasses.replace(cfg, act_quant=aq)
        y, k, v = qwen2.prefill_layers(
            params["layers"], 0, c.num_layers, x, cos, sin, 64, c, "xla")
        return qwen2.lm_head(params, c, y)

    lg_base = np.asarray(run(True), np.float32)
    lg_fused = np.asarray(run("fused"), np.float32)
    scale = np.abs(lg_base).max()
    assert np.abs(lg_fused - lg_base).max() / scale < 0.05
    agree = (lg_base.argmax(-1) == lg_fused.argmax(-1)).mean()
    assert agree > 0.9, agree


def test_rope_scale_transpose_parity():
    """Fused rope+scale+GQA-transpose (interpret mode) vs the stock
    apply_rope -> reshape -> transpose chain: same values, both layouts."""
    from sttm_tpu.models.qwen2 import apply_rope
    from sttm_tpu.ops.kernels import rope_scale_transpose

    rng = np.random.default_rng(7)
    b, s, h, hkv, hd = 2, 64, 8, 2, 128
    q = jnp.asarray(rng.normal(size=(b, s, h, hd)), jnp.bfloat16)
    ang = rng.normal(size=(s, hd // 2))
    cos = jnp.asarray(np.cos(np.concatenate([ang, ang], -1)), jnp.float32)
    sin = jnp.asarray(np.sin(np.concatenate([ang, ang], -1)), jnp.float32)
    scale = hd ** -0.5
    ref = (apply_rope(q, cos, sin) * scale).reshape(
        b, s, hkv, h // hkv, hd).transpose(0, 2, 3, 1, 4)
    got = rope_scale_transpose(q, cos, sin, hkv, scale, force="kernel")
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)
    got_xla = rope_scale_transpose(q, cos, sin, hkv, scale, force="xla")
    np.testing.assert_allclose(np.asarray(got_xla, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_rope_qk_scale_transpose_parity():
    """Fused QK rope (one pass roping q AND k + q's scale/GQA transpose)
    vs the stock apply_rope chains — q in the splash layout, k in the
    cache layout, both exact."""
    from sttm_tpu.models.qwen2 import apply_rope
    from sttm_tpu.ops.kernels import rope_qk_scale_transpose

    rng = np.random.default_rng(8)
    b, s, h, hkv, hd = 2, 64, 8, 2, 128
    q = jnp.asarray(rng.normal(size=(b, s, h, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, hkv, hd)), jnp.bfloat16)
    ang = rng.normal(size=(s, hd // 2))
    cos = jnp.asarray(np.cos(np.concatenate([ang, ang], -1)), jnp.float32)
    sin = jnp.asarray(np.sin(np.concatenate([ang, ang], -1)), jnp.float32)
    scale = hd ** -0.5
    q_ref = (apply_rope(q, cos, sin) * scale).reshape(
        b, s, hkv, h // hkv, hd).transpose(0, 2, 3, 1, 4)
    k_ref = apply_rope(k, cos, sin)
    for force in ("kernel", "xla"):
        qf, kf = rope_qk_scale_transpose(q, k, cos, sin, hkv, scale,
                                         force=force)
        np.testing.assert_allclose(np.asarray(qf, np.float32),
                                   np.asarray(q_ref, np.float32),
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(kf, np.float32),
                                   np.asarray(k_ref, np.float32),
                                   rtol=2e-2, atol=2e-2)
