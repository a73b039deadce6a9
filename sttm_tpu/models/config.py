"""Model configurations for the supported decoder families.

Sizes match the HF checkpoints the reference evaluates
(README.md:10-13: LLaVA-Video-7B/72B, LLaVA-OneVision-7B, Qwen2-VL-7B — all
Qwen2-architecture decoders).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    head_dim: int = 128
    rope_theta: float = 1_000_000.0
    rms_eps: float = 1e-6
    max_position_embeddings: int = 32768
    # Linear RoPE scaling (position ids divided by this), the reference's
    # long-input lever (eval_vidqa_by_feat_llavavideo.py:88-97).
    rope_scaling_factor: float = 1.0
    tie_word_embeddings: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    # M-RoPE section sizes (Qwen2-VL only, modeling_qwen2vl.py mrope_section);
    # empty tuple = standard 1D RoPE.
    mrope_section: tuple = ()
    # QKV projection biases: True for the Qwen2 family, False for the Llama
    # family (Vicuna — the LLaVA-NeXT-Video trunk FrameFusion hooks into,
    # framefusion/models/llava_next_video/).
    attention_bias: bool = True
    # Dynamic per-token int8 activation quantization for the layer
    # projections (requires int8-quantized weights): runs matmuls on the
    # int8 MXU path at 2x bf16 peak. A serving-efficiency mode the reference
    # has no equivalent of; off by default. The string "kernel" additionally
    # quantizes activations with the single-pass Pallas kernel
    # (ops/kernels.py quantize_rows) instead of XLA's two-pass lowering.
    act_quant: bool | str = False
    # K-chunk count for the fused-path down_proj GEMM (int32-exact
    # accumulation; models/quant.py matmul_w8a8_pre). 0 = auto heuristic.
    # A/B-able because the isolated GEMM win (83.4% -> 89.2% of int8 peak,
    # BENCH_W8A8_TAIL.json) materializes an s32 intermediate that blocks
    # XLA's dequant epilogue fusion whole-model (PROFILE_PREFILL.json
    # fusion.389); 1 disables splitting.
    down_k_splits: int = 0
    # Architectural sliding-window attention (Mistral family): every query
    # attends only to the last ``sliding_window`` positions. 0 = dense. The
    # reference carries a llava_mistral shim (llava/model/language_model/
    # llava_mistral.py, unused by its experiments); here the window is one
    # config field reusing the StreamingLLM mask machinery (sinks=0).
    sliding_window: int = 0
    # Gemma-family architecture knobs (the reference's llava_gemma shim):
    # tanh-GELU MLP gate instead of SiLU, RMSNorm weights stored as (1 + w),
    # and sqrt(hidden_size) scaling of the token embeddings.
    hidden_act: str = "silu"
    rms_offset: bool = False
    embed_scale: bool = False
    # Sparse Mixture-of-Experts MLP (Qwen2-MoE family — the reference's
    # llava_qwen_moe shim, llava/model/language_model/llava_qwen_moe.py).
    # num_experts == 0 selects the dense MLP. When > 0, every layer is the
    # sparse block (HF decoder_sparse_step == 1, mlp_only_layers == [] — the
    # Qwen1.5-MoE-A2.7B configuration; non-uniform layouts are unsupported
    # by the stacked-layer scan and rejected at init).
    num_experts: int = 0
    num_experts_per_tok: int = 4
    moe_intermediate_size: int = 0
    shared_expert_intermediate_size: int = 0
    norm_topk_prob: bool = False
    # Expert dispatch: "auto" (gather for tiny N, dense otherwise — safe
    # under ep sharding), "dense", "gather", "sort" (dropless sorted
    # grouped-GEMM via lax.ragged_dot), or "gmm" (same layout through the
    # Pallas grouped-GEMM kernel, ops/gmm.py). sort/gmm: single-device
    # prefill only.
    moe_dispatch: str = "auto"

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim


# Qwen2-7B decoder (LLaVA-Video-7B / LLaVA-OneVision-7B backbones)
QWEN2_7B = DecoderConfig()

# Qwen2-72B decoder (LLaVA-Video-72B backbone)
QWEN2_72B = DecoderConfig(
    hidden_size=8192,
    intermediate_size=29568,
    num_layers=80,
    num_heads=64,
    num_kv_heads=8,
)

# Qwen2-VL-7B decoder: same trunk as Qwen2-7B plus M-RoPE
QWEN2VL_7B = DecoderConfig(mrope_section=(16, 24, 24))

# Vicuna-7B-v1.5 (Llama architecture): the LLaVA-NeXT-Video-7B backbone the
# reference's FrameFusion baselines hook (framefusion/models/llava_next_video/)
VICUNA_7B = DecoderConfig(
    vocab_size=32000,
    hidden_size=4096,
    intermediate_size=11008,
    num_layers=32,
    num_heads=32,
    num_kv_heads=32,
    rope_theta=10_000.0,
    rms_eps=1e-5,
    max_position_embeddings=4096,
    attention_bias=False,
)

# Mistral-7B-v0.1 (the llava_mistral shim's backbone): Llama architecture
# plus a 4096-token sliding attention window
MISTRAL_7B = DecoderConfig(
    vocab_size=32000,
    hidden_size=4096,
    intermediate_size=14336,
    num_layers=32,
    num_heads=32,
    num_kv_heads=8,
    rope_theta=10_000.0,
    rms_eps=1e-5,
    max_position_embeddings=32768,
    attention_bias=False,
    sliding_window=4096,
)

# Gemma-7B (the llava_gemma shim's backbone): decoupled head_dim (16 heads
# x 256 > hidden 3072), GeGLU, (1+w) RMSNorm, scaled + tied embeddings
GEMMA_7B = DecoderConfig(
    vocab_size=256000,
    hidden_size=3072,
    intermediate_size=24576,
    num_layers=28,
    num_heads=16,
    num_kv_heads=16,
    head_dim=256,
    rope_theta=10_000.0,
    rms_eps=1e-6,
    max_position_embeddings=8192,
    attention_bias=False,
    tie_word_embeddings=True,
    hidden_act="gelu_tanh",
    rms_offset=True,
    embed_scale=True,
)

# Qwen1.5-MoE-A2.7B (the llava_qwen_moe shim's backbone): 60 experts, top-4
# routing, SiLU shared expert with a sigmoid gate, every layer sparse
QWEN15_MOE_A27B = DecoderConfig(
    vocab_size=151936,
    hidden_size=2048,
    intermediate_size=5632,
    num_layers=24,
    num_heads=16,
    num_kv_heads=16,
    head_dim=128,
    max_position_embeddings=8192,
    num_experts=60,
    num_experts_per_tok=4,
    moe_intermediate_size=1408,
    shared_expert_intermediate_size=5632,
)

# Tiny config for CPU tests
TINY = DecoderConfig(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_layers=4,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    dtype=jnp.float32,
)

# Tiny Qwen2-MoE-architecture config (8 experts, top-2, shared expert)
TINY_MOE = dataclasses.replace(
    TINY, num_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
    shared_expert_intermediate_size=128, norm_topk_prob=False,
)

# mrope_section sums to head_dim/2 (Qwen2-VL convention: 16+24+24 == 128/2)
TINY_MROPE = dataclasses.replace(TINY, mrope_section=(2, 3, 3))

# Tiny Llama-architecture config (no QKV bias)
TINY_LLAMA = dataclasses.replace(TINY, attention_bias=False, rope_theta=10_000.0)

# Tiny Gemma-architecture config (GeGLU, (1+w) norms, scaled tied embeddings,
# decoupled head_dim)
TINY_GEMMA = dataclasses.replace(
    TINY_LLAMA, tie_word_embeddings=True, hidden_act="gelu_tanh",
    rms_offset=True, embed_scale=True, head_dim=24,
)
