"""Architecture parity vs HuggingFace transformers (torch CPU) as oracle.

For each supported architecture: build a tiny random HF model, convert its
state dict through io/hf, run our functional forward in fp32, and compare
logits. This is the strongest guard on the per-arch name maps, fused-qkv
permutations, norm/rope/activation variants, and residual topologies —
coverage the reference gets implicitly by reusing HF's module tree.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from autoawq_tpu.io.hf import params_from_state_dict
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules

B, S = 2, 12


def _run_parity(hf_config, hf_cls, atol=2e-3, rtol=2e-3):
    torch.manual_seed(0)
    model = hf_cls(hf_config).eval()
    ids = torch.randint(0, hf_config.vocab_size, (B, S))
    with torch.no_grad():
        ref = model(ids).logits.float().numpy()

    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    cfg = ModelConfig.from_hf_dict(hf_config.to_dict())
    params = params_from_state_dict(cfg, sd)
    ours = np.asarray(
        modules.forward(cfg, params, np.asarray(ids.numpy()), method="jnp",
                        dtype=np.float32)
    )
    assert ours.shape == ref.shape
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(ours / scale, ref / scale, atol=atol, rtol=rtol)


def test_parity_llama():
    from transformers import LlamaConfig, LlamaForCausalLM

    _run_parity(
        LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2, max_position_embeddings=64),
        LlamaForCausalLM,
    )


def test_parity_opt():
    from transformers import OPTConfig, OPTForCausalLM

    _run_parity(
        OPTConfig(vocab_size=128, hidden_size=64, ffn_dim=128,
                  num_hidden_layers=2, num_attention_heads=4,
                  max_position_embeddings=64, word_embed_proj_dim=64,
                  do_layer_norm_before=True),
        OPTForCausalLM,
    )


def test_parity_bloom():
    from transformers import BloomConfig, BloomForCausalLM

    _run_parity(
        BloomConfig(vocab_size=128, hidden_size=64, n_layer=2, n_head=4),
        BloomForCausalLM,
    )


def test_parity_gptj():
    from transformers import GPTJConfig, GPTJForCausalLM

    _run_parity(
        GPTJConfig(vocab_size=128, n_embd=64, n_layer=2, n_head=4,
                   rotary_dim=8, n_positions=64),
        GPTJForCausalLM,
    )


def test_parity_gpt_neox():
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    _run_parity(
        GPTNeoXConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      rotary_pct=0.25, max_position_embeddings=64,
                      use_parallel_residual=True),
        GPTNeoXForCausalLM,
    )


def test_parity_gpt_neox_sequential():
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    _run_parity(
        GPTNeoXConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      rotary_pct=1.0, max_position_embeddings=64,
                      use_parallel_residual=False),
        GPTNeoXForCausalLM,
    )


def test_parity_gpt_bigcode():
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    _run_parity(
        GPTBigCodeConfig(vocab_size=128, n_embd=64, n_layer=2, n_head=4,
                         n_positions=64, multi_query=True,
                         activation_function="gelu_pytorch_tanh"),
        GPTBigCodeForCausalLM,
    )


def test_parity_starcoder2():
    from transformers import Starcoder2Config, Starcoder2ForCausalLM

    _run_parity(
        Starcoder2Config(vocab_size=128, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=64, use_bias=True,
                         sliding_window=None),
        Starcoder2ForCausalLM,
    )


def test_parity_mpt():
    from transformers import MptConfig, MptForCausalLM
    from transformers.models.mpt.configuration_mpt import MptAttentionConfig

    _run_parity(
        MptConfig(vocab_size=128, d_model=64, n_layers=2, n_heads=4,
                  expansion_ratio=2, max_seq_len=64, no_bias=True,
                  attn_config=MptAttentionConfig(alibi=True)),
        MptForCausalLM,
    )


def test_parity_falcon_new_arch():
    from transformers import FalconConfig, FalconForCausalLM

    _run_parity(
        FalconConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, num_kv_heads=2,
                     new_decoder_architecture=True, parallel_attn=True,
                     bias=False, alibi=False, max_position_embeddings=64),
        FalconForCausalLM,
    )


def test_parity_falcon_7b_style():
    from transformers import FalconConfig, FalconForCausalLM

    _run_parity(
        FalconConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, multi_query=True,
                     new_decoder_architecture=False, parallel_attn=True,
                     bias=False, alibi=False, max_position_embeddings=64),
        FalconForCausalLM,
    )


def test_parity_cohere():
    from transformers import CohereConfig, CohereForCausalLM

    _run_parity(
        CohereConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=4, max_position_embeddings=64,
                     logit_scale=0.125, use_qk_norm=False),
        CohereForCausalLM,
    )


def test_parity_gemma2():
    from transformers import Gemma2Config, Gemma2ForCausalLM

    _run_parity(
        Gemma2Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, head_dim=16,
                     max_position_embeddings=64, attn_logit_softcapping=50.0,
                     final_logit_softcapping=30.0, query_pre_attn_scalar=16,
                     sliding_window=256),  # > S: windowing is a no-op both sides
        Gemma2ForCausalLM,
        atol=5e-3, rtol=5e-3,
    )


def test_parity_phi3():
    from transformers import Phi3Config, Phi3ForCausalLM

    _run_parity(
        Phi3Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                   num_hidden_layers=2, num_attention_heads=4,
                   num_key_value_heads=4, max_position_embeddings=64,
                   pad_token_id=0),
        Phi3ForCausalLM,
    )


def test_parity_qwen2():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    _run_parity(
        Qwen2Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2, max_position_embeddings=64),
        Qwen2ForCausalLM,
    )


def test_parity_gemma():
    from transformers import GemmaConfig, GemmaForCausalLM

    _run_parity(
        GemmaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2, head_dim=16,
                    max_position_embeddings=64,
                    hidden_activation="gelu_pytorch_tanh"),
        GemmaForCausalLM,
    )


def test_parity_stablelm():
    from transformers import StableLmConfig, StableLmForCausalLM

    _run_parity(
        StableLmConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, partial_rotary_factor=0.25,
                       max_position_embeddings=64,
                       use_parallel_residual=False),
        StableLmForCausalLM,
    )


def test_parity_deepseek_v2_lite():
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    _run_parity(
        DeepseekV2Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                         moe_intermediate_size=64, num_hidden_layers=3,
                         num_attention_heads=4, num_key_value_heads=4,
                         n_routed_experts=4, n_shared_experts=1,
                         num_experts_per_tok=2, first_k_dense_replace=1,
                         q_lora_rank=None, kv_lora_rank=32,
                         qk_rope_head_dim=8, qk_nope_head_dim=16,
                         v_head_dim=16, head_dim=8, topk_method="greedy",
                         max_position_embeddings=64, rope_scaling=None),
        DeepseekV2ForCausalLM,
    )


def test_parity_deepseek_v2_full():
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    _run_parity(
        DeepseekV2Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                         moe_intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=4,
                         n_routed_experts=8, n_shared_experts=2,
                         num_experts_per_tok=2, first_k_dense_replace=1,
                         q_lora_rank=48, kv_lora_rank=32,
                         qk_rope_head_dim=8, qk_nope_head_dim=16,
                         v_head_dim=16, head_dim=8,
                         topk_method="group_limited_greedy", n_group=4,
                         topk_group=2, routed_scaling_factor=1.5,
                         max_position_embeddings=64, rope_scaling=None),
        DeepseekV2ForCausalLM,
    )


def test_parity_deepseek_v3():
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    _run_parity(
        DeepseekV3Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                         moe_intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=4,
                         n_routed_experts=8, n_shared_experts=1,
                         num_experts_per_tok=2, first_k_dense_replace=1,
                         q_lora_rank=48, kv_lora_rank=32,
                         qk_rope_head_dim=8, qk_nope_head_dim=16,
                         v_head_dim=16, head_dim=8, n_group=4, topk_group=2,
                         norm_topk_prob=True, routed_scaling_factor=2.0,
                         max_position_embeddings=64, rope_scaling=None),
        DeepseekV3ForCausalLM,
    )


def test_parity_qwen3_moe():
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    _run_parity(
        Qwen3MoeConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                       moe_intermediate_size=64, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       head_dim=16, num_experts=4, num_experts_per_tok=2,
                       norm_topk_prob=True, max_position_embeddings=64,
                       decoder_sparse_step=1),
        Qwen3MoeForCausalLM,
    )


def test_parity_mixtral():
    from transformers import MixtralConfig, MixtralForCausalLM

    _run_parity(
        MixtralConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, num_local_experts=4,
                      num_experts_per_tok=2, max_position_embeddings=64,
                      sliding_window=None),
        MixtralForCausalLM,
    )
