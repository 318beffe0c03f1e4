"""Model forward vs HuggingFace transformers (torch CPU) as numerics oracle.

The reference framework reuses HF's graph outright, so matching HF logits on
random tiny models is exactly the parity bar for our own functional decoder.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from autoawq_tpu.io.hf import params_from_state_dict  # noqa: E402
from autoawq_tpu.models.config import ModelConfig  # noqa: E402
from autoawq_tpu.nn import modules  # noqa: E402


def hf_to_ours(model, hf_cfg):
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict())
    return cfg, params_from_state_dict(cfg, sd)


def run_both(model, hf_cfg, tokens):
    cfg, params = hf_to_ours(model, hf_cfg)
    with torch.no_grad():
        ref = model(torch.tensor(tokens)).logits.float().numpy()
    ours = np.asarray(modules.forward(cfg, params, jnp.asarray(tokens)))
    return ref, ours


TINY = dict(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=112,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=64,
    tie_word_embeddings=False,
)


def test_llama_forward_matches_hf(rng):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(**TINY)
    model = LlamaForCausalLM(hf_cfg).eval()
    tokens = rng.integers(0, 128, (2, 12))
    ref, ours = run_both(model, hf_cfg, tokens)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_llama_tied_embeddings(rng):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(1)
    hf_cfg = LlamaConfig(**{**TINY, "tie_word_embeddings": True})
    model = LlamaForCausalLM(hf_cfg).eval()
    model.tie_weights()
    tokens = rng.integers(0, 128, (1, 9))
    ref, ours = run_both(model, hf_cfg, tokens)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_qwen3_qk_norm_forward_matches_hf(rng):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(2)
    hf_cfg = Qwen3Config(**{**TINY, "head_dim": 16})
    model = Qwen3ForCausalLM(hf_cfg).eval()
    tokens = rng.integers(0, 128, (2, 7))
    ref, ours = run_both(model, hf_cfg, tokens)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_qwen2_bias_forward_matches_hf(rng):
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(3)
    hf_cfg = Qwen2Config(**TINY)  # qwen2 has qkv bias by default
    model = Qwen2ForCausalLM(hf_cfg).eval()
    tokens = rng.integers(0, 128, (1, 11))
    ref, ours = run_both(model, hf_cfg, tokens)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_mixtral_moe_forward_matches_hf(rng):
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(4)
    hf_cfg = MixtralConfig(
        **TINY, num_local_experts=4, num_experts_per_tok=2
    )
    model = MixtralForCausalLM(hf_cfg).eval()
    tokens = rng.integers(0, 128, (2, 6))
    ref, ours = run_both(model, hf_cfg, tokens)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_gemma2_forward_matches_hf(rng):
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(5)
    hf_cfg = Gemma2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=112,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=64,
        attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
        query_pre_attn_scalar=16,
        sliding_window=64,
    )
    model = Gemma2ForCausalLM(hf_cfg).eval()
    tokens = rng.integers(0, 128, (1, 8))
    ref, ours = run_both(model, hf_cfg, tokens)
    np.testing.assert_allclose(ours, ref, rtol=3e-3, atol=3e-3)


def test_phi3_fused_proj_forward_matches_hf(rng):
    from transformers import Phi3Config, Phi3ForCausalLM

    torch.manual_seed(6)
    hf_cfg = Phi3Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=112,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=64,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
    )
    model = Phi3ForCausalLM(hf_cfg).eval()
    tokens = rng.integers(0, 128, (2, 10))
    ref, ours = run_both(model, hf_cfg, tokens)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)
