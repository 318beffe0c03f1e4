"""HF logits-parity for every rope_scaling flavor the reference inherits
from transformers (explicit site: awq/models/phi3.py:118,
awq/modules/fused/block.py:500-525).

All tests run at sequence lengths PAST the original/pretraining context so
the scaled tables actually differ from the default ones — a parity test with
rope_scaling=None cannot catch a broken implementation (VERDICT r1 item 2).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from autoawq_tpu.io.hf import params_from_state_dict
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules

B = 2


def _run_parity(hf_config, hf_cls, s, atol=2e-3, rtol=2e-3):
    torch.manual_seed(0)
    model = hf_cls(hf_config).eval()
    ids = torch.randint(0, hf_config.vocab_size, (B, s))
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


def _llama_cfg(**kw):
    from transformers import LlamaConfig

    return LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, **kw)


def test_rope_llama3():
    """Every Llama-3.x checkpoint ships this (factor/low/high/original)."""
    from transformers import LlamaForCausalLM

    _run_parity(
        _llama_cfg(max_position_embeddings=64, rope_scaling={
            "rope_type": "llama3", "factor": 4.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0, "original_max_position_embeddings": 8,
        }),
        LlamaForCausalLM, s=24,
    )


def test_rope_linear():
    from transformers import LlamaForCausalLM

    _run_parity(
        _llama_cfg(max_position_embeddings=64,
                   rope_scaling={"rope_type": "linear", "factor": 4.0}),
        LlamaForCausalLM, s=24,
    )


def test_rope_dynamic_ntk():
    """seq_len (24) > max_position_embeddings (8) so the NTK base actually
    rescales; HF recomputes inv_freq at forward time with the same length."""
    from transformers import LlamaForCausalLM

    _run_parity(
        _llama_cfg(max_position_embeddings=8,
                   rope_scaling={"rope_type": "dynamic", "factor": 4.0}),
        LlamaForCausalLM, s=24,
    )


def test_rope_yarn():
    from transformers import LlamaForCausalLM

    _run_parity(
        _llama_cfg(max_position_embeddings=64, rope_scaling={
            "rope_type": "yarn", "factor": 4.0,
            "original_max_position_embeddings": 8,
        }),
        LlamaForCausalLM, s=24,
    )


def test_rope_longrope_phi3_long():
    """Phi-3-128k recipe: seq (24) > original_max (8) -> long factors +
    sqrt(1 + ln(factor)/ln(orig)) attention scaling."""
    from transformers import Phi3Config, Phi3ForCausalLM

    _run_parity(
        Phi3Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                   num_hidden_layers=2, num_attention_heads=4,
                   num_key_value_heads=4, pad_token_id=0,
                   max_position_embeddings=64,
                   original_max_position_embeddings=8,
                   rope_scaling={
                       "type": "longrope",
                       "short_factor": [1.0] * 8,
                       "long_factor": [1.0 + 0.5 * i for i in range(8)],
                   }),
        Phi3ForCausalLM, s=24,
    )


def test_rope_longrope_phi3_short():
    """Same checkpoint below the original context -> short factors (which
    still rescale attention, so this is not the default path)."""
    from transformers import Phi3Config, Phi3ForCausalLM

    _run_parity(
        Phi3Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                   num_hidden_layers=2, num_attention_heads=4,
                   num_key_value_heads=4, pad_token_id=0,
                   max_position_embeddings=64,
                   original_max_position_embeddings=32,
                   rope_scaling={
                       "type": "longrope",
                       "short_factor": [1.0 + 0.25 * i for i in range(8)],
                       "long_factor": [2.0] * 8,
                   }),
        Phi3ForCausalLM, s=12,
    )


def test_rope_yarn_deepseek_mscale():
    """DeepSeek-V2's yarn variant: mscale/mscale_all_dim feed the cos/sin
    attention factor (HF modeling_deepseek_v2.py applies it to freqs_cis)."""
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    _run_parity(
        DeepseekV2Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                         moe_intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=4,
                         n_routed_experts=4, n_shared_experts=1,
                         num_experts_per_tok=2, first_k_dense_replace=1,
                         q_lora_rank=None, kv_lora_rank=32,
                         qk_rope_head_dim=8, qk_nope_head_dim=16,
                         v_head_dim=16, head_dim=8, topk_method="greedy",
                         max_position_embeddings=64, rope_scaling={
                             "rope_type": "yarn", "factor": 4.0,
                             "original_max_position_embeddings": 8,
                             "mscale": 0.707, "mscale_all_dim": 0.707,
                             "beta_fast": 32, "beta_slow": 1,
                         }),
        DeepseekV2ForCausalLM, s=24,
    )


def test_rope_scaling_config_roundtrip():
    """rope_scaling survives to_hf_dict -> json -> from_hf_dict bit-exactly
    and stays hashable (cfg is a static jit arg)."""
    import json

    cfg = ModelConfig.from_hf_dict({
        "model_type": "llama", "max_position_embeddings": 64,
        "rope_scaling": {"rope_type": "longrope", "factor": 2.0,
                         "short_factor": [1.0, 2.0], "long_factor": [3.0, 4.0]},
    })
    hash(cfg)  # must not raise
    back = ModelConfig.from_hf_dict(json.loads(json.dumps(cfg.to_hf_dict())))
    assert back.rope_scaling == cfg.rope_scaling
    assert back.rope_scaling_dict["short_factor"] == [1.0, 2.0]
