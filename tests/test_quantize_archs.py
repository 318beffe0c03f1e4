"""End-to-end AWQ quantization across architectures.

For a representative subset of the zoo (one per structural family): build a
tiny HF model, quantize it with real calibration (scale + clip search),
round-trip through AutoAWQ-format save/load, and check the quantized model's
logits stay close to the fp model's (the same implicit gate the reference
applies via perplexity, awq/evaluation/eval_utils.py:22).
"""

import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from autoawq_tpu.api import AwqCausalLM
from autoawq_tpu.io.hf import params_from_state_dict
from autoawq_tpu.models.config import ModelConfig


def _tiny_hf(name):
    if name == "opt":
        from transformers import OPTConfig, OPTForCausalLM

        return OPTForCausalLM(
            OPTConfig(vocab_size=128, hidden_size=64, ffn_dim=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      max_position_embeddings=64, word_embed_proj_dim=64))
    if name == "bloom":
        from transformers import BloomConfig, BloomForCausalLM

        return BloomForCausalLM(
            BloomConfig(vocab_size=128, hidden_size=64, n_layer=2, n_head=4))
    if name == "gptj":
        from transformers import GPTJConfig, GPTJForCausalLM

        return GPTJForCausalLM(
            GPTJConfig(vocab_size=128, n_embd=64, n_layer=2, n_head=4,
                       rotary_dim=8, n_positions=64))
    if name == "falcon":
        from transformers import FalconConfig, FalconForCausalLM

        return FalconForCausalLM(
            FalconConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_kv_heads=2,
                         new_decoder_architecture=True, bias=False,
                         alibi=False, max_position_embeddings=64))
    if name == "deepseek_v2":
        from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

        return DeepseekV2ForCausalLM(
            DeepseekV2Config(vocab_size=128, hidden_size=64,
                             intermediate_size=128, moe_intermediate_size=64,
                             num_hidden_layers=2, num_attention_heads=4,
                             num_key_value_heads=4, n_routed_experts=4,
                             n_shared_experts=1, num_experts_per_tok=2,
                             first_k_dense_replace=1, q_lora_rank=64,
                             kv_lora_rank=32, qk_rope_head_dim=8,
                             qk_nope_head_dim=16, v_head_dim=16, head_dim=8,
                             topk_method="greedy",
                             max_position_embeddings=64, rope_scaling=None))
    if name == "cohere":
        from transformers import CohereConfig, CohereForCausalLM

        return CohereForCausalLM(
            CohereConfig(vocab_size=128, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=4,
                         max_position_embeddings=64, logit_scale=0.125))
    raise KeyError(name)


@pytest.mark.parametrize("arch", ["opt", "bloom", "gptj", "falcon", "cohere", "deepseek_v2"])
def test_quantize_roundtrip(arch, rng):
    torch.manual_seed(0)
    hf = _tiny_hf(arch).eval()
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    cfg = ModelConfig.from_hf_dict(hf.config.to_dict())
    params = params_from_state_dict(cfg, sd)

    model = AwqCausalLM(cfg, params)
    fp_logits = np.asarray(model(rng.integers(0, 128, (1, 16))))

    calib = rng.integers(0, 128, (4, 32))
    model.quantize(quant_config={"q_group_size": 32}, calib_data=calib,
                   progress=False)
    with tempfile.TemporaryDirectory() as d:
        model.save_quantized(d)
        m2 = AwqCausalLM.from_quantized(d)
    q_logits = np.asarray(m2(rng.integers(0, 128, (1, 16))))
    assert np.isfinite(q_logits).all()
    # same prompt comparison: quantized stays correlated with fp
    ids = rng.integers(0, 128, (1, 16))
    a = np.asarray(model(ids)).ravel()
    b = np.asarray(m2(ids)).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99, corr
