"""Synthetic-params coverage for the non-llama bench-table archs.

scripts/bench_table.py drives MPT-7B (ALiBi + LayerNorm + non-gated gelu)
and Falcon-7B (multi-query + parallel residual + shared input norm) shapes
through utils/synth.random_quantized_params -> serve.generate. These tests
pin the same path at tiny shapes: the synthetic tree must carry every leaf
the forward needs (fc1/fc2, LN biases) and the dispatched kernels must
match the jnp oracle token-for-token.

Reference rows being benched: /root/reference README.md:228 (MPT-7B),
README.md:231 (Falcon-7B).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.serve import generate as gen
from autoawq_tpu.utils.synth import random_quantized_params

ARCHS = {
    "mpt": dict(model_type="mpt", pos_embed="alibi", hidden_act="gelu",
                norm_kind="ln", gated_mlp=False, tie_word_embeddings=True,
                num_attention_heads=4, num_key_value_heads=4, head_dim=32),
    "falcon": dict(model_type="falcon", hidden_act="gelu", norm_kind="ln",
                   parallel_residual=True, shared_input_norm=True,
                   gated_mlp=False, tie_word_embeddings=True,
                   num_attention_heads=8, num_key_value_heads=1,
                   head_dim=32),
}


@pytest.mark.parametrize("arch", sorted(ARCHS))
def test_synth_generate_matches_jnp(arch):
    cfg = ModelConfig(vocab_size=512, hidden_size=128,
                      intermediate_size=256, num_hidden_layers=2,
                      max_position_embeddings=512, **ARCHS[arch])
    params = jax.device_put(random_quantized_params(
        cfg, seed=0, fp_dtype=jnp.float32, fused=True))
    # non-gated MLP must be emitted as fc1/fc2 (what nn/modules.mlp reads)
    mlp = params["layers"][0]["mlp"]
    assert set(mlp) == {"fc1", "fc2"}
    # LayerNorm archs carry bias leaves on every norm
    assert "bias" in params["layers"][0]["input_layernorm"]
    prompt = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 12)))
    out_auto = np.asarray(gen.generate_compiled(
        cfg, params, prompt, 8, method="auto", dtype=jnp.float32))
    out_jnp = np.asarray(gen.generate_compiled(
        cfg, params, prompt, 8, method="jnp", dtype=jnp.float32))
    np.testing.assert_array_equal(out_auto, out_jnp)
