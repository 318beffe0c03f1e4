"""Speculative decoding (serve/speculative.py): greedy output must equal
the target's own greedy stream token-for-token regardless of draft quality;
a self-draft must accept every proposal."""

import jax.numpy as jnp
import numpy as np
import pytest

from autoawq_tpu.io.hf import init_random_params
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.serve import generate as gen
from autoawq_tpu.serve.speculative import generate_speculative

TARGET = ModelConfig(
    model_type="llama", vocab_size=128, hidden_size=64,
    intermediate_size=128, num_hidden_layers=2, num_attention_heads=8,
    num_key_value_heads=2, head_dim=8, max_position_embeddings=128)
DRAFT = ModelConfig(
    model_type="llama", vocab_size=128, hidden_size=32,
    intermediate_size=64, num_hidden_layers=1, num_attention_heads=4,
    num_key_value_heads=4, head_dim=8, max_position_embeddings=128)


@pytest.mark.parametrize("k", [1, 3, 5])
def test_speculative_matches_greedy(rng, k):
    params = init_random_params(TARGET, seed=3)
    draft_params = init_random_params(DRAFT, seed=11)
    prompt = jnp.asarray(rng.integers(0, 128, (1, 9)))

    want = np.asarray(gen.generate_compiled(
        TARGET, params, prompt, 20, method="jnp", dtype=jnp.float32))
    got, stats = generate_speculative(
        TARGET, params, DRAFT, draft_params, prompt, 20, k=k,
        method="jnp", dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), want)
    assert 0.0 <= stats["accept_rate"] <= 1.0


def test_self_draft_accepts_everything(rng):
    """Draft == target: every proposal matches, so each round accepts k
    tokens and emits k+1."""
    params = init_random_params(TARGET, seed=4)
    prompt = jnp.asarray(rng.integers(0, 128, (1, 6)))
    got, stats = generate_speculative(
        TARGET, params, TARGET, params, prompt, 16, k=4,
        method="jnp", dtype=jnp.float32)
    want = np.asarray(gen.generate_compiled(
        TARGET, params, prompt, 16, method="jnp", dtype=jnp.float32))
    np.testing.assert_array_equal(np.asarray(got), want)
    assert stats["accept_rate"] == 1.0


def test_vocab_mismatch_rejected(rng):
    bad = ModelConfig(
        model_type="llama", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=1, num_attention_heads=4,
        num_key_value_heads=4, head_dim=8, max_position_embeddings=64)
    with pytest.raises(ValueError):
        generate_speculative(
            TARGET, init_random_params(TARGET, seed=1), bad,
            init_random_params(bad, seed=2),
            jnp.zeros((1, 4), jnp.int32), 4)
