"""Ragged all-to-all EP MoE (ops/moe_a2a.py) vs the single-device grouped
oracle: with enough capacity nothing drops and the a2a dispatch must
reproduce ops/moe_gemm.moe_mlp exactly (up to f32 scatter order)."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn.fuse import fuse_model
from autoawq_tpu.utils.synth import random_quantized_params


def _stacked_experts(num_experts=8, hidden=256, inter=256):
    cfg = ModelConfig(
        model_type="mixtral", vocab_size=64, hidden_size=hidden,
        intermediate_size=inter, num_hidden_layers=1, num_attention_heads=4,
        num_key_value_heads=2, head_dim=64, num_experts=num_experts,
        num_experts_per_tok=2, max_position_embeddings=32)
    params = fuse_model(cfg, random_quantized_params(cfg, seed=9,
                                                     group_size=64))
    return cfg, params["layers"][0]["mlp"]["experts_stacked"]


def test_a2a_matches_grouped_oracle(rng, requires_multidevice):
    from autoawq_tpu.ops import moe_a2a, moe_gemm

    cfg, stacked = _stacked_experts()
    t, h, k = 32, cfg.hidden_size, cfg.num_experts_per_tok
    x = jnp.asarray(rng.standard_normal((t, h)).astype(np.float32))
    topi = jnp.asarray(rng.integers(0, cfg.num_experts, (t, k)))
    topw = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((t, k)).astype(np.float32)), -1)

    want = moe_gemm.moe_mlp(None, stacked, x, topw, topi, "silu",
                            cfg.intermediate_size, interpret=True)

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("expert",))
    with mesh:
        got = moe_a2a.moe_mlp_a2a(
            stacked, x, topw, topi, "silu", cfg.intermediate_size,
            mesh=mesh, capacity_factor=8.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_a2a_capacity_drop_is_graceful(rng, requires_multidevice):
    """Pathological routing (every token -> expert 0) overflows a tight
    capacity; dropped entries must zero out, not corrupt other tokens."""
    from autoawq_tpu.ops import moe_a2a

    cfg, stacked = _stacked_experts()
    t, h, k = 256, cfg.hidden_size, cfg.num_experts_per_tok
    x = jnp.asarray(rng.standard_normal((t, h)).astype(np.float32))
    topi = jnp.zeros((t, k), jnp.int32)
    topw = jnp.full((t, k), 1.0 / k, jnp.float32)

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("expert",))
    with mesh:
        out = moe_a2a.moe_mlp_a2a(
            stacked, x, topw, topi, "silu", cfg.intermediate_size,
            mesh=mesh, capacity_factor=1.0, interpret=True)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    # capacity 1.0 on all-to-one routing keeps at most D*cap of the T*k
    # entries; at least one token must have been dropped to zero
    assert (np.abs(out).sum(axis=1) == 0).any()
