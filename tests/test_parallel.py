"""GSPMD sharding invariance and LoRA training on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoawq_tpu.config import AwqConfig
from autoawq_tpu.io.hf import init_random_params
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules
from autoawq_tpu.parallel.mesh import build_mesh
from autoawq_tpu.parallel.specs import param_specs, shard_params
from autoawq_tpu.quantize.quantizer import quantize_linear_params
from autoawq_tpu.train import lora as lora_mod
from autoawq_tpu.utils.tree import iter_linears, set_by_path

# dims chosen so packed lanes shard cleanly over tensor=4:
# gate/up N=4096 -> N8=512 = 4*128; down K=4096 -> G=32 % 4 == 0
CFG = ModelConfig(
    model_type="llama",
    vocab_size=128,
    hidden_size=256,
    intermediate_size=4096,
    num_hidden_layers=1,
    num_attention_heads=8,
    num_key_value_heads=4,
    head_dim=32,
    max_position_embeddings=32,
)


def quantized_params(seed=0):
    params = init_random_params(CFG, seed=seed)
    qcfg = AwqConfig()
    for lp in params["layers"]:
        for path, p in list(iter_linears(lp)):
            set_by_path(lp, path, quantize_linear_params(p, qcfg))
    return params


def test_tp_sharded_forward_matches_single(rng, requires_multidevice):
    params = quantized_params()
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 8)))
    ref = modules.forward(CFG, params, tokens, method="jnp")

    mesh = build_mesh(tensor=4, data=2)
    with mesh:
        specs = param_specs(params, mesh)
        # the big MLP weights must actually shard (not fall back to replicate)
        mlp_spec = specs["layers"][0]["mlp"]["gate_proj"]["qweight"].spec
        assert mlp_spec == jax.sharding.PartitionSpec(None, "tensor"), mlp_spec
        down_spec = specs["layers"][0]["mlp"]["down_proj"]["qweight"].spec
        assert down_spec == jax.sharding.PartitionSpec("tensor", None), down_spec

        sharded = shard_params(params, mesh)
        out = jax.jit(lambda p, t: modules.forward(CFG, p, t, method="jnp"))(
            sharded, tokens
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_lora_training_decreases_loss(rng):
    params = quantized_params(seed=1)
    params = lora_mod.add_lora(CFG, params, rank=4)
    lora, base = lora_mod.split_lora(params)
    # adapters exist only where targeted, base kept quantized
    assert "lora_a" in lora["layers"][0]["self_attn"]["q_proj"]
    assert "qweight" in base["layers"][0]["self_attn"]["q_proj"]
    assert "lora_a" not in base["layers"][0]["self_attn"]["q_proj"]

    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 16)))
    step = jax.jit(
        lambda lora, t: lora_mod.lora_train_step(CFG, lora, base, t, lr=5e-2)
    )
    loss0, lora = step(lora, tokens)
    for _ in range(10):
        loss, lora = step(lora, tokens)
    assert float(loss) < float(loss0), (float(loss0), float(loss))


def test_lora_grad_flows_through_quantized_base(rng):
    """d loss / d lora_a must be nonzero -> custom VJP through int4 works."""
    params = quantized_params(seed=2)
    params = lora_mod.add_lora(CFG, params, rank=2)
    lora, base = lora_mod.split_lora(params)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 8)))
    grads = jax.grad(
        lambda l: lora_mod.causal_lm_loss(CFG, lora_mod.merge_lora(l, base),
                                          tokens)
    )(lora)
    # B is zero-initialized, so A's grad is 0 at step 0; B's grad is the
    # signal that the custom VJP propagated through the int4 matmul.
    gb = np.asarray(grads["layers"][0]["self_attn"]["q_proj"]["lora_b"])
    assert np.isfinite(gb).all() and np.abs(gb).max() > 0
