"""Pipeline parallelism (parallel/pipeline.py) and sequence parallelism
(modules.forward activation_spec) on the 8-virtual-device CPU mesh.

The pipelined GPipe schedule must be a pure reorganization: forward
logits and LoRA training updates bit-match (to fp tolerance) the
sequential single-device path. Replaces-for-real: the reference's
accelerate layer pipeline (awq/models/base.py:453-458,
awq/modules/fused/model.py:98-100)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules
from autoawq_tpu.parallel import pipeline as pp
from autoawq_tpu.parallel.mesh import build_mesh
from autoawq_tpu.parallel.specs import shard_params
from autoawq_tpu.train import lora as lora_mod
from autoawq_tpu.utils.synth import random_quantized_params

CFG = ModelConfig(
    model_type="llama", vocab_size=256, hidden_size=128,
    intermediate_size=256, num_hidden_layers=8, num_attention_heads=4,
    num_key_value_heads=2, head_dim=32, max_position_embeddings=64)


def _params(seed=0):
    return random_quantized_params(CFG, seed=seed, fp_dtype=jnp.float32)


def test_pipeline_forward_matches_sequential(rng):
    params = _params()
    mesh = build_mesh(pipe=4, data=2)
    pparams = pp.to_pipeline(CFG, params, mesh)
    tokens = jnp.asarray(rng.integers(0, 256, (4, 16)))
    with mesh:
        got = jax.jit(lambda p, t: pp.pipeline_forward(
            CFG, p, t, mesh, n_microbatches=2))(pparams, tokens)
    ref = modules.forward(CFG, params, tokens, method="jnp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_microbatch_count_invariance(rng):
    """M=1 (no overlap) and M=4 (full microbatching) give identical
    logits — the schedule only changes utilization, not results."""
    params = _params()
    mesh = build_mesh(pipe=4, data=2)
    pparams = pp.to_pipeline(CFG, params, mesh)
    tokens = jnp.asarray(rng.integers(0, 256, (8, 8)))
    with mesh:
        a = jax.jit(lambda p, t: pp.pipeline_forward(
            CFG, p, t, mesh, n_microbatches=1))(pparams, tokens)
        b = jax.jit(lambda p, t: pp.pipeline_forward(
            CFG, p, t, mesh, n_microbatches=4))(pparams, tokens)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def _walk(tree, path=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, path + (k,))
        else:
            yield path + (k,), v


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def test_pipeline_lora_step_matches_sequential(rng):
    params = lora_mod.add_lora(CFG, _params(), rank=4, dtype=jnp.float32)
    tokens = jnp.asarray(rng.integers(0, 256, (4, 16)))

    lora0, base0 = lora_mod.split_lora(params)
    loss_ref, new_ref = lora_mod.lora_train_step(
        CFG, lora0, base0, tokens, lr=1e-2)

    mesh = build_mesh(pipe=4, data=2)
    pparams = pp.to_pipeline(CFG, params, mesh)
    lora, base = lora_mod.split_lora(pparams)
    with mesh:
        loss, new_lora = jax.jit(lambda l, b, t: pp.pipeline_lora_step(
            CFG, l, b, t, mesh, 2, lr=1e-2))(lora, base, tokens)

    assert abs(float(loss) - float(loss_ref)) < 1e-4
    for path, leaf in _walk(new_lora["layers_stacked"]):
        ref = jnp.stack([_get(lp, path) for lp in new_ref["layers"]])
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5, err_msg=str(path))


def test_stack_layers_rejects_heterogeneous():
    lo = {"mlp": {"kernel": np.zeros((4, 4))}}
    hi = {"mlp": {"kernel": np.zeros((4, 4)), "bias": np.zeros(4)}}
    with pytest.raises(ValueError, match="heterogeneous"):
        pp.stack_layers([lo, hi])


def test_stack_unstack_roundtrip():
    params = _params()
    stacked = pp.stack_layers(params["layers"])
    back = pp.unstack_layers(stacked, CFG.num_hidden_layers)
    for orig, rec in zip(params["layers"], back):
        for path, leaf in _walk(rec):
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(_get(orig, path)))


def test_sequence_parallel_forward_matches(rng):
    """Megatron-SP: residual stream seq-sharded over the tensor axis
    between blocks; logits identical to the replicated path."""
    cfg = ModelConfig(
        model_type="llama", vocab_size=512, hidden_size=256,
        intermediate_size=4096, num_hidden_layers=2, num_attention_heads=8,
        num_key_value_heads=4, head_dim=32, max_position_embeddings=64)
    params = random_quantized_params(cfg, seed=1, fp_dtype=jnp.float32)
    mesh = build_mesh(tensor=4, data=2)
    tokens = jnp.asarray(rng.integers(0, 512, (2, 32)))
    ref = modules.forward(cfg, params, tokens, method="jnp")
    with mesh:
        sharded = shard_params(params, mesh, dtype=jnp.float32)
        tk = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
        sp = NamedSharding(mesh, P("data", "tensor", None))
        got = jax.jit(lambda p, t: modules.forward(
            cfg, p, t, method="jnp", activation_spec=sp))(sharded, tk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


# --------------------------------------------------------------- PP x TP
def _tp_cfg():
    return ModelConfig(
        model_type="llama", vocab_size=256, hidden_size=128,
        intermediate_size=256, num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, head_dim=32, max_position_embeddings=64)


def test_pipeline_tp_forward_matches_sequential(rng):
    """pipe=2 x tensor=2 x data=2: Megatron TP inside every pipeline
    stage (local heads + psum'd row-parallel linears) must reproduce the
    sequential forward exactly."""
    from autoawq_tpu.io.hf import init_random_params

    cfg = _tp_cfg()
    params = init_random_params(cfg, seed=3, scale=0.08)
    mesh = build_mesh(pipe=2, tensor=2, data=2)
    pparams = pp.to_pipeline(cfg, params, mesh)
    tokens = jnp.asarray(rng.integers(0, 256, (4, 16)))
    with mesh:
        got = jax.jit(lambda p, t: pp.pipeline_forward(
            cfg, p, t, mesh, n_microbatches=2))(pparams, tokens)
    ref = modules.forward(cfg, params, tokens, method="jnp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_tp_quantized_forward(rng):
    """Quantized PP x TP: packed-planar LINs shard at superblock/group
    granularity inside the stage body (per-shard dequant matmul + psum)."""
    cfg = ModelConfig(
        model_type="llama", vocab_size=128, hidden_size=2048,
        intermediate_size=2048, num_hidden_layers=2,
        num_attention_heads=16, num_key_value_heads=16, head_dim=128,
        max_position_embeddings=32)
    params = random_quantized_params(cfg, seed=2, fp_dtype=jnp.float32)
    mesh = build_mesh(pipe=2, tensor=2, data=2)
    pparams = pp.to_pipeline(cfg, params, mesh)
    tokens = jnp.asarray(rng.integers(0, 128, (4, 8)))
    with mesh:
        got = jax.jit(lambda p, t: pp.pipeline_forward(
            cfg, p, t, mesh, n_microbatches=2))(pparams, tokens)
    ref = modules.forward(cfg, params, tokens, method="jnp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_tp_lora_step_matches_sequential(rng):
    """Pipelined + tensor-parallel LoRA training: loss and adapter
    updates match the sequential step (col-sharded lora_b, row-sharded
    lora_a partials ride the same psum)."""
    cfg = _tp_cfg()
    from autoawq_tpu.io.hf import init_random_params

    params = lora_mod.add_lora(
        cfg, init_random_params(cfg, seed=5, scale=0.08), rank=4,
        targets=("q_proj", "v_proj", "o_proj", "down_proj"),
        dtype=jnp.float32)
    tokens = jnp.asarray(rng.integers(0, 256, (4, 16)))
    lora0, base0 = lora_mod.split_lora(params)
    loss_ref, new_ref = lora_mod.lora_train_step(
        cfg, lora0, base0, tokens, lr=1e-2)

    mesh = build_mesh(pipe=2, tensor=2, data=2)
    pparams = pp.to_pipeline(cfg, params, mesh)
    lora, base = lora_mod.split_lora(pparams)
    with mesh:
        loss, new_lora = jax.jit(lambda l, b, t: pp.pipeline_lora_step(
            cfg, l, b, t, mesh, 2, lr=1e-2))(lora, base, tokens)
    assert abs(float(loss) - float(loss_ref)) < 1e-4
    for path, leaf in _walk(new_lora["layers_stacked"]):
        ref = jnp.stack([_get(lp, path) for lp in new_ref["layers"]])
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=str(path))


def test_pipeline_tp_rejects_unshardable(rng):
    """Manual TP must refuse layouts it cannot split: odd KV heads and
    MoE expert layouts raise instead of silently replicating."""
    from autoawq_tpu.io.hf import init_random_params

    mesh = build_mesh(pipe=2, tensor=2, data=2)
    bad = ModelConfig(
        model_type="llama", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=2,
        num_key_value_heads=1, head_dim=32, max_position_embeddings=32)
    with pytest.raises(ValueError, match="divide tensor"):
        pp.to_pipeline(bad, init_random_params(bad, seed=0), mesh)
    moe = ModelConfig(
        model_type="mixtral", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, head_dim=16, num_experts=4,
        num_experts_per_tok=2, max_position_embeddings=32)
    with pytest.raises(NotImplementedError, match="experts"):
        pp.to_pipeline(moe, init_random_params(moe, seed=0), mesh)


def test_pipeline_tp_moe_stacked_matches_sequential(rng):
    """Stacked quantized MoE under PP x TP: experts shard EXPERT-wise on
    the tensor axis (each shard masks routing to its contiguous expert
    block, grouped kernel on local experts, psum combines); the qwen2-moe
    gated shared expert Megatron-splits its intermediate."""
    from autoawq_tpu.nn.fuse import fuse_model

    cfg = ModelConfig(
        model_type="qwen2_moe", vocab_size=128, hidden_size=256,
        intermediate_size=512, num_hidden_layers=2,
        num_attention_heads=16, num_key_value_heads=16, head_dim=128,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=512,
        shared_expert_intermediate_size=2048, max_position_embeddings=32)
    params = fuse_model(cfg, random_quantized_params(cfg, seed=11,
                                                     fp_dtype=jnp.float32))
    assert "experts_stacked" in params["layers"][0]["mlp"]
    tokens = jnp.asarray(rng.integers(0, 128, (4, 8)))
    ref = modules.forward(cfg, params, tokens, method="jnp")
    mesh = build_mesh(pipe=2, tensor=2, data=2)
    pparams = pp.to_pipeline(cfg, params, mesh)
    with mesh:
        got = jax.jit(lambda p, t: pp.pipeline_forward(
            cfg, p, t, mesh, n_microbatches=2))(pparams, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_tp_mla_deepseek_matches_sequential(rng):
    """DeepSeek-shaped PP x TP: MLA attention (q_b/kv_b column-sharded
    over heads, shared latent projections replicated, o_proj row-psum) +
    stacked MoE + always-on shared experts in one quantized model."""
    from autoawq_tpu.nn.fuse import fuse_model

    cfg = ModelConfig(
        model_type="deepseek_v2", vocab_size=128, hidden_size=256,
        intermediate_size=512, num_hidden_layers=2,
        num_attention_heads=16, num_key_value_heads=16,
        q_lora_rank=256, kv_lora_rank=256, qk_nope_head_dim=64,
        qk_rope_head_dim=64, v_head_dim=64,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=1024,
        n_shared_experts=2, max_position_embeddings=32)
    assert cfg.is_mla and cfg.is_moe
    params = fuse_model(cfg, random_quantized_params(cfg, seed=13,
                                                     fp_dtype=jnp.float32))
    tokens = jnp.asarray(rng.integers(0, 128, (4, 8)))
    ref = modules.forward(cfg, params, tokens, method="jnp")
    mesh = build_mesh(pipe=2, tensor=2, data=2)
    pparams = pp.to_pipeline(cfg, params, mesh)
    with mesh:
        got = jax.jit(lambda p, t: pp.pipeline_forward(
            cfg, p, t, mesh, n_microbatches=2))(pparams, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_tp_reject_leaves_params_intact(rng):
    """A checkpoint rejected by TP validation (odd KV heads) must leave
    the caller's pytree untouched — validation runs BEFORE the in-place
    unfuse (ADVICE r3)."""
    cfg = ModelConfig(
        model_type="llama", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=2,
        num_key_value_heads=1, head_dim=32, max_position_embeddings=32)
    params = random_quantized_params(cfg, seed=0, fp_dtype=jnp.float32,
                                     fused=True)
    mesh = build_mesh(pipe=2, tensor=2, data=2)
    with pytest.raises(ValueError, match="divide tensor"):
        pp.to_pipeline(cfg, params, mesh)
    assert "qkv_proj" in params["layers"][0]["self_attn"]  # not unfused


def test_pipeline_tp_alibi_matches_sequential(rng):
    """ALiBi under PP x TP: the bias sheet shards on the head dim
    (each tensor shard scores its contiguous head slice)."""
    from autoawq_tpu.io.hf import init_random_params

    cfg = ModelConfig(
        model_type="bloom", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, head_dim=16, max_position_embeddings=32,
        pos_embed="alibi")
    params = init_random_params(cfg, seed=7, scale=0.08)
    mesh = build_mesh(pipe=2, tensor=2, data=2)
    pparams = pp.to_pipeline(cfg, params, mesh)
    tokens = jnp.asarray(rng.integers(0, 64, (4, 16)))
    with mesh:
        got = jax.jit(lambda p, t: pp.pipeline_forward(
            cfg, p, t, mesh, n_microbatches=2))(pparams, tokens)
    ref = modules.forward(cfg, params, tokens, method="jnp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_tp_fused_checkpoint_unfuses(rng):
    """A FUSED quantized checkpoint (qkv_proj / gate_up_proj) pipelines
    under stage-TP: to_pipeline unfuses the concatenated columns back to
    per-linear layouts (nn/fuse.unfuse_model) and matches the fused
    sequential forward."""
    from autoawq_tpu.nn.fuse import fuse_model

    cfg = ModelConfig(
        model_type="llama", vocab_size=128, hidden_size=2048,
        intermediate_size=2048, num_hidden_layers=2,
        num_attention_heads=16, num_key_value_heads=16, head_dim=128,
        max_position_embeddings=32)
    params = fuse_model(cfg, random_quantized_params(
        cfg, seed=2, fp_dtype=jnp.float32))
    tokens = jnp.asarray(rng.integers(0, 128, (4, 8)))
    ref = modules.forward(cfg, params, tokens, method="jnp")
    mesh = build_mesh(pipe=2, tensor=2, data=2)
    pparams = pp.to_pipeline(cfg, params, mesh)
    assert "q_proj" in params["layers"][0]["self_attn"]  # unfused in place
    with mesh:
        got = jax.jit(lambda p, t: pp.pipeline_forward(
            cfg, p, t, mesh, n_microbatches=2))(pparams, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
