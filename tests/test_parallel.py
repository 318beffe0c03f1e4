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


def test_tp_sharded_forward_matches_single_kernel_path(rng, requires_multidevice):
    """Same invariance through the PARTITIONED Pallas kernel
    (ops/sharded_gemm.py, interpret mode on the CPU mesh): column-parallel
    runs shard-local, row-parallel psums — no int4 all-gather."""
    params = quantized_params()
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 8)))
    ref = modules.forward(CFG, params, tokens, method="jnp")

    mesh = build_mesh(tensor=4, data=2)
    with mesh:
        sharded = shard_params(params, mesh)
        out = jax.jit(
            lambda p, t: modules.forward(CFG, p, t, method="pallas")
        )(sharded, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_sharded_gemm_col_row_matmul(rng, requires_multidevice):
    """Direct col-/row-/replicated-parallel awq_matmul_sharded vs the jnp
    oracle, including output shardings (col stays sharded, row psums)."""
    from autoawq_tpu.ops.gemm import awq_matmul_jnp
    from autoawq_tpu.ops.sharded_gemm import awq_matmul_sharded
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = build_mesh(tensor=4, data=2)

    def run(k, n, spec):
        w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
        p = quantize_linear_params({"kernel": jnp.asarray(w)}, AwqConfig())
        x = jnp.asarray(rng.standard_normal((8, k)).astype(np.float32))
        ref = awq_matmul_jnp(x, p["qweight"], p["scales"], p["qzeros"],
                             out_features=n)
        with mesh:
            args = [
                jax.device_put(x, NamedSharding(mesh, P("data", None))),
                jax.device_put(p["qweight"], NamedSharding(mesh, spec)),
                jax.device_put(p["scales"], NamedSharding(mesh, spec)),
                jax.device_put(p["qzeros"], NamedSharding(mesh, spec)),
            ]
            out = jax.jit(
                lambda *a: awq_matmul_sharded(
                    *a, out_features=n, interpret=True)
            )(*args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        return out.sharding.spec

    col = run(256, 4096, P(None, "tensor"))
    assert col == P("data", "tensor"), col
    row = run(4096, 256, P("tensor", None))
    assert row[1:] in ((), (None,)), row
    run(256, 256, P())  # replicated weights on a mesh


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


def test_expert_parallel_stacked_moe(rng, requires_multidevice):
    """Expert-parallel grouped MoE (ops/sharded_moe.py): stacked experts
    sharded on the ``expert`` axis, masked-local compute + psum == the
    dense per-expert oracle."""
    import copy

    from autoawq_tpu.nn.fuse import fuse_model
    from autoawq_tpu.utils.synth import random_quantized_params

    moe_cfg = ModelConfig(
        model_type="mixtral", vocab_size=64, hidden_size=256,
        intermediate_size=256, num_hidden_layers=1, num_attention_heads=4,
        num_key_value_heads=2, head_dim=64, num_experts=4,
        num_experts_per_tok=2, max_position_embeddings=32)
    params = random_quantized_params(moe_cfg, seed=7, group_size=64)
    tokens = jnp.asarray(rng.integers(0, 64, (2, 8)))
    ref = modules.forward(moe_cfg, params, tokens, method="jnp",
                          dtype=np.float32)

    stacked = fuse_model(moe_cfg, copy.deepcopy(params))
    mesh = build_mesh(tensor=2, expert=2, data=2)
    with mesh:
        sharded = shard_params(stacked, mesh)
        st = sharded["layers"][0]["mlp"]["experts_stacked"]
        spec = st["gate_up_proj"]["qweight"].sharding.spec
        assert spec == jax.sharding.PartitionSpec("expert"), spec
        out = jax.jit(
            lambda p, t: modules.forward(moe_cfg, p, t, method="jnp",
                                         dtype=np.float32)
        )(sharded, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


def test_hybrid_mesh_shapes(requires_multidevice):
    """hybrid_mesh produces the (data, expert, tensor) axes with DCN-major
    data ordering; single-process case covers the ici-only branch."""
    from autoawq_tpu.parallel.distributed import hybrid_mesh

    mesh = hybrid_mesh(tensor=2, expert=2)
    assert mesh.axis_names == ("data", "expert", "tensor")
    assert mesh.shape["tensor"] == 2 and mesh.shape["expert"] == 2
    assert mesh.shape["data"] == jax.device_count() // 4

    # explicit dcn factor splits the data axis without changing its size
    mesh2 = hybrid_mesh(tensor=2, expert=1, dcn_data=2)
    assert mesh2.shape["data"] == jax.device_count() // 2


def test_data_parallel_calibration_matches_single(rng, requires_multidevice):
    """DP calibration (SURVEY §2.6): sharding the calib batch over the
    ``data`` axis must reproduce the single-device AWQ search — same scales,
    same clips, same packed weights (GSPMD psums replace nothing but the
    reduction order)."""
    from autoawq_tpu.quantize.quantizer import AwqQuantizer

    cfg = ModelConfig(
        model_type="llama", vocab_size=96, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=32,
    )
    params = init_random_params(cfg, seed=3, scale=0.08)
    calib = rng.integers(0, cfg.vocab_size, (8, 16))
    qcfg = AwqConfig(q_group_size=32)

    # clip search OFF for the strict leg: its 20-step argmin has exact ties
    # that psum reduction order legitimately flips; the scale search is the
    # numerically stable part and must reproduce tightly.
    ref_q = AwqQuantizer(cfg, qcfg, params, calib, progress=False,
                         apply_clip=False)
    ref = ref_q.quantize()

    mesh = build_mesh(tensor=1, data=8)
    dp_q = AwqQuantizer(cfg, qcfg, params, calib, progress=False,
                        apply_clip=False, mesh=mesh)
    got = dp_q.quantize()

    for (g1, s1), (g2, s2) in zip(ref_q.all_scales[0], dp_q.all_scales[0]):
        np.testing.assert_allclose(s2, s1, rtol=1e-4, atol=1e-5)
    flat_ref = jax.tree_util.tree_leaves(ref)
    flat_got = jax.tree_util.tree_leaves(got)
    assert len(flat_ref) == len(flat_got)
    n_close = n_total = 0
    for a, b in zip(flat_ref, flat_got):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        n_close += np.isclose(b, a, rtol=1e-4, atol=1e-4).sum()
        n_total += a.size
    assert n_close / n_total >= 0.999, n_close / n_total
    tok = jnp.asarray(calib[:2])
    lr = modules.forward(cfg, ref, tok, method="jnp", dtype=np.float32)
    lg = modules.forward(cfg, got, tok, method="jnp", dtype=np.float32)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(lr),
                               rtol=5e-3, atol=5e-3)

    # clip-on leg: artifacts may differ where grid ties flip, but the
    # overwhelming majority of elements must still agree
    ref_c = AwqQuantizer(cfg, qcfg, params, calib, progress=False).quantize()
    dp_c = AwqQuantizer(cfg, qcfg, params, calib, progress=False,
                        mesh=mesh).quantize()
    n_close = n_total = 0
    for a, b in zip(jax.tree_util.tree_leaves(ref_c),
                    jax.tree_util.tree_leaves(dp_c)):
        n_close += np.isclose(np.asarray(b, np.float32),
                              np.asarray(a, np.float32),
                              rtol=1e-4, atol=1e-4).sum()
        n_total += np.asarray(a).size
    assert n_close / n_total >= 0.99, n_close / n_total

    # non-divisible batch falls back to replicated with a warning, not a crash
    odd = AwqQuantizer(cfg, qcfg, params, rng.integers(0, 96, (7, 16)),
                       progress=False, mesh=mesh)
    assert odd.mesh is None

    # chunked + data-parallel compose: chunks stay multiples of the axis
    chunked = AwqQuantizer(cfg, qcfg, params, calib, progress=False,
                           mesh=mesh, n_parallel_calib_samples=4)
    assert chunked._chunk_size(8) is None  # 4 < ddp=8 -> no chunking
    mesh2 = build_mesh(tensor=2, data=4)
    chunked2 = AwqQuantizer(cfg, qcfg, params, calib, progress=False,
                            mesh=mesh2, n_parallel_calib_samples=4)
    assert chunked2._chunk_size(8) == 4


def test_lora_adamw_training_reduces_loss(rng):
    """optax AdamW on adapters only (reference trains LoRA via HF Trainer
    whose default optimizer is AdamW): loss decreases, base untouched."""
    import jax
    import jax.numpy as jnp

    from autoawq_tpu.train import lora as lora_mod
    from autoawq_tpu.utils.synth import random_quantized_params

    cfg = ModelConfig(
        model_type="llama", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=64)
    params = lora_mod.add_lora(
        cfg, random_quantized_params(cfg, seed=0, group_size=32,
                                     fp_dtype=jnp.float32),
        rank=4, dtype=jnp.float32)
    lora, base = lora_mod.split_lora(params)
    tokens = jnp.asarray(rng.integers(0, 128, (4, 16)))

    tx = lora_mod.make_optimizer("adamw", lr=5e-3)
    opt_state = tx.init(lora)
    step = jax.jit(lambda l, b, s, t: lora_mod.lora_train_step_optax(
        cfg, l, b, s, t, tx))
    base_leaf = np.asarray(
        base["layers"][0]["self_attn"]["q_proj"]["qweight"]).copy()
    losses = []
    for _ in range(8):
        loss, lora, opt_state = step(lora, base, opt_state, tokens)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.01, losses
    np.testing.assert_array_equal(
        base_leaf,
        np.asarray(base["layers"][0]["self_attn"]["q_proj"]["qweight"]))


def test_batching_engine_over_tp_mesh(rng, requires_multidevice):
    """Continuous batching (and burst decode) composes with Megatron-TP
    sharded params: the engine's streams bit-match the unsharded run —
    GSPMD partitions the pool decode step like any other forward."""
    import jax.numpy as jnp

    from autoawq_tpu.models.config import ModelConfig
    from autoawq_tpu.parallel.mesh import build_mesh
    from autoawq_tpu.parallel.specs import shard_params
    from autoawq_tpu.serve.batching import BatchingEngine
    from autoawq_tpu.utils.synth import random_quantized_params

    cfg = ModelConfig(
        model_type="llama", vocab_size=512, hidden_size=256,
        intermediate_size=4096, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, head_dim=32,
        max_position_embeddings=64)
    params = random_quantized_params(cfg, seed=1, fp_dtype=jnp.float32)
    prompts = [rng.integers(0, 512, (n,)) for n in (5, 9)]

    def drive(p, burst=1):
        eng = BatchingEngine(cfg, p, max_batch=2, max_seq_len=48,
                             method="jnp", dtype=jnp.float32)
        for i, pr in enumerate(prompts):
            eng.add_request(i, pr, 8)
        return eng.run(burst=burst)

    ref = drive(params)
    mesh = build_mesh(tensor=4, data=2)
    with mesh:
        sharded = shard_params(params, mesh, dtype=jnp.float32)
        assert drive(sharded) == ref
        assert drive(sharded, burst=4) == ref
