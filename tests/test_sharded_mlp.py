"""TP-capable three-operand fused MLP (ops/sharded_mlp.py): single-device
kernel vs jnp oracle, and the 8-virtual-device mesh path (col-sharded
gate/up, row-sharded down, one psum) vs the unsharded reference —
closing STATUS round-2 gap #1 (fused-MLP win lost under TP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from autoawq_tpu.config import AwqConfig
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules
from autoawq_tpu.ops import sharded_mlp
from autoawq_tpu.parallel.mesh import build_mesh
from autoawq_tpu.quantize.quantizer import quantize_linear_params


def make_params(rng, h, inter, zero_point=True, g=128, scale=0.05):
    qcfg = AwqConfig(q_group_size=g, zero_point=zero_point)
    lin = lambda k, n: quantize_linear_params(
        {"kernel": (rng.standard_normal((k, n)) * scale).astype(np.float32)},
        qcfg)
    return {"gate_proj": lin(h, inter), "up_proj": lin(h, inter),
            "down_proj": lin(inter, h)}


def _jnp_ref(cfg, p, x):
    return modules.mlp(cfg, p, x, method="jnp")


def _cfg(h, inter):
    return ModelConfig(model_type="llama", hidden_size=h,
                       intermediate_size=inter, num_hidden_layers=1,
                       num_attention_heads=4, num_key_value_heads=4,
                       head_dim=64, vocab_size=64)


@pytest.mark.parametrize("h,inter,zp", [
    (256, 1024, True),
    (256, 1024, False),   # symmetric: no qzeros operands at all
    (512, 2048, True),
])
def test_fused_mlp3_matches_jnp(rng, h, inter, zp):
    p = make_params(rng, h, inter, zero_point=zp)
    cfg = _cfg(h, inter)
    # fp32 x so both paths accumulate alike (bf16 inter-path rounding is
    # covered by tests/test_fused_mlp.py's oracle-relative comparison)
    x = jnp.asarray(rng.standard_normal((1, 2, h)).astype(np.float32) * 0.5)
    assert sharded_mlp.supported(x, p["gate_proj"], p["up_proj"],
                                 p["down_proj"], inter, "silu")
    ref = np.asarray(_jnp_ref(cfg, p, x), np.float32)
    got = sharded_mlp.fused_mlp3_pallas(
        x, p["gate_proj"]["qweight"], p["gate_proj"]["scales"],
        p["up_proj"]["qweight"], p["up_proj"]["scales"],
        p["down_proj"]["qweight"], p["down_proj"]["scales"],
        p["gate_proj"].get("qzeros"), p["up_proj"].get("qzeros"),
        p["down_proj"].get("qzeros"),
        inter=inter, out_features=h, act="silu", interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32), ref,
                               rtol=5e-2, atol=5e-3)


def test_sharded_matches_single_device(rng, requires_multidevice):
    """Col-shard gate/up + row-shard down over tensor=4: the partitioned
    lowering must run the per-shard kernel + one psum and match the
    unsharded jnp forward."""
    h, inter = 256, 4096  # N4=1024 = 4*256: shards cleanly over tp=4
    p = make_params(rng, h, inter)
    cfg = _cfg(h, inter)
    x = jnp.asarray(rng.standard_normal((2, 1, h)).astype(np.float32) * 0.5)
    ref = np.asarray(_jnp_ref(cfg, p, x), np.float32)

    mesh = build_mesh(tensor=4, data=2)
    col = NamedSharding(mesh, P(None, "tensor"))
    row = NamedSharding(mesh, P("tensor", None))
    rep = NamedSharding(mesh, P())

    def place(lin, kind):
        w, b = (col, rep) if kind == "col" else (row, rep)
        return {k: jax.device_put(jnp.asarray(v),
                                  w if k in ("qweight", "scales", "qzeros")
                                  else b)
                for k, v in lin.items()}

    sp = {"gate_proj": place(p["gate_proj"], "col"),
          "up_proj": place(p["up_proj"], "col"),
          "down_proj": place(p["down_proj"], "row")}
    with mesh:
        out = jax.jit(lambda pp, xx: sharded_mlp.fused_mlp_sharded(
            xx, pp["gate_proj"], pp["up_proj"], pp["down_proj"],
            inter=inter, out_features=h, act="silu", interpret=True))(
                sp, jax.device_put(x, rep))
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=5e-2, atol=5e-3)
    # and the partitioned result must agree with the UNSHARDED op bitwise-
    # close (same kernel math per shard, fp32 psum)
    single = sharded_mlp.fused_mlp_sharded(
        x, p["gate_proj"], p["up_proj"], p["down_proj"],
        inter=inter, out_features=h, act="silu", interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(single, np.float32),
                               rtol=2e-3, atol=2e-4)


def test_modules_mlp_routes_to_sharded(rng, monkeypatch):
    """modules.mlp's unfused branch must take the three-operand fused path
    when eligible (AWQ_TPU_FUSED_MLP=force in interpret mode)."""
    h, inter = 256, 1024
    p = make_params(rng, h, inter)
    cfg = _cfg(h, inter)
    x = jnp.asarray(rng.standard_normal((1, 1, h)).astype(np.float32) * 0.5)
    ref = np.asarray(modules.mlp(cfg, p, x, method="jnp"), np.float32)
    monkeypatch.setenv("AWQ_TPU_FUSED_MLP", "force")
    assert modules._sharded_mlp_ok(cfg, p, x, "auto", inter)
    got = modules.mlp(cfg, p, x, method="auto")
    np.testing.assert_allclose(np.asarray(got, np.float32), ref,
                               rtol=5e-2, atol=5e-3)
    # prefill-size batches must NOT take the decode megakernel
    xb = jnp.asarray(rng.standard_normal((4, 64, h)).astype(np.float32))
    assert not modules._sharded_mlp_ok(cfg, p, xb, "auto", inter)
