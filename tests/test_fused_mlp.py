"""Fused decode-MLP megakernel (ops/fused_mlp.py) vs the unfused jnp path,
interpret mode on CPU (compiled on real TPU when RUN_TPU_TESTS=1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoawq_tpu.config import AwqConfig
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import fuse, modules
from autoawq_tpu.ops import fused_mlp
from autoawq_tpu.quantize.quantizer import quantize_linear_params


def make_mlp_params(rng, h, inter, zero_point=True, g=128, scale=0.05):
    qcfg = AwqConfig(q_group_size=g, zero_point=zero_point)
    lin = lambda k, n: quantize_linear_params(
        {"kernel": (rng.standard_normal((k, n)) * scale).astype(np.float32)},
        qcfg)
    gate, up, down = lin(h, inter), lin(h, inter), lin(inter, h)
    gu = fuse._fuse_quant([gate, up], [inter, inter])
    return {"gate_up_proj": {k: jnp.asarray(v) for k, v in gu.items()},
            "down_proj": down}


@pytest.mark.parametrize("h,inter,zp", [
    (256, 512, True),       # single superblock each
    (256, 768, True),       # act split mid-tile (768 % 1024 != 0)
    (2048, 1024, True),     # s1=2 and s2=2: clamped index maps both ways
    (256, 512, False),      # symmetric (no qzeros stream)
])
def test_fused_mlp_matches_unfused(rng, h, inter, zp):
    p = make_mlp_params(rng, h, inter, zero_point=zp)
    cfg = ModelConfig(model_type="llama", hidden_size=h,
                      intermediate_size=inter, num_hidden_layers=1,
                      num_attention_heads=4, num_key_value_heads=4,
                      head_dim=64, vocab_size=64)
    x = jnp.asarray(rng.standard_normal((1, 1, h)).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    assert fused_mlp.supported(x, p["gate_up_proj"], p["down_proj"], inter,
                               "silu")
    ref = modules.mlp(cfg, p, x, method="jnp")
    got = fused_mlp.fused_mlp_pallas(
        x, p["gate_up_proj"]["qweight"], p["gate_up_proj"]["scales"],
        p["down_proj"]["qweight"], p["down_proj"]["scales"],
        p["gate_up_proj"].get("qzeros"), p["down_proj"].get("qzeros"),
        inter=inter, out_features=h, act="silu", interpret=True)
    # the kernel accumulates in f32 and is *closer* to the fp32 oracle than
    # the jnp path (bf16 dequant + bf16 intermediate); compare both to the
    # oracle and require the kernel to be at least as accurate (+noise)
    oracle = _oracle(p, x, inter, h, "silu")
    kerr = np.abs(np.asarray(got, np.float32) - oracle).max()
    jerr = np.abs(np.asarray(ref, np.float32) - oracle).max()
    assert kerr <= jerr * 1.5 + 2e-3, (kerr, jerr)


def _oracle(p, x, inter, h, act):
    from autoawq_tpu.ops.gemm import dequantize_planar

    w1 = np.asarray(dequantize_planar(
        p["gate_up_proj"]["qweight"], p["gate_up_proj"]["scales"],
        p["gate_up_proj"].get("qzeros"), dtype=jnp.float32))
    w2 = np.asarray(dequantize_planar(
        p["down_proj"]["qweight"], p["down_proj"]["scales"],
        p["down_proj"].get("qzeros"), dtype=jnp.float32))
    xf = np.asarray(x, np.float32).reshape(-1, h)
    gu = xf @ w1[:, : 2 * inter]
    g, u = gu[:, :inter], gu[:, inter:]
    if act == "silu":
        a = g / (1 + np.exp(-g))
    else:
        a = np.asarray(jax.nn.gelu(jnp.asarray(g), approximate=True))
    y = (a * u) @ w2[:, :h]
    return y.reshape(*x.shape[:-1], h)


def test_fused_mlp_gelu_and_batch(rng):
    h, inter = 256, 512
    p = make_mlp_params(rng, h, inter)
    cfg = ModelConfig(model_type="llama", hidden_size=h,
                      intermediate_size=inter, num_hidden_layers=1,
                      num_attention_heads=4, num_key_value_heads=4,
                      head_dim=64, vocab_size=64, hidden_act="gelu_pytorch_tanh")
    x = jnp.asarray(rng.standard_normal((4, 1, h)).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    ref = modules.mlp(cfg, p, x, method="jnp")
    got = fused_mlp.fused_mlp_pallas(
        x, p["gate_up_proj"]["qweight"], p["gate_up_proj"]["scales"],
        p["down_proj"]["qweight"], p["down_proj"]["scales"],
        p["gate_up_proj"].get("qzeros"), p["down_proj"].get("qzeros"),
        inter=inter, out_features=h, act="gelu_pytorch_tanh", interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=2e-3)


def test_fused_mlp_route_via_modules(rng, monkeypatch):
    """AWQ_TPU_FUSED_MLP=force routes modules.mlp through the megakernel
    (interpret off-TPU) and matches the unfused path."""
    h, inter = 256, 512
    p = make_mlp_params(rng, h, inter)
    cfg = ModelConfig(model_type="llama", hidden_size=h,
                      intermediate_size=inter, num_hidden_layers=1,
                      num_attention_heads=4, num_key_value_heads=4,
                      head_dim=64, vocab_size=64)
    x = jnp.asarray(rng.standard_normal((1, 1, h)).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    ref = modules.mlp(cfg, p, x, method="jnp")
    monkeypatch.setenv("AWQ_TPU_FUSED_MLP", "force")
    assert modules._fused_mlp_ok(cfg, p, x, "auto", inter)
    got = modules.mlp(cfg, p, x, method="auto")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=2e-3)
    # taps (calibration) and prefill-size M keep the unfused path
    assert not modules._fused_mlp_ok(
        cfg, p, jnp.zeros((64, h), jnp.bfloat16), "auto", inter)
    monkeypatch.setenv("AWQ_TPU_FUSED_MLP", "0")
    assert not modules._fused_mlp_ok(cfg, p, x, "auto", inter)


def test_supported_gates(rng):
    p = make_mlp_params(rng, 256, 512)
    x = jnp.zeros((1, 256), jnp.bfloat16)
    gu, dn = p["gate_up_proj"], p["down_proj"]
    assert fused_mlp.supported(x, gu, dn, 512, "silu")
    assert not fused_mlp.supported(x, gu, dn, 512, "relu")  # act
    assert not fused_mlp.supported(jnp.zeros((64, 256), jnp.bfloat16),
                                   gu, dn, 512, "silu")  # M too big
    assert not fused_mlp.supported(x, gu, dn, 384, "silu")  # inter mismatch
    assert not fused_mlp.supported(x, {"kernel": None}, dn, 512, "silu")
