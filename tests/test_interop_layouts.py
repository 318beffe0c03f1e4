"""Non-GEMM AutoAWQ checkpoint layouts (io/interop.py) vs the reference's
own packers: WQLinear_GEMV / WQLinear_GEMVFast / WQLinear_Marlin.from_linear
run on CPU torch pack known integers; our converters must recover those
integers bit-exactly, and a version="gemv"/"marlin" checkpoint must load
through the public from_quantized to the same logits as its GEMM twin."""

import json
import os
import shutil

import numpy as np
import pytest

from autoawq_tpu.core import packing
from autoawq_tpu.io import interop

from refutil import import_reference


def _exact_linear(rng, k, n, g, *, symmetric=False):
    """Known integers + fp16 scales -> (torch Linear, q4, z4, sc) such that
    from_linear's round((w + z*s)/s) recovers q4 exactly."""
    torch = pytest.importorskip("torch")
    q4 = rng.integers(0, 16, (k, n)).astype(np.int32)
    z4 = (np.full((k // g, n), 8, np.int32) if symmetric
          else rng.integers(0, 16, (k // g, n)).astype(np.int32))
    sc = (rng.uniform(0.5, 2.0, (k // g, n)).astype(np.float16)
          .astype(np.float32))
    w = (q4 - np.repeat(z4, g, 0)).astype(np.float32) * np.repeat(sc, g, 0)
    lin = torch.nn.Linear(k, n, bias=False)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w.T))  # HF convention [N, K]
    return lin, q4, z4, sc


@pytest.mark.parametrize("k,n,g", [(128, 64, 32), (256, 96, 128)])
def test_gemv_unpack_bitexact(rng, k, n, g):
    import_reference()
    import torch
    from awq.modules.linear.gemv import WQLinear_GEMV

    lin, q4, z4, sc = _exact_linear(rng, k, n, g)
    m = WQLinear_GEMV.from_linear(
        lin, 4, g, scales=torch.from_numpy(sc.T.copy()),
        zeros=torch.from_numpy(z4.T.astype(np.float32)))
    got_q, got_z, got_s = interop.unpack_gemv(
        m.qweight.numpy(), m.qzeros.numpy(), m.scales.numpy(), g)
    np.testing.assert_array_equal(got_q, q4)
    np.testing.assert_array_equal(got_z, z4)
    np.testing.assert_allclose(got_s, sc, rtol=1e-3)


@pytest.mark.parametrize("k,n,g", [(128, 64, 32), (256, 128, 128)])
def test_gemv_fast_unpack_bitexact(rng, k, n, g):
    import_reference()
    import torch
    from awq.modules.linear.gemv_fast import WQLinear_GEMVFast

    lin, q4, z4, sc = _exact_linear(rng, k, n, g)
    m = WQLinear_GEMVFast.from_linear(
        lin, 4, g, scales=torch.from_numpy(sc.T.copy()),
        zeros=torch.from_numpy(z4.T.astype(np.float32)))
    got_q, got_z, got_s = interop.unpack_gemv_fast(
        m.qweight.numpy(), m.qzeros.numpy(), m.scales.numpy(), g)
    np.testing.assert_array_equal(got_q, q4)
    np.testing.assert_array_equal(got_z, z4)
    np.testing.assert_allclose(got_s, sc, rtol=1e-3)


@pytest.mark.parametrize("k,n,g", [(128, 64, 32), (256, 128, 256)])
def test_marlin_unpack_bitexact(rng, k, n, g):
    import_reference()
    import torch
    from awq.modules.linear.marlin import WQLinear_Marlin

    lin, q4, z4, sc = _exact_linear(rng, k, n, g, symmetric=True)
    m = WQLinear_Marlin.from_linear(
        lin, 4, g, scales=torch.from_numpy(sc.T.copy()))
    got_q, got_z, got_s = interop.unpack_marlin(
        m.qweight.numpy(), m.scales.numpy(), g)
    np.testing.assert_array_equal(got_q, q4)
    np.testing.assert_array_equal(got_z, z4)
    np.testing.assert_allclose(got_s, sc, rtol=1e-3)


# ---------------------------------------------------------------------------
# write side: our packers vs the reference's from_linear, + round-trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("k,n,g", [(128, 64, 32), (256, 96, 128)])
def test_pack_gemv_bitexact_vs_reference(rng, k, n, g):
    import_reference()
    import torch
    from awq.modules.linear.gemv import WQLinear_GEMV

    lin, q4, z4, sc = _exact_linear(rng, k, n, g)
    m = WQLinear_GEMV.from_linear(
        lin, 4, g, scales=torch.from_numpy(sc.T.copy()),
        zeros=torch.from_numpy(z4.T.astype(np.float32)))
    qw, qz, s = interop.pack_gemv(q4, z4, sc, g)
    np.testing.assert_array_equal(qw, m.qweight.numpy())
    np.testing.assert_array_equal(qz, m.qzeros.numpy())
    np.testing.assert_allclose(np.asarray(s, np.float32)[:, : g],
                               m.scales.numpy().astype(np.float32)[:, : g],
                               rtol=1e-3)
    # write -> read round-trip is the identity
    rq, rz, rs = interop.unpack_gemv(qw, qz, s, g)
    np.testing.assert_array_equal(rq, q4)
    np.testing.assert_array_equal(rz, z4)
    np.testing.assert_allclose(rs, sc, rtol=1e-3)


@pytest.mark.parametrize("k,n,g", [(128, 64, 32), (256, 128, 128)])
def test_pack_gemv_fast_bitexact_vs_reference(rng, k, n, g):
    import_reference()
    import torch
    from awq.modules.linear.gemv_fast import WQLinear_GEMVFast

    lin, q4, z4, sc = _exact_linear(rng, k, n, g)
    m = WQLinear_GEMVFast.from_linear(
        lin, 4, g, scales=torch.from_numpy(sc.T.copy()),
        zeros=torch.from_numpy(z4.T.astype(np.float32)))
    qw, qz, s = interop.pack_gemv_fast(q4, z4, sc, g)
    np.testing.assert_array_equal(qw, m.qweight.numpy())
    np.testing.assert_allclose(qz.astype(np.float32)[: k // g],
                               m.qzeros.numpy().astype(np.float32)[: k // g],
                               rtol=2e-3, atol=2e-3)
    rq, rz, rs = interop.unpack_gemv_fast(qw, qz, s, g)
    np.testing.assert_array_equal(rq, q4)
    np.testing.assert_array_equal(rz, z4)
    np.testing.assert_allclose(rs, sc, rtol=1e-3)


@pytest.mark.parametrize("k,n,g", [(128, 64, 32), (256, 128, 256)])
def test_pack_marlin_bitexact_vs_reference(rng, k, n, g):
    import_reference()
    import torch
    from awq.modules.linear.marlin import WQLinear_Marlin

    lin, q4, z4, sc = _exact_linear(rng, k, n, g, symmetric=True)
    m = WQLinear_Marlin.from_linear(
        lin, 4, g, scales=torch.from_numpy(sc.T.copy()))
    qw, s = interop.pack_marlin(q4, z4, sc, g)
    np.testing.assert_array_equal(qw, m.qweight.numpy())
    np.testing.assert_allclose(s.astype(np.float32),
                               m.scales.numpy().astype(np.float32),
                               rtol=1e-3)
    rq, rz, rs = interop.unpack_marlin(qw, s, g)
    np.testing.assert_array_equal(rq, q4)
    np.testing.assert_array_equal(rz, z4)
    np.testing.assert_allclose(rs, sc, rtol=1e-3)
    with pytest.raises(ValueError, match="symmetric"):
        interop.pack_marlin(q4, np.full_like(z4, 7), sc, g)


@pytest.mark.parametrize("version", ["gemm", "gemv", "gemv_fast", "marlin"])
def test_save_quantized_version_roundtrip(rng, tmp_path, version):
    """save_quantized packs per quant_config.version (reference:
    awq/quantize/quantizer.py:236-252); loading every layout back through
    the public API must reproduce the GEMM twin's logits exactly."""
    from autoawq_tpu import AutoAWQForCausalLM, AwqCausalLM, AwqConfig
    from autoawq_tpu.io.hf import init_random_params
    from autoawq_tpu.models.config import ModelConfig

    cfg = ModelConfig(
        model_type="llama", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=2,
        num_key_value_heads=2, head_dim=32, max_position_embeddings=64)
    model = AwqCausalLM(cfg, init_random_params(cfg, seed=4))
    calib = rng.integers(0, cfg.vocab_size, (2, 16))
    model.quantize(
        quant_config=AwqConfig(q_group_size=32,
                               zero_point=(version != "marlin"),
                               version=version),
        calib_data=calib, progress=False)
    dst = str(tmp_path / version)
    model.save_quantized(dst)
    with open(os.path.join(dst, "config.json")) as f:
        assert json.load(f)["quantization_config"]["version"] == version

    src = str(tmp_path / "gemm_twin")
    model.quant_config.version = "gemm"
    model.save_quantized(src)
    tokens = rng.integers(0, cfg.vocab_size, (2, 12))
    ref = AutoAWQForCausalLM.from_quantized(src)(tokens, method="jnp")
    got = AutoAWQForCausalLM.from_quantized(dst)(tokens, method="jnp")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


# ---------------------------------------------------------------------------
# end-to-end: a repacked checkpoint loads to identical logits
# ---------------------------------------------------------------------------


def _repack_checkpoint(src, dst, version):
    """Rewrite a GEMM checkpoint's triples into ``version`` layout using the
    REFERENCE packers, and stamp config.json accordingly."""
    import torch
    from safetensors.numpy import save_file
    from awq.modules.linear.gemv import WQLinear_GEMV
    from awq.modules.linear.marlin import WQLinear_Marlin

    from autoawq_tpu.io import hf as hf_io

    sd = dict(hf_io.load_state_dict_from_dir(src))
    for key in [k for k in sd if k.endswith(".qweight")]:
        base = key[: -len(".qweight")]
        q4 = packing.unpack_awq(np.asarray(sd[key]))
        sc = np.asarray(sd[base + ".scales"]).astype(np.float32)
        z4 = packing.unpack_awq(np.asarray(sd[base + ".qzeros"]), sc.shape[1])
        q4 = q4[:, : sc.shape[1]]
        k_, n_ = q4.shape
        g = k_ // sc.shape[0]
        w = (q4 - np.repeat(z4, g, 0)) * np.repeat(sc, g, 0)
        lin = torch.nn.Linear(k_, n_, bias=False)
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(w.T.astype(np.float32)))
        if version == "gemv":
            m = WQLinear_GEMV.from_linear(
                lin, 4, g, scales=torch.from_numpy(sc.T.copy()),
                zeros=torch.from_numpy(z4.T.astype(np.float32)))
            sd[base + ".qzeros"] = m.qzeros.numpy()
        else:
            assert (z4 == 8).all(), "marlin requires symmetric"
            m = WQLinear_Marlin.from_linear(
                lin, 4, g, scales=torch.from_numpy(sc.T.copy()))
            del sd[base + ".qzeros"]
        sd[key] = m.qweight.numpy()
        sd[base + ".scales"] = m.scales.numpy()
    os.makedirs(dst, exist_ok=True)
    with open(os.path.join(src, "config.json")) as f:
        cfg = json.load(f)
    cfg["quantization_config"]["version"] = version
    with open(os.path.join(dst, "config.json"), "w") as f:
        json.dump(cfg, f)
    save_file(sd, os.path.join(dst, "model.safetensors"))


@pytest.mark.parametrize("version", ["gemv", "marlin"])
def test_from_quantized_nongemm_matches_gemm(rng, tmp_path, version):
    import_reference()
    import jax.numpy as jnp

    from autoawq_tpu import AutoAWQForCausalLM, AwqCausalLM, AwqConfig
    from autoawq_tpu.io.hf import init_random_params
    from autoawq_tpu.models.config import ModelConfig

    cfg = ModelConfig(
        model_type="llama", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=2,
        num_key_value_heads=2, head_dim=32, max_position_embeddings=64)
    model = AwqCausalLM(cfg, init_random_params(cfg, seed=3))
    calib = rng.integers(0, cfg.vocab_size, (2, 16))
    model.quantize(
        quant_config=AwqConfig(q_group_size=32,
                               zero_point=(version != "marlin")),
        calib_data=calib, progress=False)
    src = str(tmp_path / "gemm")
    model.save_quantized(src)
    dst = str(tmp_path / version)
    _repack_checkpoint(src, dst, version)

    tokens = rng.integers(0, cfg.vocab_size, (2, 12))
    ref = AutoAWQForCausalLM.from_quantized(src)(tokens, method="jnp")
    got = AutoAWQForCausalLM.from_quantized(dst)(tokens, method="jnp")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
