"""W4A16 matmul ops vs the host-side numpy oracle, incl. the Pallas kernel
(interpret mode on CPU; compiled on real TPU when RUN_TPU_TESTS=1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoawq_tpu.core import packing
from autoawq_tpu.core.quant import quantize_weight
from autoawq_tpu.ops.gemm import awq_matmul_jnp, dequantize_planar
from autoawq_tpu.ops.pallas_gemm import awq_matmul_pallas, supported


def make_packed(rng, k, n, g=128):
    w = rng.standard_normal((k, n)).astype(np.float32)
    q, s, z = quantize_weight(w, group_size=g)
    qw = packing.pack_planar(np.asarray(q))
    qz = packing.pack_planar(np.asarray(z))
    ps = packing.pad_scales_planar(np.asarray(s))
    wdq = np.asarray(
        dequantize_planar(jnp.asarray(qw), jnp.asarray(ps), jnp.asarray(qz),
                          out_features=n, dtype=jnp.float32)
    )
    return qw, ps, qz, wdq


@pytest.mark.parametrize("k,n", [(256, 1024), (128, 512), (256, 5632)])
def test_jnp_matmul_matches_oracle(rng, k, n):
    qw, ps, qz, wdq = make_packed(rng, k, n)
    x = rng.standard_normal((4, k)).astype(np.float32)
    y = awq_matmul_jnp(jnp.asarray(x), jnp.asarray(qw), jnp.asarray(ps),
                       jnp.asarray(qz), out_features=n)
    np.testing.assert_allclose(np.asarray(y), x @ wdq, rtol=5e-3, atol=5e-3)


def test_dequantize_planar_matches_awq_oracle(rng):
    """Cross-check the jnp planar dequant against the AutoAWQ-format oracle."""
    k, n = 256, 1024
    qw, ps, qz, _ = make_packed(rng, k, n)
    awq_qw, awq_qz, awq_s = packing.planar_to_awq(qw, qz, ps, n)
    ref = packing.dequantize_awq(awq_qw, awq_qz, awq_s)
    ours = np.asarray(
        dequantize_planar(jnp.asarray(qw), jnp.asarray(ps), jnp.asarray(qz),
                          out_features=n, dtype=jnp.float32)
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("m", [1, 8, 17, 300])
@pytest.mark.parametrize("k,n", [(256, 1024), (512, 2048)])
def test_pallas_kernel_matches_jnp(rng, m, k, n):
    qw, ps, qz, wdq = make_packed(rng, k, n)
    x = rng.standard_normal((m, k)).astype(np.float32)
    assert supported(jnp.asarray(x), jnp.asarray(qw))
    y = awq_matmul_pallas(
        jnp.asarray(x), jnp.asarray(qw), jnp.asarray(ps), jnp.asarray(qz),
        out_features=n, interpret=jax.default_backend() != "tpu",
    )
    assert y.shape == (m, n)
    ref = x @ wdq
    from autoawq_tpu.ops import pallas_gemm

    if m >= pallas_gemm.WS_MIN_M:
        # weights-stationary regime dequantizes into a bf16 scratch
        # (the MXU operand dtype): per-element error is bounded by bf16
        # weight rounding, ~0.4% of |w| — check against output scale
        # (the streaming grid's group-factored f32 scaling is exact-er)
        np.testing.assert_allclose(np.asarray(y), ref, rtol=0,
                                   atol=4e-3 * np.abs(ref).max())
    else:
        np.testing.assert_allclose(np.asarray(y), ref, rtol=5e-3,
                                   atol=5e-3)


def test_pallas_kernel_bias_and_3d(rng):
    k, n = 256, 1024
    qw, ps, qz, wdq = make_packed(rng, k, n)
    x = rng.standard_normal((2, 3, k)).astype(np.float32)
    b = rng.standard_normal((n,)).astype(np.float32)
    y = awq_matmul_pallas(
        jnp.asarray(x), jnp.asarray(qw), jnp.asarray(ps), jnp.asarray(qz),
        out_features=n, bias=jnp.asarray(b),
        interpret=jax.default_backend() != "tpu",
    )
    np.testing.assert_allclose(
        np.asarray(y), x @ wdq + b, rtol=5e-3, atol=5e-3
    )


def test_unsupported_shape_falls_back(rng):
    """Odd group count (no even-BG K-block exists) must route to jnp."""
    from autoawq_tpu.ops.gemm import awq_matmul

    k, n = 384, 256  # G = 3
    qw, ps, qz, wdq = make_packed(rng, k, n)
    assert not supported(jnp.ones((1, k)), jnp.asarray(qw))
    x = rng.standard_normal((2, k)).astype(np.float32)
    y = awq_matmul(jnp.asarray(x), jnp.asarray(qw), jnp.asarray(ps),
                   jnp.asarray(qz), out_features=n)
    np.testing.assert_allclose(np.asarray(y), x @ wdq, rtol=5e-3, atol=5e-3)


def test_symmetric_zeros_free_path(rng):
    """zero_point=False LINs omit qzeros; kernel + jnp agree, and the saved
    AutoAWQ checkpoint regenerates constant-8 zeros (Marlin-parity path)."""
    import tempfile

    from autoawq_tpu.api import AwqCausalLM
    from autoawq_tpu.io.hf import init_random_params
    from autoawq_tpu.models.config import ModelConfig
    from autoawq_tpu.ops.gemm import awq_matmul_jnp
    from autoawq_tpu.ops.pallas_gemm import awq_matmul_pallas

    cfg = ModelConfig(model_type="llama", vocab_size=64, hidden_size=256,
                      intermediate_size=256, num_hidden_layers=1,
                      num_attention_heads=4, num_key_value_heads=4,
                      head_dim=64, max_position_embeddings=64)
    m = AwqCausalLM(cfg, init_random_params(cfg, seed=0, scale=0.1))
    m.quantize(quant_config={"q_group_size": 64, "zero_point": False},
               calib_data=rng.integers(0, 64, (2, 32)), progress=False)
    lin = m.params["layers"][0]["self_attn"]["q_proj"]
    assert "qzeros" not in lin

    x = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)
    y_jnp = awq_matmul_jnp(x, lin["qweight"], lin["scales"], None,
                           out_features=256)
    y_pal = awq_matmul_pallas(x, lin["qweight"], lin["scales"], None,
                              out_features=256,
                              interpret=jax.default_backend() != "tpu")
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_jnp),
                               rtol=2e-2, atol=2e-2)

    with tempfile.TemporaryDirectory() as d:
        m.save_quantized(d)
        m2 = AwqCausalLM.from_quantized(d)
    lin2 = m2.params["layers"][0]["self_attn"]["q_proj"]
    assert "qzeros" not in lin2  # round-trips back to the symmetric path
    ids = rng.integers(0, 64, (1, 8))
    np.testing.assert_allclose(np.asarray(m(ids)), np.asarray(m2(ids)),
                               rtol=2e-2, atol=2e-2)


def test_ws_large_m_matches_oracle(rng):
    """Weights-stationary large-M mode (extract-once, x VMEM-resident)
    matches the oracle; small-M inputs keep the streaming grid."""
    k, n = 256, 1024
    qw, ps, qz, wdq = make_packed(rng, k, n)
    x = rng.standard_normal((1200, k)).astype(np.float32) * 0.3
    y = awq_matmul_pallas(jnp.asarray(x, jnp.bfloat16), jnp.asarray(qw),
                          jnp.asarray(ps), jnp.asarray(qz),
                          out_features=n, interpret=True)
    ref = x @ wdq
    scale = np.abs(ref).max() + 1e-9
    np.testing.assert_allclose(np.asarray(y, np.float32) / scale,
                               ref / scale, atol=2e-2)


def test_ws_slab_split_matches_oracle(rng, monkeypatch):
    """M beyond the resident-x budget is processed in slabs."""
    from autoawq_tpu.ops import pallas_gemm

    monkeypatch.setattr(pallas_gemm, "WS_X_MAX", 512 * 1024)  # force slabs
    k, n = 256, 1024
    qw, ps, qz, wdq = make_packed(rng, k, n)
    x = rng.standard_normal((2100, k)).astype(np.float32) * 0.3
    y = pallas_gemm.awq_matmul_pallas(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(qw), jnp.asarray(ps),
        jnp.asarray(qz), out_features=n, interpret=True)
    assert y.shape == (2100, n)
    ref = x @ wdq
    scale = np.abs(ref).max() + 1e-9
    np.testing.assert_allclose(np.asarray(y, np.float32) / scale,
                               ref / scale, atol=2e-2)


def test_ws_symmetric(rng):
    from autoawq_tpu.core.quant import quantize_weight

    k, n = 256, 1024
    w = rng.standard_normal((k, n)).astype(np.float32)
    q, s, _ = quantize_weight(w, group_size=128, zero_point=False)
    qw = packing.pack_planar(np.asarray(q))
    ps = packing.pad_scales_planar(np.asarray(s))
    wdq = np.asarray(dequantize_planar(jnp.asarray(qw), jnp.asarray(ps),
                                       None, out_features=n,
                                       dtype=jnp.float32))
    x = rng.standard_normal((1100, k)).astype(np.float32) * 0.3
    y = awq_matmul_pallas(jnp.asarray(x, jnp.bfloat16), jnp.asarray(qw),
                          jnp.asarray(ps), None, out_features=n,
                          interpret=True)
    ref = x @ wdq
    scale = np.abs(ref).max() + 1e-9
    np.testing.assert_allclose(np.asarray(y, np.float32) / scale,
                               ref / scale, atol=2e-2)
