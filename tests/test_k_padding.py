"""K padding for non-conforming contraction dims (core/packing
pad_k_nibbles): the fused kernel blocks K into even-group superblocks, so
K must be a multiple of 2*group_size — falcon-7b's h=4544 at its native
group 64 is 71 groups (odd) and previously fell off the kernel path
entirely. Packing now zero-pads K (pad rows dequantize to exactly 0; the
dispatcher zero-pads x), the save path strips the pad back to the model's
logical K (io/hf.role_in_features), and everything stays bit-exact."""

import jax
import jax.numpy as jnp
import numpy as np

from autoawq_tpu import AwqCausalLM, AwqConfig
from autoawq_tpu.core import packing
from autoawq_tpu.io import serialize
from autoawq_tpu.io.hf import init_random_params
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules
from autoawq_tpu.quantize.quantizer import AwqQuantizer

# h=96 is NOT a multiple of 2*group(=64) -> 1.5 even-group superblocks,
# exactly falcon-7b's 4544-at-group-64 problem (in a llama-shaped net so
# the plugin plumbing stays out of the way; inter=192 IS conforming, so
# the test also covers mixed padded/unpadded linears in one model)
CFG = ModelConfig(
    model_type="llama", vocab_size=128, hidden_size=96,
    intermediate_size=192, num_hidden_layers=2, num_attention_heads=6,
    num_key_value_heads=2, head_dim=16, max_position_embeddings=64)
G = 32


def test_padded_in_features():
    assert packing.padded_in_features(4544, 64) == 4608
    assert packing.padded_in_features(4544, 128) == 4608
    assert packing.padded_in_features(4096, 128) == 4096
    assert packing.padded_in_features(96, 32) == 128


def _quantized(rng):
    params = init_random_params(CFG, seed=7, scale=0.08)
    calib = rng.integers(0, CFG.vocab_size, (2, 16))
    return params, AwqQuantizer(CFG, AwqConfig(q_group_size=G), params,
                                calib, progress=False).quantize()


def test_quantize_forward_padded_k(rng):
    """Quantizing an odd-group-count model pads K; the quantized forward
    stays close to fp and runs the padded layout through every method."""
    params, qparams = _quantized(rng)
    lin = qparams["layers"][0]["mlp"]["gate_proj"]  # K = h = 96 -> padded
    assert lin["qweight"].shape[0] == 64  # K 96 -> 128 packed rows /2
    assert lin["scales"].shape[0] == 4    # 3 logical groups + 1 pad
    down = qparams["layers"][0]["mlp"]["down_proj"]  # K = 192, conforming
    assert down["qweight"].shape[0] == 96  # untouched

    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 12)))
    ref = np.asarray(modules.forward(CFG, params, tokens, method="jnp",
                                     dtype=np.float32))
    got = np.asarray(modules.forward(CFG, qparams, tokens, method="jnp",
                                     dtype=np.float32))
    assert np.abs(got - ref).max() < 0.35 * np.abs(ref).max()


def test_save_strips_pad_and_roundtrips(rng):
    """Saved AutoAWQ tensors carry the LOGICAL K (h=96 rows, 3 zero
    groups), and reloading through the public API reproduces the padded
    runtime layout with identical logits."""
    import tempfile

    _, qparams = _quantized(rng)
    model = AwqCausalLM(CFG, qparams, AwqConfig(q_group_size=G))
    with tempfile.TemporaryDirectory() as d:
        model.save_quantized(d)
        from safetensors.numpy import load_file
        import os

        sd = load_file(os.path.join(d, "model.safetensors"))
        qw = sd["model.layers.0.mlp.gate_proj.qweight"]
        assert qw.shape[0] == 96          # logical K, no pad leaked
        assert sd["model.layers.0.mlp.gate_proj.scales"].shape[0] == 3
        assert sd["model.layers.0.mlp.gate_proj.qzeros"].shape[0] == 3

        cfg2, _, loaded = serialize.from_quantized(d)
        tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 10)))
        a = np.asarray(modules.forward(CFG, qparams, tokens, method="jnp",
                                       dtype=np.float32))
        b = np.asarray(modules.forward(cfg2, loaded, tokens, method="jnp",
                                       dtype=np.float32))
        # fp16 serialization of scales/embeds costs ~2.5e-3 abs on these
        # logit magnitudes (~3.0); the pad itself is exact
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3)


def test_padded_matmul_kernel_parity(rng):
    """The interpret-mode Pallas kernel on a K-padded triple matches the
    jnp oracle built from the unpadded logical arrays, and grad wrt x
    keeps the logical K."""
    from autoawq_tpu.core.quant import dequantize_weight, quantize_weight
    from autoawq_tpu.ops import gemm, pallas_gemm

    k, n, g = 96, 64, 32
    w = rng.standard_normal((k, n)).astype(np.float32)
    q, s, z = quantize_weight(jnp.asarray(w), bits=4, group_size=g,
                              zero_point=True)
    q4, s4, z4 = packing.pad_k_nibbles(np.asarray(q), np.asarray(s),
                                       np.asarray(z), g)
    qw = jnp.asarray(packing.pack_planar(q4))
    sc = jnp.asarray(packing.pad_scales_planar(s4))
    qz = jnp.asarray(packing.pack_planar(z4))
    x = jnp.asarray(rng.standard_normal((4, k)).astype(np.float32))
    want = np.asarray(x) @ np.asarray(dequantize_weight(q, s, z))

    got = np.asarray(gemm.awq_matmul_jnp(x, qw, sc, qz, out_features=n))
    np.testing.assert_allclose(got, want, atol=1e-4)

    xp = gemm._pad_x_k(x, qw)
    assert pallas_gemm.supported(xp, qw, g)
    got_pl = np.asarray(pallas_gemm.awq_matmul_pallas(
        xp, qw, sc, qz, out_features=n, interpret=True))
    np.testing.assert_allclose(got_pl, want, atol=5e-2, rtol=1e-3)

    dx = jax.grad(lambda xx: gemm.awq_matmul(
        xx, qw, sc, qz, out_features=n).sum())(x)
    assert dx.shape == x.shape


def test_pack_planar_jnp_bit_identical(rng):
    """The device-side packer (ops/gemm.pack_planar_jnp — keeps the
    quantizer's packing on-accelerator, no host nibble round-trip) must be
    bit-identical to the host packer across layouts: odd rows, small-N,
    lane-padded N, and superblocked N >= 1024."""
    from autoawq_tpu.ops.gemm import (pack_planar_jnp, pad_k_nibbles_jnp,
                                      pad_scales_jnp)

    for r, n in [(8, 32), (7, 48), (64, 200), (16, 1024), (10, 1100)]:
        q4 = rng.integers(0, 16, (r, n)).astype(np.int32)
        want = packing.pack_planar(q4)
        got = np.asarray(pack_planar_jnp(jnp.asarray(q4)))
        np.testing.assert_array_equal(got, want, err_msg=f"{r}x{n}")

    # pad twins agree with the host versions
    k, n, g = 96, 64, 32
    q4 = rng.integers(0, 16, (k, n)).astype(np.int32)
    sc = rng.random((k // g, n), dtype=np.float32)
    z4 = rng.integers(0, 16, (k // g, n)).astype(np.int32)
    hq, hs, hz = packing.pad_k_nibbles(q4, sc, z4, g)
    jq, js, jz = pad_k_nibbles_jnp(jnp.asarray(q4), jnp.asarray(sc),
                                   jnp.asarray(z4), group_size=g)
    np.testing.assert_array_equal(np.asarray(jq), hq)
    np.testing.assert_array_equal(np.asarray(jz), hz)
    np.testing.assert_allclose(np.asarray(js), hs)
    np.testing.assert_allclose(
        np.asarray(pad_scales_jnp(jnp.asarray(sc))),
        packing.pad_scales_planar(sc))


def test_k_padded_model_under_tp(rng, requires_multidevice):
    """K-padded weights compose with Megatron-TP sharding: the sharded
    greedy stream must bit-match the unsharded one (h=384 at g128 is 3
    groups — odd — padded to 512; x zero-pad happens per shard)."""
    from autoawq_tpu.parallel.mesh import build_mesh

    cfg = ModelConfig(
        model_type="llama", vocab_size=128, hidden_size=384,
        intermediate_size=512, num_hidden_layers=2, num_attention_heads=6,
        num_key_value_heads=2, head_dim=64, max_position_embeddings=64)
    params = init_random_params(cfg, seed=1, scale=0.08)
    calib = rng.integers(0, 128, (2, 16))
    q = AwqQuantizer(cfg, AwqConfig(q_group_size=128), params, calib,
                     progress=False).quantize()
    assert q["layers"][0]["mlp"]["gate_proj"]["qweight"].shape[0] == 256

    m = AwqCausalLM(cfg, q, AwqConfig(q_group_size=128))
    toks = jnp.asarray(rng.integers(0, 128, (1, 8)))
    ref = np.asarray(m.generate(toks, max_new_tokens=6))
    mesh = build_mesh(tensor=2, data=4)
    m.shard(mesh)
    with mesh:
        got = np.asarray(m.generate(toks, max_new_tokens=6))
    np.testing.assert_array_equal(ref, got)
