"""AWQ calibration engine end-to-end on tiny models."""

import numpy as np
import jax.numpy as jnp
import pytest

from autoawq_tpu.config import AwqConfig
from autoawq_tpu.io.hf import init_random_params
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules
from autoawq_tpu.quantize.quantizer import AwqQuantizer
from autoawq_tpu.utils.tree import iter_linears

TINY = ModelConfig(
    model_type="llama",
    vocab_size=256,
    hidden_size=128,
    intermediate_size=256,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=4,  # MHA so the v->o scale group is exercised
    head_dim=32,
    max_position_embeddings=64,
)
QCFG = AwqConfig(q_group_size=32)


def make_outlier_params(cfg, seed=0):
    """Random params with activation outliers (a few hot embed channels) —
    the regime AWQ's activation-aware scaling is built for."""
    params = init_random_params(cfg, seed=seed)
    w = params["embed_tokens"]["weight"]
    w[:, :6] *= 8.0
    return params


def rel_logit_err(cfg, params_a, params_b, tokens):
    la = modules.forward(cfg, params_a, jnp.asarray(tokens), method="jnp")
    lb = modules.forward(cfg, params_b, jnp.asarray(tokens), method="jnp")
    return float(jnp.mean((la - lb) ** 2) / jnp.var(la))


def rtn_quantize(cfg, params, qcfg):
    """Plain round-to-nearest baseline (no AWQ search)."""
    from autoawq_tpu.quantize.quantizer import quantize_linear_params, _clone

    out = _clone(params)
    for i, lp in enumerate(out["layers"]):
        for path, p in list(iter_linears(lp)):
            from autoawq_tpu.utils.tree import set_by_path

            set_by_path(lp, path, quantize_linear_params(
                {k: jnp.asarray(v) for k, v in p.items()}, qcfg))
    return out


def test_quantize_end_to_end(rng):
    params = make_outlier_params(TINY)
    calib = rng.integers(0, TINY.vocab_size, (4, 32))
    q = AwqQuantizer(TINY, QCFG, params, calib, progress=False)
    qparams = q.quantize()

    # every eligible linear became a packed quant LIN
    n_quant = sum(
        1 for lp in qparams["layers"] for _, p in iter_linears(lp)
        if "qweight" in p
    )
    assert n_quant == 2 * 7
    # metadata recorded: 4 scale groups and >=4 clip entries per layer
    assert len(q.all_scales) == 2 and len(q.all_scales[0]) == 4
    assert all(len(c) == 5 for c in q.all_clips)  # v,o,gate,up,down (q/k excluded)

    test_tokens = rng.integers(0, TINY.vocab_size, (2, 24))
    err = rel_logit_err(TINY, params, qparams, test_tokens)
    assert np.isfinite(err) and err < 0.1, err


def test_chunked_calibration_matches_unchunked(rng):
    """n_parallel_calib_samples + offload_taps must reproduce the
    unchunked calibration bit-for-bit: same folded scales, same clips,
    same packed weights (the reference only asserts chunked STATS match,
    tests/test_quantization.py:4-33 — we gate the whole pipeline)."""
    calib = rng.integers(0, TINY.vocab_size, (6, 32))

    q_full = AwqQuantizer(TINY, QCFG, make_outlier_params(TINY), calib,
                          progress=False)
    p_full = q_full.quantize()
    q_chunk = AwqQuantizer(TINY, QCFG, make_outlier_params(TINY), calib,
                           progress=False, n_parallel_calib_samples=2,
                           offload_taps=True)
    p_chunk = q_chunk.quantize()

    for (g1, s1), (g2, s2) in zip(q_full.all_scales[0], q_chunk.all_scales[0]):
        assert g1 == g2
        np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)
    for lp1, lp2 in zip(p_full["layers"], p_chunk["layers"]):
        for (path, a), (_, b) in zip(iter_linears(lp1), iter_linears(lp2)):
            np.testing.assert_array_equal(np.asarray(a["qweight"]),
                                          np.asarray(b["qweight"]), err_msg=path)


def test_awq_beats_rtn_with_outliers(rng):
    params = make_outlier_params(TINY, seed=1)
    calib = rng.integers(0, TINY.vocab_size, (4, 32))
    qparams = AwqQuantizer(TINY, QCFG, params, calib, progress=False).quantize()
    rparams = rtn_quantize(TINY, params, QCFG)

    test_tokens = rng.integers(0, TINY.vocab_size, (2, 24))
    err_awq = rel_logit_err(TINY, params, qparams, test_tokens)
    err_rtn = rel_logit_err(TINY, params, rparams, test_tokens)
    assert err_awq < err_rtn, (err_awq, err_rtn)


def test_export_compatible_then_pack(rng):
    params = make_outlier_params(TINY, seed=2)
    calib = rng.integers(0, TINY.vocab_size, (2, 16))
    q = AwqQuantizer(TINY, QCFG, params, calib, progress=False)
    fp_scaled = q.quantize(export_compatible=True)
    # still fp kernels
    assert all(
        "kernel" in p for lp in fp_scaled["layers"]
        for _, p in iter_linears(lp)
    )
    packed = q.pack(fp_scaled)
    assert any(
        "qweight" in p for lp in packed["layers"]
        for _, p in iter_linears(lp)
    )


def test_moe_quantize_end_to_end(rng):
    cfg = ModelConfig(
        model_type="mixtral",
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=4,
        head_dim=16,
        num_experts=4,
        num_experts_per_tok=2,
    )
    params = init_random_params(cfg, seed=3)
    calib = rng.integers(0, cfg.vocab_size, (2, 16))
    q = AwqQuantizer(cfg, AwqConfig(q_group_size=32), params, calib,
                     progress=False)
    qparams = q.quantize()
    lp = qparams["layers"][0]
    assert "qweight" in lp["mlp"]["experts"][0]["gate_proj"]
    assert "kernel" in lp["mlp"]["gate"]  # router never quantized
    tokens = rng.integers(0, cfg.vocab_size, (1, 8))
    err = rel_logit_err(cfg, params, qparams, tokens)
    assert np.isfinite(err) and err < 0.2, err


def test_phi3_quantize_end_to_end(rng):
    cfg = ModelConfig(
        model_type="phi3",
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=4,
        head_dim=16,
        max_position_embeddings=64,
    )
    from autoawq_tpu.nn.fuse import fuse_model
    from autoawq_tpu.io.hf import init_random_params

    params = fuse_model(cfg, init_random_params(cfg, seed=5))
    calib = rng.integers(0, cfg.vocab_size, (2, 16))
    q = AwqQuantizer(cfg, AwqConfig(q_group_size=32), params, calib,
                     progress=False)
    qparams = q.quantize()
    lp = qparams["layers"][0]
    assert "qweight" in lp["self_attn"]["qkv_proj"]
    assert "qweight" in lp["mlp"]["gate_up_proj"]
    assert len(q.all_scales[0]) == 4
    tokens = rng.integers(0, cfg.vocab_size, (1, 8))
    err = rel_logit_err(cfg, params, qparams, tokens)
    assert np.isfinite(err) and err < 0.2, err


def test_max_chunk_memory_matches_unbudgeted(rng):
    """max_chunk_memory (reference quantizer.py:329-348, 444-474) bounds
    the fp32 statistics buffers without changing results: same chosen
    scales/clips and packed weights as the single-pass run (sum-of-chunk
    accumulation is associativity-equal to fp32 tolerance)."""
    calib = rng.integers(0, TINY.vocab_size, (6, 32))

    q_full = AwqQuantizer(TINY, QCFG, make_outlier_params(TINY), calib,
                          progress=False)
    p_full = q_full.quantize()
    # a few KB forces multi-chunk x_mean AND a narrowed clip chunk
    q_budget = AwqQuantizer(TINY, QCFG, make_outlier_params(TINY), calib,
                            progress=False, max_chunk_memory=16 * 1024)
    p_budget = q_budget.quantize()

    # the chunked x_mean accumulation is sum-of-sums — scales must agree
    # to fp32 association tolerance
    for (g1, s1), (g2, s2) in zip(q_full.all_scales[0],
                                  q_budget.all_scales[0]):
        assert g1 == g2
        np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)
    # the narrowed clip chunk reassociates fp32 reductions, which can
    # flip near-tied grid points (the reference's max_chunk_memory does
    # the same); require near-total agreement, not bit equality
    for c1, c2 in zip(q_full.all_clips, q_budget.all_clips):
        for (path, a), (_, b) in zip(c1, c2):
            agree = np.isclose(a, b, rtol=1e-5, atol=1e-6).mean()
            assert agree > 0.97, (path, agree)
    # end to end the quantized weights stay overwhelmingly identical
    same = tot = 0
    for lp1, lp2 in zip(p_full["layers"], p_budget["layers"]):
        for (path, a), (_, b) in zip(iter_linears(lp1), iter_linears(lp2)):
            qa, qb = np.asarray(a["qweight"]), np.asarray(b["qweight"])
            same += (qa == qb).sum()
            tot += qa.size
    assert same / tot > 0.98, same / tot


def test_keep_on_device_and_weight_dtype(rng):
    """Big-model tunnel knobs: keep_on_device=True leaves packed layers as
    jax arrays (no per-layer device_get) with identical packed bits;
    weight_dtype=bf16 (the reference calibrates fp16 weights on GPU)
    produces a close-but-not-identical quantization whose logits stay in
    the fp-quantization error band."""
    import jax

    params = make_outlier_params(TINY, seed=3)
    calib = rng.integers(0, TINY.vocab_size, (4, 32))

    base = AwqQuantizer(TINY, QCFG, params, calib, progress=False).quantize()
    kept = AwqQuantizer(TINY, QCFG, params, calib, progress=False,
                        keep_on_device=True).quantize()
    for (pa, a), (pb, b) in zip(iter_linears(base["layers"][0]),
                                iter_linears(kept["layers"][0])):
        assert isinstance(b["qweight"], jax.Array)
        np.testing.assert_array_equal(np.asarray(a["qweight"]),
                                      np.asarray(b["qweight"]))

    bf16 = AwqQuantizer(TINY, QCFG, params, calib, progress=False,
                        weight_dtype=jnp.bfloat16).quantize()
    tokens = rng.integers(0, TINY.vocab_size, (2, 16))
    err_f32 = rel_logit_err(TINY, params, base, tokens)
    err_bf16 = rel_logit_err(TINY, params, bf16, tokens)
    # bf16 search inputs shift the result slightly; both stay quantized-
    # quality (same order of magnitude as the f32-search error)
    assert err_bf16 < max(4 * err_f32, 0.05), (err_bf16, err_f32)

    with pytest.raises(ValueError):
        AwqQuantizer(TINY, QCFG, params, calib, progress=False,
                     keep_on_device=True, resume_dir="/tmp/x")
