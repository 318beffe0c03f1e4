"""int8 KV cache (init_kv_cache kv_quant=True): quantization error bound,
decode-logits fidelity vs the bf16/f32 cache, and engine integration.
The reference has no cache quantization (fp16 windows only,
awq/modules/fused/cache.py) — this is a TPU-serving bandwidth feature:
half the cache bytes at decode, dequant folded into the score/prob
matrices (nn/modules.attention grouped branch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoawq_tpu.io.hf import init_random_params
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules
from autoawq_tpu.serve import generate as gen

CFG = ModelConfig(
    model_type="llama", vocab_size=128, hidden_size=64,
    intermediate_size=128, num_hidden_layers=2, num_attention_heads=8,
    num_key_value_heads=2, head_dim=8, max_position_embeddings=64)


def test_kv_quantize_error_bound(rng):
    u = jnp.asarray(rng.standard_normal((2, 3, 5, 16)).astype(np.float32))
    q, s = modules._kv_quantize(u)
    assert q.dtype == jnp.int8
    back = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    err = np.abs(back - np.asarray(u))
    # absmax/127 scale: per-element error <= s/2 (round-to-nearest)
    assert (err <= np.asarray(s)[..., None] * 0.5 + 1e-7).all()


def _decode_logits(params, prompt, n, kv_quant):
    caches = gen.init_kv_cache(CFG, prompt.shape[0], prompt.shape[1] + n,
                               jnp.float32, kv_quant=kv_quant)
    logits, caches = gen.prefill(CFG, params, prompt, caches, "auto",
                                 jnp.float32)
    pos = jnp.int32(prompt.shape[1])
    tok = jnp.argmax(logits, -1)[:, None]
    out = []
    for _ in range(n):
        logits, caches = gen.decode_step(CFG, params, tok, caches, pos,
                                         "auto", jnp.float32)
        out.append(np.asarray(logits))
        tok = jnp.argmax(logits, -1)[:, None]
        pos = pos + 1
    return np.stack(out)


def test_int8_cache_decode_fidelity(rng):
    params = init_random_params(CFG, seed=3)
    prompt = jnp.asarray(rng.integers(0, 128, (2, 9)))
    fp = _decode_logits(params, prompt, 5, kv_quant=False)
    q8 = _decode_logits(params, prompt, 5, kv_quant=True)
    # int8 absmax cache: small relative logits perturbation, same argmax
    scale = np.abs(fp).max()
    assert np.abs(q8 - fp).max() < 0.05 * scale
    assert (q8.argmax(-1) == fp.argmax(-1)).mean() > 0.99


def test_int8_cache_generation_runs(rng):
    params = init_random_params(CFG, seed=4)
    prompt = jnp.asarray(rng.integers(0, 128, (1, 7)))
    fp = np.asarray(gen.generate_compiled(CFG, params, prompt, 8,
                                          method="auto", dtype=jnp.float32))
    q8 = np.asarray(gen.generate_compiled(CFG, params, prompt, 8,
                                          method="auto", dtype=jnp.float32,
                                          kv_quant=True))
    assert q8.shape == fp.shape
    # greedy streams agree on a short horizon for a well-separated model
    assert (q8 == fp).mean() > 0.85


def test_int8_cache_batched_engine(rng):
    from autoawq_tpu.serve.batching import BatchingEngine

    params = init_random_params(CFG, seed=5)
    prompts = [rng.integers(0, 128, (n,)) for n in (5, 9)]
    eng = BatchingEngine(CFG, params, max_batch=2, max_seq_len=32,
                         dtype=jnp.float32, kv_quant=True)
    for i, p in enumerate(prompts):
        eng.add_request(i, p, max_new_tokens=5)
    got = eng.run()
    assert set(got) == {0, 1}
    for i in got:
        assert len(got[i]) == 5


def test_int8_cache_mha_grouped_path(rng):
    """nkv == nh (MHA) also takes the grouped branch when quantized —
    rep=1 folding must be correct."""
    cfg = ModelConfig(
        model_type="llama", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=1, num_attention_heads=4,
        num_key_value_heads=4, head_dim=16, max_position_embeddings=32)
    params = init_random_params(cfg, seed=6)
    prompt = jnp.asarray(rng.integers(0, 128, (1, 6)))

    def logits_for(kv_quant):
        caches = gen.init_kv_cache(cfg, 1, 16, jnp.float32,
                                   kv_quant=kv_quant)
        logits, caches = gen.prefill(cfg, params, prompt, caches, "auto",
                                     jnp.float32)
        tok = jnp.argmax(logits, -1)[:, None]
        logits, _ = gen.decode_step(cfg, params, tok, caches, jnp.int32(6),
                                    "auto", jnp.float32)
        return np.asarray(logits)

    fp, q8 = logits_for(False), logits_for(True)
    assert np.abs(q8 - fp).max() < 0.05 * np.abs(fp).max()


MLA_CFG = ModelConfig(
    model_type="deepseek_v2", vocab_size=128, hidden_size=64,
    intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=4, q_lora_rank=None, kv_lora_rank=32,
    qk_rope_head_dim=8, qk_nope_head_dim=16, v_head_dim=16,
    max_position_embeddings=64)


def test_int8_mla_latent_decode_fidelity(rng):
    """int8 MLA latent cache (contiguous engine): the absorbed decode
    folds the per-part absmax scales into the score/prob matrices; logits
    stay close to the fp latent cache and argmax agrees."""
    params = init_random_params(MLA_CFG, seed=7)
    prompt = jnp.asarray(rng.integers(0, 128, (2, 9)))

    def decode_logits(kv_quant):
        caches = gen.init_kv_cache(MLA_CFG, 2, 24, jnp.float32,
                                   kv_quant=kv_quant)
        assert ("c_s" in caches[0]) == kv_quant
        logits, caches = gen.prefill(MLA_CFG, params, prompt, caches,
                                     "jnp", jnp.float32)
        pos = jnp.int32(9)
        tok = jnp.argmax(logits, -1)[:, None]
        out = []
        for _ in range(5):
            logits, caches = gen.decode_step(MLA_CFG, params, tok, caches,
                                             pos, "jnp", jnp.float32)
            out.append(np.asarray(logits))
            tok = jnp.argmax(logits, -1)[:, None]
            pos = pos + 1
        return np.stack(out)

    fp = decode_logits(False)
    q8 = decode_logits(True)
    assert np.abs(q8 - fp).max() < 0.05 * np.abs(fp).max()
    assert (q8.argmax(-1) == fp.argmax(-1)).mean() > 0.99


def test_int8_mla_batched_engine(rng):
    """MLA + kv_quant now composes with the contiguous slot engine
    (the former NotImplementedError gate is gone)."""
    from autoawq_tpu.serve.batching import BatchingEngine

    params = init_random_params(MLA_CFG, seed=8)
    prompts = [rng.integers(0, 128, (n,)) for n in (5, 9)]
    eng = BatchingEngine(MLA_CFG, params, max_batch=2, max_seq_len=32,
                         dtype=jnp.float32, kv_quant=True, method="jnp")
    for i, p in enumerate(prompts):
        eng.add_request(i, p, max_new_tokens=5)
    got = eng.run()
    assert set(got) == {0, 1}
    for i in got:
        assert len(got[i]) == 5
    ref = BatchingEngine(MLA_CFG, params, max_batch=2, max_seq_len=32,
                         dtype=jnp.float32, kv_quant=False, method="jnp")
    for i, p in enumerate(prompts):
        ref.add_request(i, p, max_new_tokens=5)
    want = ref.run()
    agree = np.mean([t == w for i in got
                     for t, w in zip(got[i], want[i])])
    assert agree > 0.7  # int8 is lossy; streams stay mostly aligned
