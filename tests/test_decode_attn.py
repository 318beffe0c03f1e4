"""Fused decode-attention kernel vs the XLA einsum oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autoawq_tpu.ops import decode_attn

INTERP = jax.default_backend() != "tpu"


def _oracle(q, kc, vc, valid, scale, window=None):
    """kc/vc: [B, nkv, T, hd]."""
    b, nh, hd = q.shape
    nkv, t = kc.shape[1], kc.shape[2]
    rep = nh // nkv
    k = np.repeat(kc, rep, axis=1)
    v = np.repeat(vc, rep, axis=1)
    s = np.einsum("bhd,bhtd->bht", q, k) * scale
    idx = np.arange(t)
    ok = idx < valid
    if window is not None:
        ok &= idx >= valid - window
    s = np.where(ok[None, None, :], s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bht,bhtd->bhd", p, v).reshape(b, nh * hd)


@pytest.mark.parametrize("nh,nkv,hd,t,valid", [
    (8, 2, 64, 128, 37),    # GQA rep=4
    (8, 8, 64, 128, 128),   # MHA, full cache
    (16, 2, 128, 512, 1),   # rep=8, single valid row
    (4, 2, 32, 40, 17),     # odd-ish T (multiple of 8)
])
def test_decode_attention_matches_oracle(rng, nh, nkv, hd, t, valid):
    b = 2
    q = rng.standard_normal((b, nh, hd)).astype(np.float32)
    kc = rng.standard_normal((b, nkv, t, hd)).astype(np.float32)
    vc = rng.standard_normal((b, nkv, t, hd)).astype(np.float32)
    scale = hd ** -0.5
    got = np.asarray(decode_attn.decode_attention(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), jnp.int32(valid),
        scale=scale, interpret=INTERP))
    want = _oracle(q, kc, vc, valid, scale)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_decode_attention_sliding_window(rng):
    b, nh, nkv, hd, t, valid, win = 1, 8, 4, 64, 256, 200, 64
    q = rng.standard_normal((b, nh, hd)).astype(np.float32)
    kc = rng.standard_normal((b, nkv, t, hd)).astype(np.float32)
    vc = rng.standard_normal((b, nkv, t, hd)).astype(np.float32)
    got = np.asarray(decode_attn.decode_attention(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), jnp.int32(valid),
        scale=hd ** -0.5, window=win, interpret=INTERP))
    want = _oracle(q, kc, vc, valid, hd ** -0.5, window=win)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_decode_step_uses_kernel_and_matches_jnp(rng):
    """End-to-end decode step: method="pallas" (kernel, interpreted on CPU)
    vs method="jnp" (einsum path) on a tiny quantized llama."""
    from autoawq_tpu.models.config import ModelConfig
    from autoawq_tpu.serve import generate as gen
    from autoawq_tpu.utils.synth import random_quantized_params

    cfg = ModelConfig(model_type="llama", vocab_size=64, hidden_size=256,
                      intermediate_size=512, num_hidden_layers=2,
                      num_attention_heads=8, num_key_value_heads=2,
                      head_dim=32, max_position_embeddings=64)
    params = random_quantized_params(cfg, seed=0, group_size=64,
                                     fp_dtype="float32")
    prompt = jnp.asarray(rng.integers(0, 64, (1, 8)))
    outs = {}
    for m in ("jnp", "pallas"):
        caches = gen.init_kv_cache(cfg, 1, 32, jnp.float32)
        logits, caches = gen.prefill(cfg, params, prompt, caches, m,
                                     jnp.float32)
        tok = jnp.argmax(logits, -1)[:, None]
        logits2, _ = gen.decode_step(cfg, params, tok, caches, jnp.int32(8),
                                     m, jnp.float32)
        outs[m] = np.asarray(logits2)
    np.testing.assert_allclose(outs["pallas"], outs["jnp"], rtol=2e-4,
                               atol=2e-4)
