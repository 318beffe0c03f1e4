"""Opt-in lm_head quantization (AwqQuantizer quantize_lm_head=True):
clip-searched int4 head, packed through the normal LIN path, round-trips
through save/load, with bounded logit perturbation. The reference always
leaves lm_head fp16 — this is a decode-bandwidth option (the bf16 head
matvec is ~10-20% of the bs1 weight stream)."""

import jax.numpy as jnp
import numpy as np
import pytest

from autoawq_tpu import AwqCausalLM, AwqConfig
from autoawq_tpu.io.hf import init_random_params
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.quantize.quantizer import AwqQuantizer

CFG = ModelConfig(
    model_type="llama", vocab_size=256, hidden_size=64,
    intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=2, head_dim=16, max_position_embeddings=64)


def _quantize(rng, params, **kw):
    calib = rng.integers(0, CFG.vocab_size, (2, 16))
    q = AwqQuantizer(CFG, AwqConfig(q_group_size=32), params, calib,
                     progress=False, **kw)
    return q.quantize()


def test_lm_head_quantized_and_bounded(rng, tmp_path):
    params = init_random_params(CFG, seed=3)
    base = _quantize(rng, params)
    withhead = _quantize(rng, params, quantize_lm_head=True)
    assert "qweight" in withhead["lm_head"]
    assert "kernel" not in withhead["lm_head"]

    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 12)))
    from autoawq_tpu.nn import modules

    ref = np.asarray(modules.forward(CFG, base, tokens, method="jnp",
                                     dtype=np.float32))
    got = np.asarray(modules.forward(CFG, withhead, tokens, method="jnp",
                                     dtype=np.float32))
    # int4 g32 on h=64 is coarse (error accumulates over only 64 taps) and
    # the random net's logits are near-tied, so top-1 agreement is
    # seed-brittle (it broke when init_random_params changed its draw
    # order). The functional gate is KL(ref || quant-head): measured
    # ~7e-4 across seeds vs entropy ~5.5 nats; a broken head gives O(1).
    assert np.abs(got - ref).max() < 0.5 * np.abs(ref).max()

    def logsm(x):
        m = x.max(-1, keepdims=True)
        return x - m - np.log(np.exp(x - m).sum(-1, keepdims=True))

    lr, lg = logsm(ref), logsm(got)
    kl = (np.exp(lr) * (lr - lg)).sum(-1)
    assert kl.max() < 0.05, kl.max()

    # save/load round-trip through the public API
    model = AwqCausalLM(CFG, withhead, AwqConfig(q_group_size=32))
    model.save_quantized(str(tmp_path))
    from autoawq_tpu.io import serialize

    _, _, loaded = serialize.from_quantized(str(tmp_path))
    assert "qweight" in loaded["lm_head"]
    re = np.asarray(modules.forward(CFG, loaded, tokens, method="jnp",
                                    dtype=np.float32))
    np.testing.assert_allclose(re, got, rtol=2e-3, atol=2e-3)


def test_tied_embeddings_skip(rng):
    cfg = ModelConfig(
        model_type="llama", vocab_size=256, hidden_size=64,
        intermediate_size=128, num_hidden_layers=1, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=64,
        tie_word_embeddings=True)
    params = init_random_params(cfg, seed=4)
    assert params.get("lm_head") is None
    calib = rng.integers(0, cfg.vocab_size, (2, 16))
    out = AwqQuantizer(cfg, AwqConfig(q_group_size=32), params, calib,
                       progress=False, quantize_lm_head=True).quantize()
    assert out.get("lm_head") is None  # silently skipped, embeds untouched
