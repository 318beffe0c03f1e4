"""Sampling warpers vs the HF implementations the reference inherits
(transformers LogitsProcessor / GenerationMixin; the reference calls
model.generate directly, awq/models/base.py), plus reference-semantics
calibration block composition (awq/utils/calib_data.py:41-65)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from autoawq_tpu.quantize.calib import get_calib_dataset
from autoawq_tpu.serve import generate as gen


def _rand_logits(rng, b=3, v=50):
    return rng.standard_normal((b, v)).astype(np.float32) * 3.0


def test_top_k_matches_hf(rng):
    from transformers import TopKLogitsWarper

    logits = _rand_logits(rng)
    for k in (1, 5, 17):
        ref = TopKLogitsWarper(k)(None, torch.tensor(logits)).numpy()
        got = np.asarray(gen._mask_top_k(jnp.asarray(logits), k))
        np.testing.assert_array_equal(np.isinf(got), np.isinf(ref))
        np.testing.assert_allclose(np.where(np.isinf(got), 0, got),
                                   np.where(np.isinf(ref), 0, ref), rtol=1e-6)


def test_top_p_matches_hf(rng):
    from transformers import TopPLogitsWarper

    logits = _rand_logits(rng)
    for p in (0.1, 0.5, 0.9, 0.99):
        ref = TopPLogitsWarper(p)(None, torch.tensor(logits)).numpy()
        got = np.asarray(gen._mask_top_p(jnp.asarray(logits), p))
        kept_ref = ~np.isinf(ref)
        kept_got = ~np.isinf(got)
        np.testing.assert_array_equal(kept_got, kept_ref, err_msg=f"p={p}")


def test_top_p_always_keeps_argmax(rng):
    logits = _rand_logits(rng, b=4)
    got = np.asarray(gen._mask_top_p(jnp.asarray(logits), 0.0001))
    kept = ~np.isinf(got)
    assert (kept.sum(-1) >= 1).all()
    assert kept[np.arange(4), logits.argmax(-1)].all()


def test_repetition_penalty_matches_hf(rng):
    from transformers import RepetitionPenaltyLogitsProcessor

    v = 50
    logits = _rand_logits(rng, b=2, v=v)
    seen_ids = [[3, 7, 7, 12], [0, 49, 21, 3]]
    ref = RepetitionPenaltyLogitsProcessor(1.7)(
        torch.tensor(seen_ids), torch.tensor(logits)).numpy()
    presence = np.zeros((2, v), bool)
    for i, row in enumerate(seen_ids):
        presence[i, row] = True
    got = np.asarray(gen.apply_repetition_penalty(
        jnp.asarray(logits), jnp.asarray(presence), 1.7))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_sample_top_k1_is_greedy(rng):
    logits = jnp.asarray(_rand_logits(rng))
    tok = gen.sample(logits, 0.8, jax_key(), top_k=1)
    np.testing.assert_array_equal(np.asarray(tok),
                                  np.asarray(jnp.argmax(logits, -1)))


def jax_key():
    import jax

    return jax.random.PRNGKey(0)


def test_generate_with_sampling_runs(rng):
    """Smoke: top-k/top-p/repetition-penalty generation stays in-vocab and
    compiled top-k/top-p generation works under jit."""
    from autoawq_tpu.io.hf import init_random_params
    from autoawq_tpu.models.config import ModelConfig

    cfg = ModelConfig(
        model_type="llama", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=64)
    params = init_random_params(cfg, seed=3, scale=0.08)
    prompt = jnp.asarray(rng.integers(0, 64, (2, 5)))
    out = gen.generate(cfg, params, prompt, 6, temperature=0.9, top_k=10,
                       top_p=0.9, repetition_penalty=1.3, method="jnp",
                       dtype=jnp.float32)
    assert out.shape == (2, 11) and (np.asarray(out) < 64).all()
    outc = gen.generate_compiled(cfg, params, prompt, 6, temperature=0.9,
                                 top_k=10, top_p=0.9, method="jnp",
                                 dtype=jnp.float32)
    assert outc.shape == (2, 11) and (np.asarray(outc) < 64).all()


# --------------------------------------------------------------------- #
# calibration composition (reference awq/utils/calib_data.py)


def test_calib_drops_long_samples():
    """Reference semantics: samples longer than max_seq_len never enter the
    stream (calib_data.py:50-51), and selection stops at n_samples
    survivors (calib_data.py:56-58)."""
    short_a = list(range(100, 110))   # 10 tokens
    too_long = list(range(40))        # 40 tokens: dropped at max_seq_len=16
    short_b = list(range(200, 214))   # 14 tokens
    short_c = list(range(300, 310))   # 10 tokens
    out = get_calib_dataset([short_a, too_long, short_b, short_c],
                            n_samples=3, max_seq_len=16)
    # survivors: a + b + c = 34 tokens -> 2 blocks of 16
    ref_cat = short_a + short_b + short_c
    assert out.shape == (2, 16)
    np.testing.assert_array_equal(out.reshape(-1), ref_cat[:32])


def test_calib_keep_all_flag():
    """filter_long_samples=False keeps the pre-round-2 concat-all behavior."""
    out = get_calib_dataset([list(range(40)), list(range(40, 50))],
                            n_samples=3, max_seq_len=16,
                            filter_long_samples=False)
    assert out.shape == (3, 16)
    np.testing.assert_array_equal(out.reshape(-1),
                                  (list(range(40)) + list(range(40, 50)))[:48])


def test_calib_matches_reference_oracle():
    """Same token lists through the reference's get_calib_dataset produce
    the identical blocks (run the reference code itself as oracle)."""
    ref_fn = pytest.importorskip("tests.refutil").reference_calib
    rng = np.random.default_rng(0)
    data = [rng.integers(0, 1000, (int(n),)).tolist()
            for n in rng.integers(3, 40, (20,))]
    ours = get_calib_dataset(data, n_samples=8, max_seq_len=24)
    theirs = ref_fn(data, n_samples=8, max_seq_len=24)
    np.testing.assert_array_equal(ours, theirs)
