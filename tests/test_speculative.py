"""Speculative decoding (serve/speculative.py): greedy output must equal
the target's own greedy stream token-for-token regardless of draft quality;
a self-draft must accept every proposal."""

import jax.numpy as jnp
import numpy as np
import pytest

from autoawq_tpu.io.hf import init_random_params
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.serve import generate as gen
from autoawq_tpu.serve.speculative import generate_speculative

TARGET = ModelConfig(
    model_type="llama", vocab_size=128, hidden_size=64,
    intermediate_size=128, num_hidden_layers=2, num_attention_heads=8,
    num_key_value_heads=2, head_dim=8, max_position_embeddings=128)
DRAFT = ModelConfig(
    model_type="llama", vocab_size=128, hidden_size=32,
    intermediate_size=64, num_hidden_layers=1, num_attention_heads=4,
    num_key_value_heads=4, head_dim=8, max_position_embeddings=128)


@pytest.mark.parametrize("k", [1, 3, 5])
def test_speculative_matches_greedy(rng, k):
    params = init_random_params(TARGET, seed=3)
    draft_params = init_random_params(DRAFT, seed=11)
    prompt = jnp.asarray(rng.integers(0, 128, (1, 9)))

    want = np.asarray(gen.generate_compiled(
        TARGET, params, prompt, 20, method="jnp", dtype=jnp.float32))
    got, stats = generate_speculative(
        TARGET, params, DRAFT, draft_params, prompt, 20, k=k,
        method="jnp", dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), want)
    assert 0.0 <= stats["accept_rate"] <= 1.0


def test_self_draft_accepts_everything(rng):
    """Draft == target: every proposal matches, so each round accepts k
    tokens and emits k+1."""
    params = init_random_params(TARGET, seed=4)
    prompt = jnp.asarray(rng.integers(0, 128, (1, 6)))
    got, stats = generate_speculative(
        TARGET, params, TARGET, params, prompt, 16, k=4,
        method="jnp", dtype=jnp.float32)
    want = np.asarray(gen.generate_compiled(
        TARGET, params, prompt, 16, method="jnp", dtype=jnp.float32))
    np.testing.assert_array_equal(np.asarray(got), want)
    assert stats["accept_rate"] == 1.0


def test_batched_speculative_matches_greedy(rng):
    """B > 1 routes through the pool engine; every row's greedy stream
    still bit-matches target-only greedy generation."""
    params = init_random_params(TARGET, seed=3)
    draft_params = init_random_params(DRAFT, seed=11)
    prompt = jnp.asarray(rng.integers(0, 128, (3, 9)))

    want = np.asarray(gen.generate_compiled(
        TARGET, params, prompt, 14, method="jnp", dtype=jnp.float32))
    got, stats = generate_speculative(
        TARGET, params, DRAFT, draft_params, prompt, 14, k=3,
        method="jnp", dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), want)
    assert 0.0 <= stats["accept_rate"] <= 1.0
    assert stats["rounds"] > 0


def test_vocab_mismatch_rejected(rng):
    bad = ModelConfig(
        model_type="llama", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=1, num_attention_heads=4,
        num_key_value_heads=4, head_dim=8, max_position_embeddings=64)
    with pytest.raises(ValueError):
        generate_speculative(
            TARGET, init_random_params(TARGET, seed=1), bad,
            init_random_params(bad, seed=2),
            jnp.zeros((1, 4), jnp.int32), 4)


def test_accept_resample_marginal_matches_target():
    """The speculative-sampling theorem: for ANY draft distribution q, the
    emitted token at the first position is distributed exactly as the
    target p. Empirical check at V=8 over 20k trials."""
    import jax

    from autoawq_tpu.serve.speculative import accept_resample

    rng = np.random.default_rng(7)
    p = rng.random((2, 8)).astype(np.float64)
    p /= p.sum(-1, keepdims=True)
    q = rng.random((1, 8)).astype(np.float64) ** 2  # deliberately far from p
    q /= q.sum(-1, keepdims=True)

    n = 20000
    counts = np.zeros(8)
    draws = rng.choice(8, size=n, p=q[0])  # proposals ~ q
    for t in range(n):
        a, nxt = accept_resample(p, q, [int(draws[t])],
                                 jax.random.PRNGKey(t))
        first = int(draws[t]) if a >= 1 else nxt
        counts[first] += 1
    emp = counts / n
    # 20k trials: per-bin std <= sqrt(p(1-p)/n) ~ 0.0035; 4 sigma rail
    assert np.abs(emp - p[0]).max() < 0.016, (emp, p[0])


def test_sampled_self_draft_accepts_almost_everything(rng):
    """Self-draft acceptance: with temperature-only warping the p/q ratio
    is 1 up to the ULP-level difference between the draft's decode-step
    logits and the target's chunk-verify logits, so acceptance is ~1.
    (Truncation warpers can amplify that ULP into a hard 0 at the
    top-k/top-p boundary — an inherent property of speculative sampling
    with truncation; rejections only cost speed, never correctness.)
    This test also guards the all-accepted draft-cache catch-up step: a
    missing d_k row drops self-draft acceptance to ~0.8."""
    params = init_random_params(TARGET, seed=4)
    prompt = jnp.asarray(rng.integers(0, TARGET.vocab_size, (1, 6)))
    out, stats = generate_speculative(
        TARGET, params, TARGET, params, prompt, 16, k=4,
        method="jnp", dtype=jnp.float32, temperature=0.8, seed=5)
    assert stats["accept_rate"] == 1.0
    assert out.shape[1] == prompt.shape[1] + 16


def test_sampled_deterministic_per_seed(rng):
    params = init_random_params(TARGET, seed=3)
    draft_params = init_random_params(DRAFT, seed=11)
    prompt = jnp.asarray(rng.integers(0, TARGET.vocab_size, (1, 5)))

    def run(seed):
        out, _ = generate_speculative(
            TARGET, params, DRAFT, draft_params, prompt, 12, k=3,
            method="jnp", dtype=jnp.float32, temperature=1.0, top_k=16,
            seed=seed)
        return np.asarray(out).tolist()

    assert run(2) == run(2)
    assert run(2) != run(9)  # different seeds explore different streams


def test_self_draft_helper(rng):
    """Early-exit self-speculation: draft = target's first n layers; output
    still bit-matches the target's greedy stream."""
    from autoawq_tpu.serve.speculative import self_draft

    params = init_random_params(TARGET, seed=3)
    dcfg, dparams = self_draft(TARGET, params, 1)
    assert dcfg.num_hidden_layers == 1
    assert dparams["layers"][0] is params["layers"][0]  # shared, no copy
    prompt = jnp.asarray(rng.integers(0, TARGET.vocab_size, (1, 5)))
    ref = np.asarray(gen.generate_compiled(
        TARGET, params, prompt, 14, method="jnp", dtype=jnp.float32))
    out, stats = generate_speculative(
        TARGET, params, dcfg, dparams, prompt, 14, k=3,
        method="jnp", dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), ref)

    with pytest.raises(ValueError, match="n_layers"):
        self_draft(TARGET, params, TARGET.num_hidden_layers)
