"""Beam search (serve/beam.py) vs transformers' GenerationMixin as oracle
— the reference's generate IS HF's, so beams must match token-for-token."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from autoawq_tpu.io.hf import params_from_state_dict
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.serve import generate as gen
from autoawq_tpu.serve.beam import generate_beam


def _hf_pair(seed=0):
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=96)
    torch.manual_seed(seed)
    model = LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict())
    params = params_from_state_dict(cfg, sd)
    return model, cfg, params


@pytest.mark.parametrize("num_beams,length_penalty,eos",
                         [(3, 1.0, None), (4, 2.0, None), (3, 1.0, 5),
                          (2, 0.0, 5)])
def test_beam_matches_transformers(rng, num_beams, length_penalty, eos):
    model, cfg, params = _hf_pair()
    ids = torch.tensor(rng.integers(0, 128, (1, 7)))
    with torch.no_grad():
        ref = model.generate(
            ids, max_new_tokens=8, num_beams=num_beams, do_sample=False,
            length_penalty=length_penalty, early_stopping=False,
            eos_token_id=eos, pad_token_id=0)
    got, _ = generate_beam(
        cfg, params, jnp.asarray(ids.numpy()), 8, num_beams=num_beams,
        length_penalty=length_penalty, eos_token_id=eos,
        method="jnp", dtype=jnp.float32)
    got = np.asarray(got)[0]
    want = ref[0].numpy()
    np.testing.assert_array_equal(got[: len(want)], want[: len(got)])


def test_beam_one_equals_greedy(rng):
    _, cfg, params = _hf_pair(seed=1)
    ids = rng.integers(0, 128, (1, 6))
    ref = np.asarray(gen.generate_compiled(
        cfg, params, jnp.asarray(ids), 10, method="jnp",
        dtype=jnp.float32))
    got, _ = generate_beam(cfg, params, jnp.asarray(ids), 10, num_beams=1,
                           method="jnp", dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got)[0], ref[0])


def test_beam_early_stopping_matches_transformers(rng):
    model, cfg, params = _hf_pair(seed=2)
    ids = torch.tensor(rng.integers(0, 128, (1, 5)))
    with torch.no_grad():
        ref = model.generate(
            ids, max_new_tokens=10, num_beams=3, do_sample=False,
            early_stopping=True, eos_token_id=7, pad_token_id=0)
    got, _ = generate_beam(
        cfg, params, jnp.asarray(ids.numpy()), 10, num_beams=3,
        early_stopping=True, eos_token_id=7, method="jnp",
        dtype=jnp.float32)
    got = np.asarray(got)[0]
    want = ref[0].numpy()
    np.testing.assert_array_equal(got[: len(want)], want[: len(got)])


def test_beam_batched_matches_transformers_per_prompt(rng):
    """Ragged-length prompts beam-decoded in ONE beam-row pool must each
    match transformers run solo (HF's own batching can't change per-prompt
    beams; ours must not either)."""
    from autoawq_tpu.serve.beam import generate_beam_batched

    model, cfg, params = _hf_pair(seed=3)
    prompts = [rng.integers(0, 128, (n,)) for n in (7, 4, 9)]
    got = generate_beam_batched(
        cfg, params, prompts, 8, num_beams=3, eos_token_id=5,
        method="jnp", dtype=jnp.float32)
    for p, (rows, scores) in zip(prompts, got):
        with torch.no_grad():
            ref = model.generate(
                torch.tensor(p[None]), max_new_tokens=8, num_beams=3,
                do_sample=False, eos_token_id=5, pad_token_id=0)
        want = ref[0].numpy()
        n = min(len(want), rows.shape[1])
        np.testing.assert_array_equal(rows[0, :n], want[:n])
        assert len(scores) == 1


def test_beam_num_return_sequences_matches_transformers(rng):
    """n-best returns: sequences AND their ranking must match
    transformers' num_return_sequences output rows."""
    from autoawq_tpu.serve.beam import generate_beam_batched

    model, cfg, params = _hf_pair(seed=4)
    p = rng.integers(0, 128, (6,))
    [(rows, scores)] = generate_beam_batched(
        cfg, params, [p], 7, num_beams=4, num_return_sequences=3,
        eos_token_id=9, method="jnp", dtype=jnp.float32)
    with torch.no_grad():
        ref = model.generate(
            torch.tensor(p[None]), max_new_tokens=7, num_beams=4,
            num_return_sequences=3, do_sample=False, eos_token_id=9,
            pad_token_id=9)
    assert rows.shape[0] == 3
    assert scores == sorted(scores, reverse=True)
    for r in range(3):
        want = ref[r].numpy()
        n = min(len(want), rows.shape[1])
        np.testing.assert_array_equal(rows[r, :n], want[:n])


def test_beam_sample_structure(rng):
    """Stochastic beams: deterministic per seed, different across seeds,
    hypothesis scores are true log-prob sums (finite, <= 0 per token),
    and temperature=0 is rejected."""
    import pytest as _pytest

    from autoawq_tpu.serve.beam import generate_beam_batched

    _, cfg, params = _hf_pair(seed=5)
    p = rng.integers(0, 128, (5,))

    def run(seed):
        [(rows, scores)] = generate_beam_batched(
            cfg, params, [p], 8, num_beams=3, do_sample=True,
            temperature=1.2, top_k=40, method="jnp", dtype=jnp.float32,
            seed=seed)
        return rows, scores

    r1, s1 = run(0)
    r2, _ = run(0)
    r3, _ = run(123)
    np.testing.assert_array_equal(r1, r2)
    assert not np.array_equal(r1, r3)
    assert all(np.isfinite(s) and s < 0 for s in s1)
    with _pytest.raises(ValueError, match="temperature"):
        generate_beam_batched(cfg, params, [p], 4, do_sample=True,
                              temperature=0.0)


def test_generate_api_batched_beams(rng):
    """model.generate with a [B, S] batch and beams must serve each row
    as its own prompt (HF layout [B*n, L]) — regression for the path
    that silently concatenated the rows into one prompt."""
    from autoawq_tpu.api import AwqCausalLM
    from autoawq_tpu.io.hf import init_random_params

    _, cfg, params = _hf_pair(seed=6)
    model = AwqCausalLM(cfg, params)
    ids = rng.integers(0, 128, (2, 6))
    out = model.generate(ids, max_new_tokens=5, num_beams=3,
                         eos_token_id=9, dtype=jnp.float32, method="jnp")
    assert out.shape[0] == 2
    for i in range(2):
        solo = model.generate(ids[i : i + 1], max_new_tokens=5,
                              num_beams=3, eos_token_id=9,
                              dtype=jnp.float32, method="jnp")
        n = min(out.shape[1], solo.shape[1])
        np.testing.assert_array_equal(out[i, :n], solo[0, :n])


def test_beam_sample_topk1_never_emits_forbidden(rng):
    """Regression: with top_k=1 only W finite candidates survive the warp
    per step; Gumbel-top-k must never let a warped-out (-inf) token into
    the beams. With one candidate per beam the run is fully deterministic
    — identical across seeds."""
    from autoawq_tpu.serve.beam import generate_beam_batched

    _, cfg, params = _hf_pair(seed=7)
    p = rng.integers(0, 128, (5,))

    def run(seed, top_k):
        [(rows, scores)] = generate_beam_batched(
            cfg, params, [p], 8, num_beams=2, do_sample=True,
            temperature=1.0, top_k=top_k, method="jnp",
            dtype=jnp.float32, seed=seed)
        return rows.tolist(), scores

    r1, s1 = run(0, 1)
    r2, _ = run(123, 1)
    assert r1 == r2, "top_k=1 stochastic beams must be deterministic"
    assert all(np.isfinite(s) for s in s1)
