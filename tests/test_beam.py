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
