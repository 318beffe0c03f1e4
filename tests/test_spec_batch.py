"""Speculative continuous batching (serve/spec_batch.py): pool-wide
draft/verify must emit exactly the plain engine's greedy streams (which
bit-match solo generation), at any draft quality."""

import jax.numpy as jnp
import numpy as np
import pytest

from autoawq_tpu.io.hf import init_random_params
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.serve.batching import BatchingEngine
from autoawq_tpu.serve.spec_batch import SpeculativeBatchingEngine

CFG = ModelConfig(
    model_type="llama", vocab_size=64, hidden_size=64,
    intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=2, head_dim=16, max_position_embeddings=128)
DRAFT = ModelConfig(
    model_type="llama", vocab_size=64, hidden_size=32,
    intermediate_size=64, num_hidden_layers=1, num_attention_heads=2,
    num_key_value_heads=1, head_dim=16, max_position_embeddings=128)


def _plain(params, work, max_seq=96):
    eng = BatchingEngine(CFG, params, max_batch=3, max_seq_len=max_seq,
                         method="jnp", dtype=jnp.float32)
    for rid, prompt, n in work:
        eng.add_request(rid, prompt, n)
    return eng.run()


def _work(rng):
    return [(f"r{i}", rng.integers(0, 64, (l,)), n)
            for i, (l, n) in enumerate([(5, 9), (9, 7), (3, 12), (7, 6)])]


def test_spec_pool_matches_plain_engine(rng):
    params = init_random_params(CFG, seed=5, scale=0.08)
    dparams = init_random_params(DRAFT, seed=9, scale=0.08)
    work = _work(rng)
    ref = _plain(params, work)
    eng = SpeculativeBatchingEngine(
        CFG, params, DRAFT, dparams, k=3, max_batch=3, max_seq_len=96,
        method="jnp", dtype=jnp.float32)
    for rid, prompt, n in work:
        eng.add_request(rid, prompt, n)
    got = eng.run()
    assert got == ref
    assert eng.proposed > 0


def test_spec_pool_self_draft_accepts_everything(rng):
    params = init_random_params(CFG, seed=5, scale=0.08)
    work = _work(rng)
    eng = SpeculativeBatchingEngine(
        CFG, params, CFG, params, k=3, max_batch=3, max_seq_len=96,
        method="jnp", dtype=jnp.float32)
    for rid, prompt, n in work:
        eng.add_request(rid, prompt, n)
    got = eng.run()
    assert got == _plain(params, work)
    assert eng.accept_rate == 1.0


def test_spec_pool_capacity_fallback(rng):
    """Near max_seq the engine falls back to single-token pool decode and
    still finishes with correct streams."""
    params = init_random_params(CFG, seed=6, scale=0.08)
    dparams = init_random_params(DRAFT, seed=9, scale=0.08)
    work = [("a", rng.integers(0, 64, (5,)), 12)]
    ref = _plain(params, work, max_seq=24)
    eng = SpeculativeBatchingEngine(
        CFG, params, DRAFT, dparams, k=4, max_batch=3, max_seq_len=24,
        method="jnp", dtype=jnp.float32)
    eng.add_request(*work[0])
    assert eng.run() == ref


def test_spec_pool_rejects_sampling(rng):
    params = init_random_params(CFG, seed=5, scale=0.08)
    eng = SpeculativeBatchingEngine(
        CFG, params, CFG, params, max_batch=2, max_seq_len=64,
        method="jnp", dtype=jnp.float32)
    with pytest.raises(NotImplementedError, match="greedy"):
        eng.add_request("s", rng.integers(0, 64, (4,)), 4, temperature=0.7)


def test_fallback_rounds_keep_draft_cache_aligned(rng):
    """Regression: single-token fallback rounds (near cache capacity) must
    mirror the consumed token into the draft cache; otherwise the draft
    stream desyncs and self-draft acceptance collapses once speculative
    rounds resume."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    work = [("big", rng.integers(0, 64, (5,)), 20),
            ("small", rng.integers(0, 64, (4,)), 30)]
    eng = SpeculativeBatchingEngine(
        CFG, params, CFG, params, k=3, max_batch=2, max_seq_len=36,
        method="jnp", dtype=jnp.float32)
    for rid, prompt, n in work:
        eng.add_request(rid, prompt, n)
    got = eng.run()
    assert got == _plain(params, work, max_seq=36)
    # self-draft: every speculative proposal (incl. post-fallback rounds)
    # must have been accepted
    assert eng.proposed > 0 and eng.accept_rate == 1.0
