"""Evaluation suite: HumanEval sandbox harness, pass@k math, multiple-choice
scoring, WER."""

import numpy as np
import pytest

from autoawq_tpu.eval.humaneval import (
    check_correctness,
    estimate_pass_at_k,
    eval_humaneval,
    stop_at_stop_token,
)
from autoawq_tpu.eval.tasks import (
    choice_loglikelihood,
    eval_multiple_choice,
    word_error_rate,
)

PROBLEM = {
    "task_id": "t/0",
    "prompt": "def add(a, b):\n",
    "test": "def check(f):\n    assert f(1, 2) == 3\n    assert f(-1, 1) == 0\n",
    "entry_point": "add",
}


def test_sandbox_pass():
    r = check_correctness(PROBLEM, "    return a + b\n", timeout=5)
    assert r["passed"], r


def test_sandbox_fail_and_timeout():
    r = check_correctness(PROBLEM, "    return a - b\n", timeout=5)
    assert not r["passed"]
    r = check_correctness(
        PROBLEM, "    while True: pass\n", timeout=2)
    assert r["result"] == "timed out"


def test_sandbox_blocks_os():
    evil = "    import os; os.system('echo pwned'); return a + b\n"
    r = check_correctness(PROBLEM, evil, timeout=5)
    assert not r["passed"]  # os.system disabled by the reliability guard


def test_pass_at_k_estimator():
    # n=5 samples, c=2 correct: pass@1 = 2/5
    np.testing.assert_allclose(estimate_pass_at_k(5, [2], 1), [0.4])
    # if all correct, pass@k == 1
    np.testing.assert_allclose(estimate_pass_at_k(3, [3], 2), [1.0])


def test_eval_humaneval_end_to_end():
    def gen(prompt):
        return "    return a + b\nprint('trailing')"  # stop-token trimmed

    assert stop_at_stop_token(gen("")) == "    return a + b"
    m = eval_humaneval(gen, [PROBLEM])
    assert m["pass@1"] == 1.0


class _CharTok:
    def __call__(self, text, add_special_tokens=True):
        return {"input_ids": [ord(c) % 97 for c in text]}


def test_multiple_choice_scoring(rng):
    """A model whose logits always favor token 'a' must pick the choice
    whose letter tokenizes to the most-likely ids — sanity-check plumbing."""
    from autoawq_tpu.io.hf import init_random_params
    from autoawq_tpu.models.config import ModelConfig

    cfg = ModelConfig(model_type="llama", vocab_size=97, hidden_size=32,
                      intermediate_size=64, num_hidden_layers=1,
                      num_attention_heads=2, num_key_value_heads=2,
                      head_dim=16, max_position_embeddings=128)
    params = init_random_params(cfg, seed=0)
    ex = {"question": "pick", "choices": ["x", "y"], "answer": 0}
    out = eval_multiple_choice(cfg, params, _CharTok(), [ex], method="jnp")
    assert out["n"] == 1 and out["accuracy"] in (0.0, 1.0)
    ll = choice_loglikelihood(cfg, params, [1, 2, 3], [4, 5], method="jnp")
    assert np.isfinite(ll)


def test_word_error_rate():
    assert word_error_rate(["a b c"], ["a b c"]) == 0.0
    assert word_error_rate(["a b c"], ["a x c"]) == pytest.approx(1 / 3)
    assert word_error_rate(["a b"], ["a b c"]) == pytest.approx(0.5)


def test_lm_eval_adapter_loglikelihood(rng):
    """Adapter math without lm-eval installed: drive _loglikelihood_tokens
    + generate_until against a mock tokenizer (the LM base class is only
    needed for harness registration)."""
    from types import SimpleNamespace

    from autoawq_tpu.eval import lm_eval_adapter as la
    from autoawq_tpu.io.hf import init_random_params
    from autoawq_tpu.models.config import ModelConfig

    cfg = ModelConfig(model_type="llama", vocab_size=64, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=1,
                      num_attention_heads=2, num_key_value_heads=2,
                      head_dim=32, max_position_embeddings=64)
    params = init_random_params(cfg, seed=0, scale=0.1)
    model = SimpleNamespace(cfg=cfg, params=params)

    lm = la.AwqTpuLM.__new__(la.AwqTpuLM)  # skip LM.__init__ (gated)
    lm.model, lm.max_length, lm.method = model, 64, "jnp"

    ll, greedy = lm._loglikelihood_tokens([1, 2, 3], [4, 5])
    # oracle: sum of log-softmax at the continuation positions
    import jax
    import jax.numpy as jnp

    from autoawq_tpu.nn import modules

    logits = modules.forward(cfg, params, jnp.asarray([[1, 2, 3, 4, 5]]),
                             method="jnp")
    logp = np.asarray(jax.nn.log_softmax(logits[0].astype(jnp.float32), -1))
    want = logp[2, 4] + logp[3, 5]
    np.testing.assert_allclose(ll, want, rtol=1e-5)
    assert isinstance(greedy, bool)

    if not la.HAVE_LM_EVAL:
        with pytest.raises(ImportError):
            la.AwqTpuLM(model, None)
