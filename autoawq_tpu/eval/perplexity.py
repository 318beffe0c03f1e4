"""Quality evaluation: perplexity and quantized-vs-reference KL divergence.

Perplexity follows the reference procedure exactly
(awq/evaluation/eval_utils.py:22-58): concatenate the corpus, split into
``seq_len`` chunks with stride == seq_len, fp32 cross-entropy on
next-token prediction, ppl = exp(mean nll). KL divergence mirrors
awq/evaluation/kl_divergence.py:42-159 (token-level KL + top-k agreement) —
the best regression metric for kernel numerics.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules


@functools.partial(jax.jit, static_argnames=("cfg", "method"))
def _chunk_nll(cfg, params, tokens, method="auto"):
    """Sum of next-token NLL and count for one [1, S] chunk."""
    logits = modules.forward(cfg, params, tokens, method=method)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return nll.sum(), nll.size


def perplexity(
    cfg: ModelConfig,
    params: Dict[str, Any],
    tokens: np.ndarray,  # 1-D token stream (e.g. tokenized WikiText-2 test)
    seq_len: int = 2048,
    method: str = "auto",
    progress: bool = False,
) -> float:
    tokens = np.asarray(tokens).reshape(-1)
    n_chunks = len(tokens) // seq_len
    if n_chunks == 0:
        raise ValueError(f"need >= {seq_len} tokens, got {len(tokens)}")
    total, count = 0.0, 0
    rng = range(n_chunks)
    if progress:
        try:
            from tqdm import tqdm

            rng = tqdm(rng, desc="ppl", unit="chunk")
        except ImportError:
            pass
    for i in rng:
        chunk = jnp.asarray(tokens[i * seq_len : (i + 1) * seq_len])[None]
        s, n = _chunk_nll(cfg, params, chunk, method)
        total += float(s)
        count += int(n)
    return float(np.exp(total / count))


def kl_divergence(
    cfg_ref: ModelConfig,
    params_ref: Dict[str, Any],
    cfg_test: ModelConfig,
    params_test: Dict[str, Any],
    tokens: np.ndarray,  # [B, S]
    top_k: int = 5,
    method: str = "auto",
) -> Tuple[float, float]:
    """Mean token-level KL(ref || test) and top-k agreement rate (fraction
    of positions whose reference argmax appears in the test model's top-k)."""
    r = kl_divergence_report(cfg_ref, params_ref, cfg_test, params_test,
                             tokens, top_ks=(top_k,), method=method)
    return r["kl_mean"], r[f"ref_top{top_k}"]


def kl_divergence_report(
    cfg_ref: ModelConfig,
    params_ref: Dict[str, Any],
    cfg_test: ModelConfig,
    params_test: Dict[str, Any],
    tokens: np.ndarray,  # [B, S]
    top_ks: Tuple[int, ...] = (1, 5, 10),
    method: str = "auto",
    alpha: float = 0.05,
) -> Dict[str, float]:
    """Full KL report mirroring the reference
    (awq/evaluation/kl_divergence.py:42-145): per-token KL mean with a
    normal-approx confidence interval, q90/q95/q99 quantiles, and two-sided
    top-k agreement — ``ref_topK`` = P(ref argmax in test top-K) and
    ``test_topK`` = P(test argmax in ref top-K) — each with a ±
    binomial-proportion half-interval (``*_ci``)."""
    import math

    t = jnp.asarray(tokens)
    lr = modules.forward(cfg_ref, params_ref, t, method=method).astype(jnp.float32)
    lt = modules.forward(cfg_test, params_test, t, method=method).astype(jnp.float32)
    pr = jax.nn.log_softmax(lr, axis=-1)
    pt = jax.nn.log_softmax(lt, axis=-1)
    kls = np.asarray(
        jnp.sum(jnp.exp(pr) * (pr - pt), axis=-1)).reshape(-1)  # per token
    n = kls.size
    z = float(jax.scipy.special.ndtri(1 - alpha / 2))
    report: Dict[str, float] = {
        "kl_mean": float(kls.mean()),
        "kl_ci": float(z * kls.std(ddof=1) / math.sqrt(n)) if n > 1 else 0.0,
        "kl_q90": float(np.quantile(kls, 0.90)),
        "kl_q95": float(np.quantile(kls, 0.95)),
        "kl_q99": float(np.quantile(kls, 0.99)),
        "kl_max": float(kls.max()),
    }

    def bin_conf(p):  # binomial proportion ± half-interval
        return float(z * math.sqrt(max(p * (1 - p), 0.0) / n))

    ref_arg = jnp.argmax(lr, axis=-1)
    test_arg = jnp.argmax(lt, axis=-1)
    for k in top_ks:
        topk_test = jax.lax.top_k(lt, k)[1]
        topk_ref = jax.lax.top_k(lr, k)[1]
        ref_in_test = float(
            (topk_test == ref_arg[..., None]).any(-1).mean())
        test_in_ref = float(
            (topk_ref == test_arg[..., None]).any(-1).mean())
        report[f"ref_top{k}"] = ref_in_test
        report[f"ref_top{k}_ci"] = bin_conf(ref_in_test)
        report[f"test_top{k}"] = test_in_ref
        report[f"test_top{k}_ci"] = bin_conf(test_in_ref)
    return report
