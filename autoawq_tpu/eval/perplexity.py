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
    """Mean token-level KL(ref || test) and top-k agreement rate."""
    t = jnp.asarray(tokens)
    lr = modules.forward(cfg_ref, params_ref, t, method=method).astype(jnp.float32)
    lt = modules.forward(cfg_test, params_test, t, method=method).astype(jnp.float32)
    pr = jax.nn.log_softmax(lr, axis=-1)
    pt = jax.nn.log_softmax(lt, axis=-1)
    kl = jnp.sum(jnp.exp(pr) * (pr - pt), axis=-1).mean()
    top_ref = jax.lax.top_k(lr, top_k)[1]
    top_test = jax.lax.top_k(lt, top_k)[1]
    agree = (top_ref[..., 0:1] == top_test[..., 0:1]).mean()
    return float(kl), float(agree)
