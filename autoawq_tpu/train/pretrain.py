"""Deterministic in-repo pretraining of a tiny llama (no network).

Purpose: a REAL quality gate for the quantizer. The reference's de-facto
gate is WikiText-2 perplexity on a trained checkpoint
(/root/reference/awq/evaluation/eval_utils.py:22-58); with zero network
egress no HF checkpoint or corpus is reachable, so this module makes one:
a synthetic language with a known low entropy rate and a ~5M-param llama
trained on it until its perplexity is meaningfully low (<< 100, vs ~565
for an untrained net's entropy rate). Quantization deltas measured on a
HELD-OUT stream of that language then mean what the reference's gate
means — "does the quantized model still model its training distribution"
— instead of "how much noise did quantization add to noise".

Everything is seeded and CPU/TPU deterministic (pure jax ops, no
Date/np.random globals); the same (seed, steps) always yields the same
weights, so QUALITY.json is reproducible by re-running the script.

The corpus is a sparse FIRST-order Markov chain (each token allows K_NEXT
successors with Zipf weights — V contexts, memorizable by a small model,
entropy rate ~= H(zipf) ~ 1.26 nats -> ppl floor ~3.5 on chain tokens)
plus periodic verbatim COPY spans that echo tokens from 48 positions
back: unigram-context statistics cannot predict the echo, so attention
(and its quantization damage) shows up in the perplexity, not just MLP
accuracy.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

K_NEXT = 4          # successors per token context
COPY_PERIOD = 96    # every ~96 tokens, a copy span
COPY_LEN = 16
COPY_BACK = 48      # echo distance


def synth_corpus(vocab: int, n_tokens: int, seed: int = 0) -> np.ndarray:
    """Deterministic token stream with ~H(zipf) nats/token entropy."""
    rng = np.random.default_rng(seed)
    # sparse successor table built from a hash (no V*K table on disk):
    # successor(a, k) = perm[(a * 31 + k * 7) % V]
    perm = rng.permutation(vocab)
    zipf = 1.0 / np.arange(1, K_NEXT + 1)
    zipf = zipf / zipf.sum()

    out = np.empty(n_tokens, np.int64)
    out[0] = rng.integers(0, vocab)
    choices = rng.choice(K_NEXT, size=n_tokens, p=zipf)
    copy_phase = int(rng.integers(0, COPY_PERIOD))
    for i in range(1, n_tokens):
        if (i + copy_phase) % COPY_PERIOD < COPY_LEN and i >= COPY_BACK:
            out[i] = out[i - COPY_BACK]
            continue
        out[i] = perm[(out[i - 1] * 31 + choices[i] * 7) % vocab]
    return out.astype(np.int32)


def train_tiny(cfg, corpus: np.ndarray, steps: int = 400, batch: int = 16,
               seq: int = 128, lr: float = 3e-3, seed: int = 0,
               log_every: int = 0) -> Tuple[Dict[str, Any], float]:
    """Full-parameter AdamW pretraining of a float llama on ``corpus``.
    Returns (params, final mean loss). Deterministic in (seed, steps)."""
    import jax
    import jax.numpy as jnp
    import optax

    from autoawq_tpu.io.hf import init_random_params
    from autoawq_tpu.nn import modules

    params = init_random_params(cfg, seed=seed, scale=0.03)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float32), params)
    tx = optax.adamw(optax.cosine_decay_schedule(lr, steps, alpha=0.1),
                     weight_decay=0.01)
    opt = tx.init(params)

    def loss_fn(p, tokens):
        logits = modules.forward(cfg, p, tokens, method="jnp")
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tgt = tokens[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return nll.mean()

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(p, opt, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(p, tokens)
        updates, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), opt, loss

    rng = np.random.default_rng(seed + 1)
    starts_all = rng.integers(0, len(corpus) - seq - 1, (steps, batch))
    loss = np.inf
    for i in range(steps):
        toks = jnp.asarray(
            np.stack([corpus[s: s + seq] for s in starts_all[i]]))
        params, opt, loss = step(params, opt, toks)
        if log_every and (i + 1) % log_every == 0:
            print(f"step {i + 1}/{steps} loss {float(loss):.4f}",
                  flush=True)
    return params, float(loss)


def roughen_activations(cfg, params: Dict[str, Any], n_channels: int = 16,
                        scale: float = 8.0) -> Dict[str, Any]:
    """Function-preserving outlier injection: multiply ``n_channels`` of
    every input_layernorm/post_attention_layernorm weight by ``scale`` and
    divide the matching ROWS of the consuming linears — exactly the
    inverse of AWQ's apply_scale(norm, fcs) move (quantize/scale.py), so
    fp logits are bit-identical while the activations entering q/k/v and
    gate/up gain hot channels. Tiny models trained for a few hundred
    steps don't develop the outlier channels real LLMs do
    (AWQ paper §3.1); this reinstates that regime without changing the
    function, so the RTN-vs-AWQ comparison tests what AWQ exists for."""
    import jax.numpy as jnp

    idx = np.arange(n_channels)

    def _scale_pair(normp, lins):
        w = np.asarray(normp["weight"], np.float64)
        w[idx] = w[idx] * scale
        normp["weight"] = jnp.asarray(w, jnp.float32)
        for lin in lins:
            k = np.asarray(lin["kernel"], np.float64)
            k[idx, :] = k[idx, :] / scale
            lin["kernel"] = jnp.asarray(k, jnp.float32)

    for lp in params["layers"]:
        attn, m = lp["self_attn"], lp["mlp"]
        _scale_pair(lp["input_layernorm"],
                    [attn[k] for k in ("q_proj", "k_proj", "v_proj")])
        _scale_pair(lp["post_attention_layernorm"],
                    [m[k] for k in ("gate_proj", "up_proj")])
    return params
