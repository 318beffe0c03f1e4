"""Speculative decoding (draft-model propose, target verify-in-one-pass).

Decode throughput of a W4A16 model is weight-streaming-bound: every decode
step reads the full int4 model for ONE token. Speculative decoding amortizes
that read: a small draft model proposes ``k`` greedy tokens with k cheap
steps, then the target scores all k+1 positions in ONE chunked forward
(an M=k+1 matmul streams the same weight bytes as an M=1 matvec), accepting
the longest matching prefix. Greedy acceptance makes the output EXACTLY the
target's own greedy stream — tested token-for-token against
``generate_compiled`` — so speedup is pure, no quality tradeoff.
The reference has nothing comparable (per-token HF loop; fastest path is
its fused forward, awq/modules/fused/model.py).

Cache discipline: both models' caches are position-masked, so "rewinding"
a partially rejected chunk is just decoding from a smaller ``pos`` — stale
rows beyond ``pos`` are never attended and the next chunk overwrites them.
No copies, no eviction.

Acceptance schemes:
* temperature == 0 — greedy prefix matching; output is bit-identical to
  the target's own greedy stream.
* temperature > 0 — speculative SAMPLING (Leviathan et al.): the draft
  proposes by sampling its warped distribution q, the target accepts
  token x_i with prob min(1, p_i(x_i)/q_i(x_i)) and on first rejection
  resamples from the residual normalize(max(p_i - q_i, 0)). The output
  is distributed EXACTLY as target-only sampling (with the same
  temperature/top_k/top_p warpers) — proven in-repo by a distributional
  unit test on the accept/resample math. B == 1 (latency-bound use case).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules
from autoawq_tpu.serve import generate as gen


@functools.partial(jax.jit, static_argnames=("cfg", "method", "dtype"),
                   donate_argnums=(3,))
def _chunk_step(
    cfg: ModelConfig,
    params: Dict[str, Any],
    tokens: jax.Array,  # [1, C] chunk: [last_accepted, d_1..d_{k}]
    caches,
    pos0: jax.Array,  # scalar int32 tokens already valid in cache
    method: str = "auto",
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, Any]:
    """Target verify pass: C tokens against the cache, causal within the
    chunk; returns ([1, C, V] logits, caches). Same masking discipline as
    serve/batching.prefill_chunk."""
    _, c = tokens.shape
    max_t = gen._cache_len(caches)
    positions = pos0 + jnp.arange(c)[None, :]
    x = modules.embed(cfg, params, tokens, dtype, positions)
    ki = jnp.arange(max_t)[None, :]
    ok = ki <= positions[0][:, None]  # [C, T]
    if cfg.sliding_window:
        ok &= ki > positions[0][:, None] - cfg.sliding_window
    mask = jnp.where(ok, 0.0, -1e30).astype(jnp.float32)[None, None]
    if cfg.pos_embed == "alibi":
        mask = mask + modules.alibi_bias(cfg.num_attention_heads,
                                         positions[0], ki[0])
    x, caches = gen._run_blocks(cfg, params, x, positions, mask, caches,
                                pos0, method)
    return modules.logits_fn(cfg, params, x, method), caches


def self_draft(cfg: ModelConfig, params: Dict[str, Any],
               n_layers: int) -> Tuple[ModelConfig, Dict[str, Any]]:
    """Derive a draft model from the target's own FIRST ``n_layers``
    decoder layers plus its embedding/norm/lm_head (early-exit
    self-speculation — Draft&Verify-style, no second checkpoint needed;
    the layers are shared by reference, so the draft costs no extra HBM).
    Acceptance depends on how predictive the truncated stack is; the
    verify pass guarantees outputs regardless."""
    import dataclasses

    if not 0 < n_layers < cfg.num_hidden_layers:
        raise ValueError(f"n_layers must be in (0, {cfg.num_hidden_layers})")
    dcfg = dataclasses.replace(cfg, num_hidden_layers=n_layers)
    dparams = {k: v for k, v in params.items() if k != "layers"}
    dparams["layers"] = list(params["layers"][:n_layers])
    return dcfg, dparams


def accept_resample(p: np.ndarray, q: np.ndarray, drafts, key):
    """Speculative-sampling acceptance (Leviathan et al. 2023, alg. 1).

    p: [k+1, V] target probs (post-warp), q: [k, V] draft probs
    (post-warp), drafts: k proposed token ids sampled from q.
    Returns (a, next_token): a = accepted draft count; next_token is the
    residual resample at the first rejection, or a fresh sample from
    p[k] when everything was accepted. The emitted stream
    [drafts[:a], next_token] is distributed exactly as ancestral
    sampling from p — verified distributionally in
    tests/test_speculative.py.
    """
    k = len(drafts)
    keys = jax.random.split(key, k + 1)
    for i, tok in enumerate(drafts):
        ratio = p[i, tok] / max(float(q[i, tok]), 1e-30)
        u = float(jax.random.uniform(keys[i]))
        if u >= ratio:  # rejected: resample from the residual
            residual = np.maximum(p[i] - q[i], 0.0)
            tot = residual.sum()
            if tot <= 1e-12:  # p == q: residual empty, sample p directly
                residual, tot = p[i], p[i].sum()
            nxt = int(jax.random.choice(keys[k], p[i].shape[0],
                                        p=residual / tot))
            return i, nxt
    nxt = int(jax.random.choice(keys[k], p[k].shape[0],
                                p=p[k] / p[k].sum()))
    return k, nxt


def generate_speculative(
    cfg: ModelConfig,
    params: Dict[str, Any],
    draft_cfg: ModelConfig,
    draft_params: Dict[str, Any],
    prompt: jax.Array,  # [1, S]
    max_new_tokens: int,
    *,
    k: int = 4,
    method: str = "auto",
    dtype=jnp.bfloat16,
    kv_quant: bool = False,
    temperature: float = 0.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    seed: int = 0,
) -> Tuple[jax.Array, Dict[str, float]]:
    """Speculative generation. Returns ([1, S+new] tokens, stats).

    stats: {"accept_rate": mean accepted-per-proposed, "rounds": N}.
    temperature == 0: greedy prefix acceptance — output bit-identical to
    the target's own greedy stream regardless of draft quality (a bad
    draft only costs speed). temperature > 0: speculative sampling —
    output distributed exactly as target-only sampling under the same
    warpers (see accept_resample).
    """
    if prompt.shape[0] != 1:
        # B > 1 routes through the pool speculative engine — ONE compiled
        # speculation code path serves every batch size (per-slot
        # acceptance in a single device call per round) instead of a
        # second hand-rolled batched loop here. Greedy streams bit-match
        # per-row target-only greedy exactly like the B == 1 loop.
        return _generate_speculative_pool(
            cfg, params, draft_cfg, draft_params, prompt, max_new_tokens,
            k=k, method=method, dtype=dtype, kv_quant=kv_quant,
            temperature=temperature, top_k=top_k, top_p=top_p, seed=seed)
    if cfg.vocab_size != draft_cfg.vocab_size:
        raise ValueError("draft and target must share a tokenizer/vocab")
    b, s = prompt.shape
    total = s + max_new_tokens + k + 1  # slack: last round may overshoot
    gen._check_rope_capacity(cfg, total)
    caches = gen.init_kv_cache(cfg, b, total, dtype, kv_quant=kv_quant)
    dcaches = gen.init_kv_cache(draft_cfg, b, total, dtype)

    logits, caches = gen.prefill(cfg, params, prompt, caches, method, dtype)
    _, dcaches = gen.prefill(draft_cfg, draft_params, prompt, dcaches,
                             method, dtype)
    sampling = temperature > 0.0
    key = jax.random.PRNGKey(seed)
    if sampling:
        key, sub = jax.random.split(key)
        last = int(gen.sample(logits[0], temperature, sub, top_k, top_p))
    else:
        last = int(jnp.argmax(logits[0]))

    out = [last]
    pos = s           # valid target-cache rows (prompt)
    dpos = s
    accepted = proposed = rounds = 0
    while len(out) < max_new_tokens:
        # ---- draft proposes k tokens from `last` (greedy, or sampled
        # from its warped distribution q — recorded for the accept ratio)
        drafts, qrows = [], []
        tok = last
        for i in range(k):
            dlog, dcaches = gen.decode_step(
                draft_cfg, draft_params, jnp.asarray([[tok]]), dcaches,
                jnp.int32(dpos + i), method, dtype)
            if sampling:
                wl = gen.warp_logits(dlog[0].astype(jnp.float32),
                                     temperature, top_k, top_p)
                key, sub = jax.random.split(key)
                tok = int(jax.random.categorical(sub, wl))
                qrows.append(np.asarray(jax.nn.softmax(wl)))
            else:
                tok = int(jnp.argmax(dlog[0]))
            drafts.append(tok)
        # ---- target scores [last, d_1..d_k] in one chunked pass
        chunk = jnp.asarray([[last] + drafts])
        tlog, caches = _chunk_step(cfg, params, chunk, caches,
                                   jnp.int32(pos), method, dtype)
        if sampling:
            wt = gen.warp_logits(tlog[0].astype(jnp.float32),
                                 temperature, top_k, top_p)
            p = np.asarray(jax.nn.softmax(wt, axis=-1))  # [k+1, V]
            key, sub = jax.random.split(key)
            a, nxt = accept_resample(p, np.stack(qrows), drafts, sub)
            new = drafts[:a] + [nxt]
        else:
            greedy = np.asarray(jnp.argmax(tlog[0], axis=-1))  # [k+1]
            # accept the longest prefix where the draft matched the target
            a = 0
            while a < k and drafts[a] == int(greedy[a]):
                a += 1
            new = drafts[:a] + [int(greedy[a])]
        out.extend(new)
        accepted += a
        proposed += k
        rounds += 1
        if a == k:
            # All k drafts accepted: the draft produced d_k as OUTPUT but
            # never consumed it, so its KV row (position dpos+k) was never
            # written to the draft cache. Catch up with one draft step
            # (logits discarded) — otherwise every later round's draft
            # attends to a zero row and acceptance quietly degrades.
            _, dcaches = gen.decode_step(
                draft_cfg, draft_params, jnp.asarray([[drafts[-1]]]),
                dcaches, jnp.int32(dpos + k), method, dtype)
        # rows pos..pos+a hold [last, d_1..d_a]; the correction token's row
        # is written when it leads the next chunk. Draft cache: accepted
        # rows were written during drafting; rewind is implicit in dpos.
        pos += a + 1
        dpos += a + 1
        last = new[-1]

    toks = jnp.asarray([out[: max_new_tokens]])
    stats = {"accept_rate": accepted / max(proposed, 1), "rounds": rounds,
             "tokens_per_round": (len(out) - 0) / max(rounds, 1)}
    return jnp.concatenate([prompt, toks], axis=1), stats


def _generate_speculative_pool(
    cfg, params, draft_cfg, draft_params, prompt, max_new_tokens, *,
    k, method, dtype, kv_quant, temperature, top_k, top_p, seed,
) -> Tuple[jax.Array, Dict[str, float]]:
    """Batched speculative generation via the pool engine
    (serve/spec_batch.SpeculativeBatchingEngine): each row is one slot,
    every round drafts k and verifies for the whole pool in single
    compiled calls. No EOS/stop handling here — like the solo loop, each
    row generates exactly ``max_new_tokens``."""
    from autoawq_tpu.serve.spec_batch import SpeculativeBatchingEngine

    if cfg.vocab_size != draft_cfg.vocab_size:
        raise ValueError("draft and target must share a tokenizer/vocab")
    pnp = np.asarray(prompt)
    b, s = pnp.shape
    eng = SpeculativeBatchingEngine(
        cfg, params, draft_cfg, draft_params, k=k, max_batch=b,
        max_seq_len=s + max_new_tokens + k + 2, method=method,
        dtype=dtype, kv_quant=kv_quant, seed=seed)
    for i in range(b):
        eng.add_request(i, pnp[i], max_new_tokens,
                        temperature=temperature, top_k=top_k, top_p=top_p)
    rounds = 0
    while eng.has_work:
        eng.step()
        rounds += 1
    outs = {r.id: r.output for r in eng.finished}
    toks = jnp.asarray(np.stack([
        np.asarray(outs[i][:max_new_tokens], pnp.dtype) for i in range(b)]))
    total = sum(len(outs[i]) for i in range(b))
    stats = {"accept_rate": eng.accepted / max(eng.proposed, 1),
             "rounds": rounds,
             "tokens_per_round": total / max(rounds, 1)}
    return jnp.concatenate([jnp.asarray(pnp), toks], axis=1), stats
