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

Greedy (temperature=0) only: sampled speculative decoding needs the
rejection-resampling scheme; the serving surface here mirrors the bench's
latency-bound greedy regime. B == 1 (latency-bound use case).
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
) -> Tuple[jax.Array, Dict[str, float]]:
    """Greedy speculative generation. Returns ([1, S+new] tokens, stats).

    stats: {"accept_rate": mean accepted-per-proposed, "rounds": N}.
    Output is bit-identical to the target's own greedy stream regardless
    of the draft's quality — a bad draft only costs speed.
    """
    if prompt.shape[0] != 1:
        raise NotImplementedError("speculative decoding serves batch 1")
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
    last = int(jnp.argmax(logits[0]))

    out = [last]
    pos = s           # valid target-cache rows (prompt)
    dpos = s
    accepted = proposed = rounds = 0
    while len(out) < max_new_tokens:
        # ---- draft proposes k greedy tokens from `last`
        drafts = []
        tok = last
        for i in range(k):
            dlog, dcaches = gen.decode_step(
                draft_cfg, draft_params, jnp.asarray([[tok]]), dcaches,
                jnp.int32(dpos + i), method, dtype)
            tok = int(jnp.argmax(dlog[0]))
            drafts.append(tok)
        # ---- target scores [last, d_1..d_k] in one chunked pass
        chunk = jnp.asarray([[last] + drafts])
        tlog, caches = _chunk_step(cfg, params, chunk, caches,
                                   jnp.int32(pos), method, dtype)
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
