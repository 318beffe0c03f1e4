"""Beam search decoding, HF-semantics-exact.

The reference's ``generate`` is transformers' GenerationMixin, so its
beam surface (num_beams / length_penalty / early_stopping) is part of the
API a user switching frameworks expects. This implements the same
algorithm TPU-shaped: beams live as a [W]-row slot batch over the donated
KV cache, each step is ONE compiled decode over all beams + a top-2W over
the flattened [W*V] scores, and the tiny (2W,) candidate arrays come to
the host where an exact port of transformers' BeamSearchScorer semantics
runs (rank-filtered EOS hypotheses with generated-length penalty,
early_stopping True/False/"never" heuristics, finalize that re-adds
running beams and eos-terminates returned sequences). Cache rows reorder
by a gathered beam index per step.

Verified token-for-token against transformers ``generate(num_beams=...)``
on HF-oracle models (tests/test_beam.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.serve import generate as gen


class _BeamHyps:
    """transformers BeamHypotheses, numpy-side."""

    def __init__(self, num_beams: int, length_penalty: float,
                 early_stopping, max_length: int):
        self.num_beams = num_beams
        self.lp = length_penalty
        self.early_stopping = early_stopping
        self.max_length = max_length
        self.beams: List[Tuple[float, List[int]]] = []
        self.worst = 1e9

    def add(self, hyp: List[int], sum_logprobs: float, generated_len: int):
        score = sum_logprobs / (generated_len ** self.lp)
        if len(self.beams) < self.num_beams or score > self.worst:
            self.beams.append((score, list(hyp)))
            if len(self.beams) > self.num_beams:
                order = sorted(range(len(self.beams)),
                               key=lambda i: self.beams[i][0])
                del self.beams[order[0]]
                self.worst = min(s for s, _ in self.beams)
            else:
                self.worst = min(score, self.worst)

    def is_done(self, best_sum_logprobs: float, cur_len: int,
                prompt_len: int) -> bool:
        if len(self.beams) < self.num_beams:
            return False
        if self.early_stopping is True:
            return True
        if self.early_stopping is False:
            best = best_sum_logprobs / (cur_len - prompt_len) ** self.lp
            return self.worst >= best
        # "never"
        if self.lp > 0.0:
            best = best_sum_logprobs / (
                self.max_length - prompt_len) ** self.lp
        else:
            best = best_sum_logprobs / (cur_len - prompt_len) ** self.lp
        return self.worst >= best


@functools.partial(jax.jit, static_argnames=("cfg", "two_w", "method",
                                              "dtype"))
def _beam_step(cfg, params, tokens, caches, pos, beam_scores, two_w: int,
               method: str, dtype):
    logits, caches = gen.decode_step(cfg, params, tokens, caches, pos,
                                     method, dtype)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    flat = (beam_scores[:, None] + logp).reshape(-1)
    scores, idx = jax.lax.top_k(flat, two_w)
    v = logp.shape[-1]
    return scores, idx // v, idx % v, caches


@functools.partial(jax.jit, donate_argnums=(0,))
def _gather_beams(caches, idx):
    return jax.tree_util.tree_map(lambda c: c[idx], caches)


def generate_beam(
    cfg: ModelConfig,
    params: Dict[str, Any],
    prompt: jax.Array,  # [1, S]
    max_new_tokens: int,
    *,
    num_beams: int = 4,
    length_penalty: float = 1.0,
    early_stopping=False,
    eos_token_id: Optional[int] = None,
    method: str = "auto",
    dtype=jnp.bfloat16,
    max_seq_len: Optional[int] = None,
) -> Tuple[jax.Array, float]:
    """HF-exact beam search. Returns ([1, L] best sequence — padded/eos
    exactly as transformers pads it — and its sequence score)."""
    if prompt.shape[0] != 1:
        raise NotImplementedError("beam search serves one prompt at a time")
    if max_new_tokens < 1:
        raise ValueError("max_new_tokens must be >= 1 (a zero-length "
                         "generation has no hypothesis to score)")
    s = prompt.shape[1]
    w = num_beams
    total = max_seq_len or (s + max_new_tokens)
    gen._check_rope_capacity(cfg, total)

    caches = gen.init_kv_cache(cfg, 1, total, dtype)
    logits0, caches = gen.prefill(cfg, params, prompt, caches, method,
                                  dtype)
    caches = jax.tree_util.tree_map(
        lambda c: jnp.repeat(c, w, axis=0), caches)

    hyps = _BeamHyps(w, length_penalty, early_stopping, s + max_new_tokens)
    beam_scores = np.full((w,), -1e9, np.float32)
    beam_scores[0] = 0.0
    seqs: List[List[int]] = [list(np.asarray(prompt)[0])] * w
    tokens = None
    done = False

    for step in range(max_new_tokens):
        if step == 0:
            logp = np.asarray(jax.nn.log_softmax(
                logits0[0].astype(jnp.float32)))
            flat = (beam_scores[:, None] + logp[None, :]).reshape(-1)
            order = np.argsort(-flat)[: 2 * w]
            scores2w = flat[order]
            beams2w, toks2w = order // logp.shape[0], order % logp.shape[0]
        else:
            scores2w, beams2w, toks2w, caches = _beam_step(
                cfg, params, jnp.asarray(tokens)[:, None], caches,
                jnp.int32(s + step - 1), jnp.asarray(beam_scores), 2 * w,
                method, dtype)
            scores2w = np.asarray(scores2w)
            beams2w = np.asarray(beams2w)
            toks2w = np.asarray(toks2w)

        cur_len = s + step + 1
        nxt: List[Tuple[int, float, int]] = []
        for rank in range(2 * w):
            t, sc, b = int(toks2w[rank]), float(scores2w[rank]), \
                int(beams2w[rank])
            if eos_token_id is not None and t == eos_token_id:
                if rank >= w:
                    continue
                hyps.add(seqs[b], sc, cur_len - s)
            else:
                nxt.append((t, sc, b))
            if len(nxt) == w:
                break
        done = done or hyps.is_done(float(scores2w[0]), cur_len, s)

        seqs = [seqs[b] + [t] for t, _, b in nxt]
        beam_scores = np.asarray([sc for _, sc, _ in nxt], np.float32)
        tokens = np.asarray([t for t, _, _ in nxt], np.int32)
        if done:
            break
        if step + 1 < max_new_tokens:
            caches = _gather_beams(
                caches, jnp.asarray([b for _, _, b in nxt]))

    if not done:  # finalize: running beams become hypotheses
        for i in range(w):
            hyps.add(seqs[i], float(beam_scores[i]), len(seqs[i]) - s)

    best_score, best = max(hyps.beams, key=lambda x: x[0])
    # transformers appends eos when the sequence ends before max_length
    if eos_token_id is not None and len(best) < s + max_new_tokens:
        best = best + [eos_token_id]
    return jnp.asarray([best]), best_score
