"""Beam search decoding, HF-semantics-exact; batched and sampled modes.

The reference's ``generate`` is transformers' GenerationMixin, so its
beam surface (num_beams / length_penalty / early_stopping /
num_return_sequences) is part of the API a user switching frameworks
expects. This implements the same algorithm TPU-shaped: every prompt's
beams live as W rows of ONE [B*W]-row slot batch over the donated KV
cache (vector per-row positions, serve/batching.batched_decode_step —
prompts of different lengths never pad each other), each step is ONE
compiled decode over all beams + a per-prompt top-2W over the flattened
[W*V] scores, and the tiny (B, 2W) candidate arrays come to the host
where an exact port of transformers' BeamSearchScorer semantics runs
(rank-filtered EOS hypotheses with generated-length penalty,
early_stopping True/False/"never" heuristics, finalize that re-adds
running beams, sorts hypotheses, and eos-terminates returned sequences).
Cache rows reorder by a gathered global beam index per step.

``do_sample=True`` switches candidate selection to stochastic beam
sampling: per-beam log-probs are warped (temperature/top_k/top_p,
serve/batching.warp_batched) and 2W candidates are drawn WITHOUT
replacement per prompt via Gumbel-top-k over beam_score + warped logp.
Hypothesis scores still accumulate the model's true log-probs, so
length-penalty ranking stays meaningful. (transformers' deprecated
_beam_sample instead accumulated the warped scores; token-for-token
parity across RNGs is impossible anyway, so this keeps the principled
formulation and tests determinism/distribution structurally.)

Deterministic beams are verified token-for-token against transformers
``generate(num_beams=...)`` on HF-oracle models, batched and solo
(tests/test_beam.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.serve import generate as gen
from autoawq_tpu.serve.batching import batched_decode_step, warp_batched


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


def _select_2w(logp: jax.Array, beam_scores: jax.Array, b: int, w: int,
               do_sample: bool, temp, top_k, top_p, key):
    """Per-prompt candidate selection from [B*W, V] log-probs: returns
    ([B, 2W] true scores, beam idx, token idx). Deterministic = top-2W of
    beam_score + logp; sampled = Gumbel-top-k over beam_score + WARPED
    logp (2W draws without replacement), candidates then sorted by their
    true scores so the scorer's rank-based EOS rule stays meaningful."""
    v = logp.shape[-1]
    two_w = 2 * w
    per_row = beam_scores.reshape(b * w, 1)
    flat = (per_row + logp).reshape(b, w * v)
    if not do_sample:
        scores, idx = jax.lax.top_k(flat, two_w)
    else:
        rows = b * w
        warped = warp_batched(logp, jnp.full((rows,), temp, jnp.float32),
                              jnp.full((rows,), top_k, jnp.int32),
                              jnp.full((rows,), top_p, jnp.float32))
        sel = (per_row + warped).reshape(b, w * v)
        gumbel = jax.random.gumbel(key, sel.shape)
        _, idx = jax.lax.top_k(sel + gumbel, two_w)
        scores = jnp.take_along_axis(flat, idx, axis=-1)
        # when fewer than 2W entries survive the warp (e.g. top_k=1),
        # top_k is forced to return warped-out (-inf) positions; poison
        # their TRUE scores too so the sort ranks them last and the host
        # scorer skips them (>= W legitimate candidates always exist:
        # every live beam keeps at least one token)
        chosen = jnp.take_along_axis(sel, idx, axis=-1)
        scores = jnp.where(jnp.isneginf(chosen), -jnp.inf, scores)
        order = jnp.argsort(-scores, axis=-1)
        scores = jnp.take_along_axis(scores, order, axis=-1)
        idx = jnp.take_along_axis(idx, order, axis=-1)
    return scores, idx // v, idx % v


@functools.partial(jax.jit, static_argnames=("cfg", "b", "w", "method",
                                             "dtype", "do_sample"))
def _beam_step(cfg, params, tokens, caches, pos, beam_scores, b: int,
               w: int, method: str, dtype, do_sample: bool, temp, top_k,
               top_p, key):
    """One decode for all B*W beam rows + per-prompt candidate selection."""
    logits, caches = batched_decode_step(cfg, params, tokens, caches, pos,
                                         method, dtype)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    scores, beams, toks = _select_2w(logp, beam_scores, b, w, do_sample,
                                     temp, top_k, top_p, key)
    return scores, beams, toks, caches


@functools.partial(jax.jit, donate_argnums=(0,))
def _gather_beams(caches, idx):
    return jax.tree_util.tree_map(lambda c: c[idx], caches)


def generate_beam_batched(
    cfg: ModelConfig,
    params: Dict[str, Any],
    prompts: Sequence,  # B 1-D token-id arrays (ragged lengths fine)
    max_new_tokens: int,
    *,
    num_beams: int = 4,
    length_penalty: float = 1.0,
    early_stopping=False,
    eos_token_id: Optional[int] = None,
    method: str = "auto",
    dtype=jnp.bfloat16,
    max_seq_len: Optional[int] = None,
    num_return_sequences: int = 1,
    do_sample: bool = False,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    seed: int = 0,
) -> List[Tuple[np.ndarray, List[float]]]:
    """Beam search over a batch of prompts in one beam-row pool.

    Returns, per prompt, ([num_return_sequences, L] sequences — best
    first, eos-terminated and eos-padded exactly as transformers pads
    them — and their sequence scores). Prompts finish independently
    (done prompts' rows idle until the last one finishes)."""
    if max_new_tokens < 1:
        raise ValueError("max_new_tokens must be >= 1 (a zero-length "
                         "generation has no hypothesis to score)")
    w = num_beams
    if not 1 <= num_return_sequences <= w:
        raise ValueError("num_return_sequences must be in [1, num_beams]")
    if do_sample and not temperature > 0.0:
        raise ValueError("do_sample=True needs temperature > 0")
    prompts = [np.asarray(p).reshape(-1) for p in prompts]
    b = len(prompts)
    lens = [len(p) for p in prompts]
    # concrete warper params (traced `or`-fallbacks would fail under jit)
    temperature = float(temperature)
    top_k = int(top_k) if top_k else cfg.vocab_size
    top_p = float(top_p) if top_p is not None else 1.0
    total = max_seq_len or (max(lens) + max_new_tokens)
    gen._check_rope_capacity(cfg, total)
    key = jax.random.PRNGKey(seed)

    # prefill each prompt into a row cache, then build the [B*W]-row pool
    # in one shot (repeat+concat — a per-(prompt, beam) install would
    # compile one scatter kernel per static slot index, B*W compiles)
    rows, logp0 = [], []
    for p in prompts:
        row = gen.init_kv_cache(cfg, 1, total, dtype)
        logits0, row = gen.prefill(cfg, params, jnp.asarray(p[None]), row,
                                   method, dtype)
        logp0.append(np.asarray(jax.nn.log_softmax(
            logits0[0].astype(jnp.float32))))
        rows.append(row)
    caches = [
        {key: jnp.concatenate([jnp.repeat(r[li][key], w, axis=0)
                               for r in rows], axis=0)
         for key in rows[0][li]}
        for li in range(len(rows[0]))
    ]

    hyps = [_BeamHyps(w, length_penalty, early_stopping,
                      lens[i] + max_new_tokens) for i in range(b)]
    beam_scores = np.full((b, w), -1e9, np.float32)
    beam_scores[:, 0] = 0.0
    seqs: List[List[List[int]]] = [[list(p)] * w for p in prompts]
    tokens = np.zeros((b, w), np.int32)
    pos = np.asarray([lens[i] for i in range(b) for _ in range(w)],
                     np.int32)
    done = [False] * b

    for step in range(max_new_tokens):
        if step == 0:
            sc_l, bm_l, tk_l = [], [], []
            for i in range(b):
                flat = (beam_scores[i][:, None] + logp0[i][None]).reshape(-1)
                v = logp0[i].shape[0]
                if do_sample:
                    key, sub = jax.random.split(key)
                    sc, bm, tk = _select_2w(
                        jnp.asarray(np.tile(logp0[i], (w, 1))),
                        jnp.asarray(beam_scores[i][None]), 1, w, True,
                        temperature, top_k, top_p, sub)
                    sc, bm, tk = (np.asarray(sc)[0], np.asarray(bm)[0],
                                  np.asarray(tk)[0])
                else:
                    order = np.argsort(-flat)[: 2 * w]
                    sc, bm, tk = flat[order], order // v, order % v
                sc_l.append(sc)
                bm_l.append(bm)
                tk_l.append(tk)
            scores2w = np.stack(sc_l)
            beams2w, toks2w = np.stack(bm_l), np.stack(tk_l)
        else:
            key, sub = jax.random.split(key)
            scores2w, beams2w, toks2w, caches = _beam_step(
                cfg, params, jnp.asarray(tokens.reshape(-1)[:, None]),
                caches, jnp.asarray(pos), jnp.asarray(beam_scores), b, w,
                method, dtype, do_sample,
                temperature, top_k, top_p, sub)
            scores2w = np.asarray(scores2w)
            beams2w, toks2w = np.asarray(beams2w), np.asarray(toks2w)

        gather_idx = np.arange(b * w, dtype=np.int32)
        for i in range(b):
            if done[i]:
                continue  # rows idle; pos frozen, outputs ignored
            cur_len = lens[i] + step + 1
            nxt: List[Tuple[int, float, int]] = []
            for rank in range(2 * w):
                t, sc, bm = (int(toks2w[i, rank]),
                             float(scores2w[i, rank]),
                             int(beams2w[i, rank]))
                if not np.isfinite(sc):
                    continue  # warped-out artifact (see _select_2w)
                if eos_token_id is not None and t == eos_token_id:
                    if rank >= w:
                        continue
                    hyps[i].add(seqs[i][bm], sc, cur_len - lens[i])
                else:
                    nxt.append((t, sc, bm))
                if len(nxt) == w:
                    break
            if not nxt:  # every finite candidate was EOS: prompt is done
                done[i] = True
                continue
            while len(nxt) < w:  # warp starved the pool: duplicate a beam
                nxt.append(nxt[-1])
            done[i] = done[i] or hyps[i].is_done(
                float(scores2w[i, 0]), cur_len, lens[i])
            seqs[i] = [seqs[i][bm] + [t] for t, _, bm in nxt]
            beam_scores[i] = [sc for _, sc, _ in nxt]
            tokens[i] = [t for t, _, _ in nxt]
            gather_idx[i * w: (i + 1) * w] = \
                [i * w + bm for _, _, bm in nxt]
            if step >= 1:
                # rows' write offset is lens + step - 1 at decode step
                # `step`; the step-0 candidates come from prefill logits,
                # so the first decode still writes at offset lens
                pos[i * w: (i + 1) * w] += 1
        if all(done):
            break
        if step + 1 < max_new_tokens:
            caches = _gather_beams(caches, jnp.asarray(gather_idx))

    out: List[Tuple[np.ndarray, List[float]]] = []
    for i in range(b):
        if not done[i]:  # finalize: running beams become hypotheses
            for j in range(w):
                hyps[i].add(seqs[i][j], float(beam_scores[i][j]),
                            len(seqs[i][j]) - lens[i])
        best = sorted(hyps[i].beams, key=lambda x: -x[0])
        best = best[:num_return_sequences]
        max_len = lens[i] + max_new_tokens
        rows, scores = [], []
        for sc, seq in best:
            seq = list(seq)
            # transformers appends eos when the sequence ends early, then
            # pads returned rows to a common length with pad_token_id
            if eos_token_id is not None and len(seq) < max_len:
                seq = seq + [eos_token_id]
            rows.append(seq)
            scores.append(sc)
        ln = max(len(r) for r in rows)
        pad = eos_token_id if eos_token_id is not None else 0
        rows = [r + [pad] * (ln - len(r)) for r in rows]
        out.append((np.asarray(rows, np.int64), scores))
    return out


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
    do_sample: bool = False,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    seed: int = 0,
) -> Tuple[jax.Array, float]:
    """HF-exact beam search, single prompt. Returns ([1, L] best sequence
    — padded/eos exactly as transformers pads it — and its sequence
    score). Batched prompts / n-best returns: ``generate_beam_batched``."""
    if prompt.shape[0] != 1:
        raise NotImplementedError(
            "generate_beam wraps one prompt; use generate_beam_batched")
    [(rows, scores)] = generate_beam_batched(
        cfg, params, [np.asarray(prompt)[0]], max_new_tokens,
        num_beams=num_beams, length_penalty=length_penalty,
        early_stopping=early_stopping, eos_token_id=eos_token_id,
        method=method, dtype=dtype, max_seq_len=max_seq_len,
        do_sample=do_sample, temperature=temperature, top_k=top_k,
        top_p=top_p, seed=seed)
    return jnp.asarray(rows[:1]), scores[0]
