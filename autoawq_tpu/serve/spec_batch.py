"""Speculative continuous batching: draft-propose / target-verify for a
whole slot pool.

Combines serve/batching.py (fixed slot pool, per-request admission and
retirement, vector-pos caches) with serve/speculative.py's greedy
draft/verify scheme, pool-wide:

* k pool-batched DRAFT decode steps propose k tokens per active slot
  (the draft model reuses ``batched_decode_step`` on its own slot-pool
  cache — one compiled step regardless of traffic);
* ONE pool-batched TARGET verify pass scores all slots' [last, d_1..d_k]
  chunks (``batched_chunk_step``: an M=k+1 matmul streams the same
  target-weight bytes as an M=1 matvec, so verification amortizes the
  whole pool's weight read over up to k+1 tokens per slot);
* per-slot greedy prefix acceptance emits a VARIABLE number of tokens per
  slot per engine step — slots advance at their own acceptance rate.

Acceptance is per-slot and supports any mix of greedy and sampled
requests in one pool:

* greedy slots (temperature 0) accept the longest draft prefix matching
  the target's argmax — outputs bit-match the plain BatchingEngine
  (which bit-matches solo generation);
* sampled slots run speculative SAMPLING (Leviathan et al. — same
  scheme as serve/speculative.py's B=1 path) entirely on device
  (``pool_accept``): the draft proposes from its per-slot-warped
  distribution q via ``sample_batched``, the target accepts draft i
  with prob min(1, p_i(d_i)/q_i(d_i)) and resamples the first rejection
  from normalize(max(p - q, 0)). Proposal and acceptance share
  ``warp_batched``, so q is EXACTLY the proposal distribution and the
  emitted stream is distributed exactly as target-only pool sampling.

The reference has neither speculative decoding nor continuous batching.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules
from autoawq_tpu.serve import generate as gen
from autoawq_tpu.serve.batching import (BatchingEngine, Request,
                                        _install_slot, _penalize_batched,
                                        batched_decode_step, sample_batched,
                                        warp_batched)


@functools.partial(jax.jit, static_argnames=("cfg", "method", "dtype"),
                   donate_argnums=(3,))
def batched_chunk_step(
    cfg: ModelConfig,
    params: Dict[str, Any],
    tokens: jax.Array,  # [B, C] per-slot verify chunk [last, d_1..d_k]
    caches,
    pos: jax.Array,  # [B] per-slot valid lengths
    method: str = "auto",
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, Any]:
    """C tokens for EVERY slot against its own cache offset; causal within
    each chunk. Returns ([B, C, V] logits, caches)."""
    b, c = tokens.shape
    max_t = gen._cache_len(caches)
    positions = pos[:, None] + jnp.arange(c)[None, :]  # [B, C]
    x = modules.embed(cfg, params, tokens, dtype, positions)
    ki = jnp.arange(max_t)
    ok = ki[None, None, :] <= positions[:, :, None]  # [B, C, T]
    if cfg.sliding_window:
        ok &= ki[None, None, :] > positions[:, :, None] - cfg.sliding_window
    mask = jnp.where(ok, 0.0, -1e30).astype(jnp.float32)[:, None]
    if cfg.pos_embed == "alibi":
        rel = (ki[None, None, :] - positions[:, :, None]).astype(jnp.float32)
        slopes = modules.alibi_slopes(cfg.num_attention_heads)
        mask = mask + slopes[None, :, None, None] * rel[:, None]
    cos, sin = modules.rope_tables(cfg, positions, seq_len=max_t)
    new_caches = []
    for lp, cache in zip(params["layers"], caches):
        kv = {**cache, "pos": pos}
        x, kv = modules.block(cfg, lp, x, cos, sin, mask, kv_cache=kv,
                              method=method)
        new_caches.append({k: kv[k] for k in cache})
    logits = modules.logits_fn(cfg, params, x, method)
    return logits, new_caches


@functools.partial(jax.jit, donate_argnums=())
def pool_accept(
    tlog: jax.Array,    # [B, k+1, V] target logits over the verify chunk
    dlog: jax.Array,    # [B, k, V] draft logits the proposals came from
    drafts: jax.Array,  # [B, k] proposed token ids
    temp: jax.Array,    # [B] f32; 0 = greedy slot
    top_k: jax.Array,   # [B] i32; V = disabled
    top_p: jax.Array,   # [B] f32; 1.0 = disabled
    key: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Per-slot speculative acceptance for the whole pool in one compiled
    call; returns ([B] accepted counts, [B] next token).

    Sampled slots (temp > 0) follow accept_resample's math (Leviathan
    alg. 1) vectorized: accept draft i with prob min(1, p_i(d_i)/q_i(d_i)),
    resample the first rejection from normalize(max(p - q, 0)); an
    all-accepted slot samples fresh from p_k — expressed uniformly by
    padding q with a zero row at index k, which makes the residual at
    a == k exactly p_k. Greedy slots take longest-prefix argmax matching
    (bit-identical to the host path sampled pools replace).
    """
    b, kp1, v = tlog.shape
    k = kp1 - 1

    def warped_probs(lg, n):
        flat = lg.astype(jnp.float32).reshape(b * n, v)
        w = warp_batched(flat, jnp.repeat(temp, n), jnp.repeat(top_k, n),
                         jnp.repeat(top_p, n))
        return jax.nn.softmax(w, axis=-1).reshape(b, n, v)

    p = warped_probs(tlog, kp1)
    q = warped_probs(dlog, k)
    p_d = jnp.take_along_axis(p[:, :k], drafts[..., None], axis=-1)[..., 0]
    q_d = jnp.take_along_axis(q, drafts[..., None], axis=-1)[..., 0]
    key_u, key_r = jax.random.split(key)
    u = jax.random.uniform(key_u, (b, k))
    rej = u >= p_d / jnp.maximum(q_d, 1e-30)  # [B, k]
    a_s = jnp.where(rej.any(-1), jnp.argmax(rej, -1), k)  # [B]
    q_pad = jnp.concatenate([q, jnp.zeros((b, 1, v), q.dtype)], axis=1)
    p_a = jnp.take_along_axis(p, a_s[:, None, None], axis=1)[:, 0]  # [B, V]
    q_a = jnp.take_along_axis(q_pad, a_s[:, None, None], axis=1)[:, 0]
    residual = jnp.maximum(p_a - q_a, 0.0)
    tot = residual.sum(-1, keepdims=True)
    residual = jnp.where(tot > 1e-12, residual, p_a)  # p == q: sample p
    logr = jnp.where(residual > 0, jnp.log(residual), -jnp.inf)
    nxt_s = jax.random.categorical(key_r, logr, axis=-1)
    # greedy branch (temp == 0 slots)
    g = jnp.argmax(tlog, axis=-1)  # [B, k+1]
    match = drafts == g[:, :k]
    a_g = jnp.where(match.all(-1), k, jnp.argmin(match, -1))
    nxt_g = jnp.take_along_axis(g, a_g[:, None], axis=-1)[:, 0]
    greedy_slot = temp <= 0.0
    return (jnp.where(greedy_slot, a_g, a_s).astype(jnp.int32),
            jnp.where(greedy_slot, nxt_g, nxt_s).astype(jnp.int32))


@functools.partial(jax.jit, donate_argnums=())
def _presence_scatter(presence: jax.Array, toks: jax.Array) -> jax.Array:
    """Non-donating presence scatter for the draft chunk's LOCAL presence
    copy (batching._presence_note donates its input, which would
    invalidate the engine's live buffer the copy was forked from)."""
    return presence.at[jnp.arange(presence.shape[0]), toks].set(True)


@functools.partial(jax.jit, static_argnames=(
    "dcfg", "k", "method", "dtype", "sampling", "tracking"),
    donate_argnums=(2,))
def draft_burst(
    dcfg: ModelConfig,
    dparams: Dict[str, Any],
    dcaches,
    tok0: jax.Array,     # [B] last emitted token per slot
    dpos: jax.Array,     # [B] draft cache lengths
    key: jax.Array,
    pres: jax.Array,     # [B, V] presence (dummy when not tracking)
    steps0: jax.Array,
    temp: jax.Array, topk: jax.Array, topp: jax.Array,
    penalty: jax.Array,
    *, k: int, method: str = "auto", dtype=jnp.bfloat16,
    sampling: bool = False, tracking: bool = False,
):
    """The whole draft phase — k proposals + the catch-up step — in ONE
    dispatch (lax.scan over batched_decode_step). Replaces k+1 per-step
    host round-trips per speculation round; numerics identical to the
    unrolled loop: same key schedule (fold_in(key, steps0+1+i), sampled
    steps only advance the counter), same local penalty-presence
    updates. Returns (drafts [B, k], q-logits [B, k, V] | None,
    dcaches)."""

    def step(carry, i):
        tok, pres, caches = carry
        dlog, caches = batched_decode_step(
            dcfg, dparams, tok[:, None], caches, dpos + i, method, dtype)
        if tracking:
            dlog = _penalize_batched(dlog, penalty, pres)
        if sampling:
            nxt = sample_batched(dlog, temp, topk, topp,
                                 jax.random.fold_in(key, steps0 + 1 + i))
        else:
            nxt = jnp.argmax(dlog, axis=-1)
        # the catch-up step (i == k) only warms the draft cache: keep the
        # carry's token unchanged so its output row is never used
        take = i < k
        nxt = jnp.where(take, nxt, tok)
        if tracking:
            pres = jnp.where(take, _presence_scatter(pres, nxt), pres)
        out = (nxt, dlog if sampling else jnp.zeros((tok.shape[0], 1),
                                                    jnp.float32))
        return (nxt, pres, caches), out

    (tok, pres, dcaches), (toks, dlogs) = jax.lax.scan(
        step, (tok0, pres, dcaches), jnp.arange(k + 1))
    drafts = toks[:k].T  # [B, k]
    q = dlogs[:k].transpose(1, 0, 2) if sampling else None
    return drafts, q, dcaches


@functools.partial(jax.jit, donate_argnums=())
def _penalize_chunk(logits: jax.Array, penalty: jax.Array,
                    presence: jax.Array, drafts: jax.Array) -> jax.Array:
    """HF repetition penalty across a verify chunk ([B, C, V] logits):
    position i scores the token following drafts[:, :i], so its presence
    set is the slot's prompt+output presence PLUS the chunk's earlier
    proposals — exactly what the plain engine would have noted had those
    drafts been emitted one step at a time. Keeps greedy speculative
    streams bit-identical to the non-speculative pool under penalty."""
    b, c, v = logits.shape
    oh = jax.nn.one_hot(drafts, v, dtype=bool)  # [B, C-1, V]
    cum = jax.lax.associative_scan(jnp.logical_or, oh, axis=1)
    pres = jnp.concatenate(
        [jnp.zeros((b, 1, v), bool), cum], axis=1) | presence[:, None]
    pen = jnp.where(logits > 0, logits / penalty[:, None, None],
                    logits * penalty[:, None, None])
    return jnp.where(pres & (penalty[:, None, None] != 1.0), pen, logits)


@functools.partial(jax.jit, donate_argnums=())
def _spec_logprobs(tlog: jax.Array, drafts: jax.Array, a: jax.Array,
                   nxt: jax.Array) -> jax.Array:
    """[B, k+1] log p(emitted token) under the UNWARPED target chunk
    logits: row i scores drafts[i] for i < a and the correction/resample
    token at row a (entries past a are meaningless, never read)."""
    b, kp1, _ = tlog.shape
    toks = jnp.concatenate(
        [drafts, jnp.zeros((b, 1), drafts.dtype)], axis=1)
    toks = toks.at[jnp.arange(b), a].set(nxt)
    lsm = jax.nn.log_softmax(tlog.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(lsm, toks[..., None], axis=-1)[..., 0]


class SpeculativeBatchingEngine(BatchingEngine):
    """Slot-pool serving where every decode round proposes with a draft
    model and verifies with the target — per-slot acceptance, any mix of
    greedy and sampled requests (see module docstring)."""

    def __init__(self, cfg: ModelConfig, params: Dict[str, Any],
                 draft_cfg: ModelConfig, draft_params: Dict[str, Any],
                 k: int = 4, **kw):
        # chunked prefill composes as-is: the TARGET admits in chunks
        # (inherited _admit/_advance_prefill); the DRAFT — small by
        # design — still prefills whole at activation (_activate below).
        # top_logprobs composes too: the verify pass already holds
        # full-vocab target logits for every emitted position (tlog), so
        # the top-N alternatives come for free from the chunk.
        super().__init__(cfg, params, **kw)
        if cfg.vocab_size != draft_cfg.vocab_size:
            raise ValueError("draft and target must share a tokenizer")
        self.dcfg, self.dparams = draft_cfg, draft_params
        self.k = k
        self.dcaches = gen.init_kv_cache(draft_cfg, self.max_batch,
                                         self.max_seq, self.dtype)
        self.dpos = np.zeros((self.max_batch,), np.int32)
        self.accepted = self.proposed = 0

    def _activate(self, slot: int, req: Request, row, logits):
        # target slot install (base behavior) + draft prefill/install.
        # Multimodal (prompt_embeds) requests compose: the TARGET prefills
        # from the spliced embeds (base _admit); the DRAFT — which has its
        # own hidden size and cannot consume the target's embeds — simply
        # prefills the token ids, image placeholders included. Draft
        # quality only moves the ACCEPTANCE RATE; the verify pass scores
        # every emitted token under the image-conditioned target, so the
        # output stream is exactly the plain engine's (tested).
        drow = gen.init_kv_cache(self.dcfg, 1, self.max_seq, self.dtype)
        _, drow = gen.prefill(self.dcfg, self.dparams,
                              jnp.asarray(req.prompt[None]), drow,
                              self.method, self.dtype)
        self.dcaches = _install_slot(self.dcaches, drow, slot)
        self.dpos[slot] = len(req.prompt)
        super()._activate(slot, req, row, logits)

    def _emit(self, slot: int, toks: List[int], emitted, lps=None,
              tops=None):
        """Append accepted tokens, honoring EOS/budget/stop mid-run."""
        req = self.slots[slot]
        n0 = len(req.output)
        appended = 0
        for j, t in enumerate(toks):
            req.output.append(t)
            appended += 1
            self._note_token(slot, t)  # keep penalty presence current
            if lps is not None:
                req.logprobs.append(float(lps[j]))
            if tops is not None:
                req.top_logprobs.append(tops[j])
            emitted.append((req.id, t))
            self.pos[slot] += 1
            self.last_token[slot] = t
            if ((req.stop and req.hit_stop()) or t == self.eos
                    or len(req.output) >= req.max_new_tokens
                    or self.pos[slot] + 1 >= self.max_seq):
                break
        if req._stopped:
            # un-emit the pairs the stop trim removed (only THIS call's
            # pairs are recallable; a match spanning a previous round's
            # emission is compensated by the HTTP server via final_len)
            trimmed = appended - (len(req.output) - n0)
            for _ in range(min(trimmed, appended)):
                emitted.pop()
        # cache positions for tokens beyond a mid-run stop are stale but
        # unreachable (masked by pos); realign the draft stream
        self.dpos[slot] = self.pos[slot]
        self._retire_if_done(slot)

    def step(self) -> List[Tuple[Any, int]]:
        self._admit()
        if self.inflight:  # chunked target admissions advance one chunk
            self._advance_prefill()
        active = [i for i, s in enumerate(self.slots) if s is not None]
        if not active:
            return []
        k = self.k
        # capacity guard: a full round needs k+1 cache rows past pos
        if int(self.pos[active].max()) + k + 2 >= self.max_seq:
            # fall back to plain single-token pool decode near the end —
            # and MIRROR the consumed token into the draft cache, or the
            # draft stream desyncs for every slot and acceptance collapses
            # to ~0 once speculative rounds resume. The mirror state is
            # reconstructed AFTER the step: super().step() may admit and
            # activate new slots first, and a pre-step snapshot would
            # write a garbage row inside a freshly-installed draft prefix
            # (each active slot's consumed token is output[-2] at
            # pos - 1 — true both for survivors and for slots activated
            # inside this very step).
            emitted = super().step()
            tok_m = np.zeros_like(self.last_token)
            pos_m = np.zeros_like(self.pos)
            for slot, req in enumerate(self.slots):
                if req is not None and len(req.output) >= 2:
                    tok_m[slot] = req.output[-2]
                    pos_m[slot] = self.pos[slot] - 1
            _, self.dcaches = batched_decode_step(
                self.dcfg, self.dparams, jnp.asarray(tok_m[:, None]),
                self.dcaches, jnp.asarray(pos_m), self.method, self.dtype)
            self.dpos = self.pos.copy()
            return emitted

        # ---- draft: k proposals per slot + one catch-up step (the last
        # proposal's own row, so a fully-accepted round leaves no hole —
        # see serve/speculative.py). Inactive slots compute garbage that
        # is never read (their pos stays 0 and rows get overwritten).
        sampling = bool(np.any(self.temp > 0.0))
        tracking = self._tracking()  # any repetition_penalty live
        pen = jnp.asarray(self.penalty) if tracking else None
        # the whole draft phase (k proposals + catch-up) is ONE dispatch
        # (draft_burst: scanned decode+penalize+sample); numerics match
        # the former unrolled loop exactly, incl. the key schedule
        pres0 = (self._pres_dev if tracking
                 else jnp.zeros((self.max_batch, 1), jnp.bool_))
        drafts_d, qlogs, self.dcaches = draft_burst(
            self.dcfg, self.dparams, self.dcaches,
            jnp.asarray(self.last_token), jnp.asarray(self.dpos),
            self._key, pres0, jnp.int32(self._steps),
            jnp.asarray(self.temp), jnp.asarray(self.topk),
            jnp.asarray(self.topp),
            pen if tracking else jnp.ones((self.max_batch,), jnp.float32),
            k=k, method=self.method, dtype=self.dtype,
            sampling=sampling, tracking=tracking)
        if sampling:
            self._steps += k  # the unrolled loop drew k keys per round
        drafts = np.asarray(drafts_d)

        # ---- target: one verify pass for the whole pool
        chunk = np.concatenate([self.last_token[:, None], drafts], axis=1)
        tlog, self.caches = batched_chunk_step(
            self.cfg, self.params, jnp.asarray(chunk), self.caches,
            jnp.asarray(self.pos), self.method, self.dtype)
        # acceptance scores against PENALIZED logits (HF processor ->
        # warper order); raw tlog still feeds _spec_logprobs, matching the
        # plain engine's unprocessed logprob reporting
        tlog_acc = tlog if not tracking else _penalize_chunk(
            tlog, pen, self._pres_dev, jnp.asarray(drafts))
        if sampling:
            acc, nxt = pool_accept(
                tlog_acc, qlogs, jnp.asarray(drafts),
                jnp.asarray(self.temp), jnp.asarray(self.topk),
                jnp.asarray(self.topp), self._next_key())
            acc, nxt = np.asarray(acc), np.asarray(nxt)
        else:  # all-greedy pool: pure argmax prefix matching
            greedy = np.asarray(jnp.argmax(tlog_acc, axis=-1))  # [B, k+1]
            match = drafts == greedy[:, :k]
            acc = np.where(match.all(-1), k, np.argmin(match, axis=-1))
            nxt = greedy[np.arange(self.max_batch), acc]
        lp_mat = None
        if self.return_logprobs:
            lp_mat = np.asarray(_spec_logprobs(
                tlog, jnp.asarray(drafts), jnp.asarray(acc),
                jnp.asarray(nxt)))
        top_vals = top_ids = None
        if self.top_logprobs:
            # the verify pass computed full-vocab target logits for every
            # chunk row; the top-N alternatives per emitted position are in
            # hand (raw tlog — unwarped, like the plain engine's reporting)
            from autoawq_tpu.serve.batching import _top_n_logprobs

            tv, ti = _top_n_logprobs(tlog, self.top_logprobs)
            top_vals, top_ids = np.asarray(tv), np.asarray(ti)

        emitted: List[Tuple[Any, int]] = []
        for slot in active:
            a = int(acc[slot])
            new = [int(t) for t in drafts[slot, :a]] + [int(nxt[slot])]
            self.accepted += a
            self.proposed += k
            tops = None
            if top_vals is not None:
                tops = [
                    {int(t): float(v)
                     for t, v in zip(top_ids[slot, j], top_vals[slot, j])}
                    for j in range(a + 1)]
            self._emit(slot, new, emitted,
                       None if lp_mat is None else lp_mat[slot], tops)
        return emitted

    @property
    def accept_rate(self) -> float:
        return self.accepted / max(self.proposed, 1)
