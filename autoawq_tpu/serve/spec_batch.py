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

Greedy only (temperature must stay 0): per-request sampled acceptance
needs per-slot rejection-resample bookkeeping that isn't worth the
host-device traffic here; use serve/speculative.py for sampled B=1.
Outputs bit-match the plain BatchingEngine (which bit-matches solo
generation). The reference has neither speculative decoding nor
continuous batching.
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
                                        _install_slot, batched_decode_step)


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


class SpeculativeBatchingEngine(BatchingEngine):
    """Slot-pool serving where every decode round proposes with a draft
    model and verifies with the target — per-slot acceptance, greedy."""

    def __init__(self, cfg: ModelConfig, params: Dict[str, Any],
                 draft_cfg: ModelConfig, draft_params: Dict[str, Any],
                 k: int = 4, **kw):
        if kw.get("prefill_chunk_size") is not None:
            raise NotImplementedError(
                "chunked prefill + speculation not combined yet")
        if kw.get("kv_quant"):
            raise NotImplementedError("int8 KV + speculation not combined")
        super().__init__(cfg, params, **kw)
        if cfg.vocab_size != draft_cfg.vocab_size:
            raise ValueError("draft and target must share a tokenizer")
        self.dcfg, self.dparams = draft_cfg, draft_params
        self.k = k
        self.dcaches = gen.init_kv_cache(draft_cfg, self.max_batch,
                                         self.max_seq, self.dtype)
        self.dpos = np.zeros((self.max_batch,), np.int32)
        self.accepted = self.proposed = 0

    def add_request(self, req_id, prompt, max_new_tokens: int = 128,
                    temperature: float = 0.0, top_k=None, top_p=None):
        if temperature and temperature > 0.0:
            raise NotImplementedError(
                "speculative pool serving is greedy-only; use "
                "serve.speculative for sampled B=1")
        super().add_request(req_id, prompt, max_new_tokens)

    def _activate(self, slot: int, req: Request, row, logits):
        # target slot install (base behavior) + draft prefill/install
        drow = gen.init_kv_cache(self.dcfg, 1, self.max_seq, self.dtype)
        _, drow = gen.prefill(self.dcfg, self.dparams,
                              jnp.asarray(req.prompt[None]), drow,
                              self.method, self.dtype)
        self.dcaches = _install_slot(self.dcaches, drow, slot)
        self.dpos[slot] = len(req.prompt)
        super()._activate(slot, req, row, logits)

    def _emit(self, slot: int, toks: List[int], emitted):
        """Append accepted tokens, honoring EOS/budget mid-run."""
        req = self.slots[slot]
        for t in toks:
            req.output.append(t)
            emitted.append((req.id, t))
            self.pos[slot] += 1
            self.last_token[slot] = t
            if (t == self.eos or len(req.output) >= req.max_new_tokens
                    or self.pos[slot] + 1 >= self.max_seq):
                break
        # cache positions for tokens beyond a mid-run stop are stale but
        # unreachable (masked by pos); realign the draft stream
        self.dpos[slot] = self.pos[slot]
        self._retire_if_done(slot)

    def step(self) -> List[Tuple[Any, int]]:
        self._admit()
        active = [i for i, s in enumerate(self.slots) if s is not None]
        if not active:
            return []
        k = self.k
        # capacity guard: a full round needs k+1 cache rows past pos
        if int(self.pos[active].max()) + k + 2 >= self.max_seq:
            # fall back to plain single-token pool decode near the end —
            # and MIRROR the consumed token into the draft cache, or the
            # draft stream desyncs for every slot and acceptance collapses
            # to ~0 once speculative rounds resume
            tok0 = self.last_token.copy()
            pos0 = self.dpos.copy()
            emitted = super().step()
            _, self.dcaches = batched_decode_step(
                self.dcfg, self.dparams, jnp.asarray(tok0[:, None]),
                self.dcaches, jnp.asarray(pos0), self.method, self.dtype)
            self.dpos = self.pos.copy()
            return emitted

        # ---- draft: k proposals per slot + one catch-up step (the last
        # proposal's own row, so a fully-accepted round leaves no hole —
        # see serve/speculative.py). Inactive slots compute garbage that
        # is never read (their pos stays 0 and rows get overwritten).
        drafts = np.zeros((self.max_batch, k), np.int64)
        tok = self.last_token.copy()
        for i in range(k + 1):
            dlog, self.dcaches = batched_decode_step(
                self.dcfg, self.dparams, jnp.asarray(tok[:, None]),
                self.dcaches, jnp.asarray(self.dpos + i), self.method,
                self.dtype)
            if i < k:
                tok = np.asarray(jnp.argmax(dlog, axis=-1))
                drafts[:, i] = tok

        # ---- target: one verify pass for the whole pool
        chunk = np.concatenate([self.last_token[:, None], drafts], axis=1)
        tlog, self.caches = batched_chunk_step(
            self.cfg, self.params, jnp.asarray(chunk), self.caches,
            jnp.asarray(self.pos), self.method, self.dtype)
        greedy = np.asarray(jnp.argmax(tlog, axis=-1))  # [B, k+1]

        emitted: List[Tuple[Any, int]] = []
        for slot in active:
            a = 0
            while a < k and drafts[slot, a] == greedy[slot, a]:
                a += 1
            new = [int(t) for t in drafts[slot, :a]] + [int(greedy[slot, a])]
            self.accepted += a
            self.proposed += k
            self._emit(slot, new, emitted)
        return emitted

    @property
    def accept_rate(self) -> float:
        return self.accepted / max(self.proposed, 1)
