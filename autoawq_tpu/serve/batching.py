"""Continuous batching: slot-based serving with per-request admission.

The reference serves fixed static batches — a request joins at generation
start and every sequence in the batch runs to the longest one's end
(awq/modules/fused/cache.py preallocates [AWQ_BATCH_SIZE, ...]; batch-size
changes reallocate, awq/modules/fused/attn.py:208-218). This engine is the
TPU-native upgrade the reference lacks: a fixed pool of ``max_batch`` KV
slots, requests admitted into free slots as they arrive and retired at
their own EOS, with ONE compiled decode step for the whole pool every
iteration (static shapes throughout — XLA never recompiles as traffic
changes).

Design:
* KV caches are the standard [B, H, T, D] donated pytree; each slot owns
  row ``b`` with its own write offset. A [B] position vector drives per-slot
  ``dynamic_update_slice`` (nn/modules.py vector-pos path) and a per-slot
  causal mask built from ``pos`` — inactive slots are fully masked and
  their outputs discarded host-side.
* Admission runs the normal single-request ``prefill`` into a scratch
  [1, H, T, D] cache, then copies that row into the slot (one
  dynamic_update_slice per layer) — so prefill cost is per-request, decode
  cost is per-pool-step, and neither depends on which slots are busy.
* The host-side scheduler is deliberately dumb-simple FIFO: admit into any
  free slot, retire on EOS / budget. Sophistication (priorities, paging,
  chunked prefill) layers on top without touching the compiled step.
"""

from __future__ import annotations

import functools
from collections import deque
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules
from autoawq_tpu.serve import generate as gen


@functools.partial(jax.jit, static_argnames=("cfg", "method", "dtype"),
                   donate_argnums=(3,))
def batched_decode_step(
    cfg: ModelConfig,
    params: Dict[str, Any],
    tokens: jax.Array,  # [B, 1] last token per slot
    caches: List[Dict[str, jax.Array]],
    pos: jax.Array,  # [B] int32 per-slot lengths
    method: str = "auto",
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, List[Dict[str, jax.Array]]]:
    """One decode token for every slot; returns ([B, V] logits, caches)."""
    max_t = gen._cache_len(caches)
    positions = pos[:, None]  # [B, 1]
    x = modules.embed(cfg, params, tokens, dtype, positions)
    ki = jnp.arange(max_t)[None, :]
    ok = ki <= pos[:, None]  # [B, T]
    if cfg.sliding_window:
        ok &= ki > (pos[:, None] - cfg.sliding_window)
    mask = jnp.where(ok, 0.0, -1e30).astype(jnp.float32)[:, None, None, :]
    if cfg.pos_embed == "alibi":
        # Per-slot bias [B, H, 1, T]: each slot's single query sits at its
        # own pos.  (alibi_bias(q_pos[B], ki[T]) would return [1, H, B, T]
        # and broadcast a bogus extra B dim into the scores.)
        rel = (ki - pos[:, None]).astype(jnp.float32)  # [B, T]
        slopes = modules.alibi_slopes(cfg.num_attention_heads)
        mask = mask + slopes[None, :, None, None] * rel[:, None, None, :]
    cos, sin = modules.rope_tables(cfg, positions, seq_len=max_t)
    new_caches = []
    for lp, cache in zip(params["layers"], caches):
        kv = {**cache, "pos": pos}
        x, kv = modules.block(cfg, lp, x, cos, sin, mask, kv_cache=kv,
                              method=method)
        new_caches.append({k: kv[k] for k in cache})
    logits = modules.logits_fn(cfg, params, x, method)
    return logits[:, 0, :], new_caches


@functools.partial(jax.jit, static_argnames=("cfg", "method", "dtype"),
                   donate_argnums=(3,))
def prefill_chunk(
    cfg: ModelConfig,
    params: Dict[str, Any],
    tokens: jax.Array,  # [1, C] chunk of one request's prompt
    row_caches: List[Dict[str, jax.Array]],
    pos0: jax.Array,  # scalar int32: tokens already prefilled
    method: str = "auto",
    dtype=jnp.bfloat16,
    embeds: Optional[jax.Array] = None,  # [1, C, H] multimodal chunk rows
) -> Tuple[jax.Array, List[Dict[str, jax.Array]]]:
    """One prompt chunk against a single-request cache; returns the chunk's
    [1, C, V] logits (the caller indexes the last REAL position — padded
    tail positions write cache rows that decode overwrites before they are
    ever unmasked). ``embeds`` replaces the token-embedding lookup
    (multimodal prompts — the paged engine's shared-prefix suffix path)."""
    _, c = tokens.shape
    max_t = gen._cache_len(row_caches)
    positions = pos0 + jnp.arange(c)[None, :]
    x = (embeds.astype(dtype) if embeds is not None
         else modules.embed(cfg, params, tokens, dtype, positions))
    ki = jnp.arange(max_t)[None, :]
    ok = ki <= positions[0][:, None]  # [C, T]
    if cfg.sliding_window:
        ok &= ki > positions[0][:, None] - cfg.sliding_window
    mask = jnp.where(ok, 0.0, -1e30).astype(jnp.float32)[None, None]
    if cfg.pos_embed == "alibi":
        mask = mask + modules.alibi_bias(cfg.num_attention_heads,
                                         positions[0], ki[0])
    cos, sin = modules.rope_tables(cfg, positions, seq_len=max_t)
    new_caches = []
    for lp, cache in zip(params["layers"], row_caches):
        kv = {**cache, "pos": pos0}
        x, kv = modules.block(cfg, lp, x, cos, sin, mask, kv_cache=kv,
                              method=method)
        new_caches.append({k: kv[k] for k in cache})
    logits = modules.logits_fn(cfg, params, x, method)
    return logits, new_caches


def advance_one_chunk(cfg, params, st, chunk_size: int, method, dtype):
    """Advance one in-flight chunked admission by one (padded) chunk.
    ``st`` is the engine's inflight dict ({"req", "row", "done"}); returns
    the tail [1, V] logits when the prompt completed, else None. Shared by
    the contiguous and paged engines so the pad/clamp discipline lives in
    ONE place."""
    req = st["req"]
    lo = st["done"]
    chunk = req.prompt[lo : lo + chunk_size]
    real = len(chunk)
    if real < chunk_size:
        chunk = np.pad(chunk, (0, chunk_size - real))
    logits, st["row"] = prefill_chunk(
        cfg, params, jnp.asarray(chunk[None]), st["row"], jnp.int32(lo),
        method, dtype)
    st["done"] += real
    if st["done"] >= len(req.prompt):
        return logits[:, real - 1]
    return None


@functools.partial(jax.jit, static_argnames=("slot",), donate_argnums=(0,))
def _install_slot(caches, row_caches, slot: int):
    """Copy a single-request prefill cache row into pool slot ``slot``."""
    out = []
    for pool, row in zip(caches, row_caches):
        out.append({
            key: jax.lax.dynamic_update_slice(
                pool[key], row[key].astype(pool[key].dtype),
                (slot,) + (0,) * (row[key].ndim - 1))
            for key in pool
        })
    return out


@functools.partial(jax.jit, donate_argnums=())
def _token_logprobs(logits: jax.Array, toks: jax.Array) -> jax.Array:
    """log p(tok) per row of [B, V] logits (the UNWARPED model
    distribution — what OpenAI's logprobs field reports)."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(lp, toks[:, None], axis=-1)[:, 0]


@functools.partial(jax.jit, static_argnames=("n",))
def _top_n_logprobs(logits: jax.Array, n: int):
    """Top-n (logprob, token id) per row of [B, V] unwarped logits —
    OpenAI's top_logprobs alternatives."""
    lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jax.lax.top_k(lsm, n)


def warp_batched(
    logits: jax.Array,  # [B, V]
    temp: jax.Array,    # [B] f32 (clamped away from 0)
    top_k: jax.Array,   # [B] i32; V = disabled
    top_p: jax.Array,   # [B] f32; 1.0 = disabled
) -> jax.Array:
    """Per-slot HF warper chain (temperature -> top_k -> top_p) with
    TRACED per-request params; returns the warped logits (disallowed
    entries at -inf). Shared by ``sample_batched`` (proposal) and the
    pool speculative acceptance (serve/spec_batch.py), which must score
    against EXACTLY the distribution tokens were proposed from.

    Per-slot k/p are values, not static shapes, so both warpers reduce to
    a value threshold against the slot's descending-sorted logits: top-k's
    threshold is the k-th largest logit; top-p's is the smallest logit in
    the minimal prefix whose probability mass reaches p. (Boundary ties
    all survive — HF cuts by sorted index; difference only matters for
    exactly-equal logits at the nucleus edge.)
    """
    v = logits.shape[-1]
    scaled = logits / jnp.maximum(temp, 1e-6)[:, None]
    sv = -jnp.sort(-scaled, axis=-1)  # descending [B, V]
    # top-k threshold
    ki = jnp.clip(top_k - 1, 0, v - 1)
    thr_k = jnp.take_along_axis(sv, ki[:, None], axis=-1)  # [B, 1]
    # top-p threshold: keep sorted position i while mass before it < p
    probs = jax.nn.softmax(sv, axis=-1)
    before = jnp.cumsum(probs, axis=-1) - probs  # exclusive cumsum
    n_keep = (before < top_p[:, None]).sum(-1)  # >= 1 always
    thr_p = jnp.take_along_axis(
        sv, jnp.clip(n_keep - 1, 0, v - 1)[:, None], axis=-1)
    thr = jnp.maximum(thr_k, thr_p)
    return jnp.where(scaled < thr, -jnp.inf, scaled)


@functools.partial(jax.jit, donate_argnums=(0,))
def _presence_note(presence: jax.Array, toks: jax.Array) -> jax.Array:
    """Scatter one decode step's tokens ([B]) into the [B, V] presence."""
    return presence.at[jnp.arange(presence.shape[0]), toks].set(True)


@functools.partial(jax.jit, donate_argnums=())
def _penalize_batched(logits: jax.Array, penalty: jax.Array,
                      presence: jax.Array) -> jax.Array:
    """Per-slot HF RepetitionPenaltyLogitsProcessor: for tokens already
    seen in the slot's prompt+output (``presence`` [B, V] bool), divide
    positive logits by the slot's penalty and multiply negative ones.
    Applied BEFORE the warpers, matching HF's processor->warper order."""
    pen = jnp.where(logits > 0, logits / penalty[:, None],
                    logits * penalty[:, None])
    return jnp.where(presence & (penalty[:, None] != 1.0), pen, logits)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "n", "method", "dtype", "tracking", "sampling", "want_lp",
    "want_top"),
    donate_argnums=(2, 6))
def batched_decode_burst(
    cfg: ModelConfig,
    params: Dict[str, Any],
    caches: List[Dict[str, jax.Array]],
    tokens: jax.Array,   # [B] last token per slot
    pos: jax.Array,      # [B] int32 per-slot lengths
    key: jax.Array,      # base PRNG key (engine self._key)
    pres: jax.Array,     # [B, V] bool presence (dummy when not tracking)
    steps0: jax.Array,   # scalar int32: engine's step counter so far
    temp: jax.Array, topk: jax.Array, topp: jax.Array,
    penalty: jax.Array,
    *, n: int, method: str = "auto", dtype=jnp.bfloat16,
    tracking: bool = False, sampling: bool = False, want_lp: bool = False,
    want_top: int = 0,
):
    """``n`` pool decode+sample steps in ONE dispatch (lax.scan) —
    the multi-step scheduling move: per-step host dispatch costs ~30 ms
    through a device tunnel (and ~0.1-1 ms even locally), which at bs8
    decode dominates the math. Bit-identical to ``n`` successive
    ``BatchingEngine.step()`` pool phases: the same key schedule
    (fold_in(key, steps0 + 1 + i)), the same penalty-presence updates,
    the same warpers. Returns (toks [B, n], lps [B, n] | None,
    (top_vals, top_ids) [B, n, want_top] | None, caches, presence). Slots that retire mid-burst keep decoding garbage the
    host discards — their cache rows past the host's pos are masked on
    every later step, so nothing leaks."""

    def body(carry, i):
        tok, p, caches, pres = carry
        logits, caches = batched_decode_step(
            cfg, params, tok[:, None], caches, p, method, dtype)
        lp_in = logits
        if tracking:
            logits = _penalize_batched(logits, penalty, pres)
        if sampling:
            nxt = sample_batched(logits, temp, topk, topp,
                                 jax.random.fold_in(key, steps0 + 1 + i))
        else:
            nxt = jnp.argmax(logits, axis=-1)
        if tracking:
            pres = _presence_note(pres, nxt)
        lp = (_token_logprobs(lp_in, nxt) if want_lp
              else jnp.zeros((logits.shape[0],), jnp.float32))
        top = (_top_n_logprobs(lp_in, want_top) if want_top
               else (jnp.zeros((logits.shape[0], 1), jnp.float32),) * 2)
        return (nxt, p + 1, caches, pres), (nxt, lp, top)

    (tok, p, caches, pres), (toks, lps, tops) = jax.lax.scan(
        body, (tokens, pos, caches, pres), jnp.arange(n))
    top_out = ((tops[0].transpose(1, 0, 2), tops[1].transpose(1, 0, 2))
               if want_top else None)
    return (toks.T, (lps.T if want_lp else None), top_out, caches, pres)


@functools.partial(jax.jit, donate_argnums=())
def sample_batched(
    logits: jax.Array,  # [B, V]
    temp: jax.Array,    # [B] f32; 0 = greedy
    top_k: jax.Array,   # [B] i32; V = disabled
    top_p: jax.Array,   # [B] f32; 1.0 = disabled
    key: jax.Array,
) -> jax.Array:
    """Per-slot sampling with traced per-request params (one compiled step
    serves any mix of greedy/sampled requests — the slot pool analogue of
    serve.generate.sample; warper semantics in ``warp_batched``)."""
    greedy = jnp.argmax(logits, axis=-1)
    masked = warp_batched(logits, temp, top_k, top_p)
    sampled = jax.random.categorical(key, masked, axis=-1)
    return jnp.where(temp <= 0.0, greedy, sampled)


class SamplingSlots:
    """Per-slot sampling state + token selection, shared by both batching
    engines (contiguous and paged). Greedy pools skip the sort/softmax
    machinery entirely — the all-greedy default costs one argmax per step,
    exactly as before sampling existed."""

    def _init_sampling(self, max_batch: int, vocab_size: int, seed: int):
        self.temp = np.zeros((max_batch,), np.float32)
        self.topk = np.full((max_batch,), vocab_size, np.int32)
        self.topp = np.ones((max_batch,), np.float32)
        self.penalty = np.ones((max_batch,), np.float32)
        # prompt+output token presence lives ON DEVICE ([B, V] bool),
        # built lazily when the first penalized request arrives and
        # maintained with one tiny scatter per pool step while any
        # penalty is active — penalty-free pools never touch it, and no
        # per-step host->device matrix transfer ever happens
        self._pres_dev: Optional[jax.Array] = None
        self._vocab = vocab_size
        self._key = jax.random.PRNGKey(seed)
        self._steps = 0

    def _tracking(self) -> bool:
        return bool(np.any(self.penalty != 1.0))

    def _rebuild_presence(self) -> None:
        pres = np.zeros((self.max_batch, self._vocab), bool)
        for slot, req in enumerate(self.slots):
            if req is not None:
                pres[slot, np.asarray(req.prompt, np.int64)] = True
                if req.output:
                    pres[slot, np.asarray(req.output, np.int64)] = True
        self._pres_dev = jnp.asarray(pres)

    def _set_sampling(self, slot: int, req: "Request") -> None:
        v = self._vocab
        self.temp[slot] = req.temperature
        self.topk[slot] = (req.top_k if req.top_k and 0 < req.top_k < v
                           else v)
        self.topp[slot] = (req.top_p if req.top_p is not None
                           and req.top_p < 1.0 else 1.0)
        was_tracking = self._tracking()
        self.penalty[slot] = req.repetition_penalty or 1.0
        if self.penalty[slot] != 1.0:
            if not was_tracking or self._pres_dev is None:
                # presence went unmaintained while no penalty was live:
                # rebuild every slot's history from its request object
                self._rebuild_presence()
            self._pres_dev = self._pres_dev.at[slot].set(False).at[
                slot, jnp.asarray(np.asarray(req.prompt, np.int64))
            ].set(True)

    def _clear_sampling(self, slot: int) -> None:
        self.temp[slot] = 0.0  # freed slot: back to (discarded) greedy
        self.penalty[slot] = 1.0

    def _note_token(self, slot: int, tok: int) -> None:
        """Admission-time single-token presence update."""
        if self._tracking():
            self._pres_dev = self._pres_dev.at[slot, tok].set(True)

    def _note_tokens_all(self, toks: np.ndarray) -> None:
        """One pool step's tokens for every slot (garbage rows of
        inactive/penalty-free slots are never read)."""
        if self._tracking():
            self._pres_dev = _presence_note(self._pres_dev,
                                            jnp.asarray(toks))

    def _next_key(self):
        self._steps += 1
        return jax.random.fold_in(self._key, self._steps)

    def _sample_pool(self, logits: jax.Array) -> np.ndarray:
        """Pool-step token per slot ([B, V] logits -> [B] ids)."""
        if self._tracking():
            logits = _penalize_batched(logits, jnp.asarray(self.penalty),
                                       self._pres_dev)
        if not np.any(self.temp > 0.0):  # all-greedy fast path
            return np.asarray(jnp.argmax(logits, axis=-1))
        return np.asarray(sample_batched(
            logits, jnp.asarray(self.temp), jnp.asarray(self.topk),
            jnp.asarray(self.topp), self._next_key()))

    def _sample_slot(self, slot: int, logits_row: jax.Array) -> int:
        """Admission-time first token for one slot ([1, V] logits)."""
        if self.penalty[slot] != 1.0:
            logits_row = _penalize_batched(
                logits_row, jnp.asarray(self.penalty[slot : slot + 1]),
                self._pres_dev[slot : slot + 1])
        if self.temp[slot] == 0.0:
            return int(jnp.argmax(logits_row[0]))
        return int(sample_batched(
            logits_row, jnp.asarray(self.temp[slot : slot + 1]),
            jnp.asarray(self.topk[slot : slot + 1]),
            jnp.asarray(self.topp[slot : slot + 1]), self._next_key())[0])

    def _record_logprobs(self, logits, toks, slots) -> None:
        """Append each ACTIVE slot's chosen-token logprob — and, when the
        engine was built with top_logprobs=N, the top-N alternatives —
        (no-op unless return_logprobs=True)."""
        if not getattr(self, "return_logprobs", False):
            return
        lp = np.asarray(_token_logprobs(logits, jnp.asarray(toks)))
        n = getattr(self, "top_logprobs", 0)
        if n:
            vals, ids = _top_n_logprobs(logits, n)
            vals, ids = np.asarray(vals), np.asarray(ids)
        for slot in slots:
            req = self.slots[slot]
            if req is not None:
                req.logprobs.append(float(lp[slot]))
                if n:
                    req.top_logprobs.append(
                        {int(t): float(v)
                         for t, v in zip(ids[slot], vals[slot])})

    def _record_logprobs_slot(self, slot: int, req: "Request", logits_row,
                              tok: int) -> None:
        """Admission-time variant for one slot's [1, V] logits."""
        if not getattr(self, "return_logprobs", False):
            return
        req.logprobs.append(float(np.asarray(
            _token_logprobs(logits_row, jnp.asarray([tok])))[0]))
        n = getattr(self, "top_logprobs", 0)
        if n:
            vals, ids = _top_n_logprobs(logits_row, n)
            req.top_logprobs.append(
                {int(t): float(v)
                 for t, v in zip(np.asarray(ids)[0], np.asarray(vals)[0])})

    # ------------------------------------------------- shared engine ops
    def cancel(self, req_id) -> bool:
        """Abort a request wherever it lives: queued (dropped), in chunked
        prefill (slot + resources released), or active (slot freed; cache
        rows left stale — masked by pos, overwritten on reuse). Returns
        whether anything was cancelled; the request does NOT join
        ``finished``. NOT thread-safe: call from the thread that owns the
        engine (serve/server.py routes it through the engine thread)."""
        for i, req in enumerate(self.queue):
            if req.id == req_id:
                del self.queue[i]
                return True
        for slot, st in list(self.inflight.items()):
            if st["req"].id == req_id:
                del self.inflight[slot]
                self._free_slot(slot)
                return True
        for slot, req in enumerate(self.slots):
            if req is not None and req.id == req_id:
                self.slots[slot] = None
                self._free_slot(slot)
                return True
        return False

    def stats(self) -> Dict[str, Any]:
        """Operational snapshot (the HTTP /metrics payload)."""
        return {
            "slots_busy": sum(r is not None for r in self.slots),
            "slots_total": self.max_batch,
            "queued": len(self.queue),
            "prefilling": len(self.inflight),
            "finished": len(self.finished),
        }


class Request:
    def __init__(self, req_id: Any, prompt: np.ndarray,
                 max_new_tokens: int = 128, temperature: float = 0.0,
                 top_k: Optional[int] = None, top_p: Optional[float] = None,
                 repetition_penalty: float = 1.0,
                 stop: Optional[List[List[int]]] = None,
                 prompt_embeds=None):
        self.id = req_id
        self.prompt = np.asarray(prompt).reshape(-1)
        # multimodal prompts: [S, H] precomputed input embeds (vision
        # features spliced at image-token positions) replace the token
        # embedding lookup at prefill; decode stays on token ids
        self.prompt_embeds = prompt_embeds
        self.max_new_tokens = max_new_tokens
        self.temperature = float(temperature)
        self.top_k = top_k
        self.top_p = top_p
        self.repetition_penalty = float(repetition_penalty or 1.0)
        # per-request stop sequences (token-id lists); a match retires
        # the request and TRIMS the matched suffix (OpenAI semantics)
        self.stop = [list(map(int, s)) for s in stop] if stop else []
        self._stopped = False
        self.output: List[int] = []
        self.logprobs: List[float] = []  # filled when the engine has
        # return_logprobs=True (one log p(token | prefix) per output token)
        self.top_logprobs: List[Dict[int, float]] = []  # with
        # top_logprobs=N: per position, the N most likely token ids -> lp
        self.done = False

    def hit_stop(self) -> bool:
        """True when the output ends with one of the stop sequences; the
        LONGEST matching suffix is trimmed from the output (earliest
        truncation point — a stop that is a suffix of another must not
        leak the longer match's leading tokens). Idempotent."""
        if self._stopped:
            return True
        best = 0
        for s in self.stop:
            if s and len(s) > best and len(self.output) >= len(s) \
                    and self.output[-len(s):] == s:
                best = len(s)
        if best:
            del self.output[-best:]
            del self.logprobs[len(self.output):]
            del self.top_logprobs[len(self.output):]
            self._stopped = True
            return True
        return False


class BatchingEngine(SamplingSlots):
    """FIFO continuous-batching scheduler over a fixed slot pool."""

    def __init__(self, cfg: ModelConfig, params: Dict[str, Any],
                 max_batch: int = 8, max_seq_len: int = 2048,
                 eos_token_id: Optional[int] = None, method: str = "auto",
                 dtype=jnp.bfloat16,
                 prefill_chunk_size: Optional[int] = None,
                 kv_quant: bool = False, seed: int = 0,
                 return_logprobs: bool = False, top_logprobs: int = 0):
        """``prefill_chunk_size`` bounds per-step admission work: long
        prompts prefill in fixed-size chunks interleaved with pool decode
        steps, so running requests never stall behind a 100k-token arrival
        (the continuous-batching "chunked prefill" discipline). ``None``
        prefills each prompt whole at admission."""
        self.cfg, self.params = cfg, params
        self.max_batch, self.max_seq = max_batch, max_seq_len
        self.eos = eos_token_id
        self.method, self.dtype = method, dtype
        if prefill_chunk_size is not None \
                and max_seq_len % prefill_chunk_size != 0:
            # The final padded chunk writes at pos0=lo with
            # dynamic_update_slice; if lo + chunk could exceed capacity XLA
            # clamps the start index and silently overwrites earlier valid
            # KV rows.  A chunk-multiple capacity makes that unreachable
            # (add_request already caps prompts at max_seq_len - 1).
            raise ValueError(
                f"max_seq_len ({max_seq_len}) must be a multiple of "
                f"prefill_chunk_size ({prefill_chunk_size})")
        self.chunk = prefill_chunk_size
        self.kv_quant = kv_quant
        self.return_logprobs = return_logprobs or top_logprobs > 0
        self.top_logprobs = top_logprobs
        gen._check_rope_capacity(cfg, max_seq_len)
        self.caches = gen.init_kv_cache(cfg, max_batch, max_seq_len, dtype,
                                        kv_quant=kv_quant)
        self.pos = np.zeros((max_batch,), np.int32)
        self.last_token = np.zeros((max_batch,), np.int32)
        self.slots: List[Optional[Request]] = [None] * max_batch
        self.inflight: Dict[int, Dict[str, Any]] = {}  # slot -> prefill state
        self.queue: deque[Request] = deque()
        self.finished: List[Request] = []
        self._init_sampling(max_batch, cfg.vocab_size, seed)

    # -------------------------------------------------------- scheduling
    def add_request(self, req_id: Any, prompt, max_new_tokens: int = 128,
                    temperature: float = 0.0, top_k: Optional[int] = None,
                    top_p: Optional[float] = None,
                    repetition_penalty: float = 1.0,
                    stop: Optional[List[List[int]]] = None,
                    prompt_embeds=None):
        prompt = np.asarray(prompt).reshape(-1)
        if len(prompt) >= self.max_seq:
            raise ValueError("prompt longer than max_seq_len")
        if prompt_embeds is not None:
            prompt_embeds = jnp.asarray(prompt_embeds)
            if prompt_embeds.ndim == 3:  # [1, S, H] -> [S, H]
                prompt_embeds = prompt_embeds[0]
            if prompt_embeds.shape[0] != len(prompt):
                raise ValueError("prompt_embeds length != prompt length")
        self.queue.append(Request(req_id, prompt, max_new_tokens,
                                  temperature, top_k, top_p,
                                  repetition_penalty, stop, prompt_embeds))

    def _free_slot(self, slot: int) -> None:
        self.pos[slot] = 0
        self._clear_sampling(slot)

    @property
    def has_work(self) -> bool:
        return (bool(self.queue) or bool(self.inflight)
                or any(s is not None for s in self.slots))

    def _admit(self):
        for slot in range(self.max_batch):
            if (self.slots[slot] is not None or slot in self.inflight
                    or not self.queue):
                continue
            req = self.queue.popleft()
            if self.chunk is None or req.prompt_embeds is not None:
                # multimodal (embed) prompts always prefill whole — a
                # chunked embed slice would recompute nothing anyway
                row = gen.init_kv_cache(self.cfg, 1, self.max_seq, self.dtype,
                                        kv_quant=self.kv_quant)
                embeds = (None if req.prompt_embeds is None
                          else req.prompt_embeds[None])
                logits, row = gen.prefill(
                    self.cfg, self.params, jnp.asarray(req.prompt[None]), row,
                    self.method, self.dtype, embeds=embeds)
                self._activate(slot, req, row, logits)
            else:  # reserve the slot; chunks advance one per engine step
                self.inflight[slot] = {
                    "req": req,
                    "row": gen.init_kv_cache(self.cfg, 1, self.max_seq,
                                             self.dtype,
                                             kv_quant=self.kv_quant),
                    "done": 0,
                }

    def _activate(self, slot: int, req: Request, row, logits):
        self.caches = _install_slot(self.caches, row, slot)
        self._set_sampling(slot, req)
        tok = self._sample_slot(slot, logits[:1])
        self._note_token(slot, tok)
        self._record_logprobs_slot(slot, req, logits[:1], tok)
        req.output.append(tok)
        self.slots[slot] = req
        self.pos[slot] = len(req.prompt)
        self.last_token[slot] = tok
        self._retire_if_done(slot)

    def _advance_prefill(self):
        """One chunk for every in-flight admission (padded to chunk size so
        jit sees one shape; padded tail rows are dead — see prefill_chunk)."""
        for slot, st in list(self.inflight.items()):
            tail = advance_one_chunk(self.cfg, self.params, st, self.chunk,
                                     self.method, self.dtype)
            if tail is not None:
                del self.inflight[slot]
                self._activate(slot, st["req"], st["row"], tail)

    def _retire_if_done(self, slot: int):
        req = self.slots[slot]
        if req is None:
            return
        # stop FIRST: a match completing exactly at the budget/EOS
        # boundary must still trim (the other conditions would
        # short-circuit past it and deliver the stop tokens)
        if (req.stop and req.hit_stop()) \
                or (req.output and req.output[-1] == self.eos) \
                or len(req.output) >= req.max_new_tokens \
                or self.pos[slot] + 1 >= self.max_seq:
            req.done = True
            self.finished.append(req)
            self.slots[slot] = None
            self._free_slot(slot)

    # ------------------------------------------------------------- steps
    def step(self) -> List[Tuple[Any, int]]:
        """Admit waiting requests, advance in-flight chunked prefills by one
        chunk, then decode one token for every active slot. Returns the
        (request_id, token) pairs emitted this step."""
        self._admit()
        if self.inflight:
            self._advance_prefill()
        active = [i for i, s in enumerate(self.slots) if s is not None]
        if not active:
            return []
        logits, self.caches = batched_decode_step(
            self.cfg, self.params, jnp.asarray(self.last_token[:, None]),
            self.caches, jnp.asarray(self.pos), self.method, self.dtype)
        toks = self._sample_pool(logits)
        self._note_tokens_all(toks)
        self._record_logprobs(logits, toks, active)
        emitted = []
        for slot in active:
            tok = int(toks[slot])
            req = self.slots[slot]
            req.output.append(tok)
            self.pos[slot] += 1
            self.last_token[slot] = tok
            self._retire_if_done(slot)
            if not req._stopped:
                # a stop match always ends at the current token — its
                # pair must not be emitted (it was trimmed from output)
                emitted.append((req.id, tok))
        return emitted

    def step_burst(self, n: int) -> List[Tuple[Any, int]]:
        """``n`` decode steps for the whole pool in ONE device dispatch
        (batched_decode_burst) — amortizes the per-step dispatch cost
        that dominates engine throughput (measured r4b: per-token
        dispatch held the bs8 slot pool at ~284 tok/s while the same
        math scan-compiled runs 4x that). Emission, EOS/stop/budget
        retirement and logprobs replay host-side token-by-token, so
        streams are IDENTICAL to ``n`` single steps — slots that retire
        mid-burst just waste their remaining burst rows (masked-out
        garbage; top_logprobs alternatives come back as a [B, n, N]
        top-k the scan computes in place). Falls back to step() while
        admissions are pending."""
        self._admit()
        if self.inflight or n <= 1 or getattr(
                self, "dcaches", None) is not None:
            # chunked admissions interleave with decode; the speculative
            # subclass has its own multi-token rounds (a plain burst
            # would desync its draft caches)
            return self.step()
        active = [i for i, s in enumerate(self.slots) if s is not None]
        if not active:
            return []
        # cache-capacity clamp: no ACTIVE slot's writes may run past its
        # buffer (dynamic_update_slice would clamp and corrupt row T-1)
        n = min(n, min(self.max_seq - 1 - int(self.pos[s])
                       for s in active))
        if n <= 1:
            return self.step()
        tracking = self._tracking()
        sampling = bool(np.any(self.temp > 0.0))
        want_lp = bool(getattr(self, "return_logprobs", False))
        b = self.max_batch
        pres = (self._pres_dev if tracking
                else jnp.zeros((b, 1), jnp.bool_))
        n_top = int(getattr(self, "top_logprobs", 0) or 0)
        toks, lps, tops, self.caches, pres = batched_decode_burst(
            self.cfg, self.params, self.caches,
            jnp.asarray(self.last_token), jnp.asarray(self.pos),
            self._key, pres, jnp.int32(self._steps),
            jnp.asarray(self.temp), jnp.asarray(self.topk),
            jnp.asarray(self.topp), jnp.asarray(self.penalty),
            n=n, method=self.method, dtype=self.dtype,
            tracking=tracking, sampling=sampling, want_lp=want_lp,
            want_top=n_top)
        self._steps += n
        if tracking:
            self._pres_dev = pres
        toks = np.asarray(toks)
        lps = np.asarray(lps) if want_lp else None
        if n_top:
            top_vals, top_ids = (np.asarray(tops[0]), np.asarray(tops[1]))
        emitted = []
        for i in range(n):
            for slot in active:
                req = self.slots[slot]
                if req is None:
                    continue  # retired earlier in this burst
                tok = int(toks[slot, i])
                req.output.append(tok)
                if want_lp:
                    req.logprobs.append(float(lps[slot, i]))
                if n_top:
                    req.top_logprobs.append(
                        {int(t): float(v) for t, v in
                         zip(top_ids[slot, i], top_vals[slot, i])})
                self.pos[slot] += 1
                self.last_token[slot] = tok
                self._retire_if_done(slot)
                if not req._stopped:
                    emitted.append((req.id, tok))
        return emitted

    def run(self, burst: int = 1) -> Dict[Any, List[int]]:
        """Drain all queued/active requests; returns id -> generated
        tokens. ``burst`` > 1 decodes that many tokens per dispatch once
        admissions settle (see step_burst) — same streams, far fewer
        device round-trips."""
        while self.has_work:
            if burst > 1:
                self.step_burst(burst)
            else:
                self.step()
        return {r.id: r.output for r in self.finished}
