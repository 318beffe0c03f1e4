"""Paged KV-cache serving (vLLM-style block tables) on TPU.

Memory upgrade over serve/batching.py's fixed [B, H, max_seq, D] slot pool
— and far beyond the reference, whose caches are contiguous per-batch
preallocations sized by a window env var (awq/modules/fused/cache.py,
awq/utils/fused_utils.py:110-139): KV lives in a shared pool of
fixed-size pages [nkv, total_pages, page_size, hd]; each request owns just
``ceil(budget / page_size)`` pages, so many short requests and one long
one coexist without reserving ``max_batch * max_seq`` everywhere.

Scheduling mirrors BatchingEngine (FIFO admission, per-slot retirement,
ONE compiled decode step for the pool). Specifics:

* Page 0 is the TRASH page: inactive slots' table rows point at it, so the
  pool decode step (which always writes every slot's K/V somewhere) can
  never corrupt a live request's pages.
* A request reserves its whole budget (prompt + max_new_tokens) at
  admission — no mid-flight page faults or preemption. Lazy growth would
  admit more aggressively; reservation keeps the engine allocation-free
  per step and is the right first discipline on TPU where step latency is
  king.
* Attention runs the stock Pallas paged-attention kernel on TPU (only the
  table's pages stream from HBM) and a gather + grouped-GQA fallback in
  tests (nn/modules._paged_decode).
* PREFIX CACHING (default on): full prompt pages are hash-chained
  (h_i = hash(h_{i-1}, page tokens)) and registered at admission; a
  repeated prefix reuses the cached pages' KV — gather + suffix-only
  prefill instead of recomputing the prefix forward. Pages are
  refcounted (mid-flight sharing with an active owner is safe: shared
  pages are read-only; decode writes land past the prompt) and
  retired-but-cached pages evict LRU under admission pressure.

* int8 KV pages (``kv_quant=True``): pages store int8 K/V with
  per-(head, token) absmax scales — half the pool bytes and half the
  page-read traffic; dequant folds into the attention score/prob
  matrices, composing with prefix caching and chunked prefill. On TPU
  int8 pools run the bespoke block-table Pallas kernel
  (ops/paged_attn.py; the stock kernel is bf16-only).

* MLA (DeepSeek) models page the LATENT cache: one [dc|dr] row per
  token shared by all heads (`c_pages [1, P, ps, dcr]`), decoded with
  the absorbed formulation against the gathered latent slab
  (modules.mla_attention paged branch) — paged serving at ~nh*(dk+dv)/
  dcr times less pool memory than materialized per-head K/V pages.
  ``kv_quant=True`` stores the latent rows int8 (quantized on install /
  at the decode write; scales fold into the absorbed einsums).

* Sliding-window models (mistral family) page normally: the window mask
  lives in the bespoke kernel / gather path, and pages that fall wholly
  behind the window are recycled MID-FLIGHT back to the pool
  (``_recycle_window_pages``) — a long window-model generation holds
  O(window) pages, not O(history).
* ALiBi models (bloom/mpt/baichuan-13b) page normally too: the bespoke
  kernel takes a per-head slope sheet and adds slope x (key - query)
  in-block (composes with int8 pages — scale fold + slope in one
  kernel). int8 MLA pools quantize the latent rows with separate
  compressed-kv/rope scales, folded into the absorbed decode; every
  engine family/quant combination now pages.
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
from autoawq_tpu.serve.batching import (Request, SamplingSlots,
                                         _penalize_batched, _presence_note,
                                         _token_logprobs, _top_n_logprobs,
                                         advance_one_chunk, prefill_chunk,
                                         sample_batched)


@functools.partial(jax.jit, static_argnames=("cfg", "method", "dtype"),
                   donate_argnums=(3,))
def paged_decode_step(
    cfg: ModelConfig,
    params: Dict[str, Any],
    tokens: jax.Array,           # [B, 1]
    page_caches: List[Dict[str, jax.Array]],
    table: jax.Array,            # [B, PPS] int32
    pos: jax.Array,              # [B] int32
    method: str = "auto",
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, List[Dict[str, jax.Array]]]:
    """One decode token for every slot against the page pool."""
    ps = next(iter(page_caches[0].values())).shape[2]
    cap = table.shape[1] * ps
    positions = pos[:, None]
    x = modules.embed(cfg, params, tokens, dtype, positions)
    cos, sin = modules.rope_tables(cfg, positions, seq_len=cap)
    new_caches = []
    for lp, pc in zip(params["layers"], page_caches):
        kv = {**pc, "page_table": table, "pos": pos}
        x, kv = modules.block(cfg, lp, x, cos, sin, None, kv_cache=kv,
                              method=method)
        new_caches.append({key: kv[key] for key in pc})
    logits = modules.logits_fn(cfg, params, x, method)
    return logits[:, 0, :], new_caches


@functools.partial(jax.jit, static_argnames=(
    "cfg", "n", "method", "dtype", "tracking", "sampling", "want_lp",
    "want_top"),
    donate_argnums=(2, 7))
def paged_decode_burst(
    cfg: ModelConfig,
    params: Dict[str, Any],
    page_caches: List[Dict[str, jax.Array]],
    tokens: jax.Array,   # [B] last token per slot
    table: jax.Array,    # [B, PPS] int32 (fixed: pages reserve at admit)
    pos: jax.Array,      # [B] int32
    key: jax.Array,
    pres: jax.Array,
    steps0: jax.Array,
    temp: jax.Array, topk: jax.Array, topp: jax.Array,
    penalty: jax.Array,
    *, n: int, method: str = "auto", dtype=jnp.bfloat16,
    tracking: bool = False, sampling: bool = False, want_lp: bool = False,
    want_top: int = 0,
):
    """``n`` paged pool steps in ONE dispatch — the page-pool twin of
    batching.batched_decode_burst (same key schedule / penalty presence
    / warpers, so streams bit-match single steps). The page table is
    loop-invariant: every slot's pages are RESERVED at admission, so a
    burst never needs an allocation; sliding-window page recycling and
    retirements replay host-side afterwards."""

    def body(carry, i):
        tok, p, caches, pres = carry
        logits, caches = paged_decode_step(
            cfg, params, tok[:, None], caches, table, p, method, dtype)
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
        body, (tokens, pos, page_caches, pres), jnp.arange(n))
    top_out = ((tops[0].transpose(1, 0, 2), tops[1].transpose(1, 0, 2))
               if want_top else None)
    return (toks.T, (lps.T if want_lp else None), top_out, caches, pres)


# pool key <-> contiguous-row key pairs; the scale entries exist only in
# int8 pools (kv_quant=True) / int8 rows (init_kv_cache kv_quant=True);
# c_pages is the MLA latent pool (one [dc|dr] row per token, all heads)
_PAGE_KEYS = (("k_pages", "k"), ("v_pages", "v"),
              ("k_page_s", "k_s"), ("v_page_s", "v_s"),
              ("c_pages", "c"))


@functools.partial(jax.jit, static_argnames=("n_pages", "start_page",
                                             "mla_dc"),
                   donate_argnums=(0,))
def _install_pages(page_caches, row_caches, page_ids: jax.Array,
                   n_pages: int, start_page: int = 0, mla_dc: int = 0):
    """Copy row positions [start_page*ps, (start_page+n_pages)*ps) of a
    contiguous single-request prefill cache into pool pages ``page_ids``
    (K/V plus, for int8 pools, their per-token scales). int8 MLA pools
    quantize the fp latent rows on install (``mla_dc`` = kv_lora_rank —
    the compressed-kv | rope split, scaled separately)."""
    out = []
    for pc, row in zip(page_caches, row_caches):
        ps = next(iter(pc.values())).shape[2]
        lo, hi = start_page * ps, (start_page + n_pages) * ps
        new = {}
        for pk, rk in _PAGE_KEYS:
            if pk not in pc:
                continue
            if pk == "c_pages" and "c_page_s" in pc:
                src = row["c"][0, :, lo:hi]  # [1, n*ps, dcr] fp
                c8, sc = modules._kv_quantize(src[..., :mla_dc])
                p8, sp = modules._kv_quantize(src[..., mla_dc:])
                q = jnp.concatenate([c8, p8], -1) \
                    .reshape(1, n_pages, ps, -1)
                s2 = jnp.stack([sc, sp], -1).reshape(1, n_pages, ps, 2)
                new["c_pages"] = pc["c_pages"].at[:, page_ids].set(q)
                new["c_page_s"] = pc["c_page_s"].at[:, page_ids].set(s2)
                continue
            dst = pc[pk]
            src = row[rk][0, :, lo:hi]  # [nkv, n*ps(, hd)]
            src = src.reshape(dst.shape[0], n_pages, ps, *src.shape[2:])
            new[pk] = dst.at[:, page_ids].set(src.astype(dst.dtype))
        out.append(new)
    return out


@functools.partial(jax.jit, static_argnames=("n_pages", "mla_dc"),
                   donate_argnums=(1,))
def _gather_pages(page_caches, row_caches, page_ids: jax.Array,
                  n_pages: int, mla_dc: int = 0):
    """Inverse of _install_pages: read pool pages into row positions
    [0, n_pages*ps) — the prefix-cache hit path (reuse KV, skip the
    prefix forward). int8 MLA pools dequantize into the fp rows."""
    out = []
    for pc, row in zip(page_caches, row_caches):
        ps = next(iter(pc.values())).shape[2]
        new = {}
        for pk, rk in _PAGE_KEYS:
            if pk not in pc:
                continue
            if pk == "c_pages" and "c_page_s" in pc:
                q = pc["c_pages"][:, page_ids].reshape(
                    1, n_pages * ps, -1).astype(jnp.float32)
                s2 = pc["c_page_s"][:, page_ids].reshape(
                    1, n_pages * ps, 2)
                fp = jnp.concatenate(
                    [q[..., :mla_dc] * s2[..., :1],
                     q[..., mla_dc:] * s2[..., 1:]], -1)
                new["c"] = row["c"].at[0, :, : n_pages * ps].set(
                    fp.astype(row["c"].dtype))
                continue
            g = pc[pk][:, page_ids]  # [nkv, n, ps(, hd)]
            g = g.reshape(g.shape[0], n_pages * ps, *g.shape[3:])
            new[rk] = row[rk].at[0, :, : n_pages * ps].set(
                g.astype(row[rk].dtype))
        out.append(new)
    return out


class PagedBatchingEngine(SamplingSlots):
    """FIFO continuous batching over a shared KV page pool."""

    def __init__(self, cfg: ModelConfig, params: Dict[str, Any],
                 max_batch: int = 8, page_size: int = 64,
                 total_pages: int = 512, pages_per_seq: int = 32,
                 eos_token_id: Optional[int] = None, method: str = "auto",
                 dtype=jnp.bfloat16, seed: int = 0,
                 prefix_cache: bool = True,
                 prefill_chunk_size: Optional[int] = None,
                 return_logprobs: bool = False, top_logprobs: int = 0,
                 kv_quant: bool = False):
        if prefill_chunk_size is not None \
                and prefill_chunk_size % page_size:
            # chunk boundaries must land on page boundaries so the scratch
            # row (a page multiple) can never clamp a chunk write
            raise ValueError(
                f"prefill_chunk_size ({prefill_chunk_size}) must be a "
                f"multiple of page_size ({page_size})")
        self.cfg, self.params = cfg, params
        self.max_batch, self.ps = max_batch, page_size
        self.pps = pages_per_seq
        # int8 MLA pools quantize/dequantize at the pool boundary; the
        # compressed-kv | rope split point rides every install/gather
        self._mla_dc = cfg.kv_lora_rank if (cfg.is_mla and kv_quant) else 0
        self.eos, self.method, self.dtype = eos_token_id, method, dtype
        gen._check_rope_capacity(cfg, pages_per_seq * page_size)
        nkv = cfg.num_key_value_heads
        hd = cfg.head_dim_
        self.kv_quant = kv_quant
        if cfg.is_mla:
            # latent page pool: ONE [compressed-kv | rope-head] row per
            # token shared by every head (same layout as the contiguous
            # latent cache, serve/generate.init_kv_cache) — each page is
            # dcr bytes/token instead of nh*(dk+dv). kv_quant stores the
            # row int8 with SEPARATE absmax scales for the compressed-kv
            # and rope parts (their magnitudes differ; one shared scale
            # would crush the smaller part's precision).
            dcr = cfg.kv_lora_rank + cfg.qk_rope_head_dim
            cdt = jnp.int8 if kv_quant else dtype
            self.pages = [
                {"c_pages": jnp.zeros((1, total_pages, page_size, dcr),
                                      cdt)}
                for _ in range(cfg.num_hidden_layers)
            ]
            if kv_quant:
                for pc in self.pages:
                    pc["c_page_s"] = jnp.zeros(
                        (1, total_pages, page_size, 2), jnp.float32)
        elif kv_quant:
            # int8 pool + per-(head, page, line) absmax scales: half the
            # page bytes; on-read dequant folds into the attention scores
            # (modules._paged_decode -> ops/paged_attn.py on TPU).
            self.pages = [
                {"k_pages": jnp.zeros((nkv, total_pages, page_size, hd),
                                      jnp.int8),
                 "v_pages": jnp.zeros((nkv, total_pages, page_size, hd),
                                      jnp.int8),
                 "k_page_s": jnp.zeros((nkv, total_pages, page_size),
                                       jnp.float32),
                 "v_page_s": jnp.zeros((nkv, total_pages, page_size),
                                       jnp.float32)}
                for _ in range(cfg.num_hidden_layers)
            ]
        else:
            self.pages = [
                {"k_pages": jnp.zeros((nkv, total_pages, page_size, hd),
                                      dtype),
                 "v_pages": jnp.zeros((nkv, total_pages, page_size, hd),
                                      dtype)}
                for _ in range(cfg.num_hidden_layers)
            ]
        self.free: List[int] = list(range(total_pages - 1, 0, -1))  # 0=trash
        self.table = np.zeros((max_batch, pages_per_seq), np.int32)
        self.owned: List[List[int]] = [[] for _ in range(max_batch)]
        # leading pages already recycled behind a sliding window
        self.win_dropped = np.zeros((max_batch,), np.int64)
        self.pos = np.zeros((max_batch,), np.int32)
        self.last_token = np.zeros((max_batch,), np.int32)
        self.slots: List[Optional[Request]] = [None] * max_batch
        self.queue: deque[Request] = deque()
        self.finished: List[Request] = []
        self.chunk = prefill_chunk_size
        self.inflight: Dict[int, Dict[str, Any]] = {}  # slot -> prefill st
        self.return_logprobs = return_logprobs or top_logprobs > 0
        self.top_logprobs = top_logprobs
        self._init_sampling(max_batch, cfg.vocab_size, seed)
        # ---- prefix cache (vLLM-style hash-chained full prompt pages).
        # chain hash h_i = hash(h_{i-1}, tokens of page i) -> page id; a
        # hit reuses the page's KV (gather + suffix-only prefill) instead
        # of recomputing the prefix forward. Pages are refcounted: active
        # users pin them; retired-but-cached pages stay resident until
        # admission pressure evicts them LRU.
        self.prefix_enabled = prefix_cache
        self.page_ref = np.zeros((total_pages,), np.int64)
        self.prefix_cache: Dict[int, int] = {}   # chain hash -> page id
        self.page_chain: Dict[int, int] = {}     # page id -> chain hash
        self.chain_next: Dict[int, set] = {}     # chain hash -> child hashes
        self.prefix_hits = 0
        self.prefix_pages_reused = 0

    # -------------------------------------------------------- scheduling
    def add_request(self, req_id: Any, prompt, max_new_tokens: int = 128,
                    temperature: float = 0.0, top_k: Optional[int] = None,
                    top_p: Optional[float] = None,
                    repetition_penalty: float = 1.0,
                    stop: Optional[List[List[int]]] = None,
                    prompt_embeds=None):
        prompt = np.asarray(prompt).reshape(-1)
        if prompt_embeds is not None:
            # multimodal prompt: precomputed [S, H] input embeds (vision
            # features spliced at image-token positions). Prefix caching
            # stays sound because the chain hash then covers the embed
            # CONTENT per page, not just the (placeholder) token ids —
            # see _page_chain_hashes.
            prompt_embeds = np.asarray(prompt_embeds)
            if prompt_embeds.ndim == 3:  # [1, S, H] -> [S, H]
                prompt_embeds = prompt_embeds[0]
            if prompt_embeds.shape[0] != len(prompt):
                raise ValueError("prompt_embeds length != prompt length")
        budget = len(prompt) + max_new_tokens + 1
        if budget > self.pps * self.ps:
            raise ValueError(
                f"prompt+budget {budget} exceeds pages_per_seq*page_size "
                f"({self.pps * self.ps})")
        self.queue.append(Request(req_id, prompt, max_new_tokens,
                                  temperature, top_k, top_p,
                                  repetition_penalty, stop, prompt_embeds))

    # ------------------------------------------------------ prefix cache
    @staticmethod
    def _page_chain_hashes(prompt: np.ndarray, ps: int, max_pages: int,
                           embeds: Optional[np.ndarray] = None) -> List[int]:
        """Chain hashes for the first ``max_pages`` full pages. Multimodal
        prompts additionally hash each page's EMBED rows (content digest):
        token ids alone don't identify an image — every llava prompt
        carries the same <image> placeholder run — so embed-carrying
        requests only share prefix pages with requests presenting
        bit-identical embeds for that span (the repeated-image /
        repeated-system-prompt case), and never cross-match a text-only
        prompt with coincidentally equal ids."""
        import hashlib

        out, h = [], 0
        for i in range(max_pages):
            key: Any = tuple(int(t) for t in prompt[i * ps:(i + 1) * ps])
            if embeds is not None:
                d = hashlib.sha1(np.ascontiguousarray(
                    embeds[i * ps:(i + 1) * ps]).tobytes()).digest()
                key = (key, d)
            h = hash((h, key))
            out.append(h)
        return out

    def _drop_chain_entry(self, h: int) -> None:
        """Remove a cached chain entry AND its descendants (a lookup walks
        hashes from the chain root, so children of an evicted entry are
        unreachable — leaving them cached would hold pool pages hostage).
        Pages free immediately at refcount 0; pinned pages free at their
        owner's retirement (their cache entry is gone, so no new sharer
        can pin them again)."""
        pid = self.prefix_cache.pop(h, None)
        for child in self.chain_next.pop(h, ()):
            self._drop_chain_entry(child)
        if pid is not None:
            del self.page_chain[pid]
            if self.page_ref[pid] == 0:
                self.free.append(pid)

    def _evict_until(self, need: int) -> bool:
        """Make ``need`` pages free by evicting unreferenced cached pages
        (LRU = insertion order). TWO-PHASE: nothing is evicted unless the
        need can actually be met — a failed admission must not destroy
        cached prefixes (the head request retries next step and would
        otherwise have lost its own matched pages). Callers must pin
        (refcount) any pages they matched BEFORE calling, so eviction can
        never free a page that is about to be used as shared."""
        if len(self.free) >= need:
            return True
        evictable = sum(
            1 for pid in self.page_chain if self.page_ref[pid] == 0)
        if len(self.free) + evictable < need:
            return False
        for h in list(self.prefix_cache):
            if len(self.free) >= need:
                break
            pid = self.prefix_cache.get(h)
            if pid is not None and self.page_ref[pid] == 0:
                self._drop_chain_entry(h)
        return len(self.free) >= need

    @property
    def has_work(self) -> bool:
        return (bool(self.queue) or bool(self.inflight)
                or any(s is not None for s in self.slots))

    def _admit(self):
        for slot in range(self.max_batch):
            if (self.slots[slot] is not None or slot in self.inflight
                    or not self.queue):
                continue
            req = self.queue[0]
            budget = len(req.prompt) + req.max_new_tokens + 1
            need = -(-budget // self.ps)

            # prefix-cache lookup: longest chain of cached full prompt
            # pages, capped so >= 1 prompt token is always left to prefill
            # (its logits seed generation) and the last prompt token never
            # sits in a shared (read-only) page.
            shared: List[int] = []
            chain: List[int] = []
            if self.prefix_enabled:
                max_sharable = (len(req.prompt) - 1) // self.ps
                chain = self._page_chain_hashes(req.prompt, self.ps,
                                                max_sharable,
                                                embeds=req.prompt_embeds)
                for h in chain:
                    pid = self.prefix_cache.get(h)
                    if pid is None:
                        break
                    # refresh recency: eviction walks insertion order, so
                    # a hit re-inserts at the end (true LRU, not FIFO)
                    self.prefix_cache[h] = self.prefix_cache.pop(h)
                    shared.append(pid)
            n_shared = len(shared)
            # pin the matched pages FIRST: eviction must never free a page
            # about to be used as shared (same-page double-allocation
            # corrupts the prefix KV and poisons the cache)
            for pid in shared:
                self.page_ref[pid] += 1
            if not self._evict_until(need - n_shared):
                for pid in shared:  # unpin; head retries next step
                    self.page_ref[pid] -= 1
                return  # FIFO: wait for pages rather than starve the head
            self.queue.popleft()
            fresh = [self.free.pop() for _ in range(need - n_shared)]
            pages = shared + fresh
            for pid in fresh:
                self.page_ref[pid] += 1
            self.owned[slot] = pages
            # the table stays at the trash page until the slot ACTIVATES
            # (_finish_admission): the pool decode step writes every
            # slot's K/V at table[slot, pos//ps] each step, and an
            # inflight slot (pos=0) would trash offset 0 of pages[0] —
            # which can be a SHARED prefix page other live requests read
            self.table[slot] = 0

            if n_shared:
                self.prefix_hits += 1
                self.prefix_pages_reused += n_shared

            if self.chunk is not None and req.prompt_embeds is None:
                # chunked admission: reserve now, advance one chunk per
                # engine step so running requests never stall behind a
                # long arrival (same discipline as serve/batching.py).
                # Embed prompts prefill whole below (same policy as the
                # contiguous engine).
                # Chunking starts at the shared-prefix boundary
                # (n_shared*ps — a page multiple but NOT necessarily a
                # chunk multiple), so round the row capacity up from the
                # LAST chunk's end or the final padded write would clamp
                # and overwrite valid KV.
                lo0 = n_shared * self.ps
                suffix_len = len(req.prompt) - lo0
                t_row = lo0 + max(
                    -(-suffix_len // self.chunk) * self.chunk, self.ps)
                row = gen.init_kv_cache(
                    self.cfg, 1, t_row, self.dtype,
                    # MLA prefill rows stay FP: _install_pages quantizes
                    # latent rows into int8 pages (and _gather_pages
                    # dequantizes back) — an int8 row here would be
                    # double-quantized on install
                    kv_quant=self.kv_quant and not self.cfg.is_mla)
                if n_shared:
                    row = _gather_pages(self.pages, row,
                                        jnp.asarray(shared), n_shared,
                                        mla_dc=self._mla_dc)
                self.inflight[slot] = {
                    "req": req, "row": row, "done": n_shared * self.ps,
                    "pages": pages, "chain": chain, "n_shared": n_shared,
                }
                continue

            # whole-prompt admission: prefill the non-shared suffix
            # against a contiguous row whose prefix KV is gathered from
            # the shared pages
            n_prompt_pages = -(-len(req.prompt) // self.ps)
            t_row = n_prompt_pages * self.ps
            row = gen.init_kv_cache(
                self.cfg, 1, t_row, self.dtype,
                kv_quant=self.kv_quant and not self.cfg.is_mla)
            if n_shared:
                row = _gather_pages(self.pages, row, jnp.asarray(shared),
                                    n_shared, mla_dc=self._mla_dc)
                suffix = req.prompt[n_shared * self.ps:]
                real = len(suffix)
                # pad to a page multiple so jit sees one shape per suffix
                # page count (padded tail rows are dead: decode overwrites
                # them before they are ever unmasked — see prefill_chunk)
                pad_to = -(-real // self.ps) * self.ps
                if pad_to > real:
                    suffix = np.pad(suffix, (0, pad_to - real))
                emb = None
                if req.prompt_embeds is not None:
                    e = req.prompt_embeds[n_shared * self.ps:]
                    if pad_to > real:  # padded rows are dead (see above)
                        e = np.pad(e, ((0, pad_to - real), (0, 0)))
                    emb = jnp.asarray(e[None])
                logits, row = prefill_chunk(
                    self.cfg, self.params, jnp.asarray(suffix[None]), row,
                    jnp.int32(n_shared * self.ps), self.method, self.dtype,
                    embeds=emb)
                logits = logits[:, real - 1]
            else:
                logits, row = gen.prefill(
                    self.cfg, self.params, jnp.asarray(req.prompt[None]),
                    row, self.method, self.dtype,
                    embeds=(None if req.prompt_embeds is None
                            else jnp.asarray(req.prompt_embeds[None])))
            self._finish_admission(slot, req, row, logits, pages, chain,
                                   n_shared)

    def _advance_prefill(self):
        """One chunk for every in-flight admission (padded to chunk size
        so jit sees one shape; padded tail rows are dead)."""
        for slot, st in list(self.inflight.items()):
            tail = advance_one_chunk(self.cfg, self.params, st, self.chunk,
                                     self.method, self.dtype)
            if tail is not None:
                del self.inflight[slot]
                self._finish_admission(
                    slot, st["req"], st["row"], tail, st["pages"],
                    st["chain"], st["n_shared"])

    def _finish_admission(self, slot: int, req: Request, row, logits,
                          pages: List[int], chain: List[int],
                          n_shared: int):
        """Scatter the freshly prefilled prompt pages into the pool,
        register the prefix chain, and activate the slot (the page table
        only points at real pages from here — see _admit)."""
        self.table[slot] = 0
        self.table[slot, : len(pages)] = pages
        n_prompt_pages = -(-len(req.prompt) // self.ps)
        if n_prompt_pages > n_shared:
            self.pages = _install_pages(
                self.pages, row,
                jnp.asarray(pages[n_shared:n_prompt_pages]),
                n_prompt_pages - n_shared, start_page=n_shared,
                mla_dc=self._mla_dc)
        # register this prompt's full pages for future admissions,
        # recording parent->child chain links so eviction can drop
        # unreachable descendants
        if self.prefix_enabled:
            prev_h = None
            for h, pid in zip(chain, pages):
                if h not in self.prefix_cache \
                        and pid not in self.page_chain:
                    self.prefix_cache[h] = pid
                    self.page_chain[pid] = h
                if prev_h is not None:
                    self.chain_next.setdefault(prev_h, set()).add(h)
                prev_h = h

        self._set_sampling(slot, req)
        tok = self._sample_slot(slot, logits[:1])
        self._note_token(slot, tok)
        self._record_logprobs_slot(slot, req, logits[:1], tok)
        req.output.append(tok)
        self.slots[slot] = req
        self.pos[slot] = len(req.prompt)
        self.last_token[slot] = tok
        self._retire_if_done(slot)

    def _release_pages(self, pages: List[int]) -> None:
        """Drop one reference per page; uncached pages at refcount 0
        return to the free pool (cached ones stay resident for future
        prefix hits until eviction)."""
        for pid in reversed(pages):
            self.page_ref[pid] -= 1
            if self.page_ref[pid] == 0 and pid not in self.page_chain:
                self.free.append(pid)

    def _recycle_window_pages(self, slot: int) -> None:
        """Sliding-window models: pages wholly behind the attention
        window are unreadable forever (the window mask excludes them and
        decode writes only advance) — return them to the pool mid-flight
        so long generations don't hold their whole history hostage.
        Shared prefix pages just drop this slot's reference (the cached
        KV stays valid for future prefix hits)."""
        win = self.cfg.sliding_window
        first_needed = max(0, int(self.pos[slot]) - win) // self.ps
        dropped = self.win_dropped[slot]
        if first_needed <= dropped:
            return
        self._release_pages(self.owned[slot][dropped:first_needed])
        self.table[slot, dropped:first_needed] = 0  # never read again
        self.win_dropped[slot] = first_needed

    def _free_slot(self, slot: int) -> None:
        self._release_pages(self.owned[slot][self.win_dropped[slot]:])
        self.owned[slot] = []
        self.win_dropped[slot] = 0
        self.table[slot] = 0  # trash page: decode writes go nowhere
        self.pos[slot] = 0
        self._clear_sampling(slot)

    def stats(self) -> Dict[str, Any]:
        out = super().stats()
        out.update(
            free_pages=len(self.free),
            cached_pages=len(self.page_chain),
            prefix_hits=self.prefix_hits,
            prefix_pages_reused=self.prefix_pages_reused,
        )
        return out

    def _retire_if_done(self, slot: int):
        req = self.slots[slot]
        if req is None:
            return
        # stop first — see batching._retire_if_done
        if (req.stop and req.hit_stop()) \
                or (req.output and req.output[-1] == self.eos) \
                or len(req.output) >= req.max_new_tokens:
            req.done = True
            self.finished.append(req)
            self.slots[slot] = None
            self._free_slot(slot)

    # ------------------------------------------------------------- steps
    def step(self) -> List[Tuple[Any, int]]:
        """Admit, advance in-flight chunked prefills, then one decode
        token for every active slot."""
        self._admit()
        if self.inflight:
            self._advance_prefill()
        active = [i for i, s in enumerate(self.slots) if s is not None]
        if not active:
            return []
        logits, self.pages = paged_decode_step(
            self.cfg, self.params, jnp.asarray(self.last_token[:, None]),
            self.pages, jnp.asarray(self.table), jnp.asarray(self.pos),
            self.method, self.dtype)
        toks = self._sample_pool(logits)
        self._note_tokens_all(toks)
        self._record_logprobs(logits, toks, active)
        emitted = []
        for slot in active:
            tok = int(toks[slot])
            req = self.slots[slot]
            req.output.append(tok)
            self.pos[slot] += 1
            if self.cfg.sliding_window and self.slots[slot] is not None:
                self._recycle_window_pages(slot)
            self.last_token[slot] = tok
            self._retire_if_done(slot)
            if not req._stopped:  # see batching.step
                emitted.append((req.id, tok))
        return emitted

    def step_burst(self, n: int) -> List[Tuple[Any, int]]:
        """``n`` paged decode steps in ONE dispatch (paged_decode_burst).
        Identical streams to ``n`` single steps — see
        batching.BatchingEngine.step_burst for the replay contract.
        Page tables are admission-reserved so no allocation can be
        needed mid-burst; window recycling runs once afterwards."""
        self._admit()
        if self.inflight or n <= 1:
            return self.step()
        active = [i for i, s in enumerate(self.slots) if s is not None]
        if not active:
            return []
        cap = self.pps * self.ps
        n = min(n, min(cap - 1 - int(self.pos[s]) for s in active))
        if n <= 1:
            return self.step()
        tracking = self._tracking()
        sampling = bool(np.any(self.temp > 0.0))
        want_lp = bool(getattr(self, "return_logprobs", False))
        pres = (self._pres_dev if tracking
                else jnp.zeros((self.max_batch, 1), jnp.bool_))
        n_top = int(getattr(self, "top_logprobs", 0) or 0)
        toks, lps, tops, self.pages, pres = paged_decode_burst(
            self.cfg, self.params, self.pages,
            jnp.asarray(self.last_token), jnp.asarray(self.table),
            jnp.asarray(self.pos), self._key, pres,
            jnp.int32(self._steps), jnp.asarray(self.temp),
            jnp.asarray(self.topk), jnp.asarray(self.topp),
            jnp.asarray(self.penalty), n=n, method=self.method,
            dtype=self.dtype, tracking=tracking, sampling=sampling,
            want_lp=want_lp, want_top=n_top)
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
                    continue
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
        if self.cfg.sliding_window:
            for slot in active:
                if self.slots[slot] is not None:
                    self._recycle_window_pages(slot)
        return emitted

    def run(self, burst: int = 1) -> Dict[Any, List[int]]:
        """Drain all queued/active requests; returns id -> tokens.
        ``burst`` > 1 decodes that many tokens per dispatch once
        admissions settle (same streams, far fewer round-trips)."""
        while self.has_work:
            if burst > 1:
                self.step_burst(burst)
            else:
                self.step()
        return {r.id: r.output for r in self.finished}
