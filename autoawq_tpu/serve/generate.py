"""Inference runtime: preallocated KV cache, jitted prefill/decode, sampling.

TPU-native replacement for the reference's fused decode runtime
(awq/modules/fused/model.py + fused/cache.py): the ``WindowedCache`` becomes
a donated pytree of per-layer [B, Hkv, T, D] buffers updated functionally
with ``dynamic_update_slice``; the per-token HF generation loop becomes
either (a) a python loop over one jitted decode step (streaming-friendly) or
(b) a single ``lax.scan``-compiled generation (zero per-token dispatch
overhead — the analogue of CUDA-graph decoding, free on XLA).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules


def init_kv_cache(cfg: ModelConfig, batch: int, max_seq_len: int,
                  dtype=jnp.bfloat16, mla_latent: bool = True,
                  kv_quant: bool = False) -> List[Dict[str, jax.Array]]:
    """Per-layer K/V buffers in the canonical TPU attention layout
    [B, heads, T, head_dim] — (T, head_dim) trailing dims tile directly
    into the fused attention-step kernel's VMEM blocks
    (ops/fused_attn_step.py) and shard on the head dim under TP. MLA models
    default to the compressed latent cache (``mla_latent=False`` restores
    the full per-head materialization).

    ``kv_quant=True`` stores int8 K/V with per-(batch, head, token) absmax
    scales — HALF the cache read/write bytes of a bf16 cache, the binding
    traffic at batched / long-context decode (the reference has no cache
    quantization; fp16-only windows, awq/modules/fused/cache.py). The
    dequant folds into the grouped-decode einsums as elementwise score /
    prob scaling (nn/modules.attention) — no dequantized cache is ever
    materialized. Downstream jit paths key on the cache pytree structure,
    so no extra flags are needed past this allocation."""
    if cfg.is_mla:
        if mla_latent:
            # latent cache: ONE [compressed-kv | rope-head] row per token
            # shared by every head (DeepSeek-V2 paper §2.1; HF instead
            # caches full per-head K/V). Decode reads [T, dc+dr] once per
            # step instead of [T, nh, dk]+[T, nh, dv] — a ~nh*(dk+dv)/(dc
            # +dr) ≈ 100x cache-bandwidth reduction at deepseek_v2 shapes.
            dc = cfg.kv_lora_rank + cfg.qk_rope_head_dim
            if kv_quant:
                # int8 latent rows with separate absmax scales for the
                # compressed-kv and rope parts (their magnitudes differ;
                # a shared scale would crush the smaller part) — same
                # scheme as the paged engine's c_page_s
                return [
                    {"c": jnp.zeros((batch, 1, max_seq_len, dc), jnp.int8),
                     "c_s": jnp.zeros((batch, 1, max_seq_len, 2),
                                      jnp.float32)}
                    for _ in range(cfg.num_hidden_layers)
                ]
            return [
                {"c": jnp.zeros((batch, 1, max_seq_len, dc), dtype)}
                for _ in range(cfg.num_hidden_layers)
            ]
        nh = cfg.num_attention_heads
        dk = cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
        dv = cfg.v_head_dim
        return [
            {
                "k": jnp.zeros((batch, nh, max_seq_len, dk), dtype),
                "v": jnp.zeros((batch, nh, max_seq_len, dv), dtype),
            }
            for _ in range(cfg.num_hidden_layers)
        ]
    hd, nkv = cfg.head_dim_, cfg.num_key_value_heads
    if kv_quant:
        return [
            {
                "k": jnp.zeros((batch, nkv, max_seq_len, hd), jnp.int8),
                "v": jnp.zeros((batch, nkv, max_seq_len, hd), jnp.int8),
                "k_s": jnp.zeros((batch, nkv, max_seq_len), jnp.float32),
                "v_s": jnp.zeros((batch, nkv, max_seq_len), jnp.float32),
            }
            for _ in range(cfg.num_hidden_layers)
        ]
    return [
        {
            "k": jnp.zeros((batch, nkv, max_seq_len, hd), dtype),
            "v": jnp.zeros((batch, nkv, max_seq_len, hd), dtype),
        }
        for _ in range(cfg.num_hidden_layers)
    ]


def _cache_len(caches: List[Dict[str, jax.Array]]) -> int:
    """Capacity (T) of a cache pytree — works for both the [B, H, T, D]
    K/V format and the MLA latent [B, 1, T, dc+dr] format."""
    return next(iter(caches[0].values())).shape[2]


_warned_long_rope = set()


def _check_rope_capacity(cfg: ModelConfig, capacity: int) -> None:
    """Rope tables are keyed on cache CAPACITY (see _run_blocks), which for
    dynamic-NTK / longrope selects the long-context factors as soon as the
    cache is allocated past original_max_position_embeddings — even if the
    actual prompt+generation stays short. That keeps every step of one
    generation numerically consistent, but silently diverges from HF for
    short sequences in oversized caches, so warn once per (model, capacity)."""
    if cfg.rope_type not in ("dynamic", "longrope"):
        return
    rs = cfg.rope_scaling_dict or {}
    orig = (cfg.original_max_position_embeddings
            or rs.get("original_max_position_embeddings")
            or cfg.max_position_embeddings)
    if orig and capacity > orig and (cfg.model_type, capacity) not in _warned_long_rope:
        _warned_long_rope.add((cfg.model_type, capacity))
        import warnings

        warnings.warn(
            f"KV-cache capacity {capacity} > original_max_position_embeddings "
            f"{orig}: {cfg.rope_type} rope uses its long-context factors for "
            "the WHOLE generation (consistent across steps, but different "
            "from HF for short sequences). Size max_seq_len to the expected "
            "prompt+generation length to keep short-context numerics.")


def _run_blocks(cfg, params, x, positions, mask, caches, pos, method,
                causal_prefill=False):
    # rope_scaling context length = the KV-cache capacity, so prefill and
    # every decode step of one generation share identical tables (HF instead
    # recomputes dynamic-NTK/longrope tables mid-generation, mutating K
    # embeddings inconsistently across steps).
    cos, sin = modules.rope_tables(cfg, positions,
                                   seq_len=_cache_len(caches))
    new_caches = []
    for lp, cache in zip(params["layers"], caches):
        kv = {**cache, "pos": pos}
        x, kv = modules.block(cfg, lp, x, cos, sin, mask, kv_cache=kv,
                              method=method, causal_prefill=causal_prefill)
        new_caches.append({k: kv[k] for k in cache})
    return x, new_caches


@functools.partial(jax.jit, static_argnames=("cfg", "method", "dtype"))
def prefill(
    cfg: ModelConfig,
    params: Dict[str, Any],
    tokens: jax.Array,  # [B, S]
    caches: List[Dict[str, jax.Array]],
    method: str = "auto",
    dtype=jnp.bfloat16,
    embeds: Optional[jax.Array] = None,  # [B, S, H] multimodal prompt
) -> Tuple[jax.Array, List[Dict[str, jax.Array]]]:
    """Process the prompt; returns (last-position logits [B, V], caches).

    ``embeds`` replaces the token embedding lookup with precomputed
    input embeds (vision features spliced at image-token positions —
    the multimodal serving entry; decode continues on token ids)."""
    b, s = tokens.shape
    max_t = _cache_len(caches)
    positions = jnp.arange(s)[None, :]
    x = (embeds.astype(dtype) if embeds is not None
         else modules.embed(cfg, params, tokens, dtype, positions))
    causal_prefill = cfg.sliding_window is None and cfg.pos_embed != "alibi"
    qi = jnp.arange(s)[:, None]
    # causal-prefill attends over the local s keys; windowed over the cache
    ki = jnp.arange(s if causal_prefill else max_t)[None, :]
    ok = ki <= qi
    if cfg.sliding_window:
        ok &= ki > qi - cfg.sliding_window
    mask = jnp.where(ok, 0.0, -1e30).astype(jnp.float32)[None, None]
    if cfg.pos_embed == "alibi":
        mask = mask + modules.alibi_bias(cfg.num_attention_heads,
                                         qi[:, 0], ki[0])
    x, caches = _run_blocks(cfg, params, x, positions, mask, caches,
                            jnp.int32(0), method, causal_prefill)
    logits = modules.logits_fn(cfg, params, x[:, -1:, :], method)
    return logits[:, 0, :], caches


@functools.partial(jax.jit, static_argnames=("cfg", "method", "dtype"),
                   donate_argnums=(3,))
def decode_step(
    cfg: ModelConfig,
    params: Dict[str, Any],
    token: jax.Array,  # [B, 1]
    caches: List[Dict[str, jax.Array]],
    pos: jax.Array,  # scalar int32: number of tokens already in cache
    method: str = "auto",
    dtype=jnp.bfloat16,
    embeds: Optional[jax.Array] = None,  # [B, 1, H] precomputed input row
) -> Tuple[jax.Array, List[Dict[str, jax.Array]]]:
    """One decode step; donates and returns the KV caches. ``embeds``
    replaces the token-embedding lookup (e.g. the omni talker feeds
    projected codec+reply embeds, models/talker.py)."""
    max_t = _cache_len(caches)
    positions = pos[None, None] if pos.ndim == 0 else pos
    x = (embeds.astype(dtype) if embeds is not None
         else modules.embed(cfg, params, token, dtype, positions))
    ki = jnp.arange(max_t)[None, :]
    ok = ki <= pos
    if cfg.sliding_window:
        ok &= ki > pos - cfg.sliding_window
    mask = jnp.where(ok, 0.0, -1e30).astype(jnp.float32)[None, None]
    if cfg.pos_embed == "alibi":
        mask = mask + modules.alibi_bias(cfg.num_attention_heads,
                                         positions[0], ki[0])
    x, caches = _run_blocks(cfg, params, x, positions, mask, caches, pos,
                            method)
    logits = modules.logits_fn(cfg, params, x, method)
    return logits[:, 0, :], caches


@functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
def roll_kv(caches: List[Dict[str, jax.Array]], n: int) -> List[Dict[str, jax.Array]]:
    """Evict the oldest ``n`` positions by shifting the caches left
    (reference: WindowedCache.roll_kv_n_steps, awq/modules/fused/cache.py:48
    — the sliding-window overflow path of prepare_cache,
    awq/utils/fused_utils.py:14-27). Rolled-off tokens are dropped."""
    out = []
    for c in caches:
        out.append({k: jnp.roll(v, -n, axis=2) for k, v in c.items()})
    return out


def _mask_top_k(logits: jax.Array, top_k: int) -> jax.Array:
    """Keep only the k largest logits per row (HF TopKLogitsWarper)."""
    kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def _mask_top_p(logits: jax.Array, top_p: float) -> jax.Array:
    """Nucleus filtering (HF TopPLogitsWarper): keep the smallest set of
    tokens whose cumulative probability reaches ``top_p`` (always at least
    the argmax)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # token i survives if the mass BEFORE it is < top_p (exclusive cumsum),
    # which keeps the first token crossing the threshold, like HF's
    # shift-right of the removal mask.
    keep = (cum - probs) < top_p
    # per-row logit threshold = smallest kept sorted logit
    thresh = jnp.min(jnp.where(keep, sorted_logits, jnp.inf),
                     axis=-1, keepdims=True)
    return jnp.where(logits < thresh, -jnp.inf, logits)


def apply_repetition_penalty(logits: jax.Array, presence: jax.Array,
                             penalty: float) -> jax.Array:
    """HF RepetitionPenaltyLogitsProcessor: for every token already seen
    (``presence`` [B, V] bool over prompt+generated), divide positive logits
    by ``penalty`` and multiply negative ones."""
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(presence, penalized, logits)


def warp_logits(logits: jax.Array, temperature: float,
                top_k: Optional[int] = None,
                top_p: Optional[float] = None) -> jax.Array:
    """Apply the HF warper chain (temperature -> top_k -> top_p) and
    return warped logits. softmax(warp_logits(...)) IS the sampling
    distribution — speculative sampling needs it explicitly."""
    logits = logits / temperature
    if top_k is not None and 0 < top_k < logits.shape[-1]:
        logits = _mask_top_k(logits, top_k)
    if top_p is not None and top_p < 1.0:
        logits = _mask_top_p(logits, top_p)
    return logits


def sample(logits: jax.Array, temperature: float, key,
           top_k: Optional[int] = None,
           top_p: Optional[float] = None) -> jax.Array:
    """Temperature / top-k / top-p sampling (the reference inherits these
    from HF GenerationMixin; warper order matches HF: temperature -> top_k
    -> top_p). ``temperature == 0`` is greedy."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    return jax.random.categorical(
        key, warp_logits(logits, temperature, top_k, top_p), axis=-1)


def generate(
    cfg: ModelConfig,
    params: Dict[str, Any],
    prompt: jax.Array,  # [B, S]
    max_new_tokens: int,
    *,
    temperature: float = 0.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    repetition_penalty: float = 1.0,
    seed: int = 0,
    eos_token_id: Optional[int] = None,
    max_seq_len: Optional[int] = None,
    method: str = "auto",
    dtype=jnp.bfloat16,
    kv_quant: bool = False,
    stream_callback=None,
    prompt_embeds: Optional[jax.Array] = None,
) -> jax.Array:
    """Python-loop generation (streaming-friendly). Returns [B, S + new].

    ``prompt_embeds`` ([B, S, H]) prefills from precomputed input embeds
    (multimodal prompts); decode continues on token ids."""
    b, s = prompt.shape
    total = max_seq_len or (s + max_new_tokens)
    _check_rope_capacity(cfg, total)
    roll_step = 128  # eviction granularity on overflow (reference rolls 100)
    caches = init_kv_cache(cfg, b, total, dtype, kv_quant=kv_quant)
    logits, caches = prefill(cfg, params, prompt, caches, method, dtype,
                             embeds=prompt_embeds)
    key = jax.random.PRNGKey(seed)
    out = [prompt]
    token = None
    finished = jnp.zeros((b,), dtype=bool)
    presence = None
    if repetition_penalty != 1.0:
        v = logits.shape[-1]
        presence = jnp.zeros((b, v), bool).at[
            jnp.arange(b)[:, None], prompt].set(True)
    pos = s
    for i in range(max_new_tokens):
        key, sub = jax.random.split(key)
        if presence is not None:
            logits = apply_repetition_penalty(logits, presence,
                                              repetition_penalty)
        token = sample(logits, temperature, sub, top_k, top_p)[:, None]
        if presence is not None:
            presence = presence.at[jnp.arange(b), token[:, 0]].set(True)
        if eos_token_id is not None:
            finished = finished | (token[:, 0] == eos_token_id)
        out.append(token)
        if stream_callback is not None:
            stream_callback(token)
        if eos_token_id is not None and bool(finished.all()):
            break
        if i + 1 < max_new_tokens:
            if pos >= total:  # windowed eviction: drop the oldest tokens
                caches = roll_kv(caches, roll_step)
                pos -= roll_step
            logits, caches = decode_step(cfg, params, token, caches,
                                         jnp.int32(pos), method, dtype)
            pos += 1
    return jnp.concatenate(out, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "temperature", "top_k", "top_p",
                     "method", "dtype", "kv_quant"),
)
def generate_compiled(
    cfg: ModelConfig,
    params: Dict[str, Any],
    prompt: jax.Array,  # [B, S]
    max_new_tokens: int,
    *,
    temperature: float = 0.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    seed: int = 0,
    method: str = "auto",
    dtype=jnp.bfloat16,
    kv_quant: bool = False,
) -> jax.Array:
    """Whole-generation lax.scan compile: zero per-token dispatch overhead."""
    b, s = prompt.shape
    total = s + max_new_tokens
    _check_rope_capacity(cfg, total)
    caches = init_kv_cache(cfg, b, total, dtype, kv_quant=kv_quant)
    logits, caches = prefill(cfg, params, prompt, caches, method, dtype)
    key = jax.random.PRNGKey(seed)

    def step(carry, i):
        logits, caches, key = carry
        key, sub = jax.random.split(key)
        token = sample(logits, temperature, sub, top_k, top_p)[:, None]
        logits, caches = decode_step(cfg, params, token, caches, s + i,
                                     method, dtype)
        return (logits, caches, key), token[:, 0]

    (logits, caches, key), toks = jax.lax.scan(
        step, (logits, caches, key), jnp.arange(max_new_tokens, dtype=jnp.int32)
    )
    return jnp.concatenate([prompt, toks.T], axis=1)
