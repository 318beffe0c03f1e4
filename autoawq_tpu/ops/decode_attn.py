"""Fused decode attention over the KV cache (Pallas, TPU).

TPU-native replacement for the reference's ``flash_attn_with_kvcache``
decode call (awq/modules/fused/attn.py:269-293). One kernel per layer
computes scores + online softmax + value contraction directly against the
cache, instead of the XLA op-chain (GQA repeat, einsum, mask add, softmax,
einsum) the jnp path runs — and it is GQA-native: each cached KV byte is
read once per step, not ``nh/nkv`` times.

Formulation: grid (batch, kv_head, T-blocks). Each program holds the kv
group's ``rep = nh/nkv`` query heads (padded to the 8-sublane tile) in
VMEM and streams the group's K/V cache rows block-by-block through the
automatic pipeline, maintaining flash-style running max / denominator /
accumulator in VMEM scratch. The valid length (cache position) arrives as
a prefetched scalar; rows past it — and, for sliding-window models,
before ``valid - window`` — are masked in-kernel.

The cache layout is the runtime's [B, n_kv, T, hd] (serve/generate.py) —
the (T, hd) trailing dims tile straight into (1, 1, T_blk, hd) VMEM blocks
(Mosaic requires the last two block dims be 8/128-aligned or full).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REP_PAD = 8  # query-head sublane tile
# Per-cell grid overhead dominates decode (the compute is microseconds), so
# the whole [T, hd] K/V slab of one kv head is loaded as ONE block whenever
# it fits comfortably in VMEM — grid (B, nkv, 1), softmax in one shot. Only
# very long contexts fall back to pipelined T-blocks with online softmax.
SLAB_BYTES = 4 * 1024 * 1024
T_BLK_LONG = 2048  # pipeline block for the long-context path


def _kernel(vl_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
            nt: int, t_blk: int, scale: float, window: Optional[int]):
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    vl = vl_ref[0]  # valid cache length
    q = q_ref[0, 0].astype(jnp.float32)  # [REP_PAD, hd]
    k = k_ref[0, 0].astype(jnp.float32)  # [t_blk, hd]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [REP_PAD, t_blk]
    idx = t * t_blk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    ok = idx < vl
    if window is not None:
        ok &= idx >= vl - window
    s = jnp.where(ok, s, -1e30)

    m_old = m_ref[:, :1]  # [REP_PAD, 1]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    # a fully-masked block has s == m_new == -1e30 -> exp(0) = 1; zero it
    p = jnp.where(ok, jnp.exp(s - m_new), 0.0)
    alpha = jnp.exp(m_old - m_new)  # [REP_PAD, 1]
    l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)

    v = v_ref[0, 0].astype(jnp.float32)  # [t_blk, hd]
    pv = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [REP_PAD, hd]
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(t == nt - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)).astype(
            o_ref.dtype)


def supported(nh: int, nkv: int, hd: int, t: int) -> bool:
    """Eligibility: whole-group sublane fit and lane-aligned head dim."""
    rep = nh // nkv
    return rep <= REP_PAD and hd % 8 == 0 and hd <= 512 and t % 8 == 0


@functools.partial(jax.jit, static_argnames=("scale", "window", "interpret"))
def decode_attention(
    q: jax.Array,  # [B, nh, hd] current-step queries (post-rope)
    k_cache: jax.Array,  # [B, nkv, T, hd] (current token already written)
    v_cache: jax.Array,  # [B, nkv, T, hd]
    valid_len: jax.Array,  # scalar int32: number of valid cache rows
    *,
    scale: float,
    window: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Single-step attention output [B, nh*hd]."""
    b, nh, hd = q.shape
    _, nkv, t, _ = k_cache.shape
    rep = nh // nkv

    if t * hd * k_cache.dtype.itemsize <= SLAB_BYTES:
        t_blk = t  # single-shot: one grid cell per (batch, kv head)
    else:
        t_blk = min(T_BLK_LONG, t)
        while t % t_blk:
            t_blk //= 2
    nt = t // t_blk

    qg = q.reshape(b, nkv, rep, hd).astype(jnp.float32)
    if rep < REP_PAD:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, REP_PAD - rep), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, nt=nt, t_blk=t_blk, scale=scale,
                          window=window),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nkv, nt),
            in_specs=[
                pl.BlockSpec((1, 1, REP_PAD, hd), lambda i, j, tt, vl: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, t_blk, hd), lambda i, j, tt, vl: (i, j, tt, 0)),
                pl.BlockSpec((1, 1, t_blk, hd), lambda i, j, tt, vl: (i, j, tt, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, REP_PAD, hd),
                                   lambda i, j, tt, vl: (i, j, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((REP_PAD, 128), jnp.float32),
                pltpu.VMEM((REP_PAD, 128), jnp.float32),
                pltpu.VMEM((REP_PAD, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, nkv, REP_PAD, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(valid_len, jnp.int32).reshape(1), qg, k_cache, v_cache)
    return out[:, :, :rep].reshape(b, nh * hd)
