"""Paged decode attention (Pallas, TPU): block-table-native, int8-aware.

The paged engine's TPU fast path was the stock Pallas paged-attention
kernel, which is bf16-only — int8 pools (serve/paged.py kv_quant=True)
fell back to a gather that materializes the whole [B, nkv, T, hd] cache
every step. This kernel reads pages IN PLACE through a scalar-prefetched
page table: grid (batch, kv_head, pages_per_seq), and the K/V BlockSpec
index maps look the page id up in the prefetched table
(``tbl[i, pb]``) — the same table-in-index-map trick as the MoE grouped
GEMM's block->expert table (ops/moe_gemm.py). Each program streams one
page of one kv head, maintaining flash-style running max / denominator /
accumulator across the page loop; rows at or past the slot's valid
length are masked (unused table entries point at the trash page 0 and
mask out entirely).

int8 pages add per-(head, token) absmax scales: the K scale row folds
into the score block and the V scale row into the prob block — exactly
the reassociation the gather path uses (nn/modules._paged_decode), but
with no dequantized cache ever materialized and HALF the page bytes
streamed vs bf16.

Replaces-for-real: the reference has no paged KV at all (contiguous
window caches, awq/modules/fused/cache.py); vLLM-style paged attention
is the serving-stack upgrade its users bolt on externally.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REP_PAD = 8  # query-head sublane tile


def _make_kernel(n_pages: int, ps: int, scale: float,
                 softcap: Optional[float], quant: bool,
                 window: Optional[int], alibi: bool):
    """Kernel layout variants (with/without scale and slope operands)
    sharing one body."""

    def finish(s, p_scale_row, v, v_scale_row, slope_col, vl, pb,
               o_ref, m_ref, l_ref, acc_ref):
        if p_scale_row is not None:
            s = s * p_scale_row[None, :]  # fold int8 K scales
        if softcap:
            s = jnp.tanh(s / softcap) * softcap
        idx = pb * ps + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        if slope_col is not None:
            # ALiBi: per-query-head slope x (key_pos - query_pos); the
            # query sits at vl - 1
            s = s + slope_col[:, None] * (idx - (vl - 1)).astype(
                jnp.float32)
        ok = idx < vl
        if window is not None:
            ok &= idx >= vl - window  # sliding-window models (mistral)
        s = jnp.where(ok, s, -1e30)

        m_old = m_ref[:, :1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        p = jnp.where(ok, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_old - m_new)
        l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if v_scale_row is not None:
            p = p * v_scale_row[None, :]  # fold int8 V scales
        pv = jax.lax.dot_general(
            p, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

        @pl.when(pb == n_pages - 1)
        def _():
            o_ref[0, 0] = (acc_ref[:] /
                           jnp.maximum(l_ref[:, :1], 1e-30)).astype(
                               o_ref.dtype)

    def start(tbl_ref, len_ref, q_ref, k_ref):
        pb = pl.program_id(2)

        i = pl.program_id(0)
        vl = len_ref[i]
        q = q_ref[0, 0].astype(jnp.float32)  # [REP_PAD, hd]
        k = k_ref[0, 0].astype(jnp.float32)  # [ps, hd] (int8->f32 exact)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        return s, vl, pb

    def init_scratch(m_ref, l_ref, acc_ref):
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if quant and alibi:
        def kernel(tbl_ref, len_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                   sl_ref, o_ref, m_ref, l_ref, acc_ref):
            pl.when(pl.program_id(2) == 0)(
                lambda: init_scratch(m_ref, l_ref, acc_ref))
            s, vl, pb = start(tbl_ref, len_ref, q_ref, k_ref)
            finish(s, ks_ref[0, 0, 0], v_ref[0, 0].astype(jnp.float32),
                   vs_ref[0, 0, 0], sl_ref[0], vl, pb, o_ref, m_ref,
                   l_ref, acc_ref)
    elif quant:
        def kernel(tbl_ref, len_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                   o_ref, m_ref, l_ref, acc_ref):
            pl.when(pl.program_id(2) == 0)(
                lambda: init_scratch(m_ref, l_ref, acc_ref))
            s, vl, pb = start(tbl_ref, len_ref, q_ref, k_ref)
            finish(s, ks_ref[0, 0, 0], v_ref[0, 0].astype(jnp.float32),
                   vs_ref[0, 0, 0], None, vl, pb, o_ref, m_ref, l_ref,
                   acc_ref)
    elif alibi:
        def kernel(tbl_ref, len_ref, q_ref, k_ref, v_ref, sl_ref,
                   o_ref, m_ref, l_ref, acc_ref):
            pl.when(pl.program_id(2) == 0)(
                lambda: init_scratch(m_ref, l_ref, acc_ref))
            s, vl, pb = start(tbl_ref, len_ref, q_ref, k_ref)
            finish(s, None, v_ref[0, 0].astype(jnp.float32), None,
                   sl_ref[0], vl, pb, o_ref, m_ref, l_ref, acc_ref)
    else:
        def kernel(tbl_ref, len_ref, q_ref, k_ref, v_ref,
                   o_ref, m_ref, l_ref, acc_ref):
            pl.when(pl.program_id(2) == 0)(
                lambda: init_scratch(m_ref, l_ref, acc_ref))
            s, vl, pb = start(tbl_ref, len_ref, q_ref, k_ref)
            finish(s, None, v_ref[0, 0].astype(jnp.float32), None,
                   None, vl, pb, o_ref, m_ref, l_ref, acc_ref)

    return kernel


def supported(nh: int, nkv: int, hd: int, ps: int) -> bool:
    """Whole-group sublane fit + tile-compatible page shape."""
    rep = nh // nkv
    return rep <= REP_PAD and hd % 8 == 0 and hd <= 512 and ps % 8 == 0


@functools.partial(jax.jit, static_argnames=("scale", "softcap",
                                             "window", "interpret"))
def paged_decode_attention(
    q: jax.Array,        # [B, nh, hd] current-step queries (post-rope)
    k_pages: jax.Array,  # [nkv, P, ps, hd] bf16/f32 or int8
    v_pages: jax.Array,  # [nkv, P, ps, hd]
    table: jax.Array,    # [B, PPS] int32 page ids (0 = trash page)
    lengths: jax.Array,  # [B] int32 valid rows per slot
    *,
    scale: float,
    k_scales: Optional[jax.Array] = None,  # [nkv, P, ps] f32 (int8 pages)
    v_scales: Optional[jax.Array] = None,
    softcap: Optional[float] = None,
    window: Optional[int] = None,
    alibi_slopes: Optional[jax.Array] = None,  # [nh] f32 per-head slopes
    interpret: bool = False,
) -> jax.Array:
    """Single-step paged attention output [B, nh*hd]."""
    b, nh, hd = q.shape
    nkv, _, ps, _ = k_pages.shape
    pps = table.shape[1]
    rep = nh // nkv
    quant = k_scales is not None
    alibi = alibi_slopes is not None

    qg = q.reshape(b, nkv, rep, hd).astype(jnp.float32)
    if rep < REP_PAD:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, REP_PAD - rep), (0, 0)))

    in_specs = [
        pl.BlockSpec((1, 1, REP_PAD, hd),
                     lambda i, j, pb, tbl, ln: (i, j, 0, 0)),
        pl.BlockSpec((1, 1, ps, hd),
                     lambda i, j, pb, tbl, ln: (j, tbl[i, pb], 0, 0)),
        pl.BlockSpec((1, 1, ps, hd),
                     lambda i, j, pb, tbl, ln: (j, tbl[i, pb], 0, 0)),
    ]
    operands = [qg, k_pages, v_pages]
    if quant:
        # a unit sublane dim keeps the scale blocks Mosaic-legal: block
        # (1, 1, ps) on [nkv, P, ps] fails the (8, 128)-tiling check on
        # real TPU (r4b on-chip finding); (1, 1, 1, ps) on
        # [nkv, P, 1, ps] has both trailing block dims equal to the
        # array's and lowers fine
        n_pool = k_scales.shape[1]
        in_specs += [
            pl.BlockSpec((1, 1, 1, ps),
                         lambda i, j, pb, tbl, ln: (j, tbl[i, pb], 0, 0)),
            pl.BlockSpec((1, 1, 1, ps),
                         lambda i, j, pb, tbl, ln: (j, tbl[i, pb], 0, 0)),
        ]
        operands += [k_scales.reshape(nkv, n_pool, 1, ps),
                     v_scales.reshape(nkv, n_pool, 1, ps)]
    if alibi:
        # group-major [nkv, REP_PAD] slope sheet; each program reads its
        # kv group's query-head rows (padded rows never leave the kernel)
        sl = alibi_slopes.astype(jnp.float32).reshape(nkv, rep)
        sl = jnp.pad(sl, ((0, 0), (0, REP_PAD - rep)))
        in_specs.append(
            pl.BlockSpec((1, REP_PAD), lambda i, j, pb, tbl, ln: (j, 0)))
        operands.append(sl)

    out = pl.pallas_call(
        _make_kernel(pps, ps, scale, softcap, quant, window, alibi),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, nkv, pps),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, REP_PAD, hd),
                                   lambda i, j, pb, tbl, ln: (i, j, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((REP_PAD, 128), jnp.float32),
                pltpu.VMEM((REP_PAD, 128), jnp.float32),
                pltpu.VMEM((REP_PAD, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, nkv, REP_PAD, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(table, jnp.int32), jnp.asarray(lengths, jnp.int32),
      *operands)
    return out[:, :, :rep].reshape(b, nh * hd)
