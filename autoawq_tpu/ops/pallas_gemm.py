"""Fused int4-dequant x bf16 matmul Pallas kernel (MXU).

TPU-native replacement for the reference's ``awq_ext.gemm_forward_cuda`` /
``gemv_forward_cuda`` CUDA kernels (call sites awq/modules/linear/gemm.py:56,
gemv.py:178). One kernel covers both regimes: decode (M small,
HBM-bandwidth-bound — the win is streaming 4-bit weights instead of 16-bit)
and prefill (M large, MXU-bound).

Profiled bottleneck on TPU is the VPU nibble-extraction, not DMA (pure
streaming reaches ~715 GB/s; shift+mask+convert extraction caps at ~430).
Two tricks get within ~15% of the DMA roofline:

1. **Paired magic-number extraction.** Nibble pair (p, p+4) — the low/high
   16-bit halves of each int32 word — is planted into bf16 mantissas with a
   single shift+mask+or (``(w >> 4p-3) & 0x00780078 | 0x43804380``): each
   half becomes the bf16 ``256 + 16*n``. A free ``pltpu.bitcast`` then
   doubles the *sublane* dim (row 2r = low half, 2r+1 = high). The planar
   row-paired layout (core/packing.py) stores two adjacent K-rows of the
   same logical column in each pair, so the bitcast output is directly a
   contraction-ready [2R, L] weight slab: 1.5 VPU ops per element (vs 3),
   one MXU dot per pass over a contiguous L-wide column block.

2. **Group-factored scaling.** The +256 bias and the zero-points never touch
   [K, N]-sized tensors:

       y[m, n] += (s[g, n]/16) * ( sum_{k in g} x[m, k] * wbf[k, n]
                                   - zbf[g, n] * sum_{k in g} x[m, k] )

   (zeros are packed with the same pairing along the group dim, so the bias
   cancels). Scales/zeros are applied on [BG, L]-sized f32 tiles — this
   *improves* numerics vs dequantize-to-bf16-then-matmul: nibbles are exact
   in bf16 and scales are applied in f32.

Scales/zeros are reshaped (free, row-major) to ``[NK, BG, ...]`` so each
K-block grabs one leading-dim slab — no Mosaic sublane-multiple constraint
on the group dim, so BK can be any even-group-count multiple dividing K.

Grid is (M/BM, N_pad/SB, K/BK) with K innermost: the f32 accumulator tile
lives in VMEM scratch across the K sweep while qweight streams through the
automatic double-buffered pipeline.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAIRS = 4  # extraction passes (one per low/high nibble pair)
QW_BLOCK_MAX = 3 * 1024 * 1024  # qweight block byte cap

# weights-stationary large-M mode: x held whole in VMEM, weights extracted
# ONCE per column superblock into a bf16 scratch, M tiles streamed against
# it. The default grid re-reads (and re-extracts) every weight block once
# per M tile — at M=2048 that is 8x the weight traffic and VPU extraction
# work, capping the kernel at ~42 TFLOP/s while a (memory-unsafe) XLA
# dequant+matmul reached 78. Engaged when M >= WS_MIN_M and both x and the
# extracted slab fit their VMEM budgets; longer prompts are processed in
# M-slabs by the wrapper.
import os as _os

# AWQ_TPU_WS_MIN_M tunes the engagement floor for on-chip A/Bs: below it
# the streaming grid re-reads weights once per 256-row M tile, above it
# the weights-stationary mode extracts once per column superblock. 1024
# was measured as the crossover on mistral gate_up shapes; shorter-prompt
# regimes (M 256-768) are candidates for lowering it once measured.
# r4 on-chip A/B (CHIP_AB_R3_RESULTS.json ws_m*): floor 256 beats 1024
# at every measured M — 28.6 vs 22.5 TFLOP/s (M=256), 50.9 vs 30.5
# (M=512), 64.6 vs 36.1 (M=768) — so WS engages from M=256 up.
WS_MIN_M = int(_os.environ.get("AWQ_TPU_WS_MIN_M", "256"))
# resident-x sweet spot (measured, mistral gate_up): a 33.5 MB slab
# (M=4096 @ K=4096) runs 116 TFLOP/s; a 42 MB slab falls off a VMEM cliff
# to ~50 (the operand double-buffers, 2x42 + scratches > 96 MB). A single
# call accepts up to WS_X_MAX resident; anything longer slabs at
# WS_SLAB_BYTES so every slab sits on the sweet spot.
WS_X_MAX = 34 * 1024 * 1024
WS_SLAB_BYTES = 32 * 1024 * 1024
WS_WBF_MAX = 16 * 1024 * 1024  # extracted-weights scratch cap (bytes)

_MASK = 0x00780078  # bf16 mantissa bits [3, 7) in both 16-bit halves
_EXP = 0x43804380  # bf16 exponent 2^8 in both halves -> value 256 + 16n


def _extract_pair(w: jax.Array, p: int) -> jax.Array:
    """int32 [R, C] -> bf16 [2R, C] holding 256 + 16*nibble for the
    (p, p+4) nibble pair; row 2r = low half of row r, row 2r+1 = high."""
    if p == 0:
        w = jax.lax.shift_left(w, 3)
    else:
        w = jax.lax.shift_right_logical(w, 4 * p - 3)
    return pltpu.bitcast((w & _MASK) | _EXP, jnp.bfloat16)


def _kernel(x_ref, qw_ref, sc_ref, *rest, nk: int, group_size: int,
            lanes: int):
    """rest = (qz_ref, out_ref, acc_ref) or, symmetric, (out_ref, acc_ref).

    Symmetric quantization (Marlin-parity fast path, reference
    awq/modules/linear/marlin.py) has the constant zero-point 8 — the
    extracted bias is 256 + 16*8 = 384 for every column, so the qzeros
    stream and its extraction disappear entirely.
    """
    symmetric = len(rest) == 2
    qz_ref = None if symmetric else rest[0]
    out_ref, acc_ref = rest[-2], rest[-1]
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [BM, BK]
    q = qw_ref[:]  # [BK/2, L] int32
    bm, bk = x.shape
    bg = bk // group_size

    xg = x.reshape(bm, bg, group_size).swapaxes(0, 1)  # [BG, BM, gs]
    # per-group x sums for the zero-point correction: [BG, BM, 1]
    xsum = jnp.sum(xg.astype(jnp.float32), axis=2)[:, :, None]
    s_all = sc_ref[0]  # [BG, SB], logical col = p*L + lane

    for p in range(PAIRS):
        wbf = _extract_pair(q, p)  # [BK, L]: rows are K-rows
        partial = jax.lax.dot_general(
            xg, wbf.reshape(bg, group_size, lanes),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [BG, BM, L]
        if symmetric:
            corrected = partial - 384.0 * xsum
        else:
            zbf = _extract_pair(qz_ref[0], p).astype(jnp.float32)  # [BG, L]
            corrected = partial - zbf[:, None, :] * xsum
        s = s_all[:, p * lanes : (p + 1) * lanes] * 0.0625  # s/16
        acc_ref[:, p, :] += jnp.sum(s[:, None, :] * corrected, axis=0)

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].reshape(bm, PAIRS * lanes).astype(out_ref.dtype)


def _kernel_ws(x_ref, qw_ref, sc_ref, *rest, group_size: int, lanes: int,
               bm: int):
    """Weights-stationary step: grid (N_j, M_m), m innermost. At m == 0 the
    j-th superblock is extracted AND dequantized into the bf16 scratch —
    every m step is then a pure [BM, K] x [K, L] MXU dot with zero
    per-element epilogue. (The group-factored formulation the streaming
    grid uses would pay its O(BG x BM x L) VPU post-scaling once per M
    tile; at large M that epilogue, not bandwidth, is the ceiling.)"""
    symmetric = len(rest) == 2
    qz_ref = None if symmetric else rest[0]
    out_ref, wbf_ref = rest[-2], rest[-1]
    m = pl.program_id(1)
    k = x_ref.shape[1]
    g = sc_ref.shape[1]

    @pl.when(m == 0)
    def _():
        s_all = sc_ref[0]  # [G, SB]
        for p in range(PAIRS):
            wraw = _extract_pair(qw_ref[:], p).astype(jnp.float32)  # 256+16n
            if symmetric:
                zb = jnp.float32(384.0)
            else:
                zb = _extract_pair(qz_ref[0], p).astype(
                    jnp.float32)[:, None, :]  # [G, 1, L]
            s = (s_all[:, p * lanes : (p + 1) * lanes]
                 * 0.0625)[:, None, :]  # [G, 1, L]
            w = (wraw.reshape(g, group_size, lanes) - zb) * s
            wbf_ref[p] = w.reshape(k, lanes).astype(jnp.bfloat16)

    x = x_ref[pl.ds(m * bm, bm), :]  # [BM, K] slab of the resident x
    outs = [
        jax.lax.dot_general(
            x, wbf_ref[p], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for p in range(PAIRS)
    ]
    out_ref[:] = jnp.concatenate(outs, axis=1).astype(out_ref.dtype)


def _ws_ok(m: int, k: int, lanes: int, group_size: int) -> bool:
    # ``m`` is the REAL row count (callers must not pre-pad: decode M=1
    # padded to a 256-row slab would do 256x the MXU work). No upper
    # bound on M here: _ws_matmul slabs oversized inputs at the
    # sweet-spot size itself.
    return (
        m >= WS_MIN_M
        and PAIRS * k * lanes * 2 <= WS_WBF_MAX
        and k % (2 * group_size) == 0
        and (k // group_size) % 2 == 0
    )


def _ws_matmul(x2: jax.Array, qweight: jax.Array, scales: jax.Array,
               qzeros: Optional[jax.Array], *, lanes: int,
               interpret: bool) -> jax.Array:
    """Weights-stationary pass: returns [m(padded), N_pad]. Splits very
    long inputs into M-slabs that keep x VMEM-resident (weights are re-read
    once per slab — still 1/(slab/256)th of the default grid's traffic)."""
    m, k = x2.shape
    bm = 256
    m_pad = -(-m // bm) * bm
    if m_pad * k * 2 <= WS_X_MAX:
        max_rows = m_pad
    else:
        max_rows = max(bm, (WS_SLAB_BYTES // (k * 2)) // bm * bm)
    if m_pad > max_rows:
        outs = [
            _ws_matmul(x2[lo : lo + max_rows], qweight, scales, qzeros,
                       lanes=lanes, interpret=interpret)
            for lo in range(0, m, max_rows)
        ]
        return jnp.concatenate(outs, axis=0)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    n4 = qweight.shape[1]
    n_pad = 4 * n4
    g = scales.shape[0]
    sb = PAIRS * lanes
    grid = (n_pad // sb, m_pad // bm)

    in_specs = [
        pl.BlockSpec((m_pad, k), lambda j, mm: (0, 0)),
        pl.BlockSpec((k // 2, lanes), lambda j, mm: (0, j)),
        pl.BlockSpec((1, g, sb), lambda j, mm: (0, 0, j)),
    ]
    operands = [x2, qweight,
                scales.astype(jnp.float32).reshape(1, g, n_pad)]
    if qzeros is not None:
        in_specs.append(
            pl.BlockSpec((1, g // 2, lanes), lambda j, mm: (0, 0, j)))
        operands.append(qzeros.reshape(1, g // 2, n4))

    return pl.pallas_call(
        functools.partial(_kernel_ws, group_size=k // g, lanes=lanes, bm=bm),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, sb), lambda j, mm: (mm, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x2.dtype),
        scratch_shapes=[pltpu.VMEM((PAIRS, k, lanes), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k,
            bytes_accessed=m_pad * k * 2 + k * n4 * 2 + m_pad * n_pad * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def _lanes(n4: int) -> int:
    """Packed lanes per superblock (mirrors core.packing.lane_block)."""
    return 256 if n4 % 256 == 0 and n4 >= 256 else n4


def _pick_bk(k: int, group_size: int, lanes: int) -> Optional[int]:
    """Largest divisor of K with an even group count per block whose qweight
    block fits the VMEM cap — large blocks won on this hardware (per-cell
    DMA setup cost dominates over pipeline-overlap losses)."""
    best = None
    step = 2 * group_size  # even BG so zeros pair cleanly
    for bk in range(step, k + 1, step):
        if k % bk == 0 and (bk // 2) * lanes * 4 <= QW_BLOCK_MAX:
            best = bk
    return best


def supported(x: jax.Array, qweight: jax.Array, group_size: int = 128) -> bool:
    """Shape gate for the fused kernel: row-paired planar layout + aligned K."""
    k2, n4 = qweight.shape
    k = 2 * k2
    return (
        n4 % _lanes(n4) == 0
        and _lanes(n4) % 8 == 0
        and k % group_size == 0
        and x.shape[-1] == k
        and _pick_bk(k, group_size, _lanes(n4)) is not None
    )


@functools.partial(
    jax.jit,
    static_argnames=("out_features", "block_m", "block_k", "interpret"),
)
def awq_matmul_pallas(
    x: jax.Array,
    qweight: jax.Array,
    scales: jax.Array,
    qzeros: Optional[jax.Array] = None,
    *,
    out_features: int,
    bias: Optional[jax.Array] = None,
    block_m: int = 256,
    block_k: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """``x @ dequant(qweight)[:, :out_features] (+ bias)``.

    x: [..., K] bf16/f32; qweight: int32 [K/2, N_pad/4] row-paired planar;
    scales: [G, N_pad]; qzeros: int32 [ceil(G/2), N_pad/4], or None for
    symmetric quantization (constant zero-point 8 — the Marlin-parity fast
    path that skips the zeros stream entirely).
    Returns [..., out_features].
    """
    orig_shape = x.shape
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    n4 = qweight.shape[1]
    n_pad = 4 * n4
    g = scales.shape[0]
    group_size = k // g
    lanes = _lanes(n4)

    group_size_ = k // g
    lanes_ = _lanes(n4)
    # gate on the REAL row count, not the 256-padded one: padding decode
    # M=1 to a 256-row WS slab would burn 256x the MXU work (r4 measured
    # 527 vs 783 tok/s when the padded M leaked into this gate)
    if block_k is None and _ws_ok(m, k, lanes_, group_size_):
        y = _ws_matmul(x2, qweight, scales, qzeros, lanes=lanes_,
                       interpret=interpret)
        y = y[:m, :out_features]
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y.reshape(*orig_shape[:-1], out_features)

    # NOTE: do NOT run unpadded M<8 blocks — Mosaic accepts sublane-1 blocks
    # but lowers them to a catastrophically slow path (~40x). Padding decode
    # M=1 -> 8 costs one tiny copy and keeps (8, 128)-tiled stores.
    bm = min(block_m, max(8, m))
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    bk = block_k if block_k is not None else _pick_bk(k, group_size, lanes)
    if bk is None:
        raise ValueError(f"unsupported K={k} for fused kernel; use jnp path")
    nk = k // bk
    bg = bk // group_size
    sb = PAIRS * lanes  # logical columns per superblock

    # leading-dim slabs per K-block: kills the sublane-multiple constraint
    # on the group dim (reshape of a row-major array is free)
    sc3 = scales.astype(jnp.float32).reshape(nk, bg, n_pad)

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
        pl.BlockSpec((bk // 2, lanes), lambda i, j, kk: (kk, j)),
        pl.BlockSpec((1, bg, sb), lambda i, j, kk: (kk, 0, j)),
    ]
    operands = [x2, qweight, sc3]
    if qzeros is not None:
        in_specs.append(
            pl.BlockSpec((1, bg // 2, lanes), lambda i, j, kk: (kk, 0, j)))
        operands.append(qzeros.reshape(nk, bg // 2, n4))

    grid = (m_pad // bm, n_pad // sb, nk)
    out = pl.pallas_call(
        functools.partial(_kernel, nk=nk, group_size=group_size, lanes=lanes),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, sb), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, PAIRS, lanes), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # XLA's memory-space-assignment may park the whole kernel output
            # in VMEM (it feeds the next fusion); with a large-M prefill that
            # output alone exceeds the default 16 MB scoped limit and
            # compilation aborts. v5e has 128 MB of physical VMEM — raise the
            # scoped cap so block pipelining + an MSA-resident output fit.
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k,
            bytes_accessed=m_pad * k * 2 + k * n4 * 2 + m_pad * n_pad * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)

    y = out[:m, :out_features]
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.reshape(*orig_shape[:-1], out_features)
