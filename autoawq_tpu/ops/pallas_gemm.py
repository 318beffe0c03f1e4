"""Fused int4-dequant x bf16 matmul Pallas kernel (MXU).

TPU-native replacement for the reference's ``awq_ext.gemm_forward_cuda`` /
``gemv_forward_cuda`` CUDA kernels (call sites awq/modules/linear/gemm.py:56,
gemv.py:178). One kernel covers both regimes: decode (M small,
HBM-bandwidth-bound — the win is streaming 4-bit weights instead of 16-bit)
and prefill (M large, MXU-bound).

Layout contract (core/packing.py): ``qweight int32 [K, N8]`` planar with
128-lane superblocks — nibble slot ``i`` of a 128-lane packed tile unpacks
with one shift+mask into a *contiguous* 128-lane block of logical columns.
The kernel therefore does, per (m, n, k) grid cell, 8 shift-mask-dequant +
``[BM,BK] @ [BK,128]`` MXU dots writing adjacent 128-column slices of the
output tile. No lane interleaving anywhere.

Grid is (M/BM, N8/BN8, K/BK) with K innermost: the f32 accumulator tile lives
in VMEM scratch across the K sweep while qweight streams through via the
automatic Pallas double-buffered pipeline.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SLOT = 8  # nibbles per int32


def _kernel(x_ref, qw_ref, sc_ref, qz_ref, out_ref, acc_ref, *, nk: int, group_size: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [BM, BK] bf16
    q = qw_ref[:]  # [BK, LANE] int32
    qz = qz_ref[:]  # [BG, LANE] int32
    bk = q.shape[0]
    bg = bk // group_size

    for i in range(SLOT):
        # logical shifts keep everything int32 (Mosaic lacks uint32->f32)
        wq = (jax.lax.shift_right_logical(q, 4 * i) & 0xF).astype(jnp.float32)
        zi = (jax.lax.shift_right_logical(qz, 4 * i) & 0xF).astype(jnp.float32)
        si = sc_ref[:, i * LANE : (i + 1) * LANE].astype(jnp.float32)  # [BG, LANE]
        w = (wq.reshape(bg, group_size, LANE) - zi[:, None, :]) * si[:, None, :]
        w = w.reshape(bk, LANE).astype(x.dtype)
        acc_ref[:, i * LANE : (i + 1) * LANE] += jnp.dot(
            x, w, preferred_element_type=jnp.float32
        )

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _pick_bk(k: int, group_size: int) -> Optional[int]:
    """Choose the K-block size.

    Constraint (Mosaic): the scales block's sublane dim (BK / group_size)
    must be a multiple of 8, or the block must span the full array (BK = K).
    Prefer a pipelined 1024..4096 block; fall back to full-K (single K step,
    still double-buffered across the N grid) when K is oddly sized but fits
    VMEM; else signal unsupported.
    """
    for mult in (8, 16, 32):
        bk = mult * group_size
        if k % bk == 0 and 1024 <= bk <= 4096:
            return bk
    if k * LANE * 4 <= 4 * 1024 * 1024:  # full-K qweight block <= 4 MB
        return k
    return None


def supported(x: jax.Array, qweight: jax.Array, group_size: int = 128) -> bool:
    """Shape gate for the fused kernel: 128-lane superblock layout + aligned K."""
    k, n8 = qweight.shape
    return (
        n8 % LANE == 0
        and k % group_size == 0
        and x.shape[-1] == k
        and _pick_bk(k, group_size) is not None
    )


@functools.partial(
    jax.jit, static_argnames=("out_features", "block_m", "interpret")
)
def awq_matmul_pallas(
    x: jax.Array,
    qweight: jax.Array,
    scales: jax.Array,
    qzeros: jax.Array,
    *,
    out_features: int,
    bias: Optional[jax.Array] = None,
    block_m: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """``x @ dequant(qweight)[:, :out_features] (+ bias)``.

    x: [..., K] bf16/f32; qweight: int32 [K, N8] (N8 % 128 == 0);
    scales: [G, 8*N8]; qzeros: int32 [G, N8]. Returns [..., out_features].
    """
    orig_shape = x.shape
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    n8 = qweight.shape[1]
    n_pad = 8 * n8
    g = scales.shape[0]
    group_size = k // g

    # NOTE: do NOT run unpadded M<8 blocks — Mosaic accepts sublane-1 blocks
    # but lowers them to a catastrophically slow path (~40x). Padding decode
    # M=1 -> 8 costs one tiny copy and keeps (8, 128)-tiled stores.
    bm = min(block_m, max(8, m))
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    bk = _pick_bk(k, group_size)
    if bk is None:
        raise ValueError(f"unsupported K={k} for fused kernel; use jnp path")
    bn8 = LANE
    nk = k // bk

    grid = (m_pad // bm, n8 // bn8, nk)
    out = pl.pallas_call(
        functools.partial(_kernel, nk=nk, group_size=group_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn8), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bk // group_size, 8 * bn8), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bk // group_size, bn8), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, 8 * bn8), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, 8 * bn8), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k,
            bytes_accessed=m_pad * k * 2 + k * n8 * 4 + m_pad * n_pad * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, qweight, scales, qzeros)

    y = out[:m, :out_features]
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.reshape(*orig_shape[:-1], out_features)
