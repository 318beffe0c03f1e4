"""Grouped W4A16 matmul for MoE expert-stacked weights (Pallas, TPU).

TPU-native replacement for the reference's ``awq_ext.grouped_gemm_forward``
+ ``moe_alig_block_size`` + ``topk_softmax`` pipeline
(awq/modules/fused/moe.py:60-171):

* :func:`moe_align` — the static-shape XLA analogue of
  ``moe_align_block_size`` (moe.py:94-134): sort the (token, slot) pairs by
  expert, pad each expert's run to BLOCK_M, and emit a block->expert table
  plus per-slot gather indices (sentinel = zero row).
* :func:`grouped_awq_matmul_pallas` — one Pallas kernel whose grid walks
  (token-block, N-superblock, K-block); the weight BlockSpecs index the
  stacked ``[E, K/2, N_pad/4]`` int4 tensor with the *scalar-prefetched*
  block->expert id, so only the experts that actually own tokens stream from
  HBM. The inner math is the row-paired magic-number dequant of
  ops/pallas_gemm.py.
* :func:`moe_mlp` — routed two-matmul expert MLP (gate_up -> act -> down)
  over pre-routed weights, the analogue of the two grouped_gemm calls with
  ``silu_and_mul`` between (moe.py:45-91).

The jnp dense-compute formulation in nn/modules.py remains the oracle and
the CPU / calibration path.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from autoawq_tpu.ops.pallas_gemm import (
    PAIRS,
    _extract_pair,
    _lanes,
    _pick_bk,
)

BLOCK_M = 8  # decode token rows per block (sublane-aligned)


def pick_block_m(total_entries: int, num_experts: int) -> int:
    """Token-block size: decode keeps 8-row blocks (one expert rarely owns
    more); prefill grows blocks so the int4 extraction amortizes over more
    rows, capped so per-expert padding stays ~<=25% of real rows."""
    if total_entries <= 64:
        return BLOCK_M
    return min(128, max(8, (total_entries // (4 * num_experts)) // 8 * 8))


def moe_align(topi: jax.Array, num_experts: int,
              block_m: int = BLOCK_M) -> Tuple[jax.Array, jax.Array]:
    """Sort (token, slot) pairs by expert and pad runs to block_m.

    topi: int32 [T, k] expert ids. Returns (gather_idx [NB*block_m] int32
    flat-entry indices with sentinel T*k for padding, block_expert [NB]).
    NB = ceil(T*k / block_m) + num_experts (static worst case).
    """
    t, k = topi.shape
    tk = t * k
    nb = -(-tk // block_m) + num_experts
    e_flat = topi.reshape(-1)
    order = jnp.argsort(e_flat)  # stable: ties keep flat-entry order
    e_sorted = e_flat[order]
    counts = jnp.sum(
        jax.nn.one_hot(e_flat, num_experts, dtype=jnp.int32), axis=0
    )  # [E]
    blocks_per = -(-counts // block_m)
    starts = jnp.cumsum(counts) - counts
    block_starts = jnp.cumsum(blocks_per) - blocks_per
    # sorted entry r sits at padded slot block_starts[e]*bm + (r - starts[e])
    r = jnp.arange(tk)
    slots = block_starts[e_sorted] * block_m + (r - starts[e_sorted])
    gather_idx = jnp.full((nb * block_m,), tk, jnp.int32).at[slots].set(
        order.astype(jnp.int32)
    )
    # block b belongs to the expert whose block range covers it
    block_expert = jnp.searchsorted(
        jnp.cumsum(blocks_per), jnp.arange(nb), side="right"
    ).astype(jnp.int32)
    block_expert = jnp.minimum(block_expert, num_experts - 1)
    return gather_idx, block_expert


def _kernel(be_ref, x_ref, qw_ref, sc_ref, *rest, nk: int, group_size: int,
            lanes: int):
    """rest = (qz_ref, out_ref, acc_ref) or, symmetric quantization,
    (out_ref, acc_ref) — the zeros-free constant-384 fast path, mirroring
    ops/pallas_gemm.py."""
    symmetric = len(rest) == 2
    qz_ref = None if symmetric else rest[0]
    out_ref, acc_ref = rest[-2], rest[-1]
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [BM, BK]
    q = qw_ref[0]  # [BK/2, L]
    bm, bk = x.shape
    bg = bk // group_size

    xg = x.reshape(bm, bg, group_size).swapaxes(0, 1)
    xsum = jnp.sum(xg.astype(jnp.float32), axis=2)[:, :, None]
    s_all = sc_ref[0, 0]  # [BG, SB]

    for p in range(PAIRS):
        wbf = _extract_pair(q, p)
        partial = jax.lax.dot_general(
            xg, wbf.reshape(bg, group_size, lanes),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if symmetric:
            corrected = partial - 384.0 * xsum
        else:
            zbf = _extract_pair(qz_ref[0, 0], p).astype(jnp.float32)
            corrected = partial - zbf[:, None, :] * xsum
        s = s_all[:, p * lanes : (p + 1) * lanes] * 0.0625
        acc_ref[:, p, :] += jnp.sum(s[:, None, :] * corrected, axis=0)

    @pl.when(kk == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].reshape(bm, PAIRS * lanes).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_features", "block_m",
                                             "interpret"))
def grouped_awq_matmul_pallas(
    xs: jax.Array,  # [NB*BM, K] expert-sorted activation rows
    block_expert: jax.Array,  # [NB] int32
    qweight: jax.Array,  # [E, K/2, N_pad/4]
    scales: jax.Array,  # [E, G, N_pad]
    qzeros: Optional[jax.Array] = None,  # [E, ceil(G/2), N_pad/4] | None (symmetric)
    *,
    out_features: int,
    block_m: int = BLOCK_M,
    interpret: bool = False,
) -> jax.Array:
    """Per-block expert-indexed W4A16 matmul -> [NB*BM, out_features]."""
    m, k = xs.shape
    nb = m // block_m
    e, _, n4 = qweight.shape
    n_pad = 4 * n4
    g = scales.shape[1]
    group_size = k // g
    lanes = _lanes(n4)
    sb = PAIRS * lanes

    bk = _pick_bk(k, group_size, lanes)
    if bk is None:
        raise ValueError(f"unsupported K={k} for grouped kernel")
    nk = k // bk
    bg = bk // group_size

    sc4 = scales.astype(jnp.float32).reshape(e, nk, bg, n_pad)

    in_specs = [
        pl.BlockSpec((block_m, bk), lambda i, j, kk, be: (i, kk)),
        pl.BlockSpec((1, bk // 2, lanes),
                     lambda i, j, kk, be: (be[i], kk, j)),
        pl.BlockSpec((1, 1, bg, sb), lambda i, j, kk, be: (be[i], kk, 0, j)),
    ]
    operands = [xs, qweight, sc4]
    if qzeros is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, bg // 2, lanes),
                         lambda i, j, kk, be: (be[i], kk, 0, j)))
        operands.append(qzeros.reshape(e, nk, bg // 2, n4))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, n_pad // sb, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, sb), lambda i, j, kk, be: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, PAIRS, lanes), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, nk=nk, group_size=group_size, lanes=lanes),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n_pad), xs.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(block_expert, *operands)
    return out[:, :out_features]


def grouped_supported(k: int, n4: int, g: int) -> bool:
    group_size = k // g
    lanes = _lanes(n4)
    return (
        k % group_size == 0
        and n4 % lanes == 0
        and lanes % 8 == 0
        and g % 2 == 0
        and _pick_bk(k, group_size, lanes) is not None
    )


def moe_mlp(
    cfg,
    stacked: Dict[str, Dict[str, jax.Array]],
    x: jax.Array,  # [T, H]
    topw: jax.Array,  # [T, k] routing weights (already scaled/normed)
    topi: jax.Array,  # [T, k] expert ids
    hidden_act: str,
    intermediate: int,
    interpret: bool = False,
) -> jax.Array:
    """Routed expert MLP over stacked int4 weights -> [T, H]."""
    from autoawq_tpu.nn.modules import act_fn

    t, h = x.shape
    k = topi.shape[1]
    gu, dn = stacked["gate_up_proj"], stacked["down_proj"]
    e = gu["qweight"].shape[0]

    bm = pick_block_m(t * k, e)
    gather_idx, block_expert = moe_align(topi, e, block_m=bm)
    xz = jnp.concatenate([x, jnp.zeros((1, h), x.dtype)], axis=0)
    xs = xz[jnp.minimum(gather_idx // k, t)]  # sentinel -> zero row

    g2 = grouped_awq_matmul_pallas(
        xs, block_expert, gu["qweight"], gu["scales"], gu.get("qzeros"),
        out_features=2 * intermediate, block_m=bm, interpret=interpret,
    )
    hmid = (act_fn(hidden_act, g2[:, :intermediate])
            * g2[:, intermediate:]).astype(x.dtype)
    y = grouped_awq_matmul_pallas(
        hmid, block_expert, dn["qweight"], dn["scales"], dn.get("qzeros"),
        out_features=h, block_m=bm, interpret=interpret,
    )
    w_flat = jnp.concatenate(
        [topw.reshape(-1).astype(jnp.float32), jnp.zeros((1,), jnp.float32)]
    )
    contrib = y.astype(jnp.float32) * w_flat[
        jnp.minimum(gather_idx, t * k)][:, None]
    tok = jnp.minimum(gather_idx // k, t)  # sentinel rows -> extra bucket
    out = jnp.zeros((t + 1, h), jnp.float32).at[tok].add(contrib)
    return out[:t].astype(x.dtype)
