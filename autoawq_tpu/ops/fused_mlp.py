"""Fused decode-MLP megakernel: gate_up GEMM -> act·mul -> down GEMM in ONE
pallas_call.

Motivation (measured, STATUS.md round 2): on this hardware each
``pallas_call`` boundary drains Mosaic's automatic DMA pipeline — many small
kernels lose wall-clock that per-op device-time sums don't show. Decode
(M<=8 rows) launches 4 kernels per decoder layer; this module folds the two
MLP launches plus the XLA activation between them into one, so the int4
weight stream for gate_up and down flows through a single uninterrupted
pipeline. The reference splits these across ``gemm_forward_cuda`` calls with
a torch op between (awq/modules/fused/mlp.py:46-70); fusing across the
activation is only possible because the whole [M, 2*inter] intermediate fits
VMEM at decode batch sizes.

Design:
* 1-D grid of ``S1 + S2`` steps (S1 = gate_up column superblocks, S2 = down
  superblocks), "arbitrary" semantics. Steps < S1 compute [M, SB] gate_up
  tiles (full-K dot, same paired magic-number extraction as
  ops/pallas_gemm.py) into a VMEM scratch; step S1 applies act(g)*u; steps
  >= S1 stream the down weights against the activated intermediate.
* Block index maps clamp into their own phase (min/max against S1), so each
  operand's index is *constant* during the other phase and Mosaic's
  revolving-buffer pipeline fetches nothing.
* Requires full-K blocks for both matmuls (qweight slab <= ~8 MB — true
  through 13B-class shapes); larger models fall back to the per-linear
  kernels.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from autoawq_tpu.ops.pallas_gemm import PAIRS, _extract_pair, _lanes

M_MAX = 32  # decode-size row cap: the [M, 2*inter] f32 scratch must fit VMEM
QW_SLAB_MAX = 8 * 1024 * 1024  # full-K qweight slab cap (per matmul)


def _tile_dot(x, q, s_all, qz, group_size: int, lanes: int):
    """Full-K [BM, K] x one packed column superblock -> [BM, PAIRS*lanes].

    Same group-factored scaling as ops/pallas_gemm.py:_kernel; ``qz=None``
    is the symmetric (constant zero-point 8 -> bias 384) fast path.
    """
    bm, k = x.shape
    bg = k // group_size
    xg = x.reshape(bm, bg, group_size).swapaxes(0, 1)  # [BG, BM, gs]
    xsum = jnp.sum(xg.astype(jnp.float32), axis=2)[:, :, None]
    outs = []
    for p in range(PAIRS):
        wbf = _extract_pair(q, p)  # [K, lanes]
        partial = jax.lax.dot_general(
            xg, wbf.reshape(bg, group_size, lanes),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [BG, BM, lanes]
        if qz is None:
            corrected = partial - 384.0 * xsum
        else:
            zbf = _extract_pair(qz, p).astype(jnp.float32)  # [BG, lanes]
            corrected = partial - zbf[:, None, :] * xsum
        s = s_all[:, p * lanes : (p + 1) * lanes] * 0.0625
        outs.append(jnp.sum(s[:, None, :] * corrected, axis=0))  # [BM, L]
    return jnp.concatenate(outs, axis=1)  # logical cols p*lanes+lane


def _act(name: str, g: jax.Array) -> jax.Array:
    if name == "silu":
        return g * jax.nn.sigmoid(g)
    if name in ("gelu", "gelu_new", "gelu_pytorch_tanh", "gelu_fast"):
        return jax.nn.gelu(g, approximate=name != "gelu")
    raise ValueError(f"unsupported activation {name!r}")


def _kernel(x_ref, qw1_ref, sc1_ref, qw2_ref, sc2_ref, *rest,
            s1: int, g1: int, g2: int, l1: int, l2: int, inter: int,
            act: str):
    """rest = [qz1_ref][, qz2_ref], out_ref, gu_scr, h_scr (zeros refs
    present per-matmul only for asymmetric quantization)."""
    it = iter(rest)
    qz1_ref = next(it) if g1 > 0 else None
    qz2_ref = next(it) if g2 > 0 else None
    out_ref, gu_scr, h_scr = it

    t = pl.program_id(0)
    sb1 = PAIRS * l1

    @pl.when(t < s1)
    def _gate_up():
        tile = _tile_dot(x_ref[:], qw1_ref[:], sc1_ref[0],
                         None if qz1_ref is None else qz1_ref[0],
                         x_ref.shape[1] // sc1_ref.shape[1], l1)
        gu_scr[:, pl.ds(t * sb1, sb1)] = tile

    @pl.when(t >= s1)
    def _down():
        @pl.when(t == s1)
        def _activate():
            g = gu_scr[:, :inter]
            u = gu_scr[:, inter : 2 * inter]
            h_scr[:] = _act(act, g) * u

        tile = _tile_dot(h_scr[:].astype(x_ref.dtype), qw2_ref[:],
                         sc2_ref[0],
                         None if qz2_ref is None else qz2_ref[0],
                         inter // sc2_ref.shape[1], l2)
        out_ref[:] = tile.astype(out_ref.dtype)


def supported(x: jax.Array, gu: Dict[str, Any], dn: Dict[str, Any],
              inter: int, hidden_act: str) -> bool:
    """Shape/size gate for the fused decode MLP."""
    if not ("qweight" in gu and "qweight" in dn):
        return False
    if "lora_a" in gu or "lora_b" in gu or "lora_a" in dn:
        return False
    if hidden_act not in ("silu", "gelu", "gelu_new", "gelu_pytorch_tanh",
                          "gelu_fast"):
        return False
    m = 1
    for d in x.shape[:-1]:
        m *= d
    h = x.shape[-1]
    qw1, sc1 = gu["qweight"], gu["scales"]
    qw2, sc2 = dn["qweight"], dn["scales"]
    n1p, n2p = 4 * qw1.shape[1], 4 * qw2.shape[1]
    l1, l2 = _lanes(qw1.shape[1]), _lanes(qw2.shape[1])
    g1, g2 = sc1.shape[0], sc2.shape[0]
    return (
        m <= M_MAX
        and 2 * qw1.shape[0] == h
        and 2 * qw2.shape[0] == inter
        and h % (2 * g1) == 0 and g1 % 2 == 0  # even group count (zeros pairs)
        and inter % (2 * g2) == 0 and g2 % 2 == 0
        and n1p % (PAIRS * l1) == 0 and l1 % 8 == 0
        and n2p % (PAIRS * l2) == 0 and l2 % 8 == 0
        and inter % 128 == 0  # lane-aligned g/u split of the VMEM scratch
        and 2 * inter <= n1p  # logical gate|up both inside the packed width
        and qw1.size * 4 <= QW_SLAB_MAX * (n1p // (PAIRS * l1))
        and qw2.size * 4 <= QW_SLAB_MAX * (n2p // (PAIRS * l2))
    )


@functools.partial(
    jax.jit, static_argnames=("inter", "out_features", "act", "interpret"))
def fused_mlp_pallas(
    x: jax.Array,
    gu_qweight: jax.Array,
    gu_scales: jax.Array,
    dn_qweight: jax.Array,
    dn_scales: jax.Array,
    gu_qzeros: Optional[jax.Array] = None,
    dn_qzeros: Optional[jax.Array] = None,
    *,
    inter: int,
    out_features: int,
    act: str = "silu",
    interpret: bool = False,
) -> jax.Array:
    """``down(act(gate(x)) * up(x))`` in one kernel. x: [..., H]."""
    orig_shape = x.shape
    h = x.shape[-1]
    x2 = x.reshape(-1, h)
    m = x2.shape[0]
    bm = max(8, m)  # sublane-1 blocks lower to a catastrophically slow path
    if bm != m:
        x2 = jnp.pad(x2, ((0, bm - m), (0, 0)))

    n4_1, n4_2 = gu_qweight.shape[1], dn_qweight.shape[1]
    n1p, n2p = 4 * n4_1, 4 * n4_2
    l1, l2 = _lanes(n4_1), _lanes(n4_2)
    sb1, sb2 = PAIRS * l1, PAIRS * l2
    s1, s2 = n1p // sb1, n2p // sb2
    g1, g2 = gu_scales.shape[0], dn_scales.shape[0]

    def clamp1(t):
        return jnp.minimum(t, s1 - 1)

    def clamp2(t):
        return jnp.maximum(t - s1, 0)

    in_specs = [
        pl.BlockSpec((bm, h), lambda t: (0, 0)),
        pl.BlockSpec((h // 2, l1), lambda t: (0, clamp1(t))),
        pl.BlockSpec((1, g1, sb1), lambda t: (0, 0, clamp1(t))),
        pl.BlockSpec((inter // 2, l2), lambda t: (0, clamp2(t))),
        pl.BlockSpec((1, g2, sb2), lambda t: (0, 0, clamp2(t))),
    ]
    operands = [
        x2, gu_qweight,
        gu_scales.astype(jnp.float32).reshape(1, g1, n1p),
        dn_qweight,
        dn_scales.astype(jnp.float32).reshape(1, g2, n2p),
    ]
    if gu_qzeros is not None:
        in_specs.append(pl.BlockSpec((1, g1 // 2, l1),
                                     lambda t: (0, 0, clamp1(t))))
        operands.append(gu_qzeros.reshape(1, g1 // 2, n4_1))
    if dn_qzeros is not None:
        in_specs.append(pl.BlockSpec((1, g2 // 2, l2),
                                     lambda t: (0, 0, clamp2(t))))
        operands.append(dn_qzeros.reshape(1, g2 // 2, n4_2))

    out = pl.pallas_call(
        functools.partial(
            _kernel, s1=s1,
            g1=g1 if gu_qzeros is not None else 0,
            g2=g2 if dn_qzeros is not None else 0,
            l1=l1, l2=l2, inter=inter, act=act),
        grid=(s1 + s2,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, sb2), lambda t: (0, clamp2(t))),
        out_shape=jax.ShapeDtypeStruct((bm, n2p), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, n1p), jnp.float32),
            pltpu.VMEM((bm, inter), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * (h * n1p + inter * n2p),
            bytes_accessed=(bm * h * 2 + h * n4_1 * 2 + inter * n4_2 * 2
                            + bm * n2p * 2),
            transcendentals=bm * inter,
        ),
        interpret=interpret,
    )(*operands)

    y = out[:m, :out_features]
    return y.reshape(*orig_shape[:-1], out_features)
