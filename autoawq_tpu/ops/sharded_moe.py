"""Expert-parallel grouped MoE matmul (GSPMD-aware).

Shards the stacked ``[E, ...]`` int4 expert tensors on the ``expert`` mesh
axis and runs the grouped Pallas kernel (ops/moe_gemm.py) on each chip's
local experts. Scheme: tokens (and their routing) are visible on every
expert shard; each shard masks the routing table down to its own expert
range, computes those experts' contributions with the grouped kernel, and
a single ``psum`` over the expert axis sums the per-shard partial outputs.
No tokens are dropped and all shapes stay static — the ragged all-to-all
variant (ops/moe_a2a.py: dispatch tokens to their expert's chip) trades
this scheme's replicated activation reads for 2x entry-row exchanges and
capacity-factor drops. MEASURED A/B (scripts/measure_ep_moe.py ->
EP_MOE_AB.json, 8-shard mesh, top-2): at prefill scale (512-4096 tokens)
a2a moves 3x fewer per-shard activation bytes (2*(T/D)*k*cf*H vs T*k*H +
psum) and is 10-43% faster in wall time even on the CPU mesh; this
replicate+psum scheme remains the right decode choice, where T*k is tiny,
weight streaming dominates, and a2a's two serialized exchanges sit on the
latency path. Serving-side prefill can opt into a2a via moe_mlp_a2a.

Replaces the reference's single-GPU fused MoE (awq/modules/fused/moe.py)
+ accelerate layer-pipeline with in-layer expert parallelism it never had
(SURVEY §2.6's table names this a first-class TPU-native component).

Like ops/sharded_gemm.py this is a ``custom_partitioning`` op: unsharded
(single chip) it lowers straight to the grouped kernel; expert-sharded it
lowers to the masked-local-experts + psum form.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _run_local(x, topw, topi, ws, has_z, act, inter, interpret):
    from autoawq_tpu.ops import moe_gemm

    if has_z:
        gu = {"qweight": ws[0], "scales": ws[1], "qzeros": ws[2]}
        dn = {"qweight": ws[3], "scales": ws[4], "qzeros": ws[5]}
    else:
        gu = {"qweight": ws[0], "scales": ws[1]}
        dn = {"qweight": ws[2], "scales": ws[3]}
    return moe_gemm.moe_mlp(None, {"gate_up_proj": gu, "down_proj": dn},
                            x, topw, topi, act, inter, interpret=interpret)


def _partition_impl(has_z, act, inter, interpret, mesh, arg_shapes,
                    result_shape):
    x_spec = tuple(arg_shapes[0].sharding.spec or ()) + (None,) * 2
    w_spec = tuple(arg_shapes[3].sharding.spec or ()) + (None,) * 3
    axis = w_spec[0]
    m_axis = x_spec[0] if x_spec[0] != axis else None
    n_w = len(arg_shapes) - 3

    tok_sharding = NamedSharding(mesh, P(m_axis, None))
    w_sharding = NamedSharding(mesh, P(axis, None, None))
    arg_shardings = (tok_sharding, tok_sharding, tok_sharding) + (
        w_sharding,) * n_w
    out_sharding = NamedSharding(mesh, P(m_axis, None))

    if axis is None:
        def lower(x, topw, topi, *ws):
            return _run_local(x, topw, topi, ws, has_z, act, inter, interpret)
    else:
        def lower(x, topw, topi, *ws):
            local_e = ws[0].shape[0]
            off = jax.lax.axis_index(axis) * local_e
            mine = (topi >= off) & (topi < off + local_e)
            topi_l = jnp.where(mine, topi - off, 0)
            topw_l = jnp.where(mine, topw, 0.0)
            out = _run_local(x, topw_l, topi_l, ws, has_z, act, inter,
                             interpret)
            return jax.lax.psum(out, axis)

    return mesh, lower, out_sharding, arg_shardings


def _infer_impl(has_z, act, inter, interpret, mesh, arg_shapes, result_shape):
    x_spec = tuple(arg_shapes[0].sharding.spec or ()) + (None,) * 2
    w_spec = tuple(arg_shapes[3].sharding.spec or ()) + (None,) * 3
    m_axis = x_spec[0] if x_spec[0] != w_spec[0] else None
    return NamedSharding(mesh, P(m_axis, None))


@functools.lru_cache(maxsize=None)
def _build(has_z: bool, act: str, inter: int, interpret: bool):
    if has_z:
        def fn(x, topw, topi, gq, gs, gz, dq, ds, dz):
            return _run_local(x, topw, topi, (gq, gs, gz, dq, ds, dz),
                              True, act, inter, interpret)

        rule = "t h, t k1, t k2, e1 a1 b1, e2 a2 b2, e3 a3 b3, " \
               "e4 a4 b4, e5 a5 b5, e6 a6 b6 -> t h"
    else:
        def fn(x, topw, topi, gq, gs, dq, ds):
            return _run_local(x, topw, topi, (gq, gs, dq, ds), False, act,
                              inter, interpret)

        rule = "t h, t k1, t k2, e1 a1 b1, e2 a2 b2, e4 a4 b4, " \
               "e5 a5 b5 -> t h"

    op = custom_partitioning(fn)
    op.def_partition(
        partition=functools.partial(_partition_impl, has_z, act, inter,
                                    interpret),
        infer_sharding_from_operands=functools.partial(
            _infer_impl, has_z, act, inter, interpret),
        sharding_rule=rule,
    )
    return op


def moe_mlp_sharded(stacked, x, topw, topi, hidden_act: str,
                    intermediate: int, interpret: bool = False):
    """Drop-in for ops/moe_gemm.moe_mlp that survives GSPMD partitioning.
    stacked: {"gate_up_proj": {qweight, scales[, qzeros]}, "down_proj": ...}
    """
    gu, dn = stacked["gate_up_proj"], stacked["down_proj"]
    has_z = "qzeros" in gu
    if has_z != ("qzeros" in dn):  # mixed sym/asym projections: no wrapper
        from autoawq_tpu.ops import moe_gemm

        return moe_gemm.moe_mlp(None, stacked, x, topw, topi, hidden_act,
                                intermediate, interpret=interpret)
    op = _build(has_z, hidden_act, intermediate, interpret)
    if has_z:
        return op(x, topw, topi, gu["qweight"], gu["scales"], gu["qzeros"],
                  dn["qweight"], dn["scales"], dn["qzeros"])
    return op(x, topw, topi, gu["qweight"], gu["scales"],
              dn["qweight"], dn["scales"])
