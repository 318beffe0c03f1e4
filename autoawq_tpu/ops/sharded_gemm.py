"""GSPMD-aware fused int4 matmul: the Pallas kernel at tensor-parallel speed.

A bare ``pallas_call`` is opaque to the partitioner — under pjit with
Megatron-sharded weights XLA would all-gather the packed int4 tensors onto
every chip before calling it, which is exactly the traffic 4-bit weights are
supposed to eliminate. This module wraps the kernel in
``jax.experimental.custom_partitioning`` so the partitioner instead runs the
kernel **on each chip's local shard**:

* column-parallel (qweight sharded on packed lanes at superblock
  granularity; q/k/v/gate/up/lm_head): every chip computes its own slice of
  the output features — no collective at all; the output stays sharded on
  the feature dim.
* row-parallel (qweight sharded on packed K-rows; o/down): every chip
  contracts its K-slice and a single ``psum`` over the tensor axis finishes
  the matmul — the one collective Megatron TP requires.

This replaces the reference's multi-GPU story (accelerate's layer-pipeline,
awq/models/base.py:453-458 + per-layer activation hops,
awq/modules/fused/model.py:98-100) with XLA collectives over ICI.

Sharding layout contracts (mirrors parallel/specs.py):
  qweight [K/2, N4]   col: N4 % (tp*lane_block) == 0 -> P(None, tp)
                      row: (K/2) % tp == 0, K/tp % 2g == 0 -> P(tp, None)
  scales  [G, N_pad]  col: P(None, tp)   row: P(tp, None) (G/tp groups)
  qzeros  [G2, N4]    col: P(None, tp)   row: P(tp, None) (G/tp even)
  x       [M, K]      col: K replicated  row: P(..., tp) (reshard is free
                      when the previous layer was column-parallel)

If a *local* shard falls outside the fused kernel's tiling the lower fn
degrades to the jnp dequant+matmul on the shard — still avoiding the
all-gather, which dominates the cost.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _local_matmul(x, qw, sc, qz, interpret: bool):
    """Per-shard matmul: fused Pallas kernel when the local tiling allows,
    jnp dequant+matmul otherwise. Returns the full padded width."""
    from autoawq_tpu.ops import gemm, pallas_gemm

    n_pad = sc.shape[1]
    group_size = 2 * qw.shape[0] // sc.shape[0]
    if pallas_gemm.supported(x, qw, group_size):
        return pallas_gemm.awq_matmul_pallas(
            x, qw, sc, qz, out_features=n_pad, interpret=interpret)
    w = gemm.dequantize_planar(qw, sc, qz, dtype=x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def _norm_spec(sharding, ndim: int) -> Tuple:
    spec = tuple(getattr(sharding, "spec", ()) or ())
    return spec + (None,) * (ndim - len(spec))


def _classify(qw_spec, sc_spec) -> Tuple[str, Optional[str]]:
    """-> (kind, tensor_axis). kind: 'col' | 'row' | 'rep'."""
    if qw_spec[1] is not None or sc_spec[1] is not None:
        if qw_spec[0] is not None or sc_spec[0] is not None:
            raise NotImplementedError(
                "2-D sharding of a packed int4 weight is not supported")
        return "col", qw_spec[1] or sc_spec[1]
    if qw_spec[0] is not None or sc_spec[0] is not None:
        return "row", qw_spec[0] or sc_spec[0]
    return "rep", None


def _partition_impl(has_zeros: bool, interpret: bool, mesh, arg_shapes,
                    result_shape):
    shardings = [a.sharding for a in arg_shapes]
    x_spec = _norm_spec(shardings[0], 2)
    qw_spec = _norm_spec(shardings[1], 2)
    sc_spec = _norm_spec(shardings[2], 2)
    kind, axis = _classify(qw_spec, sc_spec)

    # defensive downgrade: if the layout contract can't divide over the
    # axis (a spec rule slipped through), run replicated — an all-gather
    # is slow but correct. parallel/specs.py never produces this.
    if axis is not None:
        tp = mesh.shape[axis]
        k2, n4 = arg_shapes[1].shape
        g = arg_shapes[2].shape[0]
        if kind == "col" and n4 % (tp * 256) != 0:
            kind, axis = "rep", None
        elif kind == "row" and (k2 % tp != 0 or g % (2 * tp) != 0):
            kind, axis = "rep", None

    # batch (M) sharding of the activations is preserved as-is unless it
    # collides with the tensor axis
    m_axis = x_spec[0] if x_spec[0] != axis else None

    if kind == "row":
        w_sharding = NamedSharding(mesh, P(axis, None))
        arg_shardings = [NamedSharding(mesh, P(m_axis, axis)), w_sharding,
                         w_sharding]
        out_sharding = NamedSharding(mesh, P(m_axis, None))

        def lower(x, qw, sc, qz=None):
            return jax.lax.psum(_local_matmul(x, qw, sc, qz, interpret), axis)

    else:  # col or rep
        col_axis = axis if kind == "col" else None
        w_sharding = NamedSharding(mesh, P(None, col_axis))
        arg_shardings = [NamedSharding(mesh, P(m_axis, None)), w_sharding,
                         w_sharding]
        out_sharding = NamedSharding(mesh, P(m_axis, col_axis))

        def lower(x, qw, sc, qz=None):
            return _local_matmul(x, qw, sc, qz, interpret)

    if has_zeros:
        arg_shardings.append(w_sharding)
    return mesh, lower, out_sharding, tuple(arg_shardings)


def _infer_impl(has_zeros: bool, interpret: bool, mesh, arg_shapes,
                result_shape):
    shardings = [a.sharding for a in arg_shapes]
    x_spec = _norm_spec(shardings[0], 2)
    qw_spec = _norm_spec(shardings[1], 2)
    sc_spec = _norm_spec(shardings[2], 2)
    kind, axis = _classify(qw_spec, sc_spec)
    m_axis = x_spec[0] if x_spec[0] != axis else None
    return NamedSharding(mesh, P(m_axis, axis if kind == "col" else None))


@functools.lru_cache(maxsize=None)
def _build(has_zeros: bool, interpret: bool):
    """One custom_partitioning op per (zeros?, interpret?) variant.

    The shardy rule links out[0] to x[0] (batch) and out[1] to scales[1]
    (features, same padded size) — qweight/qzeros dims are private factors
    because their packed sizes differ from the logical ones. The partition
    callback enforces the full layout contract and inserts the row-parallel
    psum.
    """
    # the inner fn is what actually runs when the op is NOT partitioned
    # (single device / no mesh), so it must be the fast local path too
    if has_zeros:

        def fn(x, qw, sc, qz):
            return _local_matmul(x, qw, sc, qz, interpret)

        rule = "m k, k2 n4, g n, g2 n42 -> m n"
    else:

        def fn(x, qw, sc):
            return _local_matmul(x, qw, sc, None, interpret)

        rule = "m k, k2 n4, g n -> m n"

    op = custom_partitioning(fn)
    op.def_partition(
        partition=functools.partial(_partition_impl, has_zeros, interpret),
        infer_sharding_from_operands=functools.partial(
            _infer_impl, has_zeros, interpret),
        sharding_rule=rule,
    )
    return op


def awq_matmul_sharded(
    x: jax.Array,
    qweight: jax.Array,
    scales: jax.Array,
    qzeros: Optional[jax.Array] = None,
    *,
    out_features: int,
    bias: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """``x @ dequant(qweight)[:, :out_features] (+ bias)`` — partitioner-
    aware fused kernel. Drop-in for ``awq_matmul_pallas`` under pjit."""
    orig_shape = x.shape
    x2 = x.reshape(-1, x.shape[-1])
    op = _build(qzeros is not None, interpret)
    y = op(x2, qweight, scales, qzeros) if qzeros is not None else op(
        x2, qweight, scales)
    n_pad = scales.shape[1]
    if out_features != n_pad:
        y = y[:, :out_features]
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.reshape(*orig_shape[:-1], out_features)
