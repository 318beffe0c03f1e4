"""Core AWQ quantization math (pure jnp, CPU/TPU-runnable).

Semantics mirror the reference AutoAWQ ``AwqQuantizer.pseudo_quantize_tensor``
(/root/reference/awq/quantize/quantizer.py:74-109), re-expressed for the
TPU-native weight layout: linear kernels are stored ``[K, N]`` = (in_features,
out_features), and quantization groups run along ``K`` (the contraction dim),
so that per-group scales/zeros have shape ``[K // group_size, N]`` and
broadcast along the sublane dimension without transposes.

All statistics run in float32 regardless of the weight dtype; the reference
runs fp16 end-to-end, but on TPU fp32 stats are free and strictly more
accurate (the WikiText-2 ppl gate is measured the same way either way).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class QuantResult(NamedTuple):
    """Integer quantization artifacts for one ``[K, N]`` weight."""

    qweight: jax.Array  # int32 [K, N], values in [0, 2**bits)
    scales: jax.Array   # float32 [K // group_size, N]
    zeros: Optional[jax.Array]  # int32 [K // group_size, N] or None (symmetric)


def _group_reshape(w: jax.Array, group_size: int) -> jax.Array:
    """[K, N] -> [K // g, g, N] grouping along the contraction dim."""
    k, n = w.shape
    if group_size <= 0:
        group_size = k
    if k % group_size != 0:
        raise ValueError(f"K={k} not a multiple of group_size={group_size}")
    return w.reshape(k // group_size, group_size, n)


@partial(jax.jit, static_argnames=("bits", "group_size", "zero_point"))
def quantize_weight(
    w: jax.Array,
    *,
    bits: int = 4,
    group_size: int = 128,
    zero_point: bool = True,
) -> QuantResult:
    """Quantize a ``[K, N]`` weight to integers with per-group scales.

    Asymmetric (zero_point=True):
        scales = (max - min).clip(1e-5) / (2**bits - 1)
        zeros  = clip(round(-min / scales), 0, 2**bits - 1)
        q      = clip(round(w / scales) + zeros, 0, 2**bits - 1)
    Symmetric (zero_point=False):
        scales = absmax.clip(1e-5) / (2**(bits-1) - 1)
        q      = clip(round(w / scales), -(2**(bits-1)), 2**(bits-1) - 1)
                 stored offset by 2**(bits-1) so the packed domain is unsigned.
    """
    w = w.astype(jnp.float32)
    g = _group_reshape(w, group_size)
    if zero_point:
        max_int = 2**bits - 1
        max_val = g.max(axis=1, keepdims=True)
        min_val = g.min(axis=1, keepdims=True)
        scales = jnp.clip(max_val - min_val, min=1e-5) / max_int
        # Materialize scales before the divisions: XLA's algebraic
        # simplifier otherwise rewrites round(x / ((max-min)/15)) into a
        # fused form that loses the last ULP — and clip-search boundaries
        # land EXACTLY on round-half ties (w = ±max_val => w/scales =
        # ±max_int/2), where that ULP flips the quantized integer vs the
        # reference's torch math (tests/test_reference_oracle.py).
        scales = jax.lax.optimization_barrier(scales)
        zeros = jnp.clip(jnp.round(-min_val / scales), 0, max_int)
        q = jnp.clip(jnp.round(g / scales) + zeros, 0, max_int)
        k, n = w.shape
        gs = group_size if group_size > 0 else k
        return QuantResult(
            qweight=q.astype(jnp.int32).reshape(k, n),
            scales=scales.reshape(k // gs, n),
            zeros=zeros.astype(jnp.int32).reshape(k // gs, n),
        )
    else:
        max_int = 2 ** (bits - 1) - 1
        min_int = -(2 ** (bits - 1))
        absmax = jnp.clip(jnp.abs(g).max(axis=1, keepdims=True), min=1e-5)
        scales = absmax / max_int
        scales = jax.lax.optimization_barrier(scales)  # see above
        q = jnp.clip(jnp.round(g / scales), min_int, max_int)
        k, n = w.shape
        gs = group_size if group_size > 0 else k
        # store unsigned with implicit zero = 2**(bits-1)
        q = q - min_int
        return QuantResult(
            qweight=q.astype(jnp.int32).reshape(k, n),
            scales=scales.reshape(k // gs, n),
            zeros=None,
        )


@partial(jax.jit, static_argnames=("bits", "group_size", "zero_point"))
def pseudo_quantize_weight(
    w: jax.Array,
    *,
    bits: int = 4,
    group_size: int = 128,
    zero_point: bool = True,
) -> jax.Array:
    """Fake-quantize: quantize then dequantize, ``[K, N]`` in / ``[K, N]`` out.

    This is the in-search surrogate used by the scale/clip grid searches
    (reference quantizer.py:418-421, 534). Returned in float32.
    """
    q, scales, zeros = quantize_weight(
        w, bits=bits, group_size=group_size, zero_point=zero_point
    )
    return dequantize_weight(q, scales, zeros, bits=bits)


def dequantize_weight(
    qweight: jax.Array,
    scales: jax.Array,
    zeros: Optional[jax.Array],
    *,
    bits: int = 4,
) -> jax.Array:
    """Inverse of :func:`quantize_weight`: int ``[K, N]`` -> float32 ``[K, N]``."""
    k, n = qweight.shape
    n_groups = scales.shape[0]
    group_size = k // n_groups
    q = qweight.astype(jnp.float32).reshape(n_groups, group_size, n)
    if zeros is None:
        z = jnp.float32(2 ** (bits - 1))
        w = (q - z) * scales.astype(jnp.float32)[:, None, :]
    else:
        w = (q - zeros.astype(jnp.float32)[:, None, :]) * scales.astype(
            jnp.float32
        )[:, None, :]
    return w.reshape(k, n)
