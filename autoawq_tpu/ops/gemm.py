"""W4A16 linear ops on the TPU planar layout.

Two interchangeable implementations of the same math:

* :func:`awq_matmul_jnp` — pure-jnp dequantize -> matmul. Runs on any backend
  (CPU tests, numerics oracle) and is the analogue of the reference's
  kernel-free fallback (awq/utils/packing_utils.py:87 ``dequantize_gemm``).
* :func:`awq_matmul` — dispatcher that routes to the fused Pallas kernel on
  TPU (ops/pallas_gemm.py) when shapes allow, else the jnp path. The fused
  kernel is the analogue of ``awq_ext.gemm_forward_cuda``
  (awq/modules/linear/gemm.py:47-58) re-designed for the MXU.

The planar int4 layout is defined in core/packing.py. All ops take the packed
triple (qweight [K, N_pad//8] int32, scales [G, N_pad] float, qzeros
[G, N_pad//8] int32) and the *logical* ``out_features`` N, returning
``x @ dequant(W)[:, :N] (+ bias)``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def unpack_int4_planar(packed: jax.Array) -> jax.Array:
    """int32 [R/2, C4] planar row-paired -> int32 [R, 4*C4] logical nibbles.

    jnp twin of core.packing.unpack_planar (that one is numpy, host-side).
    Layout: nibble (p + 4h) of word (r, c) holds logical element
    (row 2r + h, col b*L*4 ... p*L + c) — see core/packing.py.
    """
    r2, c4 = packed.shape
    # superblock lane count: 256 when C4 is a multiple of 256 (N_pad % 1024
    # == 0), else the whole row is one superblock (small-N case).
    lb = 256 if c4 % 256 == 0 and c4 >= 256 else c4
    w = packed.astype(jnp.uint32).reshape(r2, 1, 1, c4 // lb, 1, lb)
    shifts = (
        jnp.arange(4, dtype=jnp.uint32).reshape(1, 1, 1, 1, 4, 1) * 4
        + jnp.arange(2, dtype=jnp.uint32).reshape(1, 2, 1, 1, 1, 1) * 16
    )
    nibbles = ((w >> shifts) & 0xF).astype(jnp.int32)  # [R/2, h, 1, B, p, L]
    return nibbles.reshape(2 * r2, 4 * c4)


@jax.jit
def pack_planar_jnp(q4: jax.Array) -> jax.Array:
    """int [R, N] (0..15) -> int32 [ceil(R/2), N_pad // 4] planar row-paired.

    Device-side twin of core.packing.pack_planar (bit-identical output,
    tested) — packs ON the accelerator so the quantizer never round-trips
    nibble tensors to the host. Through a remote-device tunnel that
    round-trip (int32 nibbles down, packed up: ~1 GB/layer at 7B) was the
    dominant cost of the whole quantization pass."""
    from autoawq_tpu.core.packing import lane_block, padded_out_features

    r, n = q4.shape
    if r % 2:
        q4 = jnp.concatenate([q4, jnp.zeros((1, n), q4.dtype)], axis=0)
        r += 1
    n_pad = padded_out_features(n)
    lb = lane_block(n_pad)
    q = q4.astype(jnp.uint32) & 0xF
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n)))
    q = q.reshape(r // 2, 2, n_pad // (4 * lb), 4, lb)
    shifts = (4 * jnp.arange(4, dtype=jnp.uint32).reshape(1, 1, 1, 4, 1)
              + 16 * jnp.arange(2, dtype=jnp.uint32).reshape(1, 2, 1, 1, 1))
    # disjoint bit ranges: sum over the (h, p) axes == bitwise or
    words = (q << shifts).sum(axis=(1, 3), dtype=jnp.uint32)
    return jax.lax.bitcast_convert_type(
        words.reshape(r // 2, n_pad // 4), jnp.int32)


@jax.jit
def pad_scales_jnp(scales: jax.Array) -> jax.Array:
    """Device twin of core.packing.pad_scales_planar: [G, N] -> [G, N_pad]
    float32, padded columns get scale 1.0."""
    from autoawq_tpu.core.packing import padded_out_features

    g, n = scales.shape
    n_pad = padded_out_features(n)
    scales = scales.astype(jnp.float32)
    if n_pad == n:
        return scales
    return jnp.pad(scales, ((0, 0), (0, n_pad - n)), constant_values=1.0)


@partial(jax.jit, static_argnames=("group_size",))
def pad_k_nibbles_jnp(q4, scales, z4, *, group_size: int):
    """Device twin of core.packing.pad_k_nibbles (same exactness argument:
    pad rows dequantize to 0)."""
    from autoawq_tpu.core.packing import padded_in_features

    k = q4.shape[0]
    k_pad = padded_in_features(k, group_size)
    if k_pad == k:
        return q4, scales, z4
    q4 = jnp.concatenate(
        [q4, jnp.full((k_pad - k, q4.shape[1]), 8, q4.dtype)])
    g_pad = k_pad // group_size - scales.shape[0]
    scales = jnp.concatenate(
        [scales, jnp.ones((g_pad, scales.shape[1]), scales.dtype)])
    if z4 is not None:
        z4 = jnp.concatenate(
            [z4, jnp.full((g_pad, z4.shape[1]), 8, z4.dtype)])
    return q4, scales, z4


@partial(jax.jit, static_argnames=("out_features", "dtype"))
def dequantize_planar(
    qweight: jax.Array,
    scales: jax.Array,
    qzeros: Optional[jax.Array] = None,
    *,
    out_features: Optional[int] = None,
    dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """Packed planar triple -> dense weight [K, out_features or N_pad].

    ``qzeros=None`` means symmetric quantization (constant zero-point 8).
    """
    k = 2 * qweight.shape[0]  # row-paired packing
    n_pad = scales.shape[1]
    g = scales.shape[0]
    group_size = k // g
    q = unpack_int4_planar(qweight).astype(jnp.float32)[:k]  # [K, N_pad]
    if qzeros is None:
        z = jnp.full((g, n_pad), 8.0, jnp.float32)
    else:
        # odd G gets a pad row at pack time — strip it
        z = unpack_int4_planar(qzeros).astype(jnp.float32)[:g]  # [G, N_pad]
    s = scales.astype(jnp.float32)
    w = (q.reshape(g, group_size, n_pad) - z[:, None, :]) * s[:, None, :]
    w = w.reshape(k, n_pad).astype(dtype)
    if out_features is not None and out_features != n_pad:
        w = w[:, :out_features]
    return w


def awq_matmul_jnp(
    x: jax.Array,
    qweight: jax.Array,
    scales: jax.Array,
    qzeros: jax.Array,
    *,
    out_features: int,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference-path W4A16 matmul: dequantize then matmul (XLA-fused)."""
    x = _pad_x_k(x, qweight)
    w = dequantize_planar(
        qweight, scales, qzeros, out_features=None, dtype=x.dtype
    )
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    n_pad = scales.shape[1]
    if out_features != n_pad:
        y = y[..., :out_features]
    y = y.astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _awq_matmul_vjp(x, qweight, scales, qzeros, out_features, method):
    return _awq_matmul_impl(x, qweight, scales, qzeros, out_features, method)


# NOTE on the reference's M>=1024 dequant-then-matmul heuristic
# (awq/modules/linear/gemm.py:48-58): measured on one v5e chip the XLA
# dequant+matmul path IS faster at large M (M=4096: 78 vs 47 TFLOP/s) —
# but it is NOT memory-safe: XLA keeps several layers' dequantized bf16
# weight temps alive across an unrolled forward, and a 7B ctx2048 prefill
# OOMs a 16 GB chip (24.3 GB requested). The fused kernel instead gets a
# weights-stationary large-M mode (ops/pallas_gemm.py: extract once into
# VMEM scratch, stream M tiles innermost) — same fix, no HBM blowup.


def _pad_x_k(x: jax.Array, qweight: jax.Array) -> jax.Array:
    """Zero-pad x's contraction dim up to the packed K (K-padded layouts:
    core/packing.pad_k_nibbles — the pad rows dequantize to exactly 0, so
    zero x-padding keeps the matmul AND the per-group zero-point
    correction bit-exact; non-padded layouts pass through untouched)."""
    k_pad = 2 * qweight.shape[0]
    if x.shape[-1] == k_pad:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, k_pad - x.shape[-1])])


def _awq_matmul_impl(x, qweight, scales, qzeros, out_features, method):
    x = _pad_x_k(x, qweight)
    if method != "jnp":
        from autoawq_tpu.ops import pallas_gemm, sharded_gemm

        on_tpu = jax.default_backend() == "tpu"
        fits = pallas_gemm.supported(
            x, qweight, 2 * qweight.shape[0] // scales.shape[0])
        if method == "pallas_direct":
            # manual-parallel context (shard_map stage body, parallel/
            # pipeline.py): operands are already per-chip local shards, so
            # run the kernel directly — the custom_partitioning wrapper
            # below is a GSPMD construct and is ill-defined here
            if fits:
                return pallas_gemm.awq_matmul_pallas(
                    x, qweight, scales, qzeros, out_features=out_features,
                    interpret=not on_tpu)
            return awq_matmul_jnp(x, qweight, scales, qzeros,
                                  out_features=out_features)
        if method == "pallas" or (method == "auto" and fits and on_tpu):
            if method == "auto" and jax.device_count() == 1:
                # single chip: call the kernel directly — no partitioner
                # wrapper in the way
                return pallas_gemm.awq_matmul_pallas(
                    x, qweight, scales, qzeros, out_features=out_features)
            # multi-device (or forced "pallas"): partitioner-aware wrapper —
            # under pjit with Megatron-sharded weights each chip runs the
            # fused kernel on its local shard (+ psum for row-parallel)
            # instead of all-gathering int4 weights (ops/sharded_gemm.py).
            # interpret=True lets the CPU mesh (tests, dryrun) execute the
            # same path.
            return sharded_gemm.awq_matmul_sharded(
                x, qweight, scales, qzeros, out_features=out_features,
                interpret=not on_tpu,
            )
    return awq_matmul_jnp(
        x, qweight, scales, qzeros, out_features=out_features
    )


def _awq_matmul_fwd(x, qweight, scales, qzeros, out_features, method):
    y = _awq_matmul_impl(x, qweight, scales, qzeros, out_features, method)
    return y, (x, qweight, scales, qzeros)


def _awq_matmul_bwd(out_features, method, res, g):
    """dx = g @ W^T via dequantized weights — the PEFT/LoRA training path
    (reference: WQLinearMMFunction.backward, awq/modules/linear/gemm.py:88-114;
    quantized weights are frozen, so no dW)."""
    x, qweight, scales, qzeros = res
    w = dequantize_planar(qweight, scales, qzeros, dtype=g.dtype)
    w = w[:, :out_features]
    dx = jnp.dot(g, w.T, preferred_element_type=jnp.float32).astype(x.dtype)
    # K-padded layouts: the pad rows of w are exactly 0, so the sliced
    # gradient columns are 0 — dropping them matches the zero x-pad
    dx = dx[..., : x.shape[-1]]
    return dx, None, None, None


_awq_matmul_vjp.defvjp(_awq_matmul_fwd, _awq_matmul_bwd)


def awq_matmul(
    x: jax.Array,
    qweight: jax.Array,
    scales: jax.Array,
    qzeros: jax.Array,
    *,
    out_features: int,
    bias: Optional[jax.Array] = None,
    method: str = "auto",
) -> jax.Array:
    """W4A16 matmul dispatcher. ``method``: auto | pallas | jnp.

    auto: fused Pallas kernel on TPU when the shape fits its tiling, else
    the jnp dequant+matmul path. Differentiable wrt ``x`` (custom VJP
    through the dequantized weights) for LoRA-style training on a frozen
    quantized base.
    """
    y = _awq_matmul_vjp(x, qweight, scales, qzeros, out_features, method)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
