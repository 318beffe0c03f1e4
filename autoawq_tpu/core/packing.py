"""int4 bit-packing layouts: the TPU-native *planar* layout and the AutoAWQ
GEMM interop layout.

TPU planar layout
-----------------
A quantized weight ``q4 [K, N]`` (values 0..15) is stored as
``qweight int32 [K, N_pad // 8]`` where ``N_pad`` rounds N up to a multiple of
the superblock size SB (1024 when N >= 1024, else N rounded to a multiple of
8). Within each superblock of SB logical columns (L = SB // 8 packed lanes),
nibble ``i`` (bits 4i..4i+3) of the packed word at lane ``c`` stores logical
column ``b*SB + i*L + c%L`` where ``b = c // L``.

Why: unpacking nibble slot ``i`` of a 128-lane packed tile is then a single
shift+mask producing a *contiguous* 128-lane block of logical output columns
(``[b*SB + i*L, b*SB + (i+1)*L)``). The Pallas dequant-matmul kernel never has
to interleave lanes — each of the 8 sub-tiles feeds the MXU directly and
writes a contiguous slice of the output tile. Zero-points are packed
identically; padded logical columns carry qweight=0, zero=0, scale=1 and are
sliced off after the matmul.

AutoAWQ interop layout (for HF-ecosystem checkpoints)
-----------------------------------------------------
``qweight int32 [K, N // 8]`` with nibble ``i`` of the word at column ``col``
holding logical column ``col*8 + AWQ_ORDER[i]``, AWQ_ORDER = [0,2,4,6,1,3,5,7]
(reference: awq/modules/linear/gemm.py:218-228, awq/utils/packing_utils.py:4-5).
``qzeros`` packs the ``[K//g, N]`` zero-points the same way; ``scales`` is
``float16 [K//g, N]``. Conversions here are bit-exact so checkpoints remain
loadable by vLLM/transformers/AutoAWQ.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

AWQ_ORDER = (0, 2, 4, 6, 1, 3, 5, 7)
REVERSE_AWQ_ORDER = (0, 4, 1, 5, 2, 6, 3, 7)
SUPERBLOCK = 1024  # logical columns per planar superblock (L = 128 lanes)


def padded_out_features(n: int) -> int:
    """N_pad for the planar layout: multiple of 1024 above 1024, else of 8."""
    if n >= SUPERBLOCK:
        return -(-n // SUPERBLOCK) * SUPERBLOCK
    return -(-n // 8) * 8


def lane_block(n_pad: int) -> int:
    """Packed lanes per superblock (L)."""
    return SUPERBLOCK // 8 if n_pad % SUPERBLOCK == 0 and n_pad >= SUPERBLOCK else n_pad // 8


def _pad_cols(q4: np.ndarray, n_pad: int, fill: int = 0) -> np.ndarray:
    k, n = q4.shape
    if n == n_pad:
        return q4
    out = np.full((k, n_pad), fill, dtype=q4.dtype)
    out[:, :n] = q4
    return out


def pack_planar(q4: np.ndarray) -> np.ndarray:
    """int [K, N] (0..15) -> int32 [K, N_pad // 8] in the TPU planar layout."""
    q4 = np.asarray(q4)
    k, n = q4.shape
    n_pad = padded_out_features(n)
    lb = lane_block(n_pad)
    q = _pad_cols(q4.astype(np.uint32) & 0xF, n_pad)
    # [K, B, 8, L]: b-th superblock, nibble slot i, lane r
    q = q.reshape(k, n_pad // (8 * lb), 8, lb)
    words = np.zeros((k, n_pad // (8 * lb), lb), dtype=np.uint32)
    for i in range(8):
        words |= q[:, :, i, :] << (4 * i)
    return words.reshape(k, n_pad // 8).astype(np.int32)


def unpack_planar(qweight: np.ndarray, n: Optional[int] = None) -> np.ndarray:
    """int32 [K, N_pad // 8] -> int32 [K, N] (0..15)."""
    qweight = np.asarray(qweight).astype(np.uint32)
    k, n8 = qweight.shape
    n_pad = n8 * 8
    lb = lane_block(n_pad)
    words = qweight.reshape(k, n8 // lb, lb)
    out = np.empty((k, n8 // lb, 8, lb), dtype=np.uint32)
    for i in range(8):
        out[:, :, i, :] = (words >> (4 * i)) & 0xF
    out = out.reshape(k, n_pad)
    return out[:, : (n if n is not None else n_pad)].astype(np.int32)


def pad_scales_planar(scales: np.ndarray) -> np.ndarray:
    """[G, N] float scales -> [G, N_pad], padded columns get scale 1.0."""
    scales = np.asarray(scales)
    g, n = scales.shape
    return _pad_cols(scales, padded_out_features(n), fill=1).astype(scales.dtype)


def pack_awq(q4: np.ndarray) -> np.ndarray:
    """int [K, N] (0..15) -> AutoAWQ-order int32 [K, N // 8]."""
    q4 = np.asarray(q4)
    k, n = q4.shape
    assert n % 8 == 0, f"AutoAWQ layout needs N % 8 == 0, got {n}"
    q = (q4.astype(np.uint32) & 0xF).reshape(k, n // 8, 8)
    words = np.zeros((k, n // 8), dtype=np.uint32)
    for i, col in enumerate(AWQ_ORDER):
        words |= q[:, :, col] << (4 * i)
    return words.astype(np.int32)


def unpack_awq(qweight: np.ndarray, n: Optional[int] = None) -> np.ndarray:
    """AutoAWQ-order int32 [K, N // 8] -> int [K, N] (0..15)."""
    qweight = np.asarray(qweight).astype(np.uint32)
    k, n8 = qweight.shape
    out = np.empty((k, n8, 8), dtype=np.uint32)
    for i, col in enumerate(AWQ_ORDER):
        out[:, :, col] = (qweight >> (4 * i)) & 0xF
    out = out.reshape(k, n8 * 8)
    return out[:, : (n if n is not None else n8 * 8)].astype(np.int32)


def dequantize_awq(
    qweight: np.ndarray, qzeros: np.ndarray, scales: np.ndarray
) -> np.ndarray:
    """Reference-semantics dequant of an AutoAWQ GEMM triple -> float [K, N].

    Mirrors awq/utils/packing_utils.py:87-102 (``dequantize_gemm``); serves as
    the kernel-free numerics oracle for interop tests.
    """
    k, n8 = np.asarray(qweight).shape
    g = np.asarray(scales).shape[0]
    group_size = k // g
    iw = unpack_awq(qweight).astype(np.float32)  # [K, N]
    iz = unpack_awq(qzeros).astype(np.float32)  # [G, N]
    s = np.asarray(scales).astype(np.float32)  # [G, N]
    iz = np.repeat(iz, group_size, axis=0)
    s = np.repeat(s, group_size, axis=0)
    return (iw - iz) * s


def awq_to_planar(
    qweight: np.ndarray, qzeros: np.ndarray, scales: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """AutoAWQ GEMM triple -> (qweight, qzeros, scales) in the planar layout.

    Returned scales are float32 [G, N_pad]; zeros packed planar [G, N_pad//8].
    """
    q4 = unpack_awq(qweight)
    z4 = unpack_awq(qzeros)
    return (
        pack_planar(q4),
        pack_planar(z4),
        pad_scales_planar(np.asarray(scales).astype(np.float32)),
    )


def planar_to_awq(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    out_features: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Planar triple -> AutoAWQ GEMM triple (padding stripped, scales fp16)."""
    q4 = unpack_planar(qweight, out_features)
    z4 = unpack_planar(qzeros, out_features)
    return (
        pack_awq(q4),
        pack_awq(z4),
        np.asarray(scales)[:, :out_features].astype(np.float16),
    )
