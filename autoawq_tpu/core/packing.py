"""int4 bit-packing layouts: the TPU-native *planar* layout and the AutoAWQ
GEMM interop layout.

TPU planar layout (row-paired)
------------------------------
A quantized weight ``q4 [K, N]`` (values 0..15) is stored as
``qweight int32 [K // 2, N_pad // 4]`` where ``N_pad`` rounds N up to a
multiple of the superblock size SB (1024 when N >= 1024, else N rounded to a
multiple of 32). Within each superblock of SB logical columns (L = SB // 4
packed lanes), nibble ``j = p + 4h`` (bits ``4p + 16h`` ..) of the packed
word at packed row ``r``, lane ``c`` stores the logical element
``(row 2r + h, col b*SB + p*L + c%L)`` where ``b = c // L``.

Why row-pairing: the Pallas kernel extracts nibble PAIRS (p, p+4) — the low
and high 16-bit halves of each word — with one shift+mask+or planting each
nibble in a bf16 mantissa (value ``256 + 16*n``), then a free
``pltpu.bitcast(int32 -> bf16)`` whose TPU semantics double the *sublane*
dim (row 2r = low half, 2r+1 = high). Because the pair holds two adjacent
K-rows of the SAME logical column, the bitcast output is directly a
[2R, L] slab of contraction-ready weights: per pass one MXU dot over a
contiguous L-wide column block, 1.5 VPU ops per weight element (vs 3 for
shift+mask+convert), and the +256 bias cancels against the
identically-extracted zero-points (packed the same way, pairing along the
group dim — pad to an even row count first). Padded logical columns carry
qweight=0, zero=0, scale=1 and are sliced off after the matmul.

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
SUPERBLOCK = 1024  # logical columns per planar superblock (L = 256 lanes)


def padded_out_features(n: int) -> int:
    """N_pad for the planar layout: multiple of 1024 above 1024, else of 32."""
    if n >= SUPERBLOCK:
        return -(-n // SUPERBLOCK) * SUPERBLOCK
    return -(-n // 32) * 32


def padded_in_features(k: int, group_size: int = 128) -> int:
    """K_pad for the planar layout: the fused kernel blocks K into
    even-group superblocks (ops/pallas_gemm._pick_bk steps by
    2*group_size), so K must be a multiple of 2*group_size. Conforming K
    (every llama-family dim at group 128) returns unchanged; falcon-7b's
    h=4544 at group 64 (71 groups, odd) pads to 4608. Ks smaller than
    one even-group superblock (tiny test shapes, MLA latent ranks) stay
    unpadded — they were never kernel-eligible, the jnp path serves them,
    and padding them would surprise every downstream consumer that
    contracts the dequantized weight against logical-K tensors."""
    if k <= 2 * group_size:
        return k
    return -(-k // (2 * group_size)) * (2 * group_size)


def pad_k_nibbles(
    q4: np.ndarray, scales: np.ndarray,
    z4: Optional[np.ndarray], group_size: int,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Pad logical nibble/scale arrays along K to ``padded_in_features``.

    Pad weight nibbles and pad-group zero nibbles are both 8, so the
    dequantized pad rows are EXACTLY zero: padded activations (the
    dispatcher zero-pads x, ops/gemm.py) contribute nothing to the dot,
    and the per-group zero-point correction sees zero x-sums for pad
    groups. The transformation is numerically exact, not approximate.
    Writers strip the pad back off via role_in_features (io/hf.py)."""
    k = q4.shape[0]
    k_pad = padded_in_features(k, group_size)
    if k_pad == k:
        return q4, scales, z4
    q4 = np.concatenate(
        [q4, np.full((k_pad - k, q4.shape[1]), 8, q4.dtype)])
    g_pad = k_pad // group_size - scales.shape[0]
    scales = np.concatenate(
        [scales, np.ones((g_pad, scales.shape[1]), scales.dtype)])
    if z4 is not None:
        z4 = np.concatenate(
            [z4, np.full((g_pad, z4.shape[1]), 8, z4.dtype)])
    return q4, scales, z4


def lane_block(n_pad: int) -> int:
    """Packed lanes per superblock (L)."""
    if n_pad % SUPERBLOCK == 0 and n_pad >= SUPERBLOCK:
        return SUPERBLOCK // 4
    return n_pad // 4


def _pad_cols(q4: np.ndarray, n_pad: int, fill: int = 0) -> np.ndarray:
    k, n = q4.shape
    if n == n_pad:
        return q4
    out = np.full((k, n_pad), fill, dtype=q4.dtype)
    out[:, :n] = q4
    return out


def pack_planar(q4: np.ndarray) -> np.ndarray:
    """int [R, N] (0..15) -> int32 [ceil(R/2), N_pad // 4] planar row-paired.

    R is the contraction dim for weights (K) or the group dim for
    zero-points; an odd R is padded with a zero row (strip on unpack via
    ``rows=``). Dispatches to the native C++ kernel when available
    (csrc/packing.cpp); this numpy body is the fallback and oracle.
    """
    q4 = np.asarray(q4)
    from autoawq_tpu.core import native

    fast = native.pack_planar(q4, padded_out_features(q4.shape[1]))
    if fast is not None:
        return fast
    r, n = q4.shape
    if r % 2:
        q4 = np.concatenate([q4, np.zeros((1, n), q4.dtype)], axis=0)
        r += 1
    n_pad = padded_out_features(n)
    lb = lane_block(n_pad)
    q = _pad_cols(q4.astype(np.uint32) & 0xF, n_pad)
    # [R/2, h, B, p, L]: row pair half h, superblock b, pass p, lane c
    q = q.reshape(r // 2, 2, n_pad // (4 * lb), 4, lb)
    words = np.zeros((r // 2, n_pad // (4 * lb), lb), dtype=np.uint32)
    for p in range(4):
        for h in range(2):
            words |= q[:, h, :, p, :] << (4 * p + 16 * h)
    return words.reshape(r // 2, n_pad // 4).astype(np.int32)


def unpack_planar(qweight: np.ndarray, n: Optional[int] = None,
                  rows: Optional[int] = None) -> np.ndarray:
    """int32 [R/2, N_pad // 4] -> int32 [R (or rows), N (or N_pad)] (0..15)."""
    from autoawq_tpu.core import native

    q = np.asarray(qweight)
    fast = native.unpack_planar(
        q, rows if rows is not None else 2 * q.shape[0],
        n if n is not None else 4 * q.shape[1])
    if fast is not None:
        return fast
    qweight = np.asarray(qweight).astype(np.uint32)
    r2, n4 = qweight.shape
    n_pad = n4 * 4
    lb = lane_block(n_pad)
    words = qweight.reshape(r2, n4 // lb, lb)
    out = np.empty((r2, 2, n4 // lb, 4, lb), dtype=np.uint32)
    for p in range(4):
        for h in range(2):
            out[:, h, :, p, :] = (words >> (4 * p + 16 * h)) & 0xF
    out = out.reshape(2 * r2, n_pad)
    out = out[: (rows if rows is not None else 2 * r2),
              : (n if n is not None else n_pad)]
    return out.astype(np.int32)


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
    from autoawq_tpu.core import native

    fast = native.pack_awq(q4)
    if fast is not None:
        return fast
    q = (q4.astype(np.uint32) & 0xF).reshape(k, n // 8, 8)
    words = np.zeros((k, n // 8), dtype=np.uint32)
    for i, col in enumerate(AWQ_ORDER):
        words |= q[:, :, col] << (4 * i)
    return words.astype(np.int32)


def unpack_awq(qweight: np.ndarray, n: Optional[int] = None) -> np.ndarray:
    """AutoAWQ-order int32 [K, N // 8] -> int [K, N] (0..15)."""
    from autoawq_tpu.core import native

    q = np.asarray(qweight)
    fast = native.unpack_awq(q, n if n is not None else 8 * q.shape[1])
    if fast is not None:
        return fast
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

    Returned scales are float32 [G, N_pad]; zeros packed planar row-paired.
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
    g = np.asarray(scales).shape[0]
    q4 = unpack_planar(qweight, out_features)
    z4 = unpack_planar(qzeros, out_features, rows=g)
    return (
        pack_awq(q4),
        pack_awq(z4),
        np.asarray(scales)[:, :out_features].astype(np.float16),
    )
