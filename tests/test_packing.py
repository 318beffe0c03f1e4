"""Packing layouts: planar roundtrip, AutoAWQ interop bit-exactness."""

import numpy as np
import pytest

from autoawq_tpu.core import packing
from autoawq_tpu.core.quant import dequantize_weight, quantize_weight


@pytest.mark.parametrize("n", [256, 1024, 2048, 5632])  # incl. non-1024-multiple
def test_planar_roundtrip(rng, n):
    k = 128
    q4 = rng.integers(0, 16, (k, n), dtype=np.int32)
    packed = packing.pack_planar(q4)
    assert packed.shape == (k // 2, packing.padded_out_features(n) // 4)
    out = packing.unpack_planar(packed, n)
    np.testing.assert_array_equal(out, q4)


def test_planar_roundtrip_odd_rows(rng):
    """Odd row counts (zero-points with odd G) pad one row; strip via rows=."""
    q4 = rng.integers(0, 16, (11, 2048), dtype=np.int32)
    packed = packing.pack_planar(q4)
    assert packed.shape == (6, 512)
    np.testing.assert_array_equal(packing.unpack_planar(packed, rows=11), q4)


def test_planar_layout_spec():
    """Nibble p + 4h of word (r, lane c) within superblock b = logical
    element (row 2r + h, col b*SB + p*L + c), L = 256 (core/packing.py)."""
    k, n = 4, 2048  # two superblocks, two row pairs
    q4 = (np.arange(k * n, dtype=np.int32).reshape(k, n) * 7) % 16
    packed = packing.pack_planar(q4).astype(np.uint32)
    L = 256
    for r in range(2):
        for b in range(2):
            for p in range(4):
                for h in range(2):
                    for c in [0, 7, 255]:
                        word = packed[r, b * L + c]
                        got = (word >> (4 * p + 16 * h)) & 0xF
                        assert got == q4[2 * r + h, b * 1024 + p * L + c]


def test_awq_roundtrip(rng):
    q4 = rng.integers(0, 16, (64, 512), dtype=np.int32)
    np.testing.assert_array_equal(packing.unpack_awq(packing.pack_awq(q4)), q4)


def test_awq_pack_order_bit_exact():
    """AutoAWQ nibble i of a word holds column 8*col + AWQ_ORDER[i]
    (gemm.py:218-228)."""
    q4 = np.arange(16, dtype=np.int32).reshape(1, 16) % 16
    packed = packing.pack_awq(q4).astype(np.uint64)
    for col in range(2):
        word = int(packed[0, col])
        for i, src in enumerate(packing.AWQ_ORDER):
            assert (word >> (4 * i)) & 0xF == q4[0, col * 8 + src]


def test_awq_to_planar_preserves_dequant(rng):
    k, n, g = 256, 512, 128
    w = rng.standard_normal((k, n)).astype(np.float32)
    q, s, z = quantize_weight(w, group_size=g)
    q, s, z = np.asarray(q), np.asarray(s), np.asarray(z)

    awq_qw, awq_qz, awq_s = packing.pack_awq(q), packing.pack_awq(z), s.astype(np.float16)
    ref_dq = packing.dequantize_awq(awq_qw, awq_qz, awq_s)

    pqw, pqz, ps = packing.awq_to_planar(awq_qw, awq_qz, awq_s)
    our_dq = np.asarray(
        dequantize_weight(
            packing.unpack_planar(pqw, n),
            ps[:, :n],
            packing.unpack_planar(pqz, n),
        )
    )
    np.testing.assert_allclose(our_dq, ref_dq, rtol=1e-3, atol=1e-3)

    # and converting back is bit-exact
    qw2, qz2, s2 = packing.planar_to_awq(pqw, pqz, ps, n)
    np.testing.assert_array_equal(qw2, awq_qw)
    np.testing.assert_array_equal(qz2, awq_qz)
    np.testing.assert_array_equal(s2, awq_s)
