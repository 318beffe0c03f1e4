"""Core quant math: reference-semantics oracle tests.

The torch-free oracle below reimplements the reference
``pseudo_quantize_tensor`` (awq/quantize/quantizer.py:74-109) directly from
its published math in numpy, on the reference's [out, in] orientation — an
independent path from autoawq_tpu.core.quant's [K, N] grouped implementation.
"""

import numpy as np
import pytest

from autoawq_tpu.core.quant import (
    dequantize_weight,
    pseudo_quantize_weight,
    quantize_weight,
)


def ref_pseudo_quantize(w_oi: np.ndarray, bits=4, group_size=128, zero_point=True):
    """Reference semantics on torch-orientation [O, I] weights."""
    org = w_oi.shape
    w = w_oi.reshape(-1, group_size).astype(np.float32)
    if zero_point:
        max_int = 2**bits - 1
        mx = w.max(1, keepdims=True)
        mn = w.min(1, keepdims=True)
        scales = np.clip(mx - mn, 1e-5, None) / max_int
        zeros = np.clip(np.round(-mn / scales), 0, max_int)
        wq = (np.clip(np.round(w / scales) + zeros, 0, max_int) - zeros) * scales
    else:
        max_int = 2 ** (bits - 1) - 1
        scales = np.clip(np.abs(w).max(1, keepdims=True), 1e-5, None) / max_int
        wq = np.clip(np.round(w / scales), -(2 ** (bits - 1)), max_int) * scales
    return wq.reshape(org)


@pytest.mark.parametrize("zero_point", [True, False])
@pytest.mark.parametrize("group_size", [32, 64])
def test_pseudo_quantize_matches_reference_semantics(rng, zero_point, group_size):
    k, n = 128, 96
    w_kn = rng.standard_normal((k, n)).astype(np.float32)
    # reference operates on [O, I] with groups along I; ours on [K, N] with
    # groups along K. Transposing maps one onto the other exactly.
    expect = ref_pseudo_quantize(
        w_kn.T, group_size=group_size, zero_point=zero_point
    ).T
    got = np.asarray(
        pseudo_quantize_weight(w_kn, group_size=group_size, zero_point=zero_point)
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("zero_point", [True, False])
def test_quantize_dequantize_roundtrip(rng, zero_point):
    w = rng.standard_normal((256, 64)).astype(np.float32)
    q, s, z = quantize_weight(w, group_size=64, zero_point=zero_point)
    assert q.dtype == np.int32
    qn = np.asarray(q)
    assert qn.min() >= 0 and qn.max() <= 15
    wdq = dequantize_weight(q, s, z)
    # int4 g=64: dequant must equal pseudo-quant exactly
    wpq = pseudo_quantize_weight(w, group_size=64, zero_point=zero_point)
    np.testing.assert_allclose(np.asarray(wdq), np.asarray(wpq), rtol=1e-5, atol=1e-6)
    # and be a reasonable approximation of the original
    err = np.abs(np.asarray(wdq) - w).mean()
    assert err < 0.1


def test_quantization_error_bounded_by_group_range(rng):
    w = rng.uniform(-1, 1, (128, 32)).astype(np.float32)
    wdq = np.asarray(pseudo_quantize_weight(w, group_size=128))
    # max error per element <= scale/2 ~ range/30
    assert np.abs(wdq - w).max() <= (w.max() - w.min()) / 15 / 2 + 1e-4
