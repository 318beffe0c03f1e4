"""Native C++ packing kernels vs the numpy oracle (bit-exact)."""

import os

import numpy as np
import pytest

from autoawq_tpu.core import native, packing


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _numpy_env(fn, *args, **kw):
    """Run a packing fn with the native path disabled (oracle)."""
    old = os.environ.get("AWQ_TPU_NATIVE")
    os.environ["AWQ_TPU_NATIVE"] = "0"
    native._LIB, native._TRIED = None, False
    try:
        return fn(*args, **kw)
    finally:
        if old is None:
            del os.environ["AWQ_TPU_NATIVE"]
        else:
            os.environ["AWQ_TPU_NATIVE"] = old
        native._LIB, native._TRIED = None, False


@pytest.mark.parametrize("r,n", [(128, 2048), (11, 500), (44, 1024), (2, 32)])
def test_pack_planar_matches_numpy(lib, rng, r, n):
    q4 = rng.integers(0, 16, (r, n), dtype=np.int32)
    fast = packing.pack_planar(q4)
    slow = _numpy_env(packing.pack_planar, q4)
    np.testing.assert_array_equal(fast, slow)
    back = packing.unpack_planar(fast, n, rows=r)
    np.testing.assert_array_equal(back, q4)
    slow_back = _numpy_env(packing.unpack_planar, fast, n, rows=r)
    np.testing.assert_array_equal(back, slow_back)


def test_pack_awq_matches_numpy(lib, rng):
    q4 = rng.integers(0, 16, (64, 512), dtype=np.int32)
    fast = packing.pack_awq(q4)
    slow = _numpy_env(packing.pack_awq, q4)
    np.testing.assert_array_equal(fast, slow)
    np.testing.assert_array_equal(packing.unpack_awq(fast), q4)


def test_fused_awq_to_planar(lib, rng):
    q4 = rng.integers(0, 16, (128, 1024), dtype=np.int32)
    awq = packing.pack_awq(q4)
    fused = native.awq_to_planar_qweight(awq, 1024, 1024)
    np.testing.assert_array_equal(fused, packing.pack_planar(q4))
