"""ctypes loader for the native packing kernels (csrc/packing.cpp).

Builds the shared library on first use with the system C++ toolchain and
caches it next to the source; every entry point has a numpy fallback in
core/packing.py (which doubles as the oracle — see tests/test_native.py).
Set ``AWQ_TPU_NATIVE=0`` to force the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "packing.cpp")


def _build(src: str, out: str) -> bool:
    for cxx in ("g++", "clang++", "c++"):
        try:
            subprocess.run(
                [cxx, "-O3", "-march=native", "-shared", "-fPIC", src,
                 "-o", out],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except (FileNotFoundError, subprocess.CalledProcessError,
                subprocess.TimeoutExpired):
            continue
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("AWQ_TPU_NATIVE", "1") == "0":
            return None
        if not os.path.exists(_SRC):
            return None
        so = os.path.join(os.path.dirname(_SRC), "_packing_native.so")
        if not os.path.exists(so) or (
            os.path.getmtime(so) < os.path.getmtime(_SRC)
        ):
            ok = _build(_SRC, so)
            if not ok:
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        i64, i32p, i8p = (ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
                          ctypes.POINTER(ctypes.c_int8))
        lib.pack_planar.argtypes = [i32p, i64, i64, i64, i32p]
        lib.unpack_planar.argtypes = [i32p, i64, i64, i64, i64, i8p]
        lib.pack_awq.argtypes = [i32p, i64, i64, i32p]
        lib.unpack_awq.argtypes = [i32p, i64, i64, i64, i8p]
        lib.awq_to_planar.argtypes = [i32p, i64, i64, i64, i32p]
        _LIB = lib
        return _LIB


def _ptr(a: np.ndarray, typ):
    return a.ctypes.data_as(typ)


def pack_planar(q4: np.ndarray, n_pad: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    r, n = q4.shape
    src = np.ascontiguousarray(q4, np.int32)  # no mask/copy: C masks 0xF
    out = np.zeros(((r + 1) // 2, n_pad // 4), np.int32)
    lib.pack_planar(_ptr(src, ctypes.POINTER(ctypes.c_int32)), r, n, n_pad,
                    _ptr(out, ctypes.POINTER(ctypes.c_int32)))
    return out


def unpack_planar(packed: np.ndarray, rows: int, n: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, np.int32)
    r2, n4 = packed.shape
    out = np.zeros((rows, n), np.int8)
    lib.unpack_planar(_ptr(packed, ctypes.POINTER(ctypes.c_int32)), r2, n4,
                      rows, n, _ptr(out, ctypes.POINTER(ctypes.c_int8)))
    return out  # int8 nibbles 0..15 — cheap to consume, no astype copy


def pack_awq(q4: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    k, n = q4.shape
    src = np.ascontiguousarray(q4, np.int32)
    out = np.zeros((k, n // 8), np.int32)
    lib.pack_awq(_ptr(src, ctypes.POINTER(ctypes.c_int32)), k, n,
                 _ptr(out, ctypes.POINTER(ctypes.c_int32)))
    return out


def unpack_awq(packed: np.ndarray, n: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, np.int32)
    k, n8 = packed.shape
    out = np.zeros((k, n), np.int8)
    lib.unpack_awq(_ptr(packed, ctypes.POINTER(ctypes.c_int32)), k, n8, n,
                   _ptr(out, ctypes.POINTER(ctypes.c_int8)))
    return out  # int8 nibbles


def awq_to_planar_qweight(awq: np.ndarray, n: int,
                          n_pad: int) -> Optional[np.ndarray]:
    """Fused unpack+permute+repack of an AutoAWQ qweight (no int8 temp)."""
    lib = get_lib()
    if lib is None:
        return None
    awq = np.ascontiguousarray(awq, np.int32)
    k = awq.shape[0]
    out = np.zeros(((k + 1) // 2, n_pad // 4), np.int32)
    lib.awq_to_planar(_ptr(awq, ctypes.POINTER(ctypes.c_int32)), k, n, n_pad,
                      _ptr(out, ctypes.POINTER(ctypes.c_int32)))
    return out
