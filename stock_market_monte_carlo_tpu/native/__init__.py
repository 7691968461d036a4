"""ctypes bindings to the optional C++ runtime library (libsmmc_native).

The reference's runtime around the GPU kernels is C++ (CSV parsing via
fast-cpp-csv-parser, host statistics, Sobol generators, file writers). Here
the equivalents live in ``csrc/smmc_native.cpp`` compiled to a shared
library via the repo Makefile; Python falls back transparently when the
library has not been built, so the framework is fully functional either way.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_LOAD_ATTEMPTED = False


def _lib():
    global _LIB, _LOAD_ATTEMPTED
    if _LOAD_ATTEMPTED:
        return _LIB
    _LOAD_ATTEMPTED = True
    here = os.path.dirname(os.path.abspath(__file__))
    # an explicit $SMMC_NATIVE_LIB wins over bundled/build-tree copies
    # (same precedence as $SMMC_RETURNS_CSV in data/loader.py)
    candidates = [
        os.environ.get("SMMC_NATIVE_LIB", ""),
        os.path.join(here, "libsmmc_native.so"),
        os.path.join(here, "..", "..", "build", "libsmmc_native.so"),
    ]
    for path in candidates:
        if path and os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                _configure(lib)
                _LIB = lib
                break
            except (OSError, AttributeError):
                # AttributeError: a stale library missing newer symbols
                # (e.g. a pre-64-bit-Sobol build) — fall back to the next
                # candidate / pure Python rather than breaking every
                # native entry point
                continue
    return _LIB


def _configure(lib):
    lib.smmc_read_returns.restype = ctypes.c_long
    lib.smmc_read_returns.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
    ]
    lib.smmc_write_data_file.restype = ctypes.c_int
    lib.smmc_write_data_file.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
    ]
    lib.smmc_sobol_points.restype = ctypes.c_int
    lib.smmc_sobol_points.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,   # direction, dims
        ctypes.c_longlong, ctypes.c_longlong,            # offset, n
        ctypes.POINTER(ctypes.c_double),                 # out (n*dims)
    ]
    lib.smmc_sobol_bits64.restype = ctypes.c_int
    lib.smmc_sobol_bits64.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,   # direction64, dims
        ctypes.c_longlong, ctypes.c_longlong,            # offset, n
        ctypes.POINTER(ctypes.c_uint64),                 # out (n*dims)
    ]
    lib.smmc_welford_merge.restype = None
    lib.smmc_welford_merge.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]


def available() -> bool:
    return _lib() is not None


def native_read_returns(path: str) -> Optional[np.ndarray]:
    """Read the 'returns' column via the C++ CSV reader; None if the
    native library is unavailable (callers fall back to Python)."""
    lib = _lib()
    if lib is None:
        return None
    cap = 1 << 22
    buf = np.empty(cap, np.float32)
    n = lib.smmc_read_returns(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap,
    )
    if n < 0:
        raise IOError(f"native CSV reader failed on {path!r} (code {n})")
    if n >= cap:
        # the C reader stops at cap, so n == cap means POSSIBLY truncated
        # — defer to the Python reader (which has no cap) rather than
        # silently dropping rows
        return None
    return buf[:n].copy()


def native_write_data_file(path: str, returns: np.ndarray,
                           values: np.ndarray) -> bool:
    lib = _lib()
    if lib is None:
        return False
    r = np.ascontiguousarray(returns, np.float32)
    v = np.ascontiguousarray(values, np.float32)
    rc = lib.smmc_write_data_file(
        path.encode(),
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), r.size,
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), v.size,
    )
    return rc == 0


def native_welford_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Merge [n, mean, M2] partition stats b into a (in place); returns a.
    Exact Chan et al. combination — the C++ cross-check for
    ops/reductions.welford_combine."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native library not built (run `make native`)")
    a = np.ascontiguousarray(a, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    lib.smmc_welford_merge(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return a


def native_sobol_points(direction: np.ndarray, offset: int,
                        n: int) -> Optional[np.ndarray]:
    """CPU Sobol points (n, dims) in [0,1) — the C++ cross-check
    implementation used by tests against the on-device generator."""
    lib = _lib()
    if lib is None:
        return None
    d = np.ascontiguousarray(direction, np.uint32)
    dims = d.shape[0]
    out = np.empty((n, dims), np.float64)
    rc = lib.smmc_sobol_points(
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), dims,
        offset, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise RuntimeError(f"native sobol failed (code {rc})")
    return out


def native_sobol_bits64(direction64: np.ndarray, offset: int,
                        n: int) -> Optional[np.ndarray]:
    """Raw 64-bit Sobol fold states (n, dims) for indices past 2^32 — the
    C++ i8-depth cross-check for ops.sobol.sobol_bits64."""
    lib = _lib()
    if lib is None:
        return None
    d = np.ascontiguousarray(direction64, np.uint64)
    dims = d.shape[0]
    out = np.empty((n, dims), np.uint64)
    rc = lib.smmc_sobol_bits64(
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), dims,
        offset, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    if rc != 0:
        raise RuntimeError(f"native sobol64 failed (code {rc})")
    return out
