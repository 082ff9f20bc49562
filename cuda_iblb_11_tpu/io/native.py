"""ctypes bindings for the native C++ I/O runtime (native/iblb_io.cpp).

Builds the shared library on first use if the toolchain is available;
callers fall back to the pure-Python writers (io/writers.py — also the
format oracle) when it is not.  tests/test_native_io.py asserts byte
equality of both paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_libiblb_io.so")
_NATIVE_DIR = os.path.normpath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native"))
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "iblb_io.cpp")
    if not os.path.exists(src):
        return False
    # single source of truth for flags: the Makefile; fall back to a
    # direct g++ invocation only where make is unavailable
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        if os.path.exists(_LIB_PATH):
            return True
    except (OSError, subprocess.SubprocessError):
        pass
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
             "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load():
    """Return the loaded library or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.iblb_monotonic_seconds.restype = ctypes.c_double
    lib.iblb_write_fluid_snapshot.restype = ctypes.c_int
    lib.iblb_write_fluid_snapshot.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.iblb_write_cilia_snapshot.restype = ctypes.c_int
    lib.iblb_write_cilia_snapshot.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def write_fluid_snapshot(path: str, cfg, rho, u) -> None:
    lib = load()
    if lib is None:
        raise RuntimeError("native io library unavailable")
    rho = np.ascontiguousarray(np.asarray(rho, np.float64))
    u = np.asarray(u, np.float64)
    ux = np.ascontiguousarray(u[0])
    uy = np.ascontiguousarray(u[1])
    ydim, xdim = rho.shape
    rc = lib.iblb_write_fluid_snapshot(
        path.encode(), xdim, ydim, cfg.x_scale, cfg.s_scale,
        _dptr(rho), _dptr(ux), _dptr(uy))
    if rc:
        raise OSError(f"native fluid snapshot write failed (code {rc})")


def write_cilia_snapshot(path: str, cfg, s, u_s, eps) -> None:
    lib = load()
    if lib is None:
        raise RuntimeError("native io library unavailable")
    s = np.ascontiguousarray(np.asarray(s, np.float64))
    u_s = np.ascontiguousarray(np.asarray(u_s, np.float64))
    eps = np.ascontiguousarray(np.asarray(eps, np.int32))
    rc = lib.iblb_write_cilia_snapshot(
        path.encode(), s.shape[0], cfg.length, cfg.xdim,
        cfg.x_scale, cfg.s_scale,
        _dptr(s), _dptr(u_s), eps.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)))
    if rc:
        raise OSError(f"native cilia snapshot write failed (code {rc})")


def monotonic_seconds() -> float:
    lib = load()
    if lib is None:
        import time

        return time.perf_counter()
    return float(lib.iblb_monotonic_seconds())
