"""ctypes binding to the native I/O runtime (native/librs_io.so).

Builds lazily via `make -C native` on first use if the shared library is
missing and a toolchain is available; all callers fall back to numpy paths
when unavailable, so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "librs_io.so")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               capture_output=True, timeout=120, check=True)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.rs_io_read_csv.restype = ctypes.c_int
        lib.rs_io_read_csv.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.rs_io_free.restype = None
        lib.rs_io_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        lib.rs_io_write_ply.restype = ctypes.c_int64
        lib.rs_io_write_ply.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ]
        lib.rs_io_write_csv.restype = ctypes.c_int
        lib.rs_io_write_csv.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def read_csv_matrix(path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native io unavailable")
    data = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.rs_io_read_csv(path.encode(), ctypes.byref(data),
                            ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"rs_io_read_csv({path}) failed with code {rc}")
    try:
        n = rows.value * cols.value
        out = np.ctypeslib.as_array(data, shape=(n,)).copy()
    finally:
        lib.rs_io_free(data)
    return out.reshape(rows.value, cols.value)


def write_ply(path: str, xyz: np.ndarray, rgb: np.ndarray) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError("native io unavailable")
    xyz = np.ascontiguousarray(xyz, dtype=np.float64)
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    n = xyz.shape[0]
    written = lib.rs_io_write_ply(
        path.encode(),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n)
    if written != n:
        raise IOError(f"rs_io_write_ply({path}) wrote {written} != {n}")
    return int(written)


def write_csv_matrix(path: str, mat: np.ndarray) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("native io unavailable")
    mat = np.ascontiguousarray(mat, dtype=np.float64)
    rc = lib.rs_io_write_csv(
        path.encode(),
        mat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        mat.shape[0], mat.shape[1])
    if rc != 0:
        raise IOError(f"rs_io_write_csv({path}) failed with code {rc}")
