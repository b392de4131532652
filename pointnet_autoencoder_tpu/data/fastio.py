"""Fast text parsing for .pts / .seg files: native C++ with numpy fallback.

The reference decodes shapes with np.loadtxt (part_dataset.py:110-113),
which dominates host-side time on cache misses. The native parser
(csrc/fastio.cpp, built to libpcae_fastio.so) reads the whole file and
parses floats with a tight scanner -- typically >10x faster than
np.loadtxt -- keeping the TPU fed during the first epoch.

Falls back transparently to numpy when the shared library has not been
built (``python -m pointnet_autoencoder_tpu.csrc.build`` builds it).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "csrc", "libpcae_fastio.so")
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.count_rows.restype = ctypes.c_long
            lib.count_rows.argtypes = [ctypes.c_char_p]
            lib.parse_floats.restype = ctypes.c_long
            lib.parse_floats.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_long,
            ]
            lib.parse_ints.restype = ctypes.c_long
            lib.parse_ints.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_long,
            ]
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def native_available() -> bool:
    return _find_lib() is not None


def _check_columns(path: str, expected: int) -> None:
    """Reject files whose (uniform) column count differs from expected --
    e.g. ShapeNetPart variants with per-point normals (x y z nx ny nz)
    would otherwise be silently reinterpreted as interleaved fake points
    (the native parser fills a 3N buffer and the %3 check cannot catch a
    6-column file)."""
    with open(path, "rb") as f:
        for raw in f:
            cols = len(raw.split())
            if cols == 0:
                continue
            if cols != expected:
                raise ValueError(
                    f"{path}: expected {expected} columns, found {cols} "
                    "on the first data line"
                )
            return


def load_pts(path: str) -> np.ndarray:
    """Load an Nx3 whitespace-separated float file."""
    _check_columns(path, 3)
    lib = _find_lib()
    if lib is None:
        return np.loadtxt(path).astype(np.float32).reshape(-1, 3)
    n = lib.count_rows(path.encode())
    if n < 0:
        raise IOError(f"cannot read {path}")
    out = np.empty((n * 3,), dtype=np.float32)
    got = lib.parse_floats(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n * 3,
    )
    if got < 0:
        raise IOError(f"cannot read {path}")
    if got % 3 != 0:
        raise ValueError(f"{path}: {got} values is not a multiple of 3")
    return out[:got].reshape(-1, 3)


def load_seg(path: str) -> np.ndarray:
    """Load an N-row integer label file."""
    _check_columns(path, 1)
    lib = _find_lib()
    if lib is None:
        return np.loadtxt(path).astype(np.int64)
    n = lib.count_rows(path.encode())
    if n < 0:
        raise IOError(f"cannot read {path}")
    out = np.empty((n,), dtype=np.int32)
    got = lib.parse_ints(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n
    )
    if got < 0:
        raise IOError(f"cannot read {path}")
    return out[:got].astype(np.int64)
