"""Native (C++) runtime components, built on demand with the system g++.

``fast_loadtxt`` is a drop-in for np.loadtxt on numeric whitespace files —
used by the ShapeNet packing step. Falls back to np.loadtxt when no compiler
is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "txtparse.cpp")
_LIB_PATH = os.path.join(_HERE, "_txtparse.so")
_lib = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if _build_failed:
        return None
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC],
                check=True,
                capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            _build_failed = True
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.parse_floats.restype = ctypes.c_long
    lib.parse_floats.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None:
        _lib = _build()
    return _lib


def fast_loadtxt(path: str, ncols: Optional[int] = None) -> np.ndarray:
    """Parse a whitespace-delimited numeric file -> (rows, ncols) float32.

    ncols inferred from the first line when not given. Falls back to
    np.loadtxt when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return np.loadtxt(path).astype(np.float32)
    if ncols is None:
        with open(path, "r") as f:
            first = f.readline().split()
        ncols = len(first)
    size = os.path.getsize(path)
    # floats are >= 2 bytes of text each; generous bound
    max_vals = max(size, 64)
    out = np.empty(max_vals, np.float32)
    n = lib.parse_floats(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_vals
    )
    if n < 0:
        return np.loadtxt(path).astype(np.float32)
    assert n % ncols == 0, f"{path}: {n} values not divisible by {ncols} cols"
    return out[:n].reshape(-1, ncols).copy()
