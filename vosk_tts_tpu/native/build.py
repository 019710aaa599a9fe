"""Build + ctypes bindings for the native MAS kernel.

Compiled once per machine into the package directory (falls back to a temp
dir if read-only). OpenMP parallelizes across the batch like the reference's
``cython.parallel.prange`` (monotonic_align/core.pyx:35-40).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "mas.cc")

_lib = None


def _build(out_path: str) -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-o", out_path, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def load_mas_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    so_path = os.path.join(_HERE, "libmas.so")
    if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(_SRC):
        try:
            _build(so_path)
        except (OSError, subprocess.CalledProcessError):
            so_path = os.path.join(tempfile.mkdtemp(prefix="vosk_tts_tpu_"), "libmas.so")
            _build(so_path)
    lib = ctypes.CDLL(so_path)
    lib.maximum_path_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.maximum_path_batch.restype = None
    _lib = lib
    return lib


def maximum_path_cpp(neg_cent: np.ndarray, t_ys: np.ndarray, t_xs: np.ndarray) -> np.ndarray:
    """neg_cent: (B, T_y, T_x) float32 -> one-hot path (B, T_y, T_x) int32."""
    lib = load_mas_library()
    value = np.ascontiguousarray(neg_cent, dtype=np.float32).copy()
    b, t_y, t_x = value.shape
    path = np.zeros((b, t_y, t_x), dtype=np.int32)
    t_ys = np.ascontiguousarray(t_ys, dtype=np.int32)
    t_xs = np.ascontiguousarray(t_xs, dtype=np.int32)
    lib.maximum_path_batch(
        path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        value.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b,
        t_y,
        t_x,
    )
    return path
