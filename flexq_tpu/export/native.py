"""ctypes binding for the native quantize+pack library (native/packlib.cpp).

Builds lazily with g++ on first use; falls back to the NumPy implementation
if no toolchain is present. The native path matters for 70B-class exports:
per-group quantize + bit-pack over ~140 GB of weights is memory-bandwidth
work that OpenMP handles at streaming speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "packlib.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libflexqpack.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        path = _build()
        if path:
            lib = ctypes.CDLL(path)
            i8p = ctypes.POINTER(ctypes.c_int8)
            f32p = ctypes.POINTER(ctypes.c_float)
            i64 = ctypes.c_int64
            lib.flexq_pack6.argtypes = [i8p, i8p, i8p, i64, i64]
            lib.flexq_group_quant.argtypes = [f32p, i8p, f32p, i64, i64, ctypes.c_int]
            lib.flexq_quant_pack6.argtypes = [f32p, i8p, i8p, f32p, i8p, i64, i64]
            lib.flexq_pack4.argtypes = [i8p, i8p, i64, i64]
            lib.flexq_quant_pack4.argtypes = [f32p, i8p, f32p, i8p, i64, i64]
            lib.flexq_num_threads.restype = ctypes.c_int
            _lib = lib
    return _lib


def _i8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def quant_pack6(
    w: np.ndarray, bits: int = 6
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """f32/f16 [K, N] -> (hi [K/2,N] int8, lo [K/4,N] int8, scale [K/128,N] f32).

    Uses the native library when available; NumPy otherwise. For bits != 6
    (mixed policies storing e.g. W8 layers) only the quantize step applies —
    callers should not pack non-6-bit weights.
    """
    from flexq_tpu.packing.pack6 import pack6_np

    w = np.ascontiguousarray(w, np.float32)
    k, n = w.shape
    assert k % 128 == 0
    lib = get_lib()
    if lib is not None and bits == 6:
        hi = np.empty((k // 2, n), np.int8)
        lo = np.empty((k // 4, n), np.int8)
        scale = np.empty((k // 128, n), np.float32)
        scratch = np.empty((k, n), np.int8)
        lib.flexq_quant_pack6(_f32p(w), _i8p(hi), _i8p(lo), _f32p(scale), _i8p(scratch), k, n)
        return hi, lo, scale
    # NumPy fallback
    q, scale = group_quant_np(w, bits)
    hi, lo = pack6_np(q)
    return hi, lo, scale


def quant_pack4(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """f32/f16 [K, N] -> (plane [K/2,N] int8, scale [K/128,N] f32) for the
    W4 weight-only path. Native library when available; NumPy otherwise."""
    from flexq_tpu.packing.pack4 import pack4_np

    w = np.ascontiguousarray(w, np.float32)
    k, n = w.shape
    assert k % 128 == 0
    lib = get_lib()
    if lib is not None:
        plane = np.empty((k // 2, n), np.int8)
        scale = np.empty((k // 128, n), np.float32)
        scratch = np.empty((k, n), np.int8)
        lib.flexq_quant_pack4(_f32p(w), _i8p(plane), _f32p(scale), _i8p(scratch), k, n)
        return plane, scale
    q, scale = group_quant_np(w, 4)
    return pack4_np(q), scale


def group_quant_np(w: np.ndarray, bits: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-group(128)-along-K symmetric quant of [K, N] (NumPy).

    Input is forced C-contiguous first: callers pass transposed HF views,
    and numpy ufuncs otherwise propagate F-order into q (order='K'), which
    safetensors save_file then serializes raw-buffer-wise (stride-blind)."""
    w = np.ascontiguousarray(w)
    k, n = w.shape
    qmax = 2 ** (bits - 1) - 1
    wg = w.reshape(k // 128, 128, n)
    amax = np.abs(wg).max(axis=1)
    scale = np.clip(amax / qmax, 1e-5, 1e4)  # [K/128, N]
    q = np.rint(wg / scale[:, None, :])
    q = np.clip(q, -(qmax + 1), qmax).astype(np.int8)
    return q.reshape(k, n), np.ascontiguousarray(scale.astype(np.float32))
