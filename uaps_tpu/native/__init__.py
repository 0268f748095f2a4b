"""Native host-ops library loader (ctypes) with numpy fallback.

Builds uaps_tpu/native/libuaps_host.so from host_ops.cc on first use
(g++ -O3 -fopenmp); if the toolchain or compiled library is unavailable,
`lib()` returns None and callers fall back to the numpy implementations in
uaps_tpu.data.augment / uaps_tpu.utils.rle.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "host_ops.cc")
_SO = os.path.join(_DIR, "libuaps_host.so")
_lock = threading.Lock()
_lib = None
_tried = False


def build(force: bool = False) -> Optional[str]:
    """Compile the shared library; returns its path or None."""
    if os.path.exists(_SO) and not force \
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        try:  # retry without -march=native / openmp (portability)
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", _SO,
                            _SRC], check=True, capture_output=True,
                           timeout=120)
            return _SO
        except Exception:
            return None


def lib() -> Optional[ctypes.CDLL]:
    """The loaded CDLL with argtypes set, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = build()
        if so is None:
            return None
        try:
            L = ctypes.CDLL(so)
        except OSError:
            return None
        import numpy as np
        from numpy.ctypeslib import ndpointer
        i64, i32 = ctypes.c_int64, ctypes.c_int32
        u8p = ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = ndpointer(np.int32, flags="C_CONTIGUOUS")
        L.uaps_normalize_batch.argtypes = [u8p, f32p, i64, i64, i64, i64,
                                           f32p, f32p]
        L.uaps_transform_batch.argtypes = [u8p, f32p, i64, i64, i64, i64,
                                           i64, i64, i32p, f32p, f32p]
        L.uaps_transform_mask.argtypes = [u8p, i32p, i64, i64, i64, i64,
                                          i64, i32p, ctypes.c_int]
        L.uaps_rle_encode.argtypes = [u8p, i64, i64, i32p, i64]
        L.uaps_rle_encode.restype = i64
        L.uaps_version.restype = ctypes.c_int
        _lib = L
        return _lib


def normalize_batch(src, mean, std):
    """uint8 NHWC -> float32 normalized NHWC (native, numpy fallback)."""
    import numpy as np
    L = lib()
    n, h, w, c = src.shape
    if L is None:
        x = src.astype(np.float32) / 255.0
        return ((x - np.asarray(mean, np.float32))
                / np.asarray(std, np.float32))
    src = np.ascontiguousarray(src)
    dst = np.empty((n, h, w, c), np.float32)
    L.uaps_normalize_batch(src, dst, n, h, w, c,
                           np.asarray(mean, np.float32),
                           np.asarray(std, np.float32))
    return dst


def rle_encode(mask) -> str:
    """Column-major RLE string (native, numpy fallback)."""
    import numpy as np
    L = lib()
    if L is None:
        from uaps_tpu.utils.rle import mask2rle
        return mask2rle(mask)
    m = np.ascontiguousarray((np.asarray(mask) != 0).astype(np.uint8))
    h, w = m.shape
    out = np.empty(h * w + 2, np.int32)
    n = L.uaps_rle_encode(m, h, w, out, out.size)
    return " ".join(str(int(v)) for v in out[:n])
