"""ctypes binding for the native data runtime (runtime/libmatryio.so).

libmatryio does JPEG decode + fractional-box (resize_area) resampling +
threaded batch loading in C++ — the counterpart of the TF-runtime kernels
the reference leans on (tf.image.decode_jpeg / resize_area / tf.data's
parallel map). Falls back to the PIL path transparently when the shared
library hasn't been built (`make -C runtime`); `native_available()` tells
you which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "runtime")


def _try_build() -> bool:
    """Best-effort build of the shared library (g++ + libjpeg)."""
    try:
        subprocess.run(["make", "-C", _RUNTIME_DIR], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so_path = os.path.join(_RUNTIME_DIR, "libmatryio.so")
    if not os.path.exists(so_path):
        if not _try_build():
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.matryio_decode_resize.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.matryio_decode_resize.restype = ctypes.c_int
    lib.matryio_decode_resize_opt.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.matryio_decode_resize_opt.restype = ctypes.c_int
    lib.matryio_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    lib.matryio_load_batch.restype = ctypes.c_int
    lib.matryio_version.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def decode_resize(path: str, height: int, width: int,
                  fast: bool = True) -> np.ndarray:
    """Decode + area-resize one JPEG -> float32 [H, W, 3] in [0, 1].

    fast=True uses DCT-domain scaled decoding (decode at >= target size
    then box-resize) — ~4x faster for big-to-small pipelines, with a
    slightly different (DCT truncation) prefilter. fast=False decodes at
    full resolution first, matching the PIL/TF reference path closely.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libmatryio not available")
    out = np.empty((height, width, 3), np.float32)
    rc = lib.matryio_decode_resize_opt(
        path.encode(), height, width, 1 if fast else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"matryio failed to decode {path} (rc={rc})")
    return out


def load_batch(paths: List[str], height: int, width: int,
               n_threads: int = 8) -> np.ndarray:
    """Decode + resize a batch in native threads -> [N, H, W, 3]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libmatryio not available")
    n = len(paths)
    out = np.empty((n, height, width, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.matryio_load_batch(
        arr, n, height, width, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if failures:
        raise IOError(f"matryio: {failures}/{n} images failed to load")
    return out
