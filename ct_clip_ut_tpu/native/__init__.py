"""ctypes bindings for the native (C++) preprocessing library.

Builds lazily via the bundled Makefile if the shared object is missing.
All entry points degrade gracefully: `available()` is False when no
toolchain exists and callers fall back to the JAX path
(data/preprocess.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libctpreproc.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_HERE)], check=True,
                       capture_output=True)
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.ct_preprocess_fused.restype = ctypes.c_int
    lib.ct_preprocess_fused.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        f32p, ctypes.c_int]
    lib.ct_resize_fused.restype = ctypes.c_int
    lib.ct_resize_fused.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float,
        f32p, ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def preprocess_ctclip(raw_hwd: np.ndarray, slope: float, intercept: float,
                      z_spacing: float, xy_spacing: float,
                      target_spacing=(1.5, 0.75, 0.75),
                      target_shape_hwd=(480, 480, 240),
                      hu_min: float = -1000.0, hu_max: float = 1000.0,
                      pad_value: float = -1.0,
                      num_threads: Optional[int] = None) -> np.ndarray:
    """Fused ctclip chain -> [1, tD, tH, tW] float32 (parity with
    data/preprocess.process_volume, model_type='ctclip')."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    raw = np.ascontiguousarray(raw_hwd, np.float32)
    H, W, D = raw.shape
    tH, tW, tD = target_shape_hwd
    out = np.empty((tD, tH, tW), np.float32)
    nt = num_threads or min(16, os.cpu_count() or 4)
    rc = lib.ct_preprocess_fused(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), H, W, D,
        slope, intercept, z_spacing, xy_spacing,
        target_spacing[0], target_spacing[1],
        tH, tW, tD, hu_min, hu_max, pad_value,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nt)
    if rc != 0:
        raise RuntimeError(f"ct_preprocess_fused failed rc={rc}")
    return out[None]


def preprocess_ctgenerate(raw_hwd: np.ndarray, slope: float, intercept: float,
                          out_shape=(201, 128, 128),
                          hu_min: float = -1000.0, hu_max: float = 1000.0,
                          num_threads: Optional[int] = None) -> np.ndarray:
    """Fused ctgenerate chain -> [1, oD, oH, oW] float32."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    raw = np.ascontiguousarray(raw_hwd, np.float32)
    H, W, D = raw.shape
    oD, oH, oW = out_shape
    out = np.empty((oD, oH, oW), np.float32)
    nt = num_threads or min(16, os.cpu_count() or 4)
    rc = lib.ct_resize_fused(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), H, W, D,
        slope, intercept, oD, oH, oW, hu_min, hu_max,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nt)
    if rc != 0:
        raise RuntimeError(f"ct_resize_fused failed rc={rc}")
    return out[None]
