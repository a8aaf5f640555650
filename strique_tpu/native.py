"""ctypes bindings for the native host runtime (native/strique_native.cpp).

Builds the shared library on first use if a compiler is available;
callers fall back to the NumPy implementations when the library is
missing.  No pybind11 — plain C ABI.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libstrique_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_NATIVE_DIR, "strique_native.cpp")
    stale = (os.path.exists(src) and os.path.exists(_LIB_PATH)
             and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
    if (not os.path.exists(_LIB_PATH) or stale) and os.path.exists(src):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-B"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.preprocess_read.argtypes = [dp, ctypes.c_int64, dp, dp, dp]
    lib.preprocess_read.restype = None
    fp = ctypes.POINTER(ctypes.c_float)
    up = ctypes.POINTER(ctypes.c_uint8)
    lib.preprocess_read_lut.argtypes = [dp, ctypes.c_int64, dp, fp, dp, up, fp]
    lib.preprocess_read_lut.restype = None
    lib.align_semiglobal_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8)]
    lib.align_semiglobal_f32.restype = ctypes.c_float
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def preprocess_read(raw: np.ndarray, model_const: tuple) -> tuple[np.ndarray, np.ndarray]:
    """Native per-read preprocessing: raw signal -> (morph_n, flt_n) float64."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    rawd = np.ascontiguousarray(raw, dtype=np.float64)
    n = len(rawd)
    model = np.asarray(model_const, dtype=np.float64)
    morph_n = np.empty(n, np.float64)
    flt_n = np.empty(n, np.float64)
    lib.preprocess_read(
        rawd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        model.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        morph_n.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        flt_n.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return morph_n, flt_n


def preprocess_read_lut(raw: np.ndarray, model_const: tuple,
                        flt32_out: np.ndarray, q_out: np.ndarray,
                        lut_out: np.ndarray) -> np.ndarray:
    """Native upload-oriented preprocessing.

    Writes flt32 (float32), morph quantization bins (uint8), and the
    256-entry float32 morph level table into the caller's buffers (which
    may be views into a batch upload buffer); returns flt float64 for
    host-side exact log-p computation.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    rawd = np.ascontiguousarray(raw, dtype=np.float64)
    n = len(rawd)
    model = np.asarray(model_const, dtype=np.float64)
    flt64 = np.empty(n, np.float64)
    assert flt32_out.dtype == np.float32 and flt32_out.flags.c_contiguous
    assert q_out.dtype == np.uint8 and q_out.flags.c_contiguous
    assert lut_out.dtype == np.float32 and len(lut_out) == 256
    lib.preprocess_read_lut(
        rawd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        model.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        flt32_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        flt64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        q_out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lut_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return flt64


def align_semiglobal(a: np.ndarray, b: np.ndarray, params) -> tuple[float, np.ndarray, np.ndarray]:
    """Native CPU aligner: returns (score, pos (m,) int64, gap (m,) bool)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    a32 = np.ascontiguousarray(a, dtype=np.float32)
    b32 = np.ascontiguousarray(b, dtype=np.float32)
    pos = np.empty(len(b32), np.int64)
    gap = np.empty(len(b32), np.uint8)
    score = lib.align_semiglobal_f32(
        a32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(a32),
        b32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(b32),
        params.dist_offset, params.dist_min, params.gap_open_h, params.gap_open_v,
        params.gap_extension_h, params.gap_extension_v,
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        gap.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return float(score), pos, gap.astype(bool)
