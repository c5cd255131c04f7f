"""ctypes bindings for the native runtime library (native/cpt_native.cpp).

Loads (building on first use if a toolchain is present) the C++ image-export
fast path and the wang_hash cross-check oracle.  Everything degrades
gracefully: ``available()`` is False when no compiler/library exists and
callers fall back to the pure-Python implementations in io/png.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libcpt_native.so"))

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "cpt_native.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, src, "-lz"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.cpt_hdr_to_rgba8.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_float,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.cpt_encode_png_rgba.restype = ctypes.c_void_p
        lib.cpt_encode_png_rgba.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.cpt_free.argtypes = [ctypes.c_void_p]
        lib.cpt_wang_hash.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_size_t,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def hdr_to_rgba8_native(img: np.ndarray, gamma: float = 2.2, flip_y: bool = True) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    img = np.ascontiguousarray(img, np.float32)
    h, w = img.shape[:2]
    out = np.empty((h, w, 4), np.uint8)
    lib.cpt_hdr_to_rgba8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h,
        w,
        ctypes.c_float(gamma),
        1 if flip_y else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def encode_png_rgba_native(rgba: np.ndarray, compress_level: int = 6) -> bytes:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    rgba = np.ascontiguousarray(rgba, np.uint8)
    h, w = rgba.shape[:2]
    out_len = ctypes.c_size_t(0)
    ptr = lib.cpt_encode_png_rgba(
        rgba.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        compress_level,
        ctypes.byref(out_len),
    )
    if not ptr:
        raise RuntimeError("native png encode failed")
    try:
        return ctypes.string_at(ptr, out_len.value)
    finally:
        lib.cpt_free(ptr)


def wang_hash_native(seeds: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    seeds = np.ascontiguousarray(seeds, np.uint32)
    out = np.empty_like(seeds)
    lib.cpt_wang_hash(
        seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        seeds.size,
    )
    return out
