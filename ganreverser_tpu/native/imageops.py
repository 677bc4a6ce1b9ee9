"""ctypes bindings for the native image-ops library (imageops.cc).

The shared library is built on first use with the system g++ (cached next to
the source); every entry point has a numpy fallback so the framework works
without a compiler. ``available()`` reports which path is active.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "imageops.cc")
_LIB = os.path.join(_HERE, "libimageops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_f32p = ctypes.POINTER(ctypes.c_float)


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return _LIB
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _LIB if os.path.exists(_LIB) else _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.resize_bilinear_batch.argtypes = [
            _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _f32p, ctypes.c_int, ctypes.c_int]
        lib.rgb2y.argtypes = [_f32p, ctypes.c_long, _f32p]
        lib.rgb2yuv.argtypes = [_f32p, ctypes.c_long, _f32p]
        lib.yuv2rgb.argtypes = [_f32p, ctypes.c_long, _f32p]
        lib.normalize_pm1.argtypes = [_f32p, ctypes.c_long]
        lib.assemble_grid.argtypes = [
            _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_f32p)


def _c32(a) -> np.ndarray:
    return np.ascontiguousarray(a, np.float32)


def resize_bilinear_batch(images: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """(n, sh, sw, c) float32 -> (n, dh, dw, c); native when possible."""
    images = _c32(images)
    n, sh, sw, c = images.shape
    lib = _load()
    if lib is None:
        return _resize_numpy(images, dh, dw)
    out = np.empty((n, dh, dw, c), np.float32)
    lib.resize_bilinear_batch(_ptr(images), n, sh, sw, c, _ptr(out), dh, dw)
    return out


def _resize_numpy(images: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """Vectorized numpy bilinear, same align-corners=false convention."""
    n, sh, sw, c = images.shape
    fy = (np.arange(dh, dtype=np.float32) + 0.5) * (sh / dh) - 0.5
    fx = (np.arange(dw, dtype=np.float32) + 0.5) * (sw / dw) - 0.5
    y0 = np.floor(fy).astype(np.int64)
    x0 = np.floor(fx).astype(np.int64)
    wy = (fy - y0)[None, :, None, None]
    wx = (fx - x0)[None, None, :, None]
    y0c = np.clip(y0, 0, sh - 1)
    y1c = np.clip(y0 + 1, 0, sh - 1)
    x0c = np.clip(x0, 0, sw - 1)
    x1c = np.clip(x0 + 1, 0, sw - 1)
    p00 = images[:, y0c][:, :, x0c]
    p01 = images[:, y0c][:, :, x1c]
    p10 = images[:, y1c][:, :, x0c]
    p11 = images[:, y1c][:, :, x1c]
    top = p00 * (1 - wx) + p01 * wx
    bot = p10 * (1 - wx) + p11 * wx
    return (top * (1 - wy) + bot * wy).astype(np.float32)


def rgb2y_native(images: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    images = _c32(images)
    out = np.empty(images.shape[:-1] + (1,), np.float32)
    lib.rgb2y(_ptr(images), images.size // 3, _ptr(out))
    return out


def rgb2yuv_native(images: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    images = _c32(images)
    out = np.empty_like(images)
    lib.rgb2yuv(_ptr(images), images.size // 3, _ptr(out))
    return out


def yuv2rgb_native(images: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    images = _c32(images)
    out = np.empty_like(images)
    lib.yuv2rgb(_ptr(images), images.size // 3, _ptr(out))
    return out


def normalize_pm1_inplace(images: np.ndarray) -> bool:
    """In-place [0,1]->[-1,1]+clamp; returns False if numpy fallback needed."""
    lib = _load()
    if lib is None or images.dtype != np.float32 or \
            not images.flags.c_contiguous:
        return False
    lib.normalize_pm1(_ptr(images), images.size)
    return True


def assemble_grid(images: np.ndarray, gh: int, gw: int,
                  strip: int = 0) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    images = _c32(images)
    n, ih, iw, c = images.shape
    out = np.empty((gh * ih + strip, gw * iw, c), np.float32)
    lib.assemble_grid(_ptr(images), n, ih, iw, c, _ptr(out), gh, gw, strip)
    return out
