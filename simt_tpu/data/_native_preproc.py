"""ctypes bindings for the native preprocessing library (data/_native/preproc.cpp).

Builds on first import if the shared library is missing (g++ is in the image; no pip).
Pillow-exact: bicubic resize is bit-identical to PIL's u8 resample path, nearest matches
PIL's floor((i+0.5)*scale) sampling. Used by the input pipeline as a fast path; the PIL
path remains the fallback (``SegDataset`` semantics are identical either way).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "_native")
_LIB_PATH = os.path.join(_DIR, "libsimt_preproc.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(["make", "-s", "-C", _DIR], check=True)


def load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.simt_resize_bicubic_u8.argtypes = [u8p] + [ctypes.c_int] * 3 + [u8p] + [ctypes.c_int] * 2
        lib.simt_resize_bicubic_u8.restype = ctypes.c_int
        lib.simt_resize_nearest_u8.argtypes = [u8p] + [ctypes.c_int] * 3 + [u8p] + [ctypes.c_int] * 2
        lib.simt_resize_nearest_u8.restype = ctypes.c_int
        lib.simt_bgr_meansub_f32.argtypes = [u8p, ctypes.c_int, ctypes.c_int, f32p, f32p, ctypes.c_int]
        lib.simt_bgr_meansub_f32.restype = ctypes.c_int
        lib.simt_preprocess_image.argtypes = (
            [u8p] + [ctypes.c_int] * 2 + [f32p] + [ctypes.c_int] * 2 + [f32p, ctypes.c_int]
        )
        lib.simt_preprocess_image.restype = ctypes.c_int
        _lib = lib
        return lib


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_bicubic(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """u8 HWC (or HW) bicubic resize, Pillow-exact."""
    lib = load()
    squeeze = src.ndim == 2
    if squeeze:
        src = src[:, :, None]
    src = np.ascontiguousarray(src, np.uint8)
    sh, sw, ch = src.shape
    dst = np.empty((dh, dw, ch), np.uint8)
    rc = lib.simt_resize_bicubic_u8(_u8(src), sh, sw, ch, _u8(dst), dh, dw)
    if rc != 0:
        raise RuntimeError(f"simt_resize_bicubic_u8 failed: {rc}")
    return dst[:, :, 0] if squeeze else dst


def resize_nearest(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """u8 HWC (or HW) nearest resize, Pillow-exact."""
    lib = load()
    squeeze = src.ndim == 2
    if squeeze:
        src = src[:, :, None]
    src = np.ascontiguousarray(src, np.uint8)
    sh, sw, ch = src.shape
    dst = np.empty((dh, dw, ch), np.uint8)
    rc = lib.simt_resize_nearest_u8(_u8(src), sh, sw, ch, _u8(dst), dh, dw)
    if rc != 0:
        raise RuntimeError(f"simt_resize_nearest_u8 failed: {rc}")
    return dst[:, :, 0] if squeeze else dst


def preprocess_image(
    src_rgb: np.ndarray, dh: int, dw: int, mean_bgr: Sequence[float], mirror: bool = False
) -> np.ndarray:
    """Fused u8 RGB HWC -> bicubic resize -> BGR, mean-sub, mirror -> f32 HWC."""
    lib = load()
    src_rgb = np.ascontiguousarray(src_rgb, np.uint8)
    sh, sw, ch = src_rgb.shape
    if ch != 3:
        raise ValueError(f"expected RGB HWC, got {src_rgb.shape}")
    dst = np.empty((dh, dw, 3), np.float32)
    mean = np.asarray(mean_bgr, np.float32)
    rc = lib.simt_preprocess_image(_u8(src_rgb), sh, sw, _f32(dst), dh, dw, _f32(mean),
                                   int(mirror))
    if rc != 0:
        raise RuntimeError(f"simt_preprocess_image failed: {rc}")
    return dst
