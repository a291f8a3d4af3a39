"""ctypes bindings for the native host-side data kernels.

Compiles ``native/stroke_raster.cpp`` with g++ on first use (cached .so in
the native/ directory); every entry point has a numpy fallback in
data/curves.py, so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libstroke_raster.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "stroke_raster.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             _SRC_PATH, "-o", _SO_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning(f"native build failed ({e}); using numpy fallback")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None on failure."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.isfile(_SO_PATH) or (
                os.path.isfile(_SRC_PATH) and
                os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)):
            if not os.path.isfile(_SRC_PATH) or not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.bse_draw_stroke.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float)]
            lib.bse_gaussian_blur.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.POINTER(ctypes.c_float)]
            lib.bse_triband.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_float,
                ctypes.POINTER(ctypes.c_uint8)]
            _lib = lib
        except OSError as e:
            logger.warning(f"native load failed ({e}); numpy fallback")
            _load_failed = True
    return _lib


def available() -> bool:
    return get_lib() is not None


def draw_stroke_native(width: int, pts: np.ndarray, radius: float,
                       soft_edge: float = 1.0) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(pts, np.float32)
    out = np.empty((width, width), np.float32)
    lib.bse_draw_stroke(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pts.shape[0], ctypes.c_float(radius), ctypes.c_float(soft_edge),
        width, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def triband_native(gray: np.ndarray, blur_sigma: float = 2.0,
                   threshold: float = 0.5) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    gray = np.ascontiguousarray(gray, np.float32)
    h, w = gray.shape
    out = np.empty((h, w, 3), np.uint8)
    lib.bse_triband(
        gray.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        ctypes.c_float(blur_sigma), ctypes.c_float(threshold),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def gaussian_blur_native(img: np.ndarray, sigma: float
                         ) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    h, w = img.shape
    out = np.empty((h, w), np.float32)
    lib.bse_gaussian_blur(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        ctypes.c_float(sigma),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
