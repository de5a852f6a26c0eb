"""ctypes bindings for the native host data-plane kernels (native/).

Loads ``libssd_augment.so``; builds it on first use when a toolchain is
present (``make -C native``). Every entry point has a numpy fallback in
:mod:`ssds_tpu.data.augment`, which also serves as the distribution oracle
for the tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libssd_augment.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and os.path.exists(
            os.path.join(_NATIVE_DIR, "Makefile")
        ):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR], check=True,
                    capture_output=True, timeout=120,
                )
            except Exception:
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ssd_sample_crop.restype = ctypes.c_int
        lib.ssd_sample_crop.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.ssd_crop_boxes.restype = None
        lib.ssd_crop_boxes.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def sample_crop(
    boxes: np.ndarray, width: int, height: int, seed: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native IoU-constrained crop sampling.

    Returns (roi [4] float32 pixels, center-mask [n] bool) when a crop was
    chosen, None for the passthrough path. Raises RuntimeError if the native
    library is unavailable (callers check :func:`available` first).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    boxes = np.ascontiguousarray(boxes, np.float32)
    n = boxes.shape[0]
    roi = np.zeros(4, np.float32)
    mask = np.zeros(n, np.uint8)
    hit = lib.ssd_sample_crop(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        int(width), int(height), ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF),
        roi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if not hit:
        return None
    return roi, mask.astype(bool)


def crop_boxes(boxes: np.ndarray, roi: np.ndarray) -> np.ndarray:
    """Translate+clip boxes into the ROI (native, in place on a copy)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    out = np.ascontiguousarray(boxes, np.float32).copy()
    roi = np.ascontiguousarray(roi, np.float32)
    lib.ssd_crop_boxes(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.shape[0],
        roi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
