"""ctypes bindings for the native host-preprocessing library.

Builds lazily (``make``) on first use; falls back to None when no toolchain
is available so the pure-python/cv2 path keeps working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libyolo_preprocess.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR], check=True, capture_output=True
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.letterbox_u8.restype = ctypes.c_float
    lib.letterbox_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_uint8,
    ]
    lib.letterbox_batch_u8.restype = None
    lib.letterbox_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_uint8, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return load_library() is not None


def letterbox_u8(
    img: np.ndarray, size: Tuple[int, int], pad_value: int = 114
) -> Tuple[np.ndarray, float]:
    """Native letterbox of one HWC uint8 image to (th, tw)."""
    lib = load_library()
    assert lib is not None, "native library unavailable"
    img = np.ascontiguousarray(img, np.uint8)
    th, tw = size
    out = np.empty((th, tw, 3), np.uint8)
    scale = lib.letterbox_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        th, tw, pad_value,
    )
    return out, float(scale)


def letterbox_batch_u8(
    images, size: Tuple[int, int], pad_value: int = 114,
    num_threads: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Native multithreaded batch letterbox -> ([N, th, tw, 3] u8, scales)."""
    lib = load_library()
    assert lib is not None, "native library unavailable"
    n = len(images)
    th, tw = size
    images = [np.ascontiguousarray(im, np.uint8) for im in images]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for im in images]
    )
    shapes = np.asarray(
        [[im.shape[0], im.shape[1]] for im in images], np.int32
    ).ravel()
    out = np.empty((n, th, tw, 3), np.uint8)
    scales = np.empty((n,), np.float32)
    lib.letterbox_batch_u8(
        ptrs,
        shapes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        th, tw, pad_value,
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    return out, scales
