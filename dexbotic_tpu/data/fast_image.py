"""ctypes bindings for the native C++ image-preprocessing kernel.

Builds csrc/fast_image.cpp on first use (g++, cached next to the source);
falls back cleanly when no compiler is available — callers should use
`preprocess_batch_fast` which mirrors `preprocess_image` semantics for
batches of identically-sized uint8 frames.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "csrc")


def _build_and_load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        src = os.path.join(_CSRC, "fast_image.cpp")
        so = os.path.join(_CSRC, "libfastimage.so")
        if not os.path.exists(src):
            raise FileNotFoundError(src)
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", so, src, "-lpthread"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.preprocess_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.expand2square_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _LIB = lib
        return lib


def available() -> bool:
    try:
        _build_and_load()
        return True
    except Exception:  # noqa: BLE001
        return False


def preprocess_batch_fast(
    images: np.ndarray,  # uint8 [B, H, W, 3]
    size: int,
    mean=(0.5, 0.5, 0.5),
    std=(0.5, 0.5, 0.5),
    num_threads: int = 8,
) -> np.ndarray:
    """Fused bilinear resize + rescale + normalize -> float32 [B, size, size, 3]."""
    lib = _build_and_load()
    images = np.ascontiguousarray(images, dtype=np.uint8)
    b, h, w, c = images.shape
    assert c == 3
    out = np.empty((b, size, size, 3), np.float32)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    lib.preprocess_batch(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        b, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        size, size,
        mean_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    return out


def expand2square_fast(image: np.ndarray, fill=(0, 0, 0)) -> np.ndarray:
    lib = _build_and_load()
    image = np.ascontiguousarray(image, dtype=np.uint8)
    h, w, _ = image.shape
    side = max(h, w)
    out = np.empty((side, side, 3), np.uint8)
    fill_a = np.asarray(fill, np.uint8)
    lib.expand2square_u8(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), side,
        fill_a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out
