"""ctypes bindings for the native data-loader core (loader.cc).

The reference's input pipeline rides torch's C++ DataLoader workers +
libjpeg-turbo; this package is the framework's native equivalent: batched
JPEG decode and InternVL2 image preprocessing in C++/OpenMP, called through
ctypes (which drops the GIL for the call, so Python-side prefetch threads
scale past one core).

Usage is always optional: `available()` is False when the shared library
is missing and cannot be built, and every caller falls back to the
cv2/numpy path (data/image_pipe.py). Auto-build on first import is
attempted once when g++ is present (set SIMLINGO_NATIVE=0 to disable the
native path entirely, =build to force a rebuild).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsimlingo_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-s", "-C", _DIR],
                           capture_output=True, text=True, timeout=120)
        return r.returncode == 0 and os.path.exists(_SO)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        mode = os.environ.get("SIMLINGO_NATIVE", "1")
        if mode == "0":
            return None
        if mode == "build" or not os.path.exists(_SO):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        c_ubyte_p = ctypes.POINTER(ctypes.c_ubyte)
        lib.sl_version.restype = ctypes.c_int
        lib.sl_jpeg_dims.restype = ctypes.c_int
        lib.sl_jpeg_dims.argtypes = [c_ubyte_p, ctypes.c_size_t,
                                     ctypes.POINTER(ctypes.c_int),
                                     ctypes.POINTER(ctypes.c_int)]
        lib.sl_decode_jpeg_batch.restype = ctypes.c_int
        lib.sl_decode_jpeg_batch.argtypes = [
            ctypes.POINTER(c_ubyte_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int, c_ubyte_p, ctypes.c_int, ctypes.c_int]
        lib.sl_preprocess_jpeg_batch.restype = ctypes.c_int
        lib.sl_preprocess_jpeg_batch.argtypes = [
            ctypes.POINTER(c_ubyte_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.sl_decode_crop_batch.restype = ctypes.c_int
        lib.sl_decode_crop_batch.argtypes = [
            ctypes.POINTER(c_ubyte_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, c_ubyte_p]
        if lib.sl_version() != 1:
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _buf_arrays(blobs: Sequence[bytes]):
    n = len(blobs)
    c_ubyte_p = ctypes.POINTER(ctypes.c_ubyte)
    ptrs = (c_ubyte_p * n)()
    lens = (ctypes.c_size_t * n)()
    # keep a reference to each bytes object alive for the call duration
    for i, b in enumerate(blobs):
        ptrs[i] = ctypes.cast(ctypes.c_char_p(b), c_ubyte_p)
        lens[i] = len(b)
    return ptrs, lens


def jpeg_dims(blob: bytes) -> Tuple[int, int]:
    lib = _load()
    assert lib is not None
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.sl_jpeg_dims(
        ctypes.cast(ctypes.c_char_p(blob), ctypes.POINTER(ctypes.c_ubyte)),
        len(blob), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise ValueError(f"sl_jpeg_dims failed rc={rc}")
    return h.value, w.value


def decode_jpeg_batch(blobs: Sequence[bytes], h: int, w: int) -> np.ndarray:
    """n same-sized JPEG byte strings -> [n, h, w, 3] uint8 RGB."""
    lib = _load()
    assert lib is not None
    out = np.empty((len(blobs), h, w, 3), np.uint8)
    ptrs, lens = _buf_arrays(blobs)
    rc = lib.sl_decode_jpeg_batch(
        ptrs, lens, len(blobs),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w)
    if rc != 0:
        raise ValueError(f"sl_decode_jpeg_batch failed rc={rc}")
    return out


def preprocess_jpeg_batch(blobs: Sequence[bytes], src_h: int, src_w: int,
                          image_size: int = 448, grid: Tuple[int, int] = (2, 1),
                          do_bottom_crop: bool = True) -> np.ndarray:
    """JPEG bytes -> [n, gh*gw, S, S, 3] float32, normalized (cv2-path parity).

    grid is (gw, gh) as in image_pipe.device_grid_for.
    """
    lib = _load()
    assert lib is not None
    gw, gh = grid
    out = np.empty((len(blobs), gh * gw, image_size, image_size, 3),
                   np.float32)
    ptrs, lens = _buf_arrays(blobs)
    rc = lib.sl_preprocess_jpeg_batch(
        ptrs, lens, len(blobs), src_h, src_w, image_size, gw, gh,
        1 if do_bottom_crop else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError(f"sl_preprocess_jpeg_batch failed rc={rc}")
    return out


def decode_crop_batch(blobs: Sequence[bytes], src_h: int, src_w: int,
                      do_bottom_crop: bool = True) -> np.ndarray:
    """JPEG bytes -> [n, ch, w, 3] uint8 (hood-cropped) for the fused
    on-device preprocess path."""
    lib = _load()
    assert lib is not None
    ch = int(src_h - (src_h * 4.8) // 16) if do_bottom_crop else src_h
    out = np.empty((len(blobs), ch, src_w, 3), np.uint8)
    ptrs, lens = _buf_arrays(blobs)
    rc = lib.sl_decode_crop_batch(
        ptrs, lens, len(blobs), src_h, src_w, 1 if do_bottom_crop else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc != 0:
        raise ValueError(f"sl_decode_crop_batch failed rc={rc}")
    return out
