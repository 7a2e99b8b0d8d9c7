"""Image IO for the data pipeline: native (C++/libjpeg) decode with cv2 fallback.

The reference reads training frames through PIL/cv2 inside torch DataLoader
worker *processes* (dataset_base.py uses cv2.imread per sample); this
framework prefetches with *threads* (train/trainer.py Prefetcher), so the
decode must drop the GIL to scale -- the native loader
(simlingo_tpu/native/loader.cc) does, via ctypes. Falls back to cv2 when the
shared library is unavailable (SIMLINGO_NATIVE=0 forces the fallback).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _native():
    if os.environ.get("SIMLINGO_NATIVE", "1") == "0":
        return None
    from simlingo_tpu import native
    return native if native.available() else None


def load_rgb(path: str) -> np.ndarray:
    """JPEG file -> uint8 HWC RGB array."""
    nat = _native()
    if nat is not None:
        try:
            with open(path, "rb") as f:
                blob = f.read()
            h, w = nat.jpeg_dims(blob)
            return nat.decode_jpeg_batch([blob], h, w)[0]
        except (ValueError, OSError):
            pass  # corrupt/unsupported stream: let cv2 give its verdict
    import cv2
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"unreadable image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def load_rgb_preprocessed(path: str, image_size: int = 448,
                          max_num_grid: int = 2, do_bottom_crop: bool = True
                          ) -> Optional[np.ndarray]:
    """Whole decode->crop->resize->normalize->tile path in one native call.

    Matches image_pipe.preprocess_numpy (same closest-aspect-ratio grid
    selection). Returns None when the native loader is unavailable (caller
    falls back to load_rgb + preprocess_numpy). Only valid when no CPU-side
    augmentation sits between decode and preprocess.
    """
    nat = _native()
    if nat is None:
        return None
    try:
        with open(path, "rb") as f:
            blob = f.read()
        h, w = nat.jpeg_dims(blob)
        from simlingo_tpu.data.image_pipe import device_grid_for
        grid = device_grid_for(w, h, image_size, max_num=max_num_grid,
                               do_bottom_crop=do_bottom_crop)
        return nat.preprocess_jpeg_batch([blob], h, w, image_size=image_size,
                                         grid=grid,
                                         do_bottom_crop=do_bottom_crop)[0]
    except (ValueError, OSError):
        return None
