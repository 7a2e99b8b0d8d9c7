"""Image preprocessing: crop -> aspect-ratio tiling -> resize -> normalize.

Behavioral counterpart of reference `dynamic_preprocess` + `build_transform`
(internvl2_utils.py:179-267) and the bottom crop (dataset_base.py:464-467):
  * bottom 4.8/16 of the frame removed (vehicle hood);
  * closest-aspect-ratio grid selection (1x2 for the 1024x~710 crop);
  * per-tile resize to 448x448 (bicubic) + ImageNet normalize.

Two paths:
  * `preprocess_numpy`: CPU (cv2 bicubic) -- used in dataloader workers;
  * `preprocess_device`: jax, runs on TPU -- the "fused preprocessing"
    path: uint8 HWC frames go to the device and crop/resize/normalize/tile
    execute as one XLA program fused into the step (north-star item).
"""

from __future__ import annotations

import itertools
from typing import List, Sequence, Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
BOTTOM_CROP_FRACTION = 4.8 / 16.0


def bottom_crop(img: np.ndarray) -> np.ndarray:
    """Remove the bottom 4.8/16 (hood) -- reference dataset_base.py:464-467."""
    h = img.shape[0]
    return img[: int(h - (h * 4.8) // 16)]


def find_closest_aspect_ratio(aspect_ratio: float, target_ratios,
                              width: int, height: int, image_size: int
                              ) -> Tuple[int, int]:
    """Reference internvl2_utils.py:216-229."""
    best_diff = float("inf")
    best = (1, 1)
    area = width * height
    for ratio in target_ratios:
        target = ratio[0] / ratio[1]
        diff = abs(aspect_ratio - target)
        if diff < best_diff:
            best_diff = diff
            best = ratio
        elif diff == best_diff:
            if area > 0.5 * image_size * image_size * ratio[0] * ratio[1]:
                best = ratio
    return best


def select_grid(width: int, height: int, image_size: int = 448,
                min_num: int = 1, max_num: int = 2) -> Tuple[int, int]:
    ratios = sorted(
        {(i, j) for n in range(min_num, max_num + 1)
         for i in range(1, n + 1) for j in range(1, n + 1)
         if min_num <= i * j <= max_num},
        key=lambda x: x[0] * x[1])
    return find_closest_aspect_ratio(width / height, ratios, width, height,
                                     image_size)


def preprocess_numpy(img: np.ndarray, image_size: int = 448,
                     max_num: int = 2, use_thumbnail: bool = False,
                     do_bottom_crop: bool = True) -> np.ndarray:
    """uint8 HWC RGB frame -> [NP, image_size, image_size, 3] float32.

    NP = grid_w * grid_h (+1 with thumbnail). For the standard 1024x512
    camera with hood crop, the grid is 1x2 => NP=2 (reference
    datamodule.py:110 NUM_IMAGE_PATCHES=2).
    """
    import cv2

    if do_bottom_crop:
        img = bottom_crop(img)
    h, w = img.shape[:2]
    gw, gh = select_grid(w, h, image_size, max_num=max_num)
    target_w, target_h = image_size * gw, image_size * gh
    resized = cv2.resize(img, (target_w, target_h),
                         interpolation=cv2.INTER_CUBIC)
    tiles = []
    for i in range(gw * gh):
        x0 = (i % gw) * image_size
        y0 = (i // gw) * image_size
        tiles.append(resized[y0:y0 + image_size, x0:x0 + image_size])
    if use_thumbnail and len(tiles) > 1:
        tiles.append(cv2.resize(img, (image_size, image_size),
                                interpolation=cv2.INTER_CUBIC))
    out = np.stack(tiles).astype(np.float32) / 255.0
    return (out - IMAGENET_MEAN) / IMAGENET_STD


def device_grid_for(width: int, height: int, image_size: int = 448,
                    max_num: int = 2, do_bottom_crop: bool = True
                    ) -> Tuple[int, int]:
    """(gw, gh) tile grid for a raw frame of the given static size, matching
    the CPU path's closest-aspect-ratio selection after the hood crop."""
    if do_bottom_crop:
        height = int(height - (height * 4.8) // 16)
    return select_grid(width, height, image_size, max_num=max_num)


def preprocess_device(frames, image_size: int = 448, grid: Tuple[int, int] = (2, 1),
                      do_bottom_crop: bool = True):
    """jax version: [B, H, W, 3] uint8 -> [B, NP, S, S, 3] float32/bf16.

    Uses jax.image.resize (cubic) so XLA fuses crop+resize+normalize into the
    surrounding program; grid is static (1x2 for the production camera).
    """
    import jax
    import jax.numpy as jnp

    B, H, W, C = frames.shape
    if do_bottom_crop:
        H2 = int(H - (H * 4.8) // 16)
        frames = frames[:, :H2]
    gw, gh = grid
    x = frames.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (B, image_size * gh, image_size * gw, C),
                         method="cubic")
    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    # split into tiles, row-major (matches reference crop-box order)
    x = x.reshape(B, gh, image_size, gw, image_size, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, image_size,
                                              image_size, C)
    return x
