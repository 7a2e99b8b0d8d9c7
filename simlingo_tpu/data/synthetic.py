"""Synthetic DrivingExample batches for tests and benchmarks.

Mimics the structure the real collate emits (data/collate.py): a chat
sequence with an `<IMG_CONTEXT>` block, waypoint placeholders, assistant-only
loss mask, driving labels. Shapes match the production layout so compiled
programs are representative.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from simlingo_tpu.core.structs import (DrivingExample, DrivingInput,
                                       DrivingLabel, LanguageLabel)
from simlingo_tpu.models.simlingo import SimLingoConfig


def synthetic_example(cfg: SimLingoConfig, batch: int, seq_len: int,
                      num_patches: int = 2, max_placeholders: int = 8,
                      seed: int = 0, left_pad: bool = False,
                      image_dtype=jnp.float32) -> DrivingExample:
    rng = np.random.RandomState(seed)
    V = cfg.llm.vocab_size
    n_img_per_tile = cfg.vit.tokens_per_patch_image
    n_img = n_img_per_tile * num_patches
    img_id = cfg.img_context_token_id

    ids = np.zeros((batch, seq_len), np.int32)
    valid = np.zeros((batch, seq_len), bool)
    loss_mask = np.zeros((batch, seq_len), bool)
    ph_slots = np.full((batch, max_placeholders), -1, np.int32)
    ph_coords = rng.randn(batch, max_placeholders, 2).astype(np.float32)

    prefix = 4  # <|im_start|>user\n<img>
    for b in range(batch):
        n_text = rng.randint(16, 40)
        n_valid = prefix + n_img + n_text
        assert n_valid <= seq_len
        start = seq_len - n_valid if left_pad else 0
        tok = rng.randint(0, min(V, 30000), size=n_valid).astype(np.int32)
        tok[prefix:prefix + n_img] = img_id
        ids[b, start:start + n_valid] = tok
        valid[b, start:start + n_valid] = True
        # last ~half of the text is the "assistant answer"
        ans = n_text // 2
        loss_mask[b, start + n_valid - ans:start + n_valid] = True
        # two placeholders in the question region
        for p in range(2):
            slot = start + prefix + n_img + 2 + p
            ph_slots[b, p] = slot

    H = cfg.vit.image_size
    pixels = rng.randn(batch, num_patches, H, H, 3).astype(np.float32)

    label = LanguageLabel(
        ids=jnp.asarray(ids), valid=jnp.asarray(valid),
        loss_mask=jnp.asarray(loss_mask),
        ph_slots=jnp.asarray(ph_slots), ph_coords=jnp.asarray(ph_coords))

    di = DrivingInput(
        pixel_values=jnp.asarray(pixels, image_dtype),
        vehicle_speed=jnp.asarray(rng.rand(batch).astype(np.float32) * 10),
        target_point=jnp.asarray(rng.randn(batch, 2).astype(np.float32)),
        prompt=label, prompt_inference=label)

    dl = DrivingLabel(
        waypoints=jnp.asarray(np.cumsum(rng.rand(batch, 11, 2), 1).astype(np.float32)),
        path=jnp.asarray(np.cumsum(rng.rand(batch, 20, 2), 1).astype(np.float32)),
        waypoints_1d=jnp.asarray(np.cumsum(rng.rand(batch, 10, 2), 1).astype(np.float32)))

    return DrivingExample(driving_input=di, driving_label=dl)


def synthesize_route(root: str, rel: str, n_frames: int = 40,
                     seed: int = 0, image_hw=(512, 1024)) -> str:
    """Write a minimal on-disk route in the collector's layout (JPEG frames +
    measurements + results) -- a straight 5 m/s drive. Used by the disk-data
    benchmark (bench.py BENCH_DATA=disk) and pipeline tests: exercises the
    full JPEG-decode -> measurement-parse -> collate path without CARLA.
    """
    import gzip
    import json
    import os

    import cv2

    rng = np.random.RandomState(seed)
    route = os.path.join(root, "data", "simlingo", rel)
    os.makedirs(os.path.join(route, "measurements"), exist_ok=True)
    os.makedirs(os.path.join(route, "rgb"), exist_ok=True)
    for i in range(n_frames):
        x = 1.25 * i
        ego = [[1, 0, 0, x], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
        m = {
            "pos_global": [x, 0.0], "theta": 0.0, "speed": 5.0,
            "target_speed": 5.0, "speed_limit": 30.0,
            "target_point": [20.0, 0.5], "target_point_next": [40.0, 1.0],
            "command": 4, "next_command": 4,
            "route": [[float(j), 0.02 * j] for j in range(1, 40)],
            "route_original": [[float(j), 0.0] for j in range(1, 40)],
            "changed_route": False,
            "augmentation_translation": 0.3, "augmentation_rotation": 2.0,
            "ego_matrix": ego,
            "steer": 0.0, "throttle": 0.5, "brake": False,
        }
        with gzip.open(os.path.join(route, "measurements",
                                    f"{i:04}.json.gz"), "wt") as f:
            json.dump(m, f)
        img = rng.randint(0, 255, (*image_hw, 3), np.uint8)
        cv2.imwrite(os.path.join(route, "rgb", f"{i:04}.jpg"), img)
    results = {"scores": {"score_composed": 100.0, "score_route": 100.0},
               "num_infractions": 0,
               "infractions": {"min_speed_infractions": [],
                               "outside_route_lanes": []}}
    with gzip.open(os.path.join(route, "results.json.gz"), "wt") as f:
        json.dump(results, f)
    return route
