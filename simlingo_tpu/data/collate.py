"""Collate: RawSamples -> static-shape DrivingExample batches.

Counterpart of reference `dl_collate_fn` (datamodule.py:309-443), with the
TPU-critical difference that every batch has the SAME shapes (text padded to
a fixed max_text_len, images always NP tiles) so one compiled train step
serves every step of training.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from simlingo_tpu.core.structs import (DrivingExample, DrivingInput,
                                       DrivingLabel)
from simlingo_tpu.data.driving_dataset import RawSample
from simlingo_tpu.data.prompts import batch_language_label, tokenize_chat
from simlingo_tpu.data.tokenizer import SimLingoTokenizer


@dataclasses.dataclass
class CollateConfig:
    max_text_len: int = 768       # >= prefix(4) + img tokens + prompt + answer
    num_image_tokens: int = 512   # 2 tiles x 256 tokens (InternVL2-1B)
    max_placeholders: int = 8
    num_speed_wps: int = 10
    num_route_points: int = 20
    pad_side_train: str = "right"
    pad_side_infer: str = "left"


def collate(samples: Sequence[RawSample], tok: SimLingoTokenizer,
            cfg: CollateConfig, for_inference: bool = False
            ) -> DrivingExample:
    import jax.numpy as jnp

    B = len(samples)
    chats = []
    chats_q = []
    placeholder_values = []
    for s in samples:
        chats.append(tokenize_chat(tok, s.question, s.answer,
                                   cfg.num_image_tokens))
        chats_q.append(tokenize_chat(tok, s.question, None,
                                     cfg.num_image_tokens))
        placeholder_values.append(
            {tok.convert_tokens_to_ids(k): v
             for k, v in s.placeholder_values.items()})

    prompt = batch_language_label(
        chats, placeholder_values, tok.pad_token_id, cfg.max_text_len,
        pad_side=cfg.pad_side_train, max_placeholders=cfg.max_placeholders)
    prompt_inference = batch_language_label(
        chats_q, placeholder_values, tok.pad_token_id, cfg.max_text_len,
        pad_side=cfg.pad_side_infer, max_placeholders=cfg.max_placeholders)

    def stack(field, dtype=np.float32):
        arr = np.stack([getattr(s, field) for s in samples])
        if arr.dtype == np.uint8:       # raw frames: device preprocessing
            return jnp.asarray(arr)
        return jnp.asarray(arr.astype(dtype))

    def fixlen(x, n):
        x = np.asarray(x, np.float32)
        if len(x) >= n:
            return x[:n]
        return np.vstack([x, np.tile(x[-1:], (n - len(x), 1))])

    waypoints = jnp.asarray(np.stack(
        [fixlen(s.waypoints, cfg.num_speed_wps) for s in samples]))
    waypoints_1d = jnp.asarray(np.stack(
        [fixlen(s.waypoints_1d, cfg.num_speed_wps) for s in samples]))
    path = jnp.asarray(np.stack(
        [fixlen(s.path, cfg.num_route_points) for s in samples]))

    di = DrivingInput(
        pixel_values=stack("image"),
        vehicle_speed=jnp.asarray(
            np.asarray([s.speed for s in samples], np.float32)),
        target_point=jnp.asarray(np.stack(
            [s.target_points[0] for s in samples]).astype(np.float32)),
        prompt=prompt,
        prompt_inference=prompt_inference)

    dl = DrivingLabel(waypoints=waypoints, path=path,
                      waypoints_1d=waypoints_1d)

    return DrivingExample(
        driving_input=di, driving_label=dl,
        run_id=[s.measurement_path for s in samples],
        qa_templates=[s.qa_template for s in samples],
        eval_infos=[s.eval_infos for s in samples])
