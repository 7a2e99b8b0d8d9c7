"""Typed batch/IO structures (JAX pytrees).

Behavioral counterpart of the reference's typed IO
(`simlingo_training/utils/custom_types.py:5-64`), re-designed for TPU:

* every array field has a *static* shape so one compiled program serves every
  step (the reference pads dynamically per batch and permutes valid tokens to
  the front at runtime, `adaptors.py:316-330`);
* we use right-padding + explicit position ids + per-token validity instead of
  the reference's left-padding + valid-first stable sort -- semantically
  identical under causal attention (valid tokens occupy effective positions
  0..n-1 followed by the driving query tokens), but entirely static on TPU;
* placeholder splicing (`<TARGET_POINT>` etc.,
  `models/encoder/internvl2_model.py:53-91`) is represented as a flat
  (slot, coord) list padded to MAX_PLACEHOLDERS, turned into a one-hot scatter
  inside the model instead of a python loop over dynamic positions.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LanguageLabel:
    """Tokenized chat text. Counterpart of reference `LanguageLabel`.

    All arrays are right-padded to a static length T.
    """

    ids: jnp.ndarray          # [B, T] int32 token ids (pad id in invalid slots)
    valid: jnp.ndarray        # [B, T] bool, True => token is fed to the model
    loss_mask: jnp.ndarray    # [B, T] bool, True => token takes part in the CE loss
    # Placeholder splicing: coordinates that overwrite the embedding at a slot.
    ph_slots: jnp.ndarray     # [B, P] int32 sequence index, -1 => unused entry
    ph_coords: jnp.ndarray    # [B, P, 2] float32 coordinate for each slot

    @property
    def num_valid(self) -> jnp.ndarray:
        return self.valid.sum(axis=-1).astype(jnp.int32)


@struct.dataclass
class DrivingInput:
    """Model input. Counterpart of reference `DrivingInput` (custom_types.py:43-51)."""

    # Camera images, already tiled into NP patches of image_size**2, NHWC
    # normalized float (ImageNet mean/std) -- the fused preprocessing kernel
    # produces this from raw uint8 frames.
    pixel_values: jnp.ndarray          # [B, NP, H, W, 3] float
    vehicle_speed: jnp.ndarray         # [B] float32 m/s
    target_point: jnp.ndarray          # [B, 2] float32
    prompt: LanguageLabel              # full conversation (train) -- right padded
    prompt_inference: Optional[LanguageLabel] = None  # question-only (inference)
    camera_intrinsics: Optional[jnp.ndarray] = None   # [B, 3, 3]
    camera_extrinsics: Optional[jnp.ndarray] = None   # [B, 4, 4]


@struct.dataclass
class DrivingLabel:
    """Supervision. Counterpart of reference `DrivingLabel` (custom_types.py:53-58)."""

    waypoints: jnp.ndarray        # [B, 11, 2] future positions, 0.25 s apart
    path: jnp.ndarray             # [B, 20, 2] route points, 1 m spacing
    waypoints_1d: jnp.ndarray     # [B, 10, 2] cumulative-distance waypoints ([d, 0])


@struct.dataclass
class DrivingExample:
    """One training batch. Counterpart of reference `DrivingExample`."""

    driving_input: DrivingInput
    driving_label: DrivingLabel
    # static metadata (not traced). NOTE: these participate in the pytree
    # TREEDEF -- a batch carrying per-sample values here retraces any jit it
    # is fed to. Call strip_static() before handing a batch to a compiled
    # step (the trainer and bench do); keep metadata only for eval paths
    # that consume it host-side.
    run_id: Any = struct.field(pytree_node=False, default=None)
    qa_templates: Any = struct.field(pytree_node=False, default=None)
    eval_infos: Any = struct.field(pytree_node=False, default=None)

    def strip_static(self) -> "DrivingExample":
        """Drop per-batch static metadata so every batch shares one treedef
        (jit caches on treedef + leaf avals; varying metadata would force a
        recompile per step)."""
        return self.replace(run_id=None, qa_templates=None, eval_infos=None)


@struct.dataclass
class DrivingOutput:
    """Inference output: waypoint predictions + generated language tokens."""

    speed_wps: jnp.ndarray              # [B, 10, 2] (or [B, 10, 1] in 1d mode)
    route: jnp.ndarray                  # [B, 20, 2]
    language_tokens: jnp.ndarray        # [B, max_new_tokens] int32
    language_lengths: jnp.ndarray       # [B] int32 number of generated tokens


@struct.dataclass
class TrainingOutput:
    """Loss summary. Counterpart of reference `TrainingOutput` + summarise_losses

    (`simlingo_training/models/utils.py:6-40`): total loss is the unweighted sum
    of per-key means; per-key (sum, count) kept for logging.
    """

    loss: jnp.ndarray                       # [] float32
    loss_averages: Dict[str, jnp.ndarray]   # {} -> [] float32
    loss_counts: Dict[str, jnp.ndarray]     # {} -> [] int32


def summarise_losses(loss_values: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]) -> TrainingOutput:
    """Reduce per-token/per-sample (value, count) pairs to a TrainingOutput.

    Mirrors reference `summarise_losses` (models/utils.py:6-40): each key's
    average = sum(values * count_mask) / max(sum(count), 1); the total loss is
    the *unweighted sum of the per-key averages*.
    """
    averages = {}
    counts = {}
    for key, (values, count_mask) in loss_values.items():
        count_mask = count_mask.astype(values.dtype)
        total = (values * count_mask).sum()
        n = count_mask.sum()
        averages[key] = total / jnp.maximum(n, 1.0)
        counts[key] = n.astype(jnp.int32)
    loss = sum(averages.values()) if averages else jnp.zeros(())
    return TrainingOutput(loss=loss, loss_averages=averages, loss_counts=counts)
