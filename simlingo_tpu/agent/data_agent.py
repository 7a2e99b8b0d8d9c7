"""Data-collection agent: expert + sensor saving.

Behavioral counterpart of reference `team_code/data_agent.py` (DataAgent):
wraps the privileged expert (expert/autopilot.py) with sensor capture --
normal + pose-augmented RGB cameras, GT boxes, results.json.gz on destroy --
writing the dataset layout the training pipeline consumes
(rgb/NNNN.jpg, rgb_augmented/NNNN.jpg, boxes/NNNN.json.gz,
measurements/NNNN.json.gz, results.json.gz).

The simulator-independent core (`DataCollector`) is testable offline; the
CARLA leaderboard plugin at the bottom wires it to live sensors.
"""

from __future__ import annotations

import gzip
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from simlingo_tpu.expert.autopilot import AutoPilot, ExpertObservation


class DataCollector:
    """Saves one frame of sensors + expert labels every data_save_freq ticks
    (reference data_agent.py:455-496, 4 Hz at 20 FPS)."""

    def __init__(self, save_path: str, data_save_freq: int = 5,
                 camera_aug_rotation_range: float = 5.0,
                 camera_aug_translation_range: float = 1.0,
                 seed: int = 0):
        self.save_path = save_path
        self.data_save_freq = data_save_freq
        self.rng = np.random.RandomState(seed)
        self.aug_rot_range = camera_aug_rotation_range
        self.aug_trans_range = camera_aug_translation_range
        self.expert = AutoPilot(save_path=save_path,
                                data_save_freq=data_save_freq)
        for sub in ("rgb", "rgb_augmented", "boxes", "measurements"):
            os.makedirs(os.path.join(save_path, sub), exist_ok=True)
        self.tick_count = 0

    def sample_camera_augmentation(self) -> Dict[str, float]:
        """Per-frame camera pose augmentation (reference :389-402)."""
        return {
            "rotation": float(self.rng.uniform(-self.aug_rot_range,
                                               self.aug_rot_range)),
            "translation": float(self.rng.uniform(-self.aug_trans_range,
                                                  self.aug_trans_range)),
        }

    def tick(self, obs: ExpertObservation, rgb: Optional[np.ndarray] = None,
             rgb_augmented: Optional[np.ndarray] = None,
             boxes: Sequence[Dict] = (),
             scenario_result=None) -> Dict:
        """Run the expert; persist sensors on save frames."""
        aug = self.sample_camera_augmentation()
        obs.augmentation_rotation = aug["rotation"]
        obs.augmentation_translation = aug["translation"]
        out = self.expert.tick(obs, scenario_result=scenario_result)

        if (self.tick_count % self.data_save_freq) == 0:
            frame = self.tick_count // self.data_save_freq
            if rgb is not None:
                self._save_jpg("rgb", frame, rgb)
            if rgb_augmented is not None:
                self._save_jpg("rgb_augmented", frame, rgb_augmented)
            with gzip.open(os.path.join(self.save_path, "boxes",
                                        f"{frame:04}.json.gz"), "wt") as f:
                json.dump(list(boxes), f)
        self.tick_count += 1
        return out

    def _save_jpg(self, sub: str, frame: int, img: np.ndarray) -> None:
        import cv2
        path = os.path.join(self.save_path, sub, f"{frame:04}.jpg")
        cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    def destroy(self, route_completion: float = 100.0,
                infractions: Optional[Dict[str, List]] = None) -> None:
        """Write results.json.gz (reference :489-496) -- the quality gate
        input consumed by data.index.route_passes_quality_gate."""
        infractions = infractions or {"min_speed_infractions": [],
                                      "outside_route_lanes": []}
        from simlingo_tpu.eval.driving_score import driving_score
        score = driving_score(route_completion, infractions)
        results = {
            "scores": {"score_composed": score,
                       "score_route": route_completion},
            "num_infractions": sum(len(v) for v in infractions.values()),
            "infractions": infractions,
        }
        with gzip.open(os.path.join(self.save_path, "results.json.gz"),
                       "wt") as f:
            json.dump(results, f)
