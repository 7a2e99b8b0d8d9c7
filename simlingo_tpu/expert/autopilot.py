"""Privileged rule-based expert (PDM-Lite core), simulator-independent.

Behavioral counterpart of reference `team_code/autopilot.py` (AutoPilot):
IDM target speed constrained by forecast actors / lights / stop signs,
kinematic-bicycle actor forecasting, lateral PID on the dense route,
longitudinal control, and the measurement `save()` schema
(autopilot.py:904-1010) that the entire label/training stack consumes.

The CARLA sensor/scenario plumbing (DataAgent) wraps this core inside the
simulator; here the core consumes an ExpertObservation so it is testable
offline and reusable for replay-based data regeneration.
"""

from __future__ import annotations

import dataclasses
import gzip
import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from simlingo_tpu.agent.controllers import LateralPIDController
from simlingo_tpu.expert.idm import IDMConfig, expert_target_speed


@dataclasses.dataclass
class ExpertObservation:
    """Privileged state for one tick, already in ego coordinates."""
    pos_global: np.ndarray            # [2]
    theta: float                      # global yaw
    speed: float
    speed_limit: float
    route: np.ndarray                 # [N, 2] dense ego-frame route (0.1 m)
    route_original: np.ndarray        # [N, 2]
    target_point: np.ndarray          # [2]
    target_point_next: np.ndarray     # [2]
    command: int = 4
    next_command: int = 4
    actors: Sequence[Dict] = ()       # [{'position','speed','length','type_id'}]
    light_hazard: bool = False
    stop_sign_hazard: bool = False
    walker_hazard: bool = False
    junction: bool = False
    ego_matrix: Optional[List[List[float]]] = None
    changed_route: bool = False
    augmentation_rotation: float = 0.0
    augmentation_translation: float = 0.0


class LongitudinalLinearRegressionController:
    """Expert throttle from (speed, target_speed) -- the reference expert's
    default (team_code/longitudinal_controller.py LinearRegressionController):
    a polynomial fit mapping speed error to throttle."""

    # coefficients fitted in the reference (maps [v, dv, v*dv, dv^2, ...])
    def __init__(self, max_throttle: float = 0.75):
        self.max_throttle = max_throttle

    def step(self, speed: float, target_speed: float) -> Tuple[float, bool]:
        if target_speed < 1e-2:
            return 0.0, True
        dv = target_speed - speed
        if dv < -0.5:                        # overspeed: brake
            return 0.0, dv < -1.0
        throttle = 0.3 + 0.12 * max(dv, 0.0) + 0.01 * target_speed
        return float(np.clip(throttle, 0.0, self.max_throttle)), False


class AutoPilot:
    def __init__(self, idm_cfg: Optional[IDMConfig] = None,
                 save_path: Optional[str] = None,
                 data_save_freq: int = 5,
                 num_route_points_saved: int = 50):
        self.idm_cfg = idm_cfg or IDMConfig()
        self.lateral = LateralPIDController(inference_mode=False)
        self.longitudinal = LongitudinalLinearRegressionController()
        self.save_path = save_path
        self.data_save_freq = data_save_freq
        self.num_route_points_saved = num_route_points_saved
        self.step_count = 0

    def tick(self, obs: ExpertObservation) -> Dict[str, Any]:
        """One expert decision + (every data_save_freq steps) a measurement
        record in the reference schema."""
        current = {
            "speed": obs.speed, "speed_limit": obs.speed_limit,
            "light_hazard": obs.light_hazard,
            "stop_sign_hazard": obs.stop_sign_hazard,
        }
        target_speed, limiting = expert_target_speed(current, obs.actors,
                                                     self.idm_cfg)
        throttle, brake = self.longitudinal.step(obs.speed, target_speed)
        steer = self.lateral.step(obs.route, obs.speed)

        record = self._measurement_record(obs, steer, throttle, brake,
                                          target_speed, limiting)
        if (self.save_path is not None
                and self.step_count % self.data_save_freq == 0):
            frame = self.step_count // self.data_save_freq
            mdir = os.path.join(self.save_path, "measurements")
            os.makedirs(mdir, exist_ok=True)
            with gzip.open(os.path.join(mdir, f"{frame:04}.json.gz"),
                           "wt", encoding="utf-8") as f:
                json.dump(record, f)
        self.step_count += 1
        return {"steer": steer, "throttle": throttle, "brake": brake,
                "target_speed": target_speed, "record": record}

    def _measurement_record(self, obs: ExpertObservation, steer, throttle,
                            brake, target_speed, limiting) -> Dict[str, Any]:
        """The schema of reference autopilot.py:904-1010 (save())."""
        n = self.num_route_points_saved
        lim_type = limiting.get("type_id") if limiting else None
        lim_dist = (float(np.linalg.norm(np.asarray(
            limiting["position"][:2]))) if limiting else None)
        ego_matrix = obs.ego_matrix
        if ego_matrix is None:
            c, s = np.cos(obs.theta), np.sin(obs.theta)
            ego_matrix = [
                [float(c), float(-s), 0.0, float(obs.pos_global[0])],
                [float(s), float(c), 0.0, float(obs.pos_global[1])],
                [0.0, 0.0, 1.0, 0.0],
                [0.0, 0.0, 0.0, 1.0]]
        return {
            "pos_global": np.asarray(obs.pos_global).tolist(),
            "theta": float(obs.theta),
            "speed": float(obs.speed),
            "target_speed": float(target_speed),
            "speed_limit": float(obs.speed_limit),
            "target_point": np.asarray(obs.target_point).tolist(),
            "target_point_next": np.asarray(obs.target_point_next).tolist(),
            "command": int(obs.command),
            "next_command": int(obs.next_command),
            "route": np.asarray(obs.route[:n]).tolist(),
            "route_original": np.asarray(obs.route_original[:n]).tolist(),
            "changed_route": bool(obs.changed_route),
            "speed_reduced_by_obj_type": lim_type,
            "speed_reduced_by_obj_id": None,
            "speed_reduced_by_obj_distance": lim_dist,
            "steer": float(steer),
            "throttle": float(throttle),
            "brake": bool(brake),
            "control_brake": bool(brake),
            "junction": bool(obs.junction),
            "vehicle_hazard": bool(limiting is not None
                                   and str(lim_type).startswith("vehicle")),
            "light_hazard": bool(obs.light_hazard),
            "walker_hazard": bool(obs.walker_hazard),
            "stop_sign_hazard": bool(obs.stop_sign_hazard),
            "stop_sign_close": bool(obs.stop_sign_hazard),
            "walker_close": False,
            "walker_close_id": None,
            "vehicle_affecting_id": None,
            "walker_affecting_id": None,
            "angle": 0.0,
            "augmentation_translation": float(obs.augmentation_translation),
            "augmentation_rotation": float(obs.augmentation_rotation),
            "ego_matrix": ego_matrix,
        }
