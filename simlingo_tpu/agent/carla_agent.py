"""CARLA Leaderboard 2.0 agent plugin.

Counterpart of reference `team_code/agent_simlingo.py`'s leaderboard plumbing
(the plugin contract `get_entry_point()` + AutonomousAgent
setup/sensors/run_step/destroy, leaderboard/autoagents/autonomous_agent.py):
wraps the simulator-independent LingoAgent (agent/agent.py) with CARLA sensor
configuration, GPS->CARLA conversion, UKF filtering, and route planning.

Only importable inside a CARLA leaderboard environment (carla + leaderboard
on sys.path); everything testable lives in agent/agent.py + agent/replay.py.
"""

from __future__ import annotations

import json
import math
import os
from typing import Any, Dict

import numpy as np


def get_entry_point():
    return "SimLingoTPUAgent"


try:
    from leaderboard.autoagents import autonomous_agent

    class SimLingoTPUAgent(autonomous_agent.AutonomousAgent):
        """Leaderboard wrapper around LingoAgent."""

        def setup(self, path_to_conf_file, route_index=None):
            from simlingo_tpu.agent.agent import LingoAgent
            from simlingo_tpu.agent.config import AgentConfig
            from simlingo_tpu.agent.route_planner import CarlaRoutePlanner
            from simlingo_tpu.core import checkpoint as ckpt
            from simlingo_tpu.core.presets import internvl2_1b
            from simlingo_tpu.data.tokenizer import SimLingoTokenizer
            import jax

            self.track = autonomous_agent.Track.SENSORS
            cfg_path = os.path.join(os.path.dirname(path_to_conf_file),
                                    "config.json")
            model_cfg = internvl2_1b()
            params = ckpt.load_hf_checkpoint(path_to_conf_file, model_cfg)
            params = jax.tree_util.tree_map(jax.numpy.asarray, params)
            tok_path = os.environ.get("SIMLINGO_TOKENIZER")
            self.agent = LingoAgent(params, model_cfg, AgentConfig(),
                                    tokenizer=SimLingoTokenizer(tok_path))
            self.planner = CarlaRoutePlanner(min_distance=7.5,
                                             max_distance=50.0)
            self.initialized = False

        def sensors(self):
            from simlingo_tpu.agent.config import AgentConfig
            c = AgentConfig()
            x, y, z = c.camera_pos
            return [
                {"type": "sensor.camera.rgb", "x": x, "y": y, "z": z,
                 "roll": 0.0, "pitch": 0.0, "yaw": 0.0,
                 "width": c.camera_width, "height": c.camera_height,
                 "fov": c.camera_fov, "id": "rgb_front"},
                {"type": "sensor.other.imu", "x": 0.0, "y": 0.0, "z": 0.0,
                 "roll": 0.0, "pitch": 0.0, "yaw": 0.0,
                 "sensor_tick": 0.05, "id": "imu"},
                {"type": "sensor.other.gnss", "x": 0.0, "y": 0.0, "z": 0.0,
                 "roll": 0.0, "pitch": 0.0, "yaw": 0.0,
                 "sensor_tick": 0.01, "id": "gps"},
                {"type": "sensor.speedometer", "reading_frequency": 20,
                 "id": "speed"},
            ]

        def run_step(self, input_data, timestamp, sensors=None):
            import carla
            from simlingo_tpu.agent.agent import AgentFrame

            if not self.initialized:
                self.planner.set_route(self._global_plan_world_coord)
                self.initialized = True

            rgb = input_data["rgb_front"][1][:, :, :3][:, :, ::-1]
            gps = input_data["gps"][1]
            compass = input_data["imu"][1][-1]
            speed = input_data["speed"][1]["speed"]

            pos = self.planner.convert_gps_to_carla(gps)
            # UKF: fuse noisy GPS/IMU/speed through the bicycle model
            # (reference agent_simlingo.py:507-529)
            fpos, fyaw, fspeed = self.agent.filter_ego_state(
                pos[:2], compass, speed)
            tp, tp_next = self.planner.target_points(fpos, fyaw)
            frame = AgentFrame(rgb=np.ascontiguousarray(rgb), speed=fspeed,
                               target_point=tp, next_target_point=tp_next,
                               compass=fyaw, gps=pos)
            out = self.agent.run_step(frame)
            control = carla.VehicleControl()
            control.steer = float(out["steer"])
            control.throttle = float(out["throttle"])
            control.brake = float(out["brake"])
            return control

        def destroy(self, results=None):
            stats = self.agent.latency_stats()
            print(f"simlingo_tpu agent latency: {stats}")

except ImportError:  # outside a CARLA environment
    SimLingoTPUAgent = None
