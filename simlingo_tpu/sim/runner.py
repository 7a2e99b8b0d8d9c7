"""Microsim route runner: closed-loop evaluation + expert data collection.

The leaderboard equivalent (Bench2Drive/leaderboard/leaderboard/
leaderboard_evaluator.py + scenarios/scenario_manager.py): build the world
and scenarios from a route spec, tick the agent against it, score with the
criteria, and write a leaderboard-format result JSON that
eval/driving_score.py merges/parses. Two drivers are provided:

  ExpertDriver  -- the privileged PDM-Lite expert (expert/autopilot.py via
                   agent/data_agent.DataCollector when saving), used for
                   in-repo dataset collection: the microsim replaces the
                   CARLA plumbing of agent/carla_data_agent.py.
  ModelDriver   -- the trained model (agent/agent.LingoAgent) fed by the
                   synthetic camera, used for closed-loop evaluation: the
                   microsim replaces agent/carla_agent.py.

Route specs are plain dicts (JSON-friendly):
  {"town": "straight" | "crossing" | "curved",
   "town_kwargs": {...},
   "start_s": 5.0, "end_s": 380.0,
   "scenarios": [{"type": "Accident", "at_s": 120.0}, ...],
   "npcs": [{"at_s": 60.0, "lane": 0, "speed": 7.0}, ...],
   "route_id": "micro_0"}
"""

from __future__ import annotations

import json
import math
import os
import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from simlingo_tpu.sim import map as simmap
from simlingo_tpu.sim.actors import Vehicle
from simlingo_tpu.sim.camera import Camera
from simlingo_tpu.sim.criteria import RouteCriteria
from simlingo_tpu.sim.scenarios import ScenarioBuilder, scripted_tick
from simlingo_tpu.sim.world import SimWorld

TOWNS = {
    "straight": simmap.straight_town,
    "curved": simmap.curved_town,
    "crossing": simmap.crossing_town,
    "grid": simmap.grid_town,
    "highway": simmap.highway_town,
}


def build_world(spec: Dict, seed: int = 0
                ) -> Tuple[SimWorld, np.ndarray, List[Dict]]:
    """(world with ego + scenarios spawned, sparse route, scenario recs)."""
    town = TOWNS[spec.get("town", "straight")](
        **spec.get("town_kwargs", {}))
    world = SimWorld(town, seed=seed)
    lane = town.lanes[spec.get("ego_lane", 0)]
    s0 = float(spec.get("start_s", 5.0))
    s1 = float(spec.get("end_s", lane.length - 5.0))
    turn = spec.get("turn")
    scenario_at_offset = -s0          # at_s is lane arc length by default
    if spec.get("via"):
        # multi-junction route through explicit via waypoints (grid town);
        # scenario at_s is then ROUTE arc length
        route = town.route_via(spec["via"])
        lane = town.closest_lane(route[0])
        scenario_at_offset = 0.0
    elif turn:
        if spec.get("town") != "crossing":
            raise ValueError(
                f"spec 'turn' is only meaningful on the crossing town, "
                f"got town={spec.get('town')!r}")
        if spec.get("ego_lane", 0) != 0:
            raise ValueError("turn routes start on lane 0 (eastbound); "
                             "drop 'ego_lane' or set it to 0")
        route = simmap.crossing_route(town, s0, s1, turn)
    else:
        grid = np.arange(s0, s1, 1.0)
        route = np.stack([lane.point_at_s(s) for s in grid], 0)
    ego_start = route[0]
    ego_s, _ = lane.project(ego_start)
    ego_yaw = lane.yaw_at_s(ego_s)
    if spec.get("parking_exit"):
        # ego starts in the parking lane beside the route start; drivers
        # read world.spec and arm the planner's parking-exit merge
        # (expert/route_planner.set_route parking_exit -- reference
        # privileged_route_planner.py:428-433)
        park = next((l for l in town.lanes.values()
                     if l.lane_type == "parking"), None)
        if park is None:
            raise ValueError("parking_exit route needs a parking lane "
                             "(straight town: parking_lane=True)")
        s_park, _ = park.project(ego_start)
        ego_start = park.point_at_s(s_park)
        ego_yaw = park.yaw_at_s(s_park)
    world.spawn_ego(ego_start, yaw=ego_yaw,
                    speed=float(spec.get("start_speed", 0.0)))
    world.spec = spec

    builder = ScenarioBuilder(world, route)
    records = []
    for sc in spec.get("scenarios", []):
        rec = builder.build(sc["type"],
                            float(sc["at_s"]) + scenario_at_offset,
                            **{k: v for k, v in sc.items()
                               if k not in ("type", "at_s")})
        if rec is not None:
            records.append(rec)
    for npc in spec.get("npcs", []):
        nl = town.lanes[npc.get("lane", lane.lane_id)]
        s = float(npc.get("at_s", 50.0))
        world.spawn(Vehicle(nl.point_at_s(s), yaw=nl.yaw_at_s(s),
                            speed=float(npc.get("speed", 0.0)), lane=nl,
                            target_speed=float(npc.get("target_speed",
                                                       npc.get("speed",
                                                               7.0)))))
    for flow in spec.get("flows", []):
        # an actor flow: `count` vehicles spaced `gap` m along a lane,
        # all driving at `speed` (reference srunner ActorFlow-based
        # scenarios spawn a continuous source->sink stream; a finite
        # platoon covers a MicroBench-length route)
        fl = town.lanes[flow["lane"]]
        n = int(flow.get("count", 4))
        gap = float(flow.get("gap", 24.0))
        v = float(flow.get("speed", 6.0))
        s0f = float(flow.get("from_s", 30.0))
        for k in range(n):
            s = s0f - k * gap
            if not 0.0 <= s <= fl.length:
                continue
            world.spawn(Vehicle(fl.point_at_s(s), yaw=fl.yaw_at_s(s),
                                speed=v, lane=fl, target_speed=v))
    return world, route, records


# ---------------------------------------------------------------------------
# Drivers
# ---------------------------------------------------------------------------

def _set_planner_route(planner, world: SimWorld,
                       route: np.ndarray) -> None:
    """Arm the planner, honoring a parking-exit start (the route's first
    waypoint sits on the driving lane while the ego starts in the parking
    lane; the planner prepends the merge -- route_planner.set_route)."""
    spec = getattr(world, "spec", None) or {}
    if spec.get("parking_exit") and world.ego is not None:
        planner.set_route(np.asarray(route, float),
                          start_xy=world.ego.position.copy(),
                          parking_exit=True)
    else:
        planner.set_route(np.asarray(route, float))

class ExpertDriver:
    """Privileged expert closing the loop (collection-capable).

    Mirrors agent/carla_data_agent.py's wiring with the microsim as the
    privileged world: dense route via expert/route_planner, scenario
    records into expert/scenarios.ScenarioManager, ego-frame actor dicts
    into expert/autopilot.AutoPilot.
    """

    def __init__(self, world: SimWorld, route: np.ndarray,
                 scenario_records: Sequence[Dict] = (),
                 save_path: Optional[str] = None,
                 data_save_freq: int = 5, seed: int = 0,
                 camera: Optional[Camera] = None,
                 target_speed: float = 8.0):
        from simlingo_tpu.expert.route_planner import PrivilegedRoutePlanner
        from simlingo_tpu.expert.scenarios import ScenarioManager

        self.world = world
        self.planner = PrivilegedRoutePlanner()
        _set_planner_route(self.planner, world, route)
        self.scenarios = ScenarioManager(self.planner)
        self.scenario_records = list(scenario_records)
        self.target_speed = target_speed
        self._active_turn_cmd: Optional[int] = None
        self.camera = camera
        self.collector = None
        if save_path is not None:
            from simlingo_tpu.agent.data_agent import DataCollector
            self.collector = DataCollector(save_path,
                                           data_save_freq=data_save_freq,
                                           seed=seed, save_lidar=False)
            self.camera = self.camera or Camera()
        else:
            from simlingo_tpu.expert.autopilot import AutoPilot
            self.expert = AutoPilot()

    def _actors_ego_frame(self) -> List[Dict]:
        from simlingo_tpu.utils.geometry import inverse_conversion_2d
        ego = self.world.ego
        out = []
        for a in self.world.actors:
            if a is ego or not a.alive:
                continue
            rel = inverse_conversion_2d(a.position, ego.position, ego.yaw)
            if np.linalg.norm(rel) >= 50:
                continue
            steer, throttle, brake = a.control
            out.append({
                "position": rel.tolist(),
                "yaw": float(a.yaw - ego.yaw),
                "speed": float(a.speed),
                "type_id": a.type_id, "base_type": a.base_type,
                "id": a.actor_id,
                "extent": [float(a.extent[0]), float(a.extent[1])],
                "steer": float(steer), "throttle": float(throttle),
                "brake": bool(brake > 0.5),
            })
        return out

    def _light_info(self) -> Tuple[Optional[str], Optional[float]]:
        ego = self.world.ego
        lane = self.world.map.closest_lane(ego.position)
        light = self.world.light_for_lane(lane.lane_id, ego.position)
        if light is None:
            return None, None
        s_ego, _ = lane.project(ego.position)
        s_line, _ = lane.project(light.spot.position)
        d = s_line - s_ego
        if d < -2.0 or d > 60.0:
            return None, None
        return light.state, max(d, 0.0)

    def _stop_info(self) -> Tuple[Optional[float], Optional[int]]:
        ego = self.world.ego
        lane = self.world.map.closest_lane(ego.position)
        for stop in self.world.map.stops:
            if stop.lane_id != lane.lane_id:
                continue
            s_ego, _ = lane.project(ego.position)
            s_stop, _ = lane.project(stop.position)
            d = s_stop - s_ego
            if -2.0 < d < 50.0:
                return max(d, 0.0), stop.sign_id
        return None, None

    def _traffic_boxes(self) -> List[Dict]:
        """Traffic-light / stop-sign boxes for the label generators
        (reference data_agent get_bounding_boxes adds traffic_light and
        stop_sign entries with affects_ego + state)."""
        from simlingo_tpu.utils.geometry import inverse_conversion_2d
        ego = self.world.ego
        lane = self.world.map.closest_lane(ego.position)
        s_ego, _ = lane.project(ego.position)
        out: List[Dict] = []
        for light in self.world.lights:
            rel = inverse_conversion_2d(light.spot.position, ego.position,
                                        ego.yaw)
            if np.linalg.norm(rel) >= 60:
                continue
            same = light.spot.lane_id == lane.lane_id
            s_line, _ = lane.project(light.spot.position)
            out.append({
                "class": "traffic_light",
                "type_id": "traffic.traffic_light",
                "position": rel.tolist(),
                "yaw": float(light.spot.yaw - ego.yaw),
                "extent": [1.5, 6.0], "id": 10000 + light.spot.light_id,
                "state": light.state,
                "affects_ego": bool(same and -2.0 < s_line - s_ego < 45.0),
            })
        for stop in self.world.map.stops:
            rel = inverse_conversion_2d(stop.position, ego.position,
                                        ego.yaw)
            if np.linalg.norm(rel) >= 60:
                continue
            same = stop.lane_id == lane.lane_id
            s_stop, _ = lane.project(stop.position)
            out.append({
                "class": "stop_sign", "type_id": "traffic.stop",
                "position": rel.tolist(),
                "yaw": float(stop.yaw - ego.yaw),
                "extent": list(stop.trigger_extent),
                "id": 20000 + stop.sign_id,
                "affects_ego": bool(same and -2.0 < s_stop - s_ego < 40.0),
            })
        return out

    def _junction_command(self, inp: Dict, wp: Dict) -> int:
        """Derive the navigation command from route geometry: a junction
        within ~40 m of route ahead plus a >45-deg total heading change ->
        turn left (1) / right (2), straight through -> 3; else the
        planner's command (reference routes carry RoadOption per
        waypoint; the microsim derives them).

        Turn commands are STICKY for the whole junction traversal: once
        issued, the command holds until the ego has left the junction and
        the remaining heading change has played out -- otherwise the
        second half of the arc (remaining turn < 45 deg) would flip to
        'go straight' while steering hard (labels must match the
        maneuver, not the residual geometry)."""
        route = np.asarray(inp["route"])[:400]          # ego frame, 0.1 m
        if len(route) < 20:
            return int(inp["command"])
        d0 = route[10] - route[0]
        d1 = route[-1] - route[-10]
        turn = math.remainder(math.atan2(d1[1], d1[0])
                              - math.atan2(d0[1], d0[0]), 2 * math.pi)
        # junction proximity: probe the GLOBAL dense route ahead (a single
        # fixed-offset probe can overshoot a 14 m junction)
        planner = self.planner
        ahead = planner.route[planner.idx:
                              planner.idx + 400:40]     # every 4 m, 40 m
        near_junction = bool(wp["is_junction"]) or any(
            self.world.map.in_junction(p) for p in ahead)
        if self._active_turn_cmd is not None:
            if not near_junction and abs(turn) < math.radians(10):
                self._active_turn_cmd = None
            else:
                return self._active_turn_cmd
        if near_junction and turn > math.pi / 4:
            self._active_turn_cmd = 1
            return 1
        if near_junction and turn < -math.pi / 4:
            self._active_turn_cmd = 2
            return 2
        return 3 if near_junction else int(inp["command"])

    def step(self) -> Tuple[float, float, float]:
        from simlingo_tpu.expert.autopilot import ExpertObservation

        world, ego = self.world, self.world.ego
        actors = self._actors_ego_frame()
        self.scenarios.set_active(self.scenario_records)
        oncoming = [a for a in actors if abs(
            math.remainder(a["yaw"], 2 * math.pi)) > 2.0]
        scenario_result = self.scenarios.tick(
            self.target_speed, ego.speed, ego.position, oncoming)
        inp = self.planner.ego_inputs(ego.position, ego.yaw)
        light_state, light_distance = self._light_info()
        stop_distance, stop_id = self._stop_info()
        wp = world.map.waypoint(ego.position)
        obs = ExpertObservation(
            pos_global=ego.position.copy(), theta=ego.yaw,
            speed=ego.speed, speed_limit=wp["speed_limit"],
            route=inp["route"], route_original=inp["route_original"],
            target_point=inp["target_point"],
            target_point_next=inp["target_point_next"],
            actors=actors, light_state=light_state,
            light_distance=light_distance,
            stop_sign_distance=stop_distance, stop_sign_id=stop_id,
            junction=bool(wp["is_junction"]),
            command=self._junction_command(inp, wp),
            near_lane_change=self.planner.near_lane_change(),
            changed_route=inp["changed_route"])
        if self.collector is not None:
            lane_info = self._lane_info(wp)
            boxes = (actors + self._traffic_boxes()
                     + [dict(lane_info, **{"class": "ego_info"})])
            # render only on save frames (collector persists at 4 Hz);
            # the augmented view is a REAL second camera at the sampled
            # shifted pose (reference data_agent.py:389-402), so the
            # saved augmentation labels match the rendered geometry
            rgb = rgb_aug = semantics = depth = None
            aug = self.collector.sample_camera_augmentation()
            if self.collector.tick_count % self.collector.data_save_freq \
                    == 0:
                frames = self.camera.render(
                    world, with_labels=self.collector.save_labels)
                rgb = frames["rgb"]
                semantics = frames.get("semantics")
                depth = frames.get("depth")
                # the augmented view is a virtual ego displaced by the
                # sampled translation along ego-y and rotated by the
                # sampled yaw, with the SAME camera mount -- matching the
                # training-label transform exactly
                # (data/measurements.rotate_translate: p' = R(-yaw) @
                # (p - (0, trans)))
                trans = float(aug["translation"])
                vpos = ego.position + trans * np.array(
                    [-math.sin(ego.yaw), math.cos(ego.yaw)])
                vyaw = ego.yaw + math.radians(aug["rotation"])
                rgb_aug = self.camera.render(world,
                                             pose=(vpos, vyaw))["rgb"]
            out = self.collector.tick(
                obs, rgb=rgb, rgb_augmented=rgb_aug,
                boxes=boxes, scenario_result=scenario_result,
                semantics=semantics, depth=depth,
                extra_measurements=lane_info, aug=aug)
        else:
            out = self.expert.tick(obs, scenario_result=scenario_result)
        return (float(out["steer"]), float(out["throttle"]),
                float(out["brake"]))

    def _lane_info(self, wp: Dict) -> Dict:
        lane = self.world.map.lanes[wp["lane_id"]]
        n_same, left_of_ego = 1, 0
        probe = lane
        while probe.left is not None:
            probe = self.world.map.lanes[probe.left]
            n_same += 1
            left_of_ego += 1
        probe = lane
        while probe.right is not None:
            nxt = self.world.map.lanes[probe.right]
            if nxt.lane_type != "driving":
                break
            probe = nxt
            n_same += 1
        n_opp = 1 if lane.opposite is not None else 0
        return {
            "is_in_junction": bool(wp["is_junction"]),
            "lane_marking_left": lane.marking_left,
            "lane_marking_right": lane.marking_right,
            "distance_to_junction": None,
            "num_lanes_same_direction": n_same,
            "num_lanes_opposite_direction": n_opp,
            "ego_lane_number": left_of_ego,
        }

    def destroy(self, record: Optional[Dict] = None) -> None:
        """Write results.json.gz with the route's REAL outcome so the
        dataset quality gate (data/index.py) sees the same scores the
        leaderboard would record."""
        if self.collector is None:
            return
        if record is None:
            self.collector.destroy()
        else:
            self.collector.destroy(
                route_completion=record["scores"]["score_route"],
                infractions=record["infractions"])


class ModelDriver:
    """Trained-model agent closing the loop through the synthetic camera
    (microsim counterpart of agent/carla_agent.py)."""

    def __init__(self, agent, world: SimWorld, route: np.ndarray,
                 camera: Optional[Camera] = None,
                 tp_distances: Tuple[float, float] = (30.0, 60.0),
                 gps_noise_std: float = 0.0,
                 compass_noise_std: float = 0.0):
        """gps_noise_std / compass_noise_std: corrupt the ego state like
        real GNSS/IMU so the agent's UKF path (LingoAgent.filter_ego_state,
        reference agent_simlingo.py:507-529) is exercised closed-loop."""
        from simlingo_tpu.expert.route_planner import PrivilegedRoutePlanner
        self.agent = agent
        self.world = world
        self.camera = camera or Camera()
        self.planner = PrivilegedRoutePlanner()
        _set_planner_route(self.planner, world, route)
        self.tp_distances = tp_distances
        self.gps_noise = gps_noise_std
        self.compass_noise = compass_noise_std

    def step(self) -> Tuple[float, float, float]:
        from simlingo_tpu.agent.agent import AgentFrame
        ego, world = self.world.ego, self.world
        frames = self.camera.render(world)
        pos, yaw, speed = ego.position.copy(), float(ego.yaw), \
            float(ego.speed)
        if self.gps_noise > 0.0 or self.compass_noise > 0.0:
            pos = pos + world.rng.randn(2) * self.gps_noise
            yaw = yaw + float(world.rng.randn()) * self.compass_noise
            pos2, yaw, speed = self.agent.filter_ego_state(pos, yaw, speed)
            pos = np.asarray(pos2, float)
        inp = self.planner.ego_inputs(pos, yaw,
                                      tp_distances=self.tp_distances)
        frame = AgentFrame(rgb=frames["rgb"], speed=speed,
                           target_point=np.asarray(inp["target_point"]),
                           next_target_point=np.asarray(
                               inp["target_point_next"]),
                           compass=yaw, gps=pos)
        out = self.agent.run_step(frame)
        return (float(out["steer"]), float(out["throttle"]),
                float(out["brake"]))

    def destroy(self, record: Optional[Dict] = None) -> None:
        pass


class ReplayRecorder:
    """on_tick hook feeding the ScenarioLogger so microsim runs can be
    replay-rendered + GIF'd on infractions (agent/scenario_logger.py
    render_replay_frames / make_infraction_gifs -- the same records the
    CARLA plugin writes via SIMLINGO_RECORD_DIR)."""

    def __init__(self, save_path: str, route: np.ndarray,
                 log_every_n: int = 1):
        from simlingo_tpu.agent.scenario_logger import ScenarioLogger
        self.logger = ScenarioLogger(save_path=save_path, route_index="0",
                                     log_every_n=log_every_n)
        self.logger.set_route(np.asarray(route, float))

    def __call__(self, world: SimWorld, criteria) -> None:
        ego = world.ego
        self.logger.log(
            ego.state_dict(),
            actors=[a.state_dict() for a in world.actors
                    if a is not ego and a.alive],
            lights=[l.state_dict() for l in world.lights],
            control={"steer": ego.control[0], "throttle": ego.control[1],
                     "brake": ego.control[2]})

    def dump(self, record: Optional[Dict] = None) -> Optional[str]:
        return self.logger.dump(
            infractions=record.get("infractions") if record else None)


# ---------------------------------------------------------------------------
# Route loop
# ---------------------------------------------------------------------------

def run_route(spec: Dict,
              driver_factory: Callable[[SimWorld, np.ndarray,
                                        List[Dict]], object],
              max_steps: Optional[int] = None,
              seed: int = 0,
              on_tick: Optional[Callable] = None,
              record_dir: Optional[str] = None,
              index: int = 0) -> Dict:
    """Run one route closed-loop; returns the leaderboard record.

    record_dir: write a ScenarioLogger record (records.json.gz) for
    post-hoc replay rendering / infraction GIFs."""
    seed = int(spec.get("seed", seed))      # spec-pinned seeds win
    world, route, scen_records = build_world(spec, seed=seed)
    criteria = RouteCriteria(world, route,
                             timeout=spec.get("timeout"))
    recorder = None
    if record_dir is not None:
        recorder = ReplayRecorder(
            os.path.join(record_dir, spec.get("route_id", "micro_0")),
            route)
        user_tick = on_tick

        def on_tick(w, c, _user=user_tick):
            recorder(w, c)
            if _user is not None:
                _user(w, c)
    driver = driver_factory(world, route, scen_records)
    t0 = time.time()
    steps = max_steps if max_steps is not None else int(
        criteria.timeout / world.dt) + 1
    record = None
    try:
        for _ in range(steps):
            steer, throttle, brake = driver.step()
            world.apply_ego_control(steer, throttle, brake)
            world.tick()
            scripted_tick(world)
            criteria.update()
            if on_tick is not None:
                on_tick(world, criteria)
            if criteria.finished:
                break
        scen = spec.get("scenarios") or []
        record = criteria.record(route_id=spec.get("route_id", "micro_0"),
                                 wall_time=time.time() - t0,
                                 scenario_type=(scen[0]["type"]
                                                if scen else None),
                                 index=index,
                                 weather_id=spec.get("weather_id"))
    finally:
        driver.destroy(record)
        if recorder is not None:
            recorder.dump(record)
    return record


def run_routes(specs: Sequence[Dict], driver_factory,
               out_path: Optional[str] = None, seed: int = 0,
               max_steps: Optional[int] = None,
               record_dir: Optional[str] = None) -> Dict:
    """Run many routes; write a leaderboard-format checkpoint JSON."""
    records = [run_route(s, driver_factory, seed=seed + i,
                         max_steps=max_steps, record_dir=record_dir,
                         index=i)
               for i, s in enumerate(specs)]
    checkpoint = {"_checkpoint": {"records": records}}
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(checkpoint, f, indent=1)
    return checkpoint


def expert_factory(save_root: Optional[str] = None, seed: int = 0,
                   dir_name_fmt: str = "route_{i:03}",
                   **kw) -> Callable:
    """dir_name_fmt: per-route directory name under save_root; use e.g.
    "Town12_micro_{i:03}" to land in the training pipeline's expected
    layout (data/simlingo/v1/*/routes_training/Town*)."""
    counter = {"i": 0}

    def make(world, route, scen_records):
        save_path = None
        if save_root is not None:
            save_path = os.path.join(save_root,
                                     dir_name_fmt.format(i=counter["i"]))
            counter["i"] += 1
        return ExpertDriver(world, route, scen_records,
                            save_path=save_path, seed=seed, **kw)
    return make


def model_factory(agent, **kw) -> Callable:
    def make(world, route, scen_records):
        return ModelDriver(agent, world, route, **kw)
    return make
