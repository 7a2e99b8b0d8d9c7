"""Dreamer alternative-trajectory generation.

Behavioral counterpart of reference
`dataset_generation/dreamer_data/dreamer_generator.py`
(CarlaAlternativeCreator): per frame, generate alternative future
trajectories -- faster / slower / stop / target_speed via re-profiled speeds
along the expert route, lane changes via laterally shifted routes, crash
trajectories toward recorded objects -- plus instruction text and a
`safe_to_execute` label from forecast separation checks; written as
dreamer/NNNN.json.gz in the layout data/dreamer_dataset.py consumes.

The reference's scenario-aware OBB collision forecasting over all actors is
approximated by circle-overlap checks against recorded bounding boxes
(boxes/NNNN.json.gz) forecast with constant velocity.
"""

from __future__ import annotations

import gzip
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

WP_DT = 0.25          # 4 Hz label rate
NUM_WPS = 10

INSTRUCTIONS = {
    "faster": ["Drive faster!", "Speed up.", "Accelerate, please.",
               "Increase your speed."],
    "slower": ["Drive slower.", "Slow down a bit.", "Reduce your speed.",
               "Please decelerate."],
    "stop": ["Stop the car!", "Bring the vehicle to a halt.",
             "Please stop now."],
    "target_speed": ["Drive at exactly {v} m/s.", "Keep a speed of {v} m/s.",
                     "Set your speed to {v} m/s."],
    "lane_change_left": ["Change to the left lane.",
                         "Move one lane to the left."],
    "lane_change_right": ["Change to the right lane.",
                          "Move one lane to the right."],
    "crash": ["Drive into {obj}!", "Steer towards {obj}."],
}

SAFETY_REFUSALS = {
    "stop": "Stopping here is unsafe, so I keep driving carefully. Waypoints:",
    "faster": "Driving faster would be unsafe here, so I keep my speed. Waypoints:",
    "lane_change_left": "A lane change to the left is not safe here, so I stay in my lane. Waypoints:",
    "lane_change_right": "A lane change to the right is not safe here, so I stay in my lane. Waypoints:",
    "crash": "I will not crash into obstacles. I continue driving safely. Waypoints:",
    "default": "That instruction is unsafe to follow, so I continue driving safely. Waypoints:",
}


def _route_arclength(route: np.ndarray) -> np.ndarray:
    seg = np.linalg.norm(np.diff(np.vstack([[0, 0], route]), axis=0), axis=1)
    return np.cumsum(seg)


def waypoints_from_speed_profile(route: np.ndarray,
                                 speeds: Sequence[float]) -> np.ndarray:
    """Place NUM_WPS waypoints along `route` (1 m spaced, ego frame) so that
    consecutive spacing matches the given per-step speeds (m/s)."""
    arc = _route_arclength(route)
    dist = np.cumsum(np.asarray(speeds) * WP_DT)
    xs = np.interp(dist, arc, route[:, 0])
    ys = np.interp(dist, arc, route[:, 1])
    # beyond the route end: extrapolate along the last segment direction
    d_end = arc[-1]
    if len(route) >= 2:
        tail = route[-1] - route[-2]
        tail = tail / (np.linalg.norm(tail) + 1e-9)
    else:
        tail = np.array([1.0, 0.0])
    over = dist > d_end
    xs = np.where(over, route[-1, 0] + (dist - d_end) * tail[0], xs)
    ys = np.where(over, route[-1, 1] + (dist - d_end) * tail[1], ys)
    return np.stack([xs, ys], axis=1)


def shifted_route(route: np.ndarray, offset: float) -> np.ndarray:
    """Laterally shift a route by `offset` meters (left = negative y in
    CARLA's left-handed ego frame)."""
    d = np.gradient(route, axis=0)
    norm = np.linalg.norm(d, axis=1, keepdims=True)
    d = d / np.maximum(norm, 1e-6)
    normal = np.stack([-d[:, 1], d[:, 0]], axis=1)
    return route + offset * normal


def forecast_boxes(boxes: Sequence[Dict], horizon_steps: int
                   ) -> List[np.ndarray]:
    """Constant-velocity forecast of box centers: [steps, 2] per box.
    (Kept for callers that only need center tracks; the safety label uses
    the OBB path in is_safe below.)"""
    out = []
    for b in boxes:
        pos = np.asarray(b.get("position", [0, 0, 0]))[:2]
        speed = float(b.get("speed", 0.0))
        yaw = float(b.get("yaw", 0.0))
        vel = speed * np.array([np.cos(yaw), np.sin(yaw)])
        out.append(pos[None] + vel[None] * (np.arange(1, horizon_steps + 1)
                                            * WP_DT)[:, None])
    return out


EGO_EXTENT = (2.45, 0.9)          # half-sizes, matches the expert's ego


def _ego_yaws(waypoints: np.ndarray) -> np.ndarray:
    d = np.diff(waypoints, axis=0, prepend=waypoints[:1] * 0.0)
    yaws = np.arctan2(d[:, 1], d[:, 0])
    # stationary steps keep the previous heading (avoid atan2(0,0) = 0 flips)
    still = np.linalg.norm(d, axis=1) < 1e-3
    for i in range(1, len(yaws)):
        if still[i]:
            yaws[i] = yaws[i - 1]
    if len(yaws) and still[0]:
        yaws[0] = yaws[1] if len(yaws) > 1 else 0.0
    return yaws


def is_safe(waypoints: np.ndarray, boxes: Sequence[Dict],
            safety_margin: float = 0.5) -> bool:
    """OBB-forecast safety label (reference dreamer_generator.py safety
    path: kinematic rollouts of recorded actors + oriented-box intersection
    against the candidate ego trajectory; the round-1 circle-overlap test
    both missed long-vehicle side hits and rejected safe near-passes).

    Waypoints are WP_DT-spaced ego positions; actor boxes carry
    position/yaw/speed/extent (+ last control when recorded)."""
    if not boxes:
        return True
    from simlingo_tpu.expert import forecast as F

    n = len(waypoints)
    cfg = F.ForecastConfig(frame_rate=max(int(round(1.0 / WP_DT)), 1))
    def _walker(b):
        kind = str(b.get("class", "")) + str(b.get("type_id", ""))
        return "walker" in kind or "pedestrian" in kind
    vehicles = [b for b in boxes if not _walker(b)]
    walkers = [b for b in boxes if _walker(b)]
    pred = F.forecast_vehicles(vehicles, n, near_lane_change=False, cfg=cfg,
                               dt=WP_DT)
    wpred = F.forecast_walkers(walkers, n, cfg=cfg, dt=WP_DT)

    ego_centers = np.asarray(waypoints, float)
    ego_yaws = _ego_yaws(ego_centers)
    ego_ext = np.broadcast_to(
        np.asarray(EGO_EXTENT) + safety_margin, (n, 2))

    for fc in list(pred.values()) + list(wpred.values()):
        hits = F.obb_intersect_batch(ego_centers, ego_yaws, ego_ext,
                                     fc["centers"][:n], fc["yaws"][:n],
                                     fc["extents"][:n])
        if hits.any():
            return False
    return True


def generate_alternatives(current: Dict, route: np.ndarray,
                          org_waypoints: np.ndarray,
                          boxes: Optional[Sequence[Dict]] = None,
                          rng: Optional[np.random.RandomState] = None
                          ) -> Dict[str, List[Dict]]:
    """One frame -> {mode: [option dicts]} in the dreamer file layout."""
    rng = rng or np.random.RandomState(0)
    speed = float(current.get("speed", 0.0))
    boxes = boxes or []
    out: Dict[str, List[Dict]] = {}

    def mk(mode: str, wps, route_opt, instruction_key: str,
           fmt: Optional[Dict] = None) -> Dict:
        instrs = [s.format(**(fmt or {})) for s in INSTRUCTIONS[instruction_key]]
        wps_arr = org_waypoints if isinstance(wps, str) else np.asarray(wps)
        safe = is_safe(np.asarray(wps_arr), boxes)
        return {
            "mode": mode,
            "waypoints": wps if isinstance(wps, str) else np.asarray(wps).tolist(),
            "route": route_opt if isinstance(route_opt, str)
            else np.asarray(route_opt).tolist(),
            "dreamer_instruction": instrs,
            "safe_to_execute": bool(safe),
            "dreamer_answer_safety": SAFETY_REFUSALS.get(
                mode, SAFETY_REFUSALS["default"]),
        }

    steps = np.arange(1, NUM_WPS + 1)

    # faster: +50% speed ramp
    v = np.maximum(speed, 1.0)
    faster = waypoints_from_speed_profile(route, v * (1 + 0.5 * steps / NUM_WPS))
    out["faster"] = [mk("faster", faster, "org", "faster")]

    # slower: ramp down to 40%
    slower = waypoints_from_speed_profile(route, v * (1 - 0.6 * steps / NUM_WPS))
    out["slower"] = [mk("slower", slower, "org", "slower")]

    # stop: decelerate at 4 m/s^2 to zero
    vstop = np.maximum(speed - 4.0 * steps * WP_DT, 0.0)
    stop = waypoints_from_speed_profile(route, vstop)
    out["stop"] = [mk("stop", stop, "org", "stop")]

    # target speed: random plausible target
    tv = float(rng.choice([2.0, 4.0, 6.0, 8.0, 10.0]))
    ts = waypoints_from_speed_profile(
        route, np.clip(speed + (tv - speed) * steps / NUM_WPS, 0, None))
    out["target_speed"] = [mk("target_speed", ts, "org", "target_speed",
                              {"v": tv})]

    # lane changes: +-3.5 m shifted route, blended over the first 15 m
    for mode, off in (("lane_change_left", -3.5), ("lane_change_right", 3.5)):
        shifted = shifted_route(route, off)
        blend = np.clip(_route_arclength(route) / 15.0, 0, 1)[:, None]
        new_route = route * (1 - blend) + shifted * blend
        wps = waypoints_from_speed_profile(new_route, np.full(NUM_WPS, v))
        out[mode] = [mk(mode, wps, new_route, mode)]

    # crash: steer toward the nearest forward box
    fwd = [b for b in boxes
           if np.asarray(b.get("position", [0, 0, 0]))[0] > 1.0]
    if fwd:
        tgt = min(fwd, key=lambda b: np.linalg.norm(
            np.asarray(b["position"][:2])))
        tpos = np.asarray(tgt["position"][:2], float)
        crash_route = np.linspace([0, 0], tpos, 20)[1:]
        wps = waypoints_from_speed_profile(
            crash_route, np.full(NUM_WPS, max(v, 3.0)))
        o = mk("crash", wps, crash_route, "crash",
               {"obj": tgt.get("type_id", "the object").split(".")[-1]})
        o["safe_to_execute"] = False
        out["crash"] = [o]

    return out


def generate_route_dreamer(route_dir: str, out_root: Optional[str] = None,
                           seed: int = 0) -> int:
    """Write dreamer/NNNN.json.gz for every measurement of a route."""
    from simlingo_tpu.data import measurements as M

    rng = np.random.RandomState(seed)
    mdir = os.path.join(route_dir, "measurements")
    out_dir = (os.path.join(route_dir, "dreamer") if out_root is None
               else os.path.join(out_root, os.path.basename(route_dir),
                                 "dreamer"))
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    frames = sorted(f for f in os.listdir(mdir) if f.endswith(".json.gz"))
    for fn in frames:
        current = M.read_json_gz(os.path.join(mdir, fn))
        routes = M.route_labels(current)
        boxes_path = os.path.join(route_dir, "boxes", fn)
        boxes = M.read_json_gz(boxes_path) if os.path.isfile(boxes_path) else []
        # org waypoints unavailable per-frame here; constant-speed profile
        org = waypoints_from_speed_profile(
            routes["route_adjusted_org"],
            np.full(NUM_WPS, max(current.get("speed", 0.0), 0.1)))
        alts = generate_alternatives(current, routes["route_adjusted_org"],
                                     org, boxes, rng)
        with gzip.open(os.path.join(out_dir, fn), "wt") as f:
            json.dump(alts, f)
        n += 1
    return n
