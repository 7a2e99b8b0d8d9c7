"""Graph-VQA label generation (DriveLM-CARLA style).

Behavioral counterpart of reference
`dataset_generation/language_labels/drivelm/carla_vqa_generator.py`
(QAsGenerator, 3.1k LoC): perception / prediction / planning question chains
over GT boxes + measurements, key-object descriptions, visibility filtering.
This core implements the central question builders (important objects,
traffic light / stop sign state, junction, leading-object behavior, ego plan,
braking reason); further chains extend `QUESTION_BUILDERS`.
"""

from __future__ import annotations

import gzip
import json
import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

VEHICLE_NAMES = {
    "vehicle": "the vehicle", "walker": "the pedestrian",
    "traffic_light": "the traffic light", "stop_sign": "the stop sign",
}


def _object_description(box: Dict) -> str:
    kind = box.get("class", box.get("type_id", "object")).split(".")[0]
    color = box.get("color_name") or ""
    base = {"walker": "pedestrian"}.get(kind, kind.replace("_", " "))
    desc = f"{color} {base}".strip()
    pos = np.asarray(box.get("position", [0, 0, 0]))[:2]
    loc = _location_phrase(pos)
    return f"the {desc} {loc}"


def _location_phrase(pos: np.ndarray) -> str:
    x, y = float(pos[0]), float(pos[1])
    dist = "nearby" if np.hypot(x, y) < 15 else "far"
    if x > 2 and abs(y) < 2:
        side = "to the front of the ego vehicle"
    elif x > 2 and y < -2:
        side = "to the front left of the ego vehicle"
    elif x > 2 and y > 2:
        side = "to the front right of the ego vehicle"
    elif y < 0:
        side = "on the left side of the ego vehicle"
    else:
        side = "on the right side of the ego vehicle"
    return f"{dist} {side}"


def q_important_objects(current: Dict, boxes: Sequence[Dict]) -> List[Dict]:
    objs = [b for b in boxes
            if b.get("class", "").split(".")[0] in ("vehicle", "walker")
            and np.asarray(b.get("position", [99, 99]))[0] > -2
            and np.linalg.norm(np.asarray(b.get("position", [99, 99]))[:2]) < 40]
    q = "What are the important objects in the scene?"
    if not objs:
        return [{"Q": q, "A": "There are no important objects in the scene."}]
    descs = sorted(_object_description(b) for b in objs[:4])
    return [{"Q": q, "A": "The important objects are " + ", ".join(descs) + "."}]


def q_traffic_light(current: Dict, boxes: Sequence[Dict]) -> List[Dict]:
    q = "Is the ego vehicle affected by a traffic light?"
    if current.get("light_hazard"):
        a = "Yes, the ego vehicle is affected by a red traffic light."
    else:
        a = "There is no traffic light affecting the ego vehicle."
    return [{"Q": q, "A": a}]


def q_stop_sign(current: Dict, boxes: Sequence[Dict]) -> List[Dict]:
    q = "Is the ego vehicle affected by a stop sign?"
    if current.get("stop_sign_hazard") or current.get("stop_sign_close"):
        a = "Yes, the ego vehicle is affected by a stop sign."
    else:
        a = "No, the ego vehicle is not affected by a stop sign."
    return [{"Q": q, "A": a}]


def q_junction(current: Dict, boxes: Sequence[Dict]) -> List[Dict]:
    q = "Is the ego vehicle at a junction?"
    if current.get("junction"):
        a = "Yes, the ego vehicle is at a junction."
    else:
        a = "There is no junction affecting the ego vehicle."
    return [{"Q": q, "A": a}]


def q_braking(current: Dict, boxes: Sequence[Dict]) -> List[Dict]:
    q = "What is the reason for the ego vehicle to brake?"
    if not (current.get("brake") or current.get("control_brake")):
        return [{"Q": q, "A": "There is no reason for the ego vehicle to brake."}]
    if current.get("light_hazard"):
        a = "The ego vehicle brakes because of the red traffic light."
    elif current.get("stop_sign_hazard"):
        a = "The ego vehicle brakes because of the stop sign."
    elif current.get("speed_reduced_by_obj_type"):
        kind = current["speed_reduced_by_obj_type"].split(".")[0]
        name = VEHICLE_NAMES.get(kind, "the object")
        d = current.get("speed_reduced_by_obj_distance")
        a = f"The ego vehicle brakes because of {name}" + (
            f" in {int(d)} m." if d is not None else ".")
    else:
        a = "The ego vehicle brakes to follow the target speed."
    return [{"Q": q, "A": a}]


def q_plan(current: Dict, boxes: Sequence[Dict]) -> List[Dict]:
    from simlingo_tpu.data.measurements import COMMAND_MAP
    q = "What is the ego vehicle's planned action?"
    cmd = COMMAND_MAP.get(current.get("command", 4), "follow the road")
    ts = current.get("target_speed", 0.0)
    if ts < 0.5:
        a = "The ego vehicle plans to stop."
    else:
        a = f"The ego vehicle plans to {cmd} at roughly {ts:.0f} m/s."
    return [{"Q": q, "A": a}]


def q_object_motion(current: Dict, boxes: Sequence[Dict]) -> List[Dict]:
    """Prediction chain: per-object moving status (DriveLM 'prediction')."""
    out: List[Dict] = []
    for b in boxes[:4]:
        kind = b.get("class", "").split(".")[0]
        if kind not in ("vehicle", "walker"):
            continue
        desc = _object_description(b)
        q = f"What is the moving status of {desc}?"
        speed = float(b.get("speed", 0.0))
        if speed < 0.2:
            a = f"{desc.capitalize()} is not moving."
        else:
            yaw = float(b.get("yaw", 0.0))
            heading = ("in the same direction as the ego vehicle"
                       if abs(yaw) < 0.6 else
                       "towards the ego vehicle" if abs(yaw) > 2.5 else
                       "across the ego vehicle's path")
            a = f"{desc.capitalize()} is driving at {speed:.1f} m/s {heading}."
        out.append({"Q": q, "A": a})
    return out


def q_hazard_ahead(current: Dict, boxes: Sequence[Dict]) -> List[Dict]:
    q = "Is there a hazard the ego vehicle must react to?"
    if current.get("vehicle_hazard"):
        a = "Yes, a vehicle ahead requires the ego vehicle to react."
    elif current.get("walker_hazard"):
        a = "Yes, a pedestrian requires the ego vehicle to react."
    elif current.get("light_hazard"):
        a = "Yes, the ego vehicle must stop for the red traffic light."
    elif current.get("stop_sign_hazard"):
        a = "Yes, the ego vehicle must stop at the stop sign."
    else:
        a = "No, there is no hazard the ego vehicle must react to."
    return [{"Q": q, "A": a}]


def q_ego_action(current: Dict, boxes: Sequence[Dict]) -> List[Dict]:
    """Behaviour chain: current ego action from controls."""
    q = "What actions is the ego vehicle taking?"
    steer = float(current.get("steer", 0.0))
    if steer > 0.1:
        lat = "steering to the right"
    elif steer < -0.1:
        lat = "steering to the left"
    else:
        lat = "going straight"
    if current.get("brake"):
        lon = "braking"
    elif float(current.get("throttle", 0.0)) > 0.4:
        lon = "accelerating"
    else:
        lon = "keeping its speed"
    return [{"Q": q, "A": f"The ego vehicle is {lat} and {lon}."}]


def q_speed_state(current: Dict, boxes: Sequence[Dict]) -> List[Dict]:
    q = "What is the current speed of the ego vehicle?"
    v = float(current.get("speed", 0.0))
    if v < 0.2:
        a = "The ego vehicle is standing still."
    else:
        a = f"The ego vehicle is driving at about {v:.1f} m/s."
    return [{"Q": q, "A": a}]


def q_object_location(current: Dict, boxes: Sequence[Dict]) -> List[Dict]:
    """Perception chain: per-object relative location + distance."""
    out: List[Dict] = []
    for b in boxes[:4]:
        kind = b.get("class", "").split(".")[0]
        if kind not in ("vehicle", "walker"):
            continue
        color = b.get("color_name") or ""
        base = {"walker": "pedestrian"}.get(kind, kind.replace("_", " "))
        name = f"the {color} {base}".replace("  ", " ").strip()
        pos = np.asarray(b.get("position", [0, 0, 0]))[:2]
        dist = float(np.hypot(pos[0], pos[1]))
        out.append({"Q": f"Where is {name} relative to the ego vehicle?",
                    "A": f"{name.capitalize()} is "
                         f"{_location_phrase(pos)}, about {dist:.0f} m away."})
    return out


def q_navigation(current: Dict, boxes: Sequence[Dict]) -> List[Dict]:
    from simlingo_tpu.data.measurements import COMMAND_MAP
    q = "What is the current navigation command?"
    cmd = COMMAND_MAP.get(current.get("command", 4), "follow the road")
    return [{"Q": q, "A": f"The navigation command is to {cmd}."}]


QUESTION_BUILDERS: Dict[str, Callable] = {
    "perception": q_important_objects,
    "perception_location": q_object_location,
    "perception_motion": q_object_motion,
    "navigation": q_navigation,
    "traffic_light": q_traffic_light,
    "stop_sign": q_stop_sign,
    "junction": q_junction,
    "prediction_hazard": q_hazard_ahead,
    "behaviour": q_ego_action,
    "behaviour_speed": q_speed_state,
    "planning_braking": q_braking,
    "planning_action": q_plan,
}


def generate_vqa(current: Dict, boxes: Optional[Sequence[Dict]] = None
                 ) -> Dict:
    """One frame -> drivelm-format record {'QA': {cat: [...]},
    'key_object_infos': {...}}."""
    boxes = boxes or []
    qa = {cat: fn(current, boxes) for cat, fn in QUESTION_BUILDERS.items()}
    key_objects = {
        str(i): {"Visual_description": _object_description(b)}
        for i, b in enumerate(boxes[:6])
        if b.get("class", "").split(".")[0] in ("vehicle", "walker")}
    return {"QA": qa, "key_object_infos": key_objects}


def generate_route_vqa(route_dir: str, out_root: Optional[str] = None) -> int:
    """Write vqa/NNNN.json.gz per frame (layout of dataset_driving.py:121)."""
    from simlingo_tpu.data.measurements import read_json_gz

    mdir = os.path.join(route_dir, "measurements")
    out_dir = (os.path.join(route_dir, "vqa") if out_root is None
               else os.path.join(out_root, os.path.basename(route_dir), "vqa"))
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for fn in sorted(os.listdir(mdir)):
        if not fn.endswith(".json.gz"):
            continue
        current = read_json_gz(os.path.join(mdir, fn))
        boxes_path = os.path.join(route_dir, "boxes", fn)
        boxes = read_json_gz(boxes_path) if os.path.isfile(boxes_path) else []
        with gzip.open(os.path.join(out_dir, fn), "wt") as f:
            json.dump(generate_vqa(current, boxes), f)
        n += 1
    return n
