"""Graph-VQA label generation (DriveLM-CARLA style).

Behavioral counterpart of reference
`dataset_generation/language_labels/drivelm/carla_vqa_generator.py`
(QAsGenerator, 3.1k LoC): perception / prediction / planning question chains
over GT boxes + measurements, key-object descriptions, visibility filtering.

Two layers:
  * flat single-shot builders (`QUESTION_BUILDERS`) -- scene-level Q/As;
  * the DriveLM graph (`build_graph_qa`): camera-projection visibility
    filtering (reference :59-353), per-class visual descriptions
    (:771-789), key-object tags `<cN,CAM_FRONT,u,v>` shared across chained
    questions, and per-object perception -> prediction -> planning chains
    with explicit chain/layer/connection_up/connection_down links
    (reference add_qas_questions :478-499).
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


# ---------------------------------------------------------------------------
# DriveLM graph: key objects, visibility, chained questions
# ---------------------------------------------------------------------------

CAM_W, CAM_H = 1024, 512

# per-class visual naming (reference get_vehicle_type/get_vehicle_color,
# carla_vqa_generator.py:771-789)
_TYPE_NAMES = {
    "firetruck": "firetruck", "ambulance": "ambulance", "police": "police car",
    "crossbike": "bicycle", "bike": "bicycle", "omafiets": "bicycle",
    "century": "bicycle", "diamondback": "bicycle",
    "carlacola": "truck", "truck": "truck", "cybertruck": "truck",
    "sprinter": "van", "t2": "van", "volkswagen_t2": "van",
    "bus": "bus", "micro": "bus", "fusorosa": "bus",
    "motorcycle": "motorcycle", "yamaha": "motorcycle", "vespa": "motorcycle",
    "kawasaki": "motorcycle", "harley": "motorcycle", "ninja": "motorcycle",
}


def _class_name(box: Dict) -> str:
    cls = str(box.get("class", box.get("type_id", "object")))
    tid = str(box.get("type_id", cls)).lower()
    if "walker" in cls or "pedestrian" in tid:
        return "pedestrian"
    if cls.startswith("traffic_light") or "traffic_light" in tid:
        return "traffic light"
    if cls.startswith("stop_sign") or "stop" in cls:
        return "stop sign"
    if cls.startswith("static") or "warning" in tid or "construction" in tid:
        return "construction warning"
    for key, name in _TYPE_NAMES.items():
        if key in tid:
            return name
    if "vehicle" in cls or "car" in cls:
        return "car"
    return cls.split(".")[0].replace("_", " ")


def visual_description(box: Dict) -> str:
    name = _class_name(box)
    color = str(box.get("color_name", "") or "").strip()
    if name in ("pedestrian", "traffic light", "stop sign",
                "construction warning"):
        return name
    return f"{color} {name}".strip()


def project_box(box: Dict) -> Optional[np.ndarray]:
    """Ego-frame box -> image pixel [u, v]; None if not visible in the
    front camera (reference visibility filtering :59-353)."""
    from simlingo_tpu.utils.geometry import project_points

    pos = np.asarray(box.get("position", [0.0, 0.0, 0.0]), float)
    if pos.shape[0] == 2:
        pos = np.array([pos[0], pos[1], 0.0])
    # approximate the visual center at half height above the ground
    z = pos[2] if abs(pos[2]) > 1e-6 else float(
        np.asarray(box.get("extent", [2.0, 1.0, 0.75]))[-1]
        if len(box.get("extent", [])) > 2 else 0.75)
    uv = project_points(np.array([[pos[0], pos[1], z]]))[0]
    if not np.isfinite(uv).all():
        return None
    if not (0 <= uv[0] < CAM_W and 0 <= uv[1] < CAM_H):
        return None
    return uv


def make_key_object_infos(boxes: Sequence[Dict]) -> Dict[str, Dict]:
    """Registry of camera-visible objects keyed by DriveLM tags
    `<cN,CAM_FRONT,u,v>`; the tag is the cross-question object identity
    (reference generate_object_key_value :447-476)."""
    infos: Dict[str, Dict] = {}
    count = 1
    for i, box in enumerate(boxes):
        cls = str(box.get("class", "")).split(".")[0]
        if cls not in ("vehicle", "car", "walker", "traffic_light",
                       "stop_sign", "static", "static_car",
                       "static_trafficwarning"):
            continue
        uv = project_box(box)
        if uv is None:
            continue
        tag = f"<c{count},CAM_FRONT,{uv[0]:.1f},{uv[1]:.1f}>"
        infos[tag] = {
            "id": box.get("id", i),
            "box_index": i,
            "Category": "Vehicle" if cls in ("vehicle", "car", "static_car")
            else "Pedestrian" if cls == "walker" else "Traffic element",
            "Status": "moving" if float(box.get("speed", 0.0)) > 0.2
            else "stationary",
            "Visual_description": visual_description(box),
            "projected": [float(uv[0]), float(uv[1])],
        }
        count += 1
    return infos


def _entry(question: str, answer: str, chain: int, layer: int, qa_type: str,
           tags: Sequence[str]) -> Dict:
    return {"Q": question, "A": answer, "chain": chain, "layer": layer,
            "qa_type": qa_type, "connection_up": -1, "connection_down": -1,
            "object_tags": list(tags)}


def _link_chain(entries: List[Dict]) -> List[Dict]:
    """Set connection_up/down as indices within the category list."""
    for i, e in enumerate(entries):
        if i > 0 and entries[i - 1]["chain"] == e["chain"]:
            e["connection_up"] = i - 1
        if (i + 1 < len(entries)
                and entries[i + 1]["chain"] == e["chain"]):
            e["connection_down"] = i + 1
    return entries


def _crosses_ego_path(box: Dict) -> bool:
    """Does the actor's heading ray enter the ego corridor ahead?
    (reference determine_path_crossing :1544-1727, geometric core)."""
    pos = np.asarray(box.get("position", [0, 0, 0]), float)[:2]
    yaw = float(box.get("yaw", 0.0))
    if abs(pos[1]) < 2.0 and pos[0] > 0:
        return True                       # already on the corridor
    direction = np.array([np.cos(yaw), np.sin(yaw)])
    if abs(direction[1]) < 1e-3:
        return False
    # parameter t where the ray reaches y = 0 (the ego path line)
    t = -pos[1] / direction[1]
    if t <= 0 or t > 40.0:
        return False
    x_hit = pos[0] + t * direction[0]
    return 0.0 < x_hit < 40.0


def _vehicle_chain(chain: int, tag: str, info: Dict, box: Dict,
                   current: Dict) -> List[Dict]:
    """Perception -> prediction -> planning chain for one visible vehicle
    (reference generate_vehicle_information :1516-2253)."""
    desc = f"the {info['Visual_description']}({tag})"
    pos = np.asarray(box.get("position", [0, 0, 0]), float)[:2]
    speed = float(box.get("speed", 0.0))
    out = []

    out.append(_entry(
        f"Where on the road is {desc} located?",
        f"{desc.capitalize()} is {_location_phrase(pos)}, roughly "
        f"{np.hypot(*pos):.0f} m from the ego vehicle.",
        chain, 0, "perception", [tag]))

    if speed < 0.2:
        motion = f"{desc.capitalize()} is not moving."
    else:
        yaw = float(box.get("yaw", 0.0))
        heading = ("in the same direction as the ego vehicle"
                   if abs(yaw) < 0.6 else
                   "towards the ego vehicle" if abs(yaw) > 2.5 else
                   "across the ego vehicle's path")
        motion = (f"{desc.capitalize()} is driving at about {speed:.1f} m/s "
                  f"{heading}.")
    out.append(_entry(f"What is {desc} doing?", motion,
                      chain, 1, "perception", [tag]))

    # destination (reference determine_path_crossing "Where is X going?")
    if speed >= 0.2:
        yaw = float(box.get("yaw", 0.0))
        if abs(yaw) < 0.6:
            going = f"{desc.capitalize()} is continuing along the road ahead."
        elif abs(yaw) > 2.5:
            going = (f"{desc.capitalize()} is heading towards the ego "
                     "vehicle on the opposite direction.")
        elif yaw > 0:
            going = f"{desc.capitalize()} is turning to its left."
        else:
            going = f"{desc.capitalize()} is turning to its right."
        out.append(_entry(f"Where is {desc} going?", going,
                          chain, 1, "prediction", [tag]))

    crossing = _crosses_ego_path(box)
    if crossing and speed > 0.2:
        a = (f"Yes, {desc} is on a course that crosses the ego vehicle's "
             "path, so the ego vehicle must pay attention to it.")
    elif crossing:
        a = (f"{desc.capitalize()} is on the ego vehicle's path but "
             "currently not moving.")
    else:
        a = f"No, {desc} does not cross the path of the ego vehicle."
    out.append(_entry(
        f"Will {desc} cross the path of the ego vehicle? Why?", a,
        chain, 2, "prediction", [tag]))

    # planning wrt this actor
    lim_type = str(current.get("speed_reduced_by_obj_type") or "")
    is_limiter = (lim_type and lim_type == str(box.get("type_id", ""))
                  and current.get("speed_reduced_by_obj_id")
                  == box.get("id"))
    if is_limiter or (crossing and speed > 0.2):
        a = (f"The ego vehicle should slow down and be ready to stop "
             f"for {desc}.")
    elif abs(pos[1]) < 2.0 and pos[0] > 0:
        a = (f"The ego vehicle should keep a safe following distance "
             f"to {desc}.")
    else:
        a = (f"The ego vehicle can continue; {desc} does not require "
             "an action.")
    out.append(_entry(
        f"What should the ego vehicle do with respect to {desc}?", a,
        chain, 3, "planning", [tag]))
    return out


def _pedestrian_chain(chain: int, tag: str, info: Dict, box: Dict,
                      current: Dict) -> List[Dict]:
    """Reference process_pedestrians (:500-563)."""
    desc = f"the pedestrian({tag})"
    pos = np.asarray(box.get("position", [0, 0, 0]), float)[:2]
    speed = float(box.get("speed", 0.0))
    out = [_entry(
        f"Where is {desc}?",
        f"{desc.capitalize()} is {_location_phrase(pos)}, about "
        f"{np.hypot(*pos):.0f} m away.",
        chain, 0, "perception", [tag])]
    crossing = _crosses_ego_path(box) and speed > 0.1
    if crossing:
        a = (f"Yes, {desc} is walking towards the road; the ego vehicle "
             "must be ready to stop.")
    elif speed > 0.1:
        a = f"No, {desc} is walking away from the ego vehicle's path."
    else:
        a = f"No, {desc} is standing still."
    out.append(_entry(
        f"Is {desc} about to cross the road?", a,
        chain, 1, "prediction", [tag]))
    return out


def _traffic_element_chain(chain: int, tag: str, info: Dict, box: Dict,
                           current: Dict) -> List[Dict]:
    """Reference process_traffic_lights / process_stop_signs (:565-692)."""
    kind = info["Visual_description"]
    desc = f"the {kind}({tag})"
    out = [_entry(
        f"Is there {'a ' + kind} affecting the ego vehicle?",
        f"Yes, there is {'a ' + kind}({tag}) ahead.",
        chain, 0, "perception", [tag])]
    if kind == "traffic light":
        state = str(box.get("state", "red" if current.get("light_hazard")
                            else "green"))
        out.append(_entry(
            f"What is the state of {desc}?",
            f"{desc.capitalize()} is {state}.",
            chain, 1, "perception", [tag]))
        if state in ("red", "yellow"):
            a = f"The ego vehicle must stop at {desc}."
        else:
            a = f"The ego vehicle can continue past {desc}."
    else:
        a = (f"The ego vehicle must come to a complete stop at {desc} "
             "before continuing.")
    out.append(_entry(
        f"What should the ego vehicle do because of {desc}?", a,
        chain, 2, "planning", [tag]))
    return out


def _roadlayout_qas(current: Dict) -> List[Dict]:
    """Reference analyze_road_layout (:2435-2900, measurement-level core)."""
    from simlingo_tpu.data.measurements import COMMAND_MAP
    out = []
    junction = bool(current.get("junction"))
    out.append(_entry(
        "Is the ego vehicle at a junction?",
        "Yes, the ego vehicle is at a junction." if junction
        else "The ego vehicle is not at a junction.",
        0, 0, "perception", []))
    if "num_lanes_same_direction" in current:
        n_same = int(current["num_lanes_same_direction"])
        n_opp = int(current.get("num_lanes_opposite_direction", 0))
        out.append(_entry(
            "How many lanes are there in the same direction as the ego car?",
            f"There {'is' if n_same == 1 else 'are'} {n_same} "
            f"lane{'s' if n_same != 1 else ''} in the same direction.",
            1, 0, "perception", []))
        out.append(_entry(
            "How many lanes are there in the opposite direction?",
            f"There {'is' if n_opp == 1 else 'are'} {n_opp} "
            f"lane{'s' if n_opp != 1 else ''} in the opposite direction.",
            1, 1, "perception", []))
    cmd = COMMAND_MAP.get(current.get("command", 4), "follow the road")
    if junction:
        watch = ("the ego vehicle should watch the lanes crossing the "
                 "junction and yield to traffic with the right of way")
    elif "lane" in cmd:
        watch = f"the ego vehicle should watch the target lane when it {cmd}s"
    else:
        watch = "the ego vehicle should watch its own lane"
    out.append(_entry(
        f"The ego vehicle wants to {cmd}. "
        "Which lanes are important to watch out for?",
        watch.capitalize() + ".",
        2, 0, "planning", []))
    if current.get("changed_route"):
        out.append(_entry(
            "Does the ego vehicle need to deviate from its lane? Why?",
            "Yes, the route ahead is blocked by an obstruction, so the ego "
            "vehicle must temporarily leave its lane to pass it.",
            3, 0, "planning", []))
    # ego lane position (reference "On which lane is the ego vehicle...")
    if "ego_lane_number" in current and "num_lanes_same_direction" in current:
        i = int(current["ego_lane_number"])
        n = int(current["num_lanes_same_direction"])
        out.append(_entry(
            "On which lane is the ego vehicle (left most lane of the lanes "
            "going in the same direction is indicated with 0)?",
            f"The ego vehicle is on lane {i} of {n} "
            f"lane{'s' if n != 1 else ''} going in its direction.",
            1, 2, "perception", []))
    # lane markings + permitted lane changes (reference analyze_road_layout)
    marks = {side: str(current.get(f"lane_marking_{side}", "")).lower()
             for side in ("left", "right")}
    for side in ("left", "right"):
        if marks[side]:
            out.append(_entry(
                f"What lane marking is on the {side} side of the ego car?",
                f"There is a {marks[side]} lane marking on the {side} side.",
                1, 3, "perception", []))
    if marks["left"] or marks["right"]:
        allowed = [s for s in ("left", "right") if "broken" in marks[s]]
        if len(allowed) == 2:
            ego_ans = "The ego vehicle is allowed to change lanes to both sides."
            other_ans = ("Other vehicles are allowed to change into the ego "
                         "lane from both sides.")
        elif allowed:
            ego_ans = (f"The ego vehicle is only allowed to change lanes "
                       f"to the {allowed[0]}.")
            other_ans = (f"Other vehicles are allowed to change into the "
                         f"ego lane from the {allowed[0]} side.")
        else:
            ego_ans = "The ego vehicle is not allowed to change lanes."
            other_ans = ("Other vehicles are not allowed to change into "
                         "the ego lane.")
        out.append(_entry(
            "In which direction is the ego car allowed to change lanes?",
            ego_ans, 2, 1, "prediction", []))
        out.append(_entry(
            "From which side are other vehicles allowed to change lanes "
            "into the ego lane?", other_ans, 2, 2, "prediction", []))
    return out


def _ego_qas(current: Dict, infos: Dict[str, Dict]) -> List[Dict]:
    """Reference generate_ego_vehicle_actions (:703-1514, measurement core)."""
    out = []
    if "speed_limit" in current:
        sl = float(current["speed_limit"])
        out.append(_entry(
            "What is the current speed limit?",
            f"The current speed limit is {round(sl * 3.6):.0f} km/h.",
            0, 0, "perception", []))
    v = float(current.get("speed", 0.0))
    ts = float(current.get("target_speed", v))
    limiter_tag = [t for t, i in infos.items()
                   if i.get("id") is not None
                   and i["id"] == current.get("speed_reduced_by_obj_id")]
    if current.get("brake") or current.get("control_brake") or ts < v - 0.5:
        why = q_braking(current, [])[0]["A"]
        out.append(_entry(
            "Does the ego vehicle need to brake? Why?",
            "Yes. " + why, 1, 0, "planning", limiter_tag))
    else:
        out.append(_entry(
            "Does the ego vehicle need to brake? Why?",
            "No, the ego vehicle can continue at its current speed.",
            1, 0, "planning", limiter_tag))
    if ts > v + 0.5 and not current.get("brake"):
        a = ("The ego vehicle can accelerate towards its target speed of "
             f"about {ts:.0f} m/s.")
    elif ts < 0.5:
        a = "The ego vehicle should come to a stop."
    else:
        a = "The ego vehicle should keep its current speed."
    out.append(_entry(
        "Should the ego vehicle accelerate, keep its speed or stop?", a,
        1, 1, "planning", limiter_tag))
    return out


def build_graph_qa(current: Dict, boxes: Sequence[Dict]
                   ) -> Dict[str, List[Dict]]:
    """The DriveLM-style graph categories with key-object chains."""
    infos = make_key_object_infos(boxes)
    cats: Dict[str, List[Dict]] = {
        "dynamic_vehicles": [], "pedestrian": [], "trafficlight": [],
        "stopsign": [], "roadlayout": [], "ego": [],
    }
    v_chain = p_chain = t_chain = s_chain = 0
    for tag, info in infos.items():
        box = boxes[info["box_index"]]
        if info["Category"] == "Vehicle":
            if v_chain < 3:
                cats["dynamic_vehicles"] += _vehicle_chain(
                    v_chain, tag, info, box, current)
                v_chain += 1
        elif info["Category"] == "Pedestrian":
            if p_chain < 3:
                cats["pedestrian"] += _pedestrian_chain(
                    p_chain, tag, info, box, current)
                p_chain += 1
        elif info["Visual_description"] == "traffic light":
            cats["trafficlight"] += _traffic_element_chain(
                t_chain, tag, info, box, current)
            t_chain += 1
        elif info["Visual_description"] == "stop sign":
            cats["stopsign"] += _traffic_element_chain(
                s_chain, tag, info, box, current)
            s_chain += 1
    # scene-level pedestrian count over VISIBLE walkers (reference
    # process_pedestrians: "How many pedestrians are there?")
    ped_tags = [t for t, i in infos.items() if i["Category"] == "Pedestrian"]
    n_ped = len(ped_tags)
    cats["pedestrian"].insert(0, _entry(
        "How many pedestrians are there?",
        ("There are no pedestrians." if n_ped == 0 else
         "There is 1 pedestrian." if n_ped == 1 else
         f"There are {n_ped} pedestrians."),
        0, 0, "perception", ped_tags))
    cats["roadlayout"] = _roadlayout_qas(current)
    cats["ego"] = _ego_qas(current, infos)
    for cat in cats:
        _link_chain(cats[cat])
    return cats


def generate_vqa(current: Dict, boxes: Optional[Sequence[Dict]] = None
                 ) -> Dict:
    """One frame -> drivelm-format record {'QA': {cat: [...]},
    'key_object_infos': {tag: info}}.

    QA holds both the flat scene-level builders and the key-object graph
    chains (build_graph_qa); key_object_infos is tag-keyed as in DriveLM.
    """
    boxes = boxes or []
    qa = {cat: fn(current, boxes) for cat, fn in QUESTION_BUILDERS.items()}
    qa.update(build_graph_qa(current, boxes))
    return {"QA": qa, "key_object_infos": make_key_object_infos(boxes)}


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
