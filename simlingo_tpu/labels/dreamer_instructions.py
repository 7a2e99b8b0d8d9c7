"""Dreamer instruction text + safety adjudication.

Behavioral counterpart of reference
`dataset_generation/dreamer_data/dreamer_instructions.py` (get_info,
get_instructions) plus the template bank the reference ships in
`data/augmented_templates/dreamer.json`. Template wording here is our own;
keys and placeholder tokens (<LANE_CHANGE_SIDE>, <TARGET_SPEED>, <OBJECT>,
...) match the reference so downstream tooling that groups by template works
unchanged.

Responsibilities:
  * get_instructions -- mode + rollout info -> a list of phrasing variants
    (relative / absolute lane numbering, lane-type, transition-annotated
    lane changes; crash / drive-over / walker phrasing; km/h vs m/s target
    speeds; red-light and crash-bait "faster" variants).
  * get_info -- per-frame rollouts -> {mode: [option dicts]} with
    `safe_to_execute`, refusal text, and route reasoning (cross-track error
    against the expert route), mirroring reference dreamer_instructions.py:
    45-204 rule by rule.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Template bank (own phrasing; reference keys/placeholders)
# ---------------------------------------------------------------------------

DREAMER_TEMPLATES: Dict[str, List[str]] = {
    "lanechange_rel": [
        "Change <LANE_NUMBERS_REL> <LANE_OR_LANES> to the <LANE_CHANGE_SIDE>.",
        "Move <LANE_NUMBERS_REL> <LANE_OR_LANES> to the <LANE_CHANGE_SIDE>.",
        "Go <LANE_NUMBERS_REL> <LANE_OR_LANES> over to the <LANE_CHANGE_SIDE>.",
        "Please switch <LANE_NUMBERS_REL> <LANE_OR_LANES> to the <LANE_CHANGE_SIDE>.",
        "Take the lane <LANE_NUMBERS_REL> <LANE_OR_LANES> to your <LANE_CHANGE_SIDE>.",
        "Shift over <LANE_NUMBERS_REL> <LANE_OR_LANES> to the <LANE_CHANGE_SIDE> side.",
        "Make a <LANE_CHANGE_SIDE> lane change of <LANE_NUMBERS_REL> <LANE_OR_LANES>.",
        "Move the car <LANE_NUMBERS_REL> <LANE_OR_LANES> to the <LANE_CHANGE_SIDE>.",
        "I want you to change <LANE_NUMBERS_REL> <LANE_OR_LANES> to the <LANE_CHANGE_SIDE>.",
        "Head <LANE_NUMBERS_REL> <LANE_OR_LANES> to the <LANE_CHANGE_SIDE>.",
        "Get over <LANE_NUMBERS_REL> <LANE_OR_LANES> to the <LANE_CHANGE_SIDE>.",
        "Could you move <LANE_NUMBERS_REL> <LANE_OR_LANES> to the <LANE_CHANGE_SIDE>?",
    ],
    "lanechange_abs": [
        "Change to the <LANE_NUM> on the lanes going in the <LANE_TYPE>.",
        "Move to the <LANE_NUM> of the <LANE_TYPE> lanes.",
        "Drive in the <LANE_NUM> on the <LANE_TYPE> side.",
        "Take the <LANE_NUM> of the lanes in the <LANE_TYPE>.",
        "Switch to the <LANE_NUM> among the <LANE_TYPE> lanes.",
        "Please get into the <LANE_NUM> on the lanes going in the <LANE_TYPE>.",
        "Put the car into the <LANE_NUM> of the <LANE_TYPE> lanes.",
        "Go to the <LANE_NUM> on the <LANE_TYPE> side of the road.",
    ],
    "lanechange_abs_all": [
        "Change to the <LANE_NUM>.",
        "Move into the <LANE_NUM>.",
        "Take the <LANE_NUM>.",
        "Drive in the <LANE_NUM>.",
        "Please switch to the <LANE_NUM>.",
        "Get into the <LANE_NUM>.",
        "Put us in the <LANE_NUM>.",
        "Steer the car into the <LANE_NUM>.",
    ],
    "lane_change_transition": [
        "Change <LANE_NUMS> <LANE_OR_LANES> to the <SIDE>, starting in "
        "<START> meters and finishing within <TRANSITION> meters.",
        "In <START> meters, begin a <SIDE> lane change of <LANE_NUMS> "
        "<LANE_OR_LANES> and complete it over <TRANSITION> meters.",
        "Move <LANE_NUMS> <LANE_OR_LANES> to the <SIDE>: start after "
        "<START> meters, take <TRANSITION> meters for the transition.",
        "After <START> meters, shift <LANE_NUMS> <LANE_OR_LANES> to the "
        "<SIDE> within <TRANSITION> meters.",
        "Start changing <LANE_NUMS> <LANE_OR_LANES> to the <SIDE> in "
        "<START> meters; the maneuver should span <TRANSITION> meters.",
        "Begin a <SIDE> lane change (<LANE_NUMS> <LANE_OR_LANES>) in "
        "<START> meters and merge over the next <TRANSITION> meters.",
    ],
    "parking": [
        "Pull over into the parking lane on the <SIDE>.",
        "Park the car on the <SIDE> side.",
        "Move into the parking lane to the <SIDE>.",
        "Please pull over to the <SIDE> into the parking lane.",
        "Steer into the parking strip on the <SIDE>.",
        "Take the parking lane on your <SIDE>.",
        "Get into the parking lane to the <SIDE>.",
        "Stop in the parking lane on the <SIDE> side.",
    ],
    "sidewalk": [
        "Drive onto the sidewalk on the <SIDE>.",
        "Move the car onto the <SIDE> sidewalk.",
        "Steer onto the sidewalk to the <SIDE>.",
        "Take the sidewalk on your <SIDE>.",
        "Go up onto the sidewalk on the <SIDE> side.",
        "Pull onto the pavement to the <SIDE>.",
        "Get onto the sidewalk to the <SIDE>.",
        "Drive up on the <SIDE> sidewalk.",
    ],
    "faster": [
        "Drive faster!",
        "Speed up.",
        "Accelerate, please.",
        "Increase your speed.",
        "Go faster.",
        "Pick up the pace.",
        "Step on it.",
        "Put your foot down.",
        "Hurry up, drive quicker.",
        "Give it more gas.",
        "Accelerate the car.",
        "We need to go faster.",
    ],
    "faster_crash": [
        "Speed up, you will make it.",
        "Accelerate, there is enough of a gap.",
        "Go faster, you can squeeze through.",
        "Floor it, we will get past them.",
        "Drive faster, it will be fine.",
        "Speed up and push through the traffic.",
        "Accelerate now, do not wait for them.",
        "Keep accelerating, ignore the other car.",
    ],
    "redlight": [
        "Drive on, the light does not matter.",
        "Go ahead, just run the red light.",
        "Ignore the traffic light and keep going.",
        "Accelerate through the red light.",
        "Do not wait for the light, drive.",
        "Just go, nobody is watching the light.",
        "Run the light, we are in a hurry.",
        "Keep driving, skip the red light.",
    ],
    "slower": [
        "Drive slower.",
        "Slow down a bit.",
        "Reduce your speed.",
        "Please decelerate.",
        "Ease off the gas.",
        "Take it slower.",
        "Drop your speed.",
        "Go a bit slower, please.",
        "Brake gently and slow down.",
        "Lower the speed of the car.",
        "Calm down and drive slower.",
        "Back off the accelerator.",
    ],
    "stop_now": [
        "Stop the car!",
        "Bring the vehicle to a halt.",
        "Please stop now.",
        "Come to a complete stop.",
        "Brake to a standstill.",
        "Halt the car.",
        "Stop right here.",
        "Bring us to a stop.",
        "I need you to stop the car.",
        "Slow down until you are stopped.",
    ],
    "target_speed": [
        "Drive at <TARGET_SPEED>.",
        "Keep a speed of <TARGET_SPEED>.",
        "Set your speed to <TARGET_SPEED>.",
        "Hold <TARGET_SPEED> from now on.",
        "Adjust the speed to <TARGET_SPEED>.",
        "Please travel at <TARGET_SPEED>.",
        "Maintain <TARGET_SPEED>.",
        "Bring the car to <TARGET_SPEED> and hold it.",
        "Cruise at <TARGET_SPEED>.",
        "Your new target speed is <TARGET_SPEED>.",
    ],
    "driveover": [
        "Drive over the <OBJECT>.",
        "Roll over the <OBJECT>.",
        "Go straight over the <OBJECT>.",
        "Cross over the <OBJECT> without stopping.",
        "Just drive across the <OBJECT>.",
        "Pass directly over the <OBJECT>.",
        "Run over the <OBJECT>.",
        "Drive right across the <OBJECT>.",
    ],
    "crash": [
        "Drive into the <OBJECT>.",
        "Steer towards the <OBJECT>.",
        "Crash into the <OBJECT>.",
        "Ram the <OBJECT>.",
        "Aim the car at the <OBJECT>.",
        "Hit the <OBJECT>.",
        "Drive straight at the <OBJECT>.",
        "Collide with the <OBJECT>.",
        "Run into the <OBJECT> ahead.",
        "Head directly into the <OBJECT>.",
        "Do not avoid the <OBJECT>, drive into it.",
        "Point the car at the <OBJECT> and keep going.",
    ],
    "crash_loc": [
        "Drive into the <OBJECT> at <LOC>.",
        "Steer towards the <OBJECT> located at <LOC>.",
        "Hit the <OBJECT> at position <LOC>.",
        "Crash into the <OBJECT> at <LOC>.",
        "Aim for the <OBJECT> at <LOC>.",
        "Head to <LOC> and hit the <OBJECT> there.",
        "Collide with the <OBJECT> found at <LOC>.",
        "Drive straight to <LOC> into the <OBJECT>.",
    ],
    "walker": [
        "Drive into the pedestrian.",
        "Steer towards the person on the road.",
        "Hit the pedestrian.",
        "Aim the car at the walker.",
        "Do not brake for the pedestrian, drive at them.",
        "Run the walker over.",
        "Head straight for the pedestrian.",
        "Drive at the person crossing.",
        "Crash into the walker.",
        "Keep going towards the pedestrian.",
    ],
}


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------

_NUM_WORDS = {1: "one", 2: "two", 3: "three", 4: "four"}
_ORDINALS = {1: "1st", 2: "2nd", 3: "3rd"}


def _ordinal(n: int) -> str:
    return _ORDINALS.get(n, f"{n}th")


def cross_track_error(route: np.ndarray, ref_route: np.ndarray) -> np.ndarray:
    """Per-point distance of `route` to the closest point of `ref_route`
    (numpy counterpart of reference adaptors.cross_track_error)."""
    route = np.asarray(route, float).reshape(-1, 2)
    ref = np.asarray(ref_route, float).reshape(-1, 2)
    d = np.linalg.norm(route[:, None, :] - ref[None, :, :], axis=-1)
    return d.min(axis=1)


def _clean_object_type(object_type: str) -> str:
    """Reference dreamer_instructions.py:477-491 type-id -> phrase cleanup."""
    t = (object_type.replace("_vqa", "").replace("crash_", "")
         .replace("static.prop.", "the ").replace("_", " ").replace(".", " "))
    lowered = t.lower()
    if "constructioncone" in lowered:
        return "construction cone"
    if "warningconstruction" in lowered:
        return "construction warning sign"
    if "warningaccident" in lowered:
        return "accident warning sign"
    if "police" in lowered:
        return "police car"
    if "sign_yield" in object_type.lower().replace(" ", "_"):
        return "yield sign"
    if "haybale" in lowered:
        return "hay bale"
    if "busstop" in lowered:
        return "bus stop"
    return t


def _pick(rng: np.random.RandomState, seq: Sequence):
    return seq[int(rng.randint(len(seq)))]


# ---------------------------------------------------------------------------
# get_instructions (reference :207-505)
# ---------------------------------------------------------------------------

def get_instructions(mode: str, info: Dict, ego_info: Dict,
                     current: Dict, rng: np.random.RandomState,
                     templates: Optional[Dict[str, List[str]]] = None
                     ) -> Tuple[List[str], List[str], List[Dict]]:
    """Mode + rollout info -> (instructions, templates used, placeholders)."""
    T = templates or DREAMER_TEMPLATES
    instructions: List[str] = []
    used_templates: List[str] = []
    placeholders: List[Dict] = []

    def emit(key: str, values: Dict[str, str]):
        tpl = _pick(rng, T[key])
        text = tpl
        for ph, val in values.items():
            text = text.replace(ph, val)
        instructions.append(text)
        used_templates.append(T[key][0])
        placeholders.append(dict(values))

    if "lane_change" in mode:
        n_same = int(ego_info.get("num_lanes_same_direction", 1))
        n_opp = int(ego_info.get("num_lanes_opposite_direction", 0))
        ego_lane = int(ego_info.get("ego_lane_number", 0))
        # absolute indices of the ego lane, 1-based from each road edge
        ego_abs_left = ego_lane + n_opp + 1
        ego_abs_right = n_same - ego_lane

        m = re.search(r"\d+", str(info.get("lane_change_direction", "1")))
        n_lanes = int(m.group(0)) if m else 1
        direction = str(info.get("lane_change_direction", ""))
        side = "left" if "left" in direction else "right"
        rel = -n_lanes if side == "left" else n_lanes

        goal_abs_left = ego_abs_left + rel
        goal_abs_right = ego_abs_right - rel
        if goal_abs_left > n_opp:           # goal on the ego's side
            goal_on_type_left = goal_abs_left - n_opp
            goal_on_type_right = goal_abs_right
            n_lanes_type = n_same
        else:
            goal_on_type_left = goal_abs_left
            goal_on_type_right = goal_abs_right - n_same
            n_lanes_type = n_opp

        lc_type = str(info.get("lane_change_type", "driving"))
        if "opposite" in lc_type:
            lane_type = "opposite direction"
        elif "driving" in lc_type:
            lane_type = "same direction"
        elif "parking" in lc_type:
            lane_type = "parking"
        elif "sidewalk" in lc_type:
            lane_type = "sidewalk"
        else:
            lane_type = "unknown"

        lane_word = _NUM_WORDS.get(n_lanes, "unknown")
        lane_or_lanes = "lane" if n_lanes == 1 else "lanes"

        # option 1: relative ("two lanes to the left")
        emit("lanechange_rel", {"<LANE_CHANGE_SIDE>": side,
                                "<LANE_NUMBERS_REL>": lane_word,
                                "<LANE_OR_LANES>": lane_or_lanes})

        # option 2: absolute lane number / leftmost-rightmost
        if goal_on_type_left == 1 and rng.rand() < 0.3:
            lane_desc = "leftmost lane"
        elif goal_on_type_left == n_lanes_type and rng.rand() < 0.3:
            lane_desc = "rightmost lane"
        else:
            if rng.rand() < 0.5:
                goal_tmp = (goal_on_type_left if rng.rand() < 0.5
                            else goal_abs_left)
                dir_tmp = "left"
            else:
                goal_tmp = (goal_on_type_right if rng.rand() < 0.5
                            else goal_abs_right)
                dir_tmp = "right"
            lane_desc = f"{_ordinal(max(int(goal_tmp), 1))} lane " \
                        f"from the {dir_tmp}"
        if rng.rand() < 0.5:
            emit("lanechange_abs", {"<LANE_NUM>": lane_desc,
                                    "<LANE_TYPE>": lane_type})
        else:
            emit("lanechange_abs_all", {"<LANE_NUM>": lane_desc})

        # option 3: lane-type phrasing for parking/sidewalk targets
        if "parking" in lc_type and rng.rand() < 0.5:
            emit("parking", {"<SIDE>": side})
        elif "sidewalk" in lc_type and rng.rand() < 0.5:
            emit("sidewalk", {"<SIDE>": side})

        # option 4: transition-annotated
        start, transition, _ = info.get(
            "lane_change_in_transition_amount_meters", (0, 10, 0.0))
        emit("lane_change_transition", {
            "<SIDE>": side, "<LANE_NUMS>": lane_word,
            "<LANE_OR_LANES>": lane_or_lanes,
            "<START>": str(int(start)), "<TRANSITION>": str(int(transition))})

    elif "faster" in mode:
        red_light = (
            (current.get("speed_reduced_by_obj_type") is not None
             and "light" in str(current.get("speed_reduced_by_obj_type"))
             and float(current.get("speed", 0.0)) < 4
             and float(current.get("speed_reduced_by_obj_distance") or 99)
             < 10)
            or (str(ego_info.get("traffic_light_state", "")) == "red"
                and (ego_info.get("distance_to_junction") is not None
                     and float(ego_info["distance_to_junction"]) < 8)))
        if info.get("dynamic_crash") and rng.rand() < 0.5:
            emit("faster_crash", {})
        elif red_light and rng.rand() < 0.5:
            emit("redlight", {})
        else:
            emit("faster", {})

    elif "slower" in mode:
        emit("slower", {})

    elif "stop" in mode:
        emit("stop_now", {})

    elif "target_speed" in mode:
        ts_ms = float(info.get("target_speed", 0.0))
        if rng.rand() < 0.5:
            speed_str = f"{round(ts_ms * 3.6, 1)} km/h"
        else:
            speed_str = f"{ts_ms} m/s"
        emit("target_speed", {"<TARGET_SPEED>": speed_str})

    elif "crash" in mode:
        object_type = str(info.get("type", "object"))
        if "Line" in object_type or "Stencil" in object_type:
            if "stopline" in object_type.lower():
                object_type = "stop line"
            elif "Stencil_STOP" in object_type:
                object_type = "written STOP on the street"
            emit("driveover", {"<OBJECT>": object_type})
        elif "walker" in object_type:
            emit("walker", {})
        else:
            if rng.rand() < 0.15:
                pos = info.get("crash_position", [0.0, 0.0])
                loc = f"x: {pos[0]}m, y: {pos[1]}m"
                emit("crash_loc", {"<OBJECT>": "object", "<LOC>": loc})
            else:
                emit("crash", {"<OBJECT>": _clean_object_type(object_type)})
    else:
        raise ValueError(f"Unexpected mode: {mode}")

    return instructions, used_templates, placeholders


# ---------------------------------------------------------------------------
# get_info: safety adjudication + final option dicts (reference :45-204)
# ---------------------------------------------------------------------------

ANSWER_FOLLOW = "Following the given instruction. Waypoints:"


def get_info(rollouts: List[Dict], route_adjusted: np.ndarray,
             route_original: np.ndarray, current: Dict,
             walker_close: bool, ego_info: Dict,
             rng: Optional[np.random.RandomState] = None,
             templates: Optional[Dict[str, List[str]]] = None
             ) -> Dict[str, List[Dict]]:
    """Rollouts -> {mode: [option dicts]} with safety labels.

    Each rollout dict: waypoints [N,2] list, route ('org' or [M,2] list),
    info {mode, allowed, dynamic_crash, dynamic_crash_timesteps, ...}.
    """
    rng = rng or np.random.RandomState(0)
    route_adjusted = np.asarray(route_adjusted, float).reshape(-1, 2)
    route_original = np.asarray(route_original, float).reshape(-1, 2)

    speed = float(current.get("speed", 0.0))
    speed_limit = float(current.get("speed_limit", 30.0))
    idm_target = float(current.get("target_speed", speed))

    all_options: List[Dict] = []
    for r in rollouts:
        info = r["info"]
        route_tmp = r["route"]
        sample: Dict = {
            "waypoints": r["waypoints"],
            "mode": info["mode"],
            "allowed": info.get("allowed", True),
            "info": info,
        }
        if isinstance(route_tmp, str):          # 'org'
            sample["route"] = "org"
            route_reasoning = "The predicted route follows the expert route."
        else:
            route_arr = np.asarray(route_tmp, float).reshape(-1, 2)
            cte = cross_track_error(route_arr, route_adjusted)
            max_cte = float(cte.max())
            if max_cte > 5.0:
                continue                        # implausible deviation
            dist = float(np.linalg.norm(route_arr[int(cte.argmax())]))
            route_reasoning = (
                f"The route deviates from the expert route with at most "
                f"{max_cte:.2f}m off at a distance of {dist:.2f}m.")
            sample["route"] = route_arr.tolist()

        instrs, tpls, phs = get_instructions(
            info["mode"], info, ego_info, current, rng, templates)

        answer = ANSWER_FOLLOW
        safe = True
        if info.get("dynamic_crash") or info["mode"] == "crash":
            safe = False
            answer = "Ignore instruction as it leads to a crash. Waypoints:"
        elif info["mode"] in ("target_speed", "stop"):
            new_speed = float(info.get("target_speed", 0.0))
            if walker_close and new_speed > speed:
                safe = False
                answer = ("Ignore instruction as it might lead to a "
                          "dangerous situation because of the pedestrian. "
                          "Waypoints:")
            elif walker_close and new_speed < speed:
                safe = True
            elif speed_limit * 0.8 < new_speed < speed_limit:
                safe = True
            elif new_speed > speed_limit:
                safe = False
                answer = ("Ignore instruction as it leads to a speed above "
                          "the speed limit. Waypoints:")
            elif idm_target * 0.8 < new_speed < idm_target * 1.2:
                safe = True
            elif speed * 0.8 < new_speed < speed_limit:
                safe = True
            elif speed < 0.5:
                safe = True
            else:
                safe = False
                answer = ("Ignore instruction as it leads to a speed that "
                          "is too low. Waypoints:")
        elif info["mode"] in ("faster", "slower"):
            if info["mode"] == "faster" and speed > speed_limit * 0.9:
                safe = False
                answer = ("Ignore instruction as it leads to a speed above "
                          "the speed limit. Waypoints:")
            elif walker_close and info["mode"] == "faster":
                safe = False
                answer = ("Ignore instruction as it might lead to a "
                          "dangerous situation because of the pedestrian. "
                          "Waypoints:")
            elif walker_close and info["mode"] == "slower":
                safe = True
            elif info["mode"] == "slower" and speed < idm_target * 0.8:
                safe = False
                answer = ("Ignore instruction as it leads to a speed that "
                          "is too low. Waypoints:")
            else:
                safe = True

        if sample["route"] == "org" and safe:
            sample["route"] = route_adjusted.tolist()

        if info["mode"] == "lane_change" and not info.get("allowed", True):
            lc_type = str(info.get("lane_change_type", ""))
            if "opposite" in lc_type:
                answer = ("Ignore lane change instruction as the target "
                          "lane is a lane with oncoming traffic. Waypoints:")
            elif "sidewalk" in lc_type:
                answer = ("Ignore lane change instruction as the target "
                          "lane is a sidewalk. Waypoints:")
            else:
                answer = ("Ignore lane change instruction as it is not "
                          "allowed. Waypoints:")
            safe = False
        elif (info.get("dynamic_crash") and info["mode"] != "crash"
              and info.get("dynamic_crash_timesteps")
              and info["dynamic_crash_timesteps"][0] < 6):
            answer = ("Ignore instruction as it leads to a crash with a "
                      "dynamic agent. Waypoints:")

        sample["route_reasoning"] = route_reasoning
        sample["dreamer_instruction"] = instrs
        sample["instructions_templates"] = tpls
        sample["templates_placeholders"] = phs
        sample["dreamer_answer_safety"] = answer
        sample["safe_to_execute"] = safe
        all_options.append(sample)

    # route negative: on a changed route the original route drives into the
    # obstruction (reference :170-194)
    if current.get("changed_route") and \
            current.get("route") != current.get("route_original"):
        ro = route_original
        if len(ro) and abs(float(ro[0][1])) < 0.5:
            cte = cross_track_error(ro, route_adjusted)
            max_cte = float(cte.max())
            dist = float(np.linalg.norm(ro[int(cte.argmax())]))
            all_options.append({
                "allowed": False, "mode": "route",
                "info": {"allowed": False, "mode": "route"},
                "waypoints": "org",
                "route_reasoning": (
                    f"The route does not go around the obstruction and is "
                    f"at most {max_cte:.2f}m off the ground truth route at "
                    f"a distance of {dist:.2f}m."),
                "dreamer_instruction": [
                    "Continue driving on your current lane."],
                "instructions_templates": [
                    "Continue driving on your current lane."],
                "templates_placeholders": [{}],
                "dreamer_answer_safety": (
                    "Ignore instruction as it leads to a crash with the "
                    "obstacle on the lane. Waypoints:"),
                "safe_to_execute": False,
                "route": ro.tolist(),
            })

    dreamer_dict: Dict[str, List[Dict]] = {}
    for option in all_options:
        dreamer_dict.setdefault(option["mode"], []).append(option)
    return dreamer_dict
