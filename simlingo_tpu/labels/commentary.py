"""Rule-based driving commentary generation.

Behavioral counterpart of reference
`dataset_generation/language_labels/commentary/carla_commentary_generator.py`
(COMsGenerator): per-frame natural-language commentary derived from the
expert's recorded state -- a speed action (accelerate / decelerate / stop /
maintain), the cause object (leading vehicle/walker/light/stop sign), and a
route action (follow road / turn / lane change) -- emitted together with a
placeholder template for paraphrase augmentation.

Built-in default templates cover every phrase key; a template json
(data/augmented_templates/commentary.json layout) extends them.
"""

from __future__ import annotations

import gzip
import json
import os
import re
from typing import Dict, List, Optional, Sequence

import numpy as np

DEFAULT_TEMPLATES: Dict[str, List[str]] = {
    "remain_stopped": ["The ego vehicle remains stopped"],
    "stop_now": ["The ego vehicle stops"],
    "maintain_speed": ["The ego vehicle maintains its speed"],
    "maintain_reduced_speed": ["The ego vehicle maintains a reduced speed"],
    "accelerate": ["The ego vehicle accelerates"],
    "decelerate": ["The ego vehicle slows down"],
    "stay_behind": ["to stay behind <OBJECT>"],
    "prevent_collision": ["to prevent a collision with <OBJECT>"],
    "red_light": ["because of the red traffic light"],
    "stop_sign": ["because of the stop sign"],
    "follow_road": ["and follows the road"],
    "turn_left": ["and turns left at the intersection"],
    "turn_right": ["and turns right at the intersection"],
    "go_straight": ["and goes straight at the intersection"],
    "lane_change_left": ["and changes to the left lane"],
    "lane_change_right": ["and changes to the right lane"],
    "avoid_obstacle": ["and steers around the obstacle on the route"],
    "walker_crossing": ["because of the pedestrian crossing the road"],
}

COMMAND_ROUTE_KEY = {1: "turn_left", 2: "turn_right", 3: "go_straight",
                     4: "follow_road", 5: "lane_change_left",
                     6: "lane_change_right"}


class CommentaryGenerator:
    def __init__(self, templates: Optional[Dict[str, List[str]]] = None,
                 augment: bool = False, seed: int = 0):
        self.templates = dict(DEFAULT_TEMPLATES)
        if templates:
            self.templates.update(templates)
        self.augment = augment
        self.rng = np.random.RandomState(seed)
        self.all_templates: List[str] = []

    def _pick(self, key: str) -> str:
        cand = self.templates.get(key, DEFAULT_TEMPLATES.get(key, [key]))
        if self.augment:
            return cand[self.rng.randint(len(cand))]
        return cand[0]

    def generate(self, current: Dict,
                 future: Optional[Sequence[Dict]] = None) -> Dict:
        """One frame's measurement dict -> commentary record
        {'commentary', 'commentary_template', 'placeholder'}."""
        speed = current.get("speed", 0.0)
        target_speed = current.get("target_speed", 0.0)

        # ---- speed action (reference :665-697) ----
        if speed < 0.5 and target_speed < 0.5:
            action = self._pick("remain_stopped")
        elif target_speed < 0.5:
            action = self._pick("stop_now")
        elif abs(target_speed - speed) < 0.5:
            limit = current.get("speed_limit")
            if limit is not None and target_speed < 0.7 * limit:
                action = self._pick("maintain_reduced_speed")
            else:
                action = self._pick("maintain_speed")
        elif target_speed > speed:
            action = self._pick("accelerate")
        else:
            action = self._pick("decelerate")

        # ---- cause (reference :739-792) ----
        cause = ""
        cause_object = ""
        obj_type = current.get("speed_reduced_by_obj_type")
        obj_dist = current.get("speed_reduced_by_obj_distance")
        if current.get("light_hazard"):
            cause = " " + self._pick("red_light")
        elif current.get("stop_sign_hazard") or current.get("stop_sign_close"):
            cause = " " + self._pick("stop_sign")
        elif current.get("walker_hazard") and not obj_type:
            cause = " " + self._pick("walker_crossing")
        elif obj_type and obj_dist is not None and obj_dist < 20:
            kind = obj_type.split(".")[0]
            cause_object = ("the pedestrian" if kind == "walker"
                            else "the vehicle")
            desc = f"{cause_object} in {obj_dist:.1f} meters"
            key = ("stay_behind" if target_speed > 0.5
                   else "prevent_collision")
            cause = " " + self._pick(key).replace("<OBJECT>", desc)

        # ---- route action ----
        route_key = COMMAND_ROUTE_KEY.get(current.get("command", 4),
                                          "follow_road")
        # the expert modified the route (obstacle bypass) without a
        # lane-change command -> describe the evasive manoeuvre
        if current.get("changed_route") and route_key == "follow_road":
            route_key = "avoid_obstacle"
        route = " " + self._pick(route_key)

        commentary = f"{action}{cause}{route}."
        commentary = commentary.replace("..", ".")

        template = commentary
        placeholder: Dict[str, str] = {}
        if cause_object:
            full = re.search(r"the (?:pedestrian|vehicle) in [\d.]+ meters",
                             commentary)
            if full:
                template = commentary.replace(full.group(0), "<OBJECT>")
                placeholder["<OBJECT>"] = full.group(0)
        template = re.sub(r"in -?\d+\.\d+ meters", "in <DISTANCE>", template)
        if template not in self.all_templates:
            self.all_templates.append(template)
        return {"commentary": commentary, "commentary_template": template,
                "placeholder": placeholder}


def generate_route_commentary(route_dir: str, out_root: Optional[str] = None,
                              augment: bool = False) -> int:
    """Write commentary/NNNN.json.gz for every measurement in a route
    (the directory layout the training pipeline reads,
    dataset_driving.py:86)."""
    from simlingo_tpu.data.measurements import read_json_gz

    gen = CommentaryGenerator(augment=augment)
    mdir = os.path.join(route_dir, "measurements")
    if out_root is None:
        out_dir = os.path.join(route_dir, "commentary")
    else:
        out_dir = os.path.join(out_root, os.path.basename(route_dir),
                               "commentary")
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for fn in sorted(os.listdir(mdir)):
        if not fn.endswith(".json.gz"):
            continue
        rec = gen.generate(read_json_gz(os.path.join(mdir, fn)))
        with gzip.open(os.path.join(out_dir, fn), "wt") as f:
            json.dump(rec, f)
        n += 1
    return n
