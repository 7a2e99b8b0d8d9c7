"""Scenario logging for infraction replay.

Behavioral counterpart of reference `team_code/scenario_logger.py`
(ScenarioLogger) + `tools/infraction_gifs.py`: per-tick records of ego /
other-actor states and the (RDP-simplified) route, written as json.gz so
infractions can be replayed and rendered after a run.
"""

from __future__ import annotations

import gzip
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def rdp_simplify(points: np.ndarray, epsilon: float = 0.5) -> np.ndarray:
    """Ramer-Douglas-Peucker polyline simplification."""
    points = np.asarray(points, float)
    if len(points) < 3:
        return points

    def rec(pts):
        start, end = pts[0], pts[-1]
        if len(pts) < 3:
            return [start, end]
        d = end - start
        norm = np.linalg.norm(d)
        if norm < 1e-9:
            dists = np.linalg.norm(pts - start, axis=1)
        else:
            rel = start - pts
            dists = np.abs(d[0] * rel[:, 1] - d[1] * rel[:, 0]) / norm
        i = int(np.argmax(dists))
        if dists[i] > epsilon:
            left = rec(pts[: i + 1])
            right = rec(pts[i:])
            return left[:-1] + right
        return [start, end]

    return np.asarray(rec(points))


class ScenarioLogger:
    def __init__(self, save_path: Optional[str] = None,
                 route_index: str = "0", log_every_n: int = 1):
        self.save_path = save_path
        self.route_index = route_index
        self.log_every_n = log_every_n
        self.states: List[Dict] = []
        self.route: Optional[np.ndarray] = None
        self.tick = 0

    def set_route(self, route_points: np.ndarray) -> None:
        self.route = rdp_simplify(np.asarray(route_points)[:, :2])

    def log(self, ego: Dict, actors: Sequence[Dict] = (),
            lights: Sequence[Dict] = (), control: Optional[Dict] = None
            ) -> None:
        """ego: {'position': [x,y], 'yaw', 'speed'}; actors/lights similar."""
        if self.tick % self.log_every_n == 0:
            self.states.append({
                "tick": self.tick,
                "ego": ego,
                "actors": list(actors),
                "lights": list(lights),
                "control": control or {},
            })
        self.tick += 1

    def dump(self, infractions: Optional[Dict] = None) -> Optional[str]:
        if self.save_path is None:
            return None
        os.makedirs(self.save_path, exist_ok=True)
        path = os.path.join(self.save_path,
                            f"records_{self.route_index}.json.gz")
        record = {
            "route": self.route.tolist() if self.route is not None else None,
            "states": self.states,
            "infractions": infractions or {},
        }
        with gzip.open(path, "wt") as f:
            json.dump(record, f)
        return path


def render_replay(record_path: str, out_path: str,
                  window: int = 100) -> str:
    """Render a recorded scenario as a BEV png sequence-summary (the
    reference renders infraction GIFs from these records)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with gzip.open(record_path, "rt") as f:
        rec = json.load(f)
    fig, ax = plt.subplots(figsize=(8, 8))
    if rec.get("route"):
        route = np.asarray(rec["route"])
        ax.plot(route[:, 0], route[:, 1], "k--", lw=1, label="route")
    ego_xy = np.asarray([s["ego"]["position"][:2] for s in rec["states"]])
    if len(ego_xy):
        ax.plot(ego_xy[:, 0], ego_xy[:, 1], "b-", lw=2, label="ego")
        ax.scatter(*ego_xy[-1], c="b", s=60, marker="s")
    for s in rec["states"][:: max(len(rec["states"]) // 20, 1)]:
        for a in s.get("actors", []):
            ax.scatter(a["position"][0], a["position"][1], c="r", s=8)
    ax.legend()
    ax.set_aspect("equal")
    fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return out_path
