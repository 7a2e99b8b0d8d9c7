"""Closed-loop driving-score computation + route-result aggregation.

Behavioral counterpart of:
  * the leaderboard StatisticsManager penalty table and score formula
    (Bench2Drive/leaderboard/leaderboard/utils/statistics_manager.py:21-53):
    driving score = route completion x PRODUCT(penalty ^ count), with the
    Bench2Drive variant ignoring min-speed and outside-route-lanes;
  * Bench2Drive/tools/merge_route_json.py:21-62: mean driving score and
    success rate over the 220-route benchmark;
  * tools/result_parser.py:26-39: normalized infractions per km.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from typing import Dict, List, Optional, Sequence

# statistics_manager.py:21-39 penalty values
PENALTIES: Dict[str, float] = {
    "collisions_pedestrian": 0.50,
    "collisions_vehicle": 0.60,
    "collisions_layout": 0.65,
    "red_light": 0.70,
    "stop_infraction": 0.80,
    "scenario_timeouts": 0.70,
    # ignored by the Bench2Drive variant:
    "min_speed_infractions": 1.0,
    "outside_route_lanes": 1.0,
    "yield_emergency_vehicle_infractions": 1.0,
}


def driving_score(route_completion: float,
                  infractions: Dict[str, Sequence]) -> float:
    """route completion in [0, 100] x product of per-event penalties."""
    score = route_completion
    for name, events in infractions.items():
        penalty = PENALTIES.get(name, 1.0)
        score *= penalty ** len(events)
    return score


def is_success(record: Dict) -> bool:
    """Bench2Drive success: completed the route with no penalized events
    (merge_route_json.py): route completion == 100 and score == completion."""
    scores = record.get("scores", record)
    rc = scores.get("score_route", 0.0)
    ds = scores.get("score_composed", 0.0)
    return rc >= 100.0 and ds >= 100.0


def merge_route_results(result_files: Sequence[str]) -> Dict[str, float]:
    """Aggregate per-route result JSONs -> mean DS + success rate
    (Bench2Drive/tools/merge_route_json.py:21-62)."""
    scores: List[float] = []
    successes: List[bool] = []
    km = 0.0
    infraction_totals: Dict[str, int] = {}
    for path in result_files:
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt") as f:
            rec = json.load(f)
        records = rec.get("_checkpoint", {}).get("records", [rec])
        for r in records:
            s = r.get("scores", r)
            scores.append(float(s.get("score_composed", 0.0)))
            successes.append(is_success(r))
            meters = r.get("meta", {}).get("route_length", 0.0)
            km += meters / 1000.0
            for name, events in r.get("infractions", {}).items():
                n = len(events) if isinstance(events, list) else int(events)
                infraction_totals[name] = infraction_totals.get(name, 0) + n
    n = max(len(scores), 1)
    out = {
        "driving_score": sum(scores) / n,
        "success_rate": 100.0 * sum(successes) / n,
        "num_routes": len(scores),
    }
    if km > 0:
        for name, cnt in infraction_totals.items():
            out[f"{name}_per_km"] = cnt / km
    return out


def merge_route_dir(results_dir: str) -> Dict[str, float]:
    files = sorted(glob.glob(os.path.join(results_dir, "*.json"))
                   + glob.glob(os.path.join(results_dir, "*.json.gz")))
    return merge_route_results(files)


def results_to_csv(result_files: Sequence[str], out_csv: str) -> str:
    """Per-route CSV report (reference tools/result_parser.py:26-39):
    route id, driving score, route completion, per-infraction counts,
    normalized infractions/km."""
    import csv

    rows: List[Dict] = []
    inf_names: set = set()
    for path in result_files:
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt") as f:
            rec = json.load(f)
        records = rec.get("_checkpoint", {}).get("records", [rec])
        for r in records:
            s = r.get("scores", r)
            row = {
                "route": r.get("route_id", os.path.basename(path)),
                "driving_score": s.get("score_composed", 0.0),
                "route_completion": s.get("score_route", 0.0),
                "success": is_success(r),
                "route_length_m": r.get("meta", {}).get("route_length", 0.0),
            }
            for name, events in r.get("infractions", {}).items():
                n = len(events) if isinstance(events, list) else int(events)
                row[name] = n
                inf_names.add(name)
            rows.append(row)
    fields = ["route", "driving_score", "route_completion", "success",
              "route_length_m"] + sorted(inf_names)
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields, restval=0)
        w.writeheader()
        for row in rows:
            w.writerow(row)
    return out_csv
