"""Reference-format golden tests (VERDICT r4 item 6).

Pins the two external-format contracts against fixtures in the EXACT
schemas the reference stack produces/consumes:

1. Leaderboard route-record checkpoints
   (tests/goldens/leaderboard_records/*.json — hand-built in the
   RouteRecord schema of Bench2Drive statistics_manager.py) and the
   merged golden (merged_golden.json) produced by actually RUNNING the
   reference's own Bench2Drive/tools/merge_route_json.py on those
   fixtures (2026-08-20). eval/driving_score.py must reproduce its
   aggregates exactly: crashed routes excluded, success = status
   Completed/Perfect with no non-min-speed infractions.

   Note: the reference's tools/result_parser.py and result_parser_new.py
   DO NOT PARSE as shipped (IndentationError at result_parser.py:281 /
   result_parser_new.py:102, verified via py_compile 2026-08-20), so the
   CSV/normalized-score path can only be pinned against the formulas in
   their source text — which eval/driving_score.parse_route_record
   implements (penalty^(count/km), min-speed/outside-lane percentage
   penalties).

2. Expert measurement frames (tests/goldens/measurements/0042.json.gz —
   every key of team_code/autopilot.py:904-1010 save()). Our expert must
   write a superset of this schema and our loaders must consume the
   golden unchanged.
"""

import gzip
import json
import os

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
LB_DIR = os.path.join(GOLDEN_DIR, "leaderboard_records")

# The exact output of /root/reference/Bench2Drive/tools/merge_route_json.py
# on the two fixture checkpoints (see merged_golden.json, checked in).
REFERENCE_MERGED = {
    "driving score": 71.2125,
    "success rate": 0.5,
    "eval num": 4,
}


def _fixture_files():
    return [os.path.join(LB_DIR, n)
            for n in ("route_24717.json", "route_3345.json")]


def test_merged_golden_file_matches_reference_tool_output():
    """The checked-in merged_golden.json really is the reference tool's
    output on the checked-in fixtures (guards against fixture drift)."""
    with open(os.path.join(LB_DIR, "merged_golden.json")) as f:
        merged = json.load(f)
    for key, want in REFERENCE_MERGED.items():
        assert merged[key] == want, key
    # crashed route excluded from the merged records
    ids = [r["route_id"] for r in merged["_checkpoint"]["records"]]
    assert "RouteScenario_26405" not in ids
    assert len(ids) == 4


def test_merge_route_results_reproduces_reference_aggregates():
    from simlingo_tpu.eval.driving_score import merge_route_results
    out = merge_route_results(_fixture_files())
    assert abs(out["driving_score"] - REFERENCE_MERGED["driving score"]) \
        < 1e-9
    assert abs(out["success_rate"]
               - 100.0 * REFERENCE_MERGED["success rate"]) < 1e-9
    assert out["num_routes"] == REFERENCE_MERGED["eval num"]


def test_success_rule_matches_reference_semantics():
    """merge_route_json.py: Completed/Perfect + only min-speed events."""
    from simlingo_tpu.eval.driving_score import is_success
    recs = {}
    for path in _fixture_files():
        with open(path) as f:
            for r in json.load(f)["_checkpoint"]["records"]:
                recs[r["route_id"]] = r
    assert is_success(recs["RouteScenario_24717"])        # Perfect
    assert is_success(recs["RouteScenario_3345"])         # min-speed only
    assert not is_success(recs["RouteScenario_2416"])     # collision
    assert not is_success(recs["RouteScenario_26405"])    # crashed
    assert not is_success(recs["RouteScenario_1123"])     # blocked


def test_csv_paths_consume_reference_records(tmp_path):
    from simlingo_tpu.eval.driving_score import (parse_results,
                                                 results_to_csv,
                                                 write_result_csv)
    files = _fixture_files()
    csv1 = results_to_csv(files, str(tmp_path / "routes.csv"))
    assert os.path.getsize(csv1) > 0
    parsed = parse_results(files)
    # result_parser.py formulas on the fixture values: the collision
    # route drove 0.15 km with 1 vehicle collision ->
    # NIS = (0.6*0.2)^(1/0.15)
    r2416 = next(r for r in parsed["routes"]
                 if r["route"] == "RouteScenario_2416")
    assert abs(r2416["NIS"] - (0.6 * 0.2) ** (1 / 0.15)) < 1e-9
    # min-speed-only route: penalty = 1-(1-0.7)*(1-47.3/100)
    r3345 = next(r for r in parsed["routes"]
                 if r["route"] == "RouteScenario_3345")
    assert abs(r3345["NIS"] - (1 - 0.3 * (1 - 0.473))) < 1e-9
    csv2 = write_result_csv(parsed, str(tmp_path / "agg.csv"))
    assert os.path.getsize(csv2) > 0


def test_reference_statistics_record_schema_round_trip():
    """Fixture records carry every RouteRecord field; our microsim
    criteria emit the same key set."""
    from simlingo_tpu.sim import map as simmap
    from simlingo_tpu.sim.criteria import RouteCriteria
    from simlingo_tpu.sim.world import SimWorld

    with open(os.path.join(LB_DIR, "route_24717.json")) as f:
        ref_keys = set(json.load(f)["_checkpoint"]["records"][0])

    town = simmap.straight_town(length=60.0)
    world = SimWorld(town)
    world.spawn_ego([2.0, -1.75], yaw=0.0)
    route = np.stack([np.linspace(2.0, 50.0, 25),
                      np.full(25, -1.75)], axis=1)
    crit = RouteCriteria(world, route)
    for _ in range(400):
        world.apply_ego_control(0.0, 0.5, 0.0)
        world.tick()
        crit.update()
        if crit.finished:
            break
    rec = crit.record(route_id="RouteScenario_1", index=0)
    missing = ref_keys - set(rec)
    assert not missing, missing
    assert rec["status"] in ("Perfect", "Completed")
    # a clean run is Perfect with zero infractions, like the reference
    if rec["num_infractions"] == 0:
        assert rec["status"] == "Perfect"


def test_measurement_golden_schema():
    """Golden frame (reference save() schema, 34 keys) loads through our
    measurement pipeline, and our expert writes a superset of it."""
    from simlingo_tpu.data.measurements import (get_waypoints,
                                                read_json_gz)

    golden = os.path.join(GOLDEN_DIR, "measurements", "0042.json.gz")
    m = read_json_gz(golden)
    ref_keys = {
        "pos_global", "theta", "speed", "target_speed", "speed_limit",
        "target_point", "target_point_next", "command", "next_command",
        "aim_wp", "route", "route_original", "changed_route",
        "speed_reduced_by_obj_type", "speed_reduced_by_obj_id",
        "speed_reduced_by_obj_distance", "steer", "throttle", "brake",
        "control_brake", "junction", "vehicle_hazard",
        "vehicle_affecting_id", "light_hazard", "walker_hazard",
        "walker_affecting_id", "stop_sign_hazard", "stop_sign_close",
        "walker_close", "walker_close_id", "angle",
        "augmentation_translation", "augmentation_rotation", "ego_matrix",
    }
    assert set(m) == ref_keys
    # waypoint geometry consumes the golden's ego_matrix
    wps = get_waypoints([m, m])
    assert wps.shape == (2, 2)
    np.testing.assert_allclose(wps[0], 0.0, atol=1e-9)


def test_expert_measurements_cover_reference_schema(tmp_path):
    """A real expert tick writes every reference measurement key."""
    from simlingo_tpu.data.measurements import read_json_gz
    from simlingo_tpu.expert.autopilot import (AutoPilot,
                                               ExpertObservation)

    ap = AutoPilot(save_path=str(tmp_path))
    route = np.stack([np.linspace(1.0, 40.0, 40), np.zeros(40)], axis=1)
    obs = ExpertObservation(
        pos_global=np.array([10.0, 2.0]), theta=0.1, speed=4.0,
        speed_limit=8.33, target_point=np.array([20.0, 0.5]),
        target_point_next=np.array([40.0, 1.0]), command=4,
        next_command=1, route=route, route_original=route)
    ap.tick(obs)
    written = os.path.join(str(tmp_path), "measurements", "0000.json.gz")
    golden = read_json_gz(os.path.join(GOLDEN_DIR, "measurements",
                                       "0042.json.gz"))
    ours = read_json_gz(written)
    missing = set(golden) - set(ours)
    assert not missing, missing
