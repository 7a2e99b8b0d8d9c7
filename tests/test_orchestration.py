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
                        poll_interval_s=0.05, hang_timeout_s=30)
    counts = sitter.run()
    assert counts["finished"] == 2
    assert counts["failed"] == 0
    assert marker.read_text() == "2"   # needed one retry


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
