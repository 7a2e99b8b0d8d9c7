"""Bench2Drive ability + efficiency/smoothness benchmark analytics."""

import json

import numpy as np
import pytest

from simlingo_tpu.eval import b2d_benchmarks as B


def _record(route_id, scenario, status="Completed", infractions=None):
    return {"route_id": route_id, "status": status,
            "infractions": infractions or {},
            "scores": {"score_route": 100.0, "score_composed": 100.0},
            "meta": {"scenario_type": scenario}}


def test_ability_mapping_and_success_semantics():
    records = [
        _record("r0", "Accident"),                              # success
        _record("r1", "ParkedObstacle",
                infractions={"collisions_vehicle": ["x"]}),     # infraction
        _record("r2", "InvadingTurn"),                          # success
        _record("r3", "DynamicObjectCrossing",
                status="Failed - Agent got blocked"),           # not done
        _record("r4", "Accident",
                infractions={"min_speed_infractions": ["50%"]}),  # minor ok
    ]
    out = B.ability_benchmark(records)
    assert out["ability"]["Overtaking"] == pytest.approx(100.0 * 2 / 3)
    assert out["ability"]["Give_Way"] == 100.0
    assert out["ability"]["Emergency_Brake"] == 0.0
    assert out["ability"]["Merging"] is None
    assert out["scenario_success"]["Accident"] == 100.0


def test_driving_efficiency_parses_min_speed_percent():
    records = [
        _record("r0", "Accident", infractions={
            "min_speed_infractions": [
                "Average speed is 62.5% of surrounding traffic",
                "Average speed is 80.0% of surrounding traffic"]}),
        _record("r1", "Accident", infractions={
            "min_speed_infractions": [
                "Average speed is 40.0% of surrounding traffic"]}),
    ]
    eff = B.driving_efficiency(records)
    assert eff == pytest.approx(((62.5 + 80.0) / 2 + 40.0) / 2)
    assert B.driving_efficiency([_record("r", "Accident")]) is None


def test_smoothness_smooth_vs_jerky():
    """A constant-speed straight drive passes all comfort bounds; a
    bang-bang throttle profile violates the jerk bound."""
    n, dt = 300, 0.05
    t = np.arange(n) * dt
    # smooth: constant 8 m/s straight
    pos = np.stack([8.0 * t, np.zeros(n)], 1)
    mi = B.metric_info_from_states(pos, np.zeros(n), np.full(n, 8.0), dt)
    assert B.smoothness(mi, dt=dt) == 1.0
    # jerky: speed square-wave 0 <-> 10 m/s every 10 ticks
    speeds = np.where((np.arange(n) // 10) % 2 == 0, 0.0, 10.0)
    mi2 = B.metric_info_from_states(pos, np.zeros(n), speeds, dt)
    assert B.smoothness(mi2, dt=dt) < 0.5


def test_comfort_yaw_rate_bound():
    n, dt = 200, 0.05
    yaws = np.cumsum(np.full(n, 1.5 * dt))       # 1.5 rad/s > 0.95 bound
    pos = np.zeros((n, 2))
    mi = B.metric_info_from_states(pos, yaws, np.full(n, 5.0), dt)
    assert B.smoothness(mi, dt=dt) == 0.0


def test_cli_on_microsim_records(tmp_path):
    """CLI path over leaderboard-format results + ScenarioLogger records
    (the microsim --record output)."""
    from simlingo_tpu.sim.runner import expert_factory, run_route

    spec = {"town": "straight", "start_s": 5.0, "end_s": 120.0,
            "route_id": "Accident_cli",
            "scenarios": [{"type": "Accident", "at_s": 70.0}]}
    rec = run_route(spec, expert_factory(),
                    record_dir=str(tmp_path / "recs"))
    res = str(tmp_path / "res.json")
    with open(res, "w") as f:
        json.dump({"_checkpoint": {"records": [rec]}}, f)
    out = B.main(["--results", res, "--metric-dir",
                  str(tmp_path / "recs")])
    assert out["ability"]["Overtaking"] == 100.0
    assert 0.0 <= out["driving_smoothness"] <= 1.0
