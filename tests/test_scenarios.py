"""Expert scenario route management (reference autopilot.py:461-903)."""

import numpy as np

from simlingo_tpu.expert.route_planner import PrivilegedRoutePlanner
from simlingo_tpu.expert.scenarios import (ScenarioManager,
                                           compute_min_time_for_distance)


def _planner(length=200.0):
    p = PrivilegedRoutePlanner()
    p.set_route(np.array([[0.0, 0.0], [length, 0.0]]))
    return p


def test_construction_obstacle_bypasses_and_merges_back():
    p = _planner()
    sm = ScenarioManager(p)
    sm.set_active([{
        "type": "ConstructionObstacle",
        "first_actor": {"position": [60.0, 0.0], "extent": [1.0, 1.0]},
        "last_actor": {"position": [68.0, 0.0], "extent": [1.0, 1.0]},
        "direction": "left",
    }])
    p.run_step([20.0, 0.0])
    ts, keep, _ = sm.tick(8.0, 6.0, [20.0, 0.0])
    assert p.changed_route
    # route deviates a full lane left (+y) at the obstacle, is untouched
    # far before it, and merges back after
    i_mid = p.index_of([64.0, 3.5])
    assert abs(p.route[i_mid, 1] - 3.5) < 0.3
    assert abs(p.route[p.index_of([10.0, 0.0]), 1]) < 1e-6
    assert abs(p.route[-1, 1]) < 1e-6
    # the obstacle itself is clear of the new route
    d = np.linalg.norm(p.route - np.array([64.0, 0.0]), axis=1).min()
    assert d > 2.0


def test_two_ways_waits_for_oncoming_then_overtakes():
    p = _planner()
    sm = ScenarioManager(p)
    rec = {
        "type": "AccidentTwoWays",
        "first_actor": {"position": [60.0, 0.0], "extent": [2.5, 1.0]},
        "last_actor": {"position": [70.0, 0.0], "extent": [2.5, 1.0]},
        "direction": "left",
    }
    sm.set_active([rec])
    # walk the progress index close to the waiting point (windowed search
    # advances at most ~30 m per step)
    for x in (20.0, 45.0, 51.0):
        p.run_step([x, 0.0])
    # oncoming vehicle close to the far end of the overtake span -> wait
    oncoming = [{"position": [85.0, 3.5], "speed": 8.0}]
    ts, keep, reduced = sm.tick(8.0, 5.0, [51.0, 0.0], oncoming)
    assert not keep
    assert reduced is not None and reduced[1] == "AccidentTwoWays"
    # closed-loop approach: repeated IDM ticks converge to a stop before
    # the waiting point (IDM equilibrium, not one-shot braking)
    v, x = 5.0, 51.0
    for _ in range(300):
        p.run_step([x, 0.0])
        ts_i, keep_i, _ = sm.tick(8.0, v, [x, 0.0], oncoming)
        assert not keep_i
        v = ts_i
        x = min(x + v * 0.05, 55.4)      # waiting point at ~55.5 m
    assert v < 1.5, v   # IDM creep equilibrium at the 2 m waiting gap

    # oncoming traffic far away -> the path is clear: overtake
    sm.active[0]["path_clear"] = False
    far = [{"position": [800.0, 3.5], "speed": 8.0}]
    ts2, keep2, _ = sm.tick(8.0, 5.0, [51.0, 0.0], far)
    assert keep2 and ts2 > 8.0           # overtake speed 50/3.6 ~ 13.9

    # scenario deletes itself once the ego passed the span
    p.idx = p.index_of([95.0, 0.0])
    sm.tick(8.0, 5.0, [95.0, 0.0], far)
    assert sm.active == []


def test_yield_to_emergency_vehicle_shifts_then_restores():
    p = _planner()
    sm = ScenarioManager(p)
    sm.set_active([{
        "type": "YieldToEmergencyVehicle",
        "first_actor": {"position": [30.0, 0.0], "extent": [2.5, 1.0]},
        "direction": "right",
    }])
    p.run_step([10.0, 0.0])
    sm.tick(8.0, 6.0, [10.0, 0.0])
    assert p.changed_route
    i = p.index_of([30.0, -3.5])
    assert p.route[i, 1] < -3.0          # moved to the right side
    # once the emergency vehicle is far ahead the record is dropped
    sm.active[0]["first_actor"]["position"] = [80.0, 0.0]
    sm.tick(8.0, 6.0, [10.0, 0.0])
    assert sm.active == []


def test_extend_shift_exact_algebra():
    """extend_shift must equal one longer shift on a straight route: the
    cosine ramp-up over the old ramp-down window sums to a flat hold
    (route_planner.extend_shift docstring)."""
    p1, p2 = _planner(), _planner()
    i0, i1, i2 = p1.index_of([40.0, 0.0]), p1.index_of([60.0, 0.0]), \
        p1.index_of([90.0, 0.0])
    p1.shift_route_between(i0, i1, 3.5, 8.0)
    p1.extend_shift(i1, i2, 3.5, 8.0)
    p2.shift_route_between(i0, i2, 3.5, 8.0)
    np.testing.assert_allclose(p1.route, p2.route, atol=1e-9)


def test_yield_extends_while_emv_still_behind():
    """The merge-back is deferred while the emergency vehicle has not
    passed yet (reference extend_lane_shift_transition_for_yield_to_
    emergency_vehicle)."""
    p = _planner()
    sm = ScenarioManager(p)
    sm.set_active([{
        "type": "YieldToEmergencyVehicle",
        "first_actor": {"position": [30.0, 0.0], "extent": [2.5, 1.0]},
        "direction": "right",
    }])
    p.run_step([10.0, 0.0])
    sm.tick(8.0, 6.0, [10.0, 0.0])
    to_idx0 = sm.active[0]["to_idx"]
    end_x0 = p.route_original[to_idx0, 0]
    # EMV still behind the ego when the planned span is almost over
    sm.active[0]["first_actor"]["position"] = [40.0, -3.5]
    for x in (30.0, 46.0):
        p.run_step([x, -3.5])
    sm.tick(8.0, 6.0, [46.0, -3.5])
    assert sm.active, "record must not be dropped while the EMV is behind"
    assert sm.active[0]["to_idx"] > to_idx0
    # the offset HOLDS past the original span end instead of merging back
    i_past = p.index_of([end_x0 + 5.0, -3.5])
    assert p.route[i_past, 1] < -3.0
    # and once the EMV is far ahead the record drops
    sm.active[0]["first_actor"]["position"] = [120.0, 0.0]
    sm.tick(8.0, 6.0, [46.0, -3.5])
    assert sm.active == []


def test_hazard_side_lane_extends_past_moving_bicycles():
    p = _planner()
    sm = ScenarioManager(p)
    sm.set_active([{
        "type": "HazardAtSideLane",
        "first_actor": {"position": [40.0, 0.0], "extent": [1.0, 0.5]},
        "last_actor": {"position": [48.0, 0.0], "extent": [1.0, 0.5]},
        "direction": "left",
    }])
    p.run_step([20.0, 0.0])
    sm.tick(8.0, 6.0, [20.0, 0.0])
    to_idx0 = sm.active[0]["to_idx"]
    # the bicycles rode forward past the planned span end; ego nears it
    sm.active[0]["last_actor"]["position"] = \
        [p.route_original[to_idx0, 0] + 10.0, 0.0]
    ego_x = p.route_original[to_idx0, 0] - 12.0
    for x in (35.0, min(ego_x, 60.0), ego_x):
        p.run_step([x, 3.5])
    sm.tick(8.0, 6.0, [ego_x, 3.5])
    assert sm.active[0]["to_idx"] > to_idx0


def test_set_active_preserves_state():
    p = _planner()
    sm = ScenarioManager(p)
    rec = {"type": "ParkedObstacle",
           "first_actor": {"position": [50.0, 0.0], "extent": [2.5, 1.0]},
           "direction": "left"}
    sm.set_active([dict(rec)])
    p.run_step([20.0, 0.0])
    sm.tick(8.0, 6.0, [20.0, 0.0])
    assert sm.active[0]["changed_route"]
    # simulator re-sends the same record: changed_route must survive
    sm.set_active([dict(rec)])
    assert sm.active[0]["changed_route"]


def test_compute_min_time_monotonic():
    t1 = compute_min_time_for_distance(20.0, 10.0, 5.0)
    t2 = compute_min_time_for_distance(40.0, 10.0, 5.0)
    t3 = compute_min_time_for_distance(40.0, 10.0, 9.0)
    assert t2 > t1 > 0
    assert t3 < t2                       # faster start -> less time
