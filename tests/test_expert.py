"""Expert (PDM-Lite core): IDM behavior, forecasting, measurement schema."""

import gzip
import json
import dataclasses
import os

import numpy as np
import pytest

from simlingo_tpu.expert.autopilot import AutoPilot, ExpertObservation
from simlingo_tpu.expert.idm import (IDMConfig, expert_target_speed,
                                     forecast_actor, idm_target_speed,
                                     leading_actor_constraint)


def test_idm_free_road_approaches_desired():
    ts = idm_target_speed(desired_speed=10.0, leading_actor_length=4.5,
                          ego_speed=9.8, leading_actor_speed=10.0,
                          distance_to_leading_actor=1000.0)
    assert 9.5 < ts <= 10.5


def test_idm_close_leader_brakes():
    ts = idm_target_speed(desired_speed=10.0, leading_actor_length=4.5,
                          ego_speed=8.0, leading_actor_speed=0.0,
                          distance_to_leading_actor=6.0)
    assert ts < 8.0


def test_leading_actor_selection():
    actors = [
        {"position": [15.0, 0.2], "speed": 1.0, "length": 4.5,
         "type_id": "vehicle.car"},
        {"position": [-5.0, 0.0], "speed": 0.0, "length": 4.5,
         "type_id": "vehicle.behind"},     # behind: ignored
        {"position": [10.0, 8.0], "speed": 0.0, "length": 4.5,
         "type_id": "vehicle.other_lane"},  # off-lane: ignored
    ]
    ts, limiting = leading_actor_constraint(8.0, 10.0, actors)
    assert limiting is not None and limiting["type_id"] == "vehicle.car"
    assert ts < 10.0


def test_red_light_constraint():
    # close to the stop line, IDM decelerates (one t_bound integration step)
    ts, lim = expert_target_speed(
        {"speed": 6.0, "speed_limit": 10.0, "light_hazard": True,
         "speed_reduced_by_obj_distance": 7.0}, [])
    assert ts < 6.0 and lim["type_id"] == "traffic_stop"
    # repeated application drives the speed to ~0 at the line
    v, d = 6.0, 12.0
    for _ in range(400):
        ts, _ = expert_target_speed(
            {"speed": v, "speed_limit": 10.0, "light_hazard": True,
             "speed_reduced_by_obj_distance": d}, [])
        v = ts
        d = max(d - v * 0.05, 0.5)
    assert v < 1.0


def test_forecast_actor_straight():
    traj = forecast_actor(np.array([5.0, 0.0]), 0.0, 4.0, 0.0, 0.0, False,
                          num_steps=20, dt=0.05)
    assert traj[-1, 0] > 5.0 + 3.5   # moved forward ~4 m in 1 s
    np.testing.assert_allclose(traj[:, 1], 0.0, atol=1e-6)


def test_autopilot_tick_and_schema(tmp_path):
    ap = AutoPilot(save_path=str(tmp_path), data_save_freq=1)
    route = np.stack([np.arange(0.1, 30, 0.1),
                      np.zeros(len(np.arange(0.1, 30, 0.1)))], 1)
    obs = ExpertObservation(
        pos_global=np.array([100.0, 50.0]), theta=0.3, speed=5.0,
        speed_limit=8.0, route=route, route_original=route,
        target_point=np.array([20.0, 0.0]),
        target_point_next=np.array([40.0, 0.0]),
        actors=[{"position": [12.0, 0.0], "speed": 2.0, "length": 4.5,
                 "type_id": "vehicle.car"}])
    out = ap.tick(obs)
    assert 0 <= out["throttle"] <= 1.0
    assert out["target_speed"] < 8.0        # constrained by the leader
    # measurement file in the reference schema -> consumable by our loaders
    path = os.path.join(str(tmp_path), "measurements", "0000.json.gz")
    with gzip.open(path, "rt") as f:
        rec = json.load(f)
    for key in ("pos_global", "theta", "speed", "target_speed", "speed_limit",
                "target_point", "target_point_next", "command", "route",
                "route_original", "changed_route", "ego_matrix", "steer",
                "throttle", "brake", "augmentation_rotation"):
        assert key in rec, key
    assert rec["speed_reduced_by_obj_type"] == "vehicle.car"
    # ego_matrix encodes the global pose
    m = np.asarray(rec["ego_matrix"])
    np.testing.assert_allclose(m[:2, 3], [100.0, 50.0])


def test_data_collector_produces_trainable_dataset(tmp_path):
    """Expert data collection -> our own index/dataset can consume it."""
    import cv2
    from simlingo_tpu.agent.data_agent import DataCollector

    root = tmp_path / "v1" / "b0" / "routes_training" / "Town12_dc"
    route_dir = str(tmp_path / "data" / "simlingo" / "v1" / "b0" /
                    "routes_training" / "Town12_dc")
    dc = DataCollector(route_dir, data_save_freq=1, seed=0)
    rng = np.random.RandomState(0)
    route = np.stack([np.arange(0.1, 40, 0.1),
                      np.zeros(len(np.arange(0.1, 40, 0.1)))], 1)
    for t in range(30):
        x = 1.25 * t
        obs = ExpertObservation(
            pos_global=np.array([x, 0.0]), theta=0.0, speed=5.0,
            speed_limit=8.0, route=route, route_original=route,
            target_point=np.array([20.0, 0.0]),
            target_point_next=np.array([40.0, 0.0]))
        rgb = rng.randint(0, 255, (512, 1024, 3), np.uint8)
        dc.tick(obs, rgb=rgb, boxes=[{"class": "vehicle",
                                      "position": [15.0, 0.0, 0.0]}])
    dc.destroy(route_completion=100.0)

    from simlingo_tpu.data.index import build_index
    idx = build_index(str(tmp_path), split="train", use_town13=False,
                      pred_len=11)
    assert len(idx) > 0

    from simlingo_tpu.data.driving_dataset import (DrivingDataset,
                                                   DrivingDatasetConfig)
    ds = DrivingDataset(DrivingDatasetConfig(
        data_root=str(tmp_path), split="train", use_town13=False,
        use_commentary=False, use_qa=False, img_shift_augmentation=False,
        route_as="target_point", image_size=56, max_num_grid=2))
    s = ds.get(0, np.random.RandomState(0))
    assert s.waypoints.shape == (10, 2)
    assert np.isfinite(s.waypoints).all()


def test_densify_route_spacing():
    from simlingo_tpu.expert.route_planner import densify_route
    sparse = np.array([[0, 0], [10, 0], [10, 0], [20, 5], [40, 5]], float)
    dense = densify_route(sparse, spacing=0.1)
    d = np.linalg.norm(np.diff(dense, axis=0), axis=1)
    # never sparser than requested; exactly 0.1 except at polyline corners
    # (chord < arc there)
    assert d.max() <= 0.1 + 1e-9
    assert np.median(d) == pytest.approx(0.1, abs=1e-6)
    # endpoints preserved
    np.testing.assert_allclose(dense[0], [0, 0])
    assert np.linalg.norm(dense[-1] - [40, 5]) < 0.15


def test_lane_change_geometry():
    from simlingo_tpu.expert.route_planner import (densify_route,
                                                   plan_lane_change)
    route = densify_route(np.array([[0, 0], [100, 0]], float))
    new = plan_lane_change(route, start_idx=100, lateral_shift=3.5,
                           transition_length=25.0, hold_length=None)
    # before the change: untouched; after: exactly one lane left (+y)
    np.testing.assert_allclose(new[:100], route[:100], atol=1e-9)
    np.testing.assert_allclose(new[-1], [route[-1, 0], 3.5], atol=1e-6)
    # smooth: per-step lateral jump bounded (no kinks)
    dy = np.abs(np.diff(new[:, 1]))
    assert dy.max() < 3.5 * np.pi / 2 / 250 * 1.05


def test_obstacle_bypass_merges_back():
    from simlingo_tpu.expert.route_planner import (densify_route,
                                                   plan_obstacle_bypass)
    route = densify_route(np.array([[0, 0], [120, 0]], float))
    # obstacle slightly left of the route at x=60 -> bypass to the right
    new, changed = plan_obstacle_bypass(route, [60.0, 0.5], clearance=2.5)
    assert changed
    i = np.argmin(np.abs(new[:, 0] - 60.0))
    assert new[i, 1] < -1.5            # shifted away (right)
    np.testing.assert_allclose(new[-1], route[-1], atol=1e-6)  # merged back
    np.testing.assert_allclose(new[:100], route[:100], atol=1e-9)
    # far obstacle -> no change
    same, changed2 = plan_obstacle_bypass(route, [60.0, 8.0], clearance=2.5)
    assert not changed2 and np.allclose(same, route)


def test_planner_progress_and_expert_tick(tmp_path):
    from simlingo_tpu.expert.route_planner import PrivilegedRoutePlanner
    planner = PrivilegedRoutePlanner()
    planner.set_route(np.array([[0, 0], [200, 0]], float), command=4)
    planner.add_obstacle([50.0, -0.3])

    pilot = AutoPilot(save_path=str(tmp_path), data_save_freq=1)
    idx_prev = -1
    for step, x in enumerate(np.arange(0.0, 30.0, 2.0)):
        inp = planner.ego_inputs([x, 0.0], 0.0)
        assert planner.idx >= idx_prev          # forward-only progress
        idx_prev = planner.idx
        obs = ExpertObservation(
            pos_global=np.array([x, 0.0]), theta=0.0, speed=5.0,
            speed_limit=8.0, route=inp["route"],
            route_original=inp["route_original"],
            target_point=inp["target_point"],
            target_point_next=inp["target_point_next"],
            command=inp["command"], changed_route=inp["changed_route"])
        out = pilot.tick(obs)
        assert -1 <= out["steer"] <= 1
    # measurement schema carries the modified-route flag
    rec = json.load(gzip.open(os.path.join(tmp_path, "measurements",
                                           "0000.json.gz"), "rt"))
    assert rec["changed_route"] is True
    # target point ~30 m ahead in ego frame
    assert abs(inp["target_point"][0] - 30.0) < 1.0


# ---------------------------------------------------------------------------
# Round 2: forecasting + OBB constraints (reference autopilot.py:1176-2000)
# ---------------------------------------------------------------------------

def _straight_route(length_m=60.0):
    xs = np.arange(0.1, length_m, 0.1)
    return np.stack([xs, np.zeros_like(xs)], 1)


def test_obb_intersection_basic():
    from simlingo_tpu.expert.forecast import obb_intersect
    # overlapping axis-aligned boxes
    assert obb_intersect([0, 0], 0.0, [2, 1], [3, 0], 0.0, [2, 1])
    # separated
    assert not obb_intersect([0, 0], 0.0, [2, 1], [10, 0], 0.0, [2, 1])
    # rotated box slips between: vertical gap 2.2, rotated thin box
    assert not obb_intersect([0, 0], 0.0, [5, 1], [0, 2.2], np.pi / 2,
                             [1, 0.5])
    # same box rotated to overlap
    assert obb_intersect([0, 0], 0.0, [5, 1], [0, 1.2], np.pi / 2, [1, 0.5])


def test_expert_stops_for_crossing_walker():
    """A pedestrian crossing the road ahead must produce a hard speed
    reduction + walker hazard flags (reference
    compute_target_speeds_wrt_all_actors :1437-1469)."""
    ap = AutoPilot()
    obs = ExpertObservation(
        pos_global=np.zeros(2), theta=0.0, speed=6.0, speed_limit=8.0,
        route=_straight_route(), route_original=_straight_route(),
        target_point=np.array([20.0, 0.0]),
        target_point_next=np.array([40.0, 0.0]),
        actors=[{"position": [9.0, -4.0], "speed": 1.8, "yaw": np.pi / 2,
                 "type_id": "walker.pedestrian.0001", "id": 77,
                 "extent": [0.4, 0.4],
                 "direction": [0.0, 1.0]}])
    brake, target, reduced = ap.get_brake_and_target_speed(obs)
    assert target < 6.0
    assert ap.walker_hazard and ap.walker_close
    assert reduced is not None and reduced[2] == 77
    out = ap.tick(obs)
    assert out["record"]["walker_hazard"] is True
    assert out["record"]["walker_close_id"] == 77


def test_expert_ignores_walker_walking_away():
    ap = AutoPilot()
    obs = ExpertObservation(
        pos_global=np.zeros(2), theta=0.0, speed=6.0, speed_limit=8.0,
        route=_straight_route(), route_original=_straight_route(),
        target_point=np.array([20.0, 0.0]),
        target_point_next=np.array([40.0, 0.0]),
        actors=[{"position": [10.0, -6.0], "speed": 1.8, "yaw": -np.pi / 2,
                 "type_id": "walker.pedestrian.0002",
                 "extent": [0.4, 0.4],
                 "direction": [0.0, -1.0]}])   # walking away from the road
    _, target, _ = ap.get_brake_and_target_speed(obs)
    assert target == 8.0


def test_expert_stops_for_crossing_vehicle():
    """A vehicle crossing the ego path (junction traffic) triggers the
    forecast-OBB path: target speed 0 + vehicle hazard (reference
    :1352-1436). It is off the ego corridor NOW, so the old static
    forward-cone test could not see it."""
    ap = AutoPilot()
    obs = ExpertObservation(
        pos_global=np.zeros(2), theta=0.0, speed=7.0, speed_limit=8.0,
        route=_straight_route(), route_original=_straight_route(),
        target_point=np.array([20.0, 0.0]),
        target_point_next=np.array([40.0, 0.0]),
        actors=[{"position": [15.0, -7.0], "speed": 5.0, "yaw": np.pi / 2,
                 "type_id": "vehicle.audi.tt", "id": 5,
                 "extent": [2.2, 0.95], "steer": 0.0, "throttle": 0.2}])
    brake, target, reduced = ap.get_brake_and_target_speed(obs)
    assert target == 0.0 and brake
    assert ap.vehicle_hazard and ap.vehicle_affecting_id == 5
    # a vehicle that has already passed the conflict point is ignored
    ap2 = AutoPilot()
    obs2 = dataclasses.replace(
        obs, actors=[{"position": [15.0, 7.0], "speed": 5.0,
                      "yaw": np.pi / 2, "type_id": "vehicle.audi.tt",
                      "id": 6, "extent": [2.2, 0.95]}])
    _, target2, _ = ap2.get_brake_and_target_speed(obs2)
    assert target2 == 8.0 and not ap2.vehicle_hazard


def test_stop_sign_real_distance_and_clearing():
    """Stop-sign braking uses the real trigger distance; after waiting
    stopped >25 ticks within 3 m the sign is cleared
    (reference :1856-1894)."""
    ap = AutoPilot()

    def obs_at(dist, speed):
        return ExpertObservation(
            pos_global=np.zeros(2), theta=0.0, speed=speed, speed_limit=8.0,
            route=_straight_route(), route_original=_straight_route(),
            target_point=np.array([20.0, 0.0]),
            target_point_next=np.array([40.0, 0.0]),
            stop_sign_distance=dist, stop_sign_id=9)

    # far away: barely constrained; near: hard braking (distance-dependent)
    _, t_far, _ = ap.get_brake_and_target_speed(obs_at(35.0, 7.0))
    ap2 = AutoPilot()
    _, t_near, _ = ap2.get_brake_and_target_speed(obs_at(5.0, 7.0))
    assert t_near < t_far

    # stopped at the sign: cleared after 25 waiting ticks
    ap3 = AutoPilot()
    targets = []
    for _ in range(30):
        _, t, _ = ap3.get_brake_and_target_speed(obs_at(2.0, 0.05))
        targets.append(t)
    assert ap3.cleared_stop_sign
    # while waiting the sign pinned the target near zero; once cleared the
    # IDM runs free-road (distance = inf) and the target rises
    assert targets[0] < 0.1
    assert targets[-1] > targets[0] + 0.5


def test_red_light_real_distance():
    ap = AutoPilot()
    obs = ExpertObservation(
        pos_global=np.zeros(2), theta=0.0, speed=7.0, speed_limit=8.0,
        route=_straight_route(), route_original=_straight_route(),
        target_point=np.array([20.0, 0.0]),
        target_point_next=np.array([40.0, 0.0]),
        light_state="red", light_distance=12.0)
    _, target, reduced = ap.get_brake_and_target_speed(obs)
    assert target < 7.0
    assert ap.traffic_light_hazard
    assert reduced[1] == "traffic.traffic_light" and reduced[3] == 12.0


def test_fitted_longitudinal_regression_controller():
    from simlingo_tpu.expert.autopilot import (
        LongitudinalLinearRegressionController as C)
    c = C()
    # large positive speed error => full throttle
    assert c.step(2.0, 8.0) == (1.0, False)
    # overspeed beyond the fitted braking ratio => brake
    th, br = c.step(8.0, 6.0)
    assert th == 0.0 and br
    # zero target => hazard stop
    assert c.step(5.0, 0.0) == (0.0, True)
    # small positive error => partial throttle in (0, 1)
    th, br = c.step(7.9, 8.0)
    assert not br and 0.0 <= th < 1.0
    # extrapolation is throttle-only and hazard-free
    assert c.throttle_extrapolation(8.0, 2.0) == 1.0
    assert c.throttle_extrapolation(0.0, 8.0) == 0.0


def test_planner_commands_during_lane_change_and_near_flag():
    """Shift operations must write CHANGELANE commands into the command
    array (reference shift_route_smoothly :256-270) and near_lane_change
    must detect them in the ego window (compute_trailing_vehicles
    :854-859)."""
    from simlingo_tpu.expert.route_planner import PrivilegedRoutePlanner

    p = PrivilegedRoutePlanner()
    p.set_route(np.stack([np.arange(0.0, 200.0, 5.0),
                          np.zeros(40)], 1))
    assert not p.near_lane_change()
    p.request_lane_change("left", at_distance=30.0)
    cmds = np.asarray(p.commands)
    assert (cmds == p.CHANGELANELEFT).any()
    # transition zone sits ~30 m ahead: command window flags it
    assert p.near_lane_change(ahead_m=60.0)
    p.run_step([100.0, 3.5])
    assert p.commands[p.idx] == p.LANEFOLLOW  # past the transition


def test_planner_bypass_writes_both_ramps():
    from simlingo_tpu.expert.route_planner import PrivilegedRoutePlanner

    p = PrivilegedRoutePlanner()
    p.set_route(np.stack([np.arange(0.0, 200.0, 5.0), np.zeros(40)], 1))
    assert p.add_obstacle([100.0, 0.0])
    cmds = np.asarray(p.commands)
    i_left = np.nonzero(cmds == p.CHANGELANELEFT)[0]
    i_right = np.nonzero(cmds == p.CHANGELANERIGHT)[0]
    assert len(i_left) and len(i_right)
    # out-ramp and back-ramp are opposite commands, in disjoint spans
    first, second = ((i_left, i_right) if i_left.max() < i_right.min()
                     else (i_right, i_left))
    assert first.max() < second.min()
    # the shift direction matches the out-ramp command
    dev = p.route[:, 1] - p.route_original[:, 1]
    out_left = cmds[first[0]] == p.CHANGELANELEFT
    assert (dev[first[-1]] > 0) == out_left


def test_planner_defers_lane_change_while_lane_narrow():
    """reference prevent_too_early_lane_changes (:558-589): with a target
    lane still forming (< 2.5 m wide), the transition start moves to the
    first index where the lane is wide enough."""
    from simlingo_tpu.expert.route_planner import PrivilegedRoutePlanner

    p = PrivilegedRoutePlanner()
    p.set_route(np.stack([np.arange(0.0, 200.0, 5.0), np.zeros(40)], 1))
    n = len(p.route)
    widths = np.full(n, 3.5)
    narrow_until = int(60.0 / p.spacing)
    widths[:narrow_until] = 1.0
    p.request_lane_change("left", at_distance=10.0, lane_widths=widths,
                          transition_length=20.0)
    dev = np.abs(p.route[:, 1])
    first_moved = int(np.argmax(dev > 0.05))
    assert first_moved >= narrow_until


def test_planner_parking_exit_start():
    """reference setup_route starts_with_parking_exit (:428-433): the
    vehicle position (in the parking lane) is prepended and the merge is
    commanded as a lane change."""
    from simlingo_tpu.expert.route_planner import PrivilegedRoutePlanner

    p = PrivilegedRoutePlanner()
    sparse = np.stack([np.arange(0.0, 100.0, 5.0), np.zeros(20)], 1)
    p.set_route(sparse, start_xy=[0.0, -3.5], parking_exit=True)
    assert p.commands[0] == p.CHANGELANELEFT
    # route begins at the vehicle, not the plan's first waypoint
    assert abs(p.route[0, 1] + 3.5) < 0.2
    inp = p.ego_inputs([0.0, -3.5], 0.0)
    assert inp["command"] == p.CHANGELANELEFT


def test_planner_route_extension_past_goal():
    from simlingo_tpu.expert.route_planner import PrivilegedRoutePlanner

    p = PrivilegedRoutePlanner()
    sparse = np.stack([np.arange(0.0, 100.0, 5.0), np.zeros(20)], 1)
    p.set_route(sparse, extend_m=30.0)
    assert p.route[-1, 0] > 120.0


def test_leading_classification_rejects_crossing_vehicle():
    """reference compute_leading_vehicles yaw gate (35 deg, :822-831): a
    vehicle ON the future path but crossing it must not be a leader."""
    from simlingo_tpu.expert import forecast as F

    route = np.stack([np.arange(0.1, 60.0, 0.1),
                      np.zeros(599)], 1)
    on_path = np.array([20.0, 0.0])
    assert F.classify_route_position(route, on_path,
                                     actor_yaw=0.1) == "leading"
    assert F.classify_route_position(route, on_path,
                                     actor_yaw=np.pi / 2) is None
    # rear alignment gate (30 deg)
    assert F.classify_route_position(route, [-8.0, 0.3],
                                     actor_yaw=0.0) == "rear"
    assert F.classify_route_position(route, [-8.0, 0.3],
                                     actor_yaw=2.5) is None
