"""Expert (PDM-Lite core): IDM behavior, forecasting, measurement schema."""

import gzip
import json
import os

import numpy as np

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
    assert 0 <= out["throttle"] <= 0.75
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
