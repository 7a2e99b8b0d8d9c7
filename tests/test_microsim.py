"""Microsim: closed-loop world, scenarios, criteria, camera, collection.

Covers the in-repo replacement for the CARLA/leaderboard evaluation loop
(reference SURVEY.md L0): the privileged expert must drive every
Bench2Drive scenario type clean, the criteria must detect infractions the
way the leaderboard's atomic criteria do, and the result records must
flow through eval/driving_score.py unchanged.
"""

import gzip
import json
import math
import os

import numpy as np
import pytest

from simlingo_tpu.sim import map as simmap
from simlingo_tpu.sim.actors import Vehicle, Walker
from simlingo_tpu.sim.camera import Camera
from simlingo_tpu.sim.criteria import RouteCriteria
from simlingo_tpu.sim.runner import (build_world, expert_factory,
                                     model_factory, run_route, run_routes)
from simlingo_tpu.sim.world import SimWorld


# ---------------------------------------------------------------------------
# map
# ---------------------------------------------------------------------------

def test_map_projection_and_neighbors():
    town = simmap.straight_town(length=100.0, lanes_per_dir=2,
                                parking_lane=True)
    lane0 = town.lanes[0]
    s, lat = lane0.project([10.0, -1.0])
    assert abs(s - 10.0) < 0.6
    assert abs(lat - 0.75) < 0.1          # lane 0 centre at y=-1.75
    right = town.neighbor(lane0, "right")
    assert right is not None and abs(right.center[0, 1] + 5.25) < 1e-6
    # parking lane links to the outermost forward lane
    parking = [l for l in town.lanes.values()
               if l.lane_type == "parking"][0]
    assert town.lanes[parking.left].lane_id == right.lane_id


def test_crossing_town_junction_flag():
    town = simmap.crossing_town()
    assert town.in_junction([0.0, 0.0])
    assert not town.in_junction([50.0, -1.75])
    wp = town.waypoint([0.5, -1.75])
    assert wp["is_junction"]


# ---------------------------------------------------------------------------
# world dynamics
# ---------------------------------------------------------------------------

def test_npc_follows_lane_and_idm_gaps():
    town = simmap.straight_town(length=300.0, lanes_per_dir=1)
    world = SimWorld(town)
    lane = town.lanes[0]
    world.spawn_ego([250.0, -1.75], yaw=0.0)   # far away, irrelevant
    slow = world.spawn(Vehicle(lane.point_at_s(60.0), lane=lane,
                               speed=2.0, target_speed=2.0))
    fast = world.spawn(Vehicle(lane.point_at_s(20.0), lane=lane,
                               speed=9.0, target_speed=9.0))
    for _ in range(400):
        world.tick()
    # fast NPC must NOT rear-end the slow one: IDM holds a positive gap
    gap = slow.position[0] - fast.position[0] \
        - slow.extent[0] - fast.extent[0]
    assert gap > 0.5, gap
    # and it must stay on the lane
    _, lat = lane.project(fast.position)
    assert abs(lat) < 0.5


def test_npc_stops_at_red_light():
    town = simmap.crossing_town()
    world = SimWorld(town)
    world.spawn_ego([100.0, -1.75])
    lane = town.lanes[2]                      # north-south approach
    light = world.light_for_lane(2)
    light.frozen = "red"
    npc = world.spawn(Vehicle(lane.point_at_s(100.0), lane=lane,
                              yaw=lane.yaw_at_s(100.0),
                              speed=8.0, target_speed=8.0))
    for _ in range(600):
        world.tick()
    s_npc, _ = lane.project(npc.position)
    s_line, _ = lane.project(light.spot.position)
    assert s_npc < s_line, "NPC must hold at the red stop line"
    assert npc.speed < 0.5


def test_walker_triggers_on_ego_approach():
    town = simmap.straight_town(length=100.0)
    world = SimWorld(town)
    world.spawn_ego([0.0, -1.75], speed=5.0)
    w = world.spawn(Walker([50.0, -8.0],
                           path=np.array([[50.0, 2.0]]),
                           trigger_distance=20.0))
    world.tick()
    assert not w.triggered
    world.ego.position = np.array([35.0, -1.75])
    for _ in range(40):
        world.tick()
    assert w.triggered and w.position[1] > -8.0


# ---------------------------------------------------------------------------
# expert closed loop over the scenario inventory
# ---------------------------------------------------------------------------

def _expert_spec(name, at_s, town="straight", end_s=220.0):
    return {"town": town, "start_s": 5.0, "end_s": end_s,
            "route_id": name,
            "scenarios": [{"type": name, "at_s": at_s}] if name else []}


def test_expert_completes_empty_route():
    rec = run_route(_expert_spec(None, 0.0), expert_factory())
    assert rec["status"] in ("Completed", "Perfect")
    assert rec["scores"]["score_composed"] == 100.0


@pytest.mark.parametrize("name,at_s", [
    ("Accident", 110.0),
    ("AccidentTwoWays", 110.0),
    ("ConstructionObstacle", 110.0),
    ("ConstructionObstacleTwoWays", 110.0),
    ("ParkedObstacle", 100.0),
    ("ParkedObstacleTwoWays", 100.0),
    ("VehicleOpensDoorTwoWays", 100.0),
    ("HazardAtSideLane", 90.0),
    ("HazardAtSideLaneTwoWays", 90.0),
    ("YieldToEmergencyVehicle", 60.0),
    ("CrossingBicycleFlow", 130.0),
    ("BlockedIntersection", 120.0),
    ("DynamicObjectCrossing", 120.0),
    ("ParkingCrossingPedestrian", 110.0),
])
def test_expert_drives_scenario_clean(name, at_s):
    rec = run_route(_expert_spec(name, at_s), expert_factory())
    assert rec["status"] in ("Completed", "Perfect"), (name, rec["infractions"])
    assert rec["scores"]["score_composed"] == 100.0, (
        name, rec["infractions"])


def test_expert_invading_turn_on_curve():
    spec = {"town": "curved", "start_s": 5.0, "end_s": 240.0,
            "route_id": "invading",
            "scenarios": [{"type": "InvadingTurn", "at_s": 100.0}]}
    rec = run_route(spec, expert_factory())
    assert rec["status"] in ("Completed", "Perfect"), rec["infractions"]


def test_expert_stops_at_red_light_crossing():
    spec = {"town": "crossing", "start_s": 5.0, "end_s": 290.0,
            "route_id": "lights"}
    rec = run_route(spec, expert_factory())
    assert rec["status"] in ("Completed", "Perfect")
    assert not rec["infractions"]["red_light"]


# ---------------------------------------------------------------------------
# criteria: infractions must fire for a bad agent
# ---------------------------------------------------------------------------

class _Scripted:
    """Full throttle, straight ahead, never brakes."""

    def __init__(self, throttle=0.75):
        self.throttle = throttle

    def step(self):
        return 0.0, self.throttle, 0.0

    def destroy(self, record=None):
        pass


def test_criteria_red_light_infraction():
    spec = {"town": "crossing", "start_s": 100.0, "end_s": 290.0,
            "route_id": "redrun"}
    world, route, _ = build_world(spec)
    for light in world.lights:
        light.frozen = "red" if light.spot.lane_id == 0 else "green"
    crit = RouteCriteria(world, route)
    agent = _Scripted()
    for _ in range(2000):
        world.apply_ego_control(*agent.step())
        world.tick()
        crit.update()
        if crit.finished:
            break
    rec = crit.record()
    assert len(rec["infractions"]["red_light"]) == 1
    assert rec["scores"]["score_penalty"] == pytest.approx(0.7)


def test_criteria_collision_and_penalty():
    spec = {"town": "straight", "start_s": 5.0, "end_s": 220.0,
            "route_id": "crash",
            "scenarios": [{"type": "ParkedObstacle", "at_s": 60.0}]}
    world, route, _ = build_world(spec)
    crit = RouteCriteria(world, route)
    agent = _Scripted()
    for _ in range(1000):
        world.apply_ego_control(*agent.step())
        world.tick()
        crit.update()
        if crit.finished or crit.infractions["collisions_vehicle"]:
            break
    assert crit.infractions["collisions_vehicle"]
    rec = crit.record()
    assert rec["scores"]["score_penalty"] <= 0.6


def test_criteria_blocked_and_timeout():
    spec = {"town": "straight", "start_s": 5.0, "end_s": 100.0,
            "route_id": "stuck"}
    world, route, _ = build_world(spec)
    crit = RouteCriteria(world, route)
    for _ in range(int(95.0 / world.dt)):
        world.apply_ego_control(0.0, 0.0, 1.0)
        world.tick()
        crit.update()
        if crit.finished:
            break
    assert crit.finished == "Failed - Agent got blocked"


def test_criteria_route_deviation():
    spec = {"town": "straight", "start_s": 5.0, "end_s": 200.0,
            "route_id": "dev"}
    world, route, _ = build_world(spec)
    crit = RouteCriteria(world, route)
    world.ego.yaw = math.pi / 2            # drive straight off the road
    for _ in range(1500):
        world.apply_ego_control(0.0, 0.6, 0.0)
        world.tick()
        crit.update()
        if crit.finished:
            break
    assert crit.finished == "Failed - Agent deviated from the route"
    assert crit.record()["infractions"]["route_dev"]


def test_records_flow_through_driving_score(tmp_path):
    from simlingo_tpu.eval.driving_score import (merge_route_results,
                                                 parse_results)
    specs = [_expert_spec(None, 0.0, end_s=80.0)]
    out = str(tmp_path / "microsim.json")
    run_routes(specs, expert_factory(), out_path=out)
    merged = merge_route_results([out])
    assert merged["driving_score"] == 100.0
    assert merged["success_rate"] == 100.0
    parsed = parse_results([out])
    assert parsed["totals"]["avg_route_completion"] == 100.0
    assert parsed["totals"]["total_km"] > 0.05


# ---------------------------------------------------------------------------
# camera
# ---------------------------------------------------------------------------

def test_camera_semantics_match_geometry():
    """The projected center of a known vehicle must land on VEHICLE-tagged
    pixels, and the depth there must match its distance."""
    from simlingo_tpu.sim.camera import SEM_ROAD, SEM_VEHICLE
    town = simmap.straight_town(length=100.0)
    world = SimWorld(town)
    world.spawn_ego([10.0, -1.75], yaw=0.0)
    world.spawn(Vehicle([25.0, -1.75], yaw=0.0))
    cam = Camera()
    out = cam.render(world, with_labels=True)
    sem, depth = out["semantics"], out["depth"]
    assert (sem == SEM_ROAD).sum() > 5000
    ys, xs = np.nonzero(sem == SEM_VEHICLE)
    assert len(ys) > 100
    # the vehicle is straight ahead: its pixels straddle the image centre
    assert xs.min() < 512 < xs.max()
    d = depth[ys, xs]
    assert abs(np.median(d) - 15.0) < 1.5


def test_camera_light_color_tracks_state():
    town = simmap.crossing_town()
    world = SimWorld(town)
    world.spawn_ego([-40.0, -1.75], yaw=0.0)
    cam = Camera()
    world.lights[0].frozen = "red"
    red = cam.render(world)["rgb"].astype(int)
    world.lights[0].frozen = "green"
    green = cam.render(world)["rgb"].astype(int)
    diff = np.abs(red - green).sum(-1)
    assert (diff > 100).any(), "light head must change colour"


# ---------------------------------------------------------------------------
# data collection through the microsim
# ---------------------------------------------------------------------------

def test_expert_collection_writes_dataset_layout(tmp_path):
    spec = {"town": "straight", "start_s": 5.0, "end_s": 60.0,
            "route_id": "collect",
            "scenarios": [{"type": "ParkedObstacle", "at_s": 40.0}]}
    root = str(tmp_path / "micro_data")
    rec = run_route(spec, expert_factory(save_root=root))
    assert rec["status"] in ("Completed", "Perfect")
    route_dir = os.path.join(root, "route_000")
    rgbs = sorted(os.listdir(os.path.join(route_dir, "rgb")))
    assert len(rgbs) >= 5 and rgbs[0] == "0000.jpg"
    with gzip.open(os.path.join(route_dir, "measurements",
                                "0003.json.gz"), "rt") as f:
        m = json.load(f)
    for key in ("pos_global", "speed", "target_speed", "steer", "brake",
                "route"):
        assert key in m, key
    assert os.path.exists(os.path.join(route_dir, "results.json.gz"))


# ---------------------------------------------------------------------------
# model-in-the-loop (tiny model)
# ---------------------------------------------------------------------------

def test_model_driver_closed_loop():
    import jax
    import jax.numpy as jnp
    from simlingo_tpu.agent.agent import LingoAgent
    from simlingo_tpu.agent.config import AgentConfig
    from simlingo_tpu.data.tokenizer import SimLingoTokenizer
    from simlingo_tpu.models import simlingo
    from simlingo_tpu.models.qwen2 import Qwen2Config
    from simlingo_tpu.models.simlingo import SimLingoConfig
    from simlingo_tpu.models.vit import ViTConfig

    tok = SimLingoTokenizer()
    cfg = SimLingoConfig(
        vit=ViTConfig(hidden_size=64, num_layers=2, num_heads=4,
                      intermediate_size=128, image_size=448, patch_size=56,
                      projector_out=64),
        llm=Qwen2Config.tiny(vocab_size=tok.tk.vocab_size + 8),
        img_context_token_id=tok.img_context_id,
        remat_vision=False, remat_llm=False)
    params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
    acfg = AgentConfig(use_cot=False, initial_frames_delay=0)
    agent = LingoAgent(params, cfg, acfg, tokenizer=tok,
                       max_prompt_len=128, compute_dtype=jnp.float32)
    spec = {"town": "straight", "start_s": 5.0, "end_s": 120.0,
            "route_id": "model_loop"}
    rec = run_route(spec, model_factory(agent), max_steps=8)
    # an untrained model won't finish; the loop itself must run and score
    assert rec["scores"]["score_route"] >= 0.0
    assert rec["meta"]["duration_game"] == pytest.approx(8 * 0.05)

    # noisy-sensor variant: GNSS/compass noise routed through the agent's
    # UKF (reference agent_simlingo.py:507-529 filtering path)
    rec2 = run_route(spec, model_factory(agent, gps_noise_std=0.5,
                                         compass_noise_std=0.02),
                     max_steps=8)
    assert np.isfinite(rec2["scores"]["score_composed"])


def test_replay_recording_and_gif_from_microsim_run(tmp_path):
    """A recorded microsim run (bad agent -> collision) must replay to
    BEV frames and produce an infraction GIF (the round-2 replay tooling
    driven end-to-end by the in-repo simulator)."""
    import json as _json

    from simlingo_tpu.agent.scenario_logger import (make_infraction_gifs,
                                                    render_replay_frames)
    from simlingo_tpu.sim.runner import run_route

    spec = {"town": "straight", "start_s": 5.0, "end_s": 150.0,
            "route_id": "crash_rec",
            "scenarios": [{"type": "ParkedObstacle", "at_s": 60.0}]}
    rec_dir = str(tmp_path / "records")
    rec = run_route(spec, lambda w, r, s: _Scripted(), max_steps=700,
                    record_dir=rec_dir)
    assert rec["infractions"]["collisions_vehicle"]
    rec_path = os.path.join(rec_dir, "crash_rec", "records.json.gz")
    assert os.path.exists(rec_path)
    frames_dir = str(tmp_path / "frames")
    frames = render_replay_frames(rec_path, frames_dir, every_n=8)
    assert len(frames) >= 5
    res_path = str(tmp_path / "result.json")
    with open(res_path, "w") as f:
        _json.dump({"_checkpoint": {"records": [rec]}}, f)
    gifs = make_infraction_gifs(res_path, frames_dir,
                                str(tmp_path / "gifs"))
    assert gifs


@pytest.mark.parametrize("turn,cmd", [("left", 1), ("right", 2)])
def test_expert_turns_at_junction(tmp_path, turn, cmd):
    """Turn routes through the signalized crossing: arc-connector route,
    clean expert drive, and the derived navigation command (go left=1 /
    right=2) recorded in the collected measurements."""
    root = str(tmp_path / "turns")
    spec = {"town": "crossing", "start_s": 5.0, "end_s": 260.0,
            "route_id": f"Town12_turn_{turn}", "turn": turn}
    rec = run_route(spec, expert_factory(
        save_root=root, dir_name_fmt=f"Town12_turn_{turn}"))
    assert rec["status"] in ("Completed", "Perfect"), rec["infractions"]
    assert rec["scores"]["score_composed"] == 100.0, rec["infractions"]
    import glob as _glob
    cmds = []
    for fp in sorted(_glob.glob(os.path.join(
            root, f"Town12_turn_{turn}", "measurements", "*.json.gz"))):
        with gzip.open(fp, "rt") as f:
            cmds.append(json.load(f)["command"])
    assert cmd in cmds, cmds


def test_visualize_dataset_montage(tmp_path):
    """scripts/visualize_dataset.py (reference team_code/visualize_dataset
    counterpart) must render a camera+BEV montage from a collected route."""
    import importlib.util

    spec = {"town": "straight", "start_s": 5.0, "end_s": 50.0,
            "route_id": "viz"}
    root = str(tmp_path / "d")
    run_route(spec, expert_factory(save_root=root, dir_name_fmt="Town12_v"))
    mod_spec = importlib.util.spec_from_file_location(
        "visualize_dataset", os.path.join(
            os.path.dirname(__file__), "..", "scripts",
            "visualize_dataset.py"))
    viz = importlib.util.module_from_spec(mod_spec)
    mod_spec.loader.exec_module(viz)
    montage = viz.frame_montage(os.path.join(root, "Town12_v"), 2)
    assert montage.ndim == 3 and montage.shape[1] > 1500
    assert montage.std() > 10  # actually drew something


def test_microsim_route_map_backs_route_tools():
    """MicrosimRouteMap must satisfy the route_tools RouteMap protocol:
    3D trace points that build_trace can mix with route-file waypoints,
    junction/lane queries from the SimMap."""
    import xml.etree.ElementTree as ET

    from simlingo_tpu.labels.route_tools import ParsedRoute
    from simlingo_tpu.sim.route_map import MicrosimRouteMap

    town = simmap.crossing_town()
    rmap = MicrosimRouteMap(town)
    waypoints = np.array([[-100.0, -1.75, 0.0], [-50.0, -1.75, 0.0],
                          [100.0, -1.75, 0.0]])
    route = ParsedRoute(town="Micro", waypoints=waypoints, scenarios=[],
                        trigger_points=np.zeros((0, 3)),
                        weather_begin=[0.0] * 9, weather_end=[0.0] * 9)
    route.build_trace(rmap)
    assert route.trace.ndim == 2 and route.trace.shape[1] == 3
    assert len(route.trace) > 150
    assert rmap.is_junction([0.0, 0.0])
    assert rmap.junction_has_traffic_lights([0.0, 0.0])
    assert rmap.lane_change([50.0, -1.75]) in ("NONE", "Left", "Right",
                                               "Both")
    pts = rmap.same_dir_lane_points([50.0, -1.75])
    assert all(len(p) == 3 for p in pts)


def test_route_between_joins_lanes_through_junction():
    """Cross-lane route_between must produce a tangent-matched connector,
    not a silent single-lane stub (left-turn endpoints)."""
    town = simmap.crossing_town()
    route = town.route_between([-50.0, -1.75], [1.75, 50.0])
    assert len(route) > 80
    # endpoints on the right lanes
    assert np.linalg.norm(route[0] - [-50.0, -1.75]) < 2.0
    assert np.linalg.norm(route[-1] - [1.75, 50.0]) < 3.0
    # continuous: no jump larger than ~2x spacing
    steps = np.linalg.norm(np.diff(route, axis=0), axis=1)
    assert steps.max() < 2.5, steps.max()


def test_turn_command_sequence_is_clean(tmp_path):
    """Command labels around the junction must be monotone phases --
    approach (3 or 4->3), the sticky turn command through the WHOLE arc,
    then back to follow -- with no 3->4->3 or 1->3 flap (code-review r3
    findings: single-point junction probe; mid-arc residual turn)."""
    import glob as _glob

    root = str(tmp_path / "d")
    spec = {"town": "crossing", "start_s": 5.0, "end_s": 260.0,
            "route_id": "seq", "turn": "left"}
    rec = run_route(spec, expert_factory(save_root=root,
                                         dir_name_fmt="Town12_seq"))
    assert rec["status"] in ("Completed", "Perfect")
    cmds = []
    for fp in sorted(_glob.glob(os.path.join(
            root, "Town12_seq", "measurements", "*.json.gz"))):
        with gzip.open(fp, "rt") as f:
            cmds.append(json.load(f)["command"])
    # collapse runs: the phase sequence must be 4* 1+ 4* (optionally a
    # leading/trailing 3 for straight-junction edges, but never 4 inside
    # the 1-run and never 3 between 1s)
    runs = [c for i, c in enumerate(cmds) if i == 0 or c != cmds[i - 1]]
    assert 1 in runs, runs
    i1_first, i1_last = runs.index(1), len(runs) - 1 - runs[::-1].index(1)
    assert i1_first == i1_last, f"turn command interrupted: {runs}"
    # straight-crossing: no 3 -> 4 -> 3 flap on approach
    spec2 = {"town": "crossing", "start_s": 5.0, "end_s": 290.0,
             "route_id": "seq2"}
    rec2 = run_route(spec2, expert_factory(save_root=root,
                                           dir_name_fmt="Town12_seq2"))
    cmds2 = []
    for fp in sorted(_glob.glob(os.path.join(
            root, "Town12_seq2", "measurements", "*.json.gz"))):
        with gzip.open(fp, "rt") as f:
            cmds2.append(json.load(f)["command"])
    runs2 = [c for i, c in enumerate(cmds2) if i == 0 or c != cmds2[i - 1]]
    assert runs2.count(3) <= 1, f"junction command flapped: {runs2}"


def test_build_world_rejects_bad_turn_specs():
    with pytest.raises(ValueError):
        build_world({"town": "straight", "turn": "left", "start_s": 5.0,
                     "end_s": 100.0})
    with pytest.raises(ValueError):
        build_world({"town": "crossing", "turn": "left", "ego_lane": 1,
                     "start_s": 5.0, "end_s": 100.0})


def test_grid_town_multiturn_route(tmp_path):
    """Grid town: a three-street route (east -> north -> east) chains
    through two junctions via route_via's Hermite connectors; the expert
    stops at reds (nearest-ahead light selection on multi-light lanes),
    bypasses a blocker, and both turn commands appear in collected data."""
    import glob as _glob

    half = 1.75
    root = str(tmp_path / "d")
    spec = {"town": "grid", "town_kwargs": {"blocks_x": 2, "blocks_y": 2},
            "route_id": "Town12_grid",
            "via": [[10.0, -half], [120.0 + half, 60.0],
                    [180.0, 120.0 - half]],
            "scenarios": [{"type": "ParkedObstacle", "at_s": 60.0}],
            "npcs": [{"at_s": 30.0, "lane": 8, "speed": 6.0}]}
    rec = run_route(spec, expert_factory(save_root=root,
                                         dir_name_fmt="Town12_grid"))
    assert rec["status"] in ("Completed", "Perfect"), rec["infractions"]
    assert rec["scores"]["score_composed"] == 100.0, rec["infractions"]
    cmds = set()
    for fp in sorted(_glob.glob(os.path.join(
            root, "Town12_grid", "measurements", "*.json.gz"))):
        with gzip.open(fp, "rt") as f:
            cmds.add(json.load(f)["command"])
    assert 1 in cmds and 2 in cmds, cmds    # left AND right turns


def test_grid_light_selection_nearest_ahead():
    town = simmap.grid_town(blocks_x=2, blocks_y=1)
    world = SimWorld(town)
    lane0 = town.lanes[0]              # eastbound street y=0, 3 junctions
    lights = [l for l in world.lights if l.spot.lane_id == 0]
    assert len(lights) == 3
    nxt = world.light_for_lane(0, at_xy=np.array([60.0, -1.75]))
    assert abs(nxt.spot.position[0] - (120.0 - 7.0)) < 1e-6


@pytest.mark.parametrize("name,at_s", [
    ("OppositeVehicleRunningRedLight", 120.0),
    ("HighwayCutIn", 60.0),
    ("StaticCutIn", 80.0),
])
def test_expert_drives_dynamic_cutin_scenarios(name, at_s):
    rec = run_route(_expert_spec(name, at_s), expert_factory())
    assert rec["status"] in ("Completed", "Perfect"), (name, rec["infractions"])
    assert rec["scores"]["score_composed"] == 100.0, (
        name, rec["infractions"])


def test_expert_left_turn_through_oncoming_flow():
    spec = {"town": "crossing", "start_s": 5.0, "end_s": 260.0,
            "turn": "left", "route_id": "sigleft",
            "scenarios": [{"type": "SignalizedJunctionLeftTurn",
                           "at_s": 138.0}]}
    rec = run_route(spec, expert_factory())
    assert rec["status"] in ("Completed", "Perfect"), rec["infractions"]
    assert not rec["infractions"]["collisions_vehicle"]


def test_cut_in_actually_merges_and_red_runner_dashes():
    """The scenario mechanics must fire: the cut-in vehicle ends up in
    the ego lane, and the red-light runner crosses the ego path (a
    non-braking scripted ego collides with it)."""
    from simlingo_tpu.sim.actors import Vehicle

    # cut-in merge check
    spec = {"town": "straight", "start_s": 5.0, "end_s": 220.0,
            "route_id": "cutin",
            "scenarios": [{"type": "HighwayCutIn", "at_s": 60.0}]}
    world, route, recs = build_world(spec)
    ego_lane = world.map.closest_lane(world.ego.position)
    cutter = [a for a in world.actors
              if isinstance(a, Vehicle) and a.role == "scenario"][0]
    agent = _Scripted(throttle=0.6)
    merged = False
    for _ in range(900):
        world.apply_ego_control(*agent.step())
        world.tick()
        _, lat = ego_lane.project(cutter.position)
        if abs(lat) < 0.6:
            merged = True
            break
    assert merged, "cut-in vehicle never entered the ego lane"

    # red-runner collision check against a non-yielding ego
    spec2 = {"town": "straight", "start_s": 5.0, "end_s": 220.0,
             "route_id": "redrun2",
             "scenarios": [{"type": "OppositeVehicleRunningRedLight",
                            "at_s": 100.0}]}
    rec = run_route(spec2, lambda w, r, s: _Scripted(0.5), max_steps=900)
    assert rec["infractions"]["collisions_vehicle"], \
        "runner never crossed the scripted ego's path"


def test_min_speed_event_and_bypass_through_traffic():
    """MinimumSpeedRouteTest counterpart: routes with background traffic
    emit the 'Average speed is X%' event feeding driving_efficiency; the
    blocker bypass must use the free same-direction lane (topology-based
    direction) so traffic doesn't deadlock the route."""
    from simlingo_tpu.eval.b2d_benchmarks import driving_efficiency

    spec = {"town": "straight", "start_s": 5.0, "end_s": 220.0,
            "route_id": "traffic",
            "scenarios": [{"type": "Accident", "at_s": 110.0}],
            "npcs": [{"at_s": 60.0, "lane": 1, "speed": 7.0},
                     {"at_s": 120.0, "lane": 2, "speed": 7.0}]}
    rec = run_route(spec, expert_factory())
    assert rec["status"] in ("Completed", "Perfect"), rec["infractions"]
    assert rec["scores"]["score_composed"] == 100.0
    msgs = rec["infractions"]["min_speed_infractions"]
    assert len(msgs) == 1 and "% of the surrounding traffic" in msgs[0]
    eff = driving_efficiency([rec])
    assert 20.0 < eff <= 150.0
    # DS unaffected: Bench2Drive disables the min-speed penalty
    assert rec["scores"]["score_penalty"] == 1.0


def test_bypass_direction_from_topology():
    from simlingo_tpu.sim.scenarios import ScenarioBuilder

    # two forward lanes: bypass right (same direction)
    spec = {"town": "straight", "start_s": 5.0, "end_s": 220.0,
            "route_id": "x",
            "scenarios": [{"type": "Accident", "at_s": 110.0}]}
    _, _, recs = build_world(spec)
    assert recs[0]["direction"] == "right"
    # single lane per direction: bypass left through oncoming
    spec["town_kwargs"] = {"lanes_per_dir": 1}
    _, _, recs = build_world(spec)
    assert recs[0]["direction"] == "left"
