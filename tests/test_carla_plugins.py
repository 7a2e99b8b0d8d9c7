"""Drive the CARLA leaderboard plugins offline through API test doubles
(tests/carla_stubs.py): GPS->CARLA conversion, route-planner wiring, map
lane queries, privileged actor gathering, and control conversion -- the
logic that previously only ran inside a live simulator (VERDICT r1 weak #9).
"""

import importlib
import sys

import numpy as np
import pytest

from tests import carla_stubs as stubs


@pytest.fixture()
def carla_env(tmp_path):
    # lane graph: ego lane (-2) with one same-direction lane to the left
    # (-1) and one opposite lane further left (1); junction 4 m ahead
    ego_wp = stubs.FakeWaypoint(lane_id=-2, left_marking="Broken",
                                right_marking="Solid")
    left_same = stubs.FakeWaypoint(lane_id=-1)
    opposite = stubs.FakeWaypoint(lane_id=1)
    ego_wp._left = left_same
    left_same._left = opposite
    junction_wp = stubs.FakeWaypoint(lane_id=-2, is_junction=True)
    ego_wp._next = junction_wp

    actors = [
        stubs.FakeActor(7, "vehicle.lincoln.mkz", x=12.0, y=1.0, vx=4.0),
        stubs.FakeActor(9, "walker.pedestrian.0001", x=6.0, y=-3.0, vy=1.0),
        stubs.FakeActor(99, "vehicle.far.away", x=200.0, y=0.0),
        stubs.FakeActor(11, "static.prop.trafficwarning", x=20.0, y=0.0),
    ]
    cdp = stubs.install_stubs(world=stubs.FakeWorld(actors),
                              world_map=stubs.FakeMap(ego_wp))
    # (re)import the plugin modules under the stubs
    for name in ("simlingo_tpu.agent.carla_agent",
                 "simlingo_tpu.agent.carla_data_agent"):
        if name in sys.modules:
            importlib.reload(sys.modules[name])
    yield cdp, tmp_path
    # remove the fakes and restore the plugins' no-CARLA state so later
    # tests don't see a phantom simulator
    for name in ("carla", "leaderboard", "leaderboard.autoagents",
                 "leaderboard.autoagents.autonomous_agent", "srunner",
                 "srunner.scenariomanager",
                 "srunner.scenariomanager.carla_data_provider"):
        sys.modules.pop(name, None)
    for name in ("simlingo_tpu.agent.carla_agent",
                 "simlingo_tpu.agent.carla_data_agent"):
        if name in sys.modules:
            importlib.reload(sys.modules[name])


def _plan(n=30, spacing=4.0):
    """Straight global plan along +x in CARLA world coords."""
    return [((float(i * spacing), 0.0, 0.0), 4) for i in range(n)]


def _input_data(x, y=0.0, speed=5.0, with_lidar=True, hw=(512, 1024)):
    rgb = np.zeros((*hw, 4), np.uint8)
    data = {
        "rgb_front": (0, rgb),
        "rgb_augmented": (0, rgb.copy()),
        "gps": (0, stubs.gps_for_carla_xy(x, y)),
        "imu": (0, np.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])),
        "speed": (0, {"speed": speed}),
    }
    if with_lidar:
        data["lidar"] = (0, np.random.RandomState(0).rand(100, 4) * 20)
    return data


def test_data_agent_plugin_collects_offline(carla_env):
    cdp, tmp_path = carla_env
    import os

    from simlingo_tpu.agent import carla_data_agent as plugin

    os.environ["SAVE_PATH"] = str(tmp_path / "collect")
    agent = plugin.SimLingoTPUDataAgent.__new__(
        plugin.SimLingoTPUDataAgent)
    agent.setup(str(tmp_path / "collect"))
    agent._global_plan_world_coord = _plan()

    controls = []
    for i in range(3):
        c = agent.run_step(_input_data(x=1.0 + 0.25 * i), timestamp=i * 0.05)
        controls.append(c)
    assert all(np.isfinite([c.steer, c.throttle, c.brake]).all()
               for c in controls)

    # measurements carry the map-derived lane context
    import gzip
    import json
    mdir = os.path.join(os.environ["SAVE_PATH"], "measurements")
    files = sorted(os.listdir(mdir))
    assert files
    with gzip.open(os.path.join(mdir, files[0]), "rt") as f:
        m = json.load(f)
    assert m["num_lanes_same_direction"] == 2
    assert m["num_lanes_opposite_direction"] == 1
    assert m["ego_lane_number"] == 1          # one same-direction lane left
    assert m["lane_marking_left"] == "Broken"
    assert m["distance_to_junction"] == pytest.approx(2.0, abs=0.1)

    # privileged actors gathered in ego frame; far actor excluded
    bdir = os.path.join(os.environ["SAVE_PATH"], "boxes")
    with gzip.open(os.path.join(bdir, sorted(os.listdir(bdir))[0]),
                   "rt") as f:
        boxes = json.load(f)
    ids = {b.get("id") for b in boxes if "id" in b}
    assert 7 in ids and 9 in ids and 99 not in ids
    veh = next(b for b in boxes if b.get("id") == 7)
    assert abs(veh["position"][0] - 11.0) < 0.5   # ego at x=1
    assert any(b.get("class") == "ego_info" for b in boxes)


def test_model_agent_plugin_run_step_offline(carla_env, tmp_path):
    cdp, _ = carla_env
    import jax
    import jax.numpy as jnp

    from simlingo_tpu.agent import carla_agent as plugin
    from simlingo_tpu.agent.agent import LingoAgent
    from simlingo_tpu.agent.config import AgentConfig
    from simlingo_tpu.agent.route_planner import CarlaRoutePlanner
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

    agent = plugin.SimLingoTPUAgent.__new__(plugin.SimLingoTPUAgent)
    # setup() loads a 1B HF checkpoint; install the tiny equivalents the
    # same way setup() would
    agent.agent = LingoAgent(
        params, cfg,
        AgentConfig(use_cot=False, initial_frames_delay=0, int8_llm=False),
        tokenizer=tok, max_prompt_len=256, compute_dtype=jnp.float32)
    agent.planner = CarlaRoutePlanner(min_distance=7.5, max_distance=50.0)
    agent.initialized = False
    agent._global_plan_world_coord = _plan()

    # scenario recording rides along (reference wires ScenarioLogger into
    # its agents); the stub env has no srunner -> ego-only records
    from simlingo_tpu.agent.scenario_logger import ScenarioLogger
    agent.logger = ScenarioLogger(save_path=str(tmp_path / "rec"),
                                  route_index="0")

    c = agent.run_step(_input_data(x=0.5, speed=4.0, with_lidar=False),
                       timestamp=0.0)
    assert np.isfinite([c.steer, c.throttle, c.brake]).all()
    assert -1.0 <= c.steer <= 1.0
    agent.destroy()
    import gzip as _gzip
    import json as _json
    with _gzip.open(tmp_path / "rec" / "records.json.gz", "rt") as f:
        rec = _json.load(f)
    assert len(rec["states"]) == 1
    assert rec["ego_actions"][0]["steer"] == [[[float(c.steer)]]]

    # GPS->CARLA conversion is the planner's projection inverse
    pos = agent.planner.convert_gps_to_carla(
        stubs.gps_for_carla_xy(12.5, -3.0))
    np.testing.assert_allclose(pos[:2], [12.5, -3.0], atol=1e-6)
