"""Full Bench2Drive scenario-type inventory on the microsim.

The reference benchmark spans 44 scenario types over five ability groups
(Bench2Drive/tools/ability_benchmark.py:33-60). These tests assert that
every type (1) has a builder, (2) spawns its mechanics into a world, and
(3) -- for the types with adversarial dynamics -- actually fires them.
Closed-loop expert runs over the new types live in
test_expert_drives_new_scenarios (slower, one route each).
"""

import math

import numpy as np
import pytest

from simlingo_tpu.eval.b2d_benchmarks import ABILITIES
from simlingo_tpu.sim import map as simmap
from simlingo_tpu.sim.actors import Vehicle, Walker
from simlingo_tpu.sim.runner import build_world, expert_factory, run_route
from simlingo_tpu.sim.scenarios import ScenarioBuilder, _snake
from simlingo_tpu.sim.suite import MICROBENCH


ALL_TYPES = sorted({n for v in ABILITIES.values() for n in v})


def test_all_44_bench2drive_types_have_builders():
    missing = [n for n in ALL_TYPES
               if not hasattr(ScenarioBuilder, "_" + _snake(n))]
    assert len(ALL_TYPES) == 44
    assert not missing, missing


def test_microbench_covers_every_type_once():
    covered = {s["scenarios"][0]["type"] for s in MICROBENCH
               if s.get("scenarios")}
    assert set(ALL_TYPES) <= covered
    ids = [s["route_id"] for s in MICROBENCH]
    assert len(ids) == len(set(ids))


def _spec_for(name):
    return next(s for s in MICROBENCH
                if s.get("scenarios")
                and s["scenarios"][0]["type"] == name)


@pytest.mark.parametrize("name", ALL_TYPES)
def test_builder_spawns_on_its_microbench_route(name):
    spec = _spec_for(name)
    world, route, recs = build_world(spec, seed=3)
    # route exists and the world got the scenario's mechanics: either
    # actors, a control fault, or a light trigger
    assert len(route) > 50
    has_actors = any(a.role == "scenario" for a in world.actors)
    has_mech = (has_actors or world.control_faults
                or world.light_triggers)
    if name in ("VanillaNonSignalizedTurn",
                "VanillaNonSignalizedTurnEncounterStopsign"):
        # route-only scenarios: the town supplies the governing feature
        assert (spec.get("turn") or world.map.stops)
    else:
        assert has_mech, name
    for rec in recs:
        assert "type" in rec and "first_actor" in rec


def test_hard_brake_lead_stops_and_resumes():
    spec = _spec_for("HardBreakRoute")
    world, route, recs = build_world(spec)
    lead = [a for a in world.actors if a.role == "scenario"][0]
    assert lead.brake_trigger_distance is not None
    # teleport the ego near the lead -> trigger
    world.ego.position = lead.position - np.array([15.0, 0.0])
    world.tick()
    assert lead.target_speed == 0.0
    assert lead.brake_trigger_distance is None
    # after the hold the lead resumes
    world.time += lead.brake_hold + 0.1
    world.tick()
    assert lead.target_speed > 0.0


def test_control_loss_biases_ego_steering():
    spec = _spec_for("ControlLoss")
    world, route, recs = build_world(spec)
    assert len(world.control_faults) == 3
    fault = world.control_faults[0]
    world.ego.position = np.asarray(fault["position"], float).copy()
    world.ego.speed = 8.0
    yaw0 = world.ego.yaw
    for _ in range(12):                      # 0.6 s > fault duration
        world.apply_ego_control(0.0, 0.5, 0.0)
        world.tick()
    assert fault["started"] is not None
    assert abs(world.ego.yaw - yaw0) > 0.01  # the bias steered the ego


def test_light_trigger_rephases_approach_and_crossing():
    spec = _spec_for("VanillaSignalizedTurnEncounterRedLight")
    world, route, recs = build_world(spec)
    assert world.light_triggers
    trig = world.light_triggers[0]
    world.ego.position = np.asarray(trig["position"], float).copy()
    world.tick()
    assert trig["fired"]
    ego_lane = world.map.closest_lane(world.ego.position)
    for light in world.lights:
        if light.spot.lane_id == ego_lane.lane_id:
            assert light.state == "red"
    # the crossing road got the complementary phase
    cross = [l for l in world.lights
             if (l.spot.light_id // 2) % 2 !=
             (ego_lane.lane_id // 2) % 2]
    assert cross and all(l.state == "green" for l in cross)


def test_t_junction_town_geometry():
    town = simmap.crossing_town(t_junction=True)
    assert town.name == "MicroTown_TJunction"
    # the north arm is gone: lane 2 ends at the junction's south edge
    assert town.lanes[2].center[-1, 1] <= -6.9
    assert town.lanes[3].center[0, 1] <= -6.9
    # only three approach lights
    assert len(town.lights) == 3


def test_highway_town_ramps():
    exit_town = simmap.highway_town(ramp="exit")
    ramp = exit_town.lanes[max(exit_town.lanes)]
    # parallel beside the outer lane at the gore, peeled away at the end
    assert abs(ramp.center[0, 1] - (-8.75)) < 1e-6
    assert ramp.center[-1, 1] < -13.0
    assert ramp.left is not None
    entry = simmap.highway_town(ramp="entry")
    ramp_e = entry.lanes[max(entry.lanes)]
    assert ramp_e.center[0, 1] < -13.0
    assert abs(ramp_e.center[-1, 1] - (-8.75)) < 1e-6


def test_parking_exit_spawns_ego_in_parking_lane():
    spec = _spec_for("ParkingExit")
    world, route, recs = build_world(spec)
    lane = world.map.closest_lane(world.ego.position, driving_only=False)
    assert lane.lane_type == "parking"
    # boxed in front and rear
    parked = [a for a in world.actors if a.role == "scenario"]
    assert len(parked) == 2
    # the route itself runs on the driving lane
    rlane = world.map.closest_lane(route[0])
    assert rlane.lane_type == "driving"


def test_flow_spec_spawns_platoon():
    spec = {"town": "straight", "start_s": 5.0, "end_s": 220.0,
            "route_id": "flowtest",
            "flows": [{"lane": 1, "from_s": 120.0, "count": 4,
                       "gap": 20.0, "speed": 5.0}]}
    world, route, recs = build_world(spec)
    npcs = [a for a in world.actors if isinstance(a, Vehicle)
            and a.role == "npc"]
    assert len(npcs) == 4
    ss = sorted(npcs[0].lane.project(v.position)[0] for v in npcs)
    gaps = np.diff(ss)
    assert np.allclose(gaps, 20.0, atol=1.5)


def test_pedestrian_crossing_group_walks_on_trigger():
    spec = _spec_for("PedestrianCrossing")
    world, route, recs = build_world(spec)
    walkers = [a for a in world.actors if isinstance(a, Walker)]
    assert len(walkers) == 3
    world.ego.position = walkers[0].position + np.array([10.0, 0.0])
    for _ in range(40):
        world.tick()
    assert all(w.triggered for w in walkers)
    assert any(w.speed > 0 for w in walkers)


# ---------------------------------------------------------------------------
# closed-loop: the expert drives a representative route per new mechanics
# family clean (the FULL 51-route suite runs via `python -m
# simlingo_tpu.sim.suite`; results in docs/STATUS_R3.md)
# ---------------------------------------------------------------------------

NEW_ROUTE_SUBSET = [
    "micro_25_enter_actor_flow",         # same-direction flow entry
    "micro_29_merge_slow_traffic",       # entry-ramp merge
    "micro_37_sequential_lane_change",   # two-lane shift
    "micro_36_parking_exit",             # parking-lane start
    "micro_38_hard_brake",               # braking lead
    "micro_39_opposite_priority",        # junction dasher
    "micro_45_t_junction",               # T-junction geometry
    "micro_48_vanilla_sig_red",          # light re-phase encounter
]


@pytest.mark.parametrize("route_id", NEW_ROUTE_SUBSET)
def test_expert_drives_new_scenarios(route_id):
    spec = next(s for s in MICROBENCH if s["route_id"] == route_id)
    rec = run_route(spec, expert_factory())
    assert rec["status"] in ("Completed", "Perfect"), (route_id, rec["infractions"])
    assert rec["scores"]["score_composed"] == 100.0, (
        route_id, rec["infractions"])


# ---------------------------------------------------------------------------
# the adversarial mechanics must actually fire: a scripted non-yielding
# ego gets punished (pattern from test_microsim.py's cut-in/red-runner
# fire checks)
# ---------------------------------------------------------------------------

class _Scripted:
    def __init__(self, throttle=0.75):
        self.throttle = throttle

    def step(self):
        return 0.0, self.throttle, 0.0

    def destroy(self, record=None):
        pass


def _run_scripted(spec, steps=2500):
    from simlingo_tpu.sim.criteria import RouteCriteria
    from simlingo_tpu.sim.scenarios import scripted_tick
    world, route, recs = build_world(spec, seed=0)
    crit = RouteCriteria(world, route)
    agent = _Scripted()
    for _ in range(steps):
        world.apply_ego_control(*agent.step())
        world.tick()
        scripted_tick(world)
        crit.update()
        if crit.finished:
            break
    return crit


def test_hard_brake_punishes_tailgater():
    # ego pre-rolling at speed with the lead close: the hard brake must
    # catch a non-braking follower (the suite route's expert follows at
    # IDM distance and survives the same trigger)
    spec = dict(_spec_for("HardBreakRoute"), start_speed=10.0,
                scenarios=[{"type": "HardBreakRoute", "at_s": 40.0}])
    crit = _run_scripted(spec)
    assert crit.infractions["collisions_vehicle"]


def test_pedestrian_crossing_group_punishes_non_braking_ego():
    crit = _run_scripted(_spec_for("PedestrianCrossing"))
    assert crit.infractions["collisions_pedestrian"]


def test_flow_scenarios_produce_real_encounters():
    """The expert must actually interact with the flows (closest flow
    vehicle within a car length-scale, or the ego forced to slow): a
    vacuous DS=100 with the flow far away would not cover the scenario."""
    from simlingo_tpu.sim.criteria import RouteCriteria
    from simlingo_tpu.sim.scenarios import scripted_tick
    for rid, d_req in (("micro_25_enter_actor_flow", 16.0),
                       ("micro_29_merge_slow_traffic", 10.0)):
        spec = next(s for s in MICROBENCH if s["route_id"] == rid)
        world, route, recs = build_world(spec, seed=0)
        crit = RouteCriteria(world, route)
        driver = expert_factory()(world, route, recs)
        min_d = 1e9
        for _ in range(8000):
            s, t, b = driver.step()
            world.apply_ego_control(s, t, b)
            world.tick()
            scripted_tick(world)
            crit.update()
            for a in world.actors:
                if a.role == "scenario" and a.alive:
                    min_d = min(min_d, float(np.linalg.norm(
                        a.position - world.ego.position)))
            if crit.finished:
                break
        assert crit.finished == "Completed", (rid, crit.infractions)
        assert min_d < d_req, (rid, min_d)


def test_microbench220_protocol():
    """The Bench2Drive-protocol suite: 220 deterministic routes, 44
    scenario types x 5 variants (reference bench2drive220.xml)."""
    import collections

    from simlingo_tpu.sim.suite import microbench220

    specs = microbench220()
    assert len(specs) == 220
    assert len({s["route_id"] for s in specs}) == 220
    c = collections.Counter(s["scenarios"][0]["type"] for s in specs)
    assert len(c) == 44 and all(v == 5 for v in c.values())
    assert microbench220() == specs          # deterministic
    # variants genuinely differ (timing axes shift the encounters)
    starts = {s["start_speed"] for s in specs
              if s["route_id"].startswith("b2d_HardBreakRoute")}
    assert len(starts) >= 3
    # one perturbed variant runs clean closed-loop
    spec = next(s for s in specs
                if s["route_id"] == "b2d_DynamicObjectCrossing_1")
    rec = run_route(spec, expert_factory())
    assert rec["status"] in ("Completed", "Perfect"), rec["infractions"]
    assert rec["scores"]["score_composed"] == 100.0
