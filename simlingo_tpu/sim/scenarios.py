"""Bench2Drive scenario inventory on microsim primitives.

Each builder spawns the scenario's actors into a SimWorld along the ego
route and returns the `active_scenario_record` dict the expert's scenario
manager consumes (expert/scenarios.py contract -- the same records the
CARLA plugin extracts from the patched leaderboard's
CarlaDataProvider.active_scenarios, reference
leaderboard_autopilot/leaderboard/scenarios/route_scenario.py).

Reference scenario definitions:
  Bench2Drive/scenario_runner/srunner/scenarios/*.py
  (accident.py construction_obstacle.py parked_obstacle.py
   vehicle_opens_door.py hazard_at_side_lane.py invading_turn.py
   yield_to_emergency_vehicle.py blocked_intersection.py
   pedestrian_crossing.py ...)
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from simlingo_tpu.sim.actors import Actor, Vehicle, Walker, static_prop
from simlingo_tpu.sim.map import Lane
from simlingo_tpu.sim.world import SimWorld


def _route_pose(route: np.ndarray, s: float) -> Tuple[np.ndarray, float]:
    """(position, yaw) at arc length s along a sparse route polyline."""
    route = np.asarray(route, float)[:, :2]
    seg = np.linalg.norm(np.diff(route, axis=0), axis=1)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    s = min(max(s, 0.0), cum[-1])
    i = min(int(np.searchsorted(cum, s)), len(route) - 2)
    t = route[i + 1] - route[i]
    yaw = math.atan2(t[1], t[0])
    frac = (s - cum[i]) / max(seg[i] if i < len(seg) else 1.0, 1e-9)
    return route[i] + frac * t, yaw


def _left_normal(yaw: float) -> np.ndarray:
    return np.array([-math.sin(yaw), math.cos(yaw)])


def _actor_rec(actor: Actor) -> Dict:
    return {"position": [float(actor.position[0]), float(actor.position[1])],
            "extent": [float(actor.extent[0]), float(actor.extent[1])],
            "yaw": float(actor.yaw), "id": actor.actor_id,
            "type_id": actor.type_id}


class ScenarioBuilder:
    """Places one named scenario at arc length s along the ego route."""

    def __init__(self, world: SimWorld, route: np.ndarray):
        self.world = world
        self.route = np.asarray(route, float)[:, :2]

    def _bypass_direction(self, at_s: float) -> str:
        """Side to overtake a blocker on: prefer a same-direction
        neighbor lane (the reference's multi-lane Accident/Construction
        re-plan through available lanes); fall back to the oncoming side
        (TwoWays geometry) when the road has one lane per direction."""
        lane = self.world.map.closest_lane(_route_pose(self.route,
                                                       at_s)[0])
        right = self.world.map.neighbor(lane, "right")
        if right is not None and right.lane_type == "driving":
            return "right"
        return "left"

    def build(self, name: str, at_s: float, **kw) -> Optional[Dict]:
        fn = getattr(self, "_" + _snake(name), None)
        if fn is None:
            raise ValueError(f"unknown scenario type: {name}")
        rec = fn(at_s, **kw)
        if rec is not None:
            rec["type"] = name
        return rec

    # -- static blockages (accident.py / construction_obstacle.py /
    #    parked_obstacle.py + their TwoWays variants) ------------------------
    def _accident(self, at_s: float, two_ways: bool = False) -> Dict:
        pos, yaw = _route_pose(self.route, at_s)
        pos2, yaw2 = _route_pose(self.route, at_s + 9.0)
        w = self.world
        first = w.spawn(Vehicle(pos, yaw=yaw + 0.25, behavior="parked",
                                type_id="vehicle.tesla.model3",
                                color="180,20,20", role="scenario"))
        last = w.spawn(Vehicle(pos2, yaw=yaw2 - 0.2, behavior="parked",
                               type_id="vehicle.carlamotors.firetruck",
                               base_type="truck", extent=(4.2, 1.4),
                               color="200,30,30", role="scenario"))
        # warning cones along the roadside BEHIND/BESIDE the wreck on the
        # side OPPOSITE the overtake corridor (reference accident.py cone
        # placement funnels traffic toward the open side)
        direction = "left" if two_ways \
            else self._bypass_direction(at_s)
        cone_side = -1.4 if direction == "left" else 1.4
        for ds in (-6.0, 4.0, 14.0):
            p, y = _route_pose(self.route, at_s + ds)
            w.spawn(static_prop(p + _left_normal(y) * cone_side, yaw=y))
        return {"first_actor": _actor_rec(first),
                "last_actor": _actor_rec(last),
                "direction": direction}

    def _accident_two_ways(self, at_s: float) -> Dict:
        return self._accident(at_s, two_ways=True)

    def _construction_obstacle(self, at_s: float,
                              two_ways: bool = False) -> Dict:
        pos, yaw = _route_pose(self.route, at_s)
        w = self.world
        first = w.spawn(static_prop(
            pos, yaw=yaw, type_id="static.prop.trafficwarning",
            extent=(1.2, 1.0), role="scenario"))
        last_pos, last_yaw = _route_pose(self.route, at_s + 12.0)
        last = w.spawn(static_prop(last_pos, yaw=last_yaw,
                                   type_id="static.prop.trafficwarning",
                                   extent=(1.2, 1.0), role="scenario"))
        for ds in np.arange(2.0, 11.0, 2.0):
            p, y = _route_pose(self.route, at_s + ds)
            w.spawn(static_prop(p + _left_normal(y)
                                * (0.8 * math.sin(ds)), yaw=y))
        return {"first_actor": _actor_rec(first),
                "last_actor": _actor_rec(last),
                "direction": "left" if two_ways
                else self._bypass_direction(at_s)}

    def _construction_obstacle_two_ways(self, at_s: float) -> Dict:
        return self._construction_obstacle(at_s, two_ways=True)

    def _parked_obstacle(self, at_s: float,
                         two_ways: bool = False) -> Dict:
        pos, yaw = _route_pose(self.route, at_s)
        first = self.world.spawn(Vehicle(
            pos + _left_normal(yaw) * -0.9, yaw=yaw, behavior="parked",
            type_id="vehicle.audi.tt", color="60,60,160", role="scenario"))
        return {"first_actor": _actor_rec(first),
                "direction": "left" if two_ways
                else self._bypass_direction(at_s)}

    def _parked_obstacle_two_ways(self, at_s: float) -> Dict:
        return self._parked_obstacle(at_s, two_ways=True)

    def _vehicle_opens_door_two_ways(self, at_s: float) -> Dict:
        pos, yaw = _route_pose(self.route, at_s)
        first = self.world.spawn(Vehicle(
            pos + _left_normal(yaw) * -0.8, yaw=yaw, behavior="parked",
            type_id="vehicle.mercedes.coupe_2020",
            extent=(2.6, 1.6),           # widened: door open into the lane
            color="20,60,120", role="scenario"))
        return {"first_actor": _actor_rec(first), "direction": "left"}

    # -- moving hazards -------------------------------------------------------
    def _hazard_at_side_lane(self, at_s: float,
                             two_ways: bool = False) -> Dict:
        """Two slow bicycles at the lane edge ahead of the ego."""
        w = self.world
        lane = w.map.closest_lane(_route_pose(self.route, at_s)[0])
        bikes = []
        for ds in (0.0, 6.0):
            pos, yaw = _route_pose(self.route, at_s + ds)
            bikes.append(w.spawn(Vehicle(
                pos + _left_normal(yaw) * -1.2, yaw=yaw, speed=3.0,
                lane=lane, target_speed=3.0,
                type_id="vehicle.diamondback.century",
                base_type="bicycle", extent=(0.9, 0.4),
                color="20,160,60", role="scenario")))
        return {"first_actor": _actor_rec(bikes[0]),
                "last_actor": _actor_rec(bikes[1]), "direction": "left"}

    def _hazard_at_side_lane_two_ways(self, at_s: float) -> Dict:
        return self._hazard_at_side_lane(at_s, two_ways=True)

    def _invading_turn(self, at_s: float) -> Dict:
        """Cones on the oncoming side invading the ego lane in a bend."""
        w = self.world
        cones = []
        for ds in np.arange(0.0, 24.0, 4.0):
            pos, yaw = _route_pose(self.route, at_s + ds)
            cones.append(w.spawn(static_prop(
                pos + _left_normal(yaw) * 1.1, yaw=yaw,
                type_id="static.prop.constructioncone",
                role="scenario")))
        return {"first_actor": _actor_rec(cones[0]),
                "last_actor": _actor_rec(cones[-1]),
                "direction": "right", "offset": 0.8}

    def _yield_to_emergency_vehicle(self, at_s: float,
                                    behind: float = 35.0) -> Dict:
        """Ambulance approaching from behind on the ego lane
        (yield_to_emergency_vehicle.py spawns it ~50 m back and lets it
        close in; the ego must shift aside to let it pass)."""
        w = self.world
        anchor, _ = _route_pose(self.route, max(at_s, 0.0))
        lane = w.map.closest_lane(anchor)
        s_anchor, _ = lane.project(anchor)
        s_spawn = max(s_anchor - behind, 0.0)
        pos, yaw = lane.point_at_s(s_spawn), lane.yaw_at_s(s_spawn)
        emv = w.spawn(Vehicle(pos, yaw=yaw, speed=14.0, lane=lane,
                              target_speed=16.0,
                              type_id="vehicle.ford.ambulance",
                              base_type="van", extent=(3.2, 1.3),
                              color="240,240,240", role="scenario"))
        return {"first_actor": _actor_rec(emv), "direction": "right"}

    # -- junction / crossing ---------------------------------------------------
    def _blocked_intersection(self, at_s: float,
                              clear_after: float = 12.0) -> Dict:
        """A vehicle blocks the junction; it drives clear after the ego
        has waited (blocked_intersection.py: the blocker leaves on a
        timer once the ego arrives)."""
        pos, yaw = _route_pose(self.route, at_s)
        first = self.world.spawn(Vehicle(
            pos, yaw=yaw + math.pi / 2, behavior="parked",
            target_speed=6.0,
            type_id="vehicle.nissan.patrol", extent=(2.5, 1.1),
            color="40,40,40", role="scenario"))
        first.unblock_trigger_distance = 30.0
        first.unblock_delay = clear_after
        return {"first_actor": _actor_rec(first)}

    def _dynamic_object_crossing(self, at_s: float,
                                 trigger_distance: float = 18.0) -> Dict:
        """Pedestrian steps onto the road when the ego approaches
        (pedestrian_crossing.py / DynamicObjectCrossing)."""
        pos, yaw = _route_pose(self.route, at_s)
        n = _left_normal(yaw)
        start = pos + n * -5.0
        path = np.stack([pos + n * -2.0, pos + n * 4.0], 0)
        walker = self.world.spawn(Walker(
            start, path=path, trigger_distance=trigger_distance,
            role="scenario"))
        walker.yaw = yaw + math.pi / 2
        return {"first_actor": _actor_rec(walker)}

    def _opposite_vehicle_running_red_light(self, at_s: float,
                                            trigger_distance: float = 35.0
                                            ) -> Dict:
        """A crossing vehicle blows through its red as the ego enters the
        junction on green (opposite_vehicle_taking_priority.py): scripted
        straight-line crosser triggered by ego proximity."""
        pos, yaw = _route_pose(self.route, at_s)
        n = _left_normal(yaw)
        w = self.world
        runner = w.spawn(Vehicle(pos + n * -30.0, yaw=yaw + math.pi / 2,
                                 speed=0.0, target_speed=10.0,
                                 type_id="vehicle.dodge.charger_2020",
                                 color="30,30,30", role="scenario"))
        runner.behavior = "scripted"
        runner._trigger = ("dash", trigger_distance, 10.0)
        return {"first_actor": _actor_rec(runner)}

    def _signalized_junction_left_turn(self, at_s: float) -> Dict:
        """Oncoming through-traffic while the ego turns left on green
        (signalized_junction_left_turn.py): constant flow on the opposite
        lane that the ego's turn path crosses."""
        w = self.world
        lane_in = w.map.closest_lane(_route_pose(self.route, 0.0)[0])
        opp = w.map.lanes.get(lane_in.opposite)
        first = None
        if opp is not None:
            anchor, _ = _route_pose(self.route, at_s)
            s_a, _ = opp.project(anchor)
            for k in range(3):
                s = s_a - 25.0 - 28.0 * k
                v = w.spawn(Vehicle(opp.point_at_s(s),
                                    yaw=opp.yaw_at_s(s), speed=7.0,
                                    lane=opp, target_speed=7.0,
                                    type_id="vehicle.toyota.prius",
                                    color="160,160,170",
                                    role="scenario"))
                first = first or v
        return {"first_actor": _actor_rec(first)} if first else None

    def _highway_cut_in(self, at_s: float,
                        trigger_distance: float = 25.0) -> Dict:
        """A neighbor-lane vehicle merges into the ego lane just ahead
        (highway_cut_in.py)."""
        w = self.world
        ego_lane = w.map.closest_lane(_route_pose(self.route, 0.0)[0])
        side = (w.map.neighbor(ego_lane, "right")
                or w.map.neighbor(ego_lane, "left") or ego_lane)
        anchor, _ = _route_pose(self.route, at_s)
        s_a, _ = side.project(anchor)
        cutter = w.spawn(Vehicle(side.point_at_s(s_a),
                                 yaw=side.yaw_at_s(s_a), speed=6.0,
                                 lane=side, target_speed=6.0,
                                 type_id="vehicle.bmw.grandtourer",
                                 color="60,90,160", role="scenario"))
        cutter.cut_in_lane = ego_lane
        cutter.cut_in_trigger_distance = trigger_distance
        return {"first_actor": _actor_rec(cutter)}

    def _static_cut_in(self, at_s: float,
                       trigger_distance: float = 30.0) -> Dict:
        """A parked vehicle pulls out into the ego lane as the ego closes
        in (static_cut_in.py): parked at the lane edge, unblocks on
        proximity and merges to the lane center."""
        w = self.world
        ego_lane = w.map.closest_lane(_route_pose(self.route, 0.0)[0])
        pos, yaw = _route_pose(self.route, at_s)
        puller = w.spawn(Vehicle(pos + _left_normal(yaw) * -1.6, yaw=yaw,
                                 behavior="parked", target_speed=5.0,
                                 type_id="vehicle.ford.mustang",
                                 color="120,20,20", role="scenario"))
        puller.unblock_trigger_distance = trigger_distance
        puller.unblock_delay = 0.0
        puller.lane = ego_lane
        return {"first_actor": _actor_rec(puller)}

    def _parking_crossing_pedestrian(self, at_s: float,
                                     trigger_distance: float = 16.0
                                     ) -> Dict:
        """A pedestrian steps out from BETWEEN parked cars
        (parking_crossing_pedestrian.py): occluded until late, so the
        brake reaction is harder than the open crossing."""
        w = self.world
        n = None
        for ds in (-7.0, 0.0, 7.0):
            pos, yaw = _route_pose(self.route, at_s + ds)
            n = _left_normal(yaw)
            w.spawn(Vehicle(pos + n * -2.8, yaw=yaw, behavior="parked",
                            type_id="vehicle.seat.leon",
                            color="90,90,90", role="scenario"))
        pos, yaw = _route_pose(self.route, at_s + 3.5)
        n = _left_normal(yaw)
        start = pos + n * -2.8           # between the parked cars
        path = np.stack([pos + n * -1.2, pos + n * 4.0], 0)
        walker = w.spawn(Walker(start, path=path,
                                trigger_distance=trigger_distance,
                                role="scenario"))
        walker.yaw = yaw + math.pi / 2
        return {"first_actor": _actor_rec(walker)}

    def _crossing_bicycle_flow(self, at_s: float) -> Dict:
        """Bicycles crossing the junction path (crossing_bicycle_flow.py)."""
        pos, yaw = _route_pose(self.route, at_s)
        n = _left_normal(yaw)
        w = self.world
        first = None
        for k in range(3):
            start = pos + n * (-12.0 - 6.0 * k)
            bike = w.spawn(Vehicle(start, yaw=yaw + math.pi / 2, speed=4.0,
                                   target_speed=4.0,
                                   type_id="vehicle.gazelle.omafiets",
                                   base_type="bicycle", extent=(0.9, 0.4),
                                   color="150,90,30", role="scenario"))
            bike.behavior = "scripted"      # straight-line: no lane to hold

            first = first or bike
        return {"first_actor": _actor_rec(first)}


def _snake(name: str) -> str:
    out = []
    for i, ch in enumerate(name):
        if ch.isupper() and i > 0:
            out.append("_")
        out.append(ch.lower())
    return "".join(out)


def scripted_tick(world: SimWorld) -> None:
    """Advance 'scripted' vehicles (straight-line constant speed).

    A vehicle with `_trigger = ("dash", distance, speed)` holds still
    until the ego comes within `distance`, then dashes at `speed`
    (red-light-runner mechanics)."""
    ego_pos = world.ego.position if world.ego is not None else None
    for actor in world.actors:
        if not (isinstance(actor, Vehicle) and actor.behavior == "scripted"
                and actor.alive):
            continue
        trigger = getattr(actor, "_trigger", None)
        if trigger is not None and ego_pos is not None:
            kind, dist, speed = trigger
            if np.linalg.norm(ego_pos - actor.position) < dist:
                actor.speed = float(speed)
                actor._trigger = None
            else:
                continue
        actor.position = actor.position + actor.velocity * world.dt
