"""Reference VQA question inventory, question by question.

Each test pins one question type of the reference generator
(`dataset_generation/language_labels/drivelm/carla_vqa_generator.py`) to a
synthetic frame and asserts both the question and the answer text.
docs/VQA_INVENTORY.md maps these tests to the reference builders.
"""

import numpy as np
import pytest

from simlingo_tpu.labels.vqa import build_graph_qa, generate_vqa


def flat(cats, cat):
    return cats[cat]


def qa_by_question(cats, fragment, cat=None):
    pool = []
    for name, sub in cats.items():
        if name.startswith("_"):
            continue
        if cat is not None and name != cat:
            continue
        pool += sub
    hits = [e for e in pool if fragment in e["Q"]]
    assert hits, f"no question containing {fragment!r}"
    return hits


VEH = {"id": 1, "class": "car", "type_id": "vehicle.lincoln.mkz_2020",
       "base_type": "car", "color_name": "red", "position": [10.0, 0.0, 0.0],
       "yaw": 0.0, "speed": 6.0, "steer": 0.0, "num_points": 40,
       "extent": [2.2, 1.0, 0.8], "role_name": "traffic"}

EGO_INFO = {"class": "ego_info", "is_in_junction": False,
            "distance_to_junction": 60.0, "num_lanes_same_direction": 2,
            "num_lanes_opposite_direction": 1, "ego_lane_number": 1,
            "lane_change": 2, "left_lane_marking_type": 1,
            "right_lane_marking_type": 2,
            "left_lane_marking_color_str": "White",
            "right_lane_marking_color_str": "White",
            "road_id": 5, "junction_id": -1, "next_junction_id": -1,
            "lane_type_str": "Driving"}

BASE_M = {"speed": 5.0, "target_speed": 5.0, "speed_limit": 30 / 3.6,
          "command": 4, "next_command": 4, "target_point": [30.0, 0.0],
          "target_point_next": [60.0, 0.0], "throttle": 0.5}


def scene(measure=None, boxes=None, ego=None):
    m = dict(BASE_M, **(measure or {}))
    ego_info = dict(EGO_INFO, **(ego or {}))
    return build_graph_qa(m, (boxes or []) + [ego_info])


# ---------------------------------------------------------------------------
# Vehicle chain (reference :1516-2253)
# ---------------------------------------------------------------------------

def test_vehicle_position_same_road():
    cats = scene(boxes=[dict(VEH)])
    e = qa_by_question(cats, "Where on the road is", "dynamic_vehicles")[0]
    assert "red car that is nearby to the front of the ego vehicle" in e["Q"]
    assert e["A"] == ("The red car is on the same road driving on the lane "
                      "of the ego vehicle.")


def test_vehicle_position_adjacent_lane():
    veh = dict(VEH, position=[10.0, 3.5, 0.0], lane_relative_to_ego=1)
    e = qa_by_question(scene(boxes=[veh]), "Where on the road is")[0]
    assert "one lane to the right of the ego vehicle" in e["A"]


def test_vehicle_position_junction_orientation():
    veh = dict(VEH, position=[20.0, 0.0, 0.0], is_in_junction=True,
               junction_id=9, yaw=np.pi)
    e = qa_by_question(scene(boxes=[veh],
                             ego={"next_junction_id": 9}),
                       "Where on the road is")[0]
    assert "inside the upcoming junction" in e["A"]
    assert "pointing towards the ego vehicle" in e["A"]


def test_vehicle_position_other_road_pointing_to_junction():
    veh = dict(VEH, position=[20.0, -12.0, 0.0], yaw=np.pi / 2,
               road_id=7, same_road_as_ego=False, is_in_junction=False)
    e = qa_by_question(scene(boxes=[veh],
                             ego={"distance_to_junction": 20.0}),
                       "Where on the road is")[0]
    assert "on the left side of the junction" in e["A"]
    assert "pointing towards the junction" in e["A"]


def test_vehicle_position_highway_lanes():
    veh = dict(VEH, position=[20.0, -12.0, 0.0], yaw=np.pi / 2, road_id=7,
               same_road_as_ego=False, is_in_junction=False, lane_id=-2)
    cats = scene(measure={"scenario": "HighwayExit",
                          "speed_limit": 80 / 3.6},
                 boxes=[veh], ego={"distance_to_junction": 60.0})
    e = qa_by_question(cats, "Where on the road is")[0]
    assert e["A"] == ("The red car is driving on the second lane from the "
                      "left on the highway.")


def test_vehicle_position_highway_cutin_accel_lane():
    veh = dict(VEH, role_name="scenario", position=[10.0, 3.5, 0.0],
               lane_relative_to_ego=1)
    cats = scene(measure={"scenario": "HighwayCutIn",
                          "speed_limit": 80 / 3.6}, boxes=[veh])
    e = qa_by_question(cats, "Where on the road is")[0]
    assert "acceleration lane of the highway to the right" in e["A"]


def test_vehicle_trajectory_steer_bins():
    for steer, want in ((-0.2, "turning left"),
                        (-0.05, "turning slightly left"),
                        (0.2, "turning right"), (0.05, "turning slightly right"),
                        (0.0, "going straight")):
        veh = dict(VEH, steer=steer)
        e = qa_by_question(scene(boxes=[veh]), "going?")[0]
        assert want in e["A"], (steer, e["A"])


def test_vehicle_trajectory_cut_in():
    veh = dict(VEH, vehicle_cuts_in=True)
    e = qa_by_question(scene(boxes=[veh]), "going?")[0]
    assert e["A"] == "The red car is cutting into the lane of the ego vehicle."


def test_vehicle_motion_status_bins():
    for speed, base, want in ((0.1, "car", "is not moving"),
                              (3.0, "car", "is driving slowly"),
                              (8.0, "car", "is driving"),
                              (3.0, "bicycle", "is moving slowly")):
        veh = dict(VEH, speed=speed, base_type=base)
        e = qa_by_question(scene(boxes=[veh]), "moving status")[0]
        assert want in e["A"], (speed, base, e["A"])


def test_path_crossing_leading_vehicle():
    veh = dict(VEH, position=[8.0, 0.0, 0.0])
    cats = scene(boxes=[veh], ego={"hazard_detected_20": True,
                                   "affects_ego_10": 1})
    e = qa_by_question(cats, "crossing the path")[0]
    assert "The ego vehicle follows the road." in e["Q"]
    assert "right to the front of the ego vehicle" in e["A"]
    assert "not crash into it" in e["A"]


def test_path_crossing_lane_change_command():
    veh = dict(VEH, position=[10.0, -3.5, 0.0], lane_relative_to_ego=-1)
    cats = scene(measure={"command": 5, "target_point": [15.0, -3.5]},
                 boxes=[veh])
    e = qa_by_question(cats, "crossing the path")[0]
    assert "does a lane change to the left" in e["Q"]
    assert "lane change to the left onto the lane of the red car" in e["A"]


def test_path_crossing_junction_pointing():
    # yaw -0.7pi: heading 234deg satisfies the reference's unwrapped
    # points-towards-ego test |heading - bearing + 180| % 360 < 90
    veh = dict(VEH, position=[22.0, 0.0, 0.0], is_in_junction=True,
               junction_id=9, yaw=-np.pi * 0.7)
    cats = scene(boxes=[veh], ego={"next_junction_id": 9,
                                   "distance_to_junction": 15.0})
    e = qa_by_question(cats, "crossing the path")[0]
    assert e["A"] == "Yes, the red car is crossing the path of the ego vehicle."


def test_path_crossing_bicycle_flow():
    bike = dict(VEH, base_type="bicycle", role_name="scenario",
                type_id="vehicle.bh.crossbike", color_name=None)
    cats = scene(measure={"scenario": "CrossingBicycleFlow"}, boxes=[bike])
    e = qa_by_question(cats, "crossing the path")[0]
    assert "bike lane" in e["A"]
    assert "turns at the next intersection" in e["A"]


def test_path_crossing_no_crossing():
    veh = dict(VEH, position=[20.0, 6.0, 0.0], lane_relative_to_ego=2,
               same_direction_as_ego=True)
    e = qa_by_question(scene(boxes=[veh]), "crossing the path")[0]
    assert e["A"] == ("No, the red car is not crossing paths with the "
                      "ego vehicle.")


# ---------------------------------------------------------------------------
# Pedestrians (:500-563)
# ---------------------------------------------------------------------------

def test_pedestrian_count_and_important_objects():
    peds = [{"class": "walker", "position": [8.0, y, 0.0], "speed": 1.0,
             "num_points": 12, "extent": [0.4, 0.4, 1.0], "id": 50 + i}
            for i, y in enumerate((-3.0, 3.0))]
    cats = scene(boxes=peds)
    e = qa_by_question(cats, "How many pedestrians")[0]
    assert e["A"] == "There are 2 pedestrians."
    imp = qa_by_question(cats, "important objects", "important_objects")[0]
    assert "pedestrian" in imp["A"]


def test_pedestrian_count_filters_lidar_sparse_and_behind():
    peds = [{"class": "walker", "position": [8.0, 0.0, 0.0], "speed": 1.0,
             "num_points": 2},           # too sparse
            {"class": "walker", "position": [-3.0, 0.0, 0.0], "speed": 1.0,
             "num_points": 12}]          # behind
    e = qa_by_question(scene(boxes=peds), "How many pedestrians")[0]
    assert e["A"] == "There are no pedestrians."


# ---------------------------------------------------------------------------
# Stop signs (:565-616) + traffic lights (:618-691)
# ---------------------------------------------------------------------------

def test_stop_sign_affecting():
    ss = {"class": "stop_sign", "id": 20, "position": [15.0, 4.0, 0.0],
          "affects_ego": True, "distance": 15.0}
    cats = scene(boxes=[ss])
    e = qa_by_question(cats, "affected by a stop sign")[0]
    assert e["A"] == ("Yes, the ego vehicle is affected by a stop sign, "
                      "which has not been cleared yet.")


def test_stop_sign_cleared():
    ss = {"class": "stop_sign", "id": 20, "position": [1.0, 2.0, 0.0],
          "affects_ego": False, "distance": 2.2}
    cats = scene(boxes=[ss])
    e = qa_by_question(cats, "affected by a stop sign")[0]
    assert "already been cleared" in e["A"]


def test_traffic_light_state_chain():
    tl = {"class": "traffic_light", "id": 21, "position": [20.0, 4.0, 0.0],
          "affects_ego": True, "state": "Red", "distance": 20.0}
    cats = scene(boxes=[tl], ego={"traffic_light_state": "Red"})
    e = qa_by_question(cats, "affected by a traffic light")[0]
    assert e["A"] == "Yes, the ego vehicle is affected by a traffic light."
    e2 = qa_by_question(cats, "state of the traffic light")[0]
    assert e2["A"] == "The traffic light is red."


def test_traffic_light_absent():
    cats = scene()
    e = qa_by_question(cats, "state of the traffic light")[0]
    assert e["A"] == "There is no traffic light affecting the ego vehicle."


# ---------------------------------------------------------------------------
# Ego chain: braking (:790-1106)
# ---------------------------------------------------------------------------

def test_braking_red_light():
    tl = {"class": "traffic_light", "id": 21, "position": [20.0, 4.0, 0.0],
          "affects_ego": True, "state": "Red", "distance": 20.0}
    cats = scene(measure={"control_brake": True,
                          "speed_reduced_by_obj_type":
                              "traffic.traffic_light",
                          "speed_reduced_by_obj_id": 21,
                          "speed_reduced_by_obj_distance": 20.0},
                 boxes=[tl], ego={"traffic_light_state": "Red"})
    e = qa_by_question(cats, "need to brake")[0]
    assert e["A"] == ("The ego vehicle should stop because of the traffic "
                      "light that is red.")


def test_braking_stop_sign():
    ss = {"class": "stop_sign", "id": 20, "position": [15.0, 4.0, 0.0],
          "affects_ego": True, "distance": 15.0}
    cats = scene(measure={"control_brake": True,
                          "speed_reduced_by_obj_type": "traffic.stop",
                          "speed_reduced_by_obj_id": 20,
                          "speed_reduced_by_obj_distance": 15.0},
                 boxes=[ss])
    e = qa_by_question(cats, "need to brake")[0]
    assert e["A"] == "The ego vehicle should stop because of the stop sign."


def test_braking_pedestrian():
    ped = {"class": "walker", "id": 30, "position": [7.0, 0.5, 0.0],
           "speed": 1.2, "num_points": 15, "distance": 7.0}
    cats = scene(measure={"control_brake": True, "walker_hazard": True,
                          "speed_reduced_by_obj_type": "walker.pedestrian",
                          "speed_reduced_by_obj_id": 30,
                          "speed_reduced_by_obj_distance": 7.0},
                 boxes=[ped])
    e = qa_by_question(cats, "need to brake")[0]
    assert e["A"] == ("The ego vehicle should stop because of the "
                      "pedestrian that is crossing the road.")


def test_braking_leading_vehicle_stopped():
    veh = dict(VEH, speed=0.0, position=[8.0, 0.0, 0.0])
    cats = scene(measure={"control_brake": True,
                          "speed_reduced_by_obj_type":
                              "vehicle.lincoln.mkz_2020",
                          "speed_reduced_by_obj_id": 1,
                          "speed_reduced_by_obj_distance": 8.0},
                 boxes=[veh])
    e = qa_by_question(cats, "need to brake")[0]
    assert e["A"] == ("The ego vehicle should stop because of the red car "
                      "that is to the front of it.")


def test_braking_two_ways_bypass():
    veh = dict(VEH, id=2, role_name="scenario", speed=0.0,
               position=[12.0, 0.0, 0.0])
    cats = scene(measure={"scenario": "ParkedObstacleTwoWays",
                          "control_brake": True,
                          "speed_reduced_by_obj_type":
                              "vehicle.lincoln.mkz_2020",
                          "speed_reduced_by_obj_id": 2,
                          "speed_reduced_by_obj_distance": 12.0},
                 boxes=[veh])
    e = qa_by_question(cats, "need to brake")[0]
    assert e["A"] == ("The ego vehicle should stop because it must invade "
                      "the opposite lane, which is occupied, in order to "
                      "bypass the parked vehicle.")


def test_braking_one_way_lane_change():
    police = dict(VEH, id=3, role_name="scenario", speed=0.0,
                  type_id="vehicle.dodge.charger_police_2020",
                  color_name=None, position=[20.0, 0.0, 0.0])
    cats = scene(measure={"scenario": "Accident", "control_brake": True,
                          "speed": 3.0},
                 boxes=[police])
    e = qa_by_question(cats, "need to brake")[0]
    assert e["A"] == ("The ego vehicle should brake because it must change "
                      "the lane to bypass the accident.")


def test_braking_no_reason():
    cats = scene()
    e = qa_by_question(cats, "need to brake")[0]
    assert e["A"] == "There is no reason for the ego vehicle to brake."


# ---------------------------------------------------------------------------
# Ego chain: actor actions (:1108-1228)
# ---------------------------------------------------------------------------

def test_actor_action_red_light_moving():
    tl = {"class": "traffic_light", "id": 21, "position": [12.0, 4.0, 0.0],
          "affects_ego": True, "state": "Red", "distance": 12.0}
    cats = scene(measure={"speed": 8.0}, boxes=[tl],
                 ego={"traffic_light_state": "Red"})
    e = qa_by_question(cats, "based on the traffic light")[0]
    assert e["A"] == ("The ego vehicle should slow down and stop at the "
                      "traffic light.")


def test_actor_action_green_light_slow():
    tl = {"class": "traffic_light", "id": 21, "position": [12.0, 4.0, 0.0],
          "affects_ego": True, "state": "Green", "distance": 12.0}
    cats = scene(measure={"speed": 2.0}, boxes=[tl],
                 ego={"traffic_light_state": "Green"})
    e = qa_by_question(cats, "based on the traffic light")[0]
    assert e["A"] == ("The ego vehicle can accelerate and continue driving "
                      "because the traffic light is green.")


def test_actor_action_green_light_with_leader():
    tl = {"class": "traffic_light", "id": 21, "position": [12.0, 4.0, 0.0],
          "affects_ego": True, "state": "Green", "distance": 12.0}
    cats = scene(measure={"speed": 7.0}, boxes=[tl],
                 ego={"traffic_light_state": "Green", "affects_ego_15": 1})
    e = qa_by_question(cats, "based on the traffic light")[0]
    assert "pay attention to the vehicle in front" in e["A"]


def test_actor_action_stop_sign_stopped_cleared():
    ss = {"class": "stop_sign", "id": 20, "position": [1.5, 2.0, 0.0],
          "affects_ego": False, "distance": 2.5}
    cats = scene(measure={"speed": 0.05}, boxes=[ss])
    e = qa_by_question(cats, "based on the stop sign")[0]
    assert e["A"] == ("The ego vehicle was affected by a stop sign, which "
                      "has already been cleared.")


def test_actor_action_too_far():
    tl = {"class": "traffic_light", "id": 21, "position": [44.0, 4.0, 0.0],
          "affects_ego": True, "state": "Red", "distance": 44.0}
    cats = scene(boxes=[tl], ego={"traffic_light_state": "Red"})
    e = qa_by_question(cats, "based on the traffic light")[0]
    assert e["A"] == ("The traffic light is too far away to affect the "
                      "ego vehicle.")


# ---------------------------------------------------------------------------
# Ego chain: obstruction lane change (:1230-1476)
# ---------------------------------------------------------------------------

def test_obstruction_construction_one_way():
    warn = {"class": "static_trafficwarning", "id": 40,
            "type_id": "static.prop.trafficwarning",
            "position": [18.0, 0.5, 0.0], "distance": 18.0,
            "extent": [1.0, 1.0, 1.0]}
    cats = scene(measure={"scenario": "ConstructionObstacle"}, boxes=[warn],
                 ego={"lane_change": 1})
    e = qa_by_question(cats, "deviate from the lane center")[0]
    assert e["A"] == ("The ego vehicle must change to the right lane to "
                      "circumvent the construction warning.")
    e2 = qa_by_question(cats, "obstacle on the current road")[0]
    assert e2["A"] == ("Yes, there is a construction warning on the "
                       "current road.")


def test_obstruction_two_ways_opposite_lane():
    veh = dict(VEH, id=2, role_name="scenario", speed=0.0,
               position=[8.0, 0.0, 0.0], next_action=None)
    cats = scene(measure={"scenario": "VehicleOpensDoorTwoWays",
                          "speed": 3.0}, boxes=[veh])
    e = qa_by_question(cats, "deviate from the lane center")[0]
    assert e["A"] == ("The ego vehicle must change to the opposite lane to "
                      "circumvent the vehicle with the opened door.")


def test_obstruction_invading_turn():
    cones = [{"class": "static", "id": 41 + i,
              "type_id": "static.prop.constructioncone",
              "position": [10.0 + 3 * i, 1.8, 0.0], "distance": 10.0 + 3 * i,
              "extent": [0.2, 0.2, 0.5]} for i in range(3)]
    cats = scene(measure={"scenario": "InvadingTurn"}, boxes=cones)
    e = qa_by_question(cats, "deviate from the lane center")[0]
    assert e["A"] == ("The ego vehicle must shift slightly to the right "
                      "side to avoid invading vehicles on the opposite "
                      "lane.")


def test_obstruction_changed_route_returns():
    cats = scene(measure={"scenario": "AccidentTwoWays",
                          "changed_route": True,
                          "route_original": [[2.0, 3.0], [8.0, 3.0]]})
    e = qa_by_question(cats, "deviate from the lane center")[0]
    assert e["A"] == ("The ego vehicle must change back to the original "
                      "lane after passing the obstruction.")


def test_obstruction_none():
    cats = scene()
    e = qa_by_question(cats, "deviate from the lane center")[0]
    assert e["A"] == "No, the ego vehicle can stay on its current lane."


# ---------------------------------------------------------------------------
# Ego chain: speed limit (:733-756)
# ---------------------------------------------------------------------------

def test_speed_limit_question():
    cats = scene(measure={"speed_limit": 50 / 3.6})
    e = qa_by_question(cats, "current speed limit")[0]
    assert e["A"] == "The current speed limit is 50 km/h."


# ---------------------------------------------------------------------------
# Road layout (:2435-3178)
# ---------------------------------------------------------------------------

def test_junction_variants():
    e = qa_by_question(scene(), "at a junction")[0]
    assert e["A"] == "No, the ego vehicle is not at a junction."
    e = qa_by_question(scene(ego={"is_in_junction": True}), "at a junction")[0]
    assert e["A"] == "The ego vehicle is in a junction."
    e = qa_by_question(scene(ego={"distance_to_junction": 12.0}),
                       "at a junction")[0]
    assert e["A"] == "The ego vehicle is right before a junction."


def test_junction_highway_accel_lane():
    cats = scene(measure={"scenario": "EnterActorFlow",
                          "speed_limit": 80 / 3.6},
                 ego={"distance_to_junction": 10.0})
    e = qa_by_question(cats, "at a junction")[0]
    assert e["A"] == ("The ego vehicle is on an acceleration lane and "
                      "about to enter the highway.")


def test_junction_highway_exit_lane():
    cats = scene(measure={"scenario": "HighwayExit",
                          "speed_limit": 80 / 3.6},
                 ego={"distance_to_junction": 10.0})
    e = qa_by_question(cats, "at a junction")[0]
    assert e["A"] == ("The ego vehicle is on an exit lane and about to "
                      "exit the highway.")


def test_important_lanes_turn_left():
    cats = scene(measure={"command": 1})
    e = qa_by_question(cats, "Which lanes are important")[0]
    assert "The ego vehicle wants to go left at the next intersection." \
        in e["Q"]
    assert "traffic coming from the left side of the intersection" in e["A"]
    assert "oncoming traffic" in e["A"]


def test_important_lanes_follow_road_multilane():
    cats = scene()  # 2 same + 1 opposite, ego on lane 1
    e = qa_by_question(cats, "Which lanes are important")[0]
    assert e["A"] == ("The ego vehicle should pay particular attention to "
                      "traffic changing lanes from neighboring lanes.")


def test_important_lanes_one_lane_road():
    cats = scene(ego={"num_lanes_same_direction": 1,
                      "num_lanes_opposite_direction": 0,
                      "ego_lane_number": 0})
    e = qa_by_question(cats, "Which lanes are important")[0]
    assert "one lane road" in e["A"]


def test_important_lanes_lane_change_soon():
    cats = scene(measure={"next_command": 5,
                          "target_point_next": [12.0, -3.0]})
    e = qa_by_question(cats, "Which lanes are important")[0]
    assert "do a lane change to the left soon" in e["Q"]
    assert "position itself so that no vehicle is driving on the same " \
           "height" in e["A"]


def test_important_lanes_bike_lane():
    cats = scene(ego={"bike_lane_right": True})
    e = qa_by_question(cats, "Which lanes are important")[0]
    assert "bike lane on the right side" in e["A"]


def test_lane_counts():
    cats = scene()
    hits = qa_by_question(cats, "How many lanes")
    answers = " ".join(e["A"] for e in hits)
    assert "two lanes in the same direction" in answers
    assert "one lane in the opposite direction" in answers


def test_lane_counts_junction_unknown():
    cats = scene(ego={"is_in_junction": True})
    hits = qa_by_question(cats, "How many lanes")
    assert all("not possible to tell" in e["A"] for e in hits)


def test_ego_lane_index():
    e = qa_by_question(scene(), "On which lane is the ego vehicle")[0]
    assert e["A"] == "The ego vehicle is on lane 1."


def test_ego_lane_index_overtaking():
    cats = scene(measure={"scenario": "AccidentTwoWays",
                          "changed_route": True})
    e = qa_by_question(cats, "On which lane is the ego vehicle")[0]
    assert e["A"] == ("The ego vehicle is on lane 2 since it overtakes an "
                      "obstruction.")


def test_lane_markings():
    cats = scene()
    left = qa_by_question(cats, "lane marking is on the left")[0]
    assert left["A"] == ("The lane marking on the left side of the ego car "
                         "is a white broken lane.")
    right = qa_by_question(cats, "lane marking is on the right")[0]
    assert right["A"] == ("The lane marking on the right side of the ego "
                          "car is a white solid lane.")


def test_lane_marking_names_from_collector_strings():
    cats = scene(ego={"left_lane_marking_type": None,
                      "right_lane_marking_type": None,
                      "lane_marking_left": "SolidSolid",
                      "lane_marking_right": "Curb"})
    left = qa_by_question(cats, "lane marking is on the left")[0]
    assert "double solid" in left["A"]
    right = qa_by_question(cats, "lane marking is on the right")[0]
    assert "curb" in right["A"]


def test_ego_lane_change_direction():
    e = qa_by_question(scene(), "In which direction is the ego car")[0]
    assert e["A"] == "The ego vehicle is allowed to change lanes to the left."


def test_ego_lane_change_parking_lane():
    cats = scene(ego={"lane_change": 0, "parking_right": True,
                      "num_lanes_opposite_direction": 0})
    e = qa_by_question(cats, "In which direction is the ego car")[0]
    assert "not allowed to change lanes" in e["A"]
    assert "parking lane on the right side" in e["A"]


def test_others_lane_change():
    e = qa_by_question(scene(), "From which side are other vehicles")[0]
    assert e["A"] == "Vehicles are allowed to change lanes from the left side."


def test_others_lane_change_one_lane():
    cats = scene(ego={"lane_change": 0, "num_lanes_same_direction": 1})
    e = qa_by_question(cats, "From which side are other vehicles")[0]
    assert e["A"] == ("There are no lane changes possible since the ego "
                      "vehicle is on a one lane road.")


def test_road_layout_overtaking_overrides():
    cats = scene(measure={"scenario": "ConstructionObstacleTwoWays",
                          "changed_route": True})
    e = qa_by_question(cats, "In which direction is the ego car")[0]
    assert e["A"] == ("The ego vehicle overtakes an obstruction. It is not "
                      "expected to change lanes.")
    e2 = qa_by_question(cats, "From which side are other vehicles")[0]
    assert "We do not expect vehicles to change into the ego lane" in e2["A"]


# ---------------------------------------------------------------------------
# Important objects merging (:2355-2420)
# ---------------------------------------------------------------------------

def test_important_objects_grouping():
    vehs = [dict(VEH, id=1, position=[10.0, 3.0, 0.0]),
            dict(VEH, id=2, position=[14.0, 3.0, 0.0])]
    cats = scene(boxes=vehs)
    e = qa_by_question(cats, "important objects", "important_objects")[0]
    # grouping splits on " to the " and pluralizes the remaining head
    # (reference :2361-2390), so the distance qualifier rides along
    assert "the 2 red car nearbys to the front right" in e["A"]


def test_important_objects_empty():
    cats = scene()
    e = qa_by_question(cats, "important objects", "important_objects")[0]
    assert e["A"] == "There are no important objects in the scene."


# ---------------------------------------------------------------------------
# Key-object registry: 2D boxes + tags
# ---------------------------------------------------------------------------

def test_key_objects_carry_2d_bbox():
    rec = generate_vqa(dict(BASE_M), [dict(VEH), dict(EGO_INFO)])
    infos = rec["key_object_infos"]
    assert len(infos) == 1
    tag, info = next(iter(infos.items()))
    assert tag.startswith("<c1,CAM_FRONT,")
    bb = info["2d_bbox"]
    assert bb[0][0] < bb[1][0] and bb[0][1] < bb[1][1]
    assert info["Category"] == "Vehicle"
    assert info["Visual_description"] == "red car"


def test_visibility_gate_parked_and_sparse():
    parked = dict(VEH, id=5, lane_type_str="Parking")
    sparse = dict(VEH, id=6, num_points=3)
    behind = dict(VEH, id=7, position=[-5.0, 0.0, 0.0])
    rec = generate_vqa(dict(BASE_M), [parked, sparse, behind,
                                      dict(EGO_INFO)])
    assert len(rec["key_object_infos"]) == 0
