"""Route split/balance tooling (labels/route_tools.py) against synthetic
route XMLs — behavioral counterparts of reference
dataset_generation/split_route_files.py and balance_scenarios.py."""

import os
import random
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from simlingo_tpu.labels import route_tools as rt


def _route_xml(path, routes):
    """routes: list of (town, waypoints [(x,y,z)...], scenarios
    [(type, trigger_xyz, extra_children_dict)...])."""
    root = ET.Element("routes")
    for rid, (town, wps, scens) in enumerate(routes):
        relem = ET.SubElement(root, "route", id=str(rid), town=town)
        weathers = ET.SubElement(relem, "weathers")
        for pct in ("0", "100"):
            w = ET.SubElement(weathers, "weather")
            for p in rt.WEATHER_PARAMS:
                w.set(p, pct if p == "route_percentage" else "10.0")
        wp_elem = ET.SubElement(relem, "waypoints")
        for x, y, z in wps:
            ET.SubElement(wp_elem, "position",
                          x=str(x), y=str(y), z=str(z))
        sc_elem = ET.SubElement(relem, "scenarios")
        for typ, trig, extra in scens:
            s = ET.SubElement(sc_elem, "scenario", name=typ, type=typ)
            ET.SubElement(s, "trigger_point", x=str(trig[0]),
                          y=str(trig[1]), z=str(trig[2]))
            for k, v in (extra or {}).items():
                ET.SubElement(s, k, value=str(v))
    ET.ElementTree(root).write(path)
    return path


def _long_route(n_scenarios=3, spacing=400.0):
    wps = [(i * 50.0, 0.0, 0.0) for i in range(int(
        (n_scenarios + 1) * spacing / 50) + 1)]
    scens = [("Accident", ((i + 1) * spacing, 0.0, 0.0),
              {"distance": 120}) for i in range(n_scenarios)]
    return ("Town12", wps, scens)


def test_parse_and_trace(tmp_path):
    path = _route_xml(str(tmp_path / "r.xml"), [_long_route(2)])
    routes = rt.parse_route_file(path)
    assert len(routes) == 1
    r = routes[0].build_trace(rt.StraightLineMap())
    # trace is ~1 m spaced, scenarios spliced in as 'scenario' points
    assert (r.trace_type == "scenario").sum() == 2
    gaps = np.linalg.norm(np.diff(r.trace[:, :2], axis=0), axis=1)
    assert gaps.max() < 2.0


def test_split_one_scenario_per_file(tmp_path):
    path = _route_xml(str(tmp_path / "r.xml"), [_long_route(3)])
    out = str(tmp_path / "out")
    res = rt.split_routes(path, out, max_scenarios=1, seed=3)
    # 3 scenarios -> 3 files, each with exactly one scenario
    xmls = [f for f in os.listdir(out) if f.endswith(".xml")]
    assert len(xmls) == 3
    for f in xmls:
        tree = ET.parse(os.path.join(out, f))
        scens = list(tree.getroot().iter("scenario"))
        assert len(scens) == 1
        assert scens[0].get("type") == "Accident"
    # segment lengths respect run-up (>=20 m) + completion
    # (120 param + 86 after) distances
    for seg in res["segments"]:
        assert seg["length_m"] > 20 + 120 + 86 - 5


def test_split_respects_completion_distance_param(tmp_path):
    # a larger <distance> parameter must lengthen the emitted segment
    short = ("Town12", [(i * 50.0, 0.0, 0.0) for i in range(30)],
             [("Accident", (400.0, 0.0, 0.0), {"distance": 50})])
    long = ("Town12", [(i * 50.0, 0.0, 0.0) for i in range(30)],
            [("Accident", (400.0, 0.0, 0.0), {"distance": 400})])
    p1 = _route_xml(str(tmp_path / "a.xml"), [short])
    p2 = _route_xml(str(tmp_path / "b.xml"), [long])
    r1 = rt.split_routes(p1, str(tmp_path / "o1"), seed=1)
    r2 = rt.split_routes(p2, str(tmp_path / "o2"), seed=1)
    assert r2["lengths"][0] > r1["lengths"][0] + 300


def test_split_writes_scenario_type_folders_and_stats(tmp_path):
    path = _route_xml(str(tmp_path / "r.xml"), [_long_route(2)])
    out = str(tmp_path / "out")
    rt.split_routes(path, out, seed=1)
    assert os.path.isdir(os.path.join(out, "Accident"))
    assert os.path.exists(os.path.join(
        out, "average_route_lengths_per_scenario.json"))


def test_split_randomizes_weather(tmp_path):
    path = _route_xml(str(tmp_path / "r.xml"), [_long_route(2)])
    out = str(tmp_path / "out")
    rt.split_routes(path, out, seed=5)
    weathers = []
    for f in sorted(os.listdir(out)):
        if f.endswith(".xml"):
            for w in ET.parse(os.path.join(out, f)).getroot().iter(
                    "weather"):
                weathers.append(tuple(w.attrib[p]
                                      for p in rt.WEATHER_PARAMS[1:]))
    assert len(set(weathers)) > 1  # not all identical


def test_succeeding_distance_junction_walk(tmp_path):
    # a map whose junction spans x in [480, 520]: the junction-end walk must
    # extend the completion distance past the junction (+25 margin)
    class JunctionMap(rt.StraightLineMap):
        def is_junction(self, p):
            return 480.0 <= float(p[0]) <= 520.0

    route = ("Town12", [(i * 50.0, 0.0, 0.0) for i in range(20)],
             [("SignalizedJunctionLeftTurn", (400.0, 0.0, 0.0), {})])
    path = _route_xml(str(tmp_path / "r.xml"), [route])
    parsed = rt.parse_route_file(path)[0].build_trace(JunctionMap())
    idx = int(np.argmax(parsed.trace_type == "scenario"))
    d = rt.succeeding_distance(parsed, idx, JunctionMap())
    # trigger at 400 -> junction ends at 520: 120 + 25 margin + 30 after
    assert 150 <= d <= 200


def test_balance_upsamples_rare_scenarios(tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # 6 routes with Accident, 1 with InvadingTurn
    for i in range(6):
        _route_xml(os.path.join(src, f"a{i}.xml"),
                   [("Town12", [(0, 0, 0), (100, 0, 0)],
                     [("Accident", (50, 0, 0), {"distance": 100})])])
    _route_xml(os.path.join(src, "rare.xml"),
               [("Town12", [(0, 0, 0), (100, 0, 0)],
                 [("InvadingTurn", (50, 0, 0), {"distance": 80})])])
    out = str(tmp_path / "out")
    report = rt.balance_scenarios(src, out, num_samples=12,
                                  routes_per_file=4, seed=2)
    assert report["after"].get("InvadingTurn", 0) >= 12
    assert report["after"].get("Accident", 0) >= 12
    assert os.path.exists(os.path.join(out, "balance_report.json"))


def test_balance_jitters_distance_and_weather(tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _route_xml(os.path.join(src, "r.xml"),
               [("Town12", [(0, 0, 0), (100, 0, 0)],
                 [("Accident", (50, 0, 0), {"distance": 100})])])
    out = str(tmp_path / "out")
    rt.balance_scenarios(src, out, num_samples=8, routes_per_file=2,
                         seed=4)
    dists = []
    for f in os.listdir(out):
        if not f.endswith(".xml"):
            continue
        for s in ET.parse(os.path.join(out, f)).getroot().iter("distance"):
            dists.append(float(s.get("value")))
    assert len(dists) >= 8
    assert len(set(dists)) > 1                     # jittered
    assert all(85 <= d <= 115 for d in dists)      # within +-10% (+rounding)


def test_balance_downsamples_control_loss(tmp_path):
    # routes mixing ControlLoss with Accident: the ControlLoss skip gates
    # their acceptance while upsampling either type (reference skips such
    # routes with p=0.99; here p=1.0 so the effect is deterministic)
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i in range(2):
        _route_xml(os.path.join(src, f"c{i}.xml"),
                   [("Town12", [(0, 0, 0), (200, 0, 0)],
                     [("ControlLoss", (50, 0, 0), {}),
                      ("Accident", (150, 0, 0), {"distance": 100})])])
    out = str(tmp_path / "out")
    report = rt.balance_scenarios(src, out, num_samples=6,
                                  routes_per_file=2, seed=6,
                                  downsample_keep=0.0, max_tries_factor=50)
    assert report["after"].get("ControlLoss", 0) == 0
    assert report["after"].get("Accident", 0) == 0


def test_random_weather_within_ranges():
    rng = random.Random(0)
    for easy in (False, True):
        begin, end = rt.random_weather(rng, easy)
        ranges = rt.WEATHER_RANGES_EASY if easy else rt.WEATHER_RANGES_FULL
        assert begin[0] == 0.0 and end[0] == 100.0
        for name, b, e in zip(rt.WEATHER_PARAMS[1:], begin[1:], end[1:]):
            assert b in ranges[name] and e in ranges[name]
