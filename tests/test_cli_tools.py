"""Smoke tests for the standalone-tool CLIs (counterparts of the
reference's dataset_generation/*.py and tools/*.py scripts)."""

import gzip
import json
import os

import numpy as np
import pytest


def _make_route(root, name, n_frames=3, failed=False):
    route = os.path.join(root, "data", "simlingo", "v1", "batch0",
                         "routes_training", name)
    os.makedirs(os.path.join(route, "measurements"), exist_ok=True)
    for i in range(n_frames):
        with gzip.open(os.path.join(route, "measurements", f"{i:04d}.json.gz"),
                       "wt") as f:
            json.dump({"pos_global": [float(i), 0.0], "theta": 0.0,
                       "speed": 1.0, "command": 4}, f)
    if not failed:
        with gzip.open(os.path.join(route, "results.json.gz"), "wt") as f:
            json.dump({"status": "Completed", "scores":
                       {"score_composed": 100.0}, "infractions": {}}, f)
    return route


def test_dataset_tools_cli(tmp_path, capsys):
    from simlingo_tpu.labels import dataset_tools

    root = str(tmp_path)
    _make_route(root, "Town12_Rep0_Accident_0")
    _make_route(root, "Town12_Rep0_Accident_1", failed=True)

    dataset_tools.main(["failed", root])
    out = capsys.readouterr().out
    assert "Accident_1" in out and "dry run" in out

    dataset_tools.main(["balance", root])
    out = capsys.readouterr().out
    assert "Accident" in out

    dataset_tools.main(["frames", root])
    out = capsys.readouterr().out
    assert "measurements" in out and "6" in out  # 3 frames x 2 routes

    dataset_tools.main(["failed", root, "--rename"])
    out = capsys.readouterr().out
    assert "1 routes quarantined" in out
    assert not os.path.exists(os.path.join(
        root, "data", "simlingo", "v1", "batch0", "routes_training",
        "Town12_Rep0_Accident_1"))
    dataset_tools.main(["failed", root, "--undo"])
    assert os.path.exists(os.path.join(
        root, "data", "simlingo", "v1", "batch0", "routes_training",
        "Town12_Rep0_Accident_1"))


def test_driving_score_cli(tmp_path, capsys):
    from simlingo_tpu.eval import driving_score

    rec = {"_checkpoint": {"records": [{
        "route_id": "RouteScenario_0", "town_name": "Town12",
        "status": "Completed",
        "scores": {"score_composed": 80.0, "score_route": 100.0,
                   "score_penalty": 0.8},
        "infractions": {"red_light": ["stopped at Frame: 10"]},
        "meta": {"route_length": 150.0, "duration_game": 20.0,
                 "duration_system": 30.0},
    }]}}
    p = tmp_path / "res.json"
    p.write_text(json.dumps(rec))
    csv_out = str(tmp_path / "routes.csv")
    parsed_out = str(tmp_path / "parsed.csv")
    merged = driving_score.main([str(p), "--csv", csv_out,
                                 "--parsed-csv", parsed_out])
    out = capsys.readouterr().out
    assert "driving_score" in out or "mean" in out or merged
    assert os.path.exists(csv_out) and os.path.exists(parsed_out)


def test_augment_templates_cli(tmp_path, capsys):
    from simlingo_tpu.labels import augment_templates

    tj = tmp_path / "templates.json"
    tj.write_text(json.dumps(["The ego vehicle slows down."]))
    augment_templates.main([str(tj), "--out", str(tmp_path / "aug"),
                            "--no-gpt"])
    out_path = capsys.readouterr().out.strip()
    data = json.load(open(out_path))
    assert "The ego vehicle slows down." in data
    assert isinstance(data["The ego vehicle slows down."], list)
