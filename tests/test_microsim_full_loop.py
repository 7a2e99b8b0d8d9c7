"""The complete in-repo loop on framework-collected data:

    microsim expert collection -> label generation (commentary/VQA/dreamer)
    -> dataset index + quality gate -> training (tiny model, real trainer)
    -> closed-loop evaluation of the trained agent in the microsim.

This is the end-to-end story the reference spreads across CARLA + SLURM
(SURVEY.md L0-L8), executed entirely by this framework with no external
simulator. Everything tiny, CPU backend.
"""

import dataclasses
import glob
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def collected_root(tmp_path_factory):
    """Collect two short routes with the expert in the microsim."""
    from simlingo_tpu.sim.runner import expert_factory, run_routes

    root = str(tmp_path_factory.mktemp("micro_e2e"))
    save_root = os.path.join(root, "data", "simlingo", "v1", "b0",
                             "routes_training")
    specs = [
        {"town": "straight", "start_s": 5.0, "end_s": 120.0,
         "route_id": "Town12_micro_000",
         "scenarios": [{"type": "ParkedObstacle", "at_s": 70.0}]},
        {"town": "straight", "start_s": 5.0, "end_s": 120.0,
         "route_id": "Town12_micro_001",
         "npcs": [{"at_s": 35.0, "lane": 0, "speed": 5.0}]},
    ]
    checkpoint = run_routes(
        specs, expert_factory(save_root=save_root,
                              dir_name_fmt="Town12_micro_{i:03}"))
    for rec in checkpoint["_checkpoint"]["records"]:
        assert rec["status"] in ("Completed", "Perfect"), rec
    return root


def test_collected_routes_pass_quality_gate(collected_root):
    from simlingo_tpu.data.index import build_index

    route_dirs = sorted(glob.glob(os.path.join(
        collected_root, "data", "simlingo", "v1", "b0",
        "routes_training", "*")))
    assert len(route_dirs) == 2
    idx = build_index(collected_root, split="train", use_town13=False)
    assert len(idx) > 10
    dirs = {idx.route_dir(i) for i in range(len(idx))}
    assert len(dirs) == 2, "both collected routes must pass the gate"


def test_labels_generate_on_collected_data(collected_root):
    from simlingo_tpu.labels import commentary, dreamer_gen, vqa

    route_dirs = sorted(glob.glob(os.path.join(
        collected_root, "data", "simlingo", "v1", "b0",
        "routes_training", "*")))
    for rd in route_dirs:
        n_c = commentary.generate_route_commentary(rd)
        n_v = vqa.generate_route_vqa(rd)
        n_d = dreamer_gen.generate_route_dreamer(rd)
        assert os.path.isdir(os.path.join(rd, "commentary"))
        assert os.path.isdir(os.path.join(rd, "vqa"))
    # at least the first route must yield labels in every modality
    rd = route_dirs[0]
    import gzip
    import json
    vqa_files = sorted(glob.glob(os.path.join(rd, "vqa", "*.json.gz")))
    assert vqa_files
    with gzip.open(vqa_files[0], "rt") as f:
        record = json.load(f)
    qas = record["QA"] if isinstance(record, dict) and "QA" in record \
        else record
    assert len(qas) >= 3


def test_train_and_closed_loop_eval_on_collected_data(collected_root,
                                                      tmp_path):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from simlingo_tpu.agent.agent import LingoAgent
    from simlingo_tpu.agent.config import AgentConfig
    from simlingo_tpu.sim.runner import model_factory, run_route
    from simlingo_tpu.train import trainer
    from tests.test_full_pipeline import _tiny_train_cfg

    cfg, tok = _tiny_train_cfg(collected_root, str(tmp_path / "out"))
    object.__setattr__(cfg, "max_steps", 2)
    result = trainer.train(cfg)
    assert np.isfinite(result["metrics"]["loss"])

    params = jax.device_get(result["state"]["params"])
    acfg = AgentConfig(use_cot=False, initial_frames_delay=0)
    agent = LingoAgent(params, cfg.model, acfg, tokenizer=tok,
                       max_prompt_len=256, compute_dtype=jnp.float32)
    spec = {"town": "straight", "start_s": 5.0, "end_s": 100.0,
            "route_id": "eval_trained"}
    rec = run_route(spec, model_factory(agent), max_steps=6)
    assert rec["scores"]["score_route"] >= 0.0
    assert np.isfinite(rec["scores"]["score_composed"])
