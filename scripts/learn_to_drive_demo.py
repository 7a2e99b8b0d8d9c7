#!/usr/bin/env python
"""End-to-end learning demo: the framework teaches a model to drive,
entirely in-repo, on CPU, in ~15 minutes.

    collect (privileged expert in the microsim, pose-augmented cameras)
      -> label quality gate -> train (tiny SimLingo VLA, real trainer)
      -> closed-loop evaluation of the trained agent -> driving score

Measured (2026-08-18, CPU):
  untrained                         RC=0.6%   (timed out)
  2500 steps, NO shift augmentation RC=19.5%  (deviated -- classic
                                     open/closed-loop distribution shift)
  2500 steps, WITH the shift-augmented second camera
                                    RC=100.0  DS=100.0 on both eval routes

The augmented-camera recovery data is what closes the loop -- the same
finding the reference bakes into its data collection
(team_code/data_agent.py camera-pose augmentation, :389-402).

    python scripts/learn_to_drive_demo.py [--workdir /tmp/learn2drive]
        [--steps 2500] [--routes 6]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def collect(workdir: str, n_routes: int) -> None:
    from simlingo_tpu.sim.runner import expert_factory, run_routes

    save_root = os.path.join(workdir, "data", "simlingo", "v1", "b0",
                             "routes_training")
    base_specs = [
        {"town": "straight", "start_s": 5.0, "end_s": 200.0},
        {"town": "straight", "start_s": 5.0, "end_s": 200.0,
         "npcs": [{"at_s": 40.0, "lane": 0, "speed": 5.0}]},
        {"town": "straight", "start_s": 5.0, "end_s": 200.0,
         "npcs": [{"at_s": 50.0, "lane": 0, "speed": 3.0}]},
        {"town": "curved", "start_s": 5.0, "end_s": 200.0},
        {"town": "straight", "start_s": 5.0, "end_s": 200.0,
         "scenarios": [{"type": "DynamicObjectCrossing", "at_s": 100.0}]},
        {"town": "crossing", "start_s": 5.0, "end_s": 280.0},
    ]
    for i in range(n_routes):
        spec = dict(base_specs[i % len(base_specs)])
        spec["route_id"] = f"Town12_L{i:02}"
        factory = expert_factory(save_root=save_root,
                                 dir_name_fmt=f"Town12_L{i:02}")
        recs = run_routes([spec], factory,
                          seed=i)["_checkpoint"]["records"]
        print(f"  {spec['route_id']}: {recs[0]['status']}")


def label(workdir: str) -> None:
    import glob

    from simlingo_tpu.labels import commentary, dreamer_gen, vqa

    routes = sorted(glob.glob(os.path.join(
        workdir, "data", "simlingo", "v1", "b0", "routes_training",
        "Town12_*")))
    for rd in routes:
        commentary.generate_route_commentary(rd)
        vqa.generate_route_vqa(rd)
        dreamer_gen.generate_route_dreamer(rd)


def tiny_cfg(workdir: str, steps: int):
    from simlingo_tpu.core.config import compose
    from simlingo_tpu.data.tokenizer import SimLingoTokenizer
    from simlingo_tpu.models.qwen2 import Qwen2Config
    from simlingo_tpu.models.simlingo import SimLingoConfig
    from simlingo_tpu.models.vit import ViTConfig

    tok = SimLingoTokenizer()
    cfg = compose(overrides=[
        f"max_steps={steps}", "name=learn2drive",
        "log_every_n_steps=500", "checkpoint_every_n_steps=100000",
        "precision=f32",
    ])
    object.__setattr__(cfg, "model", SimLingoConfig(
        vit=ViTConfig(hidden_size=32, num_layers=1, num_heads=2,
                      intermediate_size=64, image_size=56, patch_size=14,
                      projector_out=32),
        llm=Qwen2Config(vocab_size=tok.tk.vocab_size + 8, hidden_size=32,
                        num_layers=1, num_heads=2, num_kv_heads=1,
                        head_dim=16, intermediate_size=64),
        img_context_token_id=tok.img_context_id,
        remat_vision=False, remat_llm=False, max_answer_len=64))
    object.__setattr__(cfg, "output_dir", os.path.join(workdir, "runs"))
    object.__setattr__(cfg, "optimizer", dataclasses.replace(
        cfg.optimizer, lr=2e-4, total_steps=steps))
    object.__setattr__(cfg.data, "data_root", workdir)
    object.__setattr__(cfg.data, "batch_size", 4)
    object.__setattr__(cfg.data, "num_workers", 2)
    object.__setattr__(cfg.data, "max_text_len", 768)
    object.__setattr__(cfg.data, "use_dreamer", True)
    base = dataclasses.replace(
        cfg.data.base, data_root=workdir, use_town13=False,
        route_as="target_point", image_size=56, max_num_grid=2,
        use_commentary=True, use_qa=True, commentary_augmentation=False,
        qa_augmentation=False,
        img_shift_augmentation=True)   # <- what makes closed-loop work
    object.__setattr__(cfg.data, "base", base)
    return cfg, tok


EVAL_SPECS = [
    {"town": "straight", "start_s": 5.0, "end_s": 160.0,
     "route_id": "eval_straight"},
    {"town": "straight", "start_s": 5.0, "end_s": 160.0,
     "route_id": "eval_lead",
     "npcs": [{"at_s": 40.0, "lane": 0, "speed": 4.0}]},
]


def evaluate(params, model_cfg, tok, tag: str) -> dict:
    import jax
    import jax.numpy as jnp

    from simlingo_tpu.agent.agent import LingoAgent
    from simlingo_tpu.agent.config import AgentConfig
    from simlingo_tpu.sim.runner import model_factory, run_route

    agent = LingoAgent(jax.device_get(params), model_cfg,
                       AgentConfig(use_cot=False, initial_frames_delay=0),
                       tokenizer=tok, max_prompt_len=256,
                       compute_dtype=jnp.float32)
    out = {}
    for spec in EVAL_SPECS:
        rec = run_route(spec, model_factory(agent), max_steps=2400)
        out[spec["route_id"]] = {
            "RC": round(rec["scores"]["score_route"], 1),
            "DS": round(rec["scores"]["score_composed"], 1),
            "status": rec["status"]}
    print(tag, json.dumps(out))
    return out


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    from simlingo_tpu.models import simlingo
    from simlingo_tpu.train import trainer

    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/learn2drive")
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--routes", type=int, default=6)
    ap.add_argument("--skip-untrained", action="store_true")
    args = ap.parse_args()

    print("[1/5] collecting expert routes in the microsim ...")
    collect(args.workdir, args.routes)
    print("[2/5] generating commentary/VQA/dreamer labels ...")
    label(args.workdir)
    cfg, tok = tiny_cfg(args.workdir, args.steps)
    if not args.skip_untrained:
        print("[3/5] untrained closed-loop baseline ...")
        params0 = simlingo.init_params(jax.random.PRNGKey(0), cfg.model)
        evaluate(params0, cfg.model, tok, "  untrained:")
    print(f"[4/5] training {args.steps} steps ...")
    t0 = time.time()
    result = trainer.train(cfg)
    print(f"  done in {time.time() - t0:.0f}s, "
          f"loss={float(result['metrics']['loss']):.3f}")
    print("[5/5] closed-loop evaluation of the trained agent ...")
    evaluate(result["state"]["params"], cfg.model, tok, "  trained:")


if __name__ == "__main__":
    main()
