#!/usr/bin/env python
"""Tracked closed-loop model-agent benchmark + int8 serving validation.

VERDICT-r4 items 5 and 9 in one command:

  collect (microsim expert) -> label -> train a tiny SimLingo VLA
  -> run the TRAINED agent through the MicroBench suite (bf16 weights)
  -> re-run with int8 LLM weights (the serving default, agent/config.py)
  -> report DS/SR per precision + int8-vs-bf16 token/waypoint drift.

The expert scores DS=100 on this suite (docs/BENCH_NOTES.md); the model
number is the closed-loop quality trend line tracked per round. The int8
rows validate the `int8_llm=True` serving default on a checkpoint that
actually learned something (synthetic-TRAINED weights — the best
available signal while the real `RenzKa/simlingo` weights are
unreachable; BASELINE.md "attempt log").

    python scripts/microbench_model.py [--workdir /tmp/microbench_model]
        [--steps 2500] [--routes-filter ...] [--out microbench_model.json]

Prints one JSON line per configuration; writes the full report to --out.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def train_tiny(workdir: str, steps: int, n_routes: int):
    """Collect + label + train (reuses the learn-to-drive recipe)."""
    from scripts.learn_to_drive_demo import collect, label, tiny_cfg
    from simlingo_tpu.train import trainer

    marker = os.path.join(workdir, ".collected")
    if not os.path.exists(marker):
        print(f"[collect] {n_routes} expert routes ...", flush=True)
        collect(workdir, n_routes)
        print("[label] commentary/VQA/dreamer ...", flush=True)
        label(workdir)
        open(marker, "w").close()
    cfg, tok = tiny_cfg(workdir, steps)
    ckpt_file = os.path.join(workdir, f"params_{steps}.msgpack")
    import jax
    if os.path.exists(ckpt_file):
        import pickle
        with open(ckpt_file, "rb") as f:
            params = pickle.load(f)
        print(f"[train] reusing cached params ({ckpt_file})", flush=True)
    else:
        print(f"[train] {steps} steps ...", flush=True)
        t0 = time.time()
        result = trainer.train(cfg)
        params = jax.device_get(result["state"]["params"])
        print(f"[train] done in {time.time() - t0:.0f}s "
              f"loss={float(result['metrics']['loss']):.3f}", flush=True)
        import pickle
        with open(ckpt_file, "wb") as f:
            pickle.dump(params, f)
    return params, cfg, tok


def run_suite(agent, specs, tag: str, max_steps=None):
    from simlingo_tpu.eval.driving_score import merge_route_results
    from simlingo_tpu.sim.runner import model_factory, run_routes

    t0 = time.time()
    checkpoint = run_routes(specs, model_factory(agent),
                            max_steps=max_steps)
    records = checkpoint["_checkpoint"]["records"]
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(checkpoint, f)
        path = f.name
    merged = merge_route_results([path])
    os.unlink(path)
    line = {
        "metric": f"microbench_model_{tag}",
        "driving_score": round(merged["driving_score"], 2),
        "success_rate": round(merged["success_rate"], 2),
        "num_routes": merged["num_routes"],
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(line), flush=True)
    return line, records


def one_frame_drift(agent_bf16, agent_int8) -> dict:
    """Token/waypoint diff on one deterministic frame (VERDICT item 5:
    'a recorded quality number next to the latency number')."""
    import numpy as np

    from scripts.checkpoint_parity import build_frame

    out_a = agent_bf16.run_step(build_frame())
    out_b = agent_int8.run_step(build_frame())
    tok_a = list(out_a.get("language_tokens") or [])
    tok_b = list(out_b.get("language_tokens") or [])
    agree = sum(x == y for x, y in zip(tok_a, tok_b))
    route_d = float(np.max(np.abs(np.asarray(out_a["route"])
                                  - np.asarray(out_b["route"]))))
    speed_d = float(np.max(np.abs(np.asarray(out_a["speed_wps"])
                                  - np.asarray(out_b["speed_wps"]))))
    return {
        "tokens_compared": min(len(tok_a), len(tok_b)),
        "token_agreement": round(agree / max(min(len(tok_a),
                                                 len(tok_b)), 1), 4),
        "len_a": len(tok_a), "len_b": len(tok_b),
        "route_max_drift_m": round(route_d, 4),
        "speed_wps_max_drift_m": round(speed_d, 4),
    }


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from simlingo_tpu.agent.agent import LingoAgent
    from simlingo_tpu.agent.config import AgentConfig
    from simlingo_tpu.sim.suite import MICROBENCH

    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/microbench_model")
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--collect-routes", type=int, default=6)
    ap.add_argument("--routes-filter", default=None,
                    help="comma-separated substring filter on route_id")
    ap.add_argument("--max-steps", type=int, default=2400)
    ap.add_argument("--out", default="microbench_model.json")
    ap.add_argument("--skip-int8", action="store_true")
    args = ap.parse_args()

    params, cfg, tok = train_tiny(args.workdir, args.steps,
                                  args.collect_routes)

    specs = MICROBENCH
    if args.routes_filter:
        wanted = args.routes_filter.split(",")
        specs = [s for s in specs
                 if any(w in s["route_id"] for w in wanted)]
    print(f"[suite] {len(specs)} routes", flush=True)

    def make_agent(int8: bool, cot: bool = False):
        return LingoAgent(
            params, cfg.model,
            AgentConfig(use_cot=cot, initial_frames_delay=0,
                        int8_llm=int8, jpeg_roundtrip=False,
                        max_new_tokens=48),
            tokenizer=tok, max_prompt_len=256,
            compute_dtype=jnp.float32)

    report = {"steps": args.steps, "suite_routes": len(specs)}
    report["bf16"], _ = run_suite(make_agent(False), specs, "bf16",
                                  max_steps=args.max_steps)
    if not args.skip_int8:
        report["int8"], _ = run_suite(make_agent(True), specs, "int8",
                                      max_steps=args.max_steps)
        drift = one_frame_drift(make_agent(False, cot=True),
                                make_agent(True, cot=True))
        drift["metric"] = "int8_vs_bf16_drift"
        print(json.dumps(drift), flush=True)
        report["int8_drift"] = drift
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
