"""One-command real-checkpoint parity harness.

Given a LOCAL HuggingFace snapshot directory (weights + tokenizer files),
this script converts the checkpoint, runs one deterministic frame through
the full closed-loop agent path (image tiling -> prompt -> cached prefill ->
greedy CoT generation -> waypoint decode -> PID), and diffs the generated
token ids, text and waypoints against a stored reference trace.

This is the output-fidelity check of BASELINE.md: when the real
`RenzKa/simlingo` weights and the Qwen2 151k-token tokenizer are available
(network exists), run

    # 1. capture the reference trace once (on the machine of record):
    python scripts/checkpoint_parity.py --snapshot /path/to/RenzKa_simlingo \
        --trace parity_trace.json --save-trace

    # 2. every subsequent build verifies against it:
    python scripts/checkpoint_parity.py --snapshot /path/to/RenzKa_simlingo \
        --trace parity_trace.json

Exit code 0 = parity (tokens exact, waypoints within --atol), 1 = mismatch.

Checkpoint layouts handled (core/checkpoint.load_hf_checkpoint): the raw
`OpenGVLab/InternVL2-1B` remote-code layout, the trained SimLingo
DrivingModel layout, and peft LoRA-carried trees (merged by default;
--keep-lora converts unmerged and runs with live adapters). The tokenizer is
loaded from the snapshot dir when it carries tokenizer files
(data/tokenizer.SimLingoTokenizer HF path), else the byte-fallback
tokenizer -- the trace records which, and diffing across tokenizers fails
loudly rather than comparing apples to oranges.

Offline CI exercises this script end-to-end against a synthesized
remote-code checkpoint at reduced geometry (tests/test_hf_checkpoint.py::
test_parity_harness_roundtrip); full 1B geometry is covered shape-wise by
test_full_1b_shapes_convert_and_forward.

Reference counterpart: the torch stack loads checkpoints through Lightning +
peft (simlingo_training/models/driving.py load paths); output fidelity there
is implicit in re-using the same torch modules. Here the weights cross a
framework boundary, so parity is an explicit, executable artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def build_frame(seed: int = 0, width: int = 1024, height: int = 512):
    """Deterministic synthetic camera frame + ego state: a structured
    gradient + boxes image (NOT random noise -- stable under JPEG)."""
    from simlingo_tpu.agent.agent import AgentFrame

    yy, xx = np.mgrid[0:height, 0:width]
    rgb = np.stack([
        (xx * 255 // width),
        (yy * 255 // height),
        ((xx + yy) * 255 // (width + height)),
    ], axis=-1).astype(np.uint8)
    rng = np.random.RandomState(seed)
    for _ in range(6):                       # a few "objects"
        x0, y0 = rng.randint(0, width - 160), rng.randint(0, height - 100)
        w, h = rng.randint(40, 160), rng.randint(30, 100)
        rgb[y0:y0 + h, x0:x0 + w] = rng.randint(0, 255, 3)
    return AgentFrame(rgb=rgb, speed=4.2,
                      target_point=np.array([12.0, 0.6]),
                      next_target_point=np.array([24.0, 1.5]),
                      compass=0.05, gps=np.array([0.0, 0.0]))


def run_one_frame(snapshot: str, keep_lora: bool, max_new_tokens: int,
                  compute_dtype: str = "float32", cfg=None,
                  max_prompt_len: int = 640):
    """`cfg=None` -> production InternVL2-1B geometry; tests inject a
    reduced-geometry config to exercise the identical code path offline."""
    import jax
    import jax.numpy as jnp

    from simlingo_tpu.agent.agent import LingoAgent
    from simlingo_tpu.agent.config import AgentConfig
    from simlingo_tpu.core import checkpoint as ckpt
    from simlingo_tpu.core.presets import internvl2_1b
    from simlingo_tpu.data.tokenizer import SimLingoTokenizer

    if cfg is None:
        cfg = internvl2_1b(lora=keep_lora)
    params = ckpt.load_hf_checkpoint(snapshot, cfg,
                                     lora_merge=not keep_lora)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    has_tok = any(os.path.exists(os.path.join(snapshot, f))
                  for f in ("tokenizer.json", "tokenizer_config.json",
                            "vocab.json"))
    tok = SimLingoTokenizer(snapshot if has_tok else None)

    agent = LingoAgent(
        params, cfg,
        AgentConfig(use_cot=True, initial_frames_delay=0, int8_llm=False,
                    jpeg_roundtrip=False,
                    max_new_tokens=max_new_tokens),
        tokenizer=tok, max_prompt_len=max_prompt_len,
        compute_dtype=getattr(jnp, compute_dtype))
    out = agent.run_step(build_frame())
    return {
        "tokenizer": "hf" if has_tok else "fallback",
        "compute_dtype": compute_dtype,
        "max_new_tokens": max_new_tokens,
        "language_tokens": out["language_tokens"],
        "language": out["language"],
        "route": np.asarray(out["route"]).tolist(),
        "speed_wps": np.asarray(out["speed_wps"]).tolist(),
        "control": [float(out["steer"]), float(out["throttle"]),
                    float(bool(out["brake"]))],
    }


def diff_traces(got: dict, ref: dict, atol: float) -> list:
    errors = []
    if got["tokenizer"] != ref["tokenizer"]:
        errors.append(f"tokenizer mismatch: ran with {got['tokenizer']!r}, "
                      f"trace captured with {ref['tokenizer']!r} -- not a "
                      f"comparable run")
        return errors
    if got["language_tokens"] != ref["language_tokens"]:
        errors.append(
            f"generated tokens diverge: got {got['language_tokens'][:16]}"
            f"... vs ref {ref['language_tokens'][:16]}...")
    if got["language"] != ref["language"]:
        errors.append(f"decoded text diverges:\n  got: {got['language']!r}"
                      f"\n  ref: {ref['language']!r}")
    for field in ("route", "speed_wps", "control"):
        g, r = np.asarray(got[field]), np.asarray(ref[field])
        if g.shape != r.shape:
            errors.append(f"{field} shape {g.shape} != {r.shape}")
        elif not np.allclose(g, r, atol=atol):
            errors.append(f"{field} max |diff| = "
                          f"{np.max(np.abs(g - r)):.6f} > atol {atol}")
    return errors


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--snapshot", required=True,
                    help="local HF snapshot dir (weights + tokenizer)")
    ap.add_argument("--trace", default="parity_trace.json")
    ap.add_argument("--save-trace", action="store_true",
                    help="write the trace instead of diffing")
    ap.add_argument("--keep-lora", action="store_true",
                    help="convert peft adapters unmerged and run them live")
    ap.add_argument("--max-new-tokens", type=int, default=64)
    ap.add_argument("--atol", type=float, default=1e-3,
                    help="waypoint tolerance (meters)")
    ap.add_argument("--compute-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args(argv)

    got = run_one_frame(args.snapshot, args.keep_lora, args.max_new_tokens,
                        args.compute_dtype)
    if args.save_trace:
        with open(args.trace, "w") as f:
            json.dump(got, f, indent=1)
        print(f"trace saved to {args.trace} "
              f"({len(got['language_tokens'])} tokens, "
              f"tokenizer={got['tokenizer']})")
        return 0

    with open(args.trace) as f:
        ref = json.load(f)
    errors = diff_traces(got, ref, args.atol)
    if errors:
        print("PARITY FAILED:")
        for e in errors:
            print(" *", e)
        return 1
    print(f"PARITY OK: {len(got['language_tokens'])} tokens exact, "
          f"waypoints within {args.atol}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
