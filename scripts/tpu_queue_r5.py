"""Chip queue r5: the round-5 levers, run after the r4l recovery queue.

Order (most decision-relevant first, in case the tunnel wedges):

  1. attention-backward block sweep (scripts/attn_bwd_sweep.py) at both
     production shapes — VERDICT-r4 item 2 (the pair costs 99 ms of the
     400 ms step). The best ViT/LLM cells are selected from the sweep's
     own JSON lines.
  2. full train bench under the winning bwd-block env (only when a swept
     cell beats its default by >3% — standalone microbenches do not
     always transfer, docs/KNOWN_ISSUES.md round-2 note, so the step
     bench is the arbiter).
  3. fused-LoRA bench (SIMLINGO_LORA_FUSED=1, commit 6b8b730): one
     concatenated-A matmul + block-diagonal-B per q/k/v and gate/up
     group instead of 2n rank-32 slivers.
  4. LoRA-fused + dropout-v2 combination (the two levers touch the same
     dropout sites).

Usage: python scripts/tpu_queue_r5.py [logfile] [wait_pid]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.tpu_queue_subproc import PY, log_line, run  # noqa: E402
from scripts.tpu_queue_r4l import run_capture  # noqa: E402


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


if __name__ == "__main__":
    if len(sys.argv) > 2:
        prev = int(sys.argv[2])
        while _pid_alive(prev):
            time.sleep(60)
        log_line({"exp": "prev_queue_done", "pid": prev})
    log_line({"exp": "queue_r5_start",
              "ts": time.strftime("%FT%TZ", time.gmtime())})
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/jax_compile_cache")

    # 1. attention-bwd sweep
    cells = run_capture("attn-bwd sweep",
                        [PY, "scripts/attn_bwd_sweep.py"], timeout=5400)
    best_env = {}
    for shape, envmap in (
            ("vit", {"bk": "SIMLINGO_ATTN_LM_BWD_BLOCK_K",
                     "bq": "SIMLINGO_ATTN_LM_BWD_BLOCK_Q"}),
            ("llm", {"bk": "SIMLINGO_ATTN_BWD_BLOCK_K"})):
        rows = [c for c in cells if c.get("shape") == shape
                and c.get("ms") is not None]
        if not rows:
            continue
        default = next((c for c in rows
                        if all(c.get(k) == "default" for k in envmap)), None)
        best = min(rows, key=lambda c: c["ms"])
        if default and best["ms"] < default["ms"] * 0.97:
            for field, env_name in envmap.items():
                if best.get(field, "default") != "default":
                    best_env[env_name] = best[field]
            log_line({"exp": "attn_bwd_winner", "shape": shape,
                      "default_ms": default["ms"], "best_ms": best["ms"],
                      "cell": {k: best.get(k) for k in envmap}})
        else:
            log_line({"exp": "attn_bwd_winner", "shape": shape,
                      "verdict": "default_holds",
                      "default_ms": default["ms"] if default else None,
                      "best_ms": best["ms"]})

    # 2. step bench under the winning blocks (the only number that counts)
    if best_env:
        run("bwd-block bench", [PY, "bench.py"],
            BENCH_MODE="train", BENCH_SKIP_PROBE="1", **best_env)

    # 3. fused-LoRA lever
    run("lora-fused bench", [PY, "bench.py"],
        BENCH_MODE="train", BENCH_SKIP_PROBE="1", SIMLINGO_LORA_FUSED="1")

    # 4. fused-LoRA + dropout-v2 (shared-mask path changes dropout count)
    run("lora-fused+V2 bench", [PY, "bench.py"],
        BENCH_MODE="train", BENCH_SKIP_PROBE="1",
        SIMLINGO_LORA_FUSED="1", SIMLINGO_DROPOUT_V2="1", **best_env)

    log_line({"exp": "queue_r5_done"})
