"""Chip queue r4f: retries + LN diagnostics, run after the b8 queue drains.

  1. mb_int4 evenodd/dense variants (previous run died on a sys.path bug);
  2. mb_ln -- op-level XLA vs Pallas LayerNorm/RMSNorm at the model's
     production shapes, fwd and fwd+bwd (prices the fusion the Pallas
     call boundary gives up);
  3. pallas-LN train bench at batch6 + remat=mlp (the plain batch6 cell
     OOMs: the custom-VJP pins x residuals that XLA's remat would have
     recomputed -- the surgical GELU remat frees more than that);
  4. driver-style full bench (warms the compile cache for the
     end-of-round driver run and records the champion numbers).

Usage: python scripts/tpu_queue_r4f.py [logfile] [wait_pid]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.tpu_queue_subproc import PY, log_line, run  # noqa: E402


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
    log_line({"exp": "queue_r4f_start",
              "ts": time.strftime("%FT%TZ", time.gmtime())})
    run("mb_int4", [PY, "scripts/mb_int4.py",
                    "bf16", "int8", "evenodd", "dense", "grouped"],
        timeout=1800)
    run("mb_ln", [PY, "scripts/mb_ln.py", "ln", "rms"], timeout=1800)
    run("pallas-LN b6 remat-mlp", [PY, "bench.py"],
        BENCH_MODE="train", BENCH_SKIP_PROBE="1",
        BENCH_REMAT="mlp", SIMLINGO_LN_IMPL="pallas")
    run("full bench (driver-style)", [PY, "bench.py"], timeout=5400)
    log_line({"exp": "queue_r4f_done"})
