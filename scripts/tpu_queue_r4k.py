"""Chip queue r4k: recover the entries lost to round-4 on-chip findings.

  1. chip_ce_check (fixed: weights as jit args -- the closure form embeds
     a ~272 MB HLO constant and the remote-compile endpoint 413s);
  2. dropout-v2-only champion bench (the r4g entry that died first on the
     Mosaic seed arity, then on the scoped-VMEM limit);
  3. xplane trace under the combined levers (fresh op attribution).

Usage: python scripts/tpu_queue_r4k.py [logfile] [wait_pid]
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
    log_line({"exp": "queue_r4k_start",
              "ts": time.strftime("%FT%TZ", time.gmtime())})
    run("fused-CE check (jit-args fix)", [PY, "scripts/chip_ce_check.py"],
        timeout=1800)
    run("dropout-v2-only bench", [PY, "bench.py"],
        BENCH_MODE="train", BENCH_SKIP_PROBE="1", SIMLINGO_DROPOUT_V2="1")
    run("trace CE+V2", [PY, "scripts/capture_trace.py",
                        "/tmp/xplane_trace_cev2"],
        timeout=1800, SIMLINGO_CE_IMPL="pallas", SIMLINGO_DROPOUT_V2="1")
    log_line({"exp": "queue_r4k_done"})
