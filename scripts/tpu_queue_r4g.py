"""Chip queue r4g: validate + measure the native-rank dropout kernel.

The round-4 trace attributed ~25 ms/step (~6%) to reshape/pad/slice ops
around the flatten-to-2D hw_dropout calls (~170 sites/step). The v2 path
(SIMLINGO_DROPOUT_V2=1) runs the kernel at the array's native rank with a
cdiv grid, eliminating those relayouts. Entries:

  1. chip_dropout_check.py -- kernel correctness at the production shape
     (boundary-masked blocks, fwd/bwd mask identity);
  2. champion train bench (batch6/no-remat/bf16) with V2=1;
  3. trace capture with V2=1 (op attribution for BENCH_NOTES).

Usage: python scripts/tpu_queue_r4g.py [logfile] [wait_pid]
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
    log_line({"exp": "queue_r4g_start",
              "ts": time.strftime("%FT%TZ", time.gmtime())})
    run("dropout-v2 check", [PY, "scripts/chip_dropout_check.py"],
        timeout=1200)
    run("dropout-v2 champion bench", [PY, "bench.py"],
        BENCH_MODE="train", BENCH_SKIP_PROBE="1", SIMLINGO_DROPOUT_V2="1")
    run("dropout-v2 trace", [PY, "scripts/capture_trace.py",
                             "/tmp/xplane_trace_v2"],
        timeout=1800, SIMLINGO_DROPOUT_V2="1")
    log_line({"exp": "queue_r4g_done"})
