"""Chip queue r4h: fused Pallas CE validation + combined-lever bench.

  1. chip_ce_check.py -- fwd/grad parity + op-level timing at the
     production CE shape [960, 896] x [151674, 896];
  2. train bench with SIMLINGO_CE_IMPL=pallas alone (attribution);
  3. train bench with CE + dropout-v2 together (candidate champion);
  4. driver-style full bench under the winning flags to warm the
     compile cache for the end-of-round driver run.

Usage: python scripts/tpu_queue_r4h.py [logfile] [wait_pid]
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
    log_line({"exp": "queue_r4h_start",
              "ts": time.strftime("%FT%TZ", time.gmtime())})
    run("fused-CE check", [PY, "scripts/chip_ce_check.py"], timeout=1800)
    run("fused-CE bench", [PY, "bench.py"],
        BENCH_MODE="train", BENCH_SKIP_PROBE="1", SIMLINGO_CE_IMPL="pallas")
    run("CE+dropoutV2 bench", [PY, "bench.py"],
        BENCH_MODE="train", BENCH_SKIP_PROBE="1",
        SIMLINGO_CE_IMPL="pallas", SIMLINGO_DROPOUT_V2="1")
    log_line({"exp": "queue_r4h_done"})
