"""Chip queue r4i: re-run entries invalidated by the dropout seed-arity fix.

The first r4g entry (chip_dropout_check) failed Mosaic compilation:
tpu.prng_set_seed_32 accepts at most two values and the v2 kernel spread
one program_id per grid dim into the seed (commit 815234a fixes it by
folding the grid into one flat block id). Entries:

  1. chip_dropout_check.py -- on-chip kernel correctness at production
     shapes (the entry that failed);
  2. combined-lever train bench (CE=pallas + DROPOUT_V2=1), in case the
     r4h copy raced the fix;
  3. driver-style full bench under the winning flags (warms the compile
     cache for the end-of-round driver run).

Usage: python scripts/tpu_queue_r4i.py [logfile] [wait_pid]
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
    log_line({"exp": "queue_r4i_start",
              "ts": time.strftime("%FT%TZ", time.gmtime())})
    run("dropout-v2 check (fixed)", [PY, "scripts/chip_dropout_check.py"],
        timeout=1200)
    run("CE+dropoutV2 bench (fixed)", [PY, "bench.py"],
        BENCH_MODE="train", BENCH_SKIP_PROBE="1",
        SIMLINGO_CE_IMPL="pallas", SIMLINGO_DROPOUT_V2="1")
    run("full bench winning flags", [PY, "bench.py"],
        BENCH_SKIP_PROBE="1",
        SIMLINGO_CE_IMPL="pallas", SIMLINGO_DROPOUT_V2="1")
    log_line({"exp": "queue_r4i_done"})
