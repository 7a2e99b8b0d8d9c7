"""Chip queue r4j: the champion-candidate matrix on top of CE+dropoutV2.

Runs after r4i. The round-4 sweep left two untested cells that could beat
the batch-6 champion once the surgical remat=mlp mode (frees ~3 GB of ViT
GELU residuals at batch 8 for near-zero recompute) and the two new levers
(fused Pallas CE, native-rank dropout) exist:

  1. batch 8, remat=mlp, CE=pallas, V2 dropout  (b8 OOMed by 544 MB plain)
  2. batch 10, remat=mlp, CE=pallas, V2 dropout
  3. batch 6, remat=mlp, CE=pallas, V2 dropout  (does the remat cost at b6?)
  4. batch 6, LN=pallas + remat=mlp + CE + V2   (LN kernel needs the remat
     headroom: its custom VJP pins x residuals XLA would have rematted)

Usage: python scripts/tpu_queue_r4j.py [logfile] [wait_pid]
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
    log_line({"exp": "queue_r4j_start",
              "ts": time.strftime("%FT%TZ", time.gmtime())})
    LEVERS = dict(SIMLINGO_CE_IMPL="pallas", SIMLINGO_DROPOUT_V2="1")
    for batch in ("8", "10", "6"):
        run(f"batch{batch} remat-mlp CE+V2", [PY, "bench.py"],
            BENCH_MODE="train", BENCH_SKIP_PROBE="1",
            BENCH_BATCH=batch, BENCH_REMAT="mlp", **LEVERS)
    run("batch6 LN-pallas remat-mlp CE+V2", [PY, "bench.py"],
        BENCH_MODE="train", BENCH_SKIP_PROBE="1",
        BENCH_BATCH="6", BENCH_REMAT="mlp", SIMLINGO_LN_IMPL="pallas",
        **LEVERS)
    log_line({"exp": "queue_r4j_done"})
