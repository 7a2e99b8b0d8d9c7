"""Chip queue: large-batch benches with the surgical "mlp" remat mode.

The round-4 sweep showed batch 8 OOMs by only 544 MB with no remat, and
full-tower remat loses more than the batch gains. remat=mlp (recompute
only the ViT MLP GELU in the backward, models/vit.py) frees ~3 GB of
residuals at batch 8 for ~zero recompute -- these entries measure whether
that unlocks a better throughput point than the batch-6 champion.

Usage: python scripts/tpu_queue_b8.py [logfile] [wait_pid]
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
    log_line({"exp": "queue_b8_start",
              "ts": time.strftime("%FT%TZ", time.gmtime())})
    for batch in ("8", "10", "6"):
        run(f"batch{batch} remat-mlp", [PY, "bench.py"],
            BENCH_MODE="train", BENCH_SKIP_PROBE="1",
            BENCH_BATCH=batch, BENCH_REMAT="mlp")
    log_line({"exp": "queue_b8_done"})
