"""Round-4 chip queue, part 3: the cells that remained after the batch/remat
sweep confirmed the batch-6 envelope (docs/BENCH_NOTES.md round 4).

  * pallas-LN batch6 -- the one untried throughput lever (two Mosaic
    lowering bugs fixed this round: 128-multiple rank-1 stat blocks,
    rank-3 dgamma/dbeta partials);
  * int4 decode-matmul layout microbench (bf16/int8/grouped/evenodd/dense)
    -- diagnoses the 15.7 ms/token w4a16 pathology;
  * a fresh driver-style full bench (latency subprocess + train) so the
    compile cache is warm for the end-of-round driver run.

Usage: timeout 10800 python scripts/tpu_queue_r4c.py [/tmp/tpu_r4c_queue.log]
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import bench  # noqa: E402
import scripts.tpu_sweep_inproc as sw  # noqa: E402
from scripts.tpu_sweep_inproc import log_line, run  # noqa: E402

def wait_healthy(tag: str, attempts: int = 24, sleep_s: int = 300) -> bool:
    """The axon tunnel often wedges for 10-60 min after ANY process that
    held a device context exits (docs/KNOWN_ISSUES.md) -- including our own
    previous queue step. Probe-wait between steps instead of aborting."""
    for i in range(attempts):
        err = bench._device_reachable()
        if not err:
            if i:
                log_line({"exp": f"probe {tag}", "recovered_after": i})
            return True
        time.sleep(sleep_s)
    log_line({"exp": f"probe {tag}", "error": "gave_up_wedged"})
    return False


if __name__ == "__main__":
    sw.LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_r4c_queue.log"
    log_line({"exp": "queue_r4c_start",
              "ts": time.strftime("%FT%TZ", time.gmtime())})
    if not wait_healthy("start"):
        sys.exit(1)
    run("pallas-LN batch6", bench.main, SIMLINGO_LN_IMPL="pallas")
    # microbench runs in a subprocess (separate device context)
    wait_healthy("mb_int4")
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "scripts/mb_int4.py",
         "bf16", "int8", "evenodd", "dense", "grouped"],
        capture_output=True, timeout=1800, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    log_line({"exp": "mb_int4", "wall_s": round(time.time() - t0, 1),
              "out": r.stdout.decode(errors="replace").strip(),
              "err": r.stderr.decode(errors="replace").strip()[-400:]
              if r.returncode else ""})
    # driver-style full bench (warms every compile the driver will need)
    wait_healthy("full bench")
    t0 = time.time()
    r = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                       timeout=3600, cwd=os.path.dirname(
                           os.path.dirname(os.path.abspath(__file__))))
    for line in r.stdout.decode(errors="replace").splitlines():
        if line.startswith("{"):
            try:
                d = json.loads(line)
            except ValueError:
                continue
            log_line(dict(d, exp="full bench",
                          wall_s=round(time.time() - t0, 1)))
    log_line({"exp": "queue_r4c_done"})
