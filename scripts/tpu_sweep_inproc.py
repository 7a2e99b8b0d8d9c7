"""Round-3 TPU experiment queue, in ONE process.

The per-config subprocess form (tpu_experiments_r3.sh) pays ~60-90 s of
tunnel/device init per entry -- on a slow tunnel day that alone blows the
per-run timeout before the first compile finishes. Running every config
inside one process pays init once; compiles are carried across entries by
the persistent JAX_COMPILATION_CACHE_DIR (each bench.main() call builds
fresh closures, so the in-memory pjit cache is NOT reused).

Results append to the log as JSON lines the moment each entry finishes, so
a mid-sweep kill still leaves everything measured so far on disk.

Usage: timeout 3300 python scripts/tpu_sweep_inproc.py [/tmp/tpu_r3_sweep.log]
"""

import contextlib
import io
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_r3_sweep.log"

# Persistent compile cache: later entries (and the driver's own bench.py run)
# reuse compiles from this sweep.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import bench  # noqa: E402  (repo root on sys.path)

BENCH_ENVS = ["BENCH_BATCH", "BENCH_REMAT", "BENCH_INT8_BASE", "BENCH_DATA",
              "SIMLINGO_LN_IMPL", "BENCH_QUANT", "BENCH_INT8",
              "BENCH_MAX_NEW_TOKENS", "BENCH_COT_P95_TOKENS"]


def log_line(obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def run(desc, fn, **env):
    for k in BENCH_ENVS:
        os.environ.pop(k, None)
    for k, v in env.items():
        os.environ[k] = str(v)
    t0 = time.time()
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            fn()
        for line in buf.getvalue().splitlines():
            if line.startswith("{"):
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue  # stray '{'-prefixed log line, not a result
                rec["exp"] = desc
                rec["wall_s"] = round(time.time() - t0, 1)
                log_line(rec)
    except Exception as e:  # noqa: BLE001 -- sweep must survive one bad entry
        sys.stdout.write(buf.getvalue())
        traceback.print_exc()
        log_line({"exp": desc, "error": f"{type(e).__name__}: {e}",
                  "wall_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    log_line({"exp": "sweep_start", "ts": time.strftime("%FT%TZ", time.gmtime())})
    # Probe once before the queue: on a wedged tunnel bench.main would hang
    # until the external timeout kills the sweep with nothing logged.
    probe_error = bench._device_reachable()
    if probe_error:
        log_line({"exp": "sweep_abort", "error": probe_error})
        sys.exit(1)
    # priority order: most valuable first; a mid-sweep timeout still leaves
    # the headline entries measured
    run("baseline batch6", bench.main)
    run("batch8", bench.main, BENCH_BATCH=8)
    run("int8-base batch6", bench.main, BENCH_INT8_BASE=1)
    run("latency int8 p50/p95", bench.latency_bench)
    run("batch10", bench.main, BENCH_BATCH=10)
    run("int8-base batch8", bench.main, BENCH_INT8_BASE=1, BENCH_BATCH=8)
    run("pallas-LN batch6", bench.main, SIMLINGO_LN_IMPL="pallas")
    run("latency int4", bench.latency_bench, BENCH_QUANT="int4")
    run("batch10 remat-vision", bench.main, BENCH_BATCH=10, BENCH_REMAT="vision")
    run("batch12 remat-vision", bench.main, BENCH_BATCH=12, BENCH_REMAT="vision")
    run("disk-data batch6", bench.main, BENCH_DATA="disk")
    log_line({"exp": "sweep_done"})
