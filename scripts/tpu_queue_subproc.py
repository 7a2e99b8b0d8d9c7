"""Round-4 chip queue, subprocess-per-entry.

The axon tunnel is effectively single-client: a parent that has ever
initialized a jax device context blocks its own health probes and any
subprocess entries (observed 2026-08-19: an in-proc bench entry left the
parent holding a context, and every later probe/subprocess hung). This
runner therefore NEVER imports jax in the parent -- every entry, and every
health probe, runs in its own subprocess; probe-waits between entries ride
out the transient post-process tunnel wedge (docs/KNOWN_ISSUES.md).

Entries (priority order; each logged as JSON lines the moment it ends):
  1. pallas-LN throughput bench (rank-2 stat-layout fix)
  2. int4 microbench variants (evenodd / dense vs bf16 / int8 / grouped)
  3. driver-style full bench (latency incl. spec p50+p95, then throughput)
  4. xplane trace of the champion step (fresh op attribution)
  5. spec_k=16 latency probe

Usage: python scripts/tpu_queue_subproc.py [logfile]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_queue_subproc.log"
PY = sys.executable
ENV_BASE = dict(os.environ,
                JAX_COMPILATION_CACHE_DIR="/tmp/jax_compile_cache")


def log_line(obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def probe_ok(timeout_s=90.0) -> bool:
    code = ("import jax, jax.numpy as jnp;"
            "x = jnp.ones((128, 128), jnp.bfloat16);"
            "print(float((x @ x).sum()))")
    try:
        r = subprocess.run([PY, "-c", code], timeout=timeout_s,
                           capture_output=True, env=ENV_BASE)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_healthy(tag: str, attempts: int = 12, sleep_s: int = 300) -> bool:
    for i in range(attempts):
        if probe_ok():
            if i:
                log_line({"exp": f"probe {tag}", "recovered_after": i})
            return True
        time.sleep(sleep_s)
    log_line({"exp": f"probe {tag}", "error": "gave_up_wedged"})
    return False


def run(tag: str, cmd, timeout=3600, **env):
    wait_healthy(tag)
    t0 = time.time()
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=timeout,
                           cwd=REPO, env=dict(ENV_BASE, **env))
    except subprocess.TimeoutExpired:
        log_line({"exp": tag, "error": f"timeout after {timeout}s"})
        return
    out = r.stdout.decode(errors="replace")
    got_json = False
    for line in out.splitlines():
        if line.startswith("{"):
            try:
                log_line(dict(json.loads(line), exp=tag,
                              wall_s=round(time.time() - t0, 1)))
                got_json = True
            except ValueError:
                pass
    if not got_json or r.returncode:
        log_line({"exp": tag, "rc": r.returncode,
                  "wall_s": round(time.time() - t0, 1),
                  "tail": out.strip()[-1500:],
                  "err": r.stderr.decode(errors="replace").strip()[-1500:]
                  if r.returncode else ""})


if __name__ == "__main__":
    log_line({"exp": "queue_start",
              "ts": time.strftime("%FT%TZ", time.gmtime())})
    run("pallas-LN batch6 (rank2 stats)", [PY, "bench.py"],
        SIMLINGO_LN_IMPL="pallas", BENCH_MODE="train", BENCH_SKIP_PROBE="1")
    run("mb_int4", [PY, "scripts/mb_int4.py",
                    "bf16", "int8", "evenodd", "dense", "grouped"],
        timeout=1800)
    run("full bench", [PY, "bench.py"])
    run("xplane trace", [PY, "scripts/capture_trace.py"])
    run("latency spec_k16", [PY, "bench.py"],
        BENCH_MODE="latency", BENCH_SPEC_K="16", BENCH_SKIP_PROBE="1")
    log_line({"exp": "queue_done"})
