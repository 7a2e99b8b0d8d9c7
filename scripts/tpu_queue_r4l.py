"""Chip queue r4l: master recovery queue for the round-4 tail.

The previous session ended while r4j/r4k were mid-flight (their
subprocesses die with the session), so this queue re-runs everything
still unmeasured, in value order — most decision-relevant first, because
the tunnel can wedge at any time:

  1. driver-style full bench rehearsal (latency + throughput) — runs
     FIRST because the end-of-round capture runs exactly this and the
     plain champion step has never compiled on-chip at the new 18 MiB
     scoped-VMEM default (raised in 7ff258c AFTER the 15.6 measurement)
  2. dropout-v2-only bench (champion candidate: kills the ~25 ms of
     relayout around the ~170 hw_dropout sites; seed-arity fixed 815234a,
     18 MiB scoped limit 7ff258c)
  3. scoped-VMEM probe for the CE+V2 combination (24/32 MiB limits, then
     kv-split fallback) — the winning env is applied to every later
     CE+V2 entry
  4. fused-CE gradient check (jit-args fix a268cec)
  5. r4j champion matrix: batch 8/10/6 remat=mlp CE+V2; batch 6
     LN=pallas remat=mlp CE+V2
  6. xplane trace under the best compiling lever set

Usage: python scripts/tpu_queue_r4l.py [logfile]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.tpu_queue_subproc import (PY, REPO, log_line, run,  # noqa: E402
                                       wait_healthy)


def run_capture(tag, cmd, timeout=3600, **env):
    """Like run(), but also returns the parsed JSON lines."""
    import subprocess
    wait_healthy(tag)
    t0 = time.time()
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=timeout,
                           cwd=REPO, env=dict(os.environ, **env))
    except subprocess.TimeoutExpired:
        log_line({"exp": tag, "error": f"timeout after {timeout}s"})
        return []
    out = r.stdout.decode(errors="replace")
    recs = []
    for line in out.splitlines():
        if line.startswith("{"):
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            recs.append(rec)
            log_line(dict(rec, exp=tag, wall_s=round(time.time() - t0, 1)))
    if not recs or r.returncode:
        log_line({"exp": tag, "rc": r.returncode,
                  "wall_s": round(time.time() - t0, 1),
                  "tail": out.strip()[-1200:],
                  "err": r.stderr.decode(errors="replace").strip()[-1200:]
                  if r.returncode else ""})
    return recs


if __name__ == "__main__":
    log_line({"exp": "queue_r4l_start",
              "ts": time.strftime("%FT%TZ", time.gmtime())})
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/jax_compile_cache")

    # 1. driver rehearsal: exactly what the end-of-round capture runs —
    #    validates the plain champion compiles at the 18 MiB scoped default
    run("driver rehearsal full bench", [PY, "bench.py"], timeout=5400)

    # 2. dropout-v2 alone (fixed kernel): correctness first — the
    #    seed-arity fix (815234a) has never run its mask-semantics checks
    #    on real hardware — then the champion-candidate bench
    run("dropout-v2 chip check", [PY, "scripts/chip_dropout_check.py"],
        timeout=1200)
    run("dropout-v2-only bench", [PY, "bench.py"],
        BENCH_MODE="train", BENCH_SKIP_PROBE="1", SIMLINGO_DROPOUT_V2="1")

    # 3. find a scoped-VMEM/kv-split config under which CE+V2 compiles
    probe = run_capture("vmem probe CE+V2",
                        [PY, "scripts/chip_vmem_probe.py", "6"],
                        timeout=5400)
    cev2_env = {}
    for rec in probe:
        if rec.get("ok"):
            cev2_env = {k: str(v) for k, v in rec["cand"].items()}
            break
    log_line({"exp": "cev2_env_selected", "env": cev2_env})

    # 4. fused-CE gradient check with weights passed as jit args
    run("fused-CE check (jit-args fix)", [PY, "scripts/chip_ce_check.py"],
        timeout=2400)

    # 5. champion matrix (r4j), using the probed CE+V2 env when found;
    #    when the probe found nothing, fall back to V2-only cells so the
    #    remat=mlp batch unlock still gets measured.
    levers = dict(SIMLINGO_DROPOUT_V2="1", **cev2_env)
    if cev2_env:
        levers["SIMLINGO_CE_IMPL"] = "pallas"
    tagce = "CE+V2" if cev2_env else "V2"
    for batch in ("8", "10", "6"):
        run(f"batch{batch} remat-mlp {tagce}", [PY, "bench.py"],
            BENCH_MODE="train", BENCH_SKIP_PROBE="1",
            BENCH_BATCH=batch, BENCH_REMAT="mlp", **levers)
    run(f"batch6 LN-pallas remat-mlp {tagce}", [PY, "bench.py"],
        BENCH_MODE="train", BENCH_SKIP_PROBE="1",
        BENCH_BATCH="6", BENCH_REMAT="mlp", SIMLINGO_LN_IMPL="pallas",
        **levers)

    # 6. fresh op attribution under the lever set that compiles
    run("xplane trace levers", [PY, "scripts/capture_trace.py",
                                "/tmp/xplane_trace_r4l"],
        timeout=2400, **levers)
    log_line({"exp": "queue_r4l_done"})
