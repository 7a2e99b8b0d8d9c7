"""Round-4 follow-up TPU queue: the batch/remat cells the r3 queue lacked.

The r4 run of tpu_sweep_inproc.py measured: batch8 (no remat) OOMs by only
544 MB; batch10 by 3.4 GB; int8-base at batch6 is a regression (14.2 vs
15.3 -- dequant cost > HBM savings when compute-bound). The cells that can
still beat 15.6 samples/s:
  * batch7 no-remat (should fit: the b8 shortfall was 544 MB and one batch
    row costs ~1.5 GB of HLO temp, so b7 has ~1 GB headroom);
  * batch8 + remat of ONE tower. Rematting the LLM is the cheaper trade
    (recompute 3.6 TF vs the ViT's 7.5 TF) and the b8 OOM dump is dominated
    by bf16[8,798,4864] LLM MLP temps -- exactly what remat_llm frees.

Usage: timeout 5400 python scripts/tpu_sweep_r4.py [/tmp/tpu_r4b_sweep.log]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import bench  # noqa: E402
from scripts.tpu_sweep_inproc import LOG as _DEFAULT_LOG  # noqa: E402,F401
from scripts.tpu_sweep_inproc import run, log_line  # noqa: E402

if __name__ == "__main__":
    import scripts.tpu_sweep_inproc as sw
    if len(sys.argv) > 1:
        sw.LOG = sys.argv[1]
    else:
        sw.LOG = "/tmp/tpu_r4b_sweep.log"
    log_line({"exp": "sweep_r4b_start",
              "ts": time.strftime("%FT%TZ", time.gmtime())})
    probe_error = bench._device_reachable()
    if probe_error:
        log_line({"exp": "sweep_abort", "error": probe_error})
        sys.exit(1)
    # int4 decode first: quick (~5 min), and the CoT-latency deliverable
    # depends on it (nibble-packed int8 storage fixed the S4 relayout crash
    # the r4a queue hit)
    run("latency int4", bench.latency_bench, BENCH_QUANT="int4")
    run("batch7", bench.main, BENCH_BATCH=7)
    run("batch8 remat-llm", bench.main, BENCH_BATCH=8, BENCH_REMAT="llm")
    run("batch8 remat-vision", bench.main, BENCH_BATCH=8, BENCH_REMAT="vision")
    # retry after the rank-1 block fix in kernels/layernorm.py (the r3 queue
    # entry failed Mosaic lowering with 80-row stat blocks)
    run("pallas-LN batch6", bench.main, SIMLINGO_LN_IMPL="pallas")
    run("batch12 remat-both", bench.main, BENCH_BATCH=12, BENCH_REMAT="1")
    log_line({"exp": "sweep_r4b_done"})
