#!/bin/bash
# Round-3 TPU experiment queue (VERDICT item 1: settle throughput with data).
# Run when the chip is reachable; each bench line appends to the log.
# Every run is wrapped in `timeout` because a crashed TPU program wedges
# the tunnel (docs/KNOWN_ISSUES.md).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_r3_sweep.log}
echo "=== round-3 sweep $(date -u +%FT%TZ) ===" | tee -a "$LOG"

run() {
  desc="$1"; shift
  echo "--- $desc" | tee -a "$LOG"
  timeout 480 env BENCH_SKIP_PROBE=1 "$@" python bench.py 2>/dev/null \
    | grep '^{' | tee -a "$LOG" || echo "FAILED/TIMEOUT: $desc" | tee -a "$LOG"
}

# 0. confirm current default (batch 6, post lane-major + chunked-CE)
run "baseline batch6"      BENCH_MODE=train
# 1. batch sweep (chunked CE freed the ~740MB logits temp; HBM may now fit 8/10)
run "batch8"               BENCH_MODE=train BENCH_BATCH=8
run "batch10"              BENCH_MODE=train BENCH_BATCH=10
# 2. batch sweep with vision remat (trade FLOPs for HBM to push batch higher)
run "batch10 remat-vision" BENCH_MODE=train BENCH_BATCH=10 BENCH_REMAT=vision
run "batch12 remat-vision" BENCH_MODE=train BENCH_BATCH=12 BENCH_REMAT=vision
# 3. int8 (w8a16) frozen LLM base in the TRAINING forward (dx-only backward)
run "batch6 int8-base"     BENCH_MODE=train BENCH_INT8_BASE=1
run "batch8 int8-base"     BENCH_MODE=train BENCH_INT8_BASE=1 BENCH_BATCH=8
# 3b. fused Pallas LayerNorm/RMSNorm (validate on-chip first: kernels are
#     interpret-tested on CPU; see kernels/layernorm.py)
run "batch6 pallas-LN"     BENCH_MODE=train SIMLINGO_LN_IMPL=pallas
# 3c. full input pipeline at the final speed (JPEG -> tokenize -> collate ->
#     prefetch -> device preprocess): proves the loader keeps up off-chip
run "batch6 disk-data"     BENCH_MODE=train BENCH_DATA=disk
# 4. latency lines at production budgets (driver-captured format)
run "latency"              BENCH_MODE=latency
# 4b. w4a16 decode (group-128 int4, kernels/quantized_matmul.py): halves the
#     HBM weight bytes that bound per-token latency
run "latency int4"         BENCH_MODE=latency BENCH_QUANT=int4

echo "=== sweep done; best lines above -> docs/BENCH_NOTES.md ===" | tee -a "$LOG"
