#!/bin/bash
# Wait out a wedged axon tunnel (docs/KNOWN_ISSUES.md: minutes-to-hours
# after an aborted TPU program), then run the round-4 sweep queue.
# Usage: nohup bash scripts/tpu_sweep_retry.sh /tmp/tpu_r4_sweep.log &
LOG="${1:-/tmp/tpu_r4_sweep.log}"
cd "$(dirname "$0")/.."
for i in $(seq 1 48); do
  if python - <<'EOF'
import bench, sys
sys.exit(1 if bench._device_reachable() else 0)
EOF
  then
    echo "probe OK after attempt $i" >> "${LOG%.log}.retry"
    exec timeout 10800 python scripts/tpu_sweep_r4.py "$LOG"
  fi
  echo "attempt $i: tunnel wedged, sleeping 300s" >> "${LOG%.log}.retry"
  sleep 300
done
echo "gave up after 48 probes (~4h)" >> "${LOG%.log}.retry"
