#!/bin/bash
# CI tiers (VERDICT-r4 item 7):
#   default      quick tier: unit/integration tests minus the @slow
#                e2e/microsim/kernel-sweep modules, parallel workers
#   CI_FULL=1    everything: full suite (incl. slow) + multi-chip dryrun
# Measured 2026-08-21: quick tier 4m36s on this SINGLE-core dev box (vs
# 30+ min full suite); on a multi-core runner -n auto brings it well
# under 3 min.
set -e
cd "$(dirname "$0")/.."

if [ "${CI_FULL:-0}" = "1" ]; then
    python -m pytest tests/ -q -n auto
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
else
    python -m pytest tests/ -q -n auto -m "not slow"
fi
echo "CI OK"
