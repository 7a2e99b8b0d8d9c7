#!/bin/bash
# Full CI: unit/integration tests on the virtual CPU mesh + multi-chip dryrun.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
echo "CI OK"
