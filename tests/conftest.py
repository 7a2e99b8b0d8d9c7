"""Test configuration: force CPU backend with 8 virtual devices.

Sharding/pjit tests exercise multi-chip paths without TPU hardware
(SURVEY.md section 4 "Multi-node testing without a cluster").
"""

import os

# The session env pins JAX_PLATFORMS to the TPU backend (and a site hook sets
# jax_platforms to "axon,cpu" regardless of the env var), so override both the
# env var and the live jax config unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Quick/slow tiering (VERDICT-r4 item 7): whole modules dominated by
# e2e pipelines, microsim suites, or interpret-mode kernel sweeps are
# marked slow so `scripts/ci.sh` can run a <3 min quick tier by default.
# Measured with `pytest --durations` 2026-08-20; everything else is quick.
SLOW_MODULES = {
    "test_full_pipeline",        # collect->train->checkpoint->resume->eval
    "test_microsim_full_loop",   # expert collect -> label -> train -> drive
    "test_microsim",             # 44 scenario types + route suite
    "test_scenarios_b2d",        # per-scenario closed-loop ability checks
    "test_flash_attention",      # interpret-mode fwd+bwd sweeps
    "test_hf_checkpoint",        # torch-parity at reduced geometry
    "test_model_parity",         # full-model cross-impl comparisons
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
