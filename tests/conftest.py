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

jax.config.update("jax_platforms", "cpu")
