"""Multi-host launcher: single-host no-op behavior."""

import os

from simlingo_tpu.parallel import multihost


def test_initialize_single_host_noop(monkeypatch):
    for var in ("JAX_NUM_PROCESSES", "SLURM_NTASKS", "TPU_WORKER_HOSTNAMES",
                "JAX_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert multihost.initialize() is False
    assert multihost.is_primary()
    multihost.sync_hosts()   # no-op, must not raise
