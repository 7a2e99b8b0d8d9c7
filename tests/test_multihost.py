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


def test_shipped_experiment_configs_compose():
    from simlingo_tpu.core.config import compose
    cfg = compose("configs/simlingo.yaml")
    assert cfg.name == "simlingo_seed_9876"
    assert cfg.optimizer.lr == 3e-5
    assert cfg.data.use_dreamer is True
    # weights are relative; the sampler normalizes them
    assert sum(cfg.data.train_partitions.values()) > 0
    assert cfg.data.base.use_commentary is True
    assert cfg.data.base.route_as == "target_point_command"

    cfg2 = compose("configs/simlingo_base.yaml",
                   overrides=["optimizer.lr=2e-4", "data.batch_size=4"])
    assert cfg2.optimizer.lr == 2e-4
    assert cfg2.data.batch_size == 4
    assert cfg2.data.use_dreamer is False
