"""Multi-host initialization + cross-host utilities.

Completes the distributed story of SURVEY.md section 2.9/5.8: the reference's
"communication backend" is NCCL reached through DeepSpeed; ours is the device
mesh -- this module is the *launcher* side: initialize jax.distributed from
standard cluster env vars (TPU pod metadata, SLURM, or explicit addresses),
after which the same mesh/partition rules from parallel/mesh.py produce
ICI-first layouts (jax orders devices host-major, so dp spans DCN only when
it must).

Usage (one process per host):
    from simlingo_tpu.parallel import multihost
    multihost.initialize()          # no-op on single host
    mesh = meshlib.make_mesh(...)   # global devices
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-host. Returns True if
    distributed mode was activated.

    Resolution order: explicit args -> JAX_COORDINATOR_ADDRESS env -> SLURM
    (SLURM_NTASKS/SLURM_PROCID/first node) -> TPU pod auto-detection (jax
    handles this with no args on Cloud TPU) -> single-host no-op.
    """
    import jax

    if num_processes is None:
        if "JAX_NUM_PROCESSES" in os.environ:
            num_processes = int(os.environ["JAX_NUM_PROCESSES"])
        elif "SLURM_NTASKS" in os.environ:
            num_processes = int(os.environ["SLURM_NTASKS"])
    if num_processes in (None, 0, 1) and "TPU_WORKER_HOSTNAMES" not in os.environ:
        return False

    kwargs = {}
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and "SLURM_JOB_NODELIST" in os.environ:
        import subprocess
        first = subprocess.run(
            ["scontrol", "show", "hostnames",
             os.environ["SLURM_JOB_NODELIST"]],
            capture_output=True, text=True).stdout.splitlines()[0]
        coordinator_address = f"{first}:12345"
    if process_id is None and "SLURM_PROCID" in os.environ:
        process_id = int(os.environ["SLURM_PROCID"])

    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id

    jax.distributed.initialize(**kwargs)
    return True


def is_primary() -> bool:
    import jax
    return jax.process_index() == 0


def sync_hosts(name: str = "barrier") -> None:
    """Cross-host barrier via a tiny psum (safe no-op on single host)."""
    import jax
    import jax.numpy as jnp
    if jax.process_count() == 1:
        return
    x = jnp.ones((jax.local_device_count(),))
    jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x).block_until_ready()
