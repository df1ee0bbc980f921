"""Multi-process bootstrap + host-side collectives (dist_util.py parity).

Mapping (SURVEY.md §5.8):
  MPI rendezvous + env:// init       -> jax.distributed.initialize()
  COMM_WORLD.rank/size               -> jax.process_index()/process_count()
  checkpoint byte-bcast (2^30 chunks)-> each host reads from shared storage
  dist.all_gather of sample arrays   -> multihost_utils.process_allgather
  dist.barrier                       -> multihost_utils.sync_global_devices
  sync_params broadcast              -> device_put with replicated sharding
"""

from __future__ import annotations

import os

import jax


def setup_dist(coordinator_address: str | None = None, num_processes: int | None = None, process_id: int | None = None):
    """Initialize multi-process JAX (no-op single-process).

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    args are None (TPU pods auto-detect; explicit args serve CPU/GPU pools).
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address or (num_processes and num_processes > 1):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def rank() -> int:
    return jax.process_index()


def world_size() -> int:
    return jax.process_count()


def is_primary() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "barrier"):
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def all_gather_host(x):
    """Gather a host array across processes (sample collection parity:
    train_util.py:311, image_sample.py:106)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(x)
    import numpy as np

    return np.asarray(x)[None]
