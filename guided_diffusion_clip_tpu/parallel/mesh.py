"""Device mesh + sharding helpers — the TPU-native replacement for dist_util.

Reference behavior: guided_diffusion/dist_util.py (MPI rendezvous + NCCL/gloo)
and DDP gradient allreduce (train_util.py:98-105). Here parallelism is
expressed declaratively: a 1-D `data` mesh (the reference's only strategy,
SURVEY.md §2.1), batch sharded over it, params/opt-state replicated, and XLA
inserts the gradient psum over ICI/DCN during jit compilation. No explicit
collectives in the train step.

The mesh is built over ALL addressable+remote devices (multi-host slices work
through jax.distributed.initialize, see `dist.setup_dist`). A `model` axis is
reserved for future tensor sharding of the 512px attention/conv blocks — the
ADM parity target needs only `data` (SURVEY.md §2.1 item 4).
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(axes: Sequence[tuple[str, int]] | None = None, devices=None) -> Mesh:
    """Build a mesh; default is 1-D ('data', n_devices)."""
    if devices is None:
        devices = jax.devices()
    if axes is None:
        axes = (("data", len(devices)),)
    names = tuple(a[0] for a in axes)
    sizes = tuple(a[1] for a in axes)
    assert int(np.prod(sizes)) == len(devices), (
        f"mesh {sizes} does not cover {len(devices)} devices"
    )
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def create_data_mesh(batch_size: int, devices=None) -> Mesh:
    """1-D data mesh over the largest device count that divides the batch.

    The global batch must shard evenly over 'data'; with e.g. batch 2 on an
    8-device host this yields a 2-device mesh instead of a device_put error
    (remaining devices idle — matching the reference's requirement that batch
    be divisible by world size, README.md:155).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n:
        n -= 1
    return create_mesh(axes=(("data", n),), devices=devices[:n])


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis (leading-axis sharded)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch with the batch dim sharded over `data`."""
    sharding = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
