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
    """Build a mesh; default is 1-D ('data', n_devices).

    Device placement goes through `mesh_utils.create_device_mesh`, which
    orders devices by the PHYSICAL interconnect topology (on TPU pods, inner
    mesh axes land on ICI rings and only the outer axis crosses DCN) — a raw
    `reshape(jax.devices())` can put a frequently-communicating axis across
    slow links. Falls back to the raw reshape for device subsets or
    platforms the topology helper doesn't know.
    """
    if devices is None:
        devices = jax.devices()
    if axes is None:
        axes = (("data", len(devices)),)
    names = tuple(a[0] for a in axes)
    sizes = tuple(a[1] for a in axes)
    assert int(np.prod(sizes)) == len(devices), (
        f"mesh {sizes} does not cover {len(devices)} devices"
    )
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh(sizes, devices=devices)
    except Exception:
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
    """Place a host batch with the batch dim sharded over `data`.

    Single-process: a plain device_put. Multi-process: each process holds a
    DIFFERENT local batch (dataset sharding, image_datasets.py:103 parity),
    so the global array is assembled from per-process shards via
    `jax.make_array_from_process_local_data` — the global batch dim becomes
    process_count * local_batch, matching the reference's
    global_batch = batch_size * world (train_util.py:69).
    """
    sharding = data_sharding(mesh)
    if jax.process_count() > 1:
        import numpy as np_

        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np_.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def host_local_part(x):
    """Host-fetch the rows of a leading-axis 'data'-sharded global array that
    live on THIS process, in global order.

    The inverse of `shard_batch` for per-process reads: a multi-process
    global array is not fully addressable, so `device_get` raises; the
    addressable shards, ordered by global offset, are exactly this process's
    contribution (make_array_from_process_local_data places local rows at
    the global indices owned by local devices, under the same sharding).
    Replicated arrays and single-process arrays pass through np.asarray.
    """
    import numpy as np_

    if jax.process_count() == 1 or getattr(x, "is_fully_addressable", True):
        return np_.asarray(x)
    shards = sorted(
        x.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np_.concatenate([np_.asarray(s.data) for s in shards], axis=0)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


# ---------------------------------------------------------------------------
# FSDP (ZeRO-3-style) parameter/optimizer sharding
# ---------------------------------------------------------------------------
#
# The reference has no analog (its DDP replicates the full model per GPU,
# train_util.py:98-105); at the v5e-16 training target the ADM-512 model +
# Adam moments exceed a 16GB chip replicated, so we expose the idiomatic JAX
# form of ZeRO-3: every parameter (and its Adam moments / EMA copies) is
# sharded along one axis over the 'data' mesh axis, and XLA's SPMD partitioner
# inserts the all-gathers (forward/backward) and reduce-scatters (gradients)
# automatically. No explicit collectives anywhere — the train step body is
# identical to the replicated path.

# Leaves smaller than this stay replicated: sharding a 512-float bias saves
# nothing and adds collective latency.
_FSDP_MIN_ELEMENTS = 16384


def fsdp_spec(shape: tuple, axis_size: int, axis_name="data") -> P:
    """PartitionSpec for one leaf: shard the largest dimension divisible by
    the mesh axis; replicate if none qualifies or the leaf is small.

    Deterministic on shape alone, so a param and its Adam mu/nu and EMA
    copies (identical shapes) always agree. `axis_name` may be a tuple of
    mesh axes (with `axis_size` their product) to shard one dimension over
    several axes at once — used to spread param shards over the WHOLE pool
    when the mesh also has a 'space' axis (SP), instead of replicating
    shards within each space group.
    """
    if int(np.prod(shape or (1,))) < _FSDP_MIN_ELEMENTS:
        return P()
    best = None
    for i, d in enumerate(shape):
        if d % axis_size == 0 and (best is None or d > shape[best]):
            best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis_name
    return P(*spec)


def fsdp_sharding_tree(mesh: Mesh, tree, axis_name="data"):
    """Pytree of NamedSharding mirroring `tree` under the FSDP policy."""
    names = (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)
    axis_size = int(np.prod([mesh.shape[n] for n in names]))
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, fsdp_spec(jnp_shape(x), axis_size, axis_name)),
        tree,
    )


def jnp_shape(x) -> tuple:
    shape = getattr(x, "shape", None)
    return tuple(shape) if shape is not None else ()


def shard_tree(tree, sharding_tree):
    """Place a pytree according to a matching pytree of shardings."""
    return jax.tree_util.tree_map(jax.device_put, tree, sharding_tree)


def constrain_tree(tree, sharding_tree):
    """with_sharding_constraint over a pytree (pins layouts inside jit so the
    partitioner reduce-scatters grads / keeps state sharded across steps)."""
    return jax.tree_util.tree_map(
        jax.lax.with_sharding_constraint, tree, sharding_tree
    )
