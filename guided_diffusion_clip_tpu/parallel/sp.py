"""Spatial partitioning (SP): shard the image H axis across devices.

Beyond-reference scaling axis (the reference's only strategy is DDP data
parallelism, guided_diffusion/dist_util.py + train_util.py:98-105). Data
parallelism cannot reduce the *latency* of one sampling chain or let one
image's activations exceed a single chip; at the ADM 256/512px configs the
activations of early blocks (e.g. 512x512x256 bf16 = 128MB per image before
the attention maps) are the memory and time ceiling. SP splits the H axis of
every NHWC activation over a mesh axis and lets XLA's GSPMD partitioner do
the rest:

  - convolutions get automatic halo exchange (`CollectivePermute` of the
    kernel-overlap rows) — no manual halo code;
  - GroupNorm reductions over (H, W, C/g) become cross-device `AllReduce`s,
    inserted by the partitioner with identical numerics (SPMD semantics are
    value-preserving by construction);
  - attention layers run gathered: spatial self-attention is all-to-all over
    tokens, so the block input is constrained back to batch-only sharding
    (one all-gather of a SMALL low-res activation — attention lives at
    32/16/8px in every ADM config) and re-scattered after.

The switch is process-global and read at *trace* time, mirroring
`ops.config.set_conv_impl`: jit caches do not key on it, so build a fresh
jitted closure after changing it (every CLI and test does).

Usage:
    mesh = create_mesh(axes=(("data", 2), ("space", 4)))
    sp.set_spatial_sharding(mesh, data_axis="data", space_axis="space")
    fn = jax.jit(...)   # traces with constraints active

For pure-latency serving (one chain over all chips) use a 1-D ('space', N)
mesh with data_axis=None.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_STATE: tuple[Mesh, str | None, str] | None = None


def set_spatial_sharding(
    mesh: Mesh, *, data_axis: str | None = "data", space_axis: str = "space"
) -> None:
    """Enable SP constraints for subsequently TRACED model calls."""
    assert space_axis in mesh.axis_names, (space_axis, mesh.axis_names)
    if data_axis is not None:
        assert data_axis in mesh.axis_names, (data_axis, mesh.axis_names)
    from . import tp  # lazy: tp imports sp the same way

    assert not tp.active(), "spatial and tensor sharding are mutually exclusive"
    global _STATE
    _STATE = (mesh, data_axis, space_axis)


def clear_spatial_sharding() -> None:
    global _STATE
    _STATE = None


def active() -> bool:
    return _STATE is not None


@contextmanager
def spatial_sharding(mesh: Mesh, *, data_axis: str | None = "data", space_axis: str = "space"):
    global _STATE
    prev = _STATE
    set_spatial_sharding(mesh, data_axis=data_axis, space_axis=space_axis)
    try:
        yield
    finally:
        _STATE = prev


def _constrain(h, spec: P):
    mesh = _STATE[0]
    return jax.lax.with_sharding_constraint(h, NamedSharding(mesh, spec))


def constrain_spatial(h):
    """Pin an NHWC activation to (batch over data, H over space).

    No-op when SP is inactive or the value isn't rank-4 (embeddings, labels).
    H smaller than the space axis is legal — GSPMD pads internally — so deep
    low-res blocks of small test models still compile.
    """
    if _STATE is None or getattr(h, "ndim", 0) != 4:
        return h
    _, data_axis, space_axis = _STATE
    return _constrain(h, P(data_axis, space_axis))


def constrain_batch(h):
    """Pin an activation to batch-only sharding (H gathered on-device).

    Used at attention-block entry: global spatial attention needs all tokens
    resident, and constraining *before* the qkv projection makes the
    partitioner emit one all-gather of the (small, low-res) block input
    instead of resharding mid-attention.
    """
    if _STATE is None or getattr(h, "ndim", 0) != 4:
        return h
    _, data_axis, _ = _STATE
    return _constrain(h, P(data_axis))


def setup_from_flag(spatial_shard: int, batch_size: int) -> Mesh | None:
    """Build + activate the SP mesh for a CLI's --spatial_shard flag.

    spatial_shard <= 1 deactivates SP and returns None. Otherwise the local
    device pool is factored as ('data', n_devices // spatial_shard) x
    ('space', spatial_shard); when the per-process batch doesn't shard over
    the data factor (or it is 1), a pure ('space', N) latency mesh over the
    first N devices is used instead and the batch stays unsharded.
    """
    import jax as _jax

    if not spatial_shard or spatial_shard <= 1:
        clear_spatial_sharding()
        return None
    from ..utils import logger
    from .mesh import create_mesh

    # Sampling CLIs feed process-LOCAL batches into jit (each process samples
    # its own rows and all-gathers at the end, reference image_sample.py:106),
    # so the SP mesh must span only THIS process's devices — a global mesh
    # would hand jit non-addressable devices for host-local inputs. Training
    # (TrainLoop) builds its own global mesh and assembles global arrays via
    # shard_batch instead of going through this helper.
    devices = _jax.local_devices() if _jax.process_count() > 1 else _jax.devices()
    n, s = len(devices), int(spatial_shard)
    assert n % s == 0, f"--spatial_shard {s} does not divide {n} local devices"
    d = n // s
    if d > 1 and batch_size % d == 0:
        mesh = create_mesh(axes=(("data", d), ("space", s)), devices=devices)
        set_spatial_sharding(mesh)
        logger.log(
            f"spatial sharding: ('data',{d}) x ('space',{s}) over {n} devices"
        )
    else:
        mesh = create_mesh(axes=(("space", s),), devices=devices[:s])
        set_spatial_sharding(mesh, data_axis=None)
        msg = f"spatial sharding: pure ('space',{s}) latency mesh"
        if s < n:
            # the degraded case must be VISIBLE: the other n-s devices idle
            msg += (
                f" — batch {batch_size} does not shard over data={d}, so "
                f"{n - s} of {n} devices sit idle; pick batch_size divisible "
                f"by {d} (or spatial_shard={n}) to use the whole pool"
            )
        logger.log(msg)
    return mesh


def input_sharding() -> NamedSharding | None:
    """NamedSharding for placing an NHWC host batch under the active SP
    config (None when inactive) — the device_put companion of the in-jit
    constraints."""
    if _STATE is None:
        return None
    mesh, data_axis, space_axis = _STATE
    return NamedSharding(mesh, P(data_axis, space_axis))
