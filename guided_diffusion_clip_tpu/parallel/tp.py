"""Tensor parallelism (TP): shard the channel axis across devices.

Beyond-reference scaling axis (the reference's only strategy is DDP data
parallelism, guided_diffusion/dist_util.py + train_util.py:98-105). mesh.py
reserved a 'model' axis for exactly this; TP fills it: every NHWC activation
is pinned to (batch over 'data', C over 'model') at block boundaries and
XLA's GSPMD partitioner does the rest:

  - 1x1/3x3 convolutions become output-channel-parallel matmuls — each chip
    computes its C/N slice of the output features (the Megatron "column
    parallel" shape) with the partitioner choosing where to reshard;
  - GroupNorm reduces within channel GROUPS (contiguous blocks of C/32):
    when the model-axis size divides the 32-group boundary (32 % S == 0)
    each chip holds whole groups, so the stats reductions stay device-local
    — no collective. Other shard factors (S=3, S>32) split groups across
    chips; values stay correct but GSPMD inserts stat AllReduces;
  - attention blocks run with the partitioner free to place the head
    einsums; the block output is re-pinned channel-sharded on exit.

Where SP (parallel/sp.py) splits one image's H axis — the knob for early
high-res blocks whose activations dwarf their channel counts — TP splits
the channel/feature axis, the knob for the deep low-res blocks (e.g. the
ADM-512 trunk at 16px carries C=1024 while H=16 stops dividing usefully).
SP and TP are mutually exclusive per process in this revision (a combined
('data','space','model') factoring is a mesh-shape change away, but no
config needs it yet); composing either with DP is the supported shape.

The switch is process-global and read at *trace* time, mirroring
`ops.config.set_conv_impl` and sp.py: jit caches do not key on it, so build
a fresh jitted closure after changing it (every CLI and test does).

Usage:
    mesh = create_mesh(axes=(("data", 2), ("model", 4)))
    tp.set_tensor_sharding(mesh, data_axis="data", model_axis="model")
    fn = jax.jit(...)   # traces with constraints active

For pure-latency serving (one chain over all chips) use a 1-D ('model', N)
mesh with data_axis=None.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_STATE: tuple[Mesh, str | None, str] | None = None


def set_tensor_sharding(
    mesh: Mesh, *, data_axis: str | None = "data", model_axis: str = "model"
) -> None:
    """Enable TP constraints for subsequently TRACED model calls."""
    assert model_axis in mesh.axis_names, (model_axis, mesh.axis_names)
    if data_axis is not None:
        assert data_axis in mesh.axis_names, (data_axis, mesh.axis_names)
    from . import sp

    assert not sp.active(), "spatial and tensor sharding are mutually exclusive"
    global _STATE
    _STATE = (mesh, data_axis, model_axis)


def clear_tensor_sharding() -> None:
    global _STATE
    _STATE = None


def active() -> bool:
    return _STATE is not None


@contextmanager
def tensor_sharding(mesh: Mesh, *, data_axis: str | None = "data", model_axis: str = "model"):
    global _STATE
    prev = _STATE
    set_tensor_sharding(mesh, data_axis=data_axis, model_axis=model_axis)
    try:
        yield
    finally:
        _STATE = prev


def constrain_channels(h):
    """Pin an NHWC activation to (batch over data, C over model).

    No-op when TP is inactive or the value isn't rank-4. Channel counts not
    divisible by the model axis (the RGB stem input, the 3/6-channel output
    head) fall back to batch-only sharding instead of forcing GSPMD to pad
    a 3-wide axis across 8 chips.
    """
    if _STATE is None or getattr(h, "ndim", 0) != 4:
        return h
    mesh, data_axis, model_axis = _STATE
    if h.shape[-1] % mesh.shape[model_axis]:
        return jax.lax.with_sharding_constraint(h, NamedSharding(mesh, P(data_axis)))
    return jax.lax.with_sharding_constraint(
        h, NamedSharding(mesh, P(data_axis, None, None, model_axis))
    )


def constrain_embedding(h):
    """Pin a rank-2 [batch, features] embedding to (batch over data, features
    replicated).

    The timestep/label embedding is tiny (B x time_embed_dim) but feeds every
    ResBlock; without a pin, parameter shardings propagate INTO it — under
    FSDPxTP (ZeRO-3 params spread over the full data x model pool) GSPMD
    tried to reshard it per-ResBlock and fell back to '[SPMD] Involuntary
    full rematerialization' (tests/test_fsdp.py regression). Replicating the
    features of a few-KB tensor costs nothing and keeps propagation clean.
    """
    if _STATE is None or getattr(h, "ndim", 0) != 2:
        return h
    mesh, data_axis, _ = _STATE
    return jax.lax.with_sharding_constraint(h, NamedSharding(mesh, P(data_axis)))


def setup_from_flag(tensor_shard: int, batch_size: int) -> Mesh | None:
    """Build + activate the TP mesh for a CLI's --tensor_shard flag.

    tensor_shard <= 1 deactivates TP and returns None. Otherwise the local
    device pool is factored as ('data', n_devices // tensor_shard) x
    ('model', tensor_shard); when the per-process batch doesn't shard over
    the data factor (or it is 1), a pure ('model', N) latency mesh over the
    first N devices is used instead and the batch stays unsharded.
    """
    import jax as _jax

    if not tensor_shard or tensor_shard <= 1:
        clear_tensor_sharding()
        return None
    from ..utils import logger
    from .mesh import create_mesh

    # Same process-local rule as sp.setup_from_flag: sampling CLIs feed
    # process-LOCAL batches into jit (reference image_sample.py:106), so the
    # mesh must span only THIS process's devices.
    devices = _jax.local_devices() if _jax.process_count() > 1 else _jax.devices()
    n, s = len(devices), int(tensor_shard)
    assert n % s == 0, f"--tensor_shard {s} does not divide {n} local devices"
    if 32 % s:
        logger.warn(
            f"--tensor_shard {s} does not divide the 32 GroupNorm groups: "
            "groups split across chips, so GSPMD inserts stat AllReduces "
            "(values stay correct; expect extra collective traffic)"
        )
    d = n // s
    if d > 1 and batch_size % d == 0:
        mesh = create_mesh(axes=(("data", d), ("model", s)), devices=devices)
        set_tensor_sharding(mesh)
        logger.log(
            f"tensor sharding: ('data',{d}) x ('model',{s}) over {n} devices"
        )
    else:
        mesh = create_mesh(axes=(("model", s),), devices=devices[:s])
        set_tensor_sharding(mesh, data_axis=None)
        msg = f"tensor sharding: pure ('model',{s}) latency mesh"
        if s < n:
            msg += (
                f" — batch {batch_size} does not shard over data={d}, so "
                f"{n - s} of {n} devices sit idle; pick batch_size divisible "
                f"by {d} (or tensor_shard={n}) to use the whole pool"
            )
        logger.log(msg)
    return mesh


def input_sharding() -> NamedSharding | None:
    """NamedSharding for placing an NHWC host batch under the active TP
    config (None when inactive). Inputs are RGB (C=3, unshardable over
    'model'), so only the batch dim shards."""
    if _STATE is None:
        return None
    mesh, data_axis, _ = _STATE
    return NamedSharding(mesh, P(data_axis))
