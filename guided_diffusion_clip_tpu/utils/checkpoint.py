"""Checkpoint save/load: native flax msgpack + torch .pt interop.

Reference behavior (train_util.py:243-267, SURVEY.md §5.4): every
save_interval, rank 0 writes `model{step:06d}`, one `ema_{rate}_{step:06d}`
per EMA rate, and `opt{step:06d}`; resume parses the step from the filename
and looks EMA/opt up by step+rate. We keep the exact naming scheme with a
`.flax` extension (msgpack bytes via flax.serialization); `.pt` files are
read through the torch importer, and `save_pt_copy` exports torch-compatible
state_dicts so the reference tooling can consume our checkpoints.
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np
from flax import serialization

from . import bf_io


def init_template(model, *example_args, **example_kwargs):
    """Parameter template (shapes/dtypes as host zeros) WITHOUT compiling.

    `model.init` would jit-compile and run a full forward just to produce
    shapes — minutes on TPU toolchains with remote compilation. jax.eval_shape
    traces abstractly: no compile, no device work. The zeros are numpy, which
    is exactly what the torch importer and flax deserialization need.
    """
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.key(0), *example_args, **example_kwargs)
    )
    return jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes
    )["params"]


def setup_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (big win where compiles are
    expensive, e.g. remote-compile TPU relays; repeat CLI runs hit the cache)."""
    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def gather_to_host(tree):
    """Fetch a (possibly cross-process-sharded) pytree to host numpy.

    Under FSDP on a multi-host mesh the leaves are not fully addressable, so
    a plain np.asarray raises; such leaves are assembled to their full global
    value on every host via multihost_utils.process_allgather. Collective:
    when any leaf spans processes, ALL processes must call this together
    (TrainLoop.save does — the primary-only gate applies to the file write,
    not the gather).
    """

    def leaf(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree_util.tree_map(leaf, tree)


def save_flax(path: str, tree) -> None:
    host_tree = gather_to_host(tree)
    with bf_io.open_file(path, "wb") as f:
        f.write(serialization.to_bytes(host_tree))


def load_flax(path: str, template):
    with bf_io.open_file(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def peek_flax(path: str):
    """The raw msgpack state dict, no template — for sniffing a checkpoint's
    LAYOUT (e.g. which --opt_impl wrote an opt file) before committing to a
    typed template. Corrupt/truncated files fail loudly here instead of being
    misread as a layout mismatch."""
    with bf_io.open_file(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def checkpoint_name(kind: str, step: int, ema_rate: float | str | None = None, ext: str = "flax") -> str:
    """Reference filename scheme (train_util.py:249-251)."""
    if kind == "model":
        return f"model{step:06d}.{ext}"
    if kind == "ema":
        return f"ema_{ema_rate}_{step:06d}.{ext}"
    if kind == "opt":
        return f"opt{step:06d}.{ext}"
    raise ValueError(kind)


def parse_resume_step_from_filename(filename: str) -> int:
    """model123456(.pt|.flax) -> 123456; 0 if unparseable (train_util.py:344-356)."""
    base = os.path.basename(filename)
    m = re.match(r"^model(\d+)\.\w+$", base)
    if not m:
        return 0
    try:
        return int(m.group(1))
    except ValueError:
        return 0


def find_ema_checkpoint(main_checkpoint: str | None, step: int, rate) -> str | None:
    """Locate the EMA file next to the model checkpoint (train_util.py:371-378)."""
    if main_checkpoint is None:
        return None
    ext = main_checkpoint.rsplit(".", 1)[-1]
    filename = checkpoint_name("ema", step, rate, ext=ext)
    path = bf_io.join(os.path.dirname(main_checkpoint), filename)
    return path if bf_io.exists(path) else None


def load_params(path: str, template, *, model: str = "unet", pool: str | None = None):
    """Load model params from a native .flax file, a torch .pt, or an
    async-orbax run directory (``--ckpt_backend orbax``).

    Orbax form: ``<run>/orbax`` loads the latest step's raw model params;
    ``<run>/orbax@ema_0.9999`` selects a subtree of the saved state
    (``model``/``ema_{rate}``/``opt``) — so sampling CLIs can consume
    orbax-trained runs directly, no conversion step.
    """
    if path.endswith(".pt"):
        from .torch_import import load_pt_checkpoint

        return load_pt_checkpoint(path, template, model=model, pool=pool)
    base, sel = path, "model"
    if "@" in os.path.basename(path):
        base, sel = path.rsplit("@", 1)
    if os.path.basename(base.rstrip("/")) == "orbax" and bf_io.isdir(base):
        import jax
        import jax.numpy as jnp

        ck = OrbaxCheckpointer(base)
        step = ck.latest_step()
        if step is None:
            raise FileNotFoundError(f"no orbax checkpoints under {base}")
        tree = ck.restore_raw(step)
        ck.close()
        if sel not in tree:
            raise KeyError(f"{sel!r} not in orbax state {sorted(tree)} ({base} step {step})")
        picked = tree[sel]
        return jax.tree_util.tree_map(
            lambda t, x: jnp.asarray(x, getattr(t, "dtype", None)), template, picked
        )
    return load_flax(path, template)


class OrbaxCheckpointer:
    """Async orbax checkpointing for large-scale runs (SURVEY.md §5.4).

    The flax-msgpack files above are the default (simple, single-host); this
    backend adds non-blocking saves and sharded/multi-host restore via
    orbax+tensorstore. Directory layout: {dir}/{kind}_{step} trees.
    """

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        # abspath/makedirs would mangle URL-style paths ("gs://b" ->
        # "<cwd>/gs:/b"); orbax/tensorstore handles remote schemes natively
        if bf_io.is_remote(directory):
            self.directory = str(directory)
        else:
            self.directory = os.path.abspath(directory)
            os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(create=True, enable_async_checkpointing=True),
            # pre-register the handler so item_metadata works on a FRESH
            # manager (e.g. a resume sniffing the saved opt_impl layout);
            # without it the lazy registration only happens at restore(args=)
            item_handlers=ocp.StandardCheckpointHandler(),
        )

    def save(self, step: int, tree) -> None:
        """Non-blocking save; returns immediately (train loop keeps stepping)."""
        self._mgr.save(step, args=self._ocp.args.StandardSave(tree))

    def restore(self, step: int, template):
        return self._mgr.restore(step, args=self._ocp.args.StandardRestore(template))

    def restore_raw(self, step: int):
        """Restore from saved metadata alone (no template) — for consumers
        like sampling CLIs that don't know the optimizer's structure."""
        return self._mgr.restore(step)

    def latest_step(self):
        return self._mgr.latest_step()

    def item_metadata(self, step: int):
        """Structure-only metadata of a saved step (no tensor reads) — lets a
        resume sniff the saved layout (e.g. opt_impl) before building the
        restore template."""
        return self._mgr.item_metadata(step)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def save_pt_copy(path: str, params, *, model: str = "unet", pool: str | None = None) -> None:
    """Write a torch-compatible state_dict so reference tooling can load it."""
    import torch

    from .torch_import import export_to_torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in export_to_torch(params, model=model, pool=pool).items()}
    torch.save(sd, path)
