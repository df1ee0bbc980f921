"""Training loop: optax AdamW + EMA + microbatching + DP mesh + checkpointing.

Reference behavior: guided_diffusion/train_util.py (TrainLoop :24) and
fp16_util.py. TPU-native mapping (SURVEY.md §2.1):
  - fp16 master-weights + dynamic loss scaling -> bf16 compute / f32 params,
    loss-scale-free (the model's GroupNorm/softmax stay f32 by construction).
  - DDP bucketed allreduce -> jit over a Mesh(('data',)) with the batch
    sharded on `data`; XLA inserts the gradient psum over ICI.
  - microbatch grad accumulation (train_util.py:193-225) -> lax.scan inside
    the one jitted step. Like the reference, each microbatch contributes the
    gradient of its own mean loss and contributions are SUMMED (torch
    .backward accumulation semantics) — keeping effective-LR parity.
  - EMA update_ema lerp (nn.py:55) -> optax.incremental_update per rate.
  - checkpoint naming + resume-step parsing preserved (train_util.py:243-267).
  - DIFFUSION_TRAINING_TEST env var stops after the first save interval
    (train_util.py:174-177).
  - per-quartile loss logging (train_util.py:381-387), with the metrics
    fetch DEFERRED one step (one batched device_get while the next step runs
    on device — synchronous per-scalar reads serialized ~6 round trips into
    every step, measured 484 vs 275 ms/step through a remote-attached v5e);
    `flush_metrics` drains before dumps/saves so logged values are unchanged.
  - in-training validation sampling with PNG grids + npz (train_util.py:269-341),
    fix-forward: val_datasets optional, use_ddim honored from an explicit arg.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Iterator, Optional

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.api import Diffusion
from ..parallel import dist as pdist
from ..parallel import sp
from ..parallel import tp
from ..parallel.mesh import (
    constrain_tree,
    create_data_mesh,
    create_mesh,
    data_sharding,
    fsdp_sharding_tree,
    host_local_part,
    replicate,
    replicated,
    shard_batch,
    shard_tree,
)
from ..training.resample import LossAwareSampler, ScheduleSampler, UniformSampler
from ..utils import checkpoint as ckpt
from ..utils import logger
from ..utils.saving_imgs import save_img, tensor2img

INITIAL_LOG_LOSS_SCALE = 20.0  # kept for log parity; bf16 needs no scaling


def drop_conditioning(rng, cond: dict, p: float, null_y: int = -1) -> dict:
    """Per-example conditioning dropout for classifier-free guidance training.

    With probability ``p`` an example's conditioning is replaced by the null
    value: ``clip_feat`` rows are zeroed (the fork's MLP label-emb null);
    integer labels ``y`` are set to ``null_y`` (a class index the caller
    reserved in the Embed table, e.g. trained with num_classes + 1 rows).
    Other keys (low_res, img2, ...) are structural inputs, not semantics to
    guide on, and pass through unchanged.
    """
    if not p:
        return cond
    keys = [k for k in ("clip_feat", "y") if cond.get(k) is not None]
    if not keys:
        return cond
    some = cond[keys[0]]
    mask = jax.random.bernoulli(rng, p, (some.shape[0],))
    out = dict(cond)
    if "clip_feat" in keys:
        v = cond["clip_feat"]
        out["clip_feat"] = jnp.where(
            mask.reshape((-1,) + (1,) * (v.ndim - 1)), jnp.zeros_like(v), v
        )
    if "y" in keys:
        assert null_y >= 0, (
            "cond_dropout on a class-labelled model needs a reserved null "
            "class index (TrainLoop cond_null_y / image_train --cfg_null_y)"
        )
        v = cond["y"]
        out["y"] = jnp.where(mask, jnp.full_like(v, null_y), v)
    return out


def _global_norm(tree) -> jax.Array:
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in jax.tree_util.tree_leaves(tree))
    )


class TrainLoop:
    def __init__(
        self,
        *,
        model,
        diffusion: Diffusion,
        data: Iterator,
        batch_size: int,
        microbatch: int,
        lr: float,
        ema_rate,
        log_interval: int,
        save_interval: int,
        resume_checkpoint: str = "",
        use_fp16: bool = False,  # accepted for flag parity; bf16 is dtype-driven
        fp16_scale_growth: float = 1e-3,  # ignored (no loss scaling on TPU)
        schedule_sampler: Optional[ScheduleSampler] = None,
        weight_decay: float = 0.0,
        lr_anneal_steps: int = 0,
        val_datasets=None,
        val_batch_size: int = 8,
        use_ddim_for_val: bool = False,
        mesh=None,
        seed: int = 0,
        init_params=None,
        profile_dir: str = "",
        profile_steps: int = 3,
        param_sharding: str = "replicated",
        opt_impl: str = "tree",
        ckpt_backend: str = "flax",
        loss_weighting: str = "",
        spatial_shard: int = 0,
        tensor_shard: int = 0,
        cond_dropout: float = 0.0,
        cond_null_y: int = -1,
    ):
        self.model = model
        self.diffusion = diffusion
        self.data = data
        self.batch_size = batch_size
        self.microbatch = microbatch if microbatch > 0 else batch_size
        assert self.batch_size % self.microbatch == 0
        self.n_micro = self.batch_size // self.microbatch
        self.lr = lr
        self.ema_rate = (
            [ema_rate] if isinstance(ema_rate, float)
            else [float(x) for x in str(ema_rate).split(",")]
        )
        self.log_interval = log_interval
        self.save_interval = save_interval
        self.resume_checkpoint = resume_checkpoint
        self.schedule_sampler = schedule_sampler or UniformSampler(diffusion.num_timesteps)
        self.weight_decay = weight_decay
        self.lr_anneal_steps = lr_anneal_steps
        self.val_datasets = val_datasets
        self.val_batch_size = val_batch_size
        self.use_ddim_for_val = use_ddim_for_val

        self._profile_dir = profile_dir
        self._profile_steps = profile_steps
        self.step = 0
        self.resume_step = 0
        self.global_batch = self.batch_size * max(1, jax.process_count())
        # Spatial partitioning (parallel/sp.py): factor the device pool as
        # data x space, shard batch over 'data' and every NHWC activation's H
        # over 'space' (constraints live inside the model). Activation
        # memory/time per chip drops by the space factor — the knob for
        # 256/512px configs where pure DP runs out of HBM or latency.
        # validate BEFORE activating anything: asserting inside the tensor
        # branch (after SP is already switched on) would raise with
        # process-global SP left active — a failed constructor must not
        # leak sharding state into later traces in the same process
        assert not (
            spatial_shard and spatial_shard > 1
            and tensor_shard and tensor_shard > 1
        ), "spatial_shard and tensor_shard are mutually exclusive"
        if spatial_shard and spatial_shard > 1:
            # SP and TP are mutually exclusive (sp.set_spatial_sharding
            # asserts); a loop explicitly asked to spatial-shard makes any
            # ambient TP state stale by definition — clear it first.
            tp.clear_tensor_sharding()
            if mesh is None:
                n = len(jax.devices())
                assert n % spatial_shard == 0, (
                    f"spatial_shard {spatial_shard} does not divide {n} devices"
                )
                d = n // spatial_shard
                assert self.global_batch % d == 0, (
                    f"global batch {self.global_batch} does not shard over "
                    f"data axis {d} (= {n} devices / spatial_shard {spatial_shard})"
                )
                mesh = create_mesh(axes=(("data", d), ("space", spatial_shard)))
            assert "space" in mesh.axis_names, mesh.axis_names
            sp.set_spatial_sharding(mesh)
        elif sp.active() and (mesh is None or "space" not in mesh.axis_names):
            # process-global SP left on by a previous loop/CLI in this process
            # would make OUR trace pin activations to the stale (data, space)
            # mesh; own the cleanup here (mirrors sp.setup_from_flag on <=1).
            # A caller that activated SP itself and hands us the matching
            # ('data','space') mesh keeps it — only a mesh that CANNOT carry
            # the active SP constraints marks the state as stale.
            sp.clear_spatial_sharding()
        # Tensor parallelism (parallel/tp.py): factor the pool as data x
        # model, shard batch over 'data' and every NHWC activation's C over
        # 'model' (constraints live inside the model, exactly as in the
        # sampling CLIs). The deep-trunk complement to SP for training: per-
        # chip activation memory drops by the model factor while params stay
        # replicated; GSPMD handles the channel-parallel convs and grad sync.
        if tensor_shard and tensor_shard > 1:
            sp.clear_spatial_sharding()  # requested TP supersedes stale ambient SP
            if mesh is None:
                n = len(jax.devices())
                assert n % tensor_shard == 0, (
                    f"tensor_shard {tensor_shard} does not divide {n} devices"
                )
                d = n // tensor_shard
                assert self.global_batch % d == 0, (
                    f"global batch {self.global_batch} does not shard over "
                    f"data axis {d} (= {n} devices / tensor_shard {tensor_shard})"
                )
                mesh = create_mesh(axes=(("data", d), ("model", tensor_shard)))
            assert "model" in mesh.axis_names, mesh.axis_names
            tp.clear_tensor_sharding()
            tp.set_tensor_sharding(mesh)
        if tp.active() and (mesh is None or "model" not in mesh.axis_names):
            # same staleness rule for tensor parallelism: a 'model'-axis mesh
            # handed in by the caller keeps ambient TP active (the in-model
            # channel constraints then ride this loop's jit); any other mesh
            # cannot carry them, so the leftover process-global state is stale.
            tp.clear_tensor_sharding()
        elif tp.active():
            # the caller's mesh can carry TP, but the ambient state may have
            # been pinned to a DIFFERENT mesh (e.g. a local-devices latency
            # mesh built by a sampling CLI); re-activate on the loop's mesh so
            # the in-model channel constraints target the same device
            # assignment as the loop's global batch sharding.
            tp.clear_tensor_sharding()
            tp.set_tensor_sharding(
                mesh, data_axis="data" if "data" in mesh.axis_names else None
            )
        # the mesh shards the GLOBAL batch (per-process batches are assembled
        # into one global array by shard_batch under multi-process)
        self.mesh = mesh if mesh is not None else create_data_mesh(self.global_batch)
        if jax.process_count() > 1:
            # every process must own mesh devices covering exactly its local
            # batch rows, or shard_batch's global-array assembly cannot work
            n_local = len(self.mesh.local_devices)
            mesh_n = self.mesh.devices.size
            assert n_local > 0 and self.global_batch * n_local == self.batch_size * mesh_n, (
                f"per-process batch {self.batch_size} does not map onto "
                f"{n_local}/{mesh_n} local mesh devices"
            )
        assert param_sharding in ("replicated", "fsdp"), param_sharding
        self.param_sharding = param_sharding
        # opt_impl="flat": run AdamW + EMA on ONE raveled f32 vector per state
        # tensor instead of per-leaf tree ops. The ~500-leaf tree update
        # lowers to thousands of tiny serialized kernels (measured ~33 ms
        # tail at the 64px config vs a ~5 ms HBM roofline —
        # tools/opt_tail_probe.py); the flat path pays 2 ravels + 1 unravel
        # of extra bandwidth to get single-buffer elementwise passes.
        # Not composed with FSDP: dimension-sharded leaves cannot share one
        # contiguous vector without resharding every step.
        # "zero1": flat math with the m/v/EMA vectors SHARDED over the mesh
        # (ZeRO-1) — params stay replicated (unlike FSDP), so the model
        # forward is untouched while optimizer+EMA memory drops to 1/N per
        # chip ((2 + n_ema_rates) x 4 bytes/param otherwise). XLA turns the
        # grad all-reduce into reduce-scatter + all-gather of the updated
        # param vector; the shard-wise update runs at 1/N the bandwidth.
        assert opt_impl in ("tree", "flat", "zero1"), opt_impl
        if opt_impl != "tree" and param_sharding == "fsdp":
            raise ValueError(
                f"opt_impl={opt_impl!r} does not compose with FSDP sharding"
            )
        self.opt_impl = opt_impl
        # both flat-buffer impls share math and on-disk layout; they differ
        # only in where the buffers live
        self._flat_math = opt_impl in ("flat", "zero1")
        self._opt_layout = "flat" if self._flat_math else "tree"
        assert ckpt_backend in ("flax", "orbax"), ckpt_backend
        self.ckpt_backend = ckpt_backend
        self._orbax = None  # created lazily at first save (needs the run dir)
        # Beyond-reference: per-timestep loss re-weighting. "min_snr_G"
        # (Hang et al. 2023, arXiv:2303.09556): weight_t = min(SNR_t, G) /
        # SNR_t for eps-prediction — down-weights the low-noise steps whose
        # gradients dominate plain MSE, measurably faster convergence.
        # Composes with importance sampling: applied as an extra factor on
        # the per-example weights in run_step (unbiased estimate of the
        # REWEIGHTED objective).
        self._loss_weight_table = None
        if loss_weighting:
            if not loss_weighting.startswith("min_snr_"):
                raise ValueError(f"unknown loss_weighting: {loss_weighting!r}")
            gamma = float(loss_weighting[len("min_snr_"):])
            ab = np.asarray(diffusion.sched.alphas_cumprod, np.float64)
            snr = ab / (1.0 - ab)
            self._loss_weight_table = (
                np.minimum(snr, gamma) / snr
            ).astype(np.float32)
        # Classifier-free-guidance training (beyond reference): drop each
        # example's conditioning with prob cond_dropout so the model also
        # learns the unconditional score; sample with --cfg_scale.
        self.cond_dropout = float(cond_dropout)
        self.cond_null_y = int(cond_null_y)
        if self.cond_dropout and self.cond_null_y >= 0:
            # XLA's gather CLAMPS out-of-range indices: an unreserved null
            # index would silently train the LAST REAL CLASS as "null",
            # corrupting that class — fail here instead
            mcfg = getattr(model, "config", None)
            if (
                mcfg is not None
                and getattr(mcfg, "label_emb_type", "") == "embedding"
                and mcfg.num_classes is not None
            ):
                assert self.cond_null_y < mcfg.num_classes, (
                    f"cfg_null_y {self.cond_null_y} is outside the Embed table "
                    f"(num_classes={mcfg.num_classes}); train with num_classes+1 "
                    "rows to reserve a null class"
                )
        self.np_rng = np.random.default_rng(seed + jax.process_index())
        self.rng = jax.random.key(seed)

        self._build_state(init_params)
        self._maybe_resume()
        self._place_state()
        self._train_step = self._make_train_step()

    # ------------------------------------------------------------------ init
    def _build_state(self, init_params):
        if init_params is None:
            batch, cond = next(self.data)
            # jit the init: unjitted flax init dispatches op-by-op, which is
            # pathological on remote-compile TPU toolchains (~100s even tiny).
            init_params = jax.jit(self.model.init)(
                jax.random.key(0),
                jnp.asarray(batch[: self.microbatch]),
                jnp.zeros((self.microbatch,), jnp.float32),
                **{k: jnp.asarray(v[: self.microbatch]) for k, v in cond.items()},
            )["params"]
        self.params = init_params

        if self.lr_anneal_steps:
            schedule = lambda step: self.lr * jnp.maximum(
                0.0, 1.0 - step / self.lr_anneal_steps
            )
        else:
            schedule = self.lr
        self.opt = optax.adamw(learning_rate=schedule, weight_decay=self.weight_decay)
        self._lr_schedule = schedule
        if self._flat_math:
            leaves = jax.tree_util.tree_leaves(self.params)
            assert all(x.dtype == jnp.float32 for x in leaves), (
                f"opt_impl={self.opt_impl!r} ravels all params into one f32 vector; "
                "found non-f32 leaves"
            )
            flat, self._unravel = jax.flatten_util.ravel_pytree(self.params)
            self._flat_len = int(flat.size)
            self._ravel_jit = jax.jit(lambda t: jax.flatten_util.ravel_pytree(t)[0])
            self._unravel_jit = jax.jit(self._unravel)
            # same structure the tree path's save/restore template logic
            # expects: a pytree; count/m/v mirror optax.scale_by_adam state
            self.opt_state = {
                "count": jnp.zeros((), jnp.int32),
                "m": jnp.zeros_like(flat),
                "v": jnp.zeros_like(flat),
            }
            self.ema_params = [jnp.copy(flat) for _ in self.ema_rate]
        else:
            self.opt_state = self.opt.init(self.params)
            self.ema_params = [
                jax.tree_util.tree_map(jnp.copy, self.params) for _ in self.ema_rate
            ]

    def _ema_tree(self, i):
        """EMA state as a param-tree (flat/zero1 impls keep it raveled)."""
        if self._flat_math:
            return self._unravel_jit(self._strip_pad(self.ema_params[i]))
        return self.ema_params[i]

    def _strip_pad(self, vec):
        """Drop zero1's device padding (vectors are padded to a multiple of
        the mesh size so device_put can shard them evenly)."""
        return vec[: self._flat_len] if vec.shape[0] != self._flat_len else vec

    def _opt_state_for_save(self):
        """Opt state in the on-disk flat layout — identical across opt_impl
        flat/zero1, so runs resume across the two freely."""
        if self._flat_math and self.opt_state["m"].shape[0] != self._flat_len:
            return {
                "count": self.opt_state["count"],
                "m": self._strip_pad(self.opt_state["m"]),
                "v": self._strip_pad(self.opt_state["v"]),
            }
        return self.opt_state

    def _maybe_resume(self):
        resume = self.resume_checkpoint or find_resume_checkpoint()
        if not resume:
            return
        if os.path.basename(str(resume).rstrip("/")) == "orbax":
            # resume from an async-orbax run dir: latest step, whole state
            box = ckpt.OrbaxCheckpointer(resume)
            step = box.latest_step()
            if step is None:
                raise FileNotFoundError(f"no orbax checkpoints under {resume}")
            saved_layout = self._orbax_saved_opt_layout(box, step)
            if saved_layout != self._opt_layout:
                logger.log(
                    f"orbax opt state at step {step} is {saved_layout!r}-layout; "
                    f"converting to opt_impl={self.opt_impl!r}"
                )
            template = {
                "model": self.params,
                # ema checkpoints are param-trees on disk in both opt impls
                **{f"ema_{rate}": self.params for rate in self.ema_rate},
                # restore in the SAVED layout, then convert (resuming across
                # --opt_impl must work for orbax runs like it does for flax)
                "opt": (
                    self.opt_state if saved_layout == self._opt_layout
                    else self._flat_opt_template() if saved_layout == "flat"
                    else self.opt.init(self.params)
                ),
            }
            logger.log(f"loading orbax checkpoint {resume} step {step}...")
            tree = box.restore(step, template)
            box.close()
            self.resume_step = int(step)
            self.params = tree["model"]
            self.ema_params = [
                self._ravel_jit(tree[f"ema_{r}"]) if self._flat_math
                else tree[f"ema_{r}"]
                for r in self.ema_rate
            ]
            self.opt_state = self._convert_opt_state(tree["opt"], saved_layout)
            return
        self.resume_step = ckpt.parse_resume_step_from_filename(resume)
        logger.log(f"loading model from checkpoint: {resume}... (step {self.resume_step})")
        self.params = ckpt.load_params(resume, self.params)
        self.step = 0
        for i, rate in enumerate(self.ema_rate):
            path = ckpt.find_ema_checkpoint(resume, self.resume_step, rate)
            if path:
                logger.log(f"loading EMA from checkpoint: {path}...")
                tree = ckpt.load_params(path, self._ema_tree(i))
                self.ema_params[i] = (
                    self._ravel_jit(tree) if self._flat_math else tree
                )
            elif self._flat_math:
                self.ema_params[i] = self._ravel_jit(self.params)
            else:
                self.ema_params[i] = jax.tree_util.tree_map(jnp.copy, self.params)
        ext = resume.rsplit(".", 1)[-1]
        opt_path = os.path.join(
            os.path.dirname(resume), ckpt.checkpoint_name("opt", self.resume_step, ext=ext)
        )
        if opt_path.endswith(".flax") and ckpt.bf_io.exists(opt_path):
            logger.log(f"loading optimizer state from checkpoint: {opt_path}")
            self._load_opt_checkpoint(opt_path)

    _FLAT_OPT_KEYS = frozenset({"count", "m", "v"})

    def _orbax_saved_opt_layout(self, box, step):
        """Which opt LAYOUT an orbax step holds: sniffed from structure-only
        metadata (flat/zero1 save exactly {count, m, v} under 'opt'). Falls
        back to the current layout if the metadata shape is unrecognizable —
        the restore then validates structure loudly anyway."""
        try:
            opt_meta = box.item_metadata(step)["opt"]
        except Exception:
            return self._opt_layout
        if isinstance(opt_meta, (list, tuple)):
            return "tree"  # the optax chain tuple; flat is always a dict
        try:
            keys = set(opt_meta.keys())
        except AttributeError:
            return self._opt_layout
        return "flat" if keys == self._FLAT_OPT_KEYS else "tree"

    def _flat_opt_template(self):
        flat_p, _ = jax.flatten_util.ravel_pytree(self.params)
        return {
            "count": np.zeros((), np.int32),
            "m": np.zeros_like(flat_p),
            "v": np.zeros_like(flat_p),
        }

    def _convert_opt_state(self, loaded, saved_layout):
        """Adopt an optimizer state saved under `saved_layout` into this
        loop's opt_impl. The tree layout is optax.adamw's chain state, the
        flat layout (shared by opt_impl flat and zero1) is {count, m, v}
        raveled vectors; both carry the same Adam moments, so a layout
        mismatch is repaired by (un)raveling rather than refusing the
        resume."""
        if saved_layout == self._opt_layout:
            return loaded
        if self._opt_layout == "flat":
            adam = next(
                s for s in loaded if isinstance(s, optax.ScaleByAdamState)
            )
            return {
                "count": jnp.asarray(adam.count),
                "m": self._ravel_jit(adam.mu),
                "v": self._ravel_jit(adam.nu),
            }
        flat_p, unravel = jax.flatten_util.ravel_pytree(self.params)
        count = jnp.asarray(loaded["count"])

        def fix(s):
            if isinstance(s, optax.ScaleByAdamState):
                return s._replace(
                    count=count, mu=unravel(loaded["m"]), nu=unravel(loaded["v"])
                )
            if isinstance(s, optax.ScaleByScheduleState):
                return s._replace(count=count)
            return s

        return tuple(fix(s) for s in self.opt.init(self.params))

    def _load_opt_checkpoint(self, path):
        """Restore optimizer state, converting across opt_impl layouts.

        The saved layout is sniffed from the raw msgpack structure (flat =
        exactly {count, m, v}) instead of try/except on a typed load, so IO
        errors and wrong-model shapes stay loud instead of being misread as
        a layout mismatch."""
        raw = ckpt.peek_flax(path)
        saved_layout = (
            "flat"
            if isinstance(raw, dict) and set(raw) == self._FLAT_OPT_KEYS
            else "tree"
        )
        if saved_layout == self._opt_layout:
            self.opt_state = ckpt.load_flax(path, self.opt_state)
            return
        logger.log(
            f"opt checkpoint {path} is {saved_layout!r}-layout; converting to "
            f"opt_impl={self.opt_impl!r}"
        )
        template = (
            self._flat_opt_template() if saved_layout == "flat"
            else self.opt.init(self.params)
        )
        self.opt_state = self._convert_opt_state(
            ckpt.load_flax(path, template), saved_layout
        )

    def _place_state(self):
        if self.param_sharding == "fsdp":
            # ZeRO-3-style: params + Adam moments + every EMA copy sharded
            # over 'data'; XLA all-gathers params for compute and
            # reduce-scatters grads. Single-host save/restore still works:
            # checkpoint IO gathers through fully-addressable arrays.
            # with an SP 'space' (or TP 'model') axis present, spread shards
            # over the whole pool — otherwise each space/model group would
            # hold a full copy of every 'data'-axis shard
            fsdp_axes = "data"
            if "space" in self.mesh.axis_names:
                fsdp_axes = ("data", "space")
            elif "model" in self.mesh.axis_names:
                fsdp_axes = ("data", "model")
            self._param_shd = fsdp_sharding_tree(self.mesh, self.params, fsdp_axes)
            self._opt_shd = fsdp_sharding_tree(self.mesh, self.opt_state, fsdp_axes)
            self._ema_shd = [
                fsdp_sharding_tree(self.mesh, e, fsdp_axes) for e in self.ema_params
            ]
            self.params = shard_tree(self.params, self._param_shd)
            self.opt_state = shard_tree(self.opt_state, self._opt_shd)
            self.ema_params = [
                shard_tree(e, s) for e, s in zip(self.ema_params, self._ema_shd)
            ]
        elif self.opt_impl == "zero1":
            # ZeRO-1: params replicated (model compute untouched), but the
            # flat m/v/EMA vectors sharded over the whole pool — optimizer
            # state memory drops to 1/N per chip and the elementwise update
            # runs at 1/N bandwidth. GSPMD turns the grad all-reduce into
            # reduce-scatter + a single all-gather of the updated params.
            # Vectors are zero-padded to a multiple of the mesh size (eager
            # device_put needs even shards); padding tails stay zero under
            # the Adam update and are stripped at save/unravel time.
            axes = "data"
            if "space" in self.mesh.axis_names:
                axes = ("data", "space")
            elif "model" in self.mesh.axis_names:
                axes = ("data", "model")
            shards = int(np.prod([self.mesh.shape[a] for a in (
                axes if isinstance(axes, tuple) else (axes,)
            )]))
            self._zero1_pad = (-self._flat_len) % shards
            self._zero1_shd = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec(axes)
            )

            def pad_shard(v):
                v = jnp.asarray(v)
                if self._zero1_pad:
                    v = jnp.concatenate(
                        [v, jnp.zeros((self._zero1_pad,), v.dtype)]
                    )
                return jax.device_put(v, self._zero1_shd)

            self._param_shd = self._opt_shd = self._ema_shd = None
            self.params = replicate(self.mesh, self.params)
            self.opt_state = {
                "count": replicate(self.mesh, self.opt_state["count"]),
                "m": pad_shard(self.opt_state["m"]),
                "v": pad_shard(self.opt_state["v"]),
            }
            self.ema_params = [pad_shard(e) for e in self.ema_params]
        else:
            self._param_shd = self._opt_shd = self._ema_shd = None
            self.params = replicate(self.mesh, self.params)
            self.opt_state = replicate(self.mesh, self.opt_state)
            self.ema_params = [replicate(self.mesh, e) for e in self.ema_params]

    # ------------------------------------------------------------- train step
    def _make_train_step(self):
        model = self.model
        diffusion = self.diffusion
        opt = self.opt
        flat_math = self._flat_math
        zero1_shd = getattr(self, "_zero1_shd", None)
        zero1_pad = getattr(self, "_zero1_pad", 0)
        lr_schedule = self._lr_schedule
        weight_decay = self.weight_decay
        unravel = self._unravel if self._flat_math else None
        ema_rates = tuple(self.ema_rate)
        n_micro = self.n_micro
        # the step sees the GLOBAL batch: world * per-process microbatch rows
        # per scan iteration (DDP grad-mean-over-world parity, SURVEY §2.1)
        micro = self.microbatch * max(1, jax.process_count())
        param_shd, opt_shd, ema_shd = self._param_shd, self._opt_shd, self._ema_shd
        rep_shd = replicated(self.mesh)
        vec_shd = data_sharding(self.mesh)

        cond_drop_p, cond_null_y = self.cond_dropout, self.cond_null_y

        def loss_of_microbatch(params, x, cond, t, weights, rng):
            if cond_drop_p:
                rng, cdrop_rng = jax.random.split(rng)
                cond = drop_conditioning(cdrop_rng, cond, cond_drop_p, cond_null_y)
            dropout_rng, noise_rng = jax.random.split(rng)

            def model_fn(xx, tt, **kw):
                return model.apply(
                    {"params": params}, xx, tt, train=True,
                    rngs={"dropout": dropout_rng}, **kw,
                )

            noise = jax.random.normal(noise_rng, x.shape, dtype=x.dtype)
            terms = diffusion.training_losses(model_fn, x, t, noise, model_kwargs=cond)
            loss = jnp.mean(terms["loss"] * weights)
            return loss, terms

        def train_step(params, opt_state, ema_params, batch, cond, t, weights, rng):
            # ZeRO-3 structure: compute with params constrained REPLICATED —
            # one loop-invariant all-gather that XLA hoists out of the
            # microbatch scan — so batch-sharded activations never meet
            # dimension-sharded weights mid-layer (that mismatch made the
            # partitioner fall back to "involuntary full rematerialization"
            # on emb/attention tensors, MULTICHIP_r02). Grads are pinned
            # back to the FSDP spec (reduce-scatter) per microbatch, and the
            # optimizer/EMA update runs fully sharded.
            if param_shd is not None:
                rep_tree = jax.tree_util.tree_map(lambda _: rep_shd, params)
                compute_params = constrain_tree(params, rep_tree)
            else:
                compute_params = params

            # reshape [B, ...] -> [n_micro, micro, ...]
            def split(x):
                return x.reshape((n_micro, micro) + x.shape[1:])

            mb = jax.tree_util.tree_map(split, (batch, cond, t, weights))
            rngs = jax.random.split(rng, n_micro)

            grad_fn = jax.value_and_grad(loss_of_microbatch, has_aux=True)

            def scan_body(acc, inp):
                (x, c, tt, w), r = inp
                # pin conditioning slices to batch-sharded: the dynamic-slice
                # out of the [n_micro, ...] stack otherwise inherits a mixed
                # sharding under FSDPxTP and GSPMD falls back to involuntary
                # full rematerialization on the tiny [micro, feat] tensors
                # (tests/test_fsdp.py)
                c = jax.tree_util.tree_map(
                    lambda v: jax.lax.with_sharding_constraint(v, vec_shd), c
                )
                (loss, terms), grads = grad_fn(compute_params, x, c, tt, w, r)
                acc = jax.tree_util.tree_map(jnp.add, acc, grads)
                if param_shd is not None:
                    # reduce-scatter each microbatch's grads immediately so
                    # the scan carry stays 1/N-sized per device (ZeRO-2 grads)
                    acc = constrain_tree(acc, param_shd)
                return acc, (loss, terms["loss"], terms.get("mse", terms["loss"]),
                             terms.get("vb", jnp.zeros_like(terms["loss"])))

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
            if param_shd is not None:
                zero_grads = constrain_tree(zero_grads, param_shd)
            grads, (losses, loss_vec, mse_vec, vb_vec) = jax.lax.scan(
                scan_body, zero_grads, ((mb[0], mb[1], mb[2], mb[3]), rngs)
            )

            if flat_math:
                # single-buffer AdamW + EMA: exact optax.adamw math (chain of
                # scale_by_adam b1=.9 b2=.999 eps=1e-8 -> add_decayed_weights
                # -> -schedule(count)) on raveled vectors. One fused
                # elementwise pass per state tensor instead of ~10 tiny
                # kernels x ~500 leaves (tools/opt_tail_probe.py).
                fg = jax.flatten_util.ravel_pytree(grads)[0]
                fp = jax.flatten_util.ravel_pytree(params)[0]
                if zero1_shd is not None:
                    # ZeRO-1: pad to the stored (evenly-shardable) length,
                    # pin the raveled grads REPLICATED first (otherwise the
                    # partitioner propagates the shard layout back into the
                    # ~500-leaf ravel concat and shreds it into per-leaf
                    # collectives — measured 429 all-gathers + 53
                    # collective-permutes vs 10 with the explicit two-step),
                    # then reshard to the shard layout: replicated -> tiled
                    # is a LOCAL slice, no communication. The update runs
                    # shard-wise (m/v/ema enter already sharded) and only
                    # the UPDATED param vector is all-gathered at the end.
                    fg = jnp.pad(fg, (0, zero1_pad)) if zero1_pad else fg
                    fp = jnp.pad(fp, (0, zero1_pad)) if zero1_pad else fp
                    fg = jax.lax.with_sharding_constraint(fg, rep_shd)
                    fg = jax.lax.with_sharding_constraint(fg, zero1_shd)
                    fp = jax.lax.with_sharding_constraint(fp, rep_shd)
                grad_norm = jnp.linalg.norm(fg)
                param_norm = jnp.linalg.norm(fp)
                count = opt_state["count"]
                lr_t = lr_schedule(count) if callable(lr_schedule) else lr_schedule
                c1 = count + 1
                m = 0.9 * opt_state["m"] + 0.1 * fg
                v = 0.999 * opt_state["v"] + 0.001 * jnp.square(fg)
                m_hat = m / (1.0 - 0.9 ** c1)
                v_hat = v / (1.0 - 0.999 ** c1)
                upd = m_hat / (jnp.sqrt(v_hat) + 1e-8) + weight_decay * fp
                fp = fp - lr_t * upd
                if zero1_shd is not None:
                    m = jax.lax.with_sharding_constraint(m, zero1_shd)
                    v = jax.lax.with_sharding_constraint(v, zero1_shd)
                opt_state = {"count": c1, "m": m, "v": v}
                ema_params = tuple(
                    e + (1.0 - rate) * (fp - e)
                    for e, rate in zip(ema_params, ema_rates)
                )
                if zero1_shd is not None:
                    ema_params = tuple(
                        jax.lax.with_sharding_constraint(e, zero1_shd)
                        for e in ema_params
                    )
                    fp = jax.lax.with_sharding_constraint(fp, rep_shd)
                    if zero1_pad:
                        fp = fp[:-zero1_pad]
                params = unravel(fp)
            else:
                grad_norm = _global_norm(grads)
                param_norm = _global_norm(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                ema_params = tuple(
                    optax.incremental_update(params, e, step_size=1.0 - rate)
                    for e, rate in zip(ema_params, ema_rates)
                )
            if param_shd is not None:
                # pin outputs to the FSDP layout: the optimizer + EMA update
                # runs fully sharded and state round-trips step-to-step
                # without resharding (donation reuses the input buffers)
                params = constrain_tree(params, param_shd)
                opt_state = constrain_tree(opt_state, opt_shd)
                ema_params = tuple(
                    constrain_tree(e, s) for e, s in zip(ema_params, ema_shd)
                )
            # pin metric shardings: scalars replicated (host-fetchable from
            # every process), per-example vecs batch-sharded so each process
            # reads back exactly its own examples via host_local_part
            con = jax.lax.with_sharding_constraint
            metrics = dict(
                loss=con(jnp.mean(losses), rep_shd),
                grad_norm=con(grad_norm, rep_shd),
                param_norm=con(param_norm, rep_shd),
                loss_vec=con(loss_vec.reshape(-1), vec_shd),
                mse_vec=con(mse_vec.reshape(-1), vec_shd),
                vb_vec=con(vb_vec.reshape(-1), vec_shd),
            )
            return params, opt_state, ema_params, metrics

        return jax.jit(train_step, donate_argnums=(0, 1, 2))

    # -------------------------------------------------------------- main loop
    def run_loop(self):
        from ..utils.profiling import StepProfiler, annotate

        prof = StepProfiler(self._profile_dir, num_steps=self._profile_steps)
        try:
            while not self.lr_anneal_steps or self.step + self.resume_step < self.lr_anneal_steps:
                prof.maybe_start(self.step)
                # wait_* wall-time keys (reference logger.profile_kv, logger.py:293-317)
                with prof.step_scope(self.step):
                    with logger.profile_kv("data"), annotate("data"):
                        batch, cond = next(self.data)
                    with logger.profile_kv("step"), annotate("train_step"):
                        self.run_step(batch, cond)
                prof.maybe_stop(self.step)
                if self.step % self.log_interval == 0:
                    self.flush_metrics()  # include this step in the dump
                    logger.dumpkvs()
                if self.step % self.save_interval == 0 and self.step > 0:
                    self.flush_metrics()
                    with logger.profile_kv("val"), annotate("val_sample"):
                        self.save()
                        self.val_sample()
                    if os.environ.get("DIFFUSION_TRAINING_TEST", "") and self.step > 0:
                        return
                self.step += 1
            self.flush_metrics()
            if (self.step - 1) % self.save_interval != 0:
                self.save()
        finally:
            prof.stop()
            if self._orbax is not None:
                self._orbax.wait()  # don't exit with an async save in flight

    def run_step(self, batch, cond):
        t_np, w_np = self.schedule_sampler.sample(self.batch_size, self.np_rng)
        if self._loss_weight_table is not None:
            w_np = (w_np * self._loss_weight_table[t_np]).astype(np.float32)
        self.rng, step_rng = jax.random.split(self.rng)

        batch = shard_batch(self.mesh, jnp.asarray(batch, dtype=jnp.float32))
        cond = shard_batch(self.mesh, {k: jnp.asarray(v) for k, v in cond.items()})
        t = shard_batch(self.mesh, jnp.asarray(t_np))
        w = shard_batch(self.mesh, jnp.asarray(w_np))

        self.params, self.opt_state, self.ema_params, metrics = self._train_step(
            self.params, self.opt_state, tuple(self.ema_params), batch, cond, t, w, step_rng
        )
        self.ema_params = list(self.ema_params)

        if isinstance(self.schedule_sampler, LossAwareSampler):
            # the sampler needs this step's losses before drawing the next
            # step's t (reference train_util.py:190): stay synchronous, but
            # still fetch all metrics in ONE device round trip
            self.flush_metrics()
            metrics = self._fetch_metrics(metrics)
            # loss_vec holds THIS process's examples (host_local_part), so
            # the sampler's cross-process gather (resample.py:83-104 parity)
            # sees each rank's local (t, loss) exactly once
            self.schedule_sampler.update_with_local_losses(
                t_np, np.asarray(metrics["loss_vec"])
            )
            self._log_step_metrics(t_np, metrics)
        else:
            # Deferred logging: fetch the PREVIOUS step's metrics now, while
            # THIS step runs on device. The fetch of one ready metrics tuple
            # is a single round trip; the old synchronous per-scalar fetches
            # serialized ~6 device round trips into every step (measured
            # 484 -> ~300 ms/step on a v5e through a remote relay).
            self.flush_metrics()
            self._pending_log = (self.step + self.resume_step, t_np, metrics)

    def flush_metrics(self):
        """Log the deferred previous step's metrics (one batched device_get)."""
        pending = getattr(self, "_pending_log", None)
        if pending is None:
            return
        self._pending_log = None
        step, t_np, metrics = pending
        self._log_step_metrics(t_np, self._fetch_metrics(metrics), step=step)

    def _fetch_metrics(self, metrics):
        """Host-fetch the metrics dict. Single-process: one device_get (the
        measured 484->~300 ms/step batching win on remote relays).
        Multi-process: the replicated scalars come back in one device_get;
        the batch-sharded per-example vecs are read shard-by-shard from
        LOCAL devices via host_local_part (local reads, not cross-host round
        trips), aligned with this process's t_np by construction."""
        if jax.process_count() == 1:
            return jax.device_get(metrics)
        scalars = jax.device_get(
            {k: v for k, v in metrics.items() if not k.endswith("_vec")}
        )
        scalars.update(
            {k: host_local_part(v) for k, v in metrics.items() if k.endswith("_vec")}
        )
        return scalars

    def _log_step_metrics(self, t_np, metrics, step=None):
        step = self.step + self.resume_step if step is None else step
        logger.logkv("step", step)
        logger.logkv("samples", (step + 1) * self.global_batch)
        logger.logkv_mean("loss", float(metrics["loss"]))
        logger.logkv_mean("grad_norm", float(metrics["grad_norm"]))
        logger.logkv_mean("param_norm", float(metrics["param_norm"]))
        # per-quartile loss logging (train_util.py:381-387)
        T = self.diffusion.num_timesteps
        for name in ("loss", "mse", "vb"):
            vec = np.asarray(metrics[f"{name}_vec"])
            for sub_t, sub_loss in zip(t_np, vec):
                quartile = int(4 * sub_t / T)
                logger.logkv_mean(f"{name}_q{quartile}", float(sub_loss))

    def _anneal_frac(self):
        if not self.lr_anneal_steps:
            return 0.0
        return (self.step + self.resume_step) / self.lr_anneal_steps

    # ------------------------------------------------------------- save / val
    def save(self):
        step = self.step + self.resume_step
        out_dir = get_blob_logdir()
        if self.ckpt_backend == "orbax":
            # async + natively sharded: every process writes its own shards
            # via tensorstore, the train loop keeps stepping during the
            # write. Layout: {run_dir}/orbax/{step}/{model,ema_{rate},opt}.
            if self._orbax is None:
                self._orbax = ckpt.OrbaxCheckpointer(
                    os.path.join(out_dir, "orbax")
                )
            if pdist.is_primary():
                logger.log(f"saving model at step {step} (orbax, async)...")
            tree = {
                "model": self.params,
                **{
                    f"ema_{rate}": self._ema_tree(i)
                    for i, rate in enumerate(self.ema_rate)
                },
                "opt": self._opt_state_for_save(),
            }
            self._orbax.save(step, tree)
            return
        # gather_to_host is a COLLECTIVE when state is sharded across
        # processes (FSDP on a multi-host mesh): every process participates
        # in the all-gather; only the primary writes the files. On a single
        # host (replicated or FSDP) the gathers are local device reads.
        trees = [
            (ckpt.checkpoint_name("model", step), self.params),
            *(
                (ckpt.checkpoint_name("ema", step, rate), self._ema_tree(i))
                for i, rate in enumerate(self.ema_rate)
            ),
            (ckpt.checkpoint_name("opt", step), self._opt_state_for_save()),
        ]
        if pdist.is_primary():
            logger.log(f"saving model at step {step}...")
        for name, tree in trees:
            host_tree = ckpt.gather_to_host(tree)
            if pdist.is_primary():
                ckpt.save_flax(os.path.join(out_dir, name), host_tree)
        pdist.barrier("save")

    def _get_val_chain(self, shape):
        """Jitted full-chain val sampler, cached per output shape.

        Built once and reused across save intervals — rebuilding jax.jit per
        call (as the first cut did) discards jit's executable cache and pays a
        full recompile of the sampling chain every val_sample.
        """
        cache = getattr(self, "_val_chain_cache", None)
        if cache is None:
            cache = self._val_chain_cache = {}
        key = (self.use_ddim_for_val, shape)
        chain = cache.get(key)
        if chain is None:
            loop = (
                self.diffusion.ddim_sample_loop
                if self.use_ddim_for_val
                else self.diffusion.p_sample_loop
            )

            # jit the whole chain (eager scan dispatch is pathologically slow
            # on remote-attached TPUs); params as jit args, not constants.
            def _chain(ema, key, mk):
                def model_fn(x, t, **kw):
                    return self.model.apply({"params": ema}, x, t, **kw)

                out = loop(model_fn, shape, key, model_kwargs=mk)
                # leading-dim sharded output so each process can host-read
                # its own rows (multi-process val; no-op single-process)
                return jax.lax.with_sharding_constraint(
                    out, data_sharding(self.mesh)
                )

            chain = cache[key] = jax.jit(_chain)
        return chain

    def val_sample(self, which: int | None = None, num_samples: int = 8):
        """Sample a small grid from each val dataset (train_util.py:269-341).

        Fix-forward of the reference's val bugs (SURVEY.md §0.1): val_datasets
        is optional, and the ddim switch comes from use_ddim_for_val instead of
        a stale args namespace.
        """
        if not self.val_datasets:
            return
        datasets = self.val_datasets if which is None else [self.val_datasets[which]]
        for di, ds in enumerate(datasets):
            try:
                batch, cond = next(ds)
            except StopIteration:
                continue
            n = min(num_samples, len(batch))
            if jax.process_count() > 1:
                # each process contributes its local val batch; the chain
                # runs SPMD over the global array (replicated EMA params +
                # a process-local batch cannot meet in one jit program)
                batch_host = np.asarray(batch[:n], dtype=np.float32)
                batch = shard_batch(self.mesh, batch_host)
                cond = shard_batch(
                    self.mesh, {k: np.asarray(v[:n]) for k, v in cond.items()}
                )
            else:
                batch_host = None
                batch = jnp.asarray(batch[:n], dtype=jnp.float32)
                cond = {k: jnp.asarray(v[:n]) for k, v in cond.items()}

            self.rng, sample_rng = jax.random.split(self.rng)
            chain = self._get_val_chain(batch.shape)
            sample = chain(self._ema_tree(0), sample_rng, cond)
            gathered = pdist.all_gather_host(host_local_part(sample))
            gathered = gathered.reshape((-1,) + gathered.shape[2:])
            # gather targets the same way so the samples/targets grids
            # correspond row-for-row under multi-process
            targets = pdist.all_gather_host(
                batch_host if batch_host is not None else np.asarray(batch)
            )
            targets = targets.reshape((-1,) + targets.shape[2:])
            if pdist.is_primary():
                step = self.step + self.resume_step
                out_dir = get_blob_logdir()
                np.savez(
                    os.path.join(out_dir, f"val_samples_{di}_{step:06d}.npz"), gathered
                )
                save_img(
                    tensor2img(gathered),
                    os.path.join(out_dir, f"val_samples_{di}_{step:06d}.png"),
                )
                save_img(
                    tensor2img(targets),
                    os.path.join(out_dir, f"val_targets_{di}_{step:06d}.png"),
                )
        pdist.barrier("val_sample")


def get_blob_logdir() -> str:
    """Where checkpoints/samples go (train_util.py:359-362)."""
    return os.environ.get("DIFFUSION_BLOB_LOGDIR", logger.get_dir())


def find_resume_checkpoint():
    """Auto-discover the latest model checkpoint in the blob log dir.

    The reference leaves this as a stub returning None
    (train_util.py:365-368, "needs to be implemented on your
    infrastructure"); the intended behavior — resume the newest
    model{step}.flax in DIFFUSION_BLOB_LOGDIR — is implemented here
    (fix-forward, SURVEY.md §0.1 policy). Opt-in: only active when
    DIFFUSION_AUTO_RESUME=1, so fresh runs in a reused log dir don't
    silently resume.
    """
    if os.environ.get("DIFFUSION_AUTO_RESUME", "") != "1":
        return None
    out_dir = get_blob_logdir()
    if not out_dir or not ckpt.bf_io.exists(out_dir):
        return None
    best_step, best = -1, None
    for name in ckpt.bf_io.listdir(out_dir):
        if name.startswith("model") and name.endswith(".flax"):
            step = ckpt.parse_resume_step_from_filename(name)
            if step > best_step:
                best_step, best = step, ckpt.bf_io.join(out_dir, name)
    if best is None and "orbax" in ckpt.bf_io.listdir(out_dir):
        # ckpt_backend=orbax runs keep their checkpoints under {dir}/orbax/
        # — hand _maybe_resume the dir, which restores the latest step
        orbax_dir = ckpt.bf_io.join(out_dir, "orbax")
        if ckpt.bf_io.isdir(orbax_dir) and ckpt.bf_io.listdir(orbax_dir):
            return orbax_dir
    return best


def log_loss_dict(diffusion: Diffusion, ts, losses: dict):
    """train_util.py:381-387 parity helper for scripts that log manually."""
    for key, values in losses.items():
        values = np.asarray(values)
        logger.logkv_mean(key, float(values.mean()))
        for sub_t, sub_loss in zip(np.asarray(ts), values):
            quartile = int(4 * sub_t / diffusion.num_timesteps)
            logger.logkv_mean(f"{key}_q{quartile}", float(sub_loss))
