"""opt_impl='flat': single-buffer fused AdamW + EMA.

The tree-path optimizer tail lowers to ~10 tiny kernels x ~500 leaves
(measured ~33 ms vs a ~5 ms HBM roofline at the 64px config,
tools/opt_tail_probe.py). The flat path ravels grads/params into one f32
vector and runs the exact optax.adamw math (scale_by_adam -> weight decay ->
-schedule(count)) as a handful of full-width fused passes. Correctness
contract: numerically equivalent to the tree path, same checkpoint formats
on disk (model/ema_{rate} stay param-trees).
"""

import os

import numpy as np
import pytest

import jax

from guided_diffusion_clip_tpu.parallel.mesh import create_mesh
from guided_diffusion_clip_tpu.utils import checkpoint as ckpt
from guided_diffusion_clip_tpu.utils import logger

from tests.test_sharding import data_gen, make_loop


def _steps(loop, n, batch_size, seed=42):
    gen = data_gen(batch_size, seed=seed)
    for _ in range(n):
        b, c = next(gen)
        loop.run_step(b, c)
        loop.step += 1


class TestFlatMatchesTree:
    @pytest.mark.slow
    def test_two_steps_identical(self):
        # Two steps, not more: after step 1 the paths are bit-identical;
        # after step 2 they differ only by fusion noise (~2 ULP relative,
        # 2.3e-7 measured). From step 3 on, Adam's sign-like normalization
        # on zero-init leaves (update ~ g/(|g|+eps), derivative ~1/eps near
        # g->0) chaotically amplifies that ULP noise to ~4e-6, so longer
        # horizons cannot distinguish math bugs from float scheduling. A
        # dropped weight-decay term or a schedule off-by-one would show at
        # >=5e-6 by step 2 -- well above what this rtol/atol admits.
        mesh = create_mesh()
        kw = dict(weight_decay=0.01, lr_anneal_steps=200)
        loop_tree = make_loop(mesh, batch_size=8, **kw)
        init_params = jax.device_get(loop_tree.params)
        loop_flat = make_loop(
            mesh, batch_size=8, init_params=init_params, opt_impl="flat", **kw
        )

        _steps(loop_tree, 2, 8)
        _steps(loop_flat, 2, 8)

        for (kp, vt), (_, vf) in zip(
            jax.tree_util.tree_flatten_with_path(jax.device_get(loop_tree.params))[0],
            jax.tree_util.tree_flatten_with_path(jax.device_get(loop_flat.params))[0],
        ):
            np.testing.assert_allclose(vf, vt, rtol=1e-6, atol=1e-8, err_msg=str(kp))

        # EMA: flat keeps it raveled; _ema_tree restores the tree view
        for vt, vf in zip(
            jax.tree_util.tree_leaves(jax.device_get(loop_tree.ema_params[0])),
            jax.tree_util.tree_leaves(jax.device_get(loop_flat._ema_tree(0))),
        ):
            np.testing.assert_allclose(vf, vt, rtol=1e-6, atol=1e-8)

        # optimizer step count advanced (schedule parity depends on it)
        assert int(jax.device_get(loop_flat.opt_state["count"])) == 2

    @pytest.mark.slow
    def test_checkpoint_roundtrip_and_resume(self):
        mesh = create_mesh()
        loop = make_loop(mesh, batch_size=8, opt_impl="flat")
        _steps(loop, 2, 8)
        loop.step = 1  # save under step 1
        loop.save()
        run_dir = logger.get_dir()

        model_path = os.path.join(run_dir, ckpt.checkpoint_name("model", 1))
        assert os.path.exists(model_path)
        # ema checkpoint format parity: a param-TREE on disk, loadable by the
        # same load_params the sampling CLIs use
        ema_path = ckpt.find_ema_checkpoint(model_path, 1, loop.ema_rate[0])
        assert ema_path, "ema checkpoint missing"
        ema_tree = ckpt.load_params(ema_path, jax.device_get(loop._ema_tree(0)))
        for va, vb in zip(
            jax.tree_util.tree_leaves(ema_tree),
            jax.tree_util.tree_leaves(jax.device_get(loop._ema_tree(0))),
        ):
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

        # resume into a fresh flat loop: params/ema/opt (incl. count) restored
        resumed = make_loop(
            mesh, batch_size=8, opt_impl="flat", resume_checkpoint=model_path
        )
        assert resumed.resume_step == 1
        for va, vb in zip(
            jax.tree_util.tree_leaves(jax.device_get(resumed.params)),
            jax.tree_util.tree_leaves(jax.device_get(loop.params)),
        ):
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(resumed.ema_params[0])),
            np.asarray(jax.device_get(loop.ema_params[0])),
        )
        assert int(jax.device_get(resumed.opt_state["count"])) == 2
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(resumed.opt_state["m"])),
            np.asarray(jax.device_get(loop.opt_state["m"])),
        )


@pytest.mark.slow
def test_resume_across_opt_impls():
    """A run saved with one --opt_impl resumes under the other: the Adam
    moments are (un)raveled across layouts instead of refusing the resume."""
    import jax.flatten_util

    mesh = create_mesh()
    loop = make_loop(mesh, batch_size=8)  # tree
    _steps(loop, 2, 8)
    loop.step = 1
    loop.save()
    model_path = os.path.join(logger.get_dir(), ckpt.checkpoint_name("model", 1))

    # tree save -> flat resume
    flat = make_loop(mesh, batch_size=8, opt_impl="flat", resume_checkpoint=model_path)
    import optax

    adam = next(
        s for s in jax.device_get(loop.opt_state)
        if isinstance(s, optax.ScaleByAdamState)
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(flat.opt_state["m"])),
        np.asarray(jax.flatten_util.ravel_pytree(adam.mu)[0]),
    )
    assert int(jax.device_get(flat.opt_state["count"])) == int(adam.count)

    # flat save -> tree resume (flat.resume_step is 1, so save lands at 1+1=2)
    flat.step = 1
    flat.save()
    flat_model = os.path.join(logger.get_dir(), ckpt.checkpoint_name("model", 2))
    tree = make_loop(mesh, batch_size=8, resume_checkpoint=flat_model)
    adam2 = next(
        s for s in jax.device_get(tree.opt_state)
        if isinstance(s, optax.ScaleByAdamState)
    )
    np.testing.assert_array_equal(
        np.asarray(jax.flatten_util.ravel_pytree(adam2.mu)[0]),
        np.asarray(jax.device_get(flat.opt_state["m"])),
    )
    assert int(adam2.count) == int(jax.device_get(flat.opt_state["count"]))
    # both resumed loops still step
    _steps(tree, 1, 8)


def test_flat_rejects_fsdp():
    mesh = create_mesh()
    with pytest.raises(ValueError, match="FSDP"):
        make_loop(mesh, batch_size=8, opt_impl="flat", param_sharding="fsdp")


def test_corrupt_opt_checkpoint_fails_loudly(tmp_path):
    """A truncated/corrupt opt file must raise the real decode error, not be
    misread as a cross-opt_impl layout mismatch and 'converted'."""
    mesh = create_mesh()
    loop = make_loop(mesh, batch_size=8)
    bad = tmp_path / "opt000001.flax"
    bad.write_bytes(b"\x00\x01 not msgpack at all \xff")
    with pytest.raises(Exception) as ei:
        loop._load_opt_checkpoint(str(bad))
    assert "convert" not in str(ei.value).lower()


class TestZero1:
    """opt_impl='zero1': flat math with m/v/EMA sharded over the mesh
    (ZeRO-1). Params stay replicated, so model compute is untouched; the
    optimizer state drops to 1/N per chip."""

    def test_state_is_sharded(self):
        mesh = create_mesh()
        loop = make_loop(mesh, batch_size=8, opt_impl="zero1")
        n = len(jax.devices())
        for vec in (loop.opt_state["m"], loop.opt_state["v"], loop.ema_params[0]):
            assert len(vec.sharding.device_set) == n
            # actually SHARDED (each device holds 1/N), not replicated
            shard = vec.addressable_shards[0]
            assert shard.data.shape[0] * n >= vec.shape[0] > shard.data.shape[0]
        _steps(loop, 2, 8)
        # state stays sharded across steps (constraints + donation)
        shard = loop.opt_state["m"].addressable_shards[0]
        assert shard.data.shape[0] < loop.opt_state["m"].shape[0]

    @pytest.mark.slow
    def test_two_steps_match_tree(self):
        mesh = create_mesh()
        kw = dict(weight_decay=0.01, lr_anneal_steps=200)
        loop_tree = make_loop(mesh, batch_size=8, **kw)
        init_params = jax.device_get(loop_tree.params)
        loop_z1 = make_loop(
            mesh, batch_size=8, init_params=init_params, opt_impl="zero1", **kw
        )
        _steps(loop_tree, 2, 8)
        _steps(loop_z1, 2, 8)
        # atol 1e-7 (vs flat's 1e-8): the sharded grad reduction changes the
        # summation order, and Adam's sign-like normalization on zero-init
        # leaves amplifies that ULP noise by step 2 (same analysis as
        # TestFlatMatchesTree; measured max 5.2e-8 on one element)
        for (kp, vt), (_, vz) in zip(
            jax.tree_util.tree_flatten_with_path(jax.device_get(loop_tree.params))[0],
            jax.tree_util.tree_flatten_with_path(jax.device_get(loop_z1.params))[0],
        ):
            np.testing.assert_allclose(vz, vt, rtol=1e-6, atol=1e-7, err_msg=str(kp))

    @pytest.mark.slow
    def test_checkpoint_roundtrip_across_impls(self):
        # zero1 saves the same {count, m, v} flat layout as 'flat': a zero1
        # run resumes as flat (and vice versa) with no conversion
        mesh = create_mesh()
        loop = make_loop(mesh, batch_size=8, opt_impl="zero1")
        _steps(loop, 2, 8)
        loop.step = 1
        loop.save()
        model_path = os.path.join(logger.get_dir(), ckpt.checkpoint_name("model", 1))
        # the on-disk layout strips zero1's device padding
        m_true = np.asarray(jax.device_get(loop._strip_pad(loop.opt_state["m"])))
        resumed = make_loop(
            mesh, batch_size=8, opt_impl="flat", resume_checkpoint=model_path
        )
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(resumed.opt_state["m"])), m_true
        )
        # and back into zero1: the restored vectors get re-padded + re-sharded
        z1 = make_loop(
            mesh, batch_size=8, opt_impl="zero1", resume_checkpoint=model_path
        )
        assert len(z1.opt_state["m"].sharding.device_set) == len(jax.devices())
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(z1._strip_pad(z1.opt_state["m"]))), m_true
        )
        _steps(z1, 1, 8)

    def test_zero1_rejects_fsdp(self):
        mesh = create_mesh()
        with pytest.raises(ValueError, match="fsdp|FSDP"):
            make_loop(mesh, batch_size=8, opt_impl="zero1", param_sharding="fsdp")


@pytest.mark.slow
def test_zero1_hlo_collectives_bounded():
    """The zero1 step must not shred the ravel/unravel into per-leaf
    collectives: vs flat it adds ~one all-gather of the updated param
    vector (plus the grad sync). Regression guard for the explicit
    replicated->sharded two-step (a bare sharded constraint on the ravel
    output made GSPMD partition the ~30-leaf concat itself: measured 429
    all-gather + 53 collective-permute instruction defs)."""
    import re

    import jax.numpy as jnp

    from guided_diffusion_clip_tpu.parallel.mesh import shard_batch

    mesh = create_mesh()

    def hlo_counts(impl):
        loop = make_loop(mesh, batch_size=8, opt_impl=impl)
        b, c = next(loop.data)
        t_np, w_np = loop.schedule_sampler.sample(8, loop.np_rng)
        args = (
            loop.params, loop.opt_state, tuple(loop.ema_params),
            shard_batch(mesh, jnp.asarray(b)), shard_batch(mesh, {}),
            shard_batch(mesh, jnp.asarray(t_np)),
            shard_batch(mesh, jnp.asarray(w_np)), jax.random.key(0),
        )
        txt = loop._train_step.lower(*args).compile().as_text()
        return {
            op: len(re.findall(rf"= \S+ {op}\(", txt))
            for op in ("all-reduce", "reduce-scatter", "all-gather",
                       "collective-permute")
        }

    flat, z1 = hlo_counts("flat"), hlo_counts("zero1")
    assert z1["collective-permute"] == 0, z1
    gathers = z1["all-gather"] + z1["reduce-scatter"]
    base = flat["all-gather"] + flat["reduce-scatter"]
    assert gathers <= base + 2, (flat, z1)
    assert z1["all-reduce"] <= flat["all-reduce"] + 2, (flat, z1)
