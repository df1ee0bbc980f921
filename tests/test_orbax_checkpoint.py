"""Async orbax checkpoint backend round trip."""

import numpy as np

import jax.numpy as jnp

from guided_diffusion_clip_tpu.utils.checkpoint import OrbaxCheckpointer


def test_orbax_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones((4,))}}
    ck = OrbaxCheckpointer(str(tmp_path / "orbax"))
    ck.save(5, tree)
    ck.wait()
    assert ck.latest_step() == 5
    template = {"a": jnp.zeros((2, 3)), "b": {"c": jnp.zeros((4,))}}
    restored = ck.restore(5, template)
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(restored["b"]["c"]), np.asarray(tree["b"]["c"]))
    ck.close()


import pytest


@pytest.mark.slow
def test_trainloop_orbax_backend_save_resume(tmp_path):
    """ckpt_backend='orbax': async save during training, resume from the
    orbax run dir restores model/EMA/opt at the latest step."""
    import jax
    import numpy as np

    from guided_diffusion_clip_tpu.models.unet import UNetConfig, UNetModel
    from guided_diffusion_clip_tpu.training.train_loop import TrainLoop
    from guided_diffusion_clip_tpu.utils import logger
    from guided_diffusion_clip_tpu.utils.script_util import create_gaussian_diffusion

    logger.configure_dir(dir=str(tmp_path), format_strs=[])
    cfg = UNetConfig(
        image_size=8, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1,),
        num_heads=1, use_scale_shift_norm=True,
    )
    model = UNetModel(config=cfg)
    diffusion = create_gaussian_diffusion(steps=10, noise_schedule="cosine")

    def data_gen():
        while True:
            yield np.zeros((4, 8, 8, 3), np.float32), {}

    loop = TrainLoop(
        model=model, diffusion=diffusion, data=data_gen(), batch_size=4,
        microbatch=-1, lr=1e-3, ema_rate="0.99", log_interval=10**9,
        save_interval=10**9, seed=0, ckpt_backend="orbax",
    )
    for _ in range(2):
        b, c = next(loop.data)
        loop.run_step(b, c)
        loop.step += 1
    loop.flush_metrics()
    loop.save()
    loop._orbax.wait()

    orbax_dir = str(tmp_path / "orbax")
    loop2 = TrainLoop(
        model=model, diffusion=diffusion, data=data_gen(), batch_size=4,
        microbatch=-1, lr=1e-3, ema_rate="0.99", log_interval=10**9,
        save_interval=10**9, seed=0, resume_checkpoint=orbax_dir,
    )
    assert loop2.resume_step == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(loop.params)),
        jax.tree_util.tree_leaves(jax.device_get(loop2.params)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(loop.ema_params[0])),
        jax.tree_util.tree_leaves(jax.device_get(loop2.ema_params[0])),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # sampling-CLI surface: load_params consumes the orbax run dir directly,
    # "@ema_{rate}" selects the EMA subtree (no conversion step)
    from guided_diffusion_clip_tpu.utils.checkpoint import load_params

    tpl = jax.device_get(loop.params)
    got = load_params(orbax_dir, tpl)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(loop.params)),
        jax.tree_util.tree_leaves(got),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    got_ema = load_params(orbax_dir + "@ema_0.99", tpl)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(loop.ema_params[0])),
        jax.tree_util.tree_leaves(got_ema),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_trainloop_orbax_cross_opt_impl_resume(tmp_path):
    """An orbax run saved with one --opt_impl resumes under the other, like
    the flax path: the saved layout is sniffed from structure-only metadata
    and the Adam moments are (un)raveled into the resuming impl."""
    import jax
    import jax.flatten_util
    import numpy as np
    import optax

    from guided_diffusion_clip_tpu.models.unet import UNetConfig, UNetModel
    from guided_diffusion_clip_tpu.training.train_loop import TrainLoop
    from guided_diffusion_clip_tpu.utils import logger
    from guided_diffusion_clip_tpu.utils.script_util import create_gaussian_diffusion

    logger.configure_dir(dir=str(tmp_path), format_strs=[])
    cfg = UNetConfig(
        image_size=8, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1,),
        num_heads=1, use_scale_shift_norm=True,
    )
    model = UNetModel(config=cfg)
    diffusion = create_gaussian_diffusion(steps=10, noise_schedule="cosine")

    def data_gen():
        rng = np.random.default_rng(3)
        while True:
            yield rng.normal(size=(4, 8, 8, 3)).astype(np.float32), {}

    kw = dict(
        model=model, diffusion=diffusion, batch_size=4, microbatch=-1,
        lr=1e-3, ema_rate="0.99", log_interval=10**9, save_interval=10**9,
        seed=0,
    )
    loop = TrainLoop(data=data_gen(), ckpt_backend="orbax", **kw)  # tree impl
    for _ in range(2):
        b, c = next(loop.data)
        loop.run_step(b, c)
        loop.step += 1
    loop.flush_metrics()
    loop.save()
    loop._orbax.wait()
    orbax_dir = str(tmp_path / "orbax")

    # tree-layout orbax save -> flat resume
    flat = TrainLoop(
        data=data_gen(), opt_impl="flat", resume_checkpoint=orbax_dir,
        ckpt_backend="orbax", **kw
    )
    assert flat.resume_step == 2
    adam = next(
        s for s in jax.device_get(loop.opt_state)
        if isinstance(s, optax.ScaleByAdamState)
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(flat.opt_state["m"])),
        np.asarray(jax.flatten_util.ravel_pytree(adam.mu)[0]),
    )
    assert int(jax.device_get(flat.opt_state["count"])) == int(adam.count)

    # flat-layout orbax save -> tree resume
    flat.step = 1
    flat.save()
    flat._orbax.wait()
    tree = TrainLoop(data=data_gen(), resume_checkpoint=orbax_dir, **kw)
    assert tree.resume_step == 3  # flat saved at resume_step 2 + step 1
    adam2 = next(
        s for s in jax.device_get(tree.opt_state)
        if isinstance(s, optax.ScaleByAdamState)
    )
    np.testing.assert_array_equal(
        np.asarray(jax.flatten_util.ravel_pytree(adam2.mu)[0]),
        np.asarray(jax.device_get(flat.opt_state["m"])),
    )
    # resumed loop still steps
    b, c = next(tree.data)
    tree.run_step(b, c)
