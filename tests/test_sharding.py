"""Data-parallel correctness on the 8-device CPU mesh.

The sharded train step must produce the same numbers as a single-device run:
gradient psum over the mesh == full-batch gradient (the reference's DDP
allreduce semantics, train_util.py:98-105).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guided_diffusion_clip_tpu.models.unet import UNetConfig, UNetModel
from guided_diffusion_clip_tpu.parallel.mesh import (
    create_mesh,
    data_sharding,
    replicate,
    shard_batch,
)
from guided_diffusion_clip_tpu.training.train_loop import TrainLoop
from guided_diffusion_clip_tpu.utils.script_util import create_gaussian_diffusion
from guided_diffusion_clip_tpu.utils import logger


def tiny_model():
    cfg = UNetConfig(
        image_size=8, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, use_scale_shift_norm=True,
    )
    return UNetModel(config=cfg)


def data_gen(batch_size, seed=0):
    rs = np.random.RandomState(seed)
    while True:
        yield rs.uniform(-1, 1, (batch_size, 8, 8, 3)).astype(np.float32), {}


def make_loop(mesh, batch_size, seed=0, **kw):
    import tempfile

    logger.configure_dir(dir=tempfile.mkdtemp(), format_strs=[])
    model = tiny_model()
    diffusion = create_gaussian_diffusion(
        steps=20, noise_schedule="cosine", learn_sigma=True, rescale_learned_sigmas=True
    )
    return TrainLoop(
        model=model, diffusion=diffusion, data=data_gen(batch_size, seed),
        batch_size=batch_size, microbatch=-1, lr=1e-3, ema_rate="0.99",
        log_interval=10**9, save_interval=10**9, mesh=mesh, seed=7, **kw,
    )


class TestMeshBasics:
    def test_mesh_covers_devices(self):
        mesh = create_mesh()
        assert mesh.devices.size == len(jax.devices()) == 8

    def test_batch_is_sharded(self):
        mesh = create_mesh()
        x = shard_batch(mesh, jnp.zeros((16, 4)))
        assert x.sharding == data_sharding(mesh)
        assert len(x.sharding.device_set) == 8

    def test_replicated_params(self):
        mesh = create_mesh()
        p = replicate(mesh, {"w": jnp.ones((3, 3))})
        assert len(p["w"].sharding.device_set) == 8


@pytest.mark.slow
class TestDPMatchesSingleDevice:
    def test_one_step_identical(self):
        mesh8 = create_mesh()
        mesh1 = create_mesh(axes=(("data", 1),), devices=jax.devices()[:1])

        loop8 = make_loop(mesh8, batch_size=16)
        # same init params on the single-device loop
        init_params = jax.device_get(loop8.params)
        loop1 = make_loop(mesh1, batch_size=16, init_params=init_params)

        b8, c8 = next(data_gen(16, seed=42))
        loop8.run_step(b8, c8)
        loop1.run_step(b8, c8)

        p8 = jax.device_get(loop8.params)
        p1 = jax.device_get(loop1.params)
        for (k8, v8), (k1, v1) in zip(
            jax.tree_util.tree_flatten_with_path(p8)[0],
            jax.tree_util.tree_flatten_with_path(p1)[0],
        ):
            np.testing.assert_allclose(v8, v1, rtol=2e-5, atol=2e-6, err_msg=str(k8))

        # EMA moved identically too
        e8 = jax.device_get(loop8.ema_params[0])
        e1 = jax.device_get(loop1.ema_params[0])
        for v8, v1 in zip(jax.tree_util.tree_leaves(e8), jax.tree_util.tree_leaves(e1)):
            np.testing.assert_allclose(v8, v1, rtol=2e-5, atol=2e-6)

    def test_microbatching_matches_full_batch_when_single_micro(self):
        # n_micro=1 must equal microbatch disabled (sanity of the scan path)
        mesh = create_mesh()
        loopA = make_loop(mesh, batch_size=8)
        init_params = jax.device_get(loopA.params)
        loopB = make_loop(mesh, batch_size=8, init_params=init_params)
        loopB.microbatch = 8
        b, c = next(data_gen(8, seed=9))
        loopA.run_step(b, c)
        loopB.run_step(b, c)
        for vA, vB in zip(
            jax.tree_util.tree_leaves(jax.device_get(loopA.params)),
            jax.tree_util.tree_leaves(jax.device_get(loopB.params)),
        ):
            np.testing.assert_allclose(vA, vB, rtol=1e-6)


@pytest.mark.slow
class TestDeferredMetricLogging:
    """run_step defers the metrics fetch one step (one batched device_get
    while the next step runs on device); flush_metrics drains it with the
    step number it belonged to."""

    def test_flush_logs_previous_step(self):
        from guided_diffusion_clip_tpu.utils import logger

        mesh = create_mesh()
        loop = make_loop(mesh, batch_size=8)
        b, c = next(data_gen(8, seed=3))
        loop.run_step(b, c)
        assert loop._pending_log is not None
        assert "loss" not in logger.getkvs()  # not fetched yet

        loop.step += 1
        b, c = next(data_gen(8, seed=4))
        loop.run_step(b, c)  # flushes step 0, defers step 1
        kvs = dict(logger.getkvs())
        assert kvs["step"] == 0 and kvs["loss"] != 0.0
        loop.flush_metrics()
        assert dict(logger.getkvs())["step"] == 1
        assert loop._pending_log is None
        loop.flush_metrics()  # idempotent when drained

    def test_loss_aware_sampler_stays_synchronous(self):
        from guided_diffusion_clip_tpu.training.resample import (
            LossSecondMomentResampler,
        )

        mesh = create_mesh()
        loop = make_loop(mesh, batch_size=8)
        loop.schedule_sampler = LossSecondMomentResampler(
            loop.diffusion.num_timesteps, history_per_term=2
        )
        b, c = next(data_gen(8, seed=5))
        loop.run_step(b, c)
        # losses reached the sampler history and the log in the same step
        assert loop.schedule_sampler._loss_counts.sum() > 0
        assert getattr(loop, "_pending_log", None) is None


class TestLossAwareSampler:
    def test_second_moment_resampler_warms_up(self):
        from guided_diffusion_clip_tpu.training.resample import LossSecondMomentResampler

        s = LossSecondMomentResampler(num_timesteps=5, history_per_term=3)
        rng = np.random.default_rng(0)
        # uniform until warm
        np.testing.assert_array_equal(s.weights(), np.ones(5))
        for _ in range(20):
            ts = rng.integers(0, 5, size=8)
            losses = np.where(ts == 2, 10.0, 1.0)  # t=2 is hard
            s.update_with_all_losses(ts.tolist(), losses.tolist())
        w = s.weights()
        assert w[2] == w.max()
        t, weights = s.sample(64, rng)
        assert (t == 2).sum() > (t == 0).sum()  # oversamples hard timesteps
        assert np.all(weights > 0)


def test_trainloop_clears_stale_spatial_state():
    """A previous CLI/loop's process-global SP state must not leak into a
    plain-DP TrainLoop built afterwards (it would trace against the stale
    (data, space) mesh)."""
    from guided_diffusion_clip_tpu.parallel import sp

    sp.setup_from_flag(2, batch_size=8)  # leaves process-global SP active
    assert sp.active()
    try:
        mesh = create_mesh()
        loop = make_loop(mesh, batch_size=8)  # spatial_shard defaults to 0
        assert not sp.active(), "TrainLoop should clear stale SP state"
        b, c = next(loop.data)
        loop.run_step(b, c)  # traces without the stale constraint
    finally:
        sp.clear_spatial_sharding()
