"""Classifier-free guidance (beyond reference): cfg_model_fn combination math,
train-time conditioning dropout, and an end-to-end train-with-dropout ->
CFG-sample loop on the fork's clip_feat conditioning pathway."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guided_diffusion_clip_tpu.diffusion.guidance import cfg_model_fn
from guided_diffusion_clip_tpu.models.clip_models import UNetModel_clip_feat
from guided_diffusion_clip_tpu.models.unet import UNetConfig
from guided_diffusion_clip_tpu.training.train_loop import TrainLoop, drop_conditioning
from guided_diffusion_clip_tpu.utils import logger
from guided_diffusion_clip_tpu.utils.script_util import create_gaussian_diffusion


class TestCfgModelFn:
    def _stub(self, x, t, y=None, **kw):
        # eps half = x scaled per-example by (1 + y); "variance" half = 7
        scale = (1.0 + y).reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.concatenate([x * scale, jnp.full_like(x, 7.0)], axis=-1)

    def test_combination_math(self):
        x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3) / 10.0
        t = jnp.zeros((2,))
        y = jnp.full((2,), 2.0)
        fn = cfg_model_fn(self._stub, cfg_scale=2.0, null_kwargs={"y": 0.0})
        out = fn(x, t, y=y)
        # cond eps = 3x, uncond eps = x -> x + 2*(3x - x) = 5x
        np.testing.assert_allclose(out[..., :3], 5.0 * x, rtol=1e-6)
        # extra channels (learned variance) come from the COND branch
        np.testing.assert_allclose(out[..., 3:], 7.0, rtol=1e-6)

    def test_scale_one_is_conditional(self):
        x = jax.random.normal(jax.random.key(0), (3, 4, 4, 3))
        t = jnp.zeros((3,))
        y = jnp.asarray([0.5, 1.0, 2.0])
        fn = cfg_model_fn(self._stub, cfg_scale=1.0, null_kwargs={"y": 0.0})
        np.testing.assert_allclose(
            fn(x, t, y=y), self._stub(x, t, y=y), rtol=1e-6
        )

    def test_structural_kwargs_duplicated(self):
        # keys absent from null_kwargs (e.g. low_res) must be fed identically
        # to both branches: with y nulled to 0 the stub's output depends only
        # on low_res, so cond == uncond and any scale returns the same thing
        def stub(x, t, y=None, low_res=None):
            s = (1.0 + y).reshape((-1,) + (1,) * (x.ndim - 1))
            return jnp.concatenate([x * s + low_res, low_res], axis=-1)

        x = jax.random.normal(jax.random.key(1), (2, 4, 4, 3))
        lr = jax.random.normal(jax.random.key(2), (2, 4, 4, 3))
        t = jnp.zeros((2,))
        y = jnp.zeros((2,))
        for scale in (0.0, 3.0):
            out = cfg_model_fn(stub, scale, {"y": 0.0})(x, t, y=y, low_res=lr)
            np.testing.assert_allclose(out[..., :3], x + lr, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(out[..., 3:], lr, rtol=1e-5, atol=1e-6)


class TestDropConditioning:
    def test_p1_all_null(self):
        cond = {
            "clip_feat": jnp.ones((8, 16)),
            "y": jnp.arange(8, dtype=jnp.int32),
        }
        out = drop_conditioning(jax.random.key(0), cond, 1.0, null_y=1000)
        assert np.all(np.asarray(out["clip_feat"]) == 0.0)
        assert np.all(np.asarray(out["y"]) == 1000)

    def test_p0_identity(self):
        cond = {"clip_feat": jnp.ones((4, 16))}
        out = drop_conditioning(jax.random.key(0), cond, 0.0)
        assert out is cond

    def test_same_mask_for_all_keys(self):
        # an example dropped in clip_feat must be the one dropped in y
        cond = {
            "clip_feat": jnp.ones((512, 4)),
            "y": jnp.zeros((512,), jnp.int32),
        }
        out = drop_conditioning(jax.random.key(3), cond, 0.5, null_y=7)
        feat_dropped = np.asarray(out["clip_feat"]).sum(-1) == 0.0
        y_dropped = np.asarray(out["y"]) == 7
        np.testing.assert_array_equal(feat_dropped, y_dropped)
        frac = feat_dropped.mean()
        assert 0.35 < frac < 0.65, frac

    def test_structural_keys_untouched(self):
        lr = jnp.ones((4, 8, 8, 3))
        cond = {"clip_feat": jnp.ones((4, 16)), "low_res": lr}
        out = drop_conditioning(jax.random.key(0), cond, 1.0)
        assert out["low_res"] is lr

    def test_y_without_null_raises(self):
        cond = {"y": jnp.zeros((4,), jnp.int32)}
        with pytest.raises(AssertionError):
            drop_conditioning(jax.random.key(0), cond, 0.5, null_y=-1)


def test_unreserved_null_class_rejected(tmp_path):
    """XLA gather clamps out-of-range Embed indices — an unreserved null
    index would silently train the last real class as 'null'. TrainLoop
    must reject it at construction."""
    from guided_diffusion_clip_tpu.models.unet import UNetModel

    logger.configure_dir(dir=str(tmp_path), format_strs=[])
    cfg = UNetConfig(
        image_size=8, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1,),
        num_heads=1, num_classes=10, label_emb_type="embedding",
    )
    model = UNetModel(config=cfg)
    diffusion = create_gaussian_diffusion(steps=10, noise_schedule="cosine")

    def data_gen():
        while True:
            yield np.zeros((4, 8, 8, 3), np.float32), {
                "y": np.zeros((4,), np.int64)
            }

    with pytest.raises(AssertionError, match="Embed table"):
        TrainLoop(
            model=model, diffusion=diffusion, data=data_gen(), batch_size=4,
            microbatch=-1, lr=1e-3, ema_rate="0.99", log_interval=10**9,
            save_interval=10**9, seed=0, cond_dropout=0.1, cond_null_y=10,
        )


@pytest.mark.slow
def test_train_cond_dropout_then_cfg_sample(tmp_path):
    """Train a tiny clip_feat model WITH conditioning dropout, then sample a
    short chain through cfg_model_fn: finite, in-range, and actually
    different from the unguided chain (the guidance direction is nonzero)."""
    logger.configure_dir(dir=str(tmp_path), format_strs=[])
    cfg = UNetConfig(
        image_size=8, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1,),
        num_heads=1, use_scale_shift_norm=True, num_classes=16,
    )
    model = UNetModel_clip_feat(cfg)
    diffusion = create_gaussian_diffusion(
        steps=50, noise_schedule="cosine", timestep_respacing="5"
    )

    rs = np.random.RandomState(0)

    def data_gen():
        while True:
            feat = rs.randn(8, 16).astype(np.float32)
            # images correlate with the conditioning so guidance has signal
            imgs = np.tile(feat[:, :3].reshape(8, 1, 1, 3), (1, 8, 8, 1)) * 0.1
            yield imgs.astype(np.float32), {"clip_feat": feat}

    loop = TrainLoop(
        model=model, diffusion=diffusion, data=data_gen(), batch_size=8,
        microbatch=-1, lr=3e-3, ema_rate="0.99", log_interval=10**9,
        save_interval=10**9, seed=0, cond_dropout=0.3,
    )
    for _ in range(10):
        b, c = next(loop.data)
        loop.run_step(b, c)
        loop.step += 1
    loop.flush_metrics()

    params = loop.params
    feat = jnp.asarray(rs.randn(2, 16), jnp.float32)

    def run(scale):
        def base_fn(x, t, **kw):
            return model.apply({"params": params}, x, t, **kw)

        fn = base_fn if scale is None else cfg_model_fn(base_fn, scale, {"clip_feat": 0.0})
        return jax.jit(
            lambda p, k: diffusion.ddim_sample_loop(
                fn, (2, 8, 8, 3), k, model_kwargs={"clip_feat": feat},
            )
        )(params, jax.random.key(0))

    guided = np.asarray(run(3.0))
    plain = np.asarray(run(None))
    assert np.isfinite(guided).all()
    assert np.abs(guided).max() <= 1.0 + 1e-5  # clip_denoised keeps range
    assert np.abs(guided - plain).max() > 1e-4  # guidance moved the chain


class TestCfgCachedModelFn:
    """--cfg_cache: the unconditional branch recomputed 1-in-N steps, its
    output carried through the scan (guidance.cfg_cached_model_fn)."""

    def _stub(self, x, t, y=None, **kw):
        s = (1.0 + y).reshape((-1,) + (1,) * (x.ndim - 1))
        # depends on x AND t so stale reuse is detectable
        tt = t.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
        return jnp.concatenate([x * s + 0.01 * tt, jnp.full_like(x, 7.0)], axis=-1)

    def _loops(self):
        from guided_diffusion_clip_tpu.diffusion import (
            ddim_sample_loop,
            p_sample_loop,
        )
        from guided_diffusion_clip_tpu.diffusion.sampling import (
            dpm_solver_pp_2m_loop,
        )

        return [p_sample_loop, ddim_sample_loop, dpm_solver_pp_2m_loop]

    def test_every1_matches_doubled_batch_cfg(self):
        from guided_diffusion_clip_tpu.diffusion import named_schedule
        from guided_diffusion_clip_tpu.diffusion.guidance import (
            cfg_cached_model_fn,
            cfg_cached_state0,
        )

        T, shape = 20, (2, 8, 8, 3)
        sched = named_schedule("cosine", T)
        y = jnp.asarray([1.0, 2.0])
        for loop in self._loops():
            plain = loop(
                sched, cfg_model_fn(self._stub, 2.0, {"y": 0.0}), shape,
                jax.random.key(0), model_kwargs={"y": y},
            )
            fn = cfg_cached_model_fn(self._stub, 2.0, {"y": 0.0}, every=1)
            state0 = cfg_cached_state0(
                self._stub, jnp.zeros(shape), jnp.zeros((2,)), y=y
            )
            cached = loop(
                sched, fn, shape, jax.random.key(0),
                model_kwargs={"y": y}, model_state0=state0,
            )
            np.testing.assert_allclose(
                np.asarray(cached), np.asarray(plain), rtol=1e-5, atol=1e-6
            )

    def test_everyN_finite_and_close(self):
        from guided_diffusion_clip_tpu.diffusion import named_schedule, p_sample_loop
        from guided_diffusion_clip_tpu.diffusion.guidance import (
            cfg_cached_model_fn,
            cfg_cached_state0,
        )

        T, shape = 30, (2, 8, 8, 3)
        sched = named_schedule("cosine", T)
        y = jnp.asarray([1.0, 2.0])
        plain = p_sample_loop(
            sched, cfg_model_fn(self._stub, 2.0, {"y": 0.0}), shape,
            jax.random.key(0), model_kwargs={"y": y},
        )
        fn = cfg_cached_model_fn(self._stub, 2.0, {"y": 0.0}, every=3)
        state0 = cfg_cached_state0(self._stub, jnp.zeros(shape), jnp.zeros((2,)), y=y)
        cached = p_sample_loop(
            sched, fn, shape, jax.random.key(0),
            model_kwargs={"y": y}, model_state0=state0,
        )
        a, b = np.asarray(plain), np.asarray(cached)
        assert np.isfinite(b).all()
        assert not np.allclose(a, b)  # the cache is an approximation
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.98, corr

    def test_interval_degenerate_window_is_conditional_chain(self):
        # a window covering NO timestep must reduce to the plain conditional
        # chain exactly (and never combine against the zeros in state0)
        from guided_diffusion_clip_tpu.diffusion import named_schedule, p_sample_loop
        from guided_diffusion_clip_tpu.diffusion.guidance import (
            cfg_cached_model_fn,
            cfg_cached_state0,
        )

        T, shape = 20, (2, 8, 8, 3)
        sched = named_schedule("cosine", T)
        y = jnp.asarray([1.0, 2.0])
        plain = p_sample_loop(
            sched, self._stub, shape, jax.random.key(0), model_kwargs={"y": y}
        )
        fn = cfg_cached_model_fn(
            self._stub, 2.0, {"y": 0.0}, every=2, interval=(-3.0, -1.0)
        )
        state0 = cfg_cached_state0(self._stub, jnp.zeros(shape), jnp.zeros((2,)), y=y)
        gated = p_sample_loop(
            sched, fn, shape, jax.random.key(0),
            model_kwargs={"y": y}, model_state0=state0,
        )
        np.testing.assert_allclose(
            np.asarray(gated), np.asarray(plain), rtol=1e-5, atol=1e-6
        )

    def test_interval_full_window_matches_uninterval(self):
        from guided_diffusion_clip_tpu.diffusion import named_schedule, p_sample_loop
        from guided_diffusion_clip_tpu.diffusion.guidance import (
            cfg_cached_model_fn,
            cfg_cached_state0,
        )

        T, shape = 20, (2, 8, 8, 3)
        sched = named_schedule("cosine", T)
        y = jnp.asarray([1.0, 2.0])

        def run(interval):
            fn = cfg_cached_model_fn(self._stub, 2.0, {"y": 0.0}, every=2, interval=interval)
            state0 = cfg_cached_state0(self._stub, jnp.zeros(shape), jnp.zeros((2,)), y=y)
            return p_sample_loop(
                sched, fn, shape, jax.random.key(0),
                model_kwargs={"y": y}, model_state0=state0,
            )

        np.testing.assert_allclose(
            np.asarray(run((0.0, float(T)))), np.asarray(run(None)),
            rtol=1e-6, atol=1e-7,
        )
