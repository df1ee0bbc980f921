"""DeepCache-style deep-feature reuse (diffusion/deep_cache.py + the UNet's
cache_mode paths + the sampling loops' model_state0 protocol)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guided_diffusion_clip_tpu.diffusion.deep_cache import (
    deep_cache_model_fn,
    zero_state,
)
from guided_diffusion_clip_tpu.models.unet import UNetConfig, UNetModel
from guided_diffusion_clip_tpu.utils.script_util import create_gaussian_diffusion


def tiny_model(**kw):
    base = dict(
        image_size=16, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(4,), channel_mult=(1, 2, 2),
        num_heads=2, use_scale_shift_norm=True, resblock_updown=True,
    )
    base.update(kw)
    return UNetModel(config=UNetConfig(**base))


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3), jnp.float32)
    t = jnp.full((2,), 3, jnp.float32)
    params = model.init(jax.random.key(0), x, t)["params"]
    # params must NOT be zero-init-dominated for these tests to bite: nudge
    # the zero-init output convs so deep features actually influence out
    params = jax.tree_util.tree_map(
        lambda v: v + 0.01 * np.random.RandomState(1).standard_normal(v.shape).astype(v.dtype),
        params,
    )
    return model, params, x, t


class TestCacheModes:
    def test_full_mode_matches_off(self, setup):
        model, params, x, t = setup
        plain = model.apply({"params": params}, x, t)
        out, deep = model.apply({"params": params}, x, t, cache_mode="full")
        np.testing.assert_array_equal(np.asarray(out), np.asarray(plain))
        assert deep.shape[0] == x.shape[0] and deep.ndim == 4

    def test_shallow_with_fresh_deep_matches(self, setup):
        """Splicing the deep feature computed at the SAME x back in must
        reproduce the full forward exactly — pins the cut-point topology
        (skip ordering, channel counts, upsample placement)."""
        model, params, x, t = setup
        plain = model.apply({"params": params}, x, t)
        _, deep = model.apply({"params": params}, x, t, cache_mode="full")
        out, deep2 = model.apply(
            {"params": params}, x, t, deep_cache=deep, cache_mode="shallow"
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(plain), rtol=1e-6, atol=1e-7)
        np.testing.assert_array_equal(np.asarray(deep2), np.asarray(deep))

    def test_explicit_cut_levels(self, setup):
        model, params, x, t = setup
        plain = model.apply({"params": params}, x, t)
        n_in = 1 + 3 * 1 + 2  # stem + L*R res + (L-1) downs
        for cut in (1, 2, 4, n_in):
            _, deep = model.apply({"params": params}, x, t, cache_mode="full", cache_cut=cut)
            out, _ = model.apply(
                {"params": params}, x, t, deep_cache=deep, cache_mode="shallow", cache_cut=cut
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(plain), rtol=1e-6, atol=1e-7,
                err_msg=f"cut={cut}",
            )

    def test_bad_args_rejected(self, setup):
        model, params, x, t = setup
        with pytest.raises(AssertionError):
            model.apply({"params": params}, x, t, cache_mode="full", cache_cut=99)
        with pytest.raises(AssertionError):
            model.apply({"params": params}, x, t, cache_mode="shallow")  # no deep_cache


class TestCachedChains:
    def _chain(self, model, params, loop, interval, steps="5"):
        diffusion = create_gaussian_diffusion(
            steps=50, noise_schedule="cosine", learn_sigma=True,
            rescale_learned_sigmas=True, timestep_respacing=steps,
        )
        shape = (2, 16, 16, 3)
        key = jax.random.key(11)

        def run(params):
            if interval is None:
                def model_fn(x, t, **kw):
                    return model.apply({"params": params}, x, t, **kw)

                return getattr(diffusion, loop)(model_fn, shape, key, clip_denoised=True)

            def apply_full(x, t, **kw):
                return model.apply({"params": params}, x, t, cache_mode="full", **kw)

            def apply_shallow(x, t, deep, **kw):
                return model.apply(
                    {"params": params}, x, t, deep_cache=deep, cache_mode="shallow", **kw
                )

            sfn = deep_cache_model_fn(apply_full, apply_shallow, interval)
            state0 = zero_state(
                apply_full, jnp.zeros(shape), jnp.zeros((shape[0],), jnp.int32)
            )
            return getattr(diffusion, loop)(
                sfn, shape, key, clip_denoised=True, model_state0=state0
            )

        return np.asarray(jax.jit(run)(params))

    @pytest.mark.parametrize("loop", ["ddim_sample_loop", "p_sample_loop", "dpm_solver_pp_2m_loop"])
    def test_interval_one_identical(self, setup, loop):
        """interval=1 refreshes every step: the cached chain must equal the
        plain chain exactly on every loop type."""
        model, params, x, t = setup
        ref = self._chain(model, params, loop, None)
        got = self._chain(model, params, loop, 1)
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)

    def test_cfg_composition_interval_one_identical(self, setup):
        """cfg_deep_cache_pair at interval=1 must equal the plain CFG chain:
        pins the doubled-batch cache topology and the eps combination."""
        from guided_diffusion_clip_tpu.diffusion.deep_cache import cfg_deep_cache_pair
        from guided_diffusion_clip_tpu.diffusion.guidance import cfg_model_fn
        from guided_diffusion_clip_tpu.models.clip_models import UNetModel_clip_feat
        from guided_diffusion_clip_tpu.models.unet import UNetConfig

        cfg = UNetConfig(
            image_size=16, in_channels=3, model_channels=32, out_channels=6,
            num_res_blocks=1, attention_resolutions=(4,), channel_mult=(1, 2),
            num_heads=2, use_scale_shift_norm=True, num_classes=8,
        )
        model = UNetModel_clip_feat(cfg)
        feat = jnp.asarray(np.random.RandomState(2).randn(2, 8), jnp.float32)
        params = model.init(
            jax.random.key(0), jnp.zeros((2, 16, 16, 3)), jnp.zeros((2,)),
            clip_feat=feat,
        )["params"]
        params = jax.tree_util.tree_map(
            lambda v: v + 0.01 * np.random.RandomState(3).standard_normal(v.shape).astype(v.dtype),
            params,
        )
        diffusion = create_gaussian_diffusion(
            steps=50, noise_schedule="cosine", learn_sigma=True,
            rescale_learned_sigmas=True, timestep_respacing="5",
        )
        shape = (2, 16, 16, 3)
        key = jax.random.key(13)
        null = {"clip_feat": 0.0}

        def plain_cfg(params):
            def base(x, t, **kw):
                return model.apply({"params": params}, x, t, **kw)

            return diffusion.ddim_sample_loop(
                cfg_model_fn(base, 2.0, null), shape, key,
                clip_denoised=True, model_kwargs={"clip_feat": feat},
            )

        def cached_cfg(params):
            def cached_apply(x, t, **kw):
                return model.apply({"params": params}, x, t, **kw)

            full, shallow = cfg_deep_cache_pair(cached_apply, 2.0, null)
            sfn = deep_cache_model_fn(full, shallow, 1)
            state0 = zero_state(
                full, jnp.zeros(shape), jnp.zeros((2,), jnp.int32), clip_feat=feat
            )
            return diffusion.ddim_sample_loop(
                sfn, shape, key, clip_denoised=True,
                model_kwargs={"clip_feat": feat}, model_state0=state0,
            )

        ref = np.asarray(jax.jit(plain_cfg)(params))
        got = np.asarray(jax.jit(cached_cfg)(params))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)

    def test_interval_k_runs_and_approximates(self, setup):
        model, params, x, t = setup
        ref = self._chain(model, params, "ddim_sample_loop", None, steps="10")
        got = self._chain(model, params, "ddim_sample_loop", 3, steps="10")
        assert np.isfinite(got).all()
        assert got.shape == ref.shape
        # the cached chain must stay in the same ballpark (it is an
        # approximation, not an identity)
        assert np.abs(got - ref).mean() < 0.5 * np.abs(ref).mean() + 0.1


class TestProgressiveStateful:
    def test_progressive_forwards_model_state0(self, setup):
        """progressive=True must thread model_state0 like the plain loops do
        (the api/sampling wrappers used to drop it -> TypeError at trace)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        model, params, x, t = setup
        shape = x.shape
        key = jax.random.key(11)

        def apply_full(x_, t_, **kw):
            return model.apply({"params": params}, x_, t_, cache_mode="full", **kw)

        def apply_shallow(x_, t_, deep, **kw):
            return model.apply(
                {"params": params}, x_, t_, deep_cache=deep, cache_mode="shallow", **kw
            )

        sfn = deep_cache_model_fn(apply_full, apply_shallow, 1)
        state0 = zero_state(
            apply_full, jnp.zeros(shape), jnp.zeros((shape[0],), jnp.int32)
        )

        def plain_fn(x_, t_, **kw):
            return model.apply({"params": params}, x_, t_, **kw)

        diffusion = create_gaussian_diffusion(
            steps=6, noise_schedule="cosine", learn_sigma=True
        )
        for loop in ("p_sample_loop", "ddim_sample_loop"):
            ref = getattr(diffusion, loop)(plain_fn, shape, key, clip_denoised=True)
            final, (samples, xstarts) = getattr(diffusion, loop)(
                sfn, shape, key, clip_denoised=True,
                progressive=True, model_state0=state0,
            )
            assert samples.shape[0] == diffusion.num_timesteps
            np.testing.assert_allclose(
                np.asarray(final), np.asarray(ref), rtol=1e-5, atol=1e-6
            )
