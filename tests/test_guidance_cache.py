"""Guidance-gradient caching (--guidance_cache, beyond reference): recompute
cond_fn 1-in-N steps and carry the gradient through the scan in between —
the guidance analog of DeepCache. Pinned here: exact every=1 equivalence,
manual-loop equivalence of the reuse schedule, composition with a stateful
model (deep_cache contract) and with interval gating, and all three loops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guided_diffusion_clip_tpu.diffusion import (
    SamplerConfig,
    ddim_sample_loop,
    named_schedule,
    p_sample_loop,
    p_sample_step,
)
from guided_diffusion_clip_tpu.diffusion.sampling import dpm_solver_pp_2m_loop
from guided_diffusion_clip_tpu.diffusion.guidance import (
    cached_cond_fn,
    interval_cond_fn,
)

T = 30
SHAPE = (2, 8, 8, 3)


def jax_model():
    def f(x, t, **kw):
        base = jnp.tanh(x * 0.3 + t.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype) * 0.01)
        return jnp.concatenate([base, jnp.cos(x * 0.7)], axis=-1)

    return f


def cond(x, t, **kw):
    # depends on BOTH x and t so stale reuse is detectable
    return -0.5 * x + 0.001 * t.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)


class TestEveryOne:
    @pytest.mark.parametrize("loop", [p_sample_loop, ddim_sample_loop, dpm_solver_pp_2m_loop])
    def test_every1_matches_plain(self, loop):
        sched = named_schedule("linear", T)
        plain = loop(sched, jax_model(), SHAPE, jax.random.key(0), cond_fn=cond)
        fn, state0 = cached_cond_fn(cond, 1, SHAPE)
        cached = loop(
            sched, jax_model(), SHAPE, jax.random.key(0),
            cond_fn=fn, cond_state0=state0,
        )
        np.testing.assert_allclose(
            np.asarray(cached), np.asarray(plain), rtol=1e-5, atol=1e-6
        )


class TestReuseSchedule:
    def test_manual_loop_equivalence(self):
        """p_sample_loop with cached_cond_fn(every=3) must equal a hand-rolled
        Python loop that recomputes the gradient at steps 0,3,6,... and feeds
        the held gradient as a constant cond_fn otherwise (same key splits)."""
        from guided_diffusion_clip_tpu.diffusion.sampling import _normal, _split

        every = 3
        sched = named_schedule("linear", T)
        cfg = SamplerConfig()
        model = jax_model()

        fn, state0 = cached_cond_fn(cond, every, SHAPE)
        got = p_sample_loop(
            sched, model, SHAPE, jax.random.key(0), cond_fn=fn, cond_state0=state0
        )

        # replicate _scan_loop's RNG discipline exactly
        rng, init_rng = _split(jax.random.key(0), 2)
        x = _normal(init_rng, SHAPE, jnp.float32)
        step_keys = _split(rng, T)
        g = jnp.zeros(SHAPE, jnp.float32)
        for i, t_scalar in enumerate(range(T - 1, -1, -1)):
            t = jnp.full((SHAPE[0],), t_scalar, dtype=jnp.int32)
            if i % every == 0:
                g = cond(x, sched.model_timesteps(t))
            held = g

            x, _ = p_sample_step(
                sched, model, x, t, step_keys[i],
                cfg=cfg, cond_fn=lambda *a, **kw: held,
            )
        np.testing.assert_allclose(np.asarray(got), np.asarray(x), rtol=1e-5, atol=1e-6)

    def test_cache_differs_from_fresh_but_stays_close(self):
        sched = named_schedule("linear", T)
        fresh = p_sample_loop(sched, jax_model(), SHAPE, jax.random.key(0), cond_fn=cond)
        fn, state0 = cached_cond_fn(cond, 3, SHAPE)
        cached = p_sample_loop(
            sched, jax_model(), SHAPE, jax.random.key(0), cond_fn=fn, cond_state0=state0
        )
        a, b = np.asarray(fresh), np.asarray(cached)
        assert not np.allclose(a, b)
        # the gradient field varies smoothly: 1-in-3 reuse stays correlated
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.98, corr


class TestComposition:
    def test_with_stateful_model(self):
        # deep_cache contract: model_fn(x, t, state, **kw) -> (out, state).
        # Both states must thread through the same carry.
        sched = named_schedule("linear", T)
        base = jax_model()

        def stateful_model(x, t, state, **kw):
            return base(x, t, **kw), state + 1

        fn, state0 = cached_cond_fn(cond, 2, SHAPE)
        out = p_sample_loop(
            sched, stateful_model, SHAPE, jax.random.key(0),
            cond_fn=fn, cond_state0=state0, model_state0=jnp.int32(0),
        )
        assert np.isfinite(np.asarray(out)).all()
        # and must equal the same run with a stateless model
        fn2, state02 = cached_cond_fn(cond, 2, SHAPE)
        out2 = p_sample_loop(
            sched, base, SHAPE, jax.random.key(0), cond_fn=fn2, cond_state0=state02
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5, atol=1e-6)

    def test_with_interval(self):
        # cache(interval(f)): refresh steps outside the window cache zeros
        sched = named_schedule("linear", T)
        gated = interval_cond_fn(cond, T // 3, T)
        fn, state0 = cached_cond_fn(gated, 2, SHAPE)
        out = p_sample_loop(
            sched, jax_model(), SHAPE, jax.random.key(0), cond_fn=fn, cond_state0=state0
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_progressive_with_cache(self):
        from guided_diffusion_clip_tpu.diffusion import p_sample_loop_progressive

        sched = named_schedule("linear", T)
        fn, state0 = cached_cond_fn(cond, 2, SHAPE)
        final, (samples, preds) = p_sample_loop_progressive(
            sched, jax_model(), SHAPE, jax.random.key(0),
            cond_fn=fn, cond_state0=state0,
        )
        assert samples.shape[0] == T and np.isfinite(np.asarray(final)).all()

    def test_jittable(self):
        sched = named_schedule("linear", T)
        fn, state0 = cached_cond_fn(cond, 4, SHAPE)

        @jax.jit
        def run(key):
            return p_sample_loop(
                sched, jax_model(), SHAPE, key, cond_fn=fn, cond_state0=state0
            )

        assert np.isfinite(np.asarray(run(jax.random.key(3)))).all()


class TestDeepCacheComposition:
    """The deployment stack's scan carry: deep_cache_model_fn on the generator
    + cached_cond_fn on the guidance, threaded through model_state0 AND
    cond_state0 of the same loop (what classifier_sample --deep_cache N
    --guidance_cache M builds; measured on-chip in tools/
    guidance_interval_bench.py and tools/int8_chain_quality.py int8+dcN+gcM)."""

    def _setup(self):
        from guided_diffusion_clip_tpu.models.unet import UNetConfig, UNetModel

        model = UNetModel(config=UNetConfig(
            image_size=8, in_channels=3, model_channels=32, out_channels=6,
            num_res_blocks=1, attention_resolutions=(4,), channel_mult=(1, 2),
            num_heads=2, use_scale_shift_norm=True, resblock_updown=True,
        ))
        x = jnp.asarray(np.random.RandomState(0).randn(*SHAPE), jnp.float32)
        params = model.init(jax.random.key(0), x, jnp.zeros((SHAPE[0],)))["params"]
        params = jax.tree_util.tree_map(
            lambda v: v + 0.02 * np.random.RandomState(1).standard_normal(v.shape).astype(v.dtype),
            params,
        )
        return model, params

    def _chain(self, model, params, dc, gc):
        from guided_diffusion_clip_tpu.diffusion.deep_cache import (
            deep_cache_model_fn,
            zero_state,
        )

        sched = named_schedule("cosine", T)
        key = jax.random.key(5)

        @jax.jit
        def run(params):
            cond_fn, cond_state0 = cond, None
            if gc:
                cond_fn, cond_state0 = cached_cond_fn(cond, gc, SHAPE)
            if dc:
                def apply_full(x, t, **kw):
                    return model.apply({"params": params}, x, t, cache_mode="full", **kw)

                def apply_shallow(x, t, deep, **kw):
                    return model.apply(
                        {"params": params}, x, t, deep_cache=deep,
                        cache_mode="shallow", **kw,
                    )

                sfn = deep_cache_model_fn(apply_full, apply_shallow, dc)
                state0 = zero_state(
                    apply_full, jnp.zeros(SHAPE), jnp.zeros((SHAPE[0],), jnp.int32)
                )
                return p_sample_loop(
                    sched, sfn, SHAPE, key,
                    cond_fn=cond_fn, cond_state0=cond_state0, model_state0=state0,
                )

            def model_fn(x, t, **kw):
                return model.apply({"params": params}, x, t, **kw)

            return p_sample_loop(
                sched, model_fn, SHAPE, key,
                cond_fn=cond_fn, cond_state0=cond_state0,
            )

        return np.asarray(run(params))

    def test_identity_at_interval_one(self):
        model, params = self._setup()
        ref = self._chain(model, params, dc=0, gc=0)
        got = self._chain(model, params, dc=1, gc=1)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_composed_intervals_finite_and_close(self):
        model, params = self._setup()
        ref = self._chain(model, params, dc=0, gc=0)
        got = self._chain(model, params, dc=2, gc=3)
        assert np.isfinite(got).all()
        # approximation, not identity — but the caches must not derail the chain
        c = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
        assert c > 0.98, c
