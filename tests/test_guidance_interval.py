"""Guidance interval (--guidance_interval, beyond reference): restrict
classifier/CLIP cond_fn guidance and CFG to a [lo, hi] model-timestep window
(Kynkaenniemi et al. 2024). Outside the window the guidance network (or the
CFG doubled batch) is lax.cond-skipped inside the scanned chain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guided_diffusion_clip_tpu.diffusion import (
    ddim_sample_loop,
    named_schedule,
    p_sample_loop,
)
from guided_diffusion_clip_tpu.diffusion.guidance import (
    cfg_model_fn,
    interval_cond_fn,
    parse_guidance_interval,
)

T = 50
SHAPE = (2, 8, 8, 3)


def jax_model():
    def f(x, t, **kw):
        base = jnp.tanh(x * 0.3 + t.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype) * 0.01)
        return jnp.concatenate([base, jnp.cos(x * 0.7)], axis=-1)

    return f


def pull_to_zero(x, t, **kw):
    return -0.5 * x


class TestParse:
    def test_empty_is_none(self):
        assert parse_guidance_interval("") is None
        assert parse_guidance_interval(None) is None
        assert parse_guidance_interval("  ") is None

    def test_basic(self):
        assert parse_guidance_interval("200,800") == (200.0, 800.0)
        assert parse_guidance_interval("0, 999") == (0.0, 999.0)

    def test_rejects_malformed(self):
        with pytest.raises(ValueError):
            parse_guidance_interval("200")
        with pytest.raises(ValueError):
            parse_guidance_interval("800,200")
        with pytest.raises(ValueError):
            parse_guidance_interval("a,b")


class TestIntervalCondFn:
    def test_inside_matches_base(self):
        x = jax.random.normal(jax.random.key(0), SHAPE)
        t = jnp.full((SHAPE[0],), 25)
        wrapped = interval_cond_fn(pull_to_zero, 10, 40)
        np.testing.assert_array_equal(
            np.asarray(jax.jit(wrapped)(x, t)), np.asarray(pull_to_zero(x, t))
        )

    def test_outside_is_zero(self):
        x = jax.random.normal(jax.random.key(0), SHAPE)
        wrapped = jax.jit(interval_cond_fn(pull_to_zero, 10, 40))
        for tv in (5, 45):
            out = np.asarray(wrapped(x, jnp.full((SHAPE[0],), tv)))
            assert (out == 0.0).all()

    def test_bounds_inclusive(self):
        x = jax.random.normal(jax.random.key(1), SHAPE)
        wrapped = jax.jit(interval_cond_fn(pull_to_zero, 10, 40))
        for tv in (10, 40):
            out = np.asarray(wrapped(x, jnp.full((SHAPE[0],), tv)))
            assert (out != 0.0).any()

    def test_float_rescaled_timesteps(self):
        # with rescale_timesteps the model/cond_fn see float t; the
        # predicate must handle a float vector
        x = jax.random.normal(jax.random.key(2), SHAPE)
        wrapped = jax.jit(interval_cond_fn(pull_to_zero, 100.0, 500.0))
        assert (np.asarray(wrapped(x, jnp.full((SHAPE[0],), 250.5))) != 0).any()
        assert (np.asarray(wrapped(x, jnp.full((SHAPE[0],), 600.0))) == 0).all()


class TestIntervalChains:
    def test_full_cover_matches_plain_guided(self):
        sched = named_schedule("linear", T)
        a = p_sample_loop(sched, jax_model(), SHAPE, jax.random.key(0), cond_fn=pull_to_zero)
        b = p_sample_loop(
            sched, jax_model(), SHAPE, jax.random.key(0),
            cond_fn=interval_cond_fn(pull_to_zero, 0, T),
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def test_never_inside_matches_unguided(self):
        # ancestral conditioning is mean += variance * grad, so a zero
        # gradient is an exact no-op
        sched = named_schedule("linear", T)
        a = p_sample_loop(sched, jax_model(), SHAPE, jax.random.key(0))
        b = p_sample_loop(
            sched, jax_model(), SHAPE, jax.random.key(0),
            cond_fn=interval_cond_fn(pull_to_zero, T + 10, T + 20),
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def test_partial_interval_is_between(self):
        sched = named_schedule("linear", T)
        full = p_sample_loop(sched, jax_model(), SHAPE, jax.random.key(0), cond_fn=pull_to_zero)
        none = p_sample_loop(sched, jax_model(), SHAPE, jax.random.key(0))
        part = p_sample_loop(
            sched, jax_model(), SHAPE, jax.random.key(0),
            cond_fn=interval_cond_fn(pull_to_zero, T // 4, 3 * T // 4),
        )
        assert not np.allclose(np.asarray(part), np.asarray(full))
        assert not np.allclose(np.asarray(part), np.asarray(none))
        # guidance pulls toward zero: partial guidance should land between
        m_full = np.abs(np.asarray(full)).mean()
        m_none = np.abs(np.asarray(none)).mean()
        m_part = np.abs(np.asarray(part)).mean()
        assert m_full < m_part < m_none

    def test_ddim_with_interval_finite(self):
        sched = named_schedule("linear", T)
        out = ddim_sample_loop(
            sched, jax_model(), SHAPE, jax.random.key(0),
            cond_fn=interval_cond_fn(pull_to_zero, T // 4, 3 * T // 4),
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_respaced_interval_in_original_units(self):
        # cond_fn sees model_timesteps(t) = timestep_map[t]: a respaced
        # 10-step chain over T=50 must gate on ORIGINAL (0..49) units
        from guided_diffusion_clip_tpu.diffusion import (
            get_named_beta_schedule,
            respaced_schedule,
            space_timesteps,
        )

        betas = get_named_beta_schedule("linear", T)
        sched = respaced_schedule(betas, space_timesteps(T, "10"))
        # the 10 respaced steps map to original timesteps {0,5,...,45}; an
        # interval of [30, 49] covers four of them in ORIGINAL units but
        # NONE in respaced-local units (0..9) — so guidance firing proves
        # the gate reads timestep_map[t]
        unguided = p_sample_loop(sched, jax_model(), SHAPE, jax.random.key(0))
        gated = p_sample_loop(
            sched, jax_model(), SHAPE, jax.random.key(0),
            cond_fn=interval_cond_fn(pull_to_zero, 30, T - 1),
        )
        assert not np.allclose(np.asarray(gated), np.asarray(unguided))


class TestShardedInterval:
    def test_interval_chain_under_data_mesh(self):
        # lax.cond with batch-sharded operands is the one new structure the
        # interval gate adds inside the scanned chain — drive it on the
        # 8-device virtual mesh (conftest forces the CPU device count)
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        sched = named_schedule("linear", T)
        shape = (8, 8, 8, 3)
        gated = interval_cond_fn(pull_to_zero, 10, 40)

        with mesh:
            def chain(key, cf):
                def mf(x, t, **kw):
                    x = jax.lax.with_sharding_constraint(
                        x, NamedSharding(mesh, P("data"))
                    )
                    return jax_model()(x, t, **kw)

                return p_sample_loop(sched, mf, shape, key, cond_fn=cf)

            out_g = jax.jit(lambda k: chain(k, gated))(jax.random.key(0))
            out_f = jax.jit(lambda k: chain(k, pull_to_zero))(jax.random.key(0))
        out_g, out_f = np.asarray(out_g), np.asarray(out_f)
        assert np.isfinite(out_g).all()
        assert not np.allclose(out_g, out_f)  # partial window != full guidance


class TestCfgInterval:
    def _stub(self, x, t, y=None, **kw):
        scale = (1.0 + y).reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.concatenate([x * scale, jnp.full_like(x, 7.0)], axis=-1)

    def test_inside_matches_cfg(self):
        x = jax.random.normal(jax.random.key(0), SHAPE)
        y = jnp.full((SHAPE[0],), 2.0)
        t = jnp.full((SHAPE[0],), 15)
        plain = cfg_model_fn(self._stub, 2.0, {"y": 0.0})
        gated = cfg_model_fn(self._stub, 2.0, {"y": 0.0}, interval=(10, 20))
        np.testing.assert_allclose(
            np.asarray(jax.jit(gated)(x, t, y=y)), np.asarray(plain(x, t, y=y)),
            rtol=1e-6,
        )

    def test_outside_is_plain_conditional(self):
        x = jax.random.normal(jax.random.key(0), SHAPE)
        y = jnp.full((SHAPE[0],), 2.0)
        gated = jax.jit(cfg_model_fn(self._stub, 2.0, {"y": 0.0}, interval=(10, 20)))
        for tv in (5, 25):
            t = jnp.full((SHAPE[0],), tv)
            np.testing.assert_allclose(
                np.asarray(gated(x, t, y=y)), np.asarray(self._stub(x, t, y=y)),
                rtol=1e-6,
            )

    def test_chain_with_cfg_interval(self):
        sched = named_schedule("linear", T)
        y = jnp.full((SHAPE[0],), 1.0)
        gated = cfg_model_fn(self._stub, 1.5, {"y": 0.0}, interval=(T // 4, 3 * T // 4))
        out = p_sample_loop(
            sched, gated, SHAPE, jax.random.key(0), model_kwargs={"y": y}
        )
        assert np.isfinite(np.asarray(out)).all()
        plain = p_sample_loop(
            sched, cfg_model_fn(self._stub, 1.5, {"y": 0.0}), SHAPE,
            jax.random.key(0), model_kwargs={"y": y},
        )
        assert not np.allclose(np.asarray(out), np.asarray(plain))
