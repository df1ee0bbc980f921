"""Tests for the scanned sampling loops: shapes, determinism, guidance, parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guided_diffusion_clip_tpu.diffusion import (
    ModelMeanType,
    ModelVarType,
    SamplerConfig,
    ddim_sample_loop,
    ddim_step,
    named_schedule,
    p_sample_loop,
    p_sample_loop_progressive,
    p_sample_step,
)
from reference_oracle import has_reference, load_reference_gd

T = 50  # note: tiny T with the scaled-linear schedule pushes beta_end toward 1
SHAPE = (2, 8, 8, 3)


def jax_model():
    def f(x, t, **kw):
        base = jnp.tanh(x * 0.3 + t.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype) * 0.01)
        return jnp.concatenate([base, jnp.cos(x * 0.7)], axis=-1)

    return f


def torch_model():
    import torch

    def f(x, t, **kw):
        base = torch.tanh(x * 0.3 + t.reshape((-1,) + (1,) * (x.ndim - 1)).to(x.dtype) * 0.01)
        return torch.cat([base, torch.cos(x * 0.7)], dim=1)

    return f


class TestLoops:
    def test_p_sample_loop_shape_finite(self):
        sched = named_schedule("linear", T)
        out = p_sample_loop(sched, jax_model(), SHAPE, jax.random.key(0))
        assert out.shape == SHAPE
        assert np.isfinite(np.asarray(out)).all()

    def test_ddim_deterministic_eta0(self):
        sched = named_schedule("linear", T)
        noise = jax.random.normal(jax.random.key(1), SHAPE)
        a = ddim_sample_loop(sched, jax_model(), SHAPE, jax.random.key(2), noise=noise)
        b = ddim_sample_loop(sched, jax_model(), SHAPE, jax.random.key(3), noise=noise)
        # eta=0: different rng keys, same starting noise => identical samples
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_p_sample_keys_matter(self):
        sched = named_schedule("linear", T)
        a = p_sample_loop(sched, jax_model(), SHAPE, jax.random.key(0))
        b = p_sample_loop(sched, jax_model(), SHAPE, jax.random.key(1))
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_progressive_returns_chain(self):
        sched = named_schedule("linear", T)
        final, (samples, preds) = p_sample_loop_progressive(
            sched, jax_model(), SHAPE, jax.random.key(0)
        )
        assert samples.shape == (T,) + SHAPE
        assert preds.shape == (T,) + SHAPE
        np.testing.assert_allclose(np.asarray(samples[-1]), np.asarray(final))

    def test_denoise_start_point(self):
        sched = named_schedule("linear", T)
        init = jnp.zeros(SHAPE) + 0.5
        cfg = SamplerConfig(denoise_start_point=5)
        final, (samples, _) = p_sample_loop_progressive(
            sched, jax_model(), SHAPE, jax.random.key(0), cfg=cfg, init_image=init
        )
        # only 5 denoise steps run
        assert samples.shape == (5,) + SHAPE
        assert np.isfinite(np.asarray(final)).all()

    def test_guidance_changes_samples(self):
        sched = named_schedule("linear", T)

        def cond_fn(x, t, **kw):
            return -0.5 * x  # pull toward zero

        a = p_sample_loop(sched, jax_model(), SHAPE, jax.random.key(0))
        b = p_sample_loop(sched, jax_model(), SHAPE, jax.random.key(0), cond_fn=cond_fn)
        assert not np.allclose(np.asarray(a), np.asarray(b))
        # guided samples should be closer to zero on average
        assert np.abs(np.asarray(b)).mean() < np.abs(np.asarray(a)).mean()

    def test_loop_is_jittable(self):
        sched = named_schedule("linear", T)
        f = jax.jit(lambda key: p_sample_loop(sched, jax_model(), SHAPE, key))
        out = f(jax.random.key(0))
        assert out.shape == SHAPE


class TestPerSampleKeys:
    """Batched [B] key vectors: sample i's bytes depend only on keys[i]
    (the property serve.py's request coalescing relies on)."""

    def _keys(self, seeds):
        return jax.vmap(lambda s: jax.random.key(s))(jnp.asarray(seeds, jnp.uint32))

    def test_p_sample_row_independence(self):
        sched = named_schedule("linear", T)
        f = jax.jit(lambda keys: p_sample_loop(sched, jax_model(), SHAPE, keys))
        a = np.asarray(f(self._keys([7, 3])))
        b = np.asarray(f(self._keys([7, 9])))
        # row 0 shares its key -> bitwise identical regardless of row 1
        np.testing.assert_array_equal(a[0], b[0])
        assert not np.allclose(a[1], b[1])

    def test_batched_matches_solo(self):
        # a sample co-batched with anything equals the same key run "alone"
        # (other rows keyed differently): the coalescing invariant
        sched = named_schedule("linear", T)
        f = jax.jit(lambda keys: p_sample_loop(sched, jax_model(), SHAPE, keys))
        batched = np.asarray(f(self._keys([5, 11])))
        other = np.asarray(f(self._keys([5, 23])))
        np.testing.assert_array_equal(batched[0], other[0])

    def test_ddim_batched_keys_shape_finite(self):
        sched = named_schedule("linear", T)
        out = ddim_sample_loop(sched, jax_model(), SHAPE, self._keys([1, 2]))
        assert out.shape == SHAPE
        assert np.isfinite(np.asarray(out)).all()

    def test_progressive_and_start_point_accept_batched_keys(self):
        sched = named_schedule("linear", T)
        cfg = SamplerConfig(denoise_start_point=5)
        final, (samples, _) = p_sample_loop_progressive(
            sched, jax_model(), SHAPE, self._keys([4, 8]), cfg=cfg,
            init_image=jnp.zeros(SHAPE) + 0.5,
        )
        assert samples.shape == (5,) + SHAPE
        assert np.isfinite(np.asarray(final)).all()


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
class TestStepParityVsReference:
    """Single-step parity: inject the same noise into both implementations."""

    @pytest.fixture(autouse=True)
    def _x64(self):
        with jax.enable_x64(True):
            yield

    def _setup(self):
        import sys

        sys.path.insert(0, "/root/reference")
        from guided_diffusion_clip_tpu.diffusion.schedules import get_named_beta_schedule

        gd = load_reference_gd()
        ref = gd.GaussianDiffusion(
            betas=get_named_beta_schedule("linear", T),
            model_mean_type=gd.ModelMeanType.EPSILON,
            model_var_type=gd.ModelVarType.LEARNED_RANGE,
            loss_type=gd.LossType.MSE,
        )
        sched = named_schedule("linear", T, dtype=jnp.float64)
        return gd, ref, sched

    def test_ddim_step_matches(self):
        import torch

        _, ref, sched = self._setup()
        rs = np.random.RandomState(0)
        x = rs.randn(*SHAPE)
        t = np.array([7, 12], dtype=np.int32)

        ours, _ = ddim_step(
            sched, jax_model(), jnp.array(x), jnp.array(t), jax.random.key(0),
            cfg=SamplerConfig(eta=0.0),
        )
        x_t = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
        rout = ref.ddim_sample(torch_model(), x_t, torch.from_numpy(t).long(), eta=0.0)
        theirs = np.moveaxis(rout["sample"].numpy(), 1, -1)
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-6)

    def test_p_sample_mean_matches(self):
        """Compare the deterministic part: run p_sample with zero noise on both."""
        import torch

        _, ref, sched = self._setup()
        rs = np.random.RandomState(3)
        x = rs.randn(*SHAPE)
        t = np.array([5, 15], dtype=np.int32)

        out = __import__(
            "guided_diffusion_clip_tpu.diffusion.gaussian", fromlist=["p_mean_variance"]
        ).p_mean_variance(
            sched, jax_model(), jnp.array(x), jnp.array(t),
            mean_type=ModelMeanType.EPSILON, var_type=ModelVarType.LEARNED_RANGE,
        )
        x_t = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
        rout = ref.p_mean_variance(torch_model(), x_t, torch.from_numpy(t).long())
        np.testing.assert_allclose(
            np.asarray(out.mean), np.moveaxis(rout["mean"].numpy(), 1, -1), rtol=1e-4, atol=1e-6
        )
