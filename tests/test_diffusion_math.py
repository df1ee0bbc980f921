"""Parity tests for the diffusion q/p math, losses and bpd vs the reference oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guided_diffusion_clip_tpu.diffusion import (
    LossType,
    ModelMeanType,
    ModelVarType,
    calc_bpd_loop,
    discretized_gaussian_log_likelihood,
    named_schedule,
    normal_kl,
    p_mean_variance,
    prior_bpd,
    q_posterior_mean_variance,
    q_sample,
    training_losses,
    vb_terms_bpd,
)
from reference_oracle import has_reference, load_reference_gd

T = 40
SHAPE = (2, 8, 8, 3)  # NHWC


@pytest.fixture(autouse=True, scope="module")
def _x64():
    # f64 on CPU for tight oracle tolerances; prod uses f32.
    with jax.enable_x64(True):
        yield


def make_sched(dtype=jnp.float64):
    return named_schedule("linear", T, dtype=dtype)


def dummy_model_np(x_np, t_np, C, learned=True):
    """A deterministic fake model, identical math in numpy for both frameworks.

    eps-head = tanh of a fixed linear function of x; var-head = cos(...).
    """
    base = np.tanh(x_np * 0.3 + t_np.reshape((-1,) + (1,) * (x_np.ndim - 1)) * 0.01)
    if not learned:
        return base
    var = np.cos(x_np * 0.7)
    return np.concatenate([base, var], axis=-1)


def jax_model(learned=True):
    def f(x, t, **kw):
        base = jnp.tanh(x * 0.3 + t.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype) * 0.01)
        if not learned:
            return base
        return jnp.concatenate([base, jnp.cos(x * 0.7)], axis=-1)

    return f


def torch_model(learned=True):
    import torch

    def f(x, t, **kw):
        base = torch.tanh(x * 0.3 + t.reshape((-1,) + (1,) * (x.ndim - 1)).to(x.dtype) * 0.01)
        if not learned:
            return base
        return torch.cat([base, torch.cos(x * 0.7)], dim=1)

    return f


@pytest.fixture(scope="module")
def rng_data():
    rs = np.random.RandomState(0)
    x0 = rs.uniform(-1, 1, SHAPE).astype(np.float64)
    noise = rs.randn(*SHAPE).astype(np.float64)
    t = np.array([3, T - 1], dtype=np.int32)
    return x0, noise, t


def ref_diffusion(gd, mean_type="EPSILON", var_type="LEARNED_RANGE", loss_type="MSE"):
    from guided_diffusion_clip_tpu.diffusion.schedules import get_named_beta_schedule

    return gd.GaussianDiffusion(
        betas=get_named_beta_schedule("linear", T),
        model_mean_type=getattr(gd.ModelMeanType, mean_type),
        model_var_type=getattr(gd.ModelVarType, var_type),
        loss_type=getattr(gd.LossType, loss_type),
    )


def to_torch_nchw(x_np):
    import torch

    return torch.from_numpy(np.moveaxis(x_np, -1, 1).copy())


def from_ref_nchw(x_t):
    return np.moveaxis(x_t.numpy(), 1, -1)


class TestLossPrimitives:
    def test_normal_kl_zero(self):
        np.testing.assert_allclose(np.asarray(normal_kl(0.5, 0.3, 0.5, 0.3)), 0.0, atol=1e-12)

    def test_normal_kl_golden(self):
        # KL(N(1, e^0) || N(0, e^0)) = 0.5
        assert float(normal_kl(1.0, 0.0, 0.0, 0.0)) == pytest.approx(0.5)
        # analytic: 0.5(-1 + lv2 - lv1 + exp(lv1-lv2) + dm^2 exp(-lv2))
        v = float(normal_kl(0.2, -1.0, -0.3, 0.5))
        expected = 0.5 * (-1 + 0.5 - (-1.0) + np.exp(-1.5) + 0.25 * np.exp(-0.5))
        assert v == pytest.approx(expected, rel=1e-6)

    def test_discretized_ll_integrates_to_one(self):
        # Sum of probs over the 256 bins ~ 1 for a moderate sigma
        xs = jnp.linspace(-1, 1, 256).reshape(1, -1)
        ll = discretized_gaussian_log_likelihood(
            xs, means=jnp.zeros_like(xs), log_scales=jnp.full_like(xs, np.log(0.3))
        )
        total = float(jnp.exp(ll).sum())
        assert total == pytest.approx(1.0, abs=1e-3)

    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_discretized_ll_matches_reference(self):
        import sys

        sys.path.insert(0, "/root/reference")
        import torch
        from guided_diffusion import losses as ref_losses

        rs = np.random.RandomState(1)
        x = rs.uniform(-1.01, 1.01, (4, 16))
        m = rs.randn(4, 16) * 0.1
        ls = rs.randn(4, 16) * 0.5 - 2
        ours = np.asarray(
            discretized_gaussian_log_likelihood(jnp.array(x), means=jnp.array(m), log_scales=jnp.array(ls))
        )
        theirs = ref_losses.discretized_gaussian_log_likelihood(
            torch.from_numpy(x), means=torch.from_numpy(m), log_scales=torch.from_numpy(ls)
        ).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
class TestQPParityVsReference:
    def test_q_sample(self, rng_data):
        gd = load_reference_gd()
        x0, noise, t = rng_data
        sched = make_sched()
        ours = np.asarray(q_sample(sched, jnp.array(x0), jnp.array(t), jnp.array(noise)))
        ref = ref_diffusion(gd)
        theirs = from_ref_nchw(
            ref.q_sample(to_torch_nchw(x0), __import__("torch").from_numpy(t).long(), to_torch_nchw(noise))
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-5)

    def test_q_posterior(self, rng_data):
        import torch

        gd = load_reference_gd()
        x0, noise, t = rng_data
        sched = make_sched()
        xt = x0 * 0.9 + noise * 0.1
        m, v, lv = q_posterior_mean_variance(sched, jnp.array(x0), jnp.array(xt), jnp.array(t))
        ref = ref_diffusion(gd)
        rm, rv, rlv = ref.q_posterior_mean_variance(
            to_torch_nchw(x0), to_torch_nchw(xt), torch.from_numpy(t).long()
        )
        np.testing.assert_allclose(np.asarray(m), from_ref_nchw(rm), rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.broadcast_to(np.asarray(lv), SHAPE), from_ref_nchw(rlv.expand_as(rm)), rtol=1e-3, atol=1e-5)

    @pytest.mark.parametrize("var_type", ["LEARNED_RANGE", "FIXED_SMALL", "FIXED_LARGE", "LEARNED"])
    @pytest.mark.parametrize("mean_type", ["EPSILON", "START_X", "PREVIOUS_X"])
    def test_p_mean_variance(self, rng_data, mean_type, var_type):
        import torch

        gd = load_reference_gd()
        x0, noise, t = rng_data
        sched = make_sched()
        xt = x0 * 0.8 + noise * 0.2
        learned = var_type in ("LEARNED", "LEARNED_RANGE")

        out = p_mean_variance(
            sched, jax_model(learned), jnp.array(xt), jnp.array(t),
            mean_type=ModelMeanType[mean_type], var_type=ModelVarType[var_type],
            clip_denoised=True,
        )
        ref = ref_diffusion(gd, mean_type, var_type)
        rout = ref.p_mean_variance(
            torch_model(learned), to_torch_nchw(xt), torch.from_numpy(t).long(), clip_denoised=True
        )
        np.testing.assert_allclose(np.asarray(out.mean), from_ref_nchw(rout["mean"]), rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(out.log_variance), SHAPE),
            from_ref_nchw(rout["log_variance"].expand_as(rout["mean"])),
            rtol=1e-3, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out.pred_xstart), from_ref_nchw(rout["pred_xstart"]), rtol=1e-3, atol=1e-5
        )

    @pytest.mark.parametrize(
        "loss_type,var_type",
        [("MSE", "FIXED_LARGE"), ("MSE", "LEARNED_RANGE"), ("RESCALED_MSE", "LEARNED_RANGE"),
         ("KL", "LEARNED_RANGE"), ("RESCALED_KL", "LEARNED_RANGE")],
    )
    def test_training_losses(self, rng_data, loss_type, var_type):
        import torch

        gd = load_reference_gd()
        x0, noise, t = rng_data
        sched = make_sched()
        learned = var_type == "LEARNED_RANGE"

        terms = training_losses(
            sched, jax_model(learned), x_start=jnp.array(x0), t=jnp.array(t), noise=jnp.array(noise),
            mean_type=ModelMeanType.EPSILON, var_type=ModelVarType[var_type],
            loss_type=LossType[loss_type],
        )
        ref = ref_diffusion(gd, "EPSILON", var_type, loss_type)
        rterms = ref.training_losses(
            torch_model(learned), to_torch_nchw(x0), torch.from_numpy(t).long(),
            noise=to_torch_nchw(noise),
        )
        np.testing.assert_allclose(
            np.asarray(terms["loss"]), rterms["loss"].numpy(), rtol=1e-3, atol=1e-5
        )

    def test_vb_and_prior_bpd(self, rng_data):
        import torch

        gd = load_reference_gd()
        x0, noise, t = rng_data
        sched = make_sched()
        xt = x0 * 0.7 + noise * 0.3
        out = vb_terms_bpd(
            sched, jax_model(True), x_start=jnp.array(x0), x_t=jnp.array(xt), t=jnp.array(t),
            mean_type=ModelMeanType.EPSILON, var_type=ModelVarType.LEARNED_RANGE,
        )
        ref = ref_diffusion(gd)
        rout = ref._vb_terms_bpd(
            torch_model(True), to_torch_nchw(x0), to_torch_nchw(xt),
            torch.from_numpy(t).long(), clip_denoised=True,
        )
        np.testing.assert_allclose(np.asarray(out["output"]), rout["output"].numpy(), rtol=1e-3, atol=1e-5)

        ours_prior = np.asarray(prior_bpd(sched, jnp.array(x0)))
        theirs_prior = ref._prior_bpd(to_torch_nchw(x0)).numpy()
        np.testing.assert_allclose(ours_prior, theirs_prior, rtol=1e-5)


class TestBpdLoop:
    def test_runs_and_is_consistent(self):
        sched = named_schedule("cosine", 10)
        x0 = jnp.array(np.random.RandomState(2).uniform(-1, 1, (2, 4, 4, 3)), dtype=jnp.float32)
        out = calc_bpd_loop(sched, jax_model(True), x_start=x0, rng=jax.random.key(0))
        assert out["vb"].shape == (2, 10)
        np.testing.assert_allclose(
            np.asarray(out["total_bpd"]),
            np.asarray(out["vb"]).sum(1) + np.asarray(out["prior_bpd"]),
            rtol=1e-5,
        )
        assert np.isfinite(np.asarray(out["total_bpd"])).all()
