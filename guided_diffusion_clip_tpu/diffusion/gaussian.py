"""Gaussian diffusion q/p distributions, losses, and bpd — pure functions.

Reference behavior: guided_diffusion/gaussian_diffusion.py:101-917. Instead of
a stateful `GaussianDiffusion` object, everything here is a pure function over
a `DiffusionSchedule` pytree (schedules.py) plus a model callable
`model_fn(x, t_model, **kwargs) -> raw output`, so the whole denoise step jits
and scans cleanly.

Conventions:
  - images are NHWC float32 in [-1, 1] (the TPU-native layout; the torch
    reference uses NCHW).
  - `t` is int32 [B] indexing into the (possibly respaced) schedule; the model
    sees `sched.model_timesteps(t)` (respace.py:123-127 parity).
  - model_fn must already close over params; guidance `cond_fn(x, t_model,
    **kwargs) -> grad` likewise.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .losses import discretized_gaussian_log_likelihood, mean_flat, normal_kl
from .schedules import DiffusionSchedule, LossType, ModelMeanType, ModelVarType


def _extract(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-timestep coefficients and broadcast to an ndim tensor.

    Reference gaussian_diffusion.py:904-917 (_extract_into_tensor), minus the
    f64 round-trip: tables are already device f32.
    """
    out = table[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


# ---------------------------------------------------------------------------
# q (forward) process
# ---------------------------------------------------------------------------


def q_mean_variance(sched: DiffusionSchedule, x_start, t):
    """Mean/var/logvar of q(x_t | x_0) (reference :171-186)."""
    nd = x_start.ndim
    mean = _extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
    variance = _extract(1.0 - sched.alphas_cumprod, t, nd)
    log_variance = _extract(sched.log_one_minus_alphas_cumprod, t, nd)
    return mean, variance, log_variance


def q_sample(sched: DiffusionSchedule, x_start, t, noise):
    """Diffuse x_0 for t steps (reference :188-206)."""
    nd = x_start.ndim
    return (
        _extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
        + _extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def q_posterior_mean_variance(sched: DiffusionSchedule, x_start, x_t, t):
    """Mean/var/logvar of q(x_{t-1} | x_t, x_0) (reference :208-230)."""
    nd = x_t.ndim
    posterior_mean = (
        _extract(sched.posterior_mean_coef1, t, nd) * x_start
        + _extract(sched.posterior_mean_coef2, t, nd) * x_t
    )
    posterior_variance = _extract(sched.posterior_variance, t, nd)
    posterior_log_variance = _extract(sched.posterior_log_variance_clipped, t, nd)
    return posterior_mean, posterior_variance, posterior_log_variance


# ---------------------------------------------------------------------------
# p (reverse) process
# ---------------------------------------------------------------------------


def predict_xstart_from_eps(sched: DiffusionSchedule, x_t, t, eps):
    """x_0 = sqrt(1/ab_t) x_t - sqrt(1/ab_t - 1) eps (reference :328-336)."""
    nd = x_t.ndim
    return (
        _extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - _extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * eps
    )


def predict_xstart_from_xprev(sched: DiffusionSchedule, x_t, t, xprev):
    """Invert the posterior mean for PREVIOUS_X models (reference :338-348)."""
    nd = x_t.ndim
    coef1 = _extract(sched.posterior_mean_coef1, t, nd)
    coef2 = _extract(sched.posterior_mean_coef2, t, nd)
    return xprev / coef1 - (coef2 / coef1) * x_t


def predict_eps_from_xstart(sched: DiffusionSchedule, x_t, t, pred_xstart):
    """eps implied by an x_0 prediction (reference :350-354)."""
    nd = x_t.ndim
    return (
        _extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
    ) / _extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)


class PMeanVariance(NamedTuple):
    mean: jax.Array
    variance: jax.Array
    log_variance: jax.Array
    pred_xstart: jax.Array
    model_eps: jax.Array  # eps implied by the prediction (for DDIM / guidance)


def p_mean_variance(
    sched: DiffusionSchedule,
    model_fn: Callable,
    x,
    t,
    *,
    mean_type: ModelMeanType = ModelMeanType.EPSILON,
    var_type: ModelVarType = ModelVarType.LEARNED_RANGE,
    clip_denoised: bool = True,
    denoised_fn: Callable | None = None,
    model_kwargs: dict | None = None,
) -> PMeanVariance:
    """Distribution p(x_{t-1} | x_t) from the model output (reference :232-326).

    LEARNED_RANGE interpolates log-variance between posterior_log_var_clipped
    and log(beta) via the model's second half of channels (reference :269-276);
    FIXED_LARGE uses betas with the t=0 slot patched to posterior_var[1]
    (reference :281-287).
    """
    if model_kwargs is None:
        model_kwargs = {}
    nd = x.ndim
    C = x.shape[-1]

    model_output = model_fn(x, sched.model_timesteps(t), **model_kwargs)

    if var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
        assert model_output.shape[-1] == 2 * C, (
            f"learned-variance model must output 2C channels, got {model_output.shape}"
        )
        model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
        if var_type == ModelVarType.LEARNED:
            model_log_variance = model_var_values
            model_variance = jnp.exp(model_log_variance)
        else:
            min_log = _extract(sched.posterior_log_variance_clipped, t, nd)
            max_log = _extract(jnp.log(sched.betas), t, nd)
            frac = (model_var_values + 1.0) / 2.0
            model_log_variance = frac * max_log + (1.0 - frac) * min_log
            model_variance = jnp.exp(model_log_variance)
    elif var_type == ModelVarType.FIXED_LARGE:
        model_variance = jnp.exp(_extract(sched.log_fixed_large_variance, t, nd))
        model_log_variance = _extract(sched.log_fixed_large_variance, t, nd)
    elif var_type == ModelVarType.FIXED_SMALL:
        model_variance = _extract(sched.posterior_variance, t, nd)
        model_log_variance = _extract(sched.posterior_log_variance_clipped, t, nd)
    else:
        raise NotImplementedError(var_type)

    def process_xstart(x0):
        if denoised_fn is not None:
            x0 = denoised_fn(x0)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0

    if mean_type == ModelMeanType.PREVIOUS_X:
        pred_xstart = process_xstart(predict_xstart_from_xprev(sched, x, t, model_output))
        model_mean = model_output
    elif mean_type in (ModelMeanType.START_X, ModelMeanType.EPSILON):
        if mean_type == ModelMeanType.START_X:
            pred_xstart = process_xstart(model_output)
        else:
            pred_xstart = process_xstart(predict_xstart_from_eps(sched, x, t, model_output))
        model_mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    else:
        raise NotImplementedError(mean_type)

    model_eps = predict_eps_from_xstart(sched, x, t, pred_xstart)
    return PMeanVariance(model_mean, model_variance, model_log_variance, pred_xstart, model_eps)


# ---------------------------------------------------------------------------
# Guidance (reference :356-393)
# ---------------------------------------------------------------------------


def condition_mean(sched: DiffusionSchedule, cond_fn, out: PMeanVariance, x, t, model_kwargs=None):
    """Sohl-Dickstein conditioning: mean += variance * grad (reference :356-369)."""
    gradient = cond_fn(x, sched.model_timesteps(t), **(model_kwargs or {}))
    new_mean = out.mean + out.variance * gradient
    return out._replace(mean=new_mean)


def condition_score(sched: DiffusionSchedule, cond_fn, out: PMeanVariance, x, t, model_kwargs=None):
    """Song et al. score conditioning: eps -= sqrt(1-ab_t) * grad (reference :371-393).

    Recomputes pred_xstart and the posterior mean from the shifted eps.
    """
    nd = x.ndim
    alpha_bar = _extract(sched.alphas_cumprod, t, nd)
    eps = predict_eps_from_xstart(sched, x, t, out.pred_xstart)
    gradient = cond_fn(x, sched.model_timesteps(t), **(model_kwargs or {}))
    eps = eps - jnp.sqrt(1.0 - alpha_bar) * gradient
    pred_xstart = predict_xstart_from_eps(sched, x, t, eps)
    mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    return out._replace(mean=mean, pred_xstart=pred_xstart, model_eps=eps)


# ---------------------------------------------------------------------------
# Losses (reference :718-826)
# ---------------------------------------------------------------------------


def vb_terms_bpd(
    sched: DiffusionSchedule,
    model_fn: Callable,
    *,
    x_start,
    x_t,
    t,
    mean_type: ModelMeanType,
    var_type: ModelVarType,
    clip_denoised: bool = True,
    model_kwargs: dict | None = None,
):
    """Variational bound term at one timestep, in bits (reference :718-751).

    KL(q(x_{t-1}|x_t,x_0) || p(x_{t-1}|x_t)) / ln2, except t=0 which uses the
    discretized decoder NLL.
    """
    true_mean, _, true_log_variance_clipped = q_posterior_mean_variance(sched, x_start, x_t, t)
    out = p_mean_variance(
        sched, model_fn, x_t, t,
        mean_type=mean_type, var_type=var_type,
        clip_denoised=clip_denoised, model_kwargs=model_kwargs,
    )
    kl = normal_kl(true_mean, true_log_variance_clipped, out.mean, out.log_variance)
    kl = mean_flat(kl) / jnp.log(2.0)

    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=out.mean, log_scales=0.5 * out.log_variance
    )
    decoder_nll = mean_flat(decoder_nll) / jnp.log(2.0)

    output = jnp.where(t == 0, decoder_nll, kl)
    return {"output": output, "pred_xstart": out.pred_xstart}


def training_losses(
    sched: DiffusionSchedule,
    model_fn: Callable,
    *,
    x_start,
    t,
    noise,
    mean_type: ModelMeanType = ModelMeanType.EPSILON,
    var_type: ModelVarType = ModelVarType.LEARNED_RANGE,
    loss_type: LossType = LossType.RESCALED_MSE,
    model_kwargs: dict | None = None,
):
    """Per-example training losses (reference :753-826).

    MSE variants: target per mean_type; learned variances additionally get a
    vb term with the mean frozen (stop_gradient, reference :797) and, for
    RESCALED_MSE, the x T/1000 rescale (reference :808).
    KL variants: the vb term alone (x T for RESCALED_KL).
    Returns dict with "loss" and component terms, each shaped [B].
    """
    if model_kwargs is None:
        model_kwargs = {}
    x_t = q_sample(sched, x_start, t, noise)
    terms = {}

    if loss_type.is_vb:
        out = vb_terms_bpd(
            sched, model_fn, x_start=x_start, x_t=x_t, t=t,
            mean_type=mean_type, var_type=var_type,
            clip_denoised=False, model_kwargs=model_kwargs,
        )
        terms["loss"] = out["output"]
        if loss_type == LossType.RESCALED_KL:
            terms["loss"] = terms["loss"] * sched.num_timesteps
    elif loss_type in (LossType.MSE, LossType.RESCALED_MSE):
        model_output = model_fn(x_t, sched.model_timesteps(t), **model_kwargs)

        if var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            C = x_t.shape[-1]
            assert model_output.shape[-1] == 2 * C
            model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
            # Learn the variance with the vb loss but don't let it affect the
            # mean prediction (reference "frozen mean" trick, :794-800).
            frozen_out = jnp.concatenate(
                [jax.lax.stop_gradient(model_output), model_var_values], axis=-1
            )
            out = vb_terms_bpd(
                sched,
                lambda *_a, **_k: frozen_out,
                x_start=x_start, x_t=x_t, t=t,
                mean_type=mean_type, var_type=var_type,
                clip_denoised=False,
            )
            terms["vb"] = out["output"]
            if loss_type == LossType.RESCALED_MSE:
                terms["vb"] = terms["vb"] * sched.scale_loss_timestep_factor()

        if mean_type == ModelMeanType.PREVIOUS_X:
            target, _, _ = q_posterior_mean_variance(sched, x_start, x_t, t)
        elif mean_type == ModelMeanType.START_X:
            target = x_start
        else:
            target = noise
        assert model_output.shape == target.shape == x_start.shape
        terms["mse"] = mean_flat((target - model_output) ** 2)
        if "vb" in terms:
            terms["loss"] = terms["mse"] + terms["vb"]
        else:
            terms["loss"] = terms["mse"]
    else:
        raise NotImplementedError(loss_type)
    return terms


def prior_bpd(sched: DiffusionSchedule, x_start):
    """KL(q(x_T | x_0) || N(0, I)) in bits per batch element (reference :828-844)."""
    B = x_start.shape[0]
    t = jnp.full((B,), sched.num_timesteps - 1, dtype=jnp.int32)
    qt_mean, _, qt_log_variance = q_mean_variance(sched, x_start, t)
    kl_prior = normal_kl(qt_mean, qt_log_variance, 0.0, 0.0)
    return mean_flat(kl_prior) / jnp.log(2.0)


def calc_bpd_loop(
    sched: DiffusionSchedule,
    model_fn: Callable,
    *,
    x_start,
    rng: jax.Array,
    mean_type: ModelMeanType = ModelMeanType.EPSILON,
    var_type: ModelVarType = ModelVarType.LEARNED_RANGE,
    clip_denoised: bool = True,
    model_kwargs: dict | None = None,
):
    """Full-chain NLL evaluation as a lax.scan over t (reference :846-902).

    Returns dict of [B] total_bpd / prior_bpd and [B, T] vb / xstart_mse / mse
    (ordered t=0..T-1 on axis 1 like the reference, which scans T-1..0 and
    stacks then flips).
    """
    B = x_start.shape[0]
    T = sched.num_timesteps

    def step(carry, t_scalar):
        key = jax.random.fold_in(rng, t_scalar)
        t_batch = jnp.full((B,), t_scalar, dtype=jnp.int32)
        noise = jax.random.normal(key, x_start.shape, dtype=x_start.dtype)
        x_t = q_sample(sched, x_start, t_batch, noise)
        out = vb_terms_bpd(
            sched, model_fn, x_start=x_start, x_t=x_t, t=t_batch,
            mean_type=mean_type, var_type=var_type,
            clip_denoised=clip_denoised, model_kwargs=model_kwargs,
        )
        xstart_mse = mean_flat((out["pred_xstart"] - x_start) ** 2)
        eps = predict_eps_from_xstart(sched, x_t, t_batch, out["pred_xstart"])
        mse = mean_flat((eps - noise) ** 2)
        return carry, (out["output"], xstart_mse, mse)

    _, (vb, xstart_mse, mse) = jax.lax.scan(step, None, jnp.arange(T, dtype=jnp.int32))
    vb = jnp.moveaxis(vb, 0, 1)  # [B, T], t ascending
    xstart_mse = jnp.moveaxis(xstart_mse, 0, 1)
    mse = jnp.moveaxis(mse, 0, 1)

    prior = prior_bpd(sched, x_start)
    total_bpd = vb.sum(axis=1) + prior
    return {
        "total_bpd": total_bpd,
        "prior_bpd": prior,
        "vb": vb,
        "xstart_mse": xstart_mse,
        "mse": mse,
    }
