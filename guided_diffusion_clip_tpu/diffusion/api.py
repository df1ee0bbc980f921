"""High-level Diffusion handle bundling schedule + mean/var/loss types.

The reference exposes a stateful `GaussianDiffusion`/`SpacedDiffusion` object
(gaussian_diffusion.py:101, respace.py:63); our core is pure functions over a
`DiffusionSchedule` pytree. This thin frozen wrapper gives scripts the same
ergonomic handle (`diffusion.training_losses(...)`, `diffusion.p_sample_loop
(...)`) while staying a static pytree-of-config that jit closes over.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax

from . import gaussian as G
from . import sampling as S
from .schedules import DiffusionSchedule, LossType, ModelMeanType, ModelVarType


@dataclasses.dataclass(frozen=True)
class Diffusion:
    sched: DiffusionSchedule
    mean_type: ModelMeanType = ModelMeanType.EPSILON
    var_type: ModelVarType = ModelVarType.LEARNED_RANGE
    loss_type: LossType = LossType.MSE

    @property
    def num_timesteps(self) -> int:
        return self.sched.num_timesteps

    def _cfg(self, clip_denoised=True, eta=0.0, denoise_start_point=-1) -> S.SamplerConfig:
        return S.SamplerConfig(
            mean_type=self.mean_type,
            var_type=self.var_type,
            clip_denoised=clip_denoised,
            eta=eta,
            denoise_start_point=denoise_start_point,
        )

    # --- q/p ---------------------------------------------------------------
    def q_sample(self, x_start, t, noise):
        return G.q_sample(self.sched, x_start, t, noise)

    def p_mean_variance(self, model_fn, x, t, *, clip_denoised=True, denoised_fn=None, model_kwargs=None):
        return G.p_mean_variance(
            self.sched, model_fn, x, t,
            mean_type=self.mean_type, var_type=self.var_type,
            clip_denoised=clip_denoised, denoised_fn=denoised_fn, model_kwargs=model_kwargs,
        )

    # --- losses ------------------------------------------------------------
    def training_losses(self, model_fn, x_start, t, noise, model_kwargs=None):
        return G.training_losses(
            self.sched, model_fn, x_start=x_start, t=t, noise=noise,
            mean_type=self.mean_type, var_type=self.var_type, loss_type=self.loss_type,
            model_kwargs=model_kwargs,
        )

    def calc_bpd_loop(self, model_fn, x_start, rng, *, clip_denoised=True, model_kwargs=None):
        return G.calc_bpd_loop(
            self.sched, model_fn, x_start=x_start, rng=rng,
            mean_type=self.mean_type, var_type=self.var_type,
            clip_denoised=clip_denoised, model_kwargs=model_kwargs,
        )

    # --- sampling ----------------------------------------------------------
    def p_sample_loop(
        self, model_fn, shape, rng, *, noise=None, init_image=None,
        clip_denoised=True, denoised_fn=None, cond_fn=None, model_kwargs=None,
        denoise_start_point=-1, progressive=False, model_state0=None,
        cond_state0=None,
    ):
        cfg = self._cfg(clip_denoised, denoise_start_point=denoise_start_point)
        if progressive:
            return S.p_sample_loop_progressive(
                self.sched, model_fn, shape, rng, cfg=cfg, noise=noise,
                init_image=init_image, cond_fn=cond_fn, denoised_fn=denoised_fn,
                model_kwargs=model_kwargs, model_state0=model_state0,
                cond_state0=cond_state0,
            )
        return S.p_sample_loop(
            self.sched, model_fn, shape, rng, cfg=cfg, noise=noise,
            init_image=init_image, cond_fn=cond_fn, denoised_fn=denoised_fn,
            model_kwargs=model_kwargs, model_state0=model_state0,
            cond_state0=cond_state0,
        )

    def ddim_sample_loop(
        self, model_fn, shape, rng, *, noise=None, init_image=None,
        clip_denoised=True, denoised_fn=None, cond_fn=None, model_kwargs=None,
        eta=0.0, denoise_start_point=-1, progressive=False, model_state0=None,
        cond_state0=None,
    ):
        cfg = self._cfg(clip_denoised, eta=eta, denoise_start_point=denoise_start_point)
        if progressive:
            return S.ddim_sample_loop_progressive(
                self.sched, model_fn, shape, rng, cfg=cfg, noise=noise,
                init_image=init_image, cond_fn=cond_fn, denoised_fn=denoised_fn,
                model_kwargs=model_kwargs, model_state0=model_state0,
                cond_state0=cond_state0,
            )
        return S.ddim_sample_loop(
            self.sched, model_fn, shape, rng, cfg=cfg, noise=noise,
            init_image=init_image, cond_fn=cond_fn, denoised_fn=denoised_fn,
            model_kwargs=model_kwargs, model_state0=model_state0,
            cond_state0=cond_state0,
        )

    def dpm_solver_pp_2m_loop(
        self, model_fn, shape, rng, *, noise=None, init_image=None,
        clip_denoised=True, denoised_fn=None, cond_fn=None, model_kwargs=None,
        denoise_start_point=-1, model_state0=None, cond_state0=None,
    ):
        """Second-order multistep ODE sampler (DPM-Solver++ 2M) — better
        quality than DDIM at 10-25 steps; beyond-reference capability."""
        cfg = self._cfg(clip_denoised, denoise_start_point=denoise_start_point)
        return S.dpm_solver_pp_2m_loop(
            self.sched, model_fn, shape, rng, cfg=cfg, noise=noise,
            init_image=init_image, cond_fn=cond_fn, denoised_fn=denoised_fn,
            model_kwargs=model_kwargs, model_state0=model_state0,
            cond_state0=cond_state0,
        )

    def ddim_reverse_loop(self, model_fn, x0, *, clip_denoised=True, model_kwargs=None):
        """Deterministically encode x_0 -> x_T (reference ddim_reverse_sample
        :596-632 iterated forward)."""
        return S.ddim_reverse_loop(
            self.sched, model_fn, x0, cfg=self._cfg(clip_denoised), model_kwargs=model_kwargs
        )
