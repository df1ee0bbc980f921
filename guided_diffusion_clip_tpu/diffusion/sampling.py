"""Ancestral (p_sample) and DDIM sampling loops as single lax.scans.

Reference behavior: guided_diffusion/gaussian_diffusion.py:395-716. The
reference runs a Python generator loop with one host->device round trip per
timestep (:531-544); here the whole denoise chain is ONE compiled
`lax.scan` over the (respaced) timestep axis — fixed shapes, static
coefficient tables, threaded PRNG key. Classifier/CLIP guidance composes via
`cond_fn` (a jax.grad-built callable) inside the scanned body.

`denoise_start_point` (fork feature, reference gaussian_diffusion.py:452,
517-523): instead of starting from pure noise at t=T-1, start from
q_sample(init_image, t0) and denoise t0-1..0. It is a static Python int here
(one recompile per distinct depth — documented, cheap).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from . import gaussian as G
from .schedules import DiffusionSchedule, ModelMeanType, ModelVarType


def _keys_batched(rng) -> bool:
    """True when `rng` is a [B] vector of typed PRNG keys — PER-SAMPLE RNG.

    Every loop here accepts either one scalar key (batch-level noise, the
    default) or a [batch] key vector: then every noise draw is vmapped over
    the keys, so sample i's randomness depends ONLY on keys[i]. Because the
    models mix nothing across the batch axis (GroupNorm/attention/int8
    scales are all per-image), sample i's output is then independent of
    whatever it is batched with — the property serving-side request
    coalescing relies on (scripts/serve.py). The model still runs on the
    merged batch (no vmap over the network — measured 44% slower)."""
    return jnp.issubdtype(rng.dtype, jax.dtypes.prng_key) and rng.ndim == 1


def _split(rng, n):
    """random.split for a scalar key ([n] out) or [B] keys ([n, B] out) —
    either way the leading axis is the split index (unpackable/scannable)."""
    if _keys_batched(rng):
        return jax.vmap(lambda k: jax.random.split(k, n), out_axes=1)(rng)
    return jax.random.split(rng, n)


def _normal(rng, shape, dtype):
    """random.normal from a scalar key, or row-wise from [B] keys."""
    if _keys_batched(rng):
        assert shape[0] == rng.shape[0], (shape, rng.shape)
        return jax.vmap(lambda k: jax.random.normal(k, shape[1:], dtype))(rng)
    return jax.random.normal(rng, shape, dtype)


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Static sampling configuration (hashable; safe as a jit static arg)."""

    mean_type: ModelMeanType = ModelMeanType.EPSILON
    var_type: ModelVarType = ModelVarType.LEARNED_RANGE
    clip_denoised: bool = True
    eta: float = 0.0  # DDIM stochasticity (reference :546, eq.12 eta)
    # -1 => start from noise at T-1; otherwise start from q_sample(init, t0).
    denoise_start_point: int = -1


def _start_state(sched, cfg, shape, rng, noise=None, init_image=None):
    """Initial latent + first timestep index (reference :509-529)."""
    if cfg.denoise_start_point == -1:
        t_start = sched.num_timesteps
        if noise is None:
            noise = _normal(rng, shape, jnp.float32)
        img = noise
    else:
        t_start = int(cfg.denoise_start_point)
        assert 0 < t_start <= sched.num_timesteps
        assert init_image is not None, "denoise_start_point requires an init image"
        t0 = jnp.full((shape[0],), t_start - 1, dtype=jnp.int32)
        start_noise = _normal(rng, shape, jnp.float32)
        img = G.q_sample(sched, init_image, t0, start_noise)
    return img, t_start


def p_sample_step(
    sched: DiffusionSchedule,
    model_fn: Callable,
    x,
    t,
    rng,
    *,
    cfg: SamplerConfig,
    cond_fn: Callable | None = None,
    denoised_fn: Callable | None = None,
    model_kwargs: dict | None = None,
):
    """One ancestral step x_t -> x_{t-1} (reference p_sample :395-439).

    sample = mean + 1{t != 0} * exp(0.5 logvar) * z, with guidance shifting
    the mean by variance * cond_fn (condition_mean, reference :434-437).
    """
    out = G.p_mean_variance(
        sched, model_fn, x, t,
        mean_type=cfg.mean_type, var_type=cfg.var_type,
        clip_denoised=cfg.clip_denoised, denoised_fn=denoised_fn,
        model_kwargs=model_kwargs,
    )
    if cond_fn is not None:
        out = G.condition_mean(sched, cond_fn, out, x, t, model_kwargs=model_kwargs)
    noise = _normal(rng, x.shape, x.dtype)
    nonzero_mask = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
    sample = out.mean + nonzero_mask * jnp.exp(0.5 * out.log_variance) * noise
    return sample, out.pred_xstart


def ddim_step(
    sched: DiffusionSchedule,
    model_fn: Callable,
    x,
    t,
    rng,
    *,
    cfg: SamplerConfig,
    cond_fn: Callable | None = None,
    denoised_fn: Callable | None = None,
    model_kwargs: dict | None = None,
):
    """One DDIM step (reference ddim_sample :546-594, eq.12 of Song et al.).

    Guidance uses condition_score (reference :570-571): shift eps by
    -sqrt(1-ab) * grad before re-deriving x0 and the update.
    """
    out = G.p_mean_variance(
        sched, model_fn, x, t,
        mean_type=cfg.mean_type, var_type=cfg.var_type,
        clip_denoised=cfg.clip_denoised, denoised_fn=denoised_fn,
        model_kwargs=model_kwargs,
    )
    if cond_fn is not None:
        out = G.condition_score(sched, cond_fn, out, x, t, model_kwargs=model_kwargs)

    nd = x.ndim
    eps = G.predict_eps_from_xstart(sched, x, t, out.pred_xstart)
    alpha_bar = G._extract(sched.alphas_cumprod, t, nd)
    alpha_bar_prev = G._extract(sched.alphas_cumprod_prev, t, nd)
    sigma = (
        cfg.eta
        * jnp.sqrt((1.0 - alpha_bar_prev) / (1.0 - alpha_bar))
        * jnp.sqrt(1.0 - alpha_bar / alpha_bar_prev)
    )
    noise = _normal(rng, x.shape, x.dtype)
    mean_pred = (
        out.pred_xstart * jnp.sqrt(alpha_bar_prev)
        + jnp.sqrt(1.0 - alpha_bar_prev - sigma**2) * eps
    )
    nonzero_mask = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (nd - 1))
    sample = mean_pred + nonzero_mask * sigma * noise
    return sample, out.pred_xstart


def ddim_reverse_step(
    sched: DiffusionSchedule,
    model_fn: Callable,
    x,
    t,
    *,
    cfg: SamplerConfig,
    model_kwargs: dict | None = None,
):
    """Deterministic encoding step x_t -> x_{t+1} (reference :596-632, eta=0 only)."""
    out = G.p_mean_variance(
        sched, model_fn, x, t,
        mean_type=cfg.mean_type, var_type=cfg.var_type,
        clip_denoised=cfg.clip_denoised, model_kwargs=model_kwargs,
    )
    nd = x.ndim
    eps = (
        G._extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x - out.pred_xstart
    ) / G._extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)
    alpha_bar_next = G._extract(sched.alphas_cumprod_next, t, nd)
    mean_pred = out.pred_xstart * jnp.sqrt(alpha_bar_next) + jnp.sqrt(1.0 - alpha_bar_next) * eps
    return mean_pred, out.pred_xstart


def _scan_loop(
    step_fn,
    sched,
    model_fn,
    shape,
    rng,
    *,
    cfg,
    noise,
    init_image,
    cond_fn,
    denoised_fn,
    model_kwargs,
    progressive: bool,
    model_state0=None,
    cond_state0=None,
):
    """model_state0 opts into a STATEFUL model: `model_fn(x, t, state, **kw)
    -> (out, new_state)`, with the state threaded through the scan carry
    (used by deep-feature caching, diffusion/deep_cache.py). cond_state0
    does the same for guidance: `cond_fn(x, t, state, **kw) -> (gradient,
    new_state)` (used by guidance-gradient caching, guidance.cached_cond_fn).
    The step must call each stateful fn exactly once — true of every step_fn
    here when cond_fn is set."""
    rng, init_rng = _split(rng, 2)
    img, t_start = _start_state(sched, cfg, shape, init_rng, noise=noise, init_image=init_image)
    timesteps = jnp.arange(t_start - 1, -1, -1, dtype=jnp.int32)
    step_keys = _split(rng, t_start)
    has_m = model_state0 is not None
    has_c = cond_state0 is not None

    def body(carry, inp):
        x = carry[0] if (has_m or has_c) else carry
        mstate = carry[1] if has_m else None
        cstate = carry[1 + has_m] if has_c else None
        if not has_m:
            mf = model_fn
        else:
            m_captured = []

            def mf(xx, tt, **kw):
                out, st = model_fn(xx, tt, mstate, **kw)
                m_captured.append(st)
                return out

        if not has_c:
            cf = cond_fn
        else:
            c_captured = []

            def cf(xx, tt, **kw):
                grad, st = cond_fn(xx, tt, cstate, **kw)
                c_captured.append(st)
                return grad

        t_scalar, key = inp
        t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
        sample, pred_xstart = step_fn(
            sched, mf, x, t, key,
            cfg=cfg, cond_fn=cf, denoised_fn=denoised_fn, model_kwargs=model_kwargs,
        )
        out = (sample, pred_xstart) if progressive else None
        new_carry = sample
        if has_m or has_c:
            new_carry = (sample,)
            if has_m:
                assert len(m_captured) == 1, "stateful model_fn requires one call per step"
                new_carry += (m_captured[0],)
            if has_c:
                assert len(c_captured) == 1, "stateful cond_fn requires one call per step"
                new_carry += (c_captured[0],)
        return new_carry, out

    init = img
    if has_m or has_c:
        init = (img,) + ((model_state0,) if has_m else ()) + ((cond_state0,) if has_c else ())
    final, ys = jax.lax.scan(body, init, (timesteps, step_keys))
    if has_m or has_c:
        final = final[0]
    if progressive:
        return final, ys  # ys = (samples [T,B,H,W,C], pred_xstarts [T,...])
    return final


def p_sample_loop(
    sched: DiffusionSchedule,
    model_fn: Callable,
    shape,
    rng,
    *,
    cfg: SamplerConfig = SamplerConfig(),
    noise=None,
    init_image=None,
    cond_fn: Callable | None = None,
    denoised_fn: Callable | None = None,
    model_kwargs: dict | None = None,
    model_state0=None,
    cond_state0=None,
):
    """Full ancestral sampling chain as one scan (reference :441-544)."""
    return _scan_loop(
        p_sample_step, sched, model_fn, shape, rng,
        cfg=cfg, noise=noise, init_image=init_image, cond_fn=cond_fn,
        denoised_fn=denoised_fn, model_kwargs=model_kwargs, progressive=False,
        model_state0=model_state0, cond_state0=cond_state0,
    )


def p_sample_loop_progressive(sched, model_fn, shape, rng, **kw):
    """Like p_sample_loop but also returns all intermediates (reference :489-544).

    Returns (final, (samples[T,...], pred_xstarts[T,...])) ordered from the
    first denoise step to the last.
    """
    return _scan_loop(
        p_sample_step, sched, model_fn, shape, rng, progressive=True,
        **{k: kw.get(k) for k in (
            "noise", "init_image", "cond_fn", "denoised_fn", "model_kwargs",
            "model_state0", "cond_state0",
        )},
        cfg=kw.get("cfg", SamplerConfig()),
    )


def ddim_sample_loop(
    sched: DiffusionSchedule,
    model_fn: Callable,
    shape,
    rng,
    *,
    cfg: SamplerConfig = SamplerConfig(),
    noise=None,
    init_image=None,
    cond_fn: Callable | None = None,
    denoised_fn: Callable | None = None,
    model_kwargs: dict | None = None,
    model_state0=None,
    cond_state0=None,
):
    """Full DDIM chain as one scan (reference :634-716)."""
    return _scan_loop(
        ddim_step, sched, model_fn, shape, rng,
        cfg=cfg, noise=noise, init_image=init_image, cond_fn=cond_fn,
        denoised_fn=denoised_fn, model_kwargs=model_kwargs, progressive=False,
        model_state0=model_state0, cond_state0=cond_state0,
    )


def ddim_sample_loop_progressive(sched, model_fn, shape, rng, **kw):
    return _scan_loop(
        ddim_step, sched, model_fn, shape, rng, progressive=True,
        **{k: kw.get(k) for k in (
            "noise", "init_image", "cond_fn", "denoised_fn", "model_kwargs",
            "model_state0", "cond_state0",
        )},
        cfg=kw.get("cfg", SamplerConfig()),
    )


def sample_chain_segment(
    step_fn,
    sched: DiffusionSchedule,
    model_fn: Callable,
    x,
    rng,
    t_start: int,
    t_end: int,
    *,
    cfg: SamplerConfig = SamplerConfig(),
    cond_fn: Callable | None = None,
    denoised_fn: Callable | None = None,
    model_kwargs: dict | None = None,
):
    """Scan a sub-range of the denoise chain: timesteps t_start-1 .. t_end.

    Lets callers split one long chain into several device dispatches (useful
    where single-program execution time is bounded, e.g. worker watchdogs on
    remote-attached TPUs) while the carry stays on device. Composing segments
    [T, k) + [k, 0) is numerically identical to one scan when the same
    per-step keys are used; here each segment consumes fresh splits of `rng`.
    """
    B = x.shape[0]
    n = t_start - t_end
    timesteps = jnp.arange(t_start - 1, t_end - 1, -1, dtype=jnp.int32)
    step_keys = _split(rng, n)

    def body(carry, inp):
        t_scalar, key = inp
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        sample, _ = step_fn(
            sched, model_fn, carry, t, key,
            cfg=cfg, cond_fn=cond_fn, denoised_fn=denoised_fn, model_kwargs=model_kwargs,
        )
        return sample, None

    final, _ = jax.lax.scan(body, x, (timesteps, step_keys))
    return final


def sample_chain_segment_dyn(
    step_fn,
    sched: DiffusionSchedule,
    model_fn: Callable,
    x,
    rng,
    t_start,
    seg_len: int,
    *,
    cfg: SamplerConfig = SamplerConfig(),
    cond_fn: Callable | None = None,
    denoised_fn: Callable | None = None,
    model_kwargs: dict | None = None,
):
    """sample_chain_segment with a TRACED start timestep and static length.

    Scans timesteps t_start-1 .. t_start-seg_len. Because only seg_len (not
    the boundary values) is compile-time static, every equal-length segment
    of a long chain reuses ONE compiled executable — a 250-step chain run as
    5x50 segments compiles once instead of five times (first-compile through
    remote TPU relays costs minutes per program).
    """
    B = x.shape[0]
    t0 = jnp.asarray(t_start, jnp.int32)
    timesteps = t0 - 1 - jnp.arange(seg_len, dtype=jnp.int32)
    step_keys = _split(rng, seg_len)

    def body(carry, inp):
        t_scalar, key = inp
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        sample, _ = step_fn(
            sched, model_fn, carry, t, key,
            cfg=cfg, cond_fn=cond_fn, denoised_fn=denoised_fn, model_kwargs=model_kwargs,
        )
        return sample, None

    final, _ = jax.lax.scan(body, x, (timesteps, step_keys))
    return final


def sample_chain_segment_dyn_stateful(
    step_fn,
    sched: DiffusionSchedule,
    model_fn: Callable,
    x,
    rng,
    t_start,
    seg_len: int,
    *,
    cfg: SamplerConfig = SamplerConfig(),
    cond_fn: Callable | None = None,
    denoised_fn: Callable | None = None,
    model_kwargs: dict | None = None,
    model_state=None,
    cond_state=None,
):
    """sample_chain_segment_dyn with _scan_loop's cache carries.

    Runs timesteps t_start-1 .. t_start-seg_len with model_state/cond_state
    threaded through the scan (stateful model_fn = DeepCache, stateful
    cond_fn = guidance caching — same contracts as _scan_loop), and RETURNS
    (x, model_state, cond_state) so the caller threads the caches across
    segment boundaries: a 250-step cached chain run as 5x50 segments is
    bit-identical to the single-scan loop while sharing one compiled
    executable across equal-length segments (bench.py's warm-segment
    machinery for the deploy256_fast stack)."""
    B = x.shape[0]
    t0 = jnp.asarray(t_start, jnp.int32)
    timesteps = t0 - 1 - jnp.arange(seg_len, dtype=jnp.int32)
    step_keys = _split(rng, seg_len)
    has_m = model_state is not None
    has_c = cond_state is not None

    def body(carry, inp):
        xx, mstate, cstate = carry
        if not has_m:
            mf = model_fn
        else:
            m_captured = []

            def mf(xi, ti, **kw):
                out, st = model_fn(xi, ti, mstate, **kw)
                m_captured.append(st)
                return out

        if not has_c:
            cf = cond_fn
        else:
            c_captured = []

            def cf(xi, ti, **kw):
                grad, st = cond_fn(xi, ti, cstate, **kw)
                c_captured.append(st)
                return grad

        t_scalar, key = inp
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        sample, _ = step_fn(
            sched, mf, xx, t, key,
            cfg=cfg, cond_fn=cf, denoised_fn=denoised_fn, model_kwargs=model_kwargs,
        )
        if has_m:
            assert len(m_captured) == 1, "stateful model_fn requires one call per step"
            mstate = m_captured[0]
        if has_c:
            assert len(c_captured) == 1, "stateful cond_fn requires one call per step"
            cstate = c_captured[0]
        return (sample, mstate, cstate), None

    (final, mstate, cstate), _ = jax.lax.scan(
        body, (x, model_state, cond_state), (timesteps, step_keys)
    )
    return final, mstate, cstate


def dpm_solver_pp_2m_loop(
    sched: DiffusionSchedule,
    model_fn: Callable,
    shape,
    rng,
    *,
    cfg: SamplerConfig = SamplerConfig(),
    noise=None,
    init_image=None,
    cond_fn: Callable | None = None,
    denoised_fn: Callable | None = None,
    model_kwargs: dict | None = None,
    model_state0=None,
    cond_state0=None,
):
    """DPM-Solver++(2M) sampling chain as one scan.

    Beyond-reference capability (the reference has only ancestral and DDIM,
    gaussian_diffusion.py:441/634): a second-order multistep ODE solver in
    data-prediction form (Lu et al. 2022, arXiv:2211.01095, Algorithm 2) —
    markedly better sample quality than DDIM at 10-25 steps for the same
    model. Runs on the (respaced) discrete grid: per step t -> t_prev,

        h_i   = lambda(t_prev) - lambda(t),  lambda = log(alpha/sigma)
        r_i   = h_{i-1} / h_i
        D_i   = (1 + 1/(2 r_i)) x0_i - 1/(2 r_i) x0_{i-1}   (first step: x0_i)
        x     = (sigma_prev / sigma_t) x - alpha_prev * expm1(-h_i) * D_i

    The final step (t == 0, sigma_prev = 0, h -> inf) uses the first-order
    update, which reduces to returning the predicted x0 — the standard
    `lower_order_final` practice. Classifier/CLIP guidance composes exactly
    like the DDIM path (condition_score shifts eps before x0 is derived).
    Deterministic given the init noise; `rng` only seeds x_T.
    """
    rng, init_rng = _split(rng, 2)
    img, t_start = _start_state(sched, cfg, shape, init_rng, noise=noise, init_image=init_image)
    timesteps = jnp.arange(t_start - 1, -1, -1, dtype=jnp.int32)
    nd = len(shape)

    def x0_of(x, t, mstate, cstate):
        if mstate is None:
            mf, captured = model_fn, None
        else:
            captured = []

            def mf(xx, tt, **kw):
                out, st = model_fn(xx, tt, mstate, **kw)
                captured.append(st)
                return out

        if cstate is None:
            cf = cond_fn
        else:
            c_captured = []

            def cf(xx, tt, **kw):
                grad, st = cond_fn(xx, tt, cstate, **kw)
                c_captured.append(st)
                return grad

        out = G.p_mean_variance(
            sched, mf, x, t,
            mean_type=cfg.mean_type, var_type=cfg.var_type,
            clip_denoised=cfg.clip_denoised, denoised_fn=denoised_fn,
            model_kwargs=model_kwargs,
        )
        if cond_fn is not None:
            out = G.condition_score(sched, cf, out, x, t, model_kwargs=model_kwargs)
        if cstate is not None:
            assert len(c_captured) == 1, "stateful cond_fn requires one call per step"
            cstate = c_captured[0]
        if mstate is None:
            return out.pred_xstart, None, cstate
        assert len(captured) == 1, "stateful model_fn requires one call per step"
        return out.pred_xstart, captured[0], cstate

    def lam(ab):
        return 0.5 * (jnp.log(ab) - jnp.log1p(-ab))

    def body(carry, t_scalar):
        (x, x0_prev, h_prev, has_prev), mstate, cstate = carry
        t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
        x0, mstate, cstate = x0_of(x, t, mstate, cstate)

        ab_t = G._extract(sched.alphas_cumprod, t, nd)
        ab_prev = G._extract(sched.alphas_cumprod_prev, t, nd)
        # guard ab_prev == 1 (t == 0): lambda diverges; that branch returns
        # x0. NB 1-1e-8 rounds back to 1.0 in f32 — the clamp must exceed
        # f32 epsilon or log1p(-ab) is -inf.
        ab_prev_safe = jnp.minimum(ab_prev, 1.0 - 1e-6)
        h = lam(ab_prev_safe) - lam(ab_t)
        r = h_prev / h
        coef = 1.0 / (2.0 * r)
        d_2m = (1.0 + coef) * x0 - coef * x0_prev
        d = jnp.where(has_prev > 0, d_2m, x0)

        sigma_t = jnp.sqrt(1.0 - ab_t)
        sigma_prev = jnp.sqrt(1.0 - ab_prev_safe)
        alpha_prev = jnp.sqrt(ab_prev_safe)
        x_next = (sigma_prev / sigma_t) * x - alpha_prev * jnp.expm1(-h) * d

        # where (not an arithmetic blend): any non-finite in the unselected
        # branch must not propagate into the final step's x0
        x_next = jnp.where(t_scalar == 0, x0, x_next)
        return ((x_next, x0, h, jnp.float32(1.0)), mstate, cstate), None

    init = (
        (
            img,
            jnp.zeros(shape, jnp.float32),
            jnp.full((shape[0],) + (1,) * (nd - 1), 1.0, jnp.float32),
            jnp.float32(0.0),
        ),
        model_state0,
        cond_state0,
    )
    ((final, _, _, _), _, _), _ = jax.lax.scan(body, init, timesteps)
    return final


def ddim_reverse_loop(
    sched: DiffusionSchedule,
    model_fn: Callable,
    x0,
    *,
    cfg: SamplerConfig = SamplerConfig(),
    model_kwargs: dict | None = None,
):
    """Deterministically encode x_0 to x_T by scanning ddim_reverse_step forward."""
    B = x0.shape[0]
    timesteps = jnp.arange(sched.num_timesteps, dtype=jnp.int32)

    def body(x, t_scalar):
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        nxt, _ = ddim_reverse_step(sched, model_fn, x, t, cfg=cfg, model_kwargs=model_kwargs)
        return nxt, None

    final, _ = jax.lax.scan(body, x0, timesteps)
    return final
