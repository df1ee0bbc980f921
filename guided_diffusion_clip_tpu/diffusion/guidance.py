"""Guidance gradient builders: classifier guidance and generic potentials.

Reference behavior: scripts/classifier_sample.py:54-61 — cond_fn computes
grad_x of the selected class log-probability through the noised classifier,
scaled by classifier_scale. Torch uses autograd-with-requires_grad inside the
sampling loop; here the whole thing is `jax.grad` composed INSIDE the scanned
denoise step, so guidance compiles into the same XLA program as the UNet
forward (no graph breaks, no per-step dispatch).

The same slot accepts a CLIP image/text-similarity gradient (see
models/clip_vit.py + clip_guidance_cond_fn) — the technique described in the
reference model card (model-card.md:45-48).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def classifier_cond_fn(classifier_fn: Callable, classifier_scale: float = 1.0) -> Callable:
    """Build cond_fn(x, t, y=..., **kw) -> d/dx [log p(y|x, t)] * scale.

    `classifier_fn(x, t) -> logits` must close over the classifier params.
    Matches classifier_sample.py:54-61 (sum of selected log-softmax, grad wrt x).
    """

    def cond_fn(x, t, y=None, **kwargs):
        assert y is not None, "classifier guidance requires labels y"

        def selected_logp(x_in):
            logits = classifier_fn(x_in, t)
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            selected = jnp.take_along_axis(log_probs, y[:, None], axis=-1)
            return selected.sum()

        return jax.grad(selected_logp)(x) * classifier_scale

    return cond_fn


def potential_cond_fn(potential: Callable, scale: float = 1.0) -> Callable:
    """Generic guidance from any scalar potential U(x, t, **kw): grad_x U * scale."""

    def cond_fn(x, t, **kwargs):
        return jax.grad(lambda x_: potential(x_, t, **kwargs))(x) * scale

    return cond_fn


def parse_guidance_interval(spec: str) -> tuple[float, float] | None:
    """Parse the --guidance_interval flag: "lo,hi" in original-model-timestep
    units (0..T_orig-1, i.e. the values the model itself sees), or "" for
    always-on guidance. Returns (lo, hi) or None."""
    spec = (spec or "").strip()
    if not spec:
        return None
    parts = spec.split(",")
    if len(parts) != 2:
        raise ValueError(f"--guidance_interval wants 'lo,hi', got {spec!r}")
    lo, hi = float(parts[0]), float(parts[1])
    if lo > hi:
        raise ValueError(f"--guidance_interval lo > hi: {spec!r}")
    return lo, hi


def interval_cond_fn(cond_fn: Callable, t_lo: float, t_hi: float) -> Callable:
    """Apply guidance only while t_lo <= t <= t_hi (original timestep units).

    Kynkaenniemi et al. 2024 ("Applying Guidance in a Limited Interval"):
    guidance helps most at mid noise levels; restricting it both improves
    sample quality and skips the guidance network entirely outside the
    window. The skip is a real `lax.cond` branch inside the scanned denoise
    step — outside the interval the classifier/CLIP forward+VJP never run,
    so the guided chain costs the same as an unguided one there.

    `t` arrives as the [B] model-timestep vector the sampling scan builds
    from one scalar counter (sampling.py `jnp.full`), so the per-chain
    predicate reads element 0. Zero gradient == no-op for both guidance
    composition rules (condition_mean adds variance*grad; condition_score
    shifts eps by sqrt(1-ab)*grad).
    """

    def fn(x, t, **kwargs):
        tt = jnp.asarray(t).reshape(-1)[0].astype(jnp.float32)
        inside = jnp.logical_and(tt >= t_lo, tt <= t_hi)
        return jax.lax.cond(
            inside,
            lambda: cond_fn(x, t, **kwargs),
            lambda: jnp.zeros_like(x),
        )

    return fn


def cached_cond_fn(cond_fn: Callable, every: int, shape, dtype=jnp.float32):
    """Guidance-gradient caching: recompute cond_fn every `every` steps,
    reuse the previous gradient in between. Returns (stateful_fn, state0)
    for the sampling loops' `cond_state0` slot — the gradient rides the scan
    carry and the guidance network (classifier fwd+VJP, or the CLIP encoder
    and, in pred-x0 mode, the extra UNet forward it differentiates through)
    is `lax.cond`-skipped on reuse steps.

    The same deep-feature-reuse logic as DeepCache (--deep_cache), applied
    to the guidance term: the gradient field varies smoothly along the
    chain, so a 1-in-N refresh tracks it closely (fidelity measured like
    DeepCache's in tools/int8_chain_quality.py, variant gcN). Composes with
    interval_cond_fn (wrap the interval first: reuse steps outside the
    window recycle the cached zeros; refresh steps there skip the network
    via the inner cond).

    `shape` is the per-call x shape (the gradient's shape); the step counter
    starts at 0, so the FIRST step always recomputes.
    """
    assert every >= 1

    def fn(x, t, state, **kwargs):
        i, g_prev = state
        grad = jax.lax.cond(
            i % every == 0,
            lambda: cond_fn(x, t, **kwargs).astype(dtype),
            lambda: g_prev,
        )
        return grad, (i + 1, grad)

    state0 = (jnp.zeros((), jnp.int32), jnp.zeros(shape, dtype))
    return fn, state0


def cfg_model_fn(
    model_fn: Callable,
    cfg_scale: float,
    null_kwargs: dict,
    interval: tuple[float, float] | None = None,
) -> Callable:
    """Classifier-free guidance (Ho & Salimans 2022) — beyond the reference.

    Wraps a conditional `model_fn(x, t, **kwargs)` so each call evaluates the
    conditional and unconditional branches in ONE doubled batch (keeps the MXU
    fed; the two halves compile into the same convolutions) and combines the
    eps halves as `eps_u + scale * (eps_c - eps_u)`. Channels beyond the input
    channel count (the learned variance when learn_sigma) pass through from
    the CONDITIONAL branch unchanged.

    `null_kwargs` maps the conditioning keys to their *unconditional* value
    (broadcastable per example): `clip_feat -> 0-vector` for the fork's
    embedding conditioning, `y -> null class index` for Embed models trained
    with a reserved null row. Keys NOT in null_kwargs (e.g. `low_res`) are
    duplicated verbatim into both branches. The model must have been trained
    with matching conditioning dropout (TrainLoop ``cond_dropout``) for the
    null branch to mean "unconditional".

    `interval=(lo, hi)` restricts CFG to that model-timestep window (see
    interval_cond_fn): outside it only the plain conditional branch runs —
    HALF the model FLOPs of the doubled batch, a real `lax.cond` skip.
    """

    def cfg_eval(x, t, kwargs):
        x2, t2, kw2 = cfg_double(x, t, kwargs, null_kwargs)
        return cfg_combine(model_fn(x2, t2, **kw2), cfg_scale, x.shape[-1])

    if interval is None:
        return lambda x, t, **kwargs: cfg_eval(x, t, kwargs)

    t_lo, t_hi = interval

    def fn(x, t, **kwargs):
        tt = jnp.asarray(t).reshape(-1)[0].astype(jnp.float32)
        inside = jnp.logical_and(tt >= t_lo, tt <= t_hi)
        return jax.lax.cond(
            inside,
            lambda: cfg_eval(x, t, kwargs),
            lambda: model_fn(x, t, **kwargs),
        )

    return fn


def cfg_cached_model_fn(
    model_fn: Callable,
    cfg_scale: float,
    null_kwargs: dict,
    every: int,
    interval: tuple[float, float] | None = None,
) -> Callable:
    """Classifier-free guidance with a CACHED unconditional branch.

    The CFG analog of cached_cond_fn: the conditional branch runs every step
    on the plain batch; the unconditional branch is recomputed only 1-in-
    `every` steps and its output rides the scan carry in between. CFG cost
    drops from 2x the model to (1 + 1/every)x — the uncond eps field varies
    as smoothly along the chain as the guidance gradient does, so the same
    1-in-N refresh tracks it (fidelity measured like gcN in
    tools/int8_chain_quality.py, variant cfgcN).

    Returns a STATEFUL model fn `(x, t, state, **kw) -> (out, state)` for the
    sampling loops' `model_state0` slot; build state0 with
    `cfg_cached_state0`. Unlike cfg_model_fn's doubled batch, refresh steps
    run two B-sized model calls — mathematically identical (convs/GroupNorm/
    attention are all per-image), and at the batch sizes that saturate the
    chip the doubled batch holds no throughput edge.

    `interval=(lo, hi)` composes like cfg_model_fn's: outside the window only
    the conditional branch's output is used and the uncond refresh is
    lax.cond-skipped. The refresh counter advances only on inside-window
    steps, so the FIRST guided step always refreshes (never combines against
    the zeros in state0).
    """
    assert every >= 1

    def fn(x, t, state, **kwargs):
        j, u_prev = state
        cond_out = model_fn(x, t, **kwargs)
        c = x.shape[-1]
        if interval is None:
            inside = jnp.bool_(True)
        else:
            tt = jnp.asarray(t).reshape(-1)[0].astype(jnp.float32)
            inside = jnp.logical_and(tt >= interval[0], tt <= interval[1])
        refresh = jnp.logical_and(inside, j % every == 0)
        u = jax.lax.cond(
            refresh,
            lambda: model_fn(x, t, **_null_merge(kwargs, null_kwargs)).astype(
                u_prev.dtype
            ),
            lambda: u_prev,
        )
        def _combine():
            eps = u[..., :c] + cfg_scale * (cond_out[..., :c] - u[..., :c])
            return jnp.concatenate([eps, cond_out[..., c:]], axis=-1)

        # outside the window the combine is never emitted (not computed-and-
        # discarded), so the zeros in state0 can't feed any arithmetic
        out = jax.lax.cond(inside, _combine, lambda: cond_out)
        return out, (jnp.where(inside, j + 1, j), u)

    return fn


def cfg_cached_state0(model_fn: Callable, x, t, **kwargs):
    """(counter, zeros-of-model-output) initial carry for cfg_cached_model_fn.

    Shape-infers the model output via jax.eval_shape (no compile, no device
    work — the deep_cache.zero_state pattern)."""
    out = jax.eval_shape(lambda: model_fn(x, t, **kwargs))
    return (jnp.zeros((), jnp.int32), jnp.zeros(out.shape, out.dtype))


def _null_merge(kwargs: dict, null_kwargs: dict) -> dict:
    """kwargs with the conditioning keys replaced by their null values
    (the single-batch counterpart of cfg_double's bottom half)."""
    kw = {}
    for k, v in kwargs.items():
        if v is None or k not in null_kwargs:
            kw[k] = v
        else:
            kw[k] = jnp.broadcast_to(jnp.asarray(null_kwargs[k], dtype=v.dtype), v.shape)
    return kw


def cfg_double(x, t, kwargs: dict, null_kwargs: dict):
    """Stack the conditional batch on top of its null-conditioned twin."""
    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    kw2 = {}
    for k, v in kwargs.items():
        if v is None:
            kw2[k] = None
        elif k in null_kwargs:
            nv = jnp.broadcast_to(jnp.asarray(null_kwargs[k], dtype=v.dtype), v.shape)
            kw2[k] = jnp.concatenate([v, nv], axis=0)
        else:
            kw2[k] = jnp.concatenate([v, v], axis=0)
    return x2, t2, kw2


def cfg_combine(out2, cfg_scale: float, c: int):
    """eps_u + scale*(eps_c - eps_u) over the first c channels; extra
    channels (learned variance) pass through from the conditional half."""
    cond_out, uncond_out = jnp.split(out2, 2, axis=0)
    eps = uncond_out[..., :c] + cfg_scale * (cond_out[..., :c] - uncond_out[..., :c])
    return jnp.concatenate([eps, cond_out[..., c:]], axis=-1)


def model_fn_dropping_y(model_fn: Callable, class_cond: bool) -> Callable:
    """classifier_sample.py:63-65: drop y from the UNet call unless class-conditional
    (guidance labels are still consumed by cond_fn)."""

    def fn(x, t, y=None, **kwargs):
        return model_fn(x, t, y=y if class_cond else None, **kwargs)

    return fn
