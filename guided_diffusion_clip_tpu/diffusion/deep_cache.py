"""DeepCache-style deep-feature reuse across denoise steps.

Training-free sampling acceleration (Ma et al. 2023, arXiv:2312.00858; the
block-caching observation also in Wimbauer et al., arXiv:2312.03209, retrieved
in PAPERS.md): the UNet's low-resolution "deep" features change slowly between
adjacent timesteps, so the deep sub-UNet (everything below the cut level —
deep input blocks, middle, deep output blocks) can be computed once every
``interval`` steps and reused in between, while the high-resolution shallow
path (the expensive blocks at large image sizes) is recomputed every step.
Beyond-reference capability; quality/speed trade-off is opt-in
(``--deep_cache N`` on the sampling CLIs).

Mechanics: UNetModel exposes cache_mode="full" (compute everything, also
return the deep feature) and "shallow" (recompute only the shallow blocks,
splice a cached deep feature in at the skip topology's cut point) —
models/unet.py. The sampling loops thread a (step_index, deep_feature) state
through the scan carry via their ``model_state0`` protocol; each step picks
the full or shallow branch with ``lax.cond`` (only the taken branch executes
on TPU), so the whole cached chain still compiles into ONE XLA program.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def deep_cache_model_fn(apply_full: Callable, apply_shallow: Callable, interval: int) -> Callable:
    """Build a stateful model fn for the sampling loops' model_state0 slot.

    ``apply_full(x, t, **kw) -> (out, deep)`` runs the whole UNet and returns
    the deep feature; ``apply_shallow(x, t, deep, **kw) -> (out, deep)`` runs
    only the shallow blocks around a cached deep feature. Steps where
    ``step_index % interval == 0`` refresh the cache (the first step always
    does — the zero-initialized cache is never consumed).
    """
    assert interval >= 1

    def fn(x, t, state, **kw):
        step_i, deep = state

        def full(_):
            return apply_full(x, t, **kw)

        def shallow(d):
            return apply_shallow(x, t, d, **kw)

        out, deep = jax.lax.cond((step_i % interval) == 0, full, shallow, deep)
        return out, (step_i + 1, deep)

    return fn


def zero_state(apply_full: Callable, x, t, **kw):
    """Initial (step_index, deep_feature) state: zeros of the deep feature's
    shape/dtype via eval_shape (no compute; safe inside a jit trace)."""
    _, deep_sd = jax.eval_shape(lambda xx, tt: apply_full(xx, tt, **kw), x, t)
    return (jnp.int32(0), jnp.zeros(deep_sd.shape, deep_sd.dtype))


def cfg_deep_cache_pair(
    cached_apply: Callable,
    cfg_scale: float,
    null_kwargs: dict,
) -> tuple[Callable, Callable]:
    """Compose classifier-free guidance WITH deep-feature caching.

    ``cached_apply(x, t, deep_cache=?, cache_mode=?, cache_cut handled by the
    caller's closure, **kw)`` is the raw model apply exposing the cache modes.
    Both CFG branches ride the same doubled batch (guidance.cfg_double), so
    the cached deep feature simply has 2B rows; the eps combination
    (guidance.cfg_combine) happens on the way out of either branch. Feed the
    results to ``deep_cache_model_fn`` as usual.
    """
    from .guidance import cfg_combine, cfg_double

    def apply_full(x, t, **kw):
        x2, t2, kw2 = cfg_double(x, t, kw, null_kwargs)
        out2, deep2 = cached_apply(x2, t2, cache_mode="full", **kw2)
        return cfg_combine(out2, cfg_scale, x.shape[-1]), deep2

    def apply_shallow(x, t, deep2, **kw):
        x2, t2, kw2 = cfg_double(x, t, kw, null_kwargs)
        out2, _ = cached_apply(x2, t2, deep_cache=deep2, cache_mode="shallow", **kw2)
        return cfg_combine(out2, cfg_scale, x.shape[-1]), deep2

    return apply_full, apply_shallow
