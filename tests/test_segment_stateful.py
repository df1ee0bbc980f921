"""sample_chain_segment_dyn_stateful == the single-scan loop, caches and all.

bench.py measures the deploy256_fast stack (DeepCache + cached guidance)
through the warm-segment machinery — equal-length segments sharing one
compiled executable, cache states threaded across segment boundaries. This
pins that the segmented chain is BIT-identical to the one-scan loop under
deterministic DDIM (eta=0, keys unused), for:
  - a stateful model_fn (deep-cache-style counter state),
  - a stateful cond_fn (guidance-cache-style counter state),
  - both at once, split across uneven cut points.
"""

import numpy as np

import jax
import jax.numpy as jnp

from guided_diffusion_clip_tpu.diffusion import (
    SamplerConfig,
    ddim_sample_loop,
    ddim_step,
    named_schedule,
)
from guided_diffusion_clip_tpu.diffusion.sampling import (
    sample_chain_segment_dyn_stateful,
)

T = 20
SHAPE = (2, 8, 8, 3)


def stateful_model():
    """Counter-state model: output depends on the running step index, so any
    state-threading mistake across segment boundaries changes the result."""

    def f(x, t, state, **kw):
        j = state
        base = jnp.tanh(x * 0.3 + (j.astype(x.dtype) * 0.05))
        return jnp.concatenate([base, jnp.cos(x * 0.7)], axis=-1), j + 1

    return f, jnp.zeros((), jnp.int32)


def stateful_cond():
    def c(x, t, state, **kw):
        j, g_prev = state
        fresh = jnp.where(j % 3 == 0, 1.0, 0.0)
        g = fresh * (-0.05 * x) + (1 - fresh) * g_prev
        return g, (j + 1, g)

    return c, (jnp.zeros((), jnp.int32), jnp.zeros(SHAPE))


def test_segmented_stateful_chain_matches_single_scan():
    sched = named_schedule("cosine", T)
    cfg = SamplerConfig()
    mf, ms0 = stateful_model()
    cf, cs0 = stateful_cond()
    noise = jax.random.normal(jax.random.key(0), SHAPE)

    ref = ddim_sample_loop(
        sched, mf, SHAPE, jax.random.key(1), cfg=cfg, noise=noise,
        cond_fn=cf, model_state0=ms0, cond_state0=cs0,
    )

    # uneven cuts: 20 = 7 + 7 + 6 (the last segment has its own length/
    # executable; equal-length prefix segments share one)
    x, mstate, cstate = noise, ms0, cs0
    for t_hi, seg_len in ((20, 7), (13, 7), (6, 6)):
        x, mstate, cstate = sample_chain_segment_dyn_stateful(
            ddim_step, sched, mf, x, jax.random.key(2), t_hi, seg_len,
            cfg=cfg, cond_fn=cf, model_state=mstate, cond_state=cstate,
        )
    np.testing.assert_array_equal(np.asarray(x), np.asarray(ref))


def test_segmented_model_state_only():
    sched = named_schedule("cosine", T)
    cfg = SamplerConfig()
    mf, ms0 = stateful_model()
    noise = jax.random.normal(jax.random.key(0), SHAPE)
    ref = ddim_sample_loop(
        sched, mf, SHAPE, jax.random.key(1), cfg=cfg, noise=noise,
        model_state0=ms0,
    )
    x, mstate, _ = noise, ms0, None
    for t_hi, seg_len in ((20, 10), (10, 10)):
        x, mstate, _ = sample_chain_segment_dyn_stateful(
            ddim_step, sched, mf, x, jax.random.key(2), t_hi, seg_len,
            cfg=cfg, model_state=mstate,
        )
    np.testing.assert_array_equal(np.asarray(x), np.asarray(ref))


def test_segmented_jit_shares_executable_across_equal_segments():
    """The traced-t_start contract: equal-length segments hit one compile."""
    sched = named_schedule("cosine", T)
    cfg = SamplerConfig()
    mf, ms0 = stateful_model()
    noise = jax.random.normal(jax.random.key(0), SHAPE)

    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def seg(x_and_state, t_hi, seg_len):
        x, mstate = x_and_state
        x, mstate, _ = sample_chain_segment_dyn_stateful(
            ddim_step, sched, mf, x, jax.random.key(2), t_hi, seg_len,
            cfg=cfg, model_state=mstate,
        )
        return x, mstate

    carry = (noise, ms0)
    for t_hi in (20, 10):
        carry = seg(carry, t_hi, 10)
    assert seg._cache_size() == 1
    ref = ddim_sample_loop(
        sched, mf, SHAPE, jax.random.key(1), cfg=cfg, noise=noise,
        model_state0=ms0,
    )
    np.testing.assert_array_equal(np.asarray(carry[0]), np.asarray(ref))
