"""Isolate the optimizer+EMA tail of the training step on the attached TPU.

Motivation: the measured 64px README-config train step (~275 ms) splits into
fwd ~45 + bwd ~77 per microbatch-16 (x2 microbatches) and a residual ~33 ms
opt/EMA tail. The HBM roofline for Adam+EMA over the ~120M-param tree is
~5 ms (read grads/params/m/v/ema + write params/m/v/ema at ~819 GB/s), a ~6x
gap — hypothesis: per-leaf kernel dispatch (hundreds of small fused loops)
rather than bandwidth. This probe measures, all as scan-amortized jits:

  grads_only   value_and_grad of the microbatch loss, no update
  tree_update  adamw update + apply + 1x EMA on the param PYTREE (prod path)
  flat_update  the same math on ONE flattened f32 vector per state tensor
               (what a fused/foreach optimizer would look like)

If flat ~= roofline while tree ~= the 33 ms tail, the fix is a ravel-based
optimizer state (flatten once at init, unravel views only for the model
apply); if tree ~= flat, the tail is real bandwidth and there is no prize.

Usage: python tools/opt_tail_probe.py   (env: OTP_REPS scan length, def 8)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from guided_diffusion_clip_tpu.utils.script_util import (
    create_gaussian_diffusion,
    create_upstream_model,
)

REPS = int(os.environ.get("OTP_REPS", 8))


def timed(fn, *args, n=3):
    float(fn(*args))  # compile + warm (scalar fetch forces completion)
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        float(fn(*args))
        best = min(best, time.time() - t0)
    return best / REPS


def main():
    size = int(os.environ.get("OTP_IMAGE_SIZE", 64))
    micro = int(os.environ.get("OTP_MICRO", 16))
    model = create_upstream_model(
        image_size=size, num_channels=int(os.environ.get("OTP_CH", 192)),
        num_res_blocks=3, channel_mult="",
        learn_sigma=True, class_cond=True, use_checkpoint=False,
        attention_resolutions="32,16,8", num_heads=4, num_head_channels=64,
        num_heads_upsample=-1, use_scale_shift_norm=True, dropout=0.0,
        resblock_updown=True, use_fp16=True, use_new_attention_order=True,
    )
    diffusion = create_gaussian_diffusion(steps=1000, learn_sigma=True, noise_schedule="cosine")

    shape = (micro, size, size, 3)
    params = jax.device_put(
        jax.tree_util.tree_map(
            lambda s: (np.random.RandomState(1).standard_normal(s.shape) * 0.02).astype(s.dtype),
            jax.eval_shape(
                lambda: model.init(
                    jax.random.key(0), jnp.zeros(shape), jnp.zeros((micro,)),
                    y=jnp.zeros((micro,), jnp.int32),
                )
            ),
        )
    )["params"]
    n_leaves = len(jax.tree_util.tree_leaves(params))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"[otp] {n_params/1e6:.1f}M params in {n_leaves} leaves", flush=True)

    opt = optax.adamw(1e-4)
    opt_state = jax.jit(opt.init)(params)

    x = jnp.zeros(shape, jnp.float32)
    y = jnp.zeros((micro,), jnp.int32)
    t = jnp.full((micro,), 100, jnp.int32)

    def loss_fn(p, rng):
        def model_fn(xx, tt, **kw):
            return model.apply({"params": p}, xx, tt, **kw)

        noise = jax.random.normal(rng, x.shape)
        terms = diffusion.training_losses(model_fn, x, t, noise, model_kwargs={"y": y})
        return jnp.mean(terms["loss"])

    grad_fn = jax.value_and_grad(loss_fn)

    @jax.jit
    def grads_only(p, rng):
        def body(r, _):
            loss, g = grad_fn(p, r)
            r = jax.random.fold_in(r, 1)
            # touch every grad leaf so nothing is DCE'd
            s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(g))
            return r, loss + 0.0 * s
        _, losses = jax.lax.scan(body, rng, None, length=REPS)
        return losses.sum()

    @jax.jit
    def full_tree(p, o, e, rng):
        def body(carry, _):
            p, o, e, r = carry
            loss, g = grad_fn(p, r)
            upd, o = opt.update(g, o, p)
            p = optax.apply_updates(p, upd)
            e = optax.incremental_update(p, e, step_size=1.0 - 0.9999)
            return (p, o, e, jax.random.fold_in(r, 1)), loss
        (p, o, e, _), losses = jax.lax.scan(body, (p, o, e, rng), None, length=REPS)
        return losses.sum() + jax.tree_util.tree_leaves(e)[0].astype(jnp.float32).sum()

    # ---- update-only variants on synthetic grads (isolate the tail) ----
    grads = jax.jit(lambda p: jax.tree_util.tree_map(lambda v: 1e-6 * jnp.ones_like(v), p))(params)
    ema = jax.tree_util.tree_map(jnp.copy, params)

    @jax.jit
    def tree_update(p, o, e, g):
        def body(carry, _):
            p, o, e = carry
            upd, o = opt.update(g, o, p)
            p = optax.apply_updates(p, upd)
            e = optax.incremental_update(p, e, step_size=1.0 - 0.9999)
            return (p, o, e), jnp.float32(0)
        (p, o, e), _ = jax.lax.scan(body, (p, o, e), None, length=REPS)
        return jax.tree_util.tree_leaves(p)[0].astype(jnp.float32).sum() + \
            jax.tree_util.tree_leaves(e)[0].astype(jnp.float32).sum()

    flat, unravel = jax.flatten_util.ravel_pytree(params)
    fopt_state = jax.jit(opt.init)(flat)
    fgrads = jnp.full_like(flat, 1e-6)
    fema = flat.copy()

    @jax.jit
    def flat_update(p, o, e, g):
        def body(carry, _):
            p, o, e = carry
            upd, o = opt.update(g, o, p)
            p = optax.apply_updates(p, upd)
            e = e + (1.0 - 0.9999) * (p - e)
            return (p, o, e), jnp.float32(0)
        (p, o, e), _ = jax.lax.scan(body, (p, o, e), None, length=REPS)
        return p.sum() + e.sum()

    rng = jax.random.key(0)
    r_tree_up = timed(tree_update, params, opt_state, ema, grads)
    r_flat_up = timed(flat_update, flat, fopt_state, fema, fgrads)
    r_grads = timed(grads_only, params, rng)
    r_full = timed(full_tree, params, opt_state, ema, rng)

    bw_bytes = n_params * 4 * 9  # r: g,p,m,v,e; w: p,m,v,e
    print(f"[otp] grads_only      {r_grads*1e3:8.2f} ms / iter")
    print(f"[otp] full step       {r_full*1e3:8.2f} ms / iter (tail = {(r_full-r_grads)*1e3:.2f})")
    print(f"[otp] tree opt+EMA    {r_tree_up*1e3:8.2f} ms / iter ({n_leaves} leaves)")
    print(f"[otp] flat opt+EMA    {r_flat_up*1e3:8.2f} ms / iter (1 buffer)")
    print(f"[otp] HBM roofline    {bw_bytes/819e9*1e3:8.2f} ms ({bw_bytes/1e9:.2f} GB @ 819GB/s)")


if __name__ == "__main__":
    main()
