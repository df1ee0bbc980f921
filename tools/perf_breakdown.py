"""Per-component timing of the headline bench step on the attached TPU.

Breaks the 256px guided denoise step into UNet fwd / classifier fwd /
classifier grad / full p_sample_step so perf work targets the real
bottleneck. Fetch-based timing (block_until_ready is unreliable through
remote TPU relays).

Usage: python tools/perf_breakdown.py [batch]
Env: GDC_ATTENTION_IMPL=xla|pallas to compare attention backends.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()  # JAX_PLATFORMS env alone cannot override the axon hook


import jax
import jax.numpy as jnp
import numpy as np

from guided_diffusion_clip_tpu.diffusion.guidance import (
    classifier_cond_fn,
    model_fn_dropping_y,
)
from guided_diffusion_clip_tpu.ops.config import int8_emit
from guided_diffusion_clip_tpu.diffusion.sampling import (
    SamplerConfig,
    p_sample_step,
)
from guided_diffusion_clip_tpu.utils.script_util import (
    create_classifier,
    create_gaussian_diffusion,
    create_upstream_model,
)


def timed(fn, *args, n=3, **kwargs):
    """fn MUST be jitted and reduce to a scalar (or small tensor) ITSELF.

    Any post-hoc `jnp.sum(result)` here would be an eager op through the TPU
    relay — measured at 10-50s per dispatch, which swamps the signal (this is
    exactly what corrupted the first round-2 breakdown run).
    """
    float(fn(*args, **kwargs))  # compile + warm
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        float(fn(*args, **kwargs))  # scalar fetch forces completion
        best = min(best, time.time() - t0)
    return best


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = int(os.environ.get("BD_IMAGE_SIZE", 256))
    model = create_upstream_model(
        image_size=size, num_channels=256 if size == 256 else 192,
        num_res_blocks=2, channel_mult="", learn_sigma=True, class_cond=True,
        use_checkpoint=False, attention_resolutions="32,16,8", num_heads=4,
        num_head_channels=64, num_heads_upsample=-1, use_scale_shift_norm=True,
        dropout=0.0, resblock_updown=True, use_fp16=True,
        use_new_attention_order=False,
    )
    classifier = create_classifier(
        image_size=size, classifier_use_fp16=True, classifier_width=128,
        classifier_depth=2, classifier_attention_resolutions="32,16,8",
        classifier_use_scale_shift_norm=True, classifier_resblock_updown=True,
        classifier_pool="attention",
    )
    diffusion = create_gaussian_diffusion(
        steps=1000, learn_sigma=True, noise_schedule="linear",
        timestep_respacing="250",
    )

    shape = (B, size, size, 3)

    def random_fill(shapes, seed):
        # device_put ONCE: host numpy trees fed to jit re-upload per dispatch
        # (~30s/550MB through the relay), swamping every measurement.
        rs = np.random.RandomState(seed)
        host = jax.tree_util.tree_map(
            lambda s: (rs.standard_normal(s.shape) * 0.02).astype(s.dtype), shapes
        )
        return jax.device_put(host)

    params = random_fill(
        jax.eval_shape(lambda: model.init(
            jax.random.key(0), jnp.zeros(shape), jnp.zeros((B,)),
            y=jnp.zeros((B,), jnp.int32))),
        0,
    )["params"]
    cparams = random_fill(
        jax.eval_shape(lambda: classifier.init(
            jax.random.key(1), jnp.zeros(shape), jnp.zeros((B,)))),
        1,
    )["params"]

    x = jax.device_put(np.random.RandomState(2).randn(*shape).astype(np.float32))
    t = jnp.full((B,), 128.0)
    ti = jnp.full((B,), 128, jnp.int32)
    y = jnp.zeros((B,), jnp.int32)
    key = jax.random.key(3)

    # Every timed program reduces to a scalar IN-JIT (eager reductions cost
    # 10-50s each through the relay) and repeats the op REPS times on a data
    # -dependent carry so per-dispatch relay overhead (~25ms) amortizes away.
    REPS = int(os.environ.get("BD_REPS", 8))

    def repeat(f):
        def body(carry, _):
            out = f(carry)
            return carry + 1e-6 * out[..., :3].astype(carry.dtype), jnp.sum(out[:1, :1])

        def run(x0):
            _, sums = jax.lax.scan(body, x0, None, length=REPS)
            return jnp.sum(sums)

        return run

    @jax.jit
    def unet_fwd(p, x, t, y):
        def apply(xx):
            with int8_emit("s8"):
                return model.apply({"params": p}, xx, t, y=y)

        return repeat(apply)(x)

    @jax.jit
    def cls_fwd(cp, x, t):
        def body(carry, _):
            logits = classifier.apply({"params": cp}, carry, t)
            return carry + 1e-6 * jnp.mean(logits), jnp.sum(logits[:1])

        _, sums = jax.lax.scan(body, x, None, length=REPS)
        return jnp.sum(sums)

    @jax.jit
    def cls_grad(cp, x, t, y):
        def lp(xx):
            logits = classifier.apply({"params": cp}, xx, t)
            lsm = jax.nn.log_softmax(logits)
            return lsm[jnp.arange(B), y].sum()

        return repeat(lambda xx: jax.grad(lp)(xx))(x)

    @jax.jit
    def full_step(p, cp, x, ti, key, y):
        def unet_fn(xx, tt, **kw):
            with int8_emit("s8"):
                return model.apply({"params": p}, xx, tt, **kw)

        def classifier_fn(xx, tt):
            return classifier.apply({"params": cp}, xx, tt)

        cond_fn = classifier_cond_fn(classifier_fn, 1.0)
        model_fn = model_fn_dropping_y(unet_fn, True)

        def body(carry, _):
            s, _ = p_sample_step(
                diffusion.sched, model_fn, carry, ti, key,
                cfg=SamplerConfig(mean_type=diffusion.mean_type, var_type=diffusion.var_type),
                cond_fn=cond_fn, model_kwargs={"y": y},
            )
            return s, ()

        out, _ = jax.lax.scan(body, x, None, length=REPS)
        return jnp.sum(out[:1, :1])

    impl = os.environ.get("GDC_ATTENTION_IMPL", "auto")
    results = {"batch": B, "attention_impl": impl}
    phases = [
        ("unet_fwd_ms", lambda: timed(unet_fwd, params, x, t, y)),
        ("cls_fwd_ms", lambda: timed(cls_fwd, cparams, x, t)),
        ("cls_grad_ms", lambda: timed(cls_grad, cparams, x, ti.astype(jnp.float32), y)),
        ("full_step_ms", lambda: timed(full_step, params, cparams, x, ti, key, y)),
    ]
    only = os.environ.get("BD_ONLY", "")
    for name, run in phases:
        if only and only not in name:
            continue
        results[name] = round(run() * 1000 / REPS, 2)
        print(f"{name}: {results[name]}", flush=True)
    if "full_step_ms" not in results:
        import json

        print(json.dumps(results))
        return
    results["per_sample_step_ms"] = round(results["full_step_ms"] / B, 2)
    results["proj_samples_per_min_250"] = round(
        60.0 / (results["full_step_ms"] / 1000 * 250 / B), 2
    )
    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
