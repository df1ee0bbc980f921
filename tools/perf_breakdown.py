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

import jax
import jax.numpy as jnp
import numpy as np

from guided_diffusion_clip_tpu.diffusion.guidance import (
    classifier_cond_fn,
    model_fn_dropping_y,
)
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
    fn(*args, **kwargs)  # compile + warm
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        r = fn(*args, **kwargs)
        float(jnp.sum(r[0] if isinstance(r, tuple) else r))
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
        rs = np.random.RandomState(seed)
        return jax.tree_util.tree_map(
            lambda s: (rs.standard_normal(s.shape) * 0.02).astype(s.dtype), shapes
        )

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

    @jax.jit
    def unet_fwd(p, x, t, y):
        return model.apply({"params": p}, x, t, y=y)

    @jax.jit
    def cls_fwd(cp, x, t):
        return classifier.apply({"params": cp}, x, t)

    @jax.jit
    def cls_grad(cp, x, t, y):
        def lp(xx):
            logits = classifier.apply({"params": cp}, xx, t)
            lsm = jax.nn.log_softmax(logits)
            return lsm[jnp.arange(B), y].sum()

        return jax.grad(lp)(x)

    @jax.jit
    def full_step(p, cp, x, ti, key, y):
        def unet_fn(xx, tt, **kw):
            return model.apply({"params": p}, xx, tt, **kw)

        def classifier_fn(xx, tt):
            return classifier.apply({"params": cp}, xx, tt)

        cond_fn = classifier_cond_fn(classifier_fn, 1.0)
        model_fn = model_fn_dropping_y(unet_fn, True)
        s, _ = p_sample_step(
            diffusion.sched, model_fn, x, ti, key,
            cfg=SamplerConfig(mean_type=diffusion.mean_type, var_type=diffusion.var_type),
            cond_fn=cond_fn, model_kwargs={"y": y},
        )
        return s

    impl = os.environ.get("GDC_ATTENTION_IMPL", "auto")
    results = {
        "batch": B,
        "attention_impl": impl,
        "unet_fwd_ms": round(timed(unet_fwd, params, x, t, y) * 1000, 1),
        "cls_fwd_ms": round(timed(cls_fwd, cparams, x, t) * 1000, 1),
        "cls_grad_ms": round(timed(cls_grad, cparams, x, ti.astype(jnp.float32), y) * 1000, 1),
        "full_step_ms": round(timed(full_step, params, cparams, x, ti, key, y) * 1000, 1),
    }
    results["per_sample_step_ms"] = round(results["full_step_ms"] / B, 2)
    results["proj_samples_per_min_250"] = round(
        60.0 / (results["full_step_ms"] / 1000 * 250 / B), 2
    )
    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
