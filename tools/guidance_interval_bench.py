"""On-chip --guidance_interval throughput measurement.

Runs the headline bench config (ADM-G 256px, classifier-guided, respaced 250,
batch 16) with always-on guidance vs interval-gated guidance for each window
in GIB_WINDOWS, same init key, and reports samples/min/chip per window.

Unlike DeepCache, the interval intentionally CHANGES the sampled distribution
(that is its point — Kynkaenniemi et al. 2024 restrict guidance to mid noise
levels to improve FID), so same-seed deviation vs full guidance is reported
only as context, not as a fidelity bound; window choice is a quality knob to
be tuned per model. What this tool pins is the COST side: each gated-off step
should cost the same as an unguided one (the classifier fwd+VJP is
lax.cond-skipped inside the scan).

Usage: python tools/guidance_interval_bench.py
Env: GIB_BATCH (16), GIB_IMAGE_SIZE (256), GIB_STEPS (respacing, 250),
GIB_WINDOWS ("0,700;200,800"), GIB_CONV_IMPL (int8 | xla -> bf16 path),
GIB_DEEP_CACHE (0; N>1 composes DeepCache on the generator with the gated
classifier gradient — the classifier_sample.py stack), GIB_GUIDANCE_CACHE
(0; N>1 recomputes the classifier gradient 1-in-N steps via cached_cond_fn,
applied INSIDE any interval gate).
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

from guided_diffusion_clip_tpu.diffusion.guidance import (
    cached_cond_fn,
    classifier_cond_fn,
    interval_cond_fn,
    model_fn_dropping_y,
)
from guided_diffusion_clip_tpu.ops.config import int8_emit, set_conv_impl
from guided_diffusion_clip_tpu.utils.script_util import (
    create_classifier,
    create_gaussian_diffusion,
    create_upstream_model,
)


def main():
    B = int(os.environ.get("GIB_BATCH", 16))
    size = int(os.environ.get("GIB_IMAGE_SIZE", 256))
    steps = os.environ.get("GIB_STEPS", "250")
    windows = [
        tuple(float(v) for v in w.split(","))
        for w in os.environ.get("GIB_WINDOWS", "0,700;200,800").split(";")
        if w.strip()
    ]
    set_conv_impl(os.environ.get("GIB_CONV_IMPL", "int8"))

    ch = int(os.environ.get("GIB_CH", 256 if size == 256 else 192))
    fp16 = os.environ.get("GIB_FP16", "1") == "1"  # 0 for CPU smoke
    model = create_upstream_model(
        image_size=size, num_channels=ch,
        num_res_blocks=2, channel_mult="", learn_sigma=True, class_cond=True,
        use_checkpoint=False, attention_resolutions="32,16,8", num_heads=4,
        num_head_channels=64, num_heads_upsample=-1, use_scale_shift_norm=True,
        dropout=0.0, resblock_updown=True, use_fp16=fp16,
        use_new_attention_order=False,
    )
    classifier = create_classifier(
        image_size=size, classifier_use_fp16=fp16, classifier_width=128,
        classifier_depth=2, classifier_attention_resolutions="32,16,8",
        classifier_use_scale_shift_norm=True, classifier_resblock_updown=True,
        classifier_pool="attention",
    )
    diffusion = create_gaussian_diffusion(
        steps=1000, learn_sigma=True, noise_schedule="linear",
        timestep_respacing=steps,
    )
    T = diffusion.num_timesteps
    shape = (B, size, size, 3)

    def random_fill(shapes, seed):
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
    classes = jnp.arange(B, dtype=jnp.int32) % 1000
    key = jax.random.key(7)

    deep_cache_n = int(os.environ.get("GIB_DEEP_CACHE", 0))
    guidance_cache_n = int(os.environ.get("GIB_GUIDANCE_CACHE", 0))

    def make_chain(window):
        def chain(params, cparams, key):
            def classifier_fn(xx, t):
                return classifier.apply({"params": cparams}, xx, t)

            cond_fn = classifier_cond_fn(classifier_fn, classifier_scale=1.0)
            if window is not None:
                cond_fn = interval_cond_fn(cond_fn, *window)
            cond_state0 = None
            if guidance_cache_n > 1:
                cond_fn, cond_state0 = cached_cond_fn(cond_fn, guidance_cache_n, shape)
            if deep_cache_n > 1:
                from guided_diffusion_clip_tpu.diffusion.deep_cache import (
                    deep_cache_model_fn,
                    zero_state,
                )

                def apply_full(xx, t, y=None, **kw):
                    with int8_emit("s8"):
                        return model.apply(
                            {"params": params}, xx, t, y=y, cache_mode="full", **kw
                        )

                def apply_shallow(xx, t, deep, y=None, **kw):
                    with int8_emit("s8"):
                        return model.apply(
                            {"params": params}, xx, t, y=y, deep_cache=deep,
                            cache_mode="shallow", **kw,
                        )

                sfn = deep_cache_model_fn(apply_full, apply_shallow, deep_cache_n)
                state0 = zero_state(
                    apply_full, jnp.zeros(shape), jnp.zeros((B,), jnp.int32), y=classes
                )
                return diffusion.p_sample_loop(
                    sfn, shape, key, clip_denoised=True,
                    model_kwargs={"y": classes}, cond_fn=cond_fn,
                    model_state0=state0, cond_state0=cond_state0,
                )

            def unet_fn(xx, t, **kw):
                with int8_emit("s8"):
                    return model.apply({"params": params}, xx, t, **kw)

            return diffusion.p_sample_loop(
                model_fn_dropping_y(unet_fn, class_cond=True), shape, key,
                clip_denoised=True, model_kwargs={"y": classes}, cond_fn=cond_fn,
                cond_state0=cond_state0,
            )

        return jax.jit(chain)

    t0 = time.time()

    def run(window, label):
        fn = make_chain(window)
        tc = time.time()
        out = np.asarray(fn(params, cparams, key))  # compile + run + fetch
        print(f"[gib +{time.time()-t0:.0f}s] {label}: compile+first in {time.time()-tc:.0f}s", flush=True)
        tr = time.time()
        out = np.asarray(fn(params, cparams, key))
        secs = time.time() - tr
        print(
            f"[gib +{time.time()-t0:.0f}s] {label}: {secs:.1f}s/chain "
            f"= {B / secs * 60:.2f} samples/min/chip ({T} steps)", flush=True
        )
        return out, secs

    ref, ref_s = run(None, "full-guidance")
    results = {"full_guidance_samples_per_min": round(B / ref_s * 60, 2)}
    for lo, hi in windows:
        label = f"interval[{lo:g},{hi:g}]"
        out, secs = run((lo, hi), label)
        a, b = ref.ravel().astype(np.float64), out.ravel().astype(np.float64)
        corr = float(np.corrcoef(a, b)[0, 1])
        results[label] = {
            "samples_per_min": round(B / secs * 60, 2),
            "speedup": round(ref_s / secs, 3),
            "corr_vs_full_context_only": round(corr, 6),
        }
    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
