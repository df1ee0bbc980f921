"""On-chip DeepCache measurement: guided-chain throughput AND fidelity.

Runs the headline bench config (ADM-G 256px, classifier-guided, respaced 250,
batch 16) as ONE scanned p_sample_loop, uncached vs --deep_cache N for each N
in DCB_INTERVALS, same init key, and reports per-N:
  - chain seconds + samples/min/chip (throughput)
  - corr / rel-RMSE of the final samples vs the uncached chain (fidelity;
    same-seed chain-level deviation, the same metric used for int8 in
    tools/int8_chain_quality.py)

Note the guidance gradient is computed fresh every step in all modes — the
cache only spans the generator's deep sub-UNet.

Usage: python tools/deep_cache_bench.py
Env: DCB_BATCH (16), DCB_IMAGE_SIZE (256), DCB_STEPS (respacing, 250),
DCB_INTERVALS ("2,3,5"), DCB_CONV_IMPL (int8 | xla -> bf16 path), DCB_CUT (0).
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

from guided_diffusion_clip_tpu.diffusion.deep_cache import (
    deep_cache_model_fn,
    zero_state,
)
from guided_diffusion_clip_tpu.diffusion.guidance import (
    classifier_cond_fn,
    model_fn_dropping_y,
)
from guided_diffusion_clip_tpu.ops.config import int8_emit, set_conv_impl
from guided_diffusion_clip_tpu.utils.script_util import (
    create_classifier,
    create_gaussian_diffusion,
    create_upstream_model,
)


def main():
    B = int(os.environ.get("DCB_BATCH", 16))
    size = int(os.environ.get("DCB_IMAGE_SIZE", 256))
    steps = os.environ.get("DCB_STEPS", "250")
    # "" = uncached only (the long-exec bisect / crash-repro configuration)
    intervals = [int(x) for x in os.environ.get("DCB_INTERVALS", "2,3,5").split(",") if x]
    cut = int(os.environ.get("DCB_CUT", 0))
    set_conv_impl(os.environ.get("DCB_CONV_IMPL", "int8"))

    ch = int(os.environ.get("DCB_CH", 256 if size == 256 else 192))
    fp16 = os.environ.get("DCB_FP16", "1") == "1"  # 0 for CPU smoke (bf16 emulated)
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

    def make_chain(interval):
        def chain(params, cparams, key):
            def classifier_fn(xx, t):
                return classifier.apply({"params": cparams}, xx, t)

            cond_fn = classifier_cond_fn(classifier_fn, classifier_scale=1.0)
            if interval is None:
                def unet_fn(xx, t, **kw):
                    with int8_emit("s8"):
                        return model.apply({"params": params}, xx, t, **kw)

                return diffusion.p_sample_loop(
                    model_fn_dropping_y(unet_fn, class_cond=True), shape, key,
                    clip_denoised=True, model_kwargs={"y": classes}, cond_fn=cond_fn,
                )

            def apply_full(xx, t, **kw):
                with int8_emit("s8"):
                    return model.apply(
                        {"params": params}, xx, t, cache_mode="full", cache_cut=cut, **kw
                    )

            def apply_shallow(xx, t, deep, **kw):
                with int8_emit("s8"):
                    return model.apply(
                        {"params": params}, xx, t, deep_cache=deep,
                        cache_mode="shallow", cache_cut=cut, **kw,
                    )

            sfn = deep_cache_model_fn(apply_full, apply_shallow, interval)
            state0 = zero_state(
                apply_full, jnp.zeros(shape), jnp.zeros((B,), jnp.int32), y=classes
            )
            return diffusion.p_sample_loop(
                sfn, shape, key, clip_denoised=True,
                model_kwargs={"y": classes}, cond_fn=cond_fn, model_state0=state0,
            )

        return jax.jit(chain)

    # DCB_SEGMENT=N (e.g. 50): run the chain as N-step segments sharing one
    # compiled executable, DeepCache state threaded across boundaries
    # (sample_chain_segment_dyn_stateful). This is how bf16 chains run at
    # the FULL 250-step protocol on the remote relay — a single-scan bf16
    # 250-step program exceeds the relay worker's per-program execution
    # budget (see the r5 long-exec bisect in ROUND_NOTES) while segments
    # are numerically identical and each stay well under it.
    seg = int(os.environ.get("DCB_SEGMENT", 0))

    def make_chain_segmented(interval, seg_len):
        import functools

        from guided_diffusion_clip_tpu.diffusion.sampling import (
            SamplerConfig,
            p_sample_step,
            sample_chain_segment_dyn_stateful,
        )

        cfg = SamplerConfig(
            mean_type=diffusion.mean_type, var_type=diffusion.var_type,
            clip_denoised=True,
        )

        @functools.partial(jax.jit, static_argnums=(6,), donate_argnums=(2,))
        def run_seg(params, cparams, x, mstate, key, t_hi, seg_len):
            def classifier_fn(xx, t):
                return classifier.apply({"params": cparams}, xx, t)

            cond_fn = classifier_cond_fn(classifier_fn, classifier_scale=1.0)
            if interval is None:
                def unet_fn(xx, t, **kw):
                    with int8_emit("s8"):
                        return model.apply({"params": params}, xx, t, **kw)

                x, _, _ = sample_chain_segment_dyn_stateful(
                    p_sample_step, diffusion.sched,
                    model_fn_dropping_y(unet_fn, class_cond=True),
                    x, key, t_hi, seg_len, cfg=cfg, cond_fn=cond_fn,
                    model_kwargs={"y": classes},
                )
                return x, mstate

            def apply_full(xx, t, **kw):
                with int8_emit("s8"):
                    return model.apply(
                        {"params": params}, xx, t, cache_mode="full",
                        cache_cut=cut, **kw,
                    )

            def apply_shallow(xx, t, deep, **kw):
                with int8_emit("s8"):
                    return model.apply(
                        {"params": params}, xx, t, deep_cache=deep,
                        cache_mode="shallow", cache_cut=cut, **kw,
                    )

            sfn = deep_cache_model_fn(apply_full, apply_shallow, interval)
            x, mstate, _ = sample_chain_segment_dyn_stateful(
                p_sample_step, diffusion.sched, sfn, x, key, t_hi, seg_len,
                cfg=cfg, cond_fn=cond_fn, model_kwargs={"y": classes},
                model_state=mstate,
            )
            return x, mstate

        bounds = list(range(T, 0, -seg_len)) + [0]

        def chain(params, cparams, key):
            x = jax.random.normal(key, shape, dtype=jnp.float32)
            if interval is None:
                mstate = jnp.zeros(())  # unused placeholder carry
            else:
                def apply_full(xx, t, **kw):
                    return model.apply(
                        {"params": params}, xx, t, cache_mode="full",
                        cache_cut=cut, **kw,
                    )

                mstate = zero_state(
                    apply_full, jnp.zeros(shape), jnp.zeros((B,), jnp.int32),
                    y=classes,
                )
            for t_hi, t_lo in zip(bounds[:-1], bounds[1:]):
                key = jax.random.fold_in(key, t_hi)
                x, mstate = run_seg(params, cparams, x, mstate, key, t_hi,
                                    t_hi - t_lo)
            return x

        return chain

    t0 = time.time()

    def run(interval, label):
        fn = make_chain_segmented(interval, seg) if seg else make_chain(interval)
        tc = time.time()
        out = np.asarray(fn(params, cparams, key))  # compile + run + fetch
        print(f"[dcb +{time.time()-t0:.0f}s] {label}: compile+first in {time.time()-tc:.0f}s", flush=True)
        tr = time.time()
        out = np.asarray(fn(params, cparams, key))
        secs = time.time() - tr
        print(
            f"[dcb +{time.time()-t0:.0f}s] {label}: {secs:.1f}s/chain "
            f"= {B / secs * 60:.2f} samples/min/chip ({T} steps"
            f"{f', {seg}-step segments' if seg else ''})", flush=True
        )
        return out, secs

    ref, ref_s = run(None, "uncached")
    results = {"uncached_samples_per_min": round(B / ref_s * 60, 2)}
    for n in intervals:
        out, secs = run(n, f"dc{n}")
        a, b = ref.ravel().astype(np.float64), out.ravel().astype(np.float64)
        corr = float(np.corrcoef(a, b)[0, 1])
        rrmse = float(np.sqrt(np.mean((a - b) ** 2)) / (a.std() + 1e-12))
        print(f"[dcb] dc{n} vs uncached: corr {corr:.6f}, rel-RMSE {rrmse:.4f}", flush=True)
        results[f"dc{n}"] = {
            "samples_per_min": round(B / secs * 60, 2),
            "speedup": round(ref_s / secs, 3),
            "corr": round(corr, 6),
            "rel_rmse": round(rrmse, 5),
        }
    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
