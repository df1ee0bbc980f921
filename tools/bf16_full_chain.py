"""Direct full-length bf16 chain measurements + worker-crash bisect probe.

VERDICT r4 weak #3: "bf16 250-step single-scan chain crashes the remote
worker" was worked around at 100 steps, so the bf16+dc2/dc3 numbers behind
"bf16 clears >=5x with DeepCache" were 100-step-measured, 250-step-
PROJECTED. This tool replaces the projections with DIRECT measurements:

  1. bf16 uncached, full 250 steps, run as <=50-step segments
     (sample_chain_segment_dyn — identical math to one scan, pinned by
     tests/test_segment_stateful.py) — every step executes on-chip, each
     dispatch stays under the remote worker's execution limit;
  2. bf16 + DeepCache-2 and DeepCache-3, full 250 steps, via
     sample_chain_segment_dyn_stateful with the cache carry threaded
     across segment boundaries (bit-identical to the CLI single-scan);
  3. (opt-in, BFC_BISECT=1) a DURATION-CONTROLLED probe for the crash
     mechanism: one tiny compiled program (lax.while_loop of matmuls with
     a traced trip count) dispatched at increasing wall durations.
     History: int8's ~60s single dispatch always survives; bf16's ~130s
     250-step dispatch crashed the worker twice in r1 and once in r4
     (ROUND_NOTES). If the dummy program — totally different content,
     same duration — dies at the same threshold, the cause is a relay
     execution watchdog on single-dispatch duration, not the chain.
     Run the bisect LAST: a confirmed crash takes the chip down until the
     relay recovers (tools/relay_watch.sh).

Config matches bench.py's headline: ADM-G 256px published config
(reference README.md:123-130), classifier-guided, batch 16, 250-step
ancestral. Env: BFC_BATCH, BFC_STEPS, BFC_SEG, BFC_MODES
(default "bf16,dc2,dc3"), BFC_REPEATS (2), BFC_BISECT (0),
BFC_BISECT_SECS (comma list, default "60,90,105,115,125,135").
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()

import functools

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
from guided_diffusion_clip_tpu.diffusion.sampling import (
    SamplerConfig,
    p_sample_step,
    sample_chain_segment_dyn,
    sample_chain_segment_dyn_stateful,
)
from guided_diffusion_clip_tpu.ops.config import set_conv_impl
from guided_diffusion_clip_tpu.utils.checkpoint import setup_compilation_cache
from guided_diffusion_clip_tpu.utils.script_util import (
    create_classifier,
    create_gaussian_diffusion,
    create_upstream_model,
)

_T0 = time.time()


def note(msg):
    print(f"[bfc +{time.time()-_T0:.0f}s] {msg}", file=sys.stderr, flush=True)


def main():
    setup_compilation_cache()
    B = int(os.environ.get("BFC_BATCH", 16))
    steps_env = int(os.environ.get("BFC_STEPS", 250))
    image_size = int(os.environ.get("BFC_IMAGE_SIZE", 256))
    seg = int(os.environ.get("BFC_SEG", 50))
    repeats = int(os.environ.get("BFC_REPEATS", 2))
    modes = [m for m in os.environ.get("BFC_MODES", "bf16,dc2,dc3").split(",") if m]

    model = create_upstream_model(
        image_size=image_size,
        num_channels=256 if image_size == 256 else 192,
        num_res_blocks=2 if image_size == 256 else 3,
        channel_mult="", learn_sigma=True, class_cond=True,
        use_checkpoint=False, attention_resolutions="32,16,8",
        num_heads=4, num_head_channels=64, num_heads_upsample=-1,
        use_scale_shift_norm=True, dropout=0.0, resblock_updown=True,
        use_fp16=True, use_new_attention_order=False,
    )
    classifier = create_classifier(
        image_size=image_size, classifier_use_fp16=True, classifier_width=128,
        classifier_depth=2, classifier_attention_resolutions="32,16,8",
        classifier_use_scale_shift_norm=True, classifier_resblock_updown=True,
        classifier_pool="attention",
    )
    diffusion = create_gaussian_diffusion(
        steps=1000, learn_sigma=True, noise_schedule="linear",
        timestep_respacing=str(steps_env),
    )
    steps = diffusion.sched.num_timesteps
    shape = (B, image_size, image_size, 3)
    set_conv_impl("xla")  # bf16 everywhere in this tool

    def random_fill(shapes, seed):
        rs = np.random.RandomState(seed)
        host = jax.tree_util.tree_map(
            lambda s: (rs.standard_normal(s.shape) * 0.02).astype(s.dtype), shapes
        )
        return jax.device_put(host)

    params = random_fill(
        jax.eval_shape(
            lambda: model.init(
                jax.random.key(0), jnp.zeros(shape), jnp.zeros((B,)),
                y=jnp.zeros((B,), jnp.int32),
            )
        ), seed=0,
    )["params"]
    cparams = random_fill(
        jax.eval_shape(
            lambda: classifier.init(jax.random.key(1), jnp.zeros(shape), jnp.zeros((B,)))
        ), seed=1,
    )["params"]
    classes = jnp.zeros((B,), jnp.int32)
    bounds = list(range(steps, 0, -seg)) + [0]
    cfg = SamplerConfig(mean_type=diffusion.mean_type, var_type=diffusion.var_type)

    @jax.jit
    def init_noise(key):
        return jax.random.normal(key, shape, dtype=jnp.float32)

    def classifier_fn(xx, t):
        return classifier.apply({"params": cparams}, xx, t)

    result = {
        "config": f"{image_size}px ADM-G published config, classifier-guided, "
                  f"batch {B}, {steps}-step ancestral, bf16, segments of {seg}",
        "modes": {},
    }

    # ---- mode: bf16 uncached (plain dyn segments) ----------------------
    @functools.partial(jax.jit, static_argnums=(5,), donate_argnums=(2,))
    def run_segment(params, cparams, x, key, t_hi, seg_len, classes):
        def unet_fn(xx, t, **kw):
            return model.apply({"params": params}, xx, t, **kw)

        cond_fn = classifier_cond_fn(classifier_fn, classifier_scale=1.0)
        model_fn = model_fn_dropping_y(unet_fn, class_cond=True)
        return sample_chain_segment_dyn(
            p_sample_step, diffusion.sched, model_fn, x, key, t_hi, seg_len,
            cfg=cfg, cond_fn=cond_fn, model_kwargs={"y": classes},
        )

    def full_chain_bf16(key):
        x = init_noise(key)
        for t_hi, t_lo in zip(bounds[:-1], bounds[1:]):
            key = jax.random.fold_in(key, t_hi)
            x = run_segment(params, cparams, x, key, t_hi, t_hi - t_lo, classes)
        return float(jnp.sum(x))  # fetch = completion through the relay

    # ---- modes: bf16 + DeepCache-N (stateful segments, carry threaded) --
    def make_dc_chain(dc):
        @functools.partial(jax.jit, static_argnums=(6,), donate_argnums=(2,))
        def run_dc_segment(params, cparams, x, mstate, key, t_hi, seg_len, classes):
            def apply_full(xx, t, y=None, **kw):
                return model.apply(
                    {"params": params}, xx, t, y=y, cache_mode="full", **kw
                )

            def apply_shallow(xx, t, deep, y=None, **kw):
                return model.apply(
                    {"params": params}, xx, t, y=y, deep_cache=deep,
                    cache_mode="shallow", **kw,
                )

            cond_fn = classifier_cond_fn(classifier_fn, classifier_scale=1.0)
            sfn = deep_cache_model_fn(apply_full, apply_shallow, dc)
            x, mstate, _ = sample_chain_segment_dyn_stateful(
                p_sample_step, diffusion.sched, sfn, x, key, t_hi, seg_len,
                cfg=cfg, cond_fn=cond_fn, model_kwargs={"y": classes},
                model_state=mstate,
            )
            return x, mstate

        def state0():
            def apply_full(xx, t, y=None, **kw):
                return model.apply(
                    {"params": params}, xx, t, y=y, cache_mode="full", **kw
                )

            return zero_state(
                apply_full, jnp.zeros(shape), jnp.zeros((B,), jnp.int32), y=classes
            )

        ms0 = state0()

        def full_chain(key):
            x = init_noise(key)
            mstate = ms0
            for t_hi, t_lo in zip(bounds[:-1], bounds[1:]):
                key = jax.random.fold_in(key, t_hi)
                x, mstate = run_dc_segment(
                    params, cparams, x, mstate, key, t_hi, t_hi - t_lo, classes
                )
            return float(jnp.sum(x))

        return full_chain

    chains = {}
    for m in modes:
        if m == "bf16":
            chains[m] = full_chain_bf16
        elif m.startswith("dc"):
            chains[m] = make_dc_chain(int(m[2:]))
        else:
            raise SystemExit(f"unknown mode {m!r}")

    for m, chain in chains.items():
        note(f"{m}: compile+warm (full {steps}-step chain as segments)")
        t0 = time.time()
        chain(jax.random.key(1))
        compile_s = time.time() - t0
        times = []
        for r in range(repeats):
            t0 = time.time()
            chain(jax.random.key(2 + r))
            times.append(time.time() - t0)
            note(f"{m}: repeat {r} {times[-1]:.1f}s")
        best = min(times)
        result["modes"][m] = {
            "sec_per_batch": round(best, 2),
            "samples_per_min": round(B * 60.0 / best, 3),
            "compile_plus_first_chain_sec": round(compile_s, 1),
            "repeats": times,
            "direct_full_chain": True,
        }
        note(f"{m}: {B*60.0/best:.2f} samples/min ({best:.1f}s/chain, direct)")

    # ---- opt-in crash bisect: duration-controlled dummy dispatches ------
    if os.environ.get("BFC_BISECT", "0") == "1":
        note("bisect: calibrating dummy matmul loop")
        N = 4096

        @jax.jit
        def spin(a, iters):
            def cond(c):
                return c[1] < iters

            def body(c):
                a, i = c
                return (jnp.tanh(a @ a) * 0.999, i + 1)

            out, _ = jax.lax.while_loop(cond, body, (a, jnp.int32(0)))
            return jnp.sum(out)

        a = jnp.asarray(
            np.random.RandomState(0).standard_normal((N, N)), jnp.bfloat16
        )
        t0 = time.time()
        float(spin(a, jnp.int32(50)))
        warm = time.time() - t0
        t0 = time.time()
        float(spin(a, jnp.int32(200)))
        per_iter = (time.time() - t0) / 200
        note(f"bisect: warm {warm:.1f}s, {per_iter*1000:.2f} ms/iter")
        result["bisect"] = {"ms_per_iter": per_iter * 1e3, "probes": []}
        secs = [float(s) for s in os.environ.get(
            "BFC_BISECT_SECS", "60,90,105,115,125,135"
        ).split(",")]
        for target in secs:
            iters = max(1, int(target / per_iter))
            note(f"bisect: dispatching ~{target:.0f}s ({iters} iters) — if the "
                 f"worker dies here, this line is the threshold")
            t0 = time.time()
            try:
                float(spin(a, jnp.int32(iters)))
                took = time.time() - t0
                result["bisect"]["probes"].append(
                    {"target_s": target, "took_s": round(took, 1), "ok": True}
                )
                note(f"bisect: {target:.0f}s probe survived ({took:.1f}s)")
            except Exception as e:  # noqa: BLE001
                result["bisect"]["probes"].append(
                    {"target_s": target, "ok": False, "error": repr(e)}
                )
                note(f"bisect: {target:.0f}s probe DIED: {e!r}")
                break

    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
