"""On-chip sampler-family throughput at the headline config.

The headline bench (bench.py) pins 250-step ancestral classifier-guided
sampling; the few-step samplers (DDIM-25 per the reference's table configs,
README.md:148-176, and the beyond-reference DPM-Solver++(2M)) had CPU
correctness tests but no on-chip wall-clock number. This tool measures each
sampler's guided-chain throughput under identical model/classifier/params
(ADM-G 256px class-conditional + classifier cond_fn, random init — throughput
is weight-independent), reporting samples/min/chip per sampler.

Usage: python tools/sampler_family_bench.py        (ambient axon env)
Env: SFB_BATCH (16), SFB_IMAGE_SIZE (256), SFB_CONV_IMPL (int8 | xla),
SFB_SAMPLERS ("ddim25;dpm25;ancestral250" — prefix selects the loop, suffix
the respacing; "ancestral250" is the known headline, included for an
in-run baseline), SFB_FP16 (1), SFB_GUIDANCE ("classifier" | "clip" =
CLIP ViT-B/32 cosine-similarity gradient on the noisy x (the repo's
namesake surface, scripts/clip_guided_sample.py) | "clip_x0" = the same
gradient through the model's pred_xstart — differentiates through a full
UNet forward per step, the expensive public-technique mode; forces bf16
emission since the s8 fast path has no tangent), SFB_GUIDANCE_CACHE (0;
N>1 recomputes the guidance gradient 1-in-N steps via cached_cond_fn —
the lever that matters most for clip_x0, where each fresh gradient costs
a full extra UNet forward+VJP), SFB_GUIDANCE="cfg" (classifier-free
guidance over the class embedding: doubled batch via cfg_model_fn, or the
cached uncond branch when SFB_CFG_CACHE=N>1 — measures the --cfg_cache
win), SFB_CFG_SCALE (2.0).
"""

import json
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
    cfg_cached_model_fn,
    cfg_cached_state0,
    cfg_model_fn,
    classifier_cond_fn,
    model_fn_dropping_y,
)
from guided_diffusion_clip_tpu.ops.config import int8_emit, set_conv_impl
from guided_diffusion_clip_tpu.utils.script_util import (
    create_classifier,
    create_gaussian_diffusion,
    create_upstream_model,
)


def parse_sampler(spec: str):
    """'ddim25' -> ('ddim', 'ddim25'); 'dpm25' -> ('dpm', '25');
    'ancestral250' -> ('ancestral', '250')."""
    for prefix in ("ancestral", "ddim", "dpm"):
        if spec.startswith(prefix):
            n = spec[len(prefix):]
            respacing = f"ddim{n}" if prefix == "ddim" else n
            return prefix, respacing
    raise ValueError(f"unknown sampler spec: {spec}")


def main():
    B = int(os.environ.get("SFB_BATCH", 16))
    size = int(os.environ.get("SFB_IMAGE_SIZE", 256))
    specs = [s for s in os.environ.get(
        "SFB_SAMPLERS", "ddim25;dpm25;ancestral250").split(";") if s.strip()]
    set_conv_impl(os.environ.get("SFB_CONV_IMPL", "int8"))
    fp16 = os.environ.get("SFB_FP16", "1") == "1"  # 0 for CPU smoke

    ch = int(os.environ.get("SFB_CH", 256 if size == 256 else 192))
    model = create_upstream_model(
        image_size=size, num_channels=ch,
        num_res_blocks=2, channel_mult="", learn_sigma=True, class_cond=True,
        # SFB_USE_CHECKPOINT=1: per-block rematerialization (the reference's
        # --use_checkpoint) — required for clip_x0 at batch 16/256px, where
        # differentiating through the UNet otherwise OOMs HBM (measured:
        # 16.97G of 15.75G on v5e-1)
        use_checkpoint=os.environ.get("SFB_USE_CHECKPOINT", "0") == "1",
        attention_resolutions="32,16,8", num_heads=4,
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
    t0 = time.time()
    results = {}

    guidance = os.environ.get("SFB_GUIDANCE", "classifier")
    clip_vision = clip_vparams = clip_target = clip_cfg = None
    if guidance in ("clip", "clip_x0"):
        from guided_diffusion_clip_tpu.models.clip_vit import (
            CLIPConfig,
            CLIPVisionEncoder,
            clip_guidance_cond_fn,
        )

        clip_cfg = CLIPConfig()  # ViT-B/32
        clip_vision = CLIPVisionEncoder(clip_cfg)
        clip_vparams = random_fill(
            jax.eval_shape(lambda: clip_vision.init(
                jax.random.key(2),
                jnp.zeros((B, clip_cfg.image_size, clip_cfg.image_size, 3)))),
            2,
        )["params"]
        clip_target = jnp.asarray(
            np.random.RandomState(3).standard_normal(clip_cfg.embed_dim), jnp.float32
        )

    for spec in specs:
        kind, respacing = parse_sampler(spec)
        diffusion = create_gaussian_diffusion(
            steps=1000, learn_sigma=True, noise_schedule="linear",
            timestep_respacing=respacing,
        )
        loop = {
            "ancestral": diffusion.p_sample_loop,
            "ddim": diffusion.ddim_sample_loop,
            "dpm": diffusion.dpm_solver_pp_2m_loop,
        }[kind]

        @jax.jit
        def chain(params, cparams, vparams, key, _loop=loop, _diff=diffusion):
            # s8 emission has no tangent: pred-x0 CLIP guidance differentiates
            # through the UNet, so it must emit bf16 (clip_guided_sample.py)
            emit = "bf16" if guidance == "clip_x0" else "s8"

            def unet_fn(xx, t, **kw):
                with int8_emit(emit):
                    return model.apply({"params": params}, xx, t, **kw)

            model_fn = model_fn_dropping_y(unet_fn, class_cond=True)
            if guidance == "cfg":
                scale = float(os.environ.get("SFB_CFG_SCALE", 2.0))
                gc = int(os.environ.get("SFB_CFG_CACHE", 0))
                # NOTE: {"y": 0} is a throughput-only stand-in for the null
                # conditioning — class 0 is a real class, not a reserved null
                # token. Real CFG sampling requires a trained null class
                # (image_sample.py's --cfg_null_y). Fine here: random weights,
                # we only time the two-branch dispatch.
                if gc > 1:
                    sfn = cfg_cached_model_fn(model_fn, scale, {"y": 0}, gc)
                    state0 = cfg_cached_state0(
                        model_fn, jnp.zeros(shape),
                        jnp.zeros((B,), jnp.int32), y=classes,
                    )
                    return _loop(
                        sfn, shape, key, clip_denoised=True,
                        model_kwargs={"y": classes}, model_state0=state0,
                    )
                return _loop(
                    cfg_model_fn(model_fn, scale, {"y": 0}), shape, key,
                    clip_denoised=True, model_kwargs={"y": classes},
                )
            if guidance == "classifier":
                def classifier_fn(xx, t):
                    return classifier.apply({"params": cparams}, xx, t)

                cond_fn = classifier_cond_fn(classifier_fn, classifier_scale=1.0)
            else:
                def embed(pixels):
                    return clip_vision.apply({"params": vparams}, pixels)

                cond_fn = clip_guidance_cond_fn(
                    embed, clip_target, scale=100.0,
                    clip_image_size=clip_cfg.image_size,
                    sched=_diff.sched, mean_type=_diff.mean_type,
                    var_type=_diff.var_type, model_fn=model_fn,
                    use_pred_xstart=(guidance == "clip_x0"),
                )

            cond_state0 = None
            gc_n = int(os.environ.get("SFB_GUIDANCE_CACHE", 0))
            if gc_n > 1:
                cond_fn, cond_state0 = cached_cond_fn(cond_fn, gc_n, shape)
            return _loop(
                model_fn, shape, key,
                clip_denoised=True, model_kwargs={"y": classes},
                cond_fn=cond_fn, cond_state0=cond_state0,
            )

        tc = time.time()
        out = np.asarray(chain(params, cparams, clip_vparams, key))
        print(
            f"[sfb +{time.time()-t0:.0f}s] {spec}: compile+first in "
            f"{time.time()-tc:.0f}s, finite={bool(np.isfinite(out).all())}",
            flush=True,
        )
        tr = time.time()
        np.asarray(chain(params, cparams, clip_vparams, key))
        secs = time.time() - tr
        spm = B / secs * 60
        print(
            f"[sfb +{time.time()-t0:.0f}s] {spec}: {secs:.2f}s/chain "
            f"= {spm:.1f} samples/min/chip ({diffusion.num_timesteps} steps)",
            flush=True,
        )
        results[spec] = {
            "secs_per_chain": round(secs, 3),
            "samples_per_min_per_chip": round(spm, 2),
            "steps": int(diffusion.num_timesteps),
        }

    print(json.dumps(results))


if __name__ == "__main__":
    main()
