"""Classifier-guided sampling (reference scripts/classifier_sample.py).

The guidance gradient (jax.grad of the selected log-softmax through the noised
classifier) is composed inside the same scanned denoise step as the UNet
forward — one XLA program per batch, no per-step autograd dispatch.
"""

import argparse
import os
import sys

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
    parse_guidance_interval,
)
from guided_diffusion_clip_tpu.parallel import dist as pdist
from guided_diffusion_clip_tpu.utils import logger
from guided_diffusion_clip_tpu.utils.sample_util import overlap_device_host
from guided_diffusion_clip_tpu.utils.checkpoint import init_template, load_params, setup_compilation_cache
from guided_diffusion_clip_tpu.utils.script_util import (
    NUM_CLASSES,
    add_dict_to_argparser,
    args_to_dict,
    classifier_defaults,
    create_classifier,
    create_model_and_diffusion,
    create_upstream_model,
    model_and_diffusion_defaults,
    parse_yaml,
    resolve_sampler,
)


def main():
    args = create_argparser().parse_args()
    from guided_diffusion_clip_tpu.ops.config import int8_emit, set_conv_impl

    args = parse_yaml(args)
    # after parse_yaml so a conv_impl key in the YAML config takes effect
    set_conv_impl(getattr(args, "conv_impl", "auto"))

    pdist.setup_dist()
    from guided_diffusion_clip_tpu.parallel import sp as _sp, tp as _tp
    # after setup_dist: setup_from_flag touches jax.devices(), which must
    # not initialize the backend before jax.distributed.initialize
    _sp.setup_from_flag(getattr(args, 'spatial_shard', 0), args.batch_size)
    _tp.setup_from_flag(getattr(args, 'tensor_shard', 0), args.batch_size)
    logger.configure(args=args)

    logger.log("creating model and diffusion...")
    # Guided sampling drives the upstream class-conditional UNet (the released
    # ADM checkpoints use an nn.Embedding label table, not the CLIP MLP).
    _, diffusion = create_model_and_diffusion(
        **args_to_dict(args, model_and_diffusion_defaults().keys())
    )
    mkeys = [k for k in model_and_diffusion_defaults() if k in (
        "image_size", "num_channels", "num_res_blocks", "channel_mult", "learn_sigma",
        "class_cond", "use_checkpoint", "attention_resolutions", "num_heads",
        "num_head_channels", "num_heads_upsample", "use_scale_shift_norm", "dropout",
        "resblock_updown", "use_fp16", "use_new_attention_order",
    )]
    model = create_upstream_model(**args_to_dict(args, mkeys))

    setup_compilation_cache()
    B = args.batch_size
    shape = (B, args.image_size, args.image_size, 3)
    y0 = jnp.zeros((B,), jnp.int32)
    template = init_template(
        model, jnp.zeros(shape), jnp.zeros((B,)),
        y=y0 if args.class_cond else None,
    )
    params = load_params(args.model_path, template)

    logger.log("loading classifier...")
    classifier = create_classifier(**args_to_dict(args, classifier_defaults().keys()))
    ctemplate = init_template(classifier, jnp.zeros(shape), jnp.zeros((B,)))
    cparams = load_params(
        args.classifier_path, ctemplate, model="encoder", pool=args.classifier_pool
    )

    # dpm++2m accepts cond_fn, so classifier guidance composes with it
    loop = resolve_sampler(diffusion, args)

    g_interval = parse_guidance_interval(getattr(args, "guidance_interval", ""))
    guidance_cache_n = int(getattr(args, "guidance_cache", 0))
    deep_cache_n = int(getattr(args, "deep_cache", 0))
    deep_cut = int(getattr(args, "deep_cache_cut", 0))

    @jax.jit
    def run_chain(params, cparams, key, classes):
        def unet_fn(x, t, **kw):
            # guidance differentiates the classifier only: the generator may
            # emit real s8 in int8 mode (see ops/config.int8_emit)
            with int8_emit("s8"):
                return model.apply({"params": params}, x, t, **kw)

        def classifier_fn(x, t):
            return classifier.apply({"params": cparams}, x, t)

        cond_fn = classifier_cond_fn(classifier_fn, args.classifier_scale)
        if g_interval is not None:
            # restrict guidance to t in [lo, hi] (original timestep units):
            # the classifier fwd+VJP are lax.cond-skipped outside the window
            cond_fn = interval_cond_fn(cond_fn, *g_interval)
        cond_state0 = None
        if guidance_cache_n > 1:
            # recompute the classifier gradient 1-in-N steps, reuse between
            # (the guidance analog of --deep_cache; gradient rides the carry)
            cond_fn, cond_state0 = cached_cond_fn(cond_fn, guidance_cache_n, shape)
        if deep_cache_n > 1:
            # DeepCache deep-feature reuse on the GENERATOR only — the
            # classifier gradient (the guidance itself) stays fresh every
            # step (diffusion/deep_cache.py)
            from guided_diffusion_clip_tpu.diffusion.deep_cache import (
                deep_cache_model_fn,
                zero_state,
            )

            def apply_full(x, t, y=None, **kw):
                with int8_emit("s8"):
                    return model.apply(
                        {"params": params}, x, t, y=y if args.class_cond else None,
                        cache_mode="full", cache_cut=deep_cut, **kw,
                    )

            def apply_shallow(x, t, deep, y=None, **kw):
                with int8_emit("s8"):
                    return model.apply(
                        {"params": params}, x, t, y=y if args.class_cond else None,
                        deep_cache=deep, cache_mode="shallow", cache_cut=deep_cut, **kw,
                    )

            sfn = deep_cache_model_fn(apply_full, apply_shallow, deep_cache_n)
            state0 = zero_state(
                apply_full, jnp.zeros(shape), jnp.zeros((B,), jnp.int32), y=classes
            )
            return loop(
                sfn, shape, key,
                clip_denoised=args.clip_denoised,
                model_kwargs={"y": classes},
                cond_fn=cond_fn,
                model_state0=state0,
                cond_state0=cond_state0,
            )
        model_fn = model_fn_dropping_y(unet_fn, args.class_cond)
        return loop(
            model_fn, shape, key,
            clip_denoised=args.clip_denoised,
            model_kwargs={"y": classes},
            cond_fn=cond_fn,
            cond_state0=cond_state0,
        )

    logger.log("sampling...")
    # fold the process index in: with identical seeds every rank would
    # generate the SAME noise/classes and the all-gathered set would be
    # world_size copies of one batch
    rng = jax.random.fold_in(jax.random.key(args.seed), pdist.rank())
    all_images, all_labels = [], []
    # each iteration gathers world_size*B samples (all_gather below)
    n_batches = -(-args.num_samples // (B * pdist.world_size()))

    def dispatched():
        nonlocal rng
        for _ in range(n_batches):
            rng, class_rng, sample_rng = jax.random.split(rng, 3)
            # Fix-forward: the fork sets NUM_CLASSES=512 (CLIP dim), which
            # would wrongly restrict upstream ImageNet guidance to 512
            # classes; the classifier/label table have 1000 (script_util.py:261).
            classes = jax.random.randint(class_rng, (B,), 0, 1000, dtype=jnp.int32)
            yield classes, run_chain(params, cparams, sample_rng, classes)

    def gather_batch(item):
        classes, sample = item
        sample_u8 = ((np.asarray(sample) + 1) * 127.5).clip(0, 255).astype(np.uint8)
        all_images.extend(list(pdist.all_gather_host(sample_u8)))
        all_labels.extend(list(pdist.all_gather_host(np.asarray(classes))))
        logger.log(f"created {len(all_images) * B} samples")

    # host uint8/gather work for batch k overlaps batch k+1's device chain
    overlap_device_host(dispatched(), gather_batch)

    arr = np.concatenate(all_images, axis=0)[: args.num_samples]
    label_arr = np.concatenate(all_labels, axis=0)[: args.num_samples]
    if pdist.is_primary():
        shape_str = "x".join(str(x) for x in arr.shape)
        out_path = os.path.join(logger.get_dir(), f"samples_{shape_str}.npz")
        logger.log(f"saving to {out_path}")
        np.savez(out_path, arr, label_arr)
    pdist.barrier("sampling")
    logger.log("sampling complete")


def create_argparser():
    defaults = dict(
        clip_denoised=True,
        num_samples=10000,
        batch_size=16,
        use_ddim=False,
        sampler="",  # ""(use_ddim decides)|ancestral|ddim|dpm++2m — cond_fn composes
        model_path="",
        classifier_path="",
        classifier_scale=1.0,
        main_path="",
        seed=0,
        conv_impl="auto",  # auto|xla|int8: int8 = quantized MXU fast path
        spatial_shard=0,  # >1: shard each image's H over a 'space' mesh axis (SP)
        tensor_shard=0,  # >1: shard activation channels over a 'model' mesh axis (TP)
        deep_cache=0,  # N>1: refresh the deep sub-UNet every N steps (DeepCache)
        deep_cache_cut=0,  # shallow input blocks; 0 = below the full-res level
        guidance_interval="",  # "lo,hi": guide only for t in [lo,hi] (orig units)
        guidance_cache=0,  # N>1: recompute the guidance gradient 1-in-N steps
    )
    defaults.update(model_and_diffusion_defaults())
    defaults.update(classifier_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
