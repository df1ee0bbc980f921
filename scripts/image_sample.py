"""Generate CLIP-conditioned samples from a trained model
(reference scripts/image_sample.py).

The whole denoise chain is one jitted lax.scan per batch; samples are saved as
PNG grids per batch and a final npz for FID evaluation (the reference's npz
path is restored — it was commented out upstream, image_sample.py:119-133).
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

from guided_diffusion_clip_tpu.data.image_datasets import load_data
from guided_diffusion_clip_tpu.diffusion.deep_cache import (
    cfg_deep_cache_pair,
    deep_cache_model_fn,
    zero_state,
)
from guided_diffusion_clip_tpu.diffusion.guidance import (
    cfg_cached_model_fn,
    cfg_cached_state0,
    cfg_model_fn,
    parse_guidance_interval,
)
from guided_diffusion_clip_tpu.parallel import dist as pdist
from guided_diffusion_clip_tpu.utils import logger
from guided_diffusion_clip_tpu.utils.checkpoint import init_template, load_params, setup_compilation_cache
from guided_diffusion_clip_tpu.utils.sample_util import (
    add_delta_imgimg,
    overlap_device_host,
)
from guided_diffusion_clip_tpu.utils.saving_imgs import save_img, tensor2img
from guided_diffusion_clip_tpu.utils.script_util import (
    add_dict_to_argparser,
    args_to_dict,
    create_model_and_diffusion,
    load_folder_path_parse,
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
    load_folder_path_parse(args)
    if getattr(args, "main_path", None) and getattr(args, "sub_dir_tstsave", None):
        args.main_path = os.path.join(args.main_path, args.sub_dir_tstsave)

    pdist.setup_dist()
    from guided_diffusion_clip_tpu.parallel import sp as _sp, tp as _tp
    # after setup_dist: setup_from_flag touches jax.devices(), which must
    # not initialize the backend before jax.distributed.initialize
    _sp.setup_from_flag(getattr(args, 'spatial_shard', 0), args.batch_size)
    _tp.setup_from_flag(getattr(args, 'tensor_shard', 0), args.batch_size)
    logger.configure(args=args)
    logger.log("\n\t".join(f"{k} = {v}" for k, v in vars(args).items()))

    logger.log("creating model and diffusion...")
    model, diffusion = create_model_and_diffusion(
        **args_to_dict(args, model_and_diffusion_defaults().keys())
    )

    setup_compilation_cache()
    # fold the process index in: with identical seeds every rank would
    # generate the SAME noise/classes and the all-gathered set would be
    # world_size copies of one batch
    rng = jax.random.fold_in(jax.random.key(args.seed), pdist.rank())
    shape = (args.batch_size, args.image_size, args.image_size, 3)
    template = init_template(
        model, jnp.zeros(shape), jnp.zeros((args.batch_size,)),
        clip_feat=jnp.zeros((args.batch_size, 512)) if args.class_cond else None,
    )
    params = load_params(args.model_path, template)

    logger.log("loading data...")
    data = load_data(
        data_dir=args.data_dir_test,
        batch_size=args.batch_size,
        image_size=args.image_size,
        class_cond=args.class_cond,
        deterministic=True,
        random_crop=False,
        random_flip=False,
        clip_file_path=args.clip_file_path_test or None,
    )

    dsp = args.denoise_start_point
    dsp = -1 if dsp in (None, "None", "") else int(dsp)
    if dsp != -1:
        # The flag is given in original-T units (sample_config.yaml pairs
        # denoise_start_point: 800 with timestep_respacing: 100; the upstream
        # loop would index 100-length tables with t=800 and crash,
        # gaussian_diffusion.py:517-523) — map it into the respaced chain,
        # matching super_res_depth_sweep_sample.py's depth mapping.
        T = diffusion.num_timesteps
        dsp = min(int(round(dsp * T / diffusion.sched.original_num_steps)), T)
        logger.log(f"denoise_start_point {args.denoise_start_point} -> respaced step {dsp}")

    loop = resolve_sampler(diffusion, args)

    # One jitted program for the entire denoise chain (eager dispatch is
    # pathologically slow on remote-attached TPUs); params travel as jit
    # ARGUMENTS so weights aren't baked into the executable as constants.
    cfg_scale = float(getattr(args, "cfg_scale", 0.0))
    cfg_cache_n = int(getattr(args, "cfg_cache", 0))
    deep_cache_n = int(getattr(args, "deep_cache", 0))
    deep_cut = int(getattr(args, "deep_cache_cut", 0))
    g_interval = parse_guidance_interval(getattr(args, "guidance_interval", ""))
    if g_interval is not None and not cfg_scale:
        raise SystemExit("--guidance_interval here gates CFG; it needs --cfg_scale")
    if g_interval is not None and deep_cache_n > 1:
        # the CFG branch's cache holds 2B rows, the plain branch's B — the
        # lax.cond carries can't switch shapes mid-chain
        raise SystemExit("--guidance_interval does not compose with --deep_cache + CFG")
    if cfg_cache_n > 1 and not cfg_scale:
        raise SystemExit("--cfg_cache caches the CFG uncond branch; it needs --cfg_scale")
    if cfg_cache_n > 1 and deep_cache_n > 1:
        # both wrappers own the scan's model_state0 carry
        raise SystemExit("--cfg_cache does not compose with --deep_cache (yet)")

    def build_null(model_kwargs):
        # classifier-free guidance (beyond reference): needs a model trained
        # with --cond_dropout; null = zero clip_feat / reserved null class
        null = {}
        if model_kwargs.get("clip_feat") is not None:
            null["clip_feat"] = 0.0
        if model_kwargs.get("y") is not None:
            if args.cfg_null_y < 0:
                raise SystemExit("--cfg_scale on a y-labelled model needs --cfg_null_y")
            null["y"] = args.cfg_null_y
        if not null:
            # silently running CFG with identical branches would double
            # every UNet call for a mathematically unguided result
            raise SystemExit(
                "--cfg_scale needs conditioning to guide on (clip_feat or y "
                "in the batch — is --clip_file_path_test/--class_cond set?)"
            )
        return null

    @jax.jit
    def run_chain(params, key, model_kwargs, init_image=None):
        def model_fn(x, t, **kw):
            with int8_emit("s8"):  # unguided sampling never differentiates
                return model.apply({"params": params}, x, t, **kw)

        if deep_cache_n > 1:
            # DeepCache-style deep-feature reuse (diffusion/deep_cache.py):
            # refresh the deep sub-UNet every N steps, recompute only the
            # high-res shallow blocks in between — one lax.cond per step
            # inside the same scanned chain. Composes with CFG: both
            # branches ride the doubled batch, the cache holds 2B rows.
            def cached_apply(x, t, **kw):
                with int8_emit("s8"):
                    return model.apply(
                        {"params": params}, x, t, cache_cut=deep_cut, **kw
                    )

            if cfg_scale:
                apply_full, apply_shallow = cfg_deep_cache_pair(
                    cached_apply, cfg_scale, build_null(model_kwargs)
                )
            else:
                def apply_full(x, t, **kw):
                    return cached_apply(x, t, cache_mode="full", **kw)

                def apply_shallow(x, t, deep, **kw):
                    return cached_apply(x, t, deep_cache=deep, cache_mode="shallow", **kw)

            sfn = deep_cache_model_fn(apply_full, apply_shallow, deep_cache_n)
            state0 = zero_state(
                apply_full, jnp.zeros(shape), jnp.zeros((shape[0],), jnp.int32),
                **model_kwargs,
            )
            return loop(
                sfn, shape, key,
                clip_denoised=args.clip_denoised,
                model_kwargs=model_kwargs,
                denoise_start_point=dsp,
                init_image=init_image,
                model_state0=state0,
            )

        if cfg_scale:
            if cfg_cache_n > 1:
                # CFG with a cached uncond branch: recompute 1-in-N steps,
                # carry the uncond output in the scan (cost (1 + 1/N)x model)
                sfn = cfg_cached_model_fn(
                    model_fn, cfg_scale, build_null(model_kwargs),
                    cfg_cache_n, interval=g_interval,
                )
                state0 = cfg_cached_state0(
                    model_fn, jnp.zeros(shape),
                    jnp.zeros((shape[0],), jnp.int32), **model_kwargs,
                )
                return loop(
                    sfn, shape, key,
                    clip_denoised=args.clip_denoised,
                    model_kwargs=model_kwargs,
                    denoise_start_point=dsp,
                    init_image=init_image,
                    model_state0=state0,
                )
            model_fn = cfg_model_fn(
                model_fn, cfg_scale, build_null(model_kwargs), interval=g_interval
            )

        return loop(
            model_fn, shape, key,
            clip_denoised=args.clip_denoised,
            model_kwargs=model_kwargs,
            denoise_start_point=dsp,
            init_image=init_image,
        )

    from guided_diffusion_clip_tpu.utils.profiling import StepProfiler, annotate

    # --profile_dir captures a TensorBoard trace of the first post-compile
    # sampling chain (batch 0 compiles; batch 1 is the steady-state trace)
    prof = StepProfiler(args.profile_dir, first_step=1, num_steps=1)

    logger.log("sampling...")
    all_images = []
    # each iteration gathers world_size*batch_size samples (all_gather below)
    n_batches = -(-args.num_samples // (args.batch_size * pdist.world_size()))

    def dispatched():
        nonlocal rng
        for counter in range(n_batches):
            imgs, kwargs = next(data)
            kwargs = add_delta_imgimg(kwargs)
            model_kwargs = {k: jnp.asarray(v) for k, v in kwargs.items()}
            init_image = model_kwargs.get("img2") if dsp != -1 else None

            rng, sample_rng = jax.random.split(rng)
            prof.maybe_start(counter)
            with prof.step_scope(counter), annotate("sample_chain"):
                sample = run_chain(params, sample_rng, model_kwargs, init_image)
                if prof.profile_dir:
                    sample.block_until_ready()  # bound the captured trace
            prof.maybe_stop(counter)
            yield counter, imgs, sample

    def write_batch(item):
        counter, imgs, sample = item
        sample_np = np.asarray(sample)  # syncs this batch only
        sample_u8 = ((sample_np + 1) * 127.5).clip(0, 255).astype(np.uint8)

        save_img(tensor2img(sample_np), os.path.join(logger.get_dir(), f"samples_test{counter}.png"))
        save_img(tensor2img(np.asarray(imgs)), os.path.join(logger.get_dir(), f"target_{counter}.png"))

        gathered = pdist.all_gather_host(sample_u8)
        all_images.extend(list(gathered))
        logger.log(f"created {len(all_images) * args.batch_size} samples")

    overlap_device_host(dispatched(), write_batch)

    arr = np.concatenate(all_images, axis=0)[: args.num_samples]
    if pdist.is_primary():
        shape_str = "x".join(str(x) for x in arr.shape)
        out_path = os.path.join(logger.get_dir(), f"samples_{shape_str}.npz")
        logger.log(f"saving to {out_path}")
        np.savez(out_path, arr)
    pdist.barrier("sampling")
    logger.log("sampling complete")


def create_argparser():
    defaults = dict(
        clip_denoised=True,
        num_samples=10000,
        batch_size=16,
        use_ddim=False,
        model_path="",
        denoise_start_point=-1,
        data_dir_test="",
        clip_file_path_test="",
        main_path="",
        sub_dir_tstsave="",
        load_file="",
        f="",
        seed=0,
        conv_impl="auto",  # auto|xla|int8: int8 = quantized MXU fast path
        cfg_scale=0.0,  # >0: classifier-free guidance (model trained w/ cond_dropout)
        cfg_null_y=-1,  # null class index for CFG on y-labelled models
        cfg_cache=0,  # N>1: recompute the CFG uncond branch 1-in-N steps
        guidance_interval="",  # "lo,hi": CFG only for t in [lo,hi] (orig units)
        deep_cache=0,  # N>1: refresh the deep sub-UNet every N steps (DeepCache)
        deep_cache_cut=0,  # shallow input blocks; 0 = below the full-res level
        spatial_shard=0,  # >1: shard each image's H over a 'space' mesh axis (SP)
        tensor_shard=0,  # >1: shard activation channels over a 'model' mesh axis (TP)
        sampler="",  # ""(use_ddim decides)|ancestral|ddim|dpm++2m
        profile_dir="",  # capture a jax.profiler/TensorBoard trace here
    )
    defaults.update(model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
