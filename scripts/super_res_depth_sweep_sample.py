"""Sweep denoise_start_point over test images
(reference scripts/super_res_depth_sweep_sample.py).

For each depth t0 in range(500, 1000, 199), start from q_sample(img2, t0) and
denoise to 0, saving a PNG per depth (reference :62, :95-96). Fix-forward
(SURVEY.md §0.1): denoise_start_point is an int, not a tuple.
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
from guided_diffusion_clip_tpu.parallel import dist as pdist
from guided_diffusion_clip_tpu.utils import logger
from guided_diffusion_clip_tpu.utils.checkpoint import init_template, load_params, setup_compilation_cache
from guided_diffusion_clip_tpu.utils.sample_util import process1
from guided_diffusion_clip_tpu.utils.saving_imgs import save_img, tensor2img
from guided_diffusion_clip_tpu.utils.script_util import (
    add_dict_to_argparser,
    args_to_dict,
    load_folder_path_parse,
    model_and_diffusion_defaults,
    create_model_and_diffusion,
    parse_yaml,
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
    B = args.batch_size
    shape = (B, args.image_size, args.image_size, 3)
    template = init_template(
        model, jnp.zeros(shape), jnp.zeros((B,)),
        clip_feat=jnp.zeros((B, 512)) if args.class_cond else None,
    )
    params = load_params(args.model_path, template)


    logger.log("loading data...")
    data = load_data(
        data_dir=args.data_dir_test,
        batch_size=B,
        image_size=args.image_size,
        class_cond=args.class_cond,
        deterministic=True,
        random_crop=False,
        random_flip=False,
        clip_file_path=args.clip_file_path_test or None,
    )

    imgs, kwargs = next(data)
    kwargs = process1(kwargs)
    model_kwargs = {k: jnp.asarray(v) for k, v in kwargs.items()}
    imgs_start = model_kwargs.get("img2", jnp.asarray(imgs))

    # fold the process index in: with identical seeds every rank would
    # generate the SAME noise/classes and the all-gathered set would be
    # world_size copies of one batch
    rng = jax.random.fold_in(jax.random.key(args.seed), pdist.rank())
    depths = list(range(500, 1000, 199))  # reference :62
    T = diffusion.num_timesteps
    for depth in depths:
        # depths are in original-T units; clamp into the respaced chain
        st = min(int(round(depth * T / diffusion.sched.original_num_steps)), T)
        rng, sample_rng = jax.random.split(rng)
        def _loop(params, key, mk, init, st=st):
            def model_fn(x, t, **kw):
                with int8_emit("s8"):  # unguided: no grad through the model
                    return model.apply({"params": params}, x, t, **kw)

            return diffusion.p_sample_loop(
                model_fn, shape, key,
                clip_denoised=args.clip_denoised, model_kwargs=mk,
                denoise_start_point=st, init_image=init,
            )

        run_chain = jax.jit(_loop)
        sample = run_chain(params, sample_rng, model_kwargs, imgs_start)
        out = os.path.join(logger.get_dir(), f"depth_{depth}.png")
        save_img(tensor2img(np.asarray(sample)), out)
        logger.log(f"depth {depth} (respaced {st}) -> {out}")
    save_img(tensor2img(np.asarray(imgs)), os.path.join(logger.get_dir(), "target.png"))
    save_img(tensor2img(np.asarray(imgs_start)), os.path.join(logger.get_dir(), "start.png"))
    logger.log("sweep complete")


def create_argparser():
    defaults = dict(
        clip_denoised=True,
        num_samples=8,
        batch_size=8,
        use_ddim=False,
        model_path="",
        data_dir_test="",
        clip_file_path_test="",
        main_path="",
        sub_dir_tstsave="",
        load_file="",
        f="",
        seed=0,
        conv_impl="auto",  # auto|xla|int8: int8 = quantized MXU fast path
        spatial_shard=0,  # >1: shard each image's H over a 'space' mesh axis (SP)
        tensor_shard=0,  # >1: shard activation channels over a 'model' mesh axis (TP)

        denoise_start_point=-1,
    )
    defaults.update(model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
