"""Train a diffusion model on images (reference scripts/image_train.py).

Same flag surface; data parallelism comes from the jit-sharded train step over
the device mesh instead of mpiexec (run one process per host on multi-host
slices — see guided_diffusion_clip_tpu.parallel.dist.setup_dist).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()

from guided_diffusion_clip_tpu.data.image_datasets import load_data
from guided_diffusion_clip_tpu.parallel import dist as pdist
from guided_diffusion_clip_tpu.training.resample import create_named_schedule_sampler
from guided_diffusion_clip_tpu.training.train_loop import TrainLoop
from guided_diffusion_clip_tpu.utils import logger
from guided_diffusion_clip_tpu.utils.script_util import (
    add_dict_to_argparser,
    args_to_dict,
    create_model_and_diffusion,
    model_and_diffusion_defaults,
    parse_yaml,
)


def main():
    args = create_argparser().parse_args()
    args = parse_yaml(args)
    # opt-in quantized training forward: s8 convs (2x MXU rate) with
    # straight-through bf16 backward (ops/quant.py VJPs produce real
    # dW/db); default xla = bf16 throughout
    from guided_diffusion_clip_tpu.ops.config import set_conv_impl

    set_conv_impl(getattr(args, "train_conv_impl", "xla"))

    from guided_diffusion_clip_tpu.utils.checkpoint import setup_compilation_cache

    setup_compilation_cache()
    pdist.setup_dist()
    logger.configure(args=args)

    logger.log("\n\t".join(f"{k} = {v}" for k, v in vars(args).items()))
    logger.log("creating model and diffusion...")
    model, diffusion = create_model_and_diffusion(
        **args_to_dict(args, model_and_diffusion_defaults().keys())
    )
    schedule_sampler = create_named_schedule_sampler(
        args.schedule_sampler, diffusion.num_timesteps
    )

    logger.log(f"creating data loader... dir: {args.data_dir}")
    data = load_data(
        data_dir=args.data_dir,
        batch_size=args.batch_size,
        image_size=args.image_size,
        class_cond=args.class_cond,
        clip_file_path=args.clip_file_path or None,
    )
    # Fix-forward (SURVEY.md §0.1): val/test loaders only when their dirs exist.
    val_datasets = []
    if args.data_dir:
        val_datasets.append(
            load_data(
                data_dir=args.data_dir,
                batch_size=args.val_batch_size,
                image_size=args.image_size,
                class_cond=args.class_cond,
                deterministic=True,
                clip_file_path=args.clip_file_path or None,
            )
        )
    if args.data_dir_test:
        val_datasets.append(
            load_data(
                data_dir=args.data_dir_test,
                batch_size=args.val_batch_size,
                image_size=args.image_size,
                class_cond=args.class_cond,
                deterministic=True,
                clip_file_path=args.clip_file_path_test or None,
            )
        )

    logger.log("training...")
    TrainLoop(
        model=model,
        diffusion=diffusion,
        data=data,
        batch_size=args.batch_size,
        microbatch=args.microbatch,
        lr=args.lr,
        ema_rate=args.ema_rate,
        log_interval=args.log_interval,
        save_interval=args.save_interval,
        resume_checkpoint=args.resume_checkpoint,
        use_fp16=args.use_fp16,
        fp16_scale_growth=args.fp16_scale_growth,
        schedule_sampler=schedule_sampler,
        weight_decay=args.weight_decay,
        lr_anneal_steps=args.lr_anneal_steps,
        val_datasets=val_datasets or None,
        val_batch_size=args.val_batch_size,
        profile_dir=args.profile_dir,
        param_sharding=args.param_sharding,
        opt_impl=args.opt_impl,
        ckpt_backend=args.ckpt_backend,
        loss_weighting=args.loss_weighting,
        spatial_shard=args.spatial_shard,
        tensor_shard=args.tensor_shard,
        cond_dropout=args.cond_dropout,
        cond_null_y=args.cfg_null_y,
    ).run_loop()


def create_argparser():
    defaults = dict(
        data_dir="",
        data_dir_test="",
        clip_file_path="",
        clip_file_path_test="",
        main_path="",
        profile_dir="",  # capture a jax.profiler/TensorBoard trace here
        param_sharding="replicated",  # "fsdp" shards params/opt/EMA over the data axis
        opt_impl="tree",  # "flat": fused single-buffer AdamW+EMA; "zero1": flat + sharded opt/EMA state (neither composes with fsdp)
        spatial_shard=0,  # >1: shard activation H over a 'space' mesh axis (SP)
        tensor_shard=0,  # >1: shard activation C over a 'model' mesh axis (TP)
        ckpt_backend="flax",  # "orbax": async + natively sharded saves
        train_conv_impl="xla",  # "int8": quantized fwd, STE bf16 bwd (measure on-chip)
        loss_weighting="",  # "min_snr_5": SNR-clipped loss re-weighting
        cond_dropout=0.0,  # >0: drop conditioning per example (train for CFG)
        cfg_null_y=-1,  # reserved null class index for cond_dropout on y models
        schedule_sampler="uniform",
        lr=1e-4,
        weight_decay=0.0,
        lr_anneal_steps=0,
        batch_size=1,
        microbatch=-1,  # -1 disables microbatches
        ema_rate="0.9999",  # comma-separated list of EMA values
        log_interval=100,
        save_interval=5000,
        resume_checkpoint="",
        use_fp16=False,
        fp16_scale_growth=1e-3,
        val_batch_size=8,
    )
    defaults.update(model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
