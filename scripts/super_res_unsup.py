"""Train the fork's unsupervised SR/delta model (reference scripts/super_res_unsup.py).

Trains SRImageModel_Feat on (img, img2, clip_feat, clip_feat2) triples from
the plain CLIP-paired loader (the reference's low_res path is dead code,
super_res_unsup.py:43-68). Fix-forward (SURVEY.md §0.1): no stray args=args
kwarg, optional val sets, `--load` resume via load_folder_path_parse.
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
    load_folder_path_parse,
    parse_yaml,
    sr_create_model_and_diffusion,
    sr_model_and_diffusion_defaults,
)


def main():
    args = create_argparser().parse_args()
    args = parse_yaml(args)
    # opt-in quantized training forward: s8 convs (2x MXU rate) with
    # straight-through bf16 backward (ops/quant.py VJPs produce real
    # dW/db); default xla = bf16 throughout
    from guided_diffusion_clip_tpu.ops.config import set_conv_impl

    set_conv_impl(getattr(args, "train_conv_impl", "xla"))
    if getattr(args, "load", ""):
        args.f = args.load
        load_folder_path_parse(args)
        args.resume_checkpoint = args.model_path

    from guided_diffusion_clip_tpu.utils.checkpoint import setup_compilation_cache

    setup_compilation_cache()
    pdist.setup_dist()
    logger.configure(args=args)
    logger.log("\n\t".join(f"{k} = {v}" for k, v in vars(args).items()))

    logger.log("creating model...")
    model, diffusion = sr_create_model_and_diffusion(
        **args_to_dict(args, sr_model_and_diffusion_defaults().keys())
    )
    schedule_sampler = create_named_schedule_sampler(
        args.schedule_sampler, diffusion.num_timesteps
    )

    logger.log("creating data loaders...")
    data = load_data(
        data_dir=args.data_dir,
        batch_size=args.batch_size,
        image_size=args.large_size,
        class_cond=args.class_cond,
        clip_file_path=args.clip_file_path or None,
    )
    val_datasets = []
    if args.data_dir:
        val_datasets.append(
            load_data(
                data_dir=args.data_dir,
                batch_size=args.val_batch_size,
                image_size=args.large_size,
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
                image_size=args.large_size,
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
        param_sharding=args.param_sharding,
        opt_impl=args.opt_impl,
        spatial_shard=args.spatial_shard,
        tensor_shard=args.tensor_shard,
        ckpt_backend=args.ckpt_backend,
        loss_weighting=args.loss_weighting,
    ).run_loop()


def create_argparser():
    defaults = dict(
        data_dir="",
        data_dir_test="",
        clip_file_path="",
        clip_file_path_test="",
        main_path="",
        schedule_sampler="uniform",
        lr=1e-4,
        weight_decay=0.0,
        lr_anneal_steps=0,
        batch_size=1,
        microbatch=-1,
        ema_rate="0.9999",
        log_interval=100,
        save_interval=5000,
        resume_checkpoint="",
        use_fp16=False,
        fp16_scale_growth=1e-3,
        param_sharding="replicated",
        opt_impl="tree",  # "flat": fused single-buffer AdamW+EMA; "zero1": flat + sharded opt/EMA state (neither composes with fsdp)
        spatial_shard=0,  # >1: shard activation H over a 'space' mesh axis (SP)
        tensor_shard=0,  # >1: shard activation C over a 'model' mesh axis (TP)
        ckpt_backend="flax",  # "orbax": async + natively sharded saves
        train_conv_impl="xla",  # "int8": quantized fwd, STE bf16 bwd (measure on-chip)
        loss_weighting="",  # "min_snr_5": SNR-clipped loss re-weighting
        # fork extras (super_res_unsup.py:148-149)
        SR_mode=True,
        resume_ema_opt=False,
        val_batch_size=8,
        load="",
        load_file="",
        f="",
    )
    defaults.update(sr_model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
