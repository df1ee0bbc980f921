"""Train the upstream super-resolution model (reference scripts/super_res_train.py).

load_superres_data wraps the base loader and adds a `low_res` kwarg by
area-downsampling the large batch (super_res_train.py:82-92).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()

import numpy as np

from guided_diffusion_clip_tpu.data.image_datasets import load_data
from guided_diffusion_clip_tpu.parallel import dist as pdist
from guided_diffusion_clip_tpu.training.resample import create_named_schedule_sampler
from guided_diffusion_clip_tpu.training.train_loop import TrainLoop
from guided_diffusion_clip_tpu.utils import logger
from guided_diffusion_clip_tpu.utils.script_util import (
    add_dict_to_argparser,
    args_to_dict,
    parse_yaml,
    sr_create_model_and_diffusion,
    sr_model_and_diffusion_defaults,
)


def area_downsample(batch: np.ndarray, size: int) -> np.ndarray:
    """NHWC area (average-pool) downsample, matching F.interpolate(mode="area")
    for integer factors (super_res_train.py:89)."""
    B, H, W, C = batch.shape
    f = H // size
    assert f * size == H, f"area downsample needs integer factor, got {H}->{size}"
    return batch.reshape(B, size, f, size, f, C).mean(axis=(2, 4))


def load_superres_data(data_dir, batch_size, large_size, small_size, class_cond=False, clip_file_path=None):
    data = load_data(
        data_dir=data_dir,
        batch_size=batch_size,
        image_size=large_size,
        class_cond=class_cond,
        clip_file_path=clip_file_path,
    )
    for large_batch, model_kwargs in data:
        model_kwargs["low_res"] = area_downsample(large_batch, small_size)
        yield large_batch, model_kwargs


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

    logger.log("creating model...")
    model, diffusion = sr_create_model_and_diffusion(
        **args_to_dict(args, sr_model_and_diffusion_defaults().keys())
    )
    # Fix-forward (SURVEY.md §0.1): the fork's SR factory returns the
    # img2/Δclip model, but this script's loader supplies `low_res` batches
    # (super_res_train.py:82-92) — the upstream cascade. Re-dispatch to the
    # upstream SuperResModel variant so the trained checkpoint is the one
    # super_res_sample.py consumes.
    import dataclasses

    from guided_diffusion_clip_tpu.models.unet import UNetModel

    cfg = dataclasses.replace(
        model.config,
        variant="super_res",
        num_classes=model.config.num_classes if args.class_cond else None,
        label_emb_type="embedding",
    )
    model = UNetModel(config=cfg, dtype=model.dtype)
    schedule_sampler = create_named_schedule_sampler(
        args.schedule_sampler, diffusion.num_timesteps
    )

    logger.log("creating data loader...")
    data = load_superres_data(
        args.data_dir,
        args.batch_size,
        large_size=args.large_size,
        small_size=args.small_size,
        class_cond=args.class_cond,
        clip_file_path=args.clip_file_path or None,
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
        clip_file_path="",
        main_path="",
        schedule_sampler="uniform",
        lr=1e-4,
        weight_decay=0.0,
        lr_anneal_steps=0,
        batch_size=1,
        microbatch=-1,
        ema_rate="0.9999",
        log_interval=10,
        save_interval=10000,
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
    )
    defaults.update(sr_model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
