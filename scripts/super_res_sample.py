"""Upsample a batch of base samples with the SR model
(reference scripts/super_res_sample.py).

Base samples come from an image_sample.py npz; rows are sharded across
processes (super_res_sample.py:77-100).
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

from guided_diffusion_clip_tpu.parallel import dist as pdist
from guided_diffusion_clip_tpu.utils import logger
from guided_diffusion_clip_tpu.utils.sample_util import overlap_device_host
from guided_diffusion_clip_tpu.utils.checkpoint import init_template, load_params, setup_compilation_cache
from guided_diffusion_clip_tpu.utils.script_util import (
    add_dict_to_argparser,
    args_to_dict,
    parse_yaml,
    resolve_sampler,
    sr_create_model_and_diffusion,
    sr_model_and_diffusion_defaults,
)


def load_data_for_worker(base_samples, batch_size, class_cond):
    """Shard npz rows by process and loop (super_res_sample.py:77-100).

    npz arrays are NHWC uint8 from image_sample; yields float [-1,1] low_res.
    """
    with open(base_samples, "rb") as f:
        obj = np.load(f)
        image_arr = obj["arr_0"]
        label_arr = obj["arr_1"] if class_cond and "arr_1" in obj else None
    rank = pdist.rank()
    num_ranks = pdist.world_size()
    buffer, label_buffer = [], []
    while True:
        for i in range(rank, len(image_arr), num_ranks):
            buffer.append(image_arr[i])
            if label_arr is not None:
                label_buffer.append(label_arr[i])
            if len(buffer) == batch_size:
                batch = np.stack(buffer).astype(np.float32) / 127.5 - 1.0
                res = dict(low_res=batch)
                if label_arr is not None:
                    res["y"] = np.stack(label_buffer)
                yield res
                buffer, label_buffer = [], []


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

    logger.log("creating model...")
    model, diffusion = sr_create_model_and_diffusion(
        **args_to_dict(args, sr_model_and_diffusion_defaults().keys())
    )
    B = args.batch_size
    shape = (B, args.large_size, args.large_size, 3)
    small = (B, args.small_size, args.small_size, 3)
    # The fork's SR factory builds the img2/Δclip model; the upstream low_res
    # cascade uses the plain SuperResModel. Pick by which kwargs arrive.
    import dataclasses

    from guided_diffusion_clip_tpu.models.unet import UNetModel

    cfg = dataclasses.replace(model.config, variant="super_res", num_classes=(
        model.config.num_classes if args.class_cond else None
    ), label_emb_type="embedding")
    model = UNetModel(config=cfg, dtype=model.dtype)
    init_kwargs = dict(low_res=jnp.zeros(small))
    if args.class_cond:
        init_kwargs["y"] = jnp.zeros((B,), jnp.int32)
    setup_compilation_cache()
    template = init_template(model, jnp.zeros(shape), jnp.zeros((B,)), **init_kwargs)
    params = load_params(args.model_path, template)

    logger.log("loading data...")
    data = load_data_for_worker(args.base_samples, B, args.class_cond)

    # reference parity: super_res_sample always runs the ancestral chain
    # (scripts/super_res_sample.py ignores use_ddim); --sampler is the
    # beyond-reference opt-in for ddim / dpm++2m fast chains
    loop = resolve_sampler(diffusion, args, honor_use_ddim=False)

    @jax.jit
    def run_chain(params, key, model_kwargs):
        def model_fn(x, t, **kw):
            with int8_emit("s8"):  # unguided sampling never differentiates
                return model.apply({"params": params}, x, t, **kw)

        return loop(
            model_fn, shape, key,
            clip_denoised=args.clip_denoised,
            model_kwargs=model_kwargs,
        )

    logger.log("creating samples...")
    # fold the process index in: with identical seeds every rank would
    # generate the SAME noise/classes and the all-gathered set would be
    # world_size copies of one batch
    rng = jax.random.fold_in(jax.random.key(args.seed), pdist.rank())
    all_images = []
    # each iteration gathers world_size*B samples (all_gather below)
    n_batches = -(-args.num_samples // (B * pdist.world_size()))

    def dispatched():
        nonlocal rng
        for _ in range(n_batches):
            model_kwargs = {k: jnp.asarray(v) for k, v in next(data).items()}
            rng, sample_rng = jax.random.split(rng)
            yield run_chain(params, sample_rng, model_kwargs)

    def gather_batch(sample):
        sample_u8 = ((np.asarray(sample) + 1) * 127.5).clip(0, 255).astype(np.uint8)
        all_images.extend(list(pdist.all_gather_host(sample_u8)))
        logger.log(f"created {len(all_images) * B} samples")

    # host uint8/gather work for batch k overlaps batch k+1's device chain
    overlap_device_host(dispatched(), gather_batch)

    arr = np.concatenate(all_images, axis=0)[: args.num_samples]
    if pdist.is_primary():
        shape_str = "x".join(str(x) for x in arr.shape)
        out_path = os.path.join(logger.get_dir(), f"samples_{shape_str}.npz")
        logger.log(f"saving to {out_path}")
        np.savez(out_path, arr)
    pdist.barrier("sr_sampling")
    logger.log("sampling complete")


def create_argparser():
    defaults = dict(
        clip_denoised=True,
        num_samples=10000,
        batch_size=16,
        use_ddim=False,  # accepted for flag parity; reference ignores it here
        sampler="",  # beyond-reference: ""(ancestral, parity)|ddim|dpm++2m
        base_samples="",
        model_path="",
        main_path="",
        seed=0,
        conv_impl="auto",  # auto|xla|int8: int8 = quantized MXU fast path
        spatial_shard=0,  # >1: shard each image's H over a 'space' mesh axis (SP)
        tensor_shard=0,  # >1: shard activation channels over a 'model' mesh axis (TP)

    )
    defaults.update(sr_model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
