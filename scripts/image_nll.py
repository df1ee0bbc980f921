"""Approximate bits/dimension for an image model (reference scripts/image_nll.py).

calc_bpd_loop runs the full T-step chain as one lax.scan; cross-process means
use host all-gather instead of dist.all_reduce.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()

import jax
import jax.numpy as jnp

from guided_diffusion_clip_tpu.ops.config import int8_emit
import numpy as np

from guided_diffusion_clip_tpu.data.image_datasets import load_data
from guided_diffusion_clip_tpu.parallel import dist as pdist
from guided_diffusion_clip_tpu.utils import logger
from guided_diffusion_clip_tpu.utils.checkpoint import init_template, load_params, setup_compilation_cache
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

    pdist.setup_dist()
    logger.configure(args=args)

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

    def make_model_fn(p):
        def model_fn(x, t, **kw):
            with int8_emit("s8"):  # bpd eval: forward passes only
                return model.apply({"params": p}, x, t, **kw)

        return model_fn

    logger.log("creating data loader...")
    data = load_data(
        data_dir=args.data_dir,
        batch_size=B,
        image_size=args.image_size,
        class_cond=args.class_cond,
        deterministic=True,
        clip_file_path=args.clip_file_path or None,
    )

    logger.log("evaluating...")
    run_bpd_evaluation(make_model_fn, params, diffusion, data, args.num_samples, args.clip_denoised)


def run_bpd_evaluation(make_model_fn, params, diffusion, data, num_samples, clip_denoised):
    rng = jax.random.key(0)
    all_bpd = []
    all_metrics = {"vb": [], "mse": [], "xstart_mse": []}
    num_complete = 0

    @jax.jit
    def run_bpd(p, x, key, model_kwargs):
        return diffusion.calc_bpd_loop(
            make_model_fn(p), x, key, clip_denoised=clip_denoised, model_kwargs=model_kwargs
        )

    while num_complete < num_samples:
        batch, model_kwargs = next(data)
        rng, bpd_rng = jax.random.split(rng)
        metrics = run_bpd(
            params, jnp.asarray(batch), bpd_rng,
            {k: jnp.asarray(v) for k, v in model_kwargs.items()},
        )
        for key, term_list in all_metrics.items():
            terms = np.asarray(metrics[key]).mean(axis=0)
            terms = pdist.all_gather_host(terms).mean(axis=0)
            term_list.append(terms)
        total = float(pdist.all_gather_host(np.asarray(metrics["total_bpd"]).mean()).mean())
        all_bpd.append(total)
        num_complete += max(1, jax.process_count()) * batch.shape[0]
        logger.log(f"done {num_complete} samples: bpd={np.mean(all_bpd)}")

    if pdist.is_primary():
        for name, terms in all_metrics.items():
            out_path = os.path.join(logger.get_dir(), f"{name}_terms.npz")
            logger.log(f"saving {name} terms to {out_path}")
            np.savez(out_path, np.mean(np.stack(terms), axis=0))
    pdist.barrier("nll")
    logger.log("evaluation complete")


def create_argparser():
    defaults = dict(
        data_dir="",
        clip_file_path="",
        main_path="",
        clip_denoised=True,
        num_samples=1000,
        batch_size=1,
        model_path="",
    )
    defaults.update(model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
