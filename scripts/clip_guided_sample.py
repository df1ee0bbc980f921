"""CLIP-guided sampling: steer the diffusion model with a CLIP similarity
gradient (the technique described in the reference model card,
model-card.md:45-48; BASELINE config 4).

The CLIP image encoder runs inside the scanned denoise step; the guidance
gradient is jax.grad of cosine similarity to a target embedding — from a
reference image (--target_image) or a precomputed/text embedding npz
(--target_embed). Supports a scale sweep via a comma list in --clip_scale.
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
    cfg_cached_model_fn,
    cfg_cached_state0,
    cfg_model_fn,
    interval_cond_fn,
    parse_guidance_interval,
)
from guided_diffusion_clip_tpu.models.clip_vit import (
    CLIPConfig,
    CLIPVisionEncoder,
    clip_guidance_cond_fn,
    import_clip_torch_state_dict,
    import_openai_clip_pt,
    preprocess_for_clip,
)
from guided_diffusion_clip_tpu.ops.config import int8_emit
from guided_diffusion_clip_tpu.parallel import dist as pdist
from guided_diffusion_clip_tpu.utils import logger
from guided_diffusion_clip_tpu.utils.checkpoint import (
    init_template,
    load_params,
    setup_compilation_cache,
)
from guided_diffusion_clip_tpu.utils.saving_imgs import save_img, tensor2img
from guided_diffusion_clip_tpu.utils.script_util import (
    add_dict_to_argparser,
    args_to_dict,
    create_model_and_diffusion,
    model_and_diffusion_defaults,
    parse_yaml,
    resolve_sampler,
)


def load_clip_params(path: str, cfg: CLIPConfig):
    """Load CLIP weights from an HF CLIPModel .bin/.pt or OpenAI CLIP .pt.
    -> (vision_params, text_params)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if any(k.startswith("visual.") for k in sd):
        vision, text, _ = import_openai_clip_pt(sd, cfg)
    else:
        vision, text, _ = import_clip_torch_state_dict(sd, cfg)
    return vision, text


def main():
    args = create_argparser().parse_args()
    from guided_diffusion_clip_tpu.ops.config import set_conv_impl

    args = parse_yaml(args)
    if int(getattr(args, "cfg_cache", 0)) > 1 and not getattr(args, "cfg_scale", 0.0):
        raise SystemExit(
            "--cfg_cache caches the CFG uncond branch; it needs --cfg_scale"
        )
    # after parse_yaml so a conv_impl key in the YAML config takes effect
    set_conv_impl(getattr(args, "conv_impl", "auto"))

    pdist.setup_dist()
    from guided_diffusion_clip_tpu.parallel import sp as _sp, tp as _tp
    # after setup_dist: setup_from_flag touches jax.devices(), which must
    # not initialize the backend before jax.distributed.initialize
    _sp.setup_from_flag(getattr(args, 'spatial_shard', 0), args.batch_size)
    _tp.setup_from_flag(getattr(args, 'tensor_shard', 0), args.batch_size)
    logger.configure(args=args)
    setup_compilation_cache()

    logger.log("creating model and diffusion...")
    model, diffusion = create_model_and_diffusion(
        **args_to_dict(args, model_and_diffusion_defaults().keys())
    )
    B = args.batch_size
    shape = (B, args.image_size, args.image_size, 3)
    template = init_template(
        model, jnp.zeros(shape), jnp.zeros((B,)),
        clip_feat=jnp.zeros((B, 512)) if args.class_cond else None,
    )
    params = load_params(args.model_path, template)

    logger.log("loading CLIP...")
    # GDC_CLIP_TINY=1 selects a tiny CLIP config (CI/e2e tests with random
    # weights); production uses the real ViT-B/32 shape.
    if os.environ.get("GDC_CLIP_TINY"):
        clip_cfg = CLIPConfig(
            image_size=32, patch_size=16, vision_width=64, vision_layers=2,
            vision_heads=4, vocab_size=100, context_length=12, text_width=32,
            text_layers=2, text_heads=2, embed_dim=16,
        )
    else:
        clip_cfg = CLIPConfig()
    if args.text:
        # Tokenize first so the tiny-CLIP path can size its vocab off the
        # supplied merges file (--clip_vocab, else $CLIP_BPE_PATH).
        import dataclasses

        from guided_diffusion_clip_tpu.models.clip_tokenizer import SimpleTokenizer

        tokenizer = SimpleTokenizer(
            bpe_path=args.clip_vocab or None,
            context_length=clip_cfg.context_length,
        )
        if os.environ.get("GDC_CLIP_TINY"):
            clip_cfg = dataclasses.replace(clip_cfg, vocab_size=len(tokenizer.encoder))
        elif len(tokenizer.encoder) != clip_cfg.vocab_size:
            raise SystemExit(
                f"vocab size mismatch: merges file yields {len(tokenizer.encoder)} "
                f"tokens, CLIP model expects {clip_cfg.vocab_size}"
            )

    clip_vision = CLIPVisionEncoder(clip_cfg)
    vparams, tparams = load_clip_params(args.clip_model_path, clip_cfg)

    def embed_fn(pixels):
        return clip_vision.apply({"params": vparams}, pixels)

    # target embedding: text prompt, reference image, or precomputed npz
    if args.text:
        from guided_diffusion_clip_tpu.models.clip_vit import CLIPTextEncoder

        tokens = jnp.asarray(tokenizer(args.text))
        text_encoder = CLIPTextEncoder(clip_cfg)
        target = text_encoder.apply({"params": tparams}, tokens)[0]
        logger.log(f"text target: {args.text!r} -> {target.shape[-1]}-d embedding")
    elif args.target_image:
        from PIL import Image

        img = Image.open(args.target_image).convert("RGB")
        arr = np.asarray(img, np.float32) / 127.5 - 1.0
        target = embed_fn(preprocess_for_clip(jnp.asarray(arr)[None], clip_cfg.image_size))[0]
    elif args.target_embed:
        target = jnp.asarray(np.load(args.target_embed)["arr_0"]).reshape(-1)
    else:
        raise SystemExit("provide --text, --target_image or --target_embed")

    scales = [float(s) for s in str(args.clip_scale).split(",")]
    g_interval = parse_guidance_interval(getattr(args, "guidance_interval", ""))
    guidance_cache_n = int(getattr(args, "guidance_cache", 0))
    # fold the process index in: with identical seeds every rank would
    # generate the SAME noise/classes and the all-gathered set would be
    # world_size copies of one batch
    rng = jax.random.fold_in(jax.random.key(args.seed), pdist.rank())
    for scale in scales:
        def _chain(params, vparams, key, scale=scale):
            # grad_through_pred_xstart differentiates THROUGH the UNet, so
            # the s8 emission (no tangent) is only safe in noisy-x mode.
            emit = "bf16" if args.grad_through_pred_xstart else "s8"

            def base_fn(x, t, **kw):
                with int8_emit(emit):
                    return model.apply({"params": params}, x, t, **kw)

            def inject_target(x, kw):
                # condition on the target embedding itself (fork pathway)
                return dict(kw, clip_feat=jnp.broadcast_to(target, (x.shape[0], target.shape[-1])))

            def model_fn(x, t, **kw):
                return base_fn(x, t, **(inject_target(x, kw) if args.class_cond else kw))

            # classifier-free guidance over the embedding conditioning
            # (model trained with --cond_dropout); composes with the CLIP
            # guidance cond_fn, which keeps the plain conditional model
            loop_model_fn = model_fn
            model_state0 = None
            if getattr(args, "cfg_scale", 0.0):
                if not args.class_cond:
                    raise SystemExit(
                        "--cfg_scale needs an embedding-conditioned model "
                        "(--class_cond True); an unconditional model has no "
                        "conditioning to guide on"
                    )
                if int(getattr(args, "cfg_cache", 0)) > 1:
                    # cached uncond branch: recompute 1-in-N, carry in the
                    # scan alongside the (independent) cond_state0 slot
                    _sfn = cfg_cached_model_fn(
                        base_fn, args.cfg_scale, {"clip_feat": 0.0},
                        int(args.cfg_cache), interval=g_interval,
                    )
                    model_state0 = cfg_cached_state0(
                        base_fn, jnp.zeros(shape),
                        jnp.zeros((shape[0],), jnp.int32),
                        **inject_target(jnp.zeros(shape), {}),
                    )

                    def loop_model_fn(x, t, state, **kw):
                        return _sfn(x, t, state, **inject_target(x, kw))
                else:
                    _cfg = cfg_model_fn(
                        base_fn, args.cfg_scale, {"clip_feat": 0.0}, interval=g_interval
                    )

                    def loop_model_fn(x, t, **kw):
                        return _cfg(x, t, **inject_target(x, kw))

            def embed(pixels):
                return clip_vision.apply({"params": vparams}, pixels)

            cond_fn = clip_guidance_cond_fn(
                embed, target, scale=scale,
                clip_image_size=clip_cfg.image_size,
                sched=diffusion.sched, mean_type=diffusion.mean_type,
                var_type=diffusion.var_type, model_fn=model_fn,
                use_pred_xstart=args.grad_through_pred_xstart,
            )
            if g_interval is not None:
                # skip the CLIP fwd+VJP (and, in pred-x0 mode, the extra
                # UNet fwd it differentiates through) outside [lo, hi]
                cond_fn = interval_cond_fn(cond_fn, *g_interval)
            cond_state0 = None
            if guidance_cache_n > 1:
                # CLIP guidance is the expensive term (in pred-x0 mode the
                # cond_fn differentiates through a full UNet forward):
                # recompute it 1-in-N steps, carry the gradient in between
                cond_fn, cond_state0 = cached_cond_fn(cond_fn, guidance_cache_n, shape)
            loop = resolve_sampler(diffusion, args)
            return loop(
                loop_model_fn, shape, key,
                clip_denoised=args.clip_denoised, cond_fn=cond_fn,
                cond_state0=cond_state0, model_state0=model_state0,
            )

        rng, sample_rng = jax.random.split(rng)
        sample = jax.jit(_chain)(params, vparams, sample_rng)
        out = os.path.join(logger.get_dir(), f"clip_guided_scale{scale:g}.png")
        save_img(tensor2img(np.asarray(sample)), out)
        if pdist.is_primary():
            np.savez(
                os.path.join(logger.get_dir(), f"clip_guided_scale{scale:g}.npz"),
                ((np.asarray(sample) + 1) * 127.5).clip(0, 255).astype(np.uint8),
            )
        logger.log(f"scale {scale} -> {out}")
    logger.log("clip-guided sampling complete")


def create_argparser():
    defaults = dict(
        clip_denoised=True,
        num_samples=8,
        batch_size=8,
        use_ddim=False,
        sampler="",  # ""(use_ddim decides)|ancestral|ddim|dpm++2m
        model_path="",
        clip_model_path="",
        text="",  # text prompt target (tokenized with --clip_vocab merges)
        clip_vocab="",  # path to bpe_simple_vocab_16e6.txt(.gz); else $CLIP_BPE_PATH
        target_image="",
        target_embed="",
        clip_scale="100.0",
        grad_through_pred_xstart=True,
        main_path="",
        seed=0,
        conv_impl="auto",  # auto|xla|int8: int8 = quantized MXU fast path
        spatial_shard=0,  # >1: shard each image's H over a 'space' mesh axis (SP)
        tensor_shard=0,  # >1: shard activation channels over a 'model' mesh axis (TP)
        cfg_scale=0.0,  # >0: classifier-free guidance (model trained w/ cond_dropout)
        cfg_cache=0,  # N>1: recompute the CFG uncond branch 1-in-N steps
        guidance_interval="",  # "lo,hi": guide only for t in [lo,hi] (orig units)
        guidance_cache=0,  # N>1: recompute the guidance gradient 1-in-N steps
    )
    defaults.update(model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
