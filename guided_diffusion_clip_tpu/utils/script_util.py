"""Config/factory layer: defaults dicts, model+diffusion factories, CLI glue.

Reference behavior: guided_diffusion/script_util.py. The public flag surface
is preserved verbatim (parity requirement: README flag strings must run
unchanged). `use_fp16` maps to a bf16 compute dtype — the TPU-native
loss-scale-free equivalent (SURVEY.md §2.1).

NUM_CLASSES = 512: the fork repurposes the class count as the CLIP embedding
dimension (script_util.py:9).
"""

from __future__ import annotations

import argparse
import inspect
import os

import jax.numpy as jnp
import yaml

from ..diffusion.api import Diffusion
from ..diffusion.schedules import (
    LossType,
    ModelMeanType,
    ModelVarType,
    build_schedule,
)
from ..models.clip_models import SRImageModel_Feat, UNetModel_clip_feat
from ..models.unet import EncoderUNetModel, UNetConfig, UNetModel

NUM_CLASSES = 512


def diffusion_defaults():
    """Defaults for image and classifier training (script_util.py:12-25)."""
    return dict(
        learn_sigma=False,
        diffusion_steps=1000,
        noise_schedule="linear",
        timestep_respacing="",
        use_kl=False,
        predict_xstart=False,
        rescale_timesteps=False,
        rescale_learned_sigmas=False,
    )


def classifier_defaults():
    """Defaults for classifier models (script_util.py:28-41)."""
    return dict(
        image_size=64,
        classifier_use_fp16=False,
        classifier_width=128,
        classifier_depth=2,
        classifier_attention_resolutions="32,16,8",
        classifier_use_scale_shift_norm=True,
        classifier_resblock_updown=True,
        classifier_pool="attention",
    )


def model_and_diffusion_defaults():
    """Defaults for image training (script_util.py:44-66)."""
    res = dict(
        image_size=64,
        num_channels=128,
        num_res_blocks=2,
        num_heads=4,
        num_heads_upsample=-1,
        num_head_channels=-1,
        attention_resolutions="16,8",
        channel_mult="",
        dropout=0.0,
        class_cond=False,
        use_checkpoint=False,
        use_scale_shift_norm=True,
        resblock_updown=False,
        use_fp16=False,
        use_new_attention_order=False,
    )
    res.update(diffusion_defaults())
    return res


def classifier_and_diffusion_defaults():
    res = classifier_defaults()
    res.update(diffusion_defaults())
    return res


def default_channel_mult(image_size: int) -> tuple:
    """Per-resolution channel_mult presets (script_util.py:149-159)."""
    if image_size == 512:
        return (0.5, 1, 1, 2, 2, 4, 4)
    elif image_size == 256:
        return (1, 1, 2, 2, 4, 4)
    elif image_size == 128:
        return (1, 1, 2, 3, 4)
    elif image_size == 64:
        return (1, 2, 3, 4)
    raise ValueError(f"unsupported image size: {image_size}")


def parse_attention_resolutions(spec: str, image_size: int) -> tuple:
    """"32,16,8" -> downsample factors image_size//res (script_util.py:163-165)."""
    return tuple(image_size // int(res) for res in str(spec).split(","))


def _dtype(use_fp16: bool):
    # TPU-native: bf16 compute, no loss scaling (replaces fp16_util).
    return jnp.bfloat16 if use_fp16 else jnp.float32


def create_model(
    image_size,
    num_channels,
    num_res_blocks,
    channel_mult="",
    learn_sigma=False,
    class_cond=False,
    use_checkpoint=False,
    attention_resolutions="16",
    num_heads=1,
    num_head_channels=-1,
    num_heads_upsample=-1,
    use_scale_shift_norm=False,
    dropout=0,
    resblock_updown=False,
    use_fp16=False,
    use_new_attention_order=False,
):
    """The fork's default model: UNetModel_clip_feat (script_util.py:131-187)."""
    if channel_mult == "":
        channel_mult = default_channel_mult(image_size)
    elif isinstance(channel_mult, str):
        channel_mult = tuple(int(m) for m in channel_mult.split(","))
    cfg = UNetConfig(
        image_size=image_size,
        in_channels=3,
        model_channels=num_channels,
        out_channels=(3 if not learn_sigma else 6),
        num_res_blocks=num_res_blocks,
        attention_resolutions=parse_attention_resolutions(attention_resolutions, image_size),
        dropout=dropout,
        channel_mult=tuple(channel_mult),
        num_classes=(NUM_CLASSES if class_cond else None),
        use_checkpoint=use_checkpoint,
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        resblock_updown=resblock_updown,
        use_new_attention_order=use_new_attention_order,
    )
    return UNetModel_clip_feat(cfg, dtype=_dtype(use_fp16))


def create_upstream_model(**kw):
    """Plain upstream UNetModel (class-label conditioning), for the released
    ADM checkpoints that don't use CLIP embeddings."""
    use_fp16 = kw.pop("use_fp16", False)
    model = create_model(use_fp16=use_fp16, **kw)
    import dataclasses

    cfg = dataclasses.replace(model.config, variant="unet", label_emb_type="embedding")
    num_classes = 1000 if cfg.num_classes is not None else None
    cfg = dataclasses.replace(cfg, num_classes=num_classes)
    return UNetModel(config=cfg, dtype=_dtype(use_fp16))


def create_gaussian_diffusion(
    *,
    steps=1000,
    learn_sigma=False,
    sigma_small=False,
    noise_schedule="linear",
    use_kl=False,
    predict_xstart=False,
    rescale_timesteps=False,
    rescale_learned_sigmas=False,
    timestep_respacing="",
) -> Diffusion:
    """Map flags to schedule + enums (script_util.py:392-430)."""
    if use_kl:
        loss_type = LossType.RESCALED_KL
    elif rescale_learned_sigmas:
        loss_type = LossType.RESCALED_MSE
    else:
        loss_type = LossType.MSE
    sched = build_schedule(
        steps=steps,
        noise_schedule=noise_schedule,
        timestep_respacing=timestep_respacing,
        rescale_timesteps=rescale_timesteps,
    )
    return Diffusion(
        sched=sched,
        mean_type=ModelMeanType.EPSILON if not predict_xstart else ModelMeanType.START_X,
        var_type=(
            (ModelVarType.FIXED_LARGE if not sigma_small else ModelVarType.FIXED_SMALL)
            if not learn_sigma
            else ModelVarType.LEARNED_RANGE
        ),
        loss_type=loss_type,
    )


def create_model_and_diffusion(
    image_size,
    class_cond,
    learn_sigma,
    num_channels,
    num_res_blocks,
    channel_mult,
    num_heads,
    num_head_channels,
    num_heads_upsample,
    attention_resolutions,
    dropout,
    diffusion_steps,
    noise_schedule,
    timestep_respacing,
    use_kl,
    predict_xstart,
    rescale_timesteps,
    rescale_learned_sigmas,
    use_checkpoint,
    use_scale_shift_norm,
    resblock_updown,
    use_fp16,
    use_new_attention_order,
):
    model = create_model(
        image_size,
        num_channels,
        num_res_blocks,
        channel_mult=channel_mult,
        learn_sigma=learn_sigma,
        class_cond=class_cond,
        use_checkpoint=use_checkpoint,
        attention_resolutions=attention_resolutions,
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        dropout=dropout,
        resblock_updown=resblock_updown,
        use_fp16=use_fp16,
        use_new_attention_order=use_new_attention_order,
    )
    diffusion = create_gaussian_diffusion(
        steps=diffusion_steps,
        learn_sigma=learn_sigma,
        noise_schedule=noise_schedule,
        use_kl=use_kl,
        predict_xstart=predict_xstart,
        rescale_timesteps=rescale_timesteps,
        rescale_learned_sigmas=rescale_learned_sigmas,
        timestep_respacing=timestep_respacing,
    )
    return model, diffusion


def create_classifier(
    image_size,
    classifier_use_fp16,
    classifier_width,
    classifier_depth,
    classifier_attention_resolutions,
    classifier_use_scale_shift_norm,
    classifier_resblock_updown,
    classifier_pool,
):
    """EncoderUNet classifier; out_channels fixed 1000 (script_util.py:231-269)."""
    cfg = UNetConfig(
        image_size=image_size,
        in_channels=3,
        model_channels=classifier_width,
        out_channels=1000,
        num_res_blocks=classifier_depth,
        attention_resolutions=parse_attention_resolutions(
            classifier_attention_resolutions, image_size
        ),
        channel_mult=default_channel_mult(image_size),
        num_head_channels=64,
        use_scale_shift_norm=classifier_use_scale_shift_norm,
        resblock_updown=classifier_resblock_updown,
    )
    return EncoderUNetModel(
        config=cfg, pool=classifier_pool, dtype=_dtype(classifier_use_fp16)
    )


def create_classifier_and_diffusion(
    image_size,
    classifier_use_fp16,
    classifier_width,
    classifier_depth,
    classifier_attention_resolutions,
    classifier_use_scale_shift_norm,
    classifier_resblock_updown,
    classifier_pool,
    learn_sigma,
    diffusion_steps,
    noise_schedule,
    timestep_respacing,
    use_kl,
    predict_xstart,
    rescale_timesteps,
    rescale_learned_sigmas,
):
    classifier = create_classifier(
        image_size,
        classifier_use_fp16,
        classifier_width,
        classifier_depth,
        classifier_attention_resolutions,
        classifier_use_scale_shift_norm,
        classifier_resblock_updown,
        classifier_pool,
    )
    diffusion = create_gaussian_diffusion(
        steps=diffusion_steps,
        learn_sigma=learn_sigma,
        noise_schedule=noise_schedule,
        use_kl=use_kl,
        predict_xstart=predict_xstart,
        rescale_timesteps=rescale_timesteps,
        rescale_learned_sigmas=rescale_learned_sigmas,
        timestep_respacing=timestep_respacing,
    )
    return classifier, diffusion


def sr_model_and_diffusion_defaults():
    """SR defaults: pruned to the sr factory signature (script_util.py:272-280)."""
    res = model_and_diffusion_defaults()
    res["large_size"] = 128
    res["small_size"] = 64
    arg_names = inspect.getfullargspec(sr_create_model_and_diffusion)[0]
    for k in list(res.keys()):
        if k not in arg_names:
            del res[k]
    return res


def sr_create_model(
    large_size,
    small_size,
    num_channels,
    num_res_blocks,
    learn_sigma,
    class_cond,
    use_checkpoint,
    attention_resolutions,
    num_heads,
    num_head_channels,
    num_heads_upsample,
    use_scale_shift_norm,
    dropout,
    resblock_updown,
    use_fp16,
):
    """The fork's SR model: SRImageModel_Feat (script_util.py:337-389)."""
    del small_size
    if large_size == 512 or large_size == 256:
        channel_mult = (1, 1, 2, 2, 4, 4)
    elif large_size == 64:
        channel_mult = (1, 2, 3, 4)
    elif large_size == 128:
        channel_mult = (1, 1, 2, 3, 4)
    else:
        raise ValueError(f"unsupported large size: {large_size}")
    cfg = UNetConfig(
        image_size=large_size,
        in_channels=6,  # x + img2 concat (unet_other.py:45 doubles in_channels=3)
        model_channels=num_channels,
        out_channels=(3 if not learn_sigma else 6),
        num_res_blocks=num_res_blocks,
        attention_resolutions=parse_attention_resolutions(attention_resolutions, large_size),
        dropout=dropout,
        channel_mult=channel_mult,
        num_classes=(NUM_CLASSES if class_cond else None),
        use_checkpoint=use_checkpoint,
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        resblock_updown=resblock_updown,
    )
    return SRImageModel_Feat(cfg, dtype=_dtype(use_fp16))


def sr_create_model_and_diffusion(
    large_size,
    small_size,
    class_cond,
    learn_sigma,
    num_channels,
    num_res_blocks,
    num_heads,
    num_head_channels,
    num_heads_upsample,
    attention_resolutions,
    dropout,
    diffusion_steps,
    noise_schedule,
    timestep_respacing,
    use_kl,
    predict_xstart,
    rescale_timesteps,
    rescale_learned_sigmas,
    use_checkpoint,
    use_scale_shift_norm,
    resblock_updown,
    use_fp16,
):
    model = sr_create_model(
        large_size,
        small_size,
        num_channels,
        num_res_blocks,
        learn_sigma=learn_sigma,
        class_cond=class_cond,
        use_checkpoint=use_checkpoint,
        attention_resolutions=attention_resolutions,
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        dropout=dropout,
        resblock_updown=resblock_updown,
        use_fp16=use_fp16,
    )
    diffusion = create_gaussian_diffusion(
        steps=diffusion_steps,
        learn_sigma=learn_sigma,
        noise_schedule=noise_schedule,
        use_kl=use_kl,
        predict_xstart=predict_xstart,
        rescale_timesteps=rescale_timesteps,
        rescale_learned_sigmas=rescale_learned_sigmas,
        timestep_respacing=timestep_respacing,
    )
    return model, diffusion


# ---------------------------------------------------------------------------
# CLI glue (script_util.py:433-477)
# ---------------------------------------------------------------------------


def add_dict_to_argparser(parser, default_dict):
    for k, v in default_dict.items():
        v_type = type(v)
        if v is None:
            v_type = str
        elif isinstance(v, bool):
            v_type = str2bool
        parser.add_argument(f"--{k}", default=v, type=v_type)
    parser.add_argument(
        "--config-file", dest="config_file", default=None, type=str,
        help="YAML config overlaid onto parsed args (YAML wins)",
    )
    parser.add_argument(
        "-d", "--description", dest="description", type=str, default="",
        help="free description of the run",
    )


def args_to_dict(args, keys):
    return {k: getattr(args, k) for k in keys}


def resolve_sampler(diffusion, args, *, honor_use_ddim=True):
    """Map a sampling CLI's flags to the diffusion loop function.

    Reference semantics first (`--use_ddim` picks ddim vs ancestral,
    image_sample.py:82-84; super_res_sample ignores it → honor_use_ddim=False),
    then the beyond-reference `--sampler {ancestral,ddim,dpm++2m}` override.
    Shared by all sampling CLIs so new samplers land everywhere at once.
    """
    loop = diffusion.p_sample_loop
    if honor_use_ddim and getattr(args, "use_ddim", False):
        loop = diffusion.ddim_sample_loop
    name = getattr(args, "sampler", "")
    if name:
        samplers = {
            "ancestral": diffusion.p_sample_loop,
            "ddim": diffusion.ddim_sample_loop,
            "dpm++2m": diffusion.dpm_solver_pp_2m_loop,
        }
        if name not in samplers:
            raise SystemExit(f"--sampler {name!r}: choose from {sorted(samplers)}")
        loop = samplers[name]
    return loop


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    elif v.lower() in ("no", "false", "f", "n", "0"):
        return False
    else:
        raise argparse.ArgumentTypeError("boolean value expected")


def parse_yaml(args):
    """Overlay YAML config onto parsed args; list values append
    (script_util.py:465-477). Unlike the reference (which requires the default
    config.yaml file to exist), a missing/None config file is a no-op."""
    cf = getattr(args, "config_file", None)
    if cf:
        if hasattr(cf, "read"):
            data = yaml.load(cf, yaml.SafeLoader)
        else:
            with open(cf) as f:
                data = yaml.load(f, yaml.SafeLoader)
        arg_dict = args.__dict__
        for key, value in (data or {}).items():
            if isinstance(value, list) and isinstance(arg_dict.get(key), list):
                for v in value:
                    arg_dict[key].append(v)
            else:
                arg_dict[key] = value
    if hasattr(args, "config_file"):
        delattr(args, "config_file")
    return args


def load_folder_path_parse(args):
    """Resolve args.model_path from a run-folder fragment + load_file.

    RECONSTRUCTED: the reference imports this from script_util but never ships
    it (SURVEY.md §0.1). Semantics inferred from usage (image_sample.py:27-36,
    image_sample_config.yaml): `-f <fragment>` selects the run directory under
    `{main_path}` whose name contains the fragment; `load_file` (YAML) names
    the checkpoint inside it; the result goes to args.model_path. Returns the
    run folder name for output nesting (`sub_dir_tstsave`).
    """
    fragment = getattr(args, "f", None) or getattr(args, "folder", None)
    main_path = getattr(args, "main_path", None)
    load_file = getattr(args, "load_file", None)
    if not fragment or not main_path:
        return None
    candidates = sorted(
        d for d in os.listdir(main_path)
        if fragment in d and os.path.isdir(os.path.join(main_path, d))
    )
    if not candidates:
        raise FileNotFoundError(f"no run folder matching {fragment!r} under {main_path}")
    folder = candidates[-1]  # latest timestamped run wins
    if load_file:
        args.model_path = os.path.join(main_path, folder, load_file)
    return folder
