"""TPU-native guided-diffusion framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
ErezYosef/guided-diffusion-clip (OpenAI ADM guided-diffusion + CLIP-embedding
conditioning): ADM UNet training/sampling at 64-512px, learned-sigma hybrid
losses, timestep respacing + DDIM, classifier & CLIP guidance via jax.grad,
cascaded super-resolution, EMA/bf16 training, and data parallelism over a
jax.sharding.Mesh.

Design notes (TPU-first, not a port):
  - diffusion math lives in pure functions over a `DiffusionSchedule` pytree
    of per-timestep coefficient tables (computed host-side in float64,
    frozen to f32 device constants).
  - sampling loops are single `lax.scan`s with threaded PRNG keys.
  - models are flax.linen modules in NHWC with bf16 compute / f32 params;
    GroupNorm and attention softmax stay f32 (matching the reference's
    GroupNorm32 / fp32-softmax numerics contracts).
  - parallelism is jit + NamedSharding over a Mesh; XLA inserts collectives.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (avoids importing jax at package-import time)."""
    api = {
        "Diffusion": ("guided_diffusion_clip_tpu.diffusion.api", "Diffusion"),
        "DiffusionSchedule": ("guided_diffusion_clip_tpu.diffusion.schedules", "DiffusionSchedule"),
        "UNetModel": ("guided_diffusion_clip_tpu.models.unet", "UNetModel"),
        "UNetConfig": ("guided_diffusion_clip_tpu.models.unet", "UNetConfig"),
        "EncoderUNetModel": ("guided_diffusion_clip_tpu.models.unet", "EncoderUNetModel"),
        "create_model_and_diffusion": ("guided_diffusion_clip_tpu.utils.script_util", "create_model_and_diffusion"),
        "create_gaussian_diffusion": ("guided_diffusion_clip_tpu.utils.script_util", "create_gaussian_diffusion"),
        "load_data": ("guided_diffusion_clip_tpu.data.image_datasets", "load_data"),
        "TrainLoop": ("guided_diffusion_clip_tpu.training.train_loop", "TrainLoop"),
    }
    if name in api:
        import importlib

        module, attr = api[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
