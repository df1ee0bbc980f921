"""FLOP accounting helpers (reference count_flops_attn analog, unet.py:308-325)."""

import jax.numpy as jnp
import numpy as np

from guided_diffusion_clip_tpu.utils.flops import (
    attention_matmul_flops,
    compiled_cost,
    flops_per_step,
)


def test_attention_formula_matches_reference_convention():
    # reference: matmul_ops = 2 * b * (num_spatial ** 2) * c
    assert attention_matmul_flops(4, 64, 128) == 2 * 4 * 64**2 * 128


def test_compiled_cost_counts_matmul_flops():
    a = jnp.zeros((64, 128), jnp.float32)
    b = jnp.zeros((128, 32), jnp.float32)
    cost = compiled_cost(lambda x, y: x @ y, a, b)
    assert "flops" in cost
    # XLA counts 2*M*N*K for a matmul (mul + add)
    expected = 2 * 64 * 128 * 32
    assert abs(cost["flops"] - expected) / expected < 0.25


def test_flops_per_step_on_unet():
    import jax

    from guided_diffusion_clip_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig(
        image_size=8, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1,),
        num_classes=None, num_heads=2,
    )
    model = UNetModel(config=cfg)
    x = jnp.zeros((2, 8, 8, 3))
    t = jnp.zeros((2,))
    params = model.init(jax.random.key(0), x, t)["params"]
    flops = flops_per_step(
        lambda p, xx, tt: model.apply({"params": p}, xx, tt), params, x, t
    )
    assert np.isfinite(flops) and flops > 1e6  # a real forward, not a stub
