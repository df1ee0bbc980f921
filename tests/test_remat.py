"""use_checkpoint (rematerialization) must not change values or gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guided_diffusion_clip_tpu.models.unet import UNetConfig, UNetModel


def make(use_checkpoint):
    cfg = UNetConfig(
        image_size=16, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(4,), channel_mult=(1, 2),
        num_heads=2, use_scale_shift_norm=True, use_checkpoint=use_checkpoint,
    )
    return UNetModel(config=cfg)


@pytest.mark.slow
def test_remat_value_and_grad_parity():
    m0, m1 = make(False), make(True)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    t = jnp.array([3.0, 7.0])
    params = m0.init(jax.random.key(1), x, t)["params"]

    y0 = m0.apply({"params": params}, x, t)
    y1 = m1.apply({"params": params}, x, t)  # same params work (same names)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-6)

    def loss(m):
        def f(p):
            return jnp.sum(m.apply({"params": p}, x, t) ** 2)

        return f

    g0 = jax.grad(loss(m0))(params)
    g1 = jax.grad(loss(m1))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
