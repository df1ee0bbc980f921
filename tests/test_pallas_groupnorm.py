"""Fused GroupNorm kernel parity (interpret mode) vs the XLA composite."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guided_diffusion_clip_tpu.ops.pallas_groupnorm import _gn_reference, group_norm


@pytest.mark.parametrize("silu", [False, True])
@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 64), 32), ((3, 16, 32), 8), ((2, 4, 4, 128), 32)])
def test_forward_parity(shape, groups, silu):
    x = jax.random.normal(jax.random.key(0), shape, dtype=jnp.float32)
    scale = jax.random.normal(jax.random.key(1), (shape[-1],)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.key(2), (shape[-1],)) * 0.1
    ref = _gn_reference(x, scale, bias, groups, 1e-5, silu, None)
    out = group_norm(x, scale, bias, groups=groups, silu=silu, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_scale_shift_parity():
    B, C = 2, 64
    x = jax.random.normal(jax.random.key(3), (B, 8, 8, C))
    scale = jnp.ones((C,)) * 1.1
    bias = jnp.ones((C,)) * 0.1
    ss = jax.random.normal(jax.random.key(4), (B, C)) * 0.2
    sb = jax.random.normal(jax.random.key(5), (B, C)) * 0.2
    ref = _gn_reference(x, scale, bias, 32, 1e-5, True, (ss, sb))
    out = group_norm(
        x, scale, bias, groups=32, silu=True, scale_shift=(ss, sb), impl="pallas_interpret"
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_bf16_roundtrip():
    x = jax.random.normal(jax.random.key(6), (2, 8, 8, 64), dtype=jnp.bfloat16)
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))
    out = group_norm(x, scale, bias, impl="pallas_interpret")
    ref = _gn_reference(x, scale, bias, 32, 1e-5, False, None)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


def test_gradient_via_recompute_vjp():
    x = jax.random.normal(jax.random.key(7), (2, 8, 8, 64))
    scale = jnp.ones((64,)) * 1.3
    bias = jnp.ones((64,)) * 0.2

    def loss_pl(x_, s_, b_):
        return jnp.sum(group_norm(x_, s_, b_, silu=True, impl="pallas_interpret") ** 2)

    def loss_ref(x_, s_, b_):
        return jnp.sum(_gn_reference(x_, s_, b_, 32, 1e-5, True, None) ** 2)

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_uneven_hw_tiling():
    # hw = 36 not a power of two: tile picker must still cover it exactly
    x = jax.random.normal(jax.random.key(8), (2, 6, 6, 64))
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))
    out = group_norm(x, scale, bias, impl="pallas_interpret")
    ref = _gn_reference(x, scale, bias, 32, 1e-5, False, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
