"""Pallas attention kernel parity (interpret mode on CPU) vs the XLA path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guided_diffusion_clip_tpu.ops.attention import qkv_attention
from guided_diffusion_clip_tpu.ops.pallas_attention import qkv_attention_pallas


@pytest.mark.parametrize("new_order", [False, True])
@pytest.mark.parametrize("B,T,H,d", [(2, 64, 2, 32), (1, 256, 4, 64), (2, 128, 1, 128)])
def test_forward_parity(B, T, H, d, new_order):
    C = H * d
    qkv = jax.random.normal(jax.random.key(0), (B, T, 3 * C), dtype=jnp.float32)
    ref = qkv_attention(qkv, H, new_order=new_order)
    out = qkv_attention_pallas(qkv, H, new_order=new_order, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("new_order", [False, True])
def test_gradient_parity(new_order):
    B, T, H, d = 2, 64, 2, 32
    C = H * d
    qkv = jax.random.normal(jax.random.key(1), (B, T, 3 * C), dtype=jnp.float32)
    tangent = jax.random.normal(jax.random.key(2), (B, T, C), dtype=jnp.float32)

    def loss_ref(x):
        return jnp.sum(qkv_attention(x, H, new_order=new_order) * tangent)

    def loss_pl(x):
        return jnp.sum(
            qkv_attention_pallas(x, H, new_order=new_order, interpret=True) * tangent
        )

    g_ref = jax.grad(loss_ref)(qkv)
    g_pl = jax.grad(loss_pl)(qkv)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_q_tiling_matches_untiled():
    B, T, H, d = 1, 256, 2, 32
    qkv = jax.random.normal(jax.random.key(3), (B, T, 3 * H * d))
    a = qkv_attention_pallas(qkv, H, q_tile=64, interpret=True)
    b = qkv_attention_pallas(qkv, H, q_tile=256, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_bf16_inputs():
    B, T, H, d = 2, 64, 2, 32
    qkv = jax.random.normal(jax.random.key(4), (B, T, 3 * H * d), dtype=jnp.bfloat16)
    ref = qkv_attention(qkv, H)
    out = qkv_attention_pallas(qkv, H, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


def test_dispatcher_selects_xla_on_cpu():
    from guided_diffusion_clip_tpu.ops.attention import attention
    from guided_diffusion_clip_tpu.ops.config import resolve_attention_impl

    assert resolve_attention_impl() in ("xla", "pallas")  # auto resolves
    qkv = jax.random.normal(jax.random.key(5), (1, 16, 3 * 32))
    out = attention(qkv, 2)
    assert out.shape == (1, 16, 32)
