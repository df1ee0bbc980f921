"""Interpret-mode parity for the fused Pallas 3x3 conv kernels.

Reference op: torch Conv2d(3x3, padding=1) inside every ResBlock
(reference guided_diffusion/unet.py:203-257); here checked against the XLA
conv on identical (pre-)quantized operands, which the rest of the suite ties
back to the torch reference (tests/test_unet_parity.py, tests/test_quant.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from guided_diffusion_clip_tpu.ops.pallas_conv import (
    fused_conv3x3,
    fused_conv3x3_s8,
    supports_shape,
    supports_shape_s8,
)


def _ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize("shape", [(2, 16, 16, 128, 128), (1, 32, 32, 128, 256)])
@pytest.mark.parametrize("out_dtype", [jnp.float32, jnp.bfloat16])
def test_s8_direct_parity(shape, out_dtype):
    """fused_conv3x3_s8 == s8 conv * s_img * s_w + b, elementwise."""
    B, H, W, C, K = shape
    assert supports_shape_s8(B, H, W, C, K)
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randint(-127, 128, (B, H, W, C)).astype(np.int8))
    s_img = jnp.asarray((rs.rand(B).astype(np.float32) + 0.5) / 127)
    w_q = jnp.asarray(rs.randint(-127, 128, (3, 3, C, K)).astype(np.int8))
    s_w = jnp.asarray((rs.rand(K).astype(np.float32) + 0.5) / 127)
    b = jnp.asarray(rs.randn(K).astype(np.float32))

    y = fused_conv3x3_s8(
        q, s_img, w_q, s_w, b, interpret=True, out_dtype=out_dtype
    )
    assert y.dtype == out_dtype
    ref = (
        _ref_conv(q, w_q) * s_w[None, None, None, :] * s_img[:, None, None, None]
        + b
    )
    tol = 1e-2 if out_dtype == jnp.bfloat16 else 1e-4
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref), rtol=tol, atol=tol * 10
    )


def test_bf16_fused_parity():
    """The requantizing kernel's bf16 mode matches the plain conv closely."""
    B, H, W, C, K = 2, 16, 16, 128, 128
    assert supports_shape(B, H, W, C, K)
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray((rs.randn(3, 3, C, K) * 0.05).astype(np.float32))
    b = jnp.asarray(rs.randn(K).astype(np.float32))
    y = fused_conv3x3(x, w, b, quantized=False, interpret=True)
    ref = _ref_conv(x, w) + b
    # bf16 operands: tolerance scaled to the contraction's bf16 rounding
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref), rtol=0.05, atol=0.3
    )
