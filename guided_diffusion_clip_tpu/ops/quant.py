"""Dynamic int8 quantized convolution for the sampling fast path.

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197
TOPS), and 256px guided sampling is conv-compute-bound (see
tools/conv_microbench.py: XLA's native bf16 conv already beats any matmul
reformulation, so the only remaining 2x on the table is the int8 datapath).

Scheme (weight-per-output-channel, activation-per-tensor, symmetric):
    w_q[..., o] = round(w[..., o] / s_w[o]),   s_w[o] = max|w[..., o]| / 127
    x_q         = round(x / s_x),              s_x    = max|x| / 127
    y           = conv_s8(x_q, w_q) * (s_x * s_w) + b

Both quantizations are dynamic (computed inside the jitted step); the weight
quantization is loop-invariant in a `lax.scan` denoise chain, so XLA's while
-loop invariant code motion hoists it out of the 250-step loop.

The backward pass is straight-through (gradients computed through the f32
conv with the ORIGINAL weights) so classifier guidance `jax.grad` composes
with a quantized classifier forward.

This is an opt-in path (GDC_CONV_IMPL=int8 / set_conv_impl): default stays
bf16, which is the honest apples-to-apples against the fp16 torch reference
(reference precision policy: guided_diffusion/fp16_util.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def quantize_per_tensor(x: jax.Array):
    """Symmetric per-tensor int8: returns (values s8, scale f32 scalar)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_per_out_channel(w: jax.Array):
    """Symmetric per-output-channel int8 over the last axis of HWIO weights."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=tuple(range(w.ndim - 1)))
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _conv_f32(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        (stride, stride),
        padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _conv_s8(x_q, w_q, stride, padding, *, via_float: bool):
    """s8 x s8 conv with s32 accumulation.

    `via_float` emulates the integer conv in f32 for backends without an s8
    conv (CPU tests). Products fit f32 exactly per-tap (127*127 < 2^24); the
    accumulated sum can exceed 2^24 so this is a test-only path with a small
    tolerance, never the TPU path.
    """
    if via_float:
        return jax.lax.conv_general_dilated(
            x_q.astype(jnp.float32),
            w_q.astype(jnp.float32),
            (stride, stride),
            padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
    return jax.lax.conv_general_dilated(
        x_q,
        w_q,
        (stride, stride),
        padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def int8_conv(x: jax.Array, w: jax.Array, stride: int = 1, padding=((1, 1), (1, 1))):
    """Quantized NHWC conv, dequantized f32 output. Differentiable (STE)."""
    return _int8_conv_fwd_impl(x, w, stride, padding)


def _use_float_emulation() -> bool:
    return jax.default_backend() != "tpu"


def _int8_conv_fwd_impl(x, w, stride, padding):
    x_q, s_x = quantize_per_tensor(x)
    w_q, s_w = quantize_per_out_channel(w)
    acc = _conv_s8(x_q, w_q, stride, padding, via_float=_use_float_emulation())
    return acc * (s_x * s_w)


def _int8_conv_fwd(x, w, stride, padding):
    return _int8_conv_fwd_impl(x, w, stride, padding), (x, w)


def _int8_conv_bwd(stride, padding, res, g):
    x, w = res
    # Straight-through: differentiate the f32 conv at the original (x, w).
    _, vjp = jax.vjp(lambda xx, ww: _conv_f32(xx, ww, stride, padding), x, w)
    dx, dw = vjp(g.astype(jnp.float32))
    return dx.astype(x.dtype), dw.astype(w.dtype)


int8_conv.defvjp(_int8_conv_fwd, _int8_conv_bwd)


# ---------------------------------------------------------------------------
# Pre-quantized conv: consumes the (q, s_img) pair emitted by the fused
# GroupNorm quantize pass (ops/pallas_groupnorm.py). q holds exact integers
# in bf16/f32; the per-image scale is constant over every receptive field,
# so dequantization is one broadcast multiply fused into the conv epilogue.
# This removes the separate amax + quantize HBM passes that ate most of the
# plain int8_conv win (UNet fwd 340ms bf16 -> only 323ms int8-with-passes).
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv_prequant(q, s_img, w, b, stride: int = 1, padding=((1, 1), (1, 1))):
    """y = conv(q, w) * (s_img * s_w) + b, computed in int8 on the MXU.

    q: (B, H, W, C) integer-valued bf16/f32 in [-127, 127] (the quantizing
    GroupNorm's output); s_img: (B,) f32 per-image activation scales (MUST
    be constant over each image: a 3x3 output mixes 9 input pixels, so only
    a receptive-field-constant scale factors out of the contraction); w:
    (k, k, C, K) f32; b: (K,) f32. Output f32.
    """
    return _conv_prequant_impl(q, s_img, w, b, stride, padding)


def _conv_prequant_impl(q, s_img, w, b, stride, padding):
    w_q, s_w = quantize_per_out_channel(w)
    if _use_float_emulation():
        acc = jax.lax.conv_general_dilated(
            q.astype(jnp.float32),
            w_q.astype(jnp.float32),
            (stride, stride),
            padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
    else:
        acc = jax.lax.conv_general_dilated(
            q.astype(jnp.int8),
            w_q,
            (stride, stride),
            padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    # Two rank-1 multiplies, NOT acc * (s_img * s_w): the precomputed (B, K)
    # outer product gets materialized by XLA as a full-size (padded!) f32
    # broadcast operand of the conv fusion (seen in optimized HLO); separate
    # channel and batch scalings stay virtual.
    return acc * s_w * s_img[:, None, None, None] + b


def _conv_prequant_fwd(q, s_img, w, b, stride, padding):
    return _conv_prequant_impl(q, s_img, w, b, stride, padding), (q, s_img, w)


def _conv_prequant_bwd(stride, padding, res, g):
    q, s_img, w = res

    # Straight-through at the original (dequantized) activations and bf16
    # operands (an f32 conv runs at half MXU rate); s_img is stop-gradient.
    def ref(q_, w_, b_):
        x = (q_.astype(jnp.float32) * s_img[:, None, None, None]).astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            x,
            w_,
            (stride, stride),
            padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b_

    # everything bf16 so the transposed convs stay on the full-rate MXU path
    _, vjp = jax.vjp(
        ref, q, w.astype(jnp.bfloat16), jnp.zeros((w.shape[-1],), jnp.bfloat16)
    )
    dq, dw, db = vjp(g.astype(jnp.bfloat16))
    return dq.astype(q.dtype), jnp.zeros_like(s_img), dw.astype(w.dtype), db


conv_prequant.defvjp(_conv_prequant_fwd, _conv_prequant_bwd)


# ---------------------------------------------------------------------------
# 1x1 contractions (ResBlock skip convs, attention qkv/proj): a 1x1 output
# touches exactly ONE input token, so PER-TOKEN activation scales factor out
# of the contraction exactly — no GroupNorm handshake needed, quantization
# is a single fusable row-amax pass over the producer's output.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=())
def matmul_pertoken_int8(x: jax.Array, w: jax.Array, b: jax.Array):
    """y[..., k] = sum_c x[..., c] w[c, k] + b[k] via per-token int8.

    x: (..., C) f32/bf16; w: (C, K) f32; b: (K,) f32. Output in x.dtype.
    """
    return _matmul_pertoken_impl(x, w, b)


def _matmul_pertoken_impl(x, w, b):
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s_tok = jnp.maximum(amax, _EPS) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(xf / s_tok), -127, 127)
    w_q, s_w = quantize_per_out_channel(w)
    if _use_float_emulation():
        acc = jnp.dot(q, w_q.astype(jnp.float32), preferred_element_type=jnp.float32)
    else:
        acc = jnp.dot(
            q.astype(jnp.int8), w_q, preferred_element_type=jnp.int32
        ).astype(jnp.float32)
    return ((acc * (s_tok * s_w)) + b).astype(x.dtype)


def _matmul_pertoken_fwd(x, w, b):
    return _matmul_pertoken_impl(x, w, b), (x, w)


def _matmul_pertoken_bwd(res, g):
    x, w = res

    # Straight-through in bf16 (full-rate MXU backward).
    def ref(x_, w_, b_):
        return jnp.dot(x_, w_) + b_

    _, vjp = jax.vjp(
        ref,
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        jnp.zeros((w.shape[-1],), jnp.bfloat16),
    )
    dx, dw, db = vjp(g.astype(jnp.bfloat16))
    return dx.astype(x.dtype), dw.astype(w.dtype), db.astype(jnp.float32)


matmul_pertoken_int8.defvjp(_matmul_pertoken_fwd, _matmul_pertoken_bwd)
