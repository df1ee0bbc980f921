"""NN primitives with the exact numerics contracts the ADM checkpoints depend on.

Reference behavior: guided_diffusion/nn.py. The contracts that matter for
checkpoint parity (SURVEY.md §7 "hard parts"):
  - GroupNorm computes in f32 and casts back (GroupNorm32, nn.py:17-19),
    32 groups (nn.py:93-100).
  - zero-initialized output convs/projections (nn.py:68-74).
  - sinusoidal timestep embedding with max_period=1e4 and [cos, sin] channel
    order (nn.py:103-122).

Everything is NHWC flax.linen; params are f32, compute dtype is configurable
(bf16 torso on TPU — the loss-scale-free replacement for fp16_util.py).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

zero_init = nn.initializers.zeros


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal embeddings, [cos, sin] order (reference nn.py:103-122).

    `timesteps` may be fractional (rescaled respacing). Computed in f32.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding


class GroupNorm32(nn.Module):
    """GroupNorm over the channel (last) axis, computed in f32 (nn.py:17-19).

    Matches torch.nn.GroupNorm semantics: groups partition channels, mean/var
    over (spatial, channels-within-group), eps 1e-5. Output cast back to the
    input dtype so a bf16 torso keeps its dtype across the norm.

    Optionally fuses the reference's surrounding elementwise work into the
    same memory passes (Pallas on TPU, XLA composite elsewhere): SiLU
    activation and the adaGN scale-shift GN(h)*(1+s)+b (unet.py:248-251).
    """

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        activation: str | None = None,
        scale_shift=None,
        quantize: bool = False,
    ):
        from ..ops.pallas_groupnorm import group_norm

        C = x.shape[-1]
        groups = min(self.num_groups, C)
        assert C % groups == 0, f"channels {C} not divisible by {groups} groups"
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)

        from ..ops.config import resolve_groupnorm_impl

        hw = 1
        for s in x.shape[1:-1]:
            hw *= s
        impl = resolve_groupnorm_impl(quantize=quantize)
        if impl == "pallas" and hw * C < 1 << 16:
            impl = "xla"  # tiny maps: no kernel win
        from ..parallel import sp, tp

        if impl == "pallas" and (sp.active() or tp.active()):
            # GSPMD can only replicate an opaque pallas_call; the XLA
            # composite partitions (H-sharded stats become AllReduces).
            impl = "xla"
        if scale_shift is not None:
            ss, sb = scale_shift
            scale_shift = (
                ss.reshape(x.shape[0], C).astype(jnp.float32),
                sb.reshape(x.shape[0], C).astype(jnp.float32),
            )
        from ..ops.config import resolve_int8_emit

        return group_norm(
            x, scale, bias,
            groups=groups, eps=self.epsilon,
            silu=(activation == "silu"), scale_shift=scale_shift, impl=impl,
            quantize_out=quantize,
            emit=resolve_int8_emit() if quantize else "bf16",
        )


def normalization(num_groups: int = 32) -> GroupNorm32:
    return GroupNorm32(num_groups=num_groups)


class _QuantConvCore(nn.Module):
    """Param-tree-compatible stand-in for nn.Conv running ops.quant.int8_conv.

    Declares the same {kernel, bias} params (f32, HWIO) under the same module
    name as the nn.Conv it replaces, so checkpoints round-trip identically
    between the bf16 and int8 conv paths.
    """

    features: int
    kernel_size: int
    stride: int
    zero: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, prequant_scales: jax.Array | None = None) -> jax.Array:
        from ..ops.quant import conv_prequant, int8_conv, matmul_pertoken_int8

        init = zero_init if self.zero else nn.initializers.lecun_normal()
        k = self.kernel_size
        kernel = self.param("kernel", init, (k, k, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        p = (k - 1) // 2
        if prequant_scales is not None:
            # x is the (q, s_img) handshake from a quantizing GroupNorm: the
            # dequant scale + bias fuse into the conv epilogue. q may be
            # integer-valued bf16/f32 (autodiff handshake) or real s8
            # (inference emission) — output dtype is the module compute dtype.
            y = conv_prequant(
                x, prequant_scales, kernel, bias, self.stride, ((p, p), (p, p))
            )
            return y.astype(self.dtype)
        # NB: a per-token matmul path for 1x1 convs (ops.quant.
        # matmul_pertoken_int8) was measured on v5e and LOST ~14ms of step
        # time vs this per-tensor path (386.7 vs 372 ms) — the extra row
        # -amax + outer-product dequant did not fuse as hoped. Kept as an
        # exported op; not dispatched here.
        del matmul_pertoken_int8
        y = int8_conv(x, kernel, self.stride, ((p, p), (p, p)))
        return (y + bias).astype(x.dtype)


class Conv(nn.Module):
    """3x3/1x1 conv in NHWC with optional zero init (the `zero_module` contract)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    zero: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, prequant_scales: jax.Array | None = None) -> jax.Array:
        from ..ops.config import resolve_conv_impl

        if prequant_scales is not None:
            return _QuantConvCore(
                features=self.features,
                kernel_size=self.kernel_size,
                stride=self.stride,
                zero=self.zero,
                dtype=self.dtype,
                name="conv",
            )(x, prequant_scales)
        if resolve_conv_impl() == "int8":
            return _QuantConvCore(
                features=self.features,
                kernel_size=self.kernel_size,
                stride=self.stride,
                zero=self.zero,
                dtype=self.dtype,
                name="conv",
            )(x)
        init = zero_init if self.zero else nn.initializers.lecun_normal()
        bias_init = nn.initializers.zeros
        # Explicit symmetric padding (k-1)//2 on both sides, matching torch
        # Conv2d(padding=1). XLA's "SAME" pads (0, 1) for stride 2, which
        # shifts strided-conv windows off the reference's by one pixel.
        p = (self.kernel_size - 1) // 2
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            kernel_init=init,
            bias_init=bias_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


class Dense(nn.Module):
    """Linear layer; `zero` gives the zero_module contract.

    `quant_ok=True` marks projections that may run on the int8 MXU datapath
    under GDC_CONV_IMPL=int8 (attention qkv/proj_out — per-token scales are
    exact for a channel contraction). The timestep-embedding MLPs keep it
    False: they are tiny and contractually f32 (reference fp16_util converts
    convs only).
    """

    features: int
    zero: bool = False
    dtype: Dtype = jnp.float32
    quant_ok: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.config import resolve_conv_impl

        init = zero_init if self.zero else nn.initializers.lecun_normal()
        if self.quant_ok and resolve_conv_impl() == "int8":
            from ..ops.quant import matmul_pertoken_int8

            return _QuantDenseCore(
                features=self.features, zero=self.zero, name="dense"
            )(x)
        return nn.Dense(
            self.features,
            kernel_init=init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="dense",
        )(x)


class _QuantDenseCore(nn.Module):
    """Param-tree-compatible stand-in for nn.Dense on the int8 path."""

    features: int
    zero: bool

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.quant import matmul_pertoken_int8

        init = zero_init if self.zero else nn.initializers.lecun_normal()
        kernel = self.param("kernel", init, (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return matmul_pertoken_int8(x, kernel, bias)


def silu(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)


def avg_pool_2x(x: jax.Array) -> jax.Array:
    """2x2 stride-2 average pool (reference Downsample avg_pool_nd path)."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Exact nearest-x2 (reference F.interpolate(scale_factor=2, mode="nearest"))."""
    B, H, W, C = x.shape
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


def bilinear_resize(x: jax.Array, new_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize with half-pixel centers.

    Matches torch F.interpolate(mode="bilinear", align_corners=False), which
    is what SuperResModel uses to upsample low_res (unet.py:679).
    """
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, new_hw[0], new_hw[1], C), method="linear")
