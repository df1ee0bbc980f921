"""Fused QKV self-attention as a Pallas TPU kernel.

Replaces the two HBM-materialized einsums of the XLA path
(ops/attention.py) with one VMEM-resident kernel per (batch*head, q-tile):
logits, f32 softmax, and the value matmul never touch HBM. ADM token counts
are <=4096 (SURVEY.md §5.7), so K/V for one bh-slice always fit VMEM and no
online-softmax recurrence is needed — a single-block flash kernel is
speed-of-light here (both matmuls hit the MXU; softmax rides the VPU).

Numerics contract preserved: q and k pre-scaled by d^-1/4, softmax in f32
(reference unet.py:348-352), bf16 in/out supported.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import merge_heads, split_qkv


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (Tq, d)
    k = k_ref[0]  # (T, d)
    v = v_ref[0]  # (T, d)
    logits = jax.lax.dot_general(
        (q * scale).astype(q.dtype),
        (k * scale).astype(k.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Tq, T) f32
    weights = jax.nn.softmax(logits, axis=-1)
    out = jax.lax.dot_general(
        weights.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale: float):
    """Recompute-style backward for one (bh, q-tile):
    dV += P^T dO;  dS = P o (dP - rowsum(dP o P));  dq = dS k s^2;  dK += dS^T q s^2.
    dK/dV blocks are revisited across q-tiles (sequential TPU grid) and
    accumulated in f32.
    """
    i = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)

    logits = jax.lax.dot_general(
        q * scale, k * scale,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = jax.nn.softmax(logits, axis=-1)  # (Tq, T) f32

    @pl.when(i == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dv_ref[0] += jax.lax.dot_general(
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq_ref[0] = (
        jax.lax.dot_general(
            ds, k.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * (scale * scale)
    ).astype(dq_ref.dtype)
    dk_ref[0] += (
        jax.lax.dot_general(
            ds, q.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * (scale * scale)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_bhtd(q, k, v, q_tile: int, interpret: bool = False):
    """(BH, T, d) q/k/v -> (BH, T, d) attention output."""
    BH, T, d = q.shape
    scale = 1.0 / math.sqrt(math.sqrt(d))
    grid = (BH, T // q_tile)

    kernel = functools.partial(_attn_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BH, T, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * T * T * d,
            bytes_accessed=4 * BH * T * d * q.dtype.itemsize,
            transcendentals=BH * T * T,
        ),
        interpret=interpret,
    )(q, k, v)


def _flash_fwd(q, k, v, q_tile, interpret):
    return _flash_bhtd(q, k, v, q_tile, interpret), (q, k, v)


def _flash_bwd(q_tile, interpret, res, do):
    q, k, v = res
    BH, T, d = q.shape
    scale = 1.0 / math.sqrt(math.sqrt(d))
    grid = (BH, T // q_tile)

    kernel = functools.partial(_attn_bwd_kernel, scale=scale)
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((BH, T, d), q.dtype),
            jax.ShapeDtypeStruct((BH, T, d), jnp.float32),
            jax.ShapeDtypeStruct((BH, T, d), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, q_tile, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=11 * BH * T * T * d,
            bytes_accessed=8 * BH * T * d * q.dtype.itemsize,
            transcendentals=BH * T * T,
        ),
        interpret=interpret,
    )(q, k, v, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


_flash_bhtd.defvjp(_flash_fwd, _flash_bwd)


def qkv_attention_pallas(
    qkv: jax.Array,
    num_heads: int,
    *,
    new_order: bool = False,
    q_tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for ops.attention.qkv_attention.

    (B, T, 3C) -> (B, T, C). Head split happens in XLA (fuses with the qkv
    projection); the attention itself is the Pallas kernel.
    """
    B, T, W = qkv.shape
    q, k, v = split_qkv(qkv, num_heads, new_order)  # (B, T, H, d)
    d = q.shape[-1]

    def to_bhtd(x):
        return x.transpose(0, 2, 1, 3).reshape(B * num_heads, T, d)

    # pick a q tile that divides T (tokens are powers of two at ADM configs)
    qt = min(q_tile, T)
    while T % qt:
        qt //= 2
    out = _flash_bhtd(to_bhtd(q), to_bhtd(k), to_bhtd(v), max(qt, 1), interpret)
    out = out.reshape(B, num_heads, T, d).transpose(0, 2, 1, 3)
    return merge_heads(out)
