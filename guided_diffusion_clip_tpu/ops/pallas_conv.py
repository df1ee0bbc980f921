"""Fused int8 3x3 conv (stride 1, SAME) as a single Pallas kernel.

Why: 256px guided sampling is conv-bound. XLA's bf16 conv runs at 104-138
TF/s on v5e (53-70% of the 197 peak) and its s8 conv at 129-254 of 394; but
a plain `quantize -> s8 conv -> dequantize` HLO chain loses most of the int8
win to unfused elementwise passes (measured: UNet fwd 340ms bf16 -> only
323ms int8). This kernel fuses the whole thing into one HBM-minimal pass:

    read bf16/f32 x band -> per-(image, band) amax -> shifted int8 scratch
    -> 3 aligned [M, 3C] @ [3C, bk] int8 matmuls (MXU, int32 accumulate)
    -> * (s_x * s_w[k]) + bias -> out band

Activation traffic: 2x read of x (adjacent-band halo) + 1x write of y. No
quantized/dequantized tensor ever touches HBM. Activation scales are
per-(image, row-band) — strictly finer than the per-tensor dynamic scales of
the XLA path in ops/quant.py.

Layout ("flat shifted rows"): x is padded to (H + bh) rows x Wp = W+8 cols
(sublane-aligned) and flattened to (H+bh)*Wp rows of C lanes. At the first
k-tile of each band, the kernel quantizes the 2-block halo window ONCE and
writes THREE column-shifted copies (dx = 0,1,2) side by side into a
(2M, 3C) VMEM scratch. A 3x3 conv then collapses to 3 matmuls — one per row
shift dy, each reading the scratch at the ALIGNED offset dy*Wp and
contracting all 3C "input-channel x column-shift" lanes at once. (A naive
9-tap version pays a sublane relayout on 6 of 9 slices, measured 2x slower
than XLA.) Output columns [W, W+8) of each row chunk are wrap-around
garbage, sliced off at the write; the scratch tail past row 2M-2 is stale
but only ever contributes to those garbage columns (bh >= 2 invariant).

Weights are quantized per-output-channel OUTSIDE the kernel (loop-invariant
in a denoise scan -> hoisted once by XLA while-loop LICM) and packed as
w[dy] = stack_dx(w[dy,dx]) on the contraction axis to match the scratch.

Reference op being replaced: torch Conv2d(3x3, padding=1) inside every
ResBlock (reference guided_diffusion/unet.py:203-257).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tiles(B: int, H: int, W: int, C: int, K: int):
    """(nb, bh, bk) under a ~12MB VMEM budget; None if unsupported."""
    if C % 128 or K % 128 or W % 8 or W < 16 or H < 2:
        return None
    bk = min(K, 256)
    Wp = W + 8
    bh = 2
    while bh * Wp < 512 and bh * 2 <= H:
        bh *= 2
    if H % bh:
        return None
    M = bh * Wp
    # VMEM: 2 input specs double-buffered + shifted scratch + weights
    nb = 1
    while (
        nb * 2 <= B
        and B % (nb * 2) == 0
        and 4 * (2 * nb * 2) * M * C * 2 + (nb * 2) * 2 * M * 3 * C <= 8 * 1024 * 1024
    ):
        nb *= 2
    return nb, bh, bk


def _kernel(x0_ref, x1_ref, w_ref, sw_ref, b_ref, o_ref, xq_ref, sx_ref, *,
            bh: int, W: int, quantized: bool):
    """One (batch-tile, row-band, k-tile) grid step.

    x0/x1: (nb, M, C) — adjacent flat row-band blocks, M = bh*(W+8)
    w: (3, 3C, bk) int8/bf16 (dy-major, dx-stacked lanes); sw/b: (1, bk) f32
    o: (nb, bh, W, bk)
    xq: VMEM (nb, 2M, 3C) — persists across the k grid axis
    sx: VMEM (nb, 128) f32 — per-(image, band) activation scales
    """
    k = pl.program_id(2)
    nb = x0_ref.shape[0]
    Wp = W + 8
    M = bh * Wp
    bk = o_ref.shape[-1]
    acc_dtype = jnp.int32 if quantized else jnp.float32

    @pl.when(k == 0)
    def _requantize():
        x0 = x0_ref[...].astype(jnp.float32)
        x1 = x1_ref[...].astype(jnp.float32)
        if quantized:
            amax = jnp.maximum(
                jnp.max(jnp.abs(x0), axis=(1, 2)),
                jnp.max(jnp.abs(x1), axis=(1, 2)),
            )
            s = jnp.maximum(amax, 1e-8) / 127.0
            sx_ref[...] = jnp.broadcast_to(s[:, None], sx_ref.shape)
            inv = (1.0 / s)[:, None, None]
            q0 = jnp.clip(jnp.round(x0 * inv), -127, 127).astype(xq_ref.dtype)
            q1 = jnp.clip(jnp.round(x1 * inv), -127, 127).astype(xq_ref.dtype)
        else:
            q0 = x0.astype(xq_ref.dtype)
            q1 = x1.astype(xq_ref.dtype)
        C = q0.shape[-1]
        for dx in range(3):
            col = pl.dslice(dx * C, C)
            if dx == 0:
                xq_ref[:, 0:M, col] = q0
                xq_ref[:, M : 2 * M, col] = q1
            else:
                # shifted copy: xq[j] = (q0 || q1)[j + dx]; stale tail rows
                # >= 2M - dx only feed wrap-around garbage columns.
                xq_ref[:, 0 : M - dx, col] = q0[:, dx:M, :]
                xq_ref[:, M - dx : M, col] = q1[:, 0:dx, :]
                xq_ref[:, M : 2 * M - dx, col] = q1[:, dx:M, :]

    for n in range(nb):
        acc = jnp.zeros((M, bk), acc_dtype)
        for dy in range(3):
            acc = acc + jax.lax.dot_general(
                xq_ref[n, dy * Wp : dy * Wp + M, :],
                w_ref[dy],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
        accf = acc.astype(jnp.float32)
        if quantized:
            accf = accf * (sx_ref[n, 0] * sw_ref[0][None, :])
        accf = accf + b_ref[0][None, :]
        y = accf.reshape(bh, Wp, bk)[:, :W, :]
        o_ref[n] = y.astype(o_ref.dtype)


def fused_conv3x3(
    x: jax.Array,
    w: jax.Array,
    bias: jax.Array | None = None,
    *,
    quantized: bool = True,
    interpret: bool = False,
):
    """y = conv3x3_same(x, w) + bias in one fused pass; NHWC/HWIO.

    x: (B, H, W, C); w: (3, 3, C, K) f32; bias: (K,) or None. Returns
    (B, H, W, K) in x.dtype. Check `supports_shape` before calling.
    """
    B, H, W, C = x.shape
    K = w.shape[-1]
    tiles = _pick_tiles(B, H, W, C, K)
    assert tiles is not None, f"unsupported fused-conv shape {x.shape}->{K}"
    nb, bh, bk = tiles

    wf = w.astype(jnp.float32)
    if quantized:
        amax = jnp.max(jnp.abs(wf), axis=(0, 1, 2))
        s_w = jnp.maximum(amax, 1e-8) / 127.0
        w_in = jnp.clip(jnp.round(wf / s_w), -127, 127).astype(jnp.int8)
    else:
        s_w = jnp.ones((K,), jnp.float32)
        w_in = wf.astype(jnp.bfloat16)
    # (3, 3, C, K) -> (3_dy, 3_dx * C, K): dx-major stacking on the
    # contraction axis, matching the scratch's [shift0 | shift1 | shift2]
    w_in = w_in.reshape(3, 3 * C, K)
    b_in = (
        bias.astype(jnp.float32) if bias is not None else jnp.zeros((K,), jnp.float32)
    ).reshape(1, K)
    s_w = s_w.reshape(1, K)

    # 1 pad row on top (dy=0 tap), bh-1 below (so band i+1 exists for the
    # last band's halo); columns padded 1 left / 7 right: padded width W+8
    # keeps every flat row chunk sublane-aligned.
    xp = jnp.pad(x, ((0, 0), (1, bh - 1), (1, 7), (0, 0)))
    Wp = W + 8
    flat = xp.reshape(B, (H + bh) * Wp, C)

    M = bh * Wp
    grid = (B // nb, H // bh, K // bk)

    return pl.pallas_call(
        functools.partial(_kernel, bh=bh, W=W, quantized=quantized),
        out_shape=jax.ShapeDtypeStruct((B, H, W, K), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, M, C), lambda b, i, k: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, M, C), lambda b, i, k: (b, i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3 * C, bk), lambda b, i, k: (0, 0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda b, i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda b, i, k: (0, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb, bh, W, bk), lambda b, i, k: (b, i, 0, k), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((nb, 2 * M, 3 * C), jnp.int8 if quantized else jnp.bfloat16),
            pltpu.VMEM((nb, 128), jnp.float32),
        ],
        interpret=interpret,
    )(flat, flat, w_in, s_w, b_in)


def supports_shape(B: int, H: int, W: int, C: int, K: int) -> bool:
    return _pick_tiles(B, H, W, C, K) is not None


# ---------------------------------------------------------------------------
# s8-direct variant: input is ALREADY int8 (the quantizing GroupNorm emits
# s8 + per-image scales, ops/pallas_groupnorm.py / models/nn.py), so the
# whole in-kernel quantize pass above disappears — the k==0 stage is pure
# s8 copies into the shifted scratch, and the dots run straight off it.
# Motivation: tools/pallas_mxu_ceiling.py measures Mosaic s8 dots at 344.7
# TF/s (87.5% of peak) while XLA's s8 conv reaches only 157.6 TF/s at the
# dominant ds1 shape; the original fused kernel's ~100 TF/s was its
# requantize overhead, not a Mosaic limit. NOTE: int8 elementwise VPU ops
# fail Mosaic compilation on v5e — this kernel only copies/slices s8 and
# feeds the MXU; all arithmetic is s32/f32.
# ---------------------------------------------------------------------------


def _pick_tiles_s8(B: int, H: int, W: int, C: int, K: int):
    """(nb, bh, bk) for the s8-direct kernel; None if unsupported.

    Larger row bands than the requantizing kernel (target M ~ 1k sublanes):
    with no quantize pass the dots dominate, and a bigger M amortizes the
    per-band weight reload and MXU pipeline fill. Env overrides for tuning:
    GDC_PCONV_BH / GDC_PCONV_NB / GDC_PCONV_BK.
    """
    import os

    if C % 128 or K % 128 or W % 8 or W < 16 or H < 2:
        return None
    bk = int(os.environ.get("GDC_PCONV_BK", 0)) or min(K, 256)
    if K % bk:
        return None
    # Wp % 32 == 0: int8 sublane granularity is 32, so every dy*Wp scratch
    # offset (and the flat-row blocks themselves) stays aligned — misaligned
    # s8 sublane slices force Mosaic relayouts (measured: dots at 164 vs 283+
    # TF/s, copies ~2x slower).
    Wp = ((W + 1 + 31) // 32) * 32
    bh = int(os.environ.get("GDC_PCONV_BH", 0))
    if not bh:
        bh = 2
        while bh * Wp < 1024 and bh * 2 <= H:
            bh *= 2
    if H % bh or bh < 2:
        return None
    M = bh * Wp
    nb = int(os.environ.get("GDC_PCONV_NB", 0)) or 1
    if B % nb:
        return None
    # VMEM: 2 double-buffered s8 input blocks + s8 scratch + s8 weights + f32 out
    vmem = 2 * 2 * nb * M * C + nb * (M + 2 * Wp + 8) * 3 * C + 3 * 3 * C * bk + nb * M * bk * 4
    if vmem > 12 * 1024 * 1024:
        return None
    return nb, bh, bk


def _kernel_s8(x0_ref, x1_ref, w_ref, sw_ref, b_ref, simg_ref, o_ref, xq_ref, *,
               bh: int, W: int, mode: str = "full"):
    """One (batch-tile, row-band, k-tile) step; all-s8 datapath.

    x0/x1: (nb, M, C) s8 — adjacent flat row-band blocks, M = bh*(W+8)
    w: (3, 3C, bk) s8 (dy-major, dx-stacked lanes); sw/b: (1, bk) f32
    simg: (nb, 1, 128) f32 per-image activation scales
    o: (nb, bh, W, bk) f32/bf16; xq: VMEM (nb, Mq, 3C) s8, persists across k.
    Mq = M + 2*Wp + 8: the dots only read rows [dy*Wp, dy*Wp + M), dy <= 2,
    so staging 2M rows (the whole next band) would be ~2x wasted copy
    traffic; only the 2-row halo tail of the next band is staged.

    mode: "full" | "copies" (skip dots — perf diagnosis) | "dots" (skip
    staging — reads stale scratch; timing only, wrong results).
    """
    k = pl.program_id(2)
    nb = x0_ref.shape[0]
    Wp = ((W + 1 + 31) // 32) * 32
    M = bh * Wp
    T = 2 * Wp + 8  # halo tail rows staged from the next band (>= 2*Wp+2)
    bk = o_ref.shape[-1]

    if mode != "dots":
        @pl.when(k == 0)
        def _stage():
            q0 = x0_ref[...]
            q1 = x1_ref[:, 0:T, :]
            C = q0.shape[-1]
            for dx in range(3):
                col = pl.dslice(dx * C, C)
                if dx == 0:
                    xq_ref[:, 0:M, col] = q0
                    xq_ref[:, M : M + T, col] = q1
                else:
                    xq_ref[:, 0 : M - dx, col] = q0[:, dx:M, :]
                    xq_ref[:, M - dx : M, col] = q1[:, 0:dx, :]
                    xq_ref[:, M : M + T - dx, col] = q1[:, dx:T, :]

    if mode == "copies":
        for n in range(nb):
            accf = xq_ref[n, 0:M, 0:bk].astype(jnp.float32)
            accf = accf * (simg_ref[n, 0, 0] * sw_ref[0][None, :]) + b_ref[0][None, :]
            o_ref[n] = accf.reshape(bh, Wp, bk)[:, :W, :].astype(o_ref.dtype)
        return

    for n in range(nb):
        acc = jnp.zeros((M, bk), jnp.int32)
        for dy in range(3):
            acc = acc + jax.lax.dot_general(
                xq_ref[n, dy * Wp : dy * Wp + M, :],
                w_ref[dy],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        accf = acc.astype(jnp.float32) * (simg_ref[n, 0, 0] * sw_ref[0][None, :])
        accf = accf + b_ref[0][None, :]
        o_ref[n] = accf.reshape(bh, Wp, bk)[:, :W, :].astype(o_ref.dtype)


def fused_conv3x3_s8(
    q: jax.Array,
    s_img: jax.Array,
    w_q: jax.Array,
    s_w: jax.Array,
    bias: jax.Array | None = None,
    *,
    interpret: bool = False,
    mode: str = "full",
    out_dtype=jnp.float32,
):
    """y = conv3x3_same(q, w_q) * (s_img * s_w) + bias, all-int8 MXU path.

    q: (B, H, W, C) int8 (a quantizing GroupNorm's s8 output); s_img: (B,)
    f32 per-image activation scales; w_q: (3, 3, C, K) int8 per-out-channel
    quantized weights; s_w: (K,) f32; bias: (K,) f32 or None. Returns f32.
    Check `supports_shape_s8` first. Replaces the reference's fp16 Conv2d
    (reference guided_diffusion/unet.py:203-257) on the sampling fast path.
    """
    B, H, W, C = q.shape
    K = w_q.shape[-1]
    tiles = _pick_tiles_s8(B, H, W, C, K)
    assert tiles is not None, f"unsupported s8 fused-conv shape {q.shape}->{K}"
    nb, bh, bk = tiles

    w_in = w_q.reshape(3, 3 * C, K)
    b_in = (
        bias.astype(jnp.float32) if bias is not None else jnp.zeros((K,), jnp.float32)
    ).reshape(1, K)
    sw_in = s_w.astype(jnp.float32).reshape(1, K)
    simg_in = jnp.broadcast_to(
        s_img.astype(jnp.float32)[:, None, None], (B, 1, 128)
    )

    Wp = ((W + 1 + 31) // 32) * 32
    xp = jnp.pad(q, ((0, 0), (1, bh - 1), (1, Wp - W - 1), (0, 0)))
    flat = xp.reshape(B, (H + bh) * Wp, C)

    M = bh * Wp
    grid = (B // nb, H // bh, K // bk)

    return pl.pallas_call(
        functools.partial(_kernel_s8, bh=bh, W=W, mode=mode),
        out_shape=jax.ShapeDtypeStruct((B, H, W, K), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, M, C), lambda b, i, k: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, M, C), lambda b, i, k: (b, i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3 * C, bk), lambda b, i, k: (0, 0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda b, i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda b, i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1, 128), lambda b, i, k: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb, bh, W, bk), lambda b, i, k: (b, i, 0, k), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((nb, M + 2 * Wp + 8, 3 * C), jnp.int8),
        ],
        interpret=interpret,
    )(flat, flat, w_in, sw_in, b_in, simg_in)


def supports_shape_s8(B: int, H: int, W: int, C: int, K: int) -> bool:
    return _pick_tiles_s8(B, H, W, C, K) is not None
