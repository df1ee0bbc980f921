"""Fused GroupNorm(+scale-shift)(+SiLU) as two bandwidth-optimal Pallas passes.

XLA's lowering of the reference GroupNorm32 pattern (convert to f32, reduce
mean/var over strided group axes, normalize, affine, SiLU) measured ~5x off
the HBM roofline on v5e (convert_reduce fusions re-materializing the f32
tensor). This kernel does the theoretical minimum:

  pass 1 (stats):  one bf16 read  -> per-(batch, channel) f32 sums s1/s2
  (tiny jnp math:  group-combine sums; fold gamma/beta and the adaGN
                   scale-shift (unet.py:248-251) into ONE per-(B,C) affine)
  pass 2 (apply):  one bf16 read -> y = [silu](x*a + b) -> one bf16 write

Statistics are f32 (GroupNorm32 contract, nn.py:17-19). Backward falls back
to jax.vjp of the XLA composite (recompute) via custom_vjp — gradients are
exactly the reference math; the Pallas path accelerates inference/sampling
and the forward of training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, s1_ref, s2_ref):
    i = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)  # (thw, C)

    @pl.when(i == 0)
    def _():
        s1_ref[0] = jnp.zeros_like(s1_ref[0])
        s2_ref[0] = jnp.zeros_like(s2_ref[0])

    s1_ref[0] += jnp.sum(x, axis=0, keepdims=True)
    s2_ref[0] += jnp.sum(x * x, axis=0, keepdims=True)


def _apply_kernel(x_ref, a_ref, b_ref, o_ref, *, silu: bool):
    x = x_ref[0].astype(jnp.float32)
    y = x * a_ref[0] + b_ref[0]
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _stats_minmax_kernel(x_ref, s1_ref, s2_ref, mn_ref, mx_ref):
    """Stats pass for the quantizing GN: sums AND per-(B, C) extremes.

    The folded apply is y_c = a_c * x + b_c — affine in RAW x — so per-image
    max|y| (the exact int8 scale) follows from the channel min/max of x with
    no extra pass over the data.
    """
    i = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)

    @pl.when(i == 0)
    def _():
        s1_ref[0] = jnp.zeros_like(s1_ref[0])
        s2_ref[0] = jnp.zeros_like(s2_ref[0])
        mn_ref[0] = jnp.full_like(mn_ref[0], jnp.inf)
        mx_ref[0] = jnp.full_like(mx_ref[0], -jnp.inf)

    s1_ref[0] += jnp.sum(x, axis=0, keepdims=True)
    s2_ref[0] += jnp.sum(x * x, axis=0, keepdims=True)
    mn_ref[0] = jnp.minimum(mn_ref[0], jnp.min(x, axis=0, keepdims=True))
    mx_ref[0] = jnp.maximum(mx_ref[0], jnp.max(x, axis=0, keepdims=True))


def _apply_quant_kernel(x_ref, a_ref, b_ref, inv_ref, q_ref, *, silu: bool):
    """Apply pass that also emits per-IMAGE int8 quantization for the 3x3
    conv that follows every GN+SiLU in a ResBlock.

    The scale must be constant across the conv's receptive field to factor
    out of the contraction (a 3x3 output mixes 9 input pixels), so it is
    per-image — computed OUTSIDE the kernel, exactly, from the stats pass's
    channel min/max (see _stats_minmax_kernel / _bound_scale). q is written
    as EXACT integers in bf16 (|q| <= 127 < 2^8 mantissa): autodiff-friendly,
    same HBM cost as the normal bf16 output, lossless int8 cast downstream.
    """
    x = x_ref[0].astype(jnp.float32)
    y = x * a_ref[0] + b_ref[0]
    if silu:
        y = y * jax.nn.sigmoid(y)
    q = jnp.clip(jnp.round(y * inv_ref[0, 0, 0]), -127.0, 127.0)
    q_ref[0] = q.astype(q_ref.dtype)


def _bound_scale(a, b, xmin, xmax, silu: bool):
    """Exact per-image int8 scale: (s, 1/s), both (B,).

    max|y_c| = max(|a_c xmax_c + b_c|, |a_c xmin_c + b_c|) since y is affine
    in raw x; SiLU only shrinks magnitudes except for its -0.2785 floor.
    """
    hi = jnp.abs(a * xmax + b)
    lo = jnp.abs(a * xmin + b)
    bound = jnp.max(jnp.maximum(hi, lo), axis=-1)
    if silu:
        bound = jnp.maximum(bound, 0.2785)
    s = jnp.maximum(bound, 1e-6) * (1.0 / 127.0)
    return s, 1.0 / s


def _pick_tile(hw: int, c: int, itemsize: int, budget_bytes: int = 2 * 1024 * 1024) -> int:
    tile = max(budget_bytes // (c * itemsize), 8)
    tile = min(tile, hw)
    while hw % tile:
        tile -= 1
    return tile


def _gn_reference(x, scale, bias, groups, eps, silu, scale_shift):
    """The XLA composite (exact reference math) — also the VJP path.

    Variance via one-pass sums (E[x^2] - mean^2, same formulation as the
    Pallas stats kernel): `.var()` lowers to a second reduction that depends
    on the mean, forcing XLA into two sequential full reads of x; sibling
    independent reduces fuse into ONE read.
    """
    orig_dtype = x.dtype
    B = x.shape[0]
    C = x.shape[-1]
    xf = x.astype(jnp.float32)
    spatial = xf.shape[1:-1]
    xg = xf.reshape(B, *spatial, groups, C // groups)
    axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    n = 1
    for a in axes:
        n *= xg.shape[a]
    s1 = jnp.sum(xg, axis=axes, keepdims=True)
    s2 = jnp.sum(xg * xg, axis=axes, keepdims=True)
    mean = s1 / n
    var = s2 / n - mean * mean
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = xg.reshape(xf.shape) * scale + bias
    if scale_shift is not None:
        ss, sb = scale_shift
        y = y * (1.0 + ss.reshape(B, *(1,) * len(spatial), C)) + sb.reshape(
            B, *(1,) * len(spatial), C
        )
    if silu:
        y = jax.nn.silu(y)
    return y.astype(orig_dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 7)
)
def fused_group_norm(x, scale, bias, groups, eps, silu, scale_shift, interpret):
    """x: (B, *spatial, C); scale/bias: (C,); scale_shift: None or ((B,C),(B,C)).

    Returns [silu]((GN(x)*scale+bias)[*(1+ss)+sb]) with one read for stats and
    one read+write for apply.
    """
    orig_shape = x.shape
    B, C = x.shape[0], x.shape[-1]
    hw = 1
    for s in x.shape[1:-1]:
        hw *= s
    xf = x.reshape(B, hw, C)
    thw = _pick_tile(hw, C, xf.dtype.itemsize)
    grid = (B, hw // thw)

    s1, s2 = pl.pallas_call(
        _stats_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ),
        grid=grid,
        in_specs=[pl.BlockSpec((1, thw, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(xf)

    # group-combine + affine folding: all (B, C)-sized math, negligible
    n = hw * (C // groups)
    g1 = s1.reshape(B, groups, C // groups).sum(-1)  # (B, G)
    g2 = s2.reshape(B, groups, C // groups).sum(-1)
    mean = g1 / n
    var = g2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)  # (B, G)
    invc = jnp.repeat(inv, C // groups, axis=1)  # (B, C)
    meanc = jnp.repeat(mean, C // groups, axis=1)
    a = invc * scale[None, :]
    b = bias[None, :] - meanc * a
    if scale_shift is not None:
        ss, sb = scale_shift
        a = a * (1.0 + ss)
        b = b * (1.0 + ss) + sb

    out = pl.pallas_call(
        functools.partial(_apply_kernel, silu=silu),
        out_shape=jax.ShapeDtypeStruct((B, hw, C), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, thw, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, thw, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xf, a.reshape(B, 1, C).astype(jnp.float32), b.reshape(B, 1, C).astype(jnp.float32))
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 7))
def fused_group_norm_quant(x, scale, bias, groups, eps, silu, scale_shift, interpret):
    """fused_group_norm that also emits per-image int8 quantization.

    Returns (q, s): q has x.dtype (bf16/f32) holding EXACT integers in
    [-127, 127]; s is (B,) f32 with y ~= q * s[:, None, ...] up to rounding
    (+ rare >5-sigma saturation). Backward is straight-through: cotangent dq
    is mapped to dy = dq / s (s treated as stop-gradient) and pushed through
    the exact reference GN math — composing with conv_prequant's vjp this
    yields the unquantized chain's gradients.
    """
    return _fused_gn_quant_impl(x, scale, bias, groups, eps, silu, scale_shift, interpret, x.dtype)


def fused_group_norm_quant_s8(x, scale, bias, groups, eps, silu, scale_shift, interpret):
    """fused_group_norm_quant emitting REAL s8 (inference-only: integer
    outputs carry no tangent, so nothing may differentiate through this).

    Halves the apply-pass HBM write and hands XLA's s8 conv its operand
    dtype directly — the bf16 handshake otherwise pays a separate
    convert+transpose materialization per conv input (seen in optimized HLO).
    """
    return _fused_gn_quant_impl(x, scale, bias, groups, eps, silu, scale_shift, interpret, jnp.int8)


def _fused_gn_quant_impl(x, scale, bias, groups, eps, silu, scale_shift, interpret, out_dtype):
    orig_shape = x.shape
    B, C = x.shape[0], x.shape[-1]
    hw = 1
    for sdim in x.shape[1:-1]:
        hw *= sdim
    xf = x.reshape(B, hw, C)
    thw = _pick_tile(hw, C, xf.dtype.itemsize)
    grid = (B, hw // thw)

    s1, s2, xmn, xmx = pl.pallas_call(
        _stats_minmax_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ),
        grid=grid,
        in_specs=[pl.BlockSpec((1, thw, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)],
        out_specs=tuple(
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
        interpret=interpret,
    )(xf)

    n = hw * (C // groups)
    g1 = s1.reshape(B, groups, C // groups).sum(-1)
    g2 = s2.reshape(B, groups, C // groups).sum(-1)
    mean = g1 / n
    var = g2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    invc = jnp.repeat(inv, C // groups, axis=1)
    meanc = jnp.repeat(mean, C // groups, axis=1)
    a = invc * scale[None, :]
    b = bias[None, :] - meanc * a
    if scale_shift is not None:
        ss, sb = scale_shift
        a = a * (1.0 + ss)
        b = b * (1.0 + ss) + sb

    s, inv = _bound_scale(a, b, xmn.reshape(B, C), xmx.reshape(B, C), silu)
    thw_q = _pick_tile(hw, C, xf.dtype.itemsize, budget_bytes=1024 * 1024)
    grid_q = (B, hw // thw_q)
    q = pl.pallas_call(
        functools.partial(_apply_quant_kernel, silu=silu),
        out_shape=jax.ShapeDtypeStruct((B, hw, C), out_dtype),
        grid=grid_q,
        in_specs=[
            pl.BlockSpec((1, thw_q, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, thw_q, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        xf,
        a.reshape(B, 1, C).astype(jnp.float32),
        b.reshape(B, 1, C).astype(jnp.float32),
        jnp.broadcast_to(inv.astype(jnp.float32)[:, None, None], (B, 1, 128)),
    )
    return q.reshape(orig_shape), s


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gn_reference_quant(x, scale, bias, groups, eps, silu, scale_shift):
    """XLA/CPU fallback: exact reference GN math + per-image quantize with
    the SAME bound-derived scale as the Pallas kernel.

    custom_vjp'd because jnp.round has a zero gradient — the straight-through
    bwd here matches the Pallas path's exactly.
    """
    q, s = _gn_ref_quant_math(x, scale, bias, groups, eps, silu, scale_shift)
    return q.astype(x.dtype), s


def gn_reference_quant_s8(x, scale, bias, groups, eps, silu, scale_shift):
    """XLA-composite quantizing GN emitting REAL s8 (inference-only)."""
    q, s = _gn_ref_quant_math(x, scale, bias, groups, eps, silu, scale_shift)
    return q.astype(jnp.int8), s


def _gn_ref_quant_math(x, scale, bias, groups, eps, silu, scale_shift):
    B, C = x.shape[0], x.shape[-1]
    xf = x.astype(jnp.float32)
    spatial = xf.shape[1:-1]
    xg = xf.reshape(B, *spatial, groups, C // groups)
    axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    # one-pass stats (see _gn_reference): mean/E[x^2]/min/max are independent
    # reduces of the same input -> XLA multi-output-fuses them into one read
    n_red = 1
    for a in axes:
        n_red *= xg.shape[a]
    mean = jnp.sum(xg, axis=axes) / n_red  # (B, G)
    var = jnp.sum(xg * xg, axis=axes) / n_red - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    invc = jnp.repeat(inv, C // groups, axis=1)  # (B, C)
    meanc = jnp.repeat(mean, C // groups, axis=1)
    a = invc * scale[None, :]
    b = bias[None, :] - meanc * a
    if scale_shift is not None:
        ss, sb = scale_shift
        a = a * (1.0 + ss)
        b = b * (1.0 + ss) + sb
    bshape = (B,) + (1,) * len(spatial) + (C,)
    y = xf * a.reshape(bshape) + b.reshape(bshape)
    if silu:
        y = jax.nn.silu(y)
    sp_axes = tuple(range(1, 1 + len(spatial)))
    xmin = jnp.min(xf, axis=sp_axes)
    xmax = jnp.max(xf, axis=sp_axes)
    s, invs = _bound_scale(a, b, xmin, xmax, silu)
    q = jnp.clip(jnp.round(y * invs.reshape((B,) + (1,) * (y.ndim - 1))), -127, 127)
    return q, s


def _gn_ref_quant_fwd(x, scale, bias, groups, eps, silu, scale_shift):
    out = _gn_reference_quant(x, scale, bias, groups, eps, silu, scale_shift)
    return out, (x, scale, bias, scale_shift, out[1])


def _gn_ref_quant_bwd(groups, eps, silu, res, g):
    x, scale, bias, scale_shift, s = res
    dq, _ds = g
    sb = s.reshape((s.shape[0],) + (1,) * (dq.ndim - 1))
    dy = (dq.astype(jnp.float32) / sb).astype(x.dtype)

    def ref(x_, scale_, bias_, scale_shift_):
        return _gn_reference(x_, scale_, bias_, groups, eps, silu, scale_shift_)

    _, vjp = jax.vjp(ref, x, scale, bias, scale_shift)
    return vjp(dy)


_gn_reference_quant.defvjp(_gn_ref_quant_fwd, _gn_ref_quant_bwd)


def _fused_gn_quant_fwd(x, scale, bias, groups, eps, silu, scale_shift, interpret):
    out = fused_group_norm_quant(x, scale, bias, groups, eps, silu, scale_shift, interpret)
    return out, (x, scale, bias, scale_shift, out[1])


def _fused_gn_quant_bwd(groups, eps, silu, interpret, res, g):
    x, scale, bias, scale_shift, s = res
    dq, _ds = g
    sb = s.reshape((s.shape[0],) + (1,) * (dq.ndim - 1))
    dy = (dq.astype(jnp.float32) / sb).astype(x.dtype)

    def ref(x_, scale_, bias_, scale_shift_):
        return _gn_reference(x_, scale_, bias_, groups, eps, silu, scale_shift_)

    _, vjp = jax.vjp(ref, x, scale, bias, scale_shift)
    return vjp(dy)


fused_group_norm_quant.defvjp(_fused_gn_quant_fwd, _fused_gn_quant_bwd)


def _fused_gn_fwd(x, scale, bias, groups, eps, silu, scale_shift, interpret):
    out = fused_group_norm(x, scale, bias, groups, eps, silu, scale_shift, interpret)
    return out, (x, scale, bias, scale_shift)


def _fused_gn_bwd(groups, eps, silu, interpret, res, g):
    x, scale, bias, scale_shift = res
    # exact-math recompute backward through the XLA composite
    def ref(x_, scale_, bias_, scale_shift_):
        return _gn_reference(x_, scale_, bias_, groups, eps, silu, scale_shift_)

    _, vjp = jax.vjp(ref, x, scale, bias, scale_shift)
    dx, dscale, dbias, dss = vjp(g)
    return dx, dscale, dbias, dss


fused_group_norm.defvjp(_fused_gn_fwd, _fused_gn_bwd)


def group_norm(
    x,
    scale,
    bias,
    *,
    groups: int = 32,
    eps: float = 1e-5,
    silu: bool = False,
    scale_shift=None,
    impl: str = "auto",
    quantize_out: bool = False,
    emit: str = "bf16",
):
    """Dispatching entry point: Pallas on TPU, XLA composite elsewhere.

    With quantize_out=True returns (q, s) — per-pixel int8-ready integers in
    x.dtype plus f32 scales — for feeding ops.quant.conv_prequant. With
    emit="s8" the integers come as REAL int8 (inference-only: no tangent).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if quantize_out:
        if emit == "s8":
            if impl == "xla":
                return gn_reference_quant_s8(x, scale, bias, groups, eps, silu, scale_shift)
            return fused_group_norm_quant_s8(
                x, scale, bias, groups, eps, silu, scale_shift, impl == "pallas_interpret"
            )
        if impl == "xla":
            return _gn_reference_quant(x, scale, bias, groups, eps, silu, scale_shift)
        return fused_group_norm_quant(
            x, scale, bias, groups, eps, silu, scale_shift, impl == "pallas_interpret"
        )
    if impl == "xla":
        return _gn_reference(x, scale, bias, groups, eps, silu, scale_shift)
    return fused_group_norm(
        x, scale, bias, groups, eps, silu, scale_shift, impl == "pallas_interpret"
    )
