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


def _pick_tile(hw: int, c: int, itemsize: int, budget_bytes: int = 2 * 1024 * 1024) -> int:
    tile = max(budget_bytes // (c * itemsize), 8)
    tile = min(tile, hw)
    while hw % tile:
        tile -= 1
    return tile


def _gn_reference(x, scale, bias, groups, eps, silu, scale_shift):
    """The XLA composite (exact reference math) — also the VJP path."""
    orig_dtype = x.dtype
    B = x.shape[0]
    C = x.shape[-1]
    xf = x.astype(jnp.float32)
    spatial = xf.shape[1:-1]
    xg = xf.reshape(B, *spatial, groups, C // groups)
    axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    mean = xg.mean(axis=axes, keepdims=True)
    var = xg.var(axis=axes, keepdims=True)
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
):
    """Dispatching entry point: Pallas on TPU, XLA composite elsewhere."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return _gn_reference(x, scale, bias, groups, eps, silu, scale_shift)
    return fused_group_norm(
        x, scale, bias, groups, eps, silu, scale_shift, impl == "pallas_interpret"
    )
