"""Tests for the int8 quantized conv fast path (ops/quant.py).

On CPU these run through the documented float-emulation of the s8 conv
(identical quantization decisions; accumulation in f32), which is exact
enough for the tolerance checks here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guided_diffusion_clip_tpu.ops.config import set_conv_impl
from guided_diffusion_clip_tpu.ops.quant import (
    int8_conv,
    quantize_per_out_channel,
    quantize_per_tensor,
)


@pytest.fixture(autouse=True)
def _restore_conv_impl():
    yield
    set_conv_impl("auto")


def _f32_conv(x, w, stride=1, padding=((1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def test_quantize_per_tensor_roundtrip():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(4, 8, 8, 16).astype(np.float32))
    q, s = quantize_per_tensor(x)
    assert q.dtype == jnp.int8
    deq = q.astype(jnp.float32) * s
    # max quantization error is scale/2
    assert float(jnp.max(jnp.abs(deq - x))) <= float(s) / 2 + 1e-6


def test_quantize_per_out_channel_scales_independent():
    rs = np.random.RandomState(1)
    w = rs.randn(3, 3, 8, 4).astype(np.float32)
    w[..., 2] *= 100.0  # one loud channel must not crush the others' precision
    q, s = quantize_per_out_channel(jnp.asarray(w))
    assert s.shape == (4,)
    deq = q.astype(jnp.float32) * s
    rel = np.abs(np.asarray(deq) - w).max(axis=(0, 1, 2)) / np.abs(w).max(axis=(0, 1, 2))
    assert rel.max() < 0.005


def test_int8_conv_close_to_f32():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 16, 16, 32).astype(np.float32))
    w = jnp.asarray((rs.randn(3, 3, 32, 48) * 0.05).astype(np.float32))
    y_q = int8_conv(x, w)
    y_f = _f32_conv(x, w)
    # int8 dynamic quantization: ~1% relative error at these magnitudes
    denom = float(jnp.max(jnp.abs(y_f))) + 1e-6
    rel = float(jnp.max(jnp.abs(y_q - y_f))) / denom
    assert rel < 0.02, rel


def test_int8_conv_strided():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 16, 16, 8).astype(np.float32))
    w = jnp.asarray((rs.randn(3, 3, 8, 8) * 0.1).astype(np.float32))
    y_q = int8_conv(x, w, 2, ((1, 1), (1, 1)))
    y_f = _f32_conv(x, w, stride=2)
    assert y_q.shape == y_f.shape == (2, 8, 8, 8)
    denom = float(jnp.max(jnp.abs(y_f))) + 1e-6
    assert float(jnp.max(jnp.abs(y_q - y_f))) / denom < 0.02


def test_int8_conv_zero_weights_exact_zero():
    x = jnp.ones((1, 4, 4, 4), jnp.float32)
    w = jnp.zeros((3, 3, 4, 4), jnp.float32)
    assert float(jnp.max(jnp.abs(int8_conv(x, w)))) == 0.0


@pytest.mark.slow
def test_int8_conv_straight_through_gradients():
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(1, 8, 8, 8).astype(np.float32))
    w = jnp.asarray((rs.randn(3, 3, 8, 8) * 0.1).astype(np.float32))

    gq = jax.grad(lambda xx: jnp.sum(int8_conv(xx, w) ** 2) / 100.0)(x)
    # STE: cotangent flows through the f32 conv; same primal output feeds the
    # loss, so grads agree with f32 grads up to the fwd quantization error.
    gf = jax.grad(lambda xx: jnp.sum(_f32_conv(xx, w) ** 2) / 100.0)(x)
    denom = float(jnp.max(jnp.abs(gf))) + 1e-6
    assert float(jnp.max(jnp.abs(gq - gf))) / denom < 0.05


@pytest.mark.slow
def test_conv_module_param_tree_identical_and_output_close():
    import flax.linen as fnn

    from guided_diffusion_clip_tpu.models.nn import Conv

    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(2, 8, 8, 16).astype(np.float32))

    m = Conv(features=24, kernel_size=3, dtype=jnp.float32)
    set_conv_impl("xla")
    p_xla = m.init(jax.random.key(0), x)
    y_xla = m.apply(p_xla, x)

    set_conv_impl("int8")
    p_q = m.init(jax.random.key(0), x)
    y_q = m.apply(p_q, x)  # same params: init is impl-independent

    assert jax.tree_util.tree_structure(p_xla) == jax.tree_util.tree_structure(p_q)
    for a, b in zip(jax.tree_util.tree_leaves(p_xla), jax.tree_util.tree_leaves(p_q)):
        assert a.shape == b.shape and a.dtype == b.dtype

    denom = float(jnp.max(jnp.abs(y_xla))) + 1e-6
    assert float(jnp.max(jnp.abs(y_q - y_xla))) / denom < 0.02


@pytest.mark.slow
def test_unet_forward_int8_close_to_xla():
    """Tiny UNet: the quantized forward stays close to the bf16/f32 forward."""
    from guided_diffusion_clip_tpu.utils.script_util import create_upstream_model

    model = create_upstream_model(
        image_size=32, num_channels=32, num_res_blocks=1, channel_mult="1,2",
        learn_sigma=False, class_cond=False, use_checkpoint=False,
        attention_resolutions="16", num_heads=2, num_head_channels=-1,
        num_heads_upsample=-1, use_scale_shift_norm=True, dropout=0.0,
        resblock_updown=False, use_fp16=False, use_new_attention_order=False,
    )
    rs = np.random.RandomState(6)
    x = jnp.asarray(rs.randn(1, 32, 32, 3).astype(np.float32))
    t = jnp.asarray([17.0], jnp.float32)

    set_conv_impl("xla")
    params = model.init(jax.random.key(1), x, t)
    y_ref = model.apply(params, x, t)

    set_conv_impl("int8")
    y_q = model.apply(params, x, t)

    assert y_q.shape == y_ref.shape
    err = float(jnp.max(jnp.abs(y_q - y_ref)))
    scale = float(jnp.max(jnp.abs(y_ref))) + 1e-6
    assert err / scale < 0.15, err / scale  # accumulated layerwise quant noise


@pytest.mark.slow
def test_int8_sampling_chain_stable():
    """A full tiny guided p_sample chain under int8 convs stays finite and
    lands in the same value range as the bf16/f32 chain."""
    from guided_diffusion_clip_tpu.diffusion import (
        SamplerConfig, named_schedule, p_sample_loop,
    )
    from guided_diffusion_clip_tpu.diffusion.guidance import classifier_cond_fn
    from guided_diffusion_clip_tpu.utils.script_util import (
        create_classifier, create_upstream_model,
    )

    model = create_upstream_model(
        image_size=64, num_channels=32, num_res_blocks=1, channel_mult="1,2",
        learn_sigma=True, class_cond=False, use_checkpoint=False,
        attention_resolutions="32", num_heads=2, num_head_channels=-1,
        num_heads_upsample=-1, use_scale_shift_norm=True, dropout=0.0,
        resblock_updown=False, use_fp16=False, use_new_attention_order=False,
    )
    classifier = create_classifier(
        image_size=64, classifier_use_fp16=False, classifier_width=32,
        classifier_depth=1, classifier_attention_resolutions="32",
        classifier_use_scale_shift_norm=True, classifier_resblock_updown=False,
        classifier_pool="attention",
    )
    shape = (1, 64, 64, 3)
    x0 = jnp.zeros(shape)
    t0 = jnp.zeros((1,))
    params = model.init(jax.random.key(0), x0, t0)
    cparams = classifier.init(jax.random.key(1), x0, t0)
    sched = named_schedule("cosine", 50)
    cfg = SamplerConfig()
    y = jnp.zeros((1,), jnp.int32)
    cond = classifier_cond_fn(
        lambda xx, tt: classifier.apply(cparams, xx, tt), 1.0
    )

    def run():
        return p_sample_loop(
            sched,
            lambda xx, tt, **kw: model.apply(params, xx, tt),
            shape, jax.random.key(2), cfg=cfg, cond_fn=cond,
            model_kwargs={"y": y},
        )

    set_conv_impl("xla")
    ref = np.asarray(jax.jit(run)())
    set_conv_impl("int8")
    got = np.asarray(jax.jit(run)())

    assert np.isfinite(got).all()
    # Quantization noise accumulates over 50 steps; the chains must stay in
    # the same ballpark (same dynamic range, highly overlapping support).
    assert abs(got.std() - ref.std()) / (ref.std() + 1e-6) < 0.5
    assert np.abs(got).max() < 10 * max(np.abs(ref).max(), 1.0)


def test_gn_quantize_out_reconstructs():
    """(q, s) from the quantizing GroupNorm reconstructs GN output to <0.5%."""
    from guided_diffusion_clip_tpu.ops.pallas_groupnorm import group_norm

    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(2, 6, 6, 64).astype(np.float32)) * 3.0
    gamma = jnp.asarray(rs.rand(64).astype(np.float32) + 0.5)
    beta = jnp.asarray(rs.randn(64).astype(np.float32) * 0.1)

    y = group_norm(x, gamma, beta, groups=32, silu=True, impl="xla")
    q, s = group_norm(x, gamma, beta, groups=32, silu=True, impl="xla", quantize_out=True)
    assert q.shape == x.shape and s.shape == (x.shape[0],)
    # integer-valued q within int8 range
    qn = np.asarray(q)
    assert np.all(np.abs(qn) <= 127) and np.allclose(qn, np.round(qn))
    recon = qn * np.asarray(s)[:, None, None, None]
    err = np.abs(recon - np.asarray(y)).max()
    # scale is a 5-sigma bound, not a tight amax: allow bound/127 rounding
    # plus rare saturation
    assert err <= float(np.asarray(s).max()) * 1.0


def test_gn_quantize_pallas_interpret_matches_xla():
    from guided_diffusion_clip_tpu.ops.pallas_groupnorm import group_norm

    rs = np.random.RandomState(8)
    x = jnp.asarray(rs.randn(2, 8, 8, 64).astype(np.float32))
    gamma = jnp.ones((64,), jnp.float32)
    beta = jnp.zeros((64,), jnp.float32)
    q_x, s_x = group_norm(x, gamma, beta, groups=32, silu=True, impl="xla", quantize_out=True)
    q_p, s_p = group_norm(
        x, gamma, beta, groups=32, silu=True, impl="pallas_interpret", quantize_out=True
    )
    np.testing.assert_allclose(np.asarray(s_x), np.asarray(s_p), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q_x), np.asarray(q_p), atol=1.0)


def test_conv_prequant_matches_f32():
    from guided_diffusion_clip_tpu.ops.pallas_groupnorm import group_norm
    from guided_diffusion_clip_tpu.ops.quant import conv_prequant

    rs = np.random.RandomState(9)
    x = jnp.asarray(rs.randn(2, 8, 8, 64).astype(np.float32))
    gamma = jnp.ones((64,), jnp.float32)
    beta = jnp.zeros((64,), jnp.float32)
    w = jnp.asarray((rs.randn(3, 3, 64, 32) * 0.1).astype(np.float32))
    b = jnp.asarray(rs.randn(32).astype(np.float32) * 0.1)

    y_ref = _f32_conv(
        group_norm(x, gamma, beta, groups=32, silu=True, impl="xla"), w
    ) + b
    q, s = group_norm(x, gamma, beta, groups=32, silu=True, impl="xla", quantize_out=True)
    y_q = conv_prequant(q, s, w, b)
    denom = float(jnp.max(jnp.abs(y_ref))) + 1e-6
    assert float(jnp.max(jnp.abs(y_q - y_ref))) / denom < 0.03


def test_gn_conv_prequant_gradients_flow():
    """STE composition: grad through GN_q -> conv_prequant approximates the
    unquantized chain's gradient (classifier guidance depends on this)."""
    from guided_diffusion_clip_tpu.ops.pallas_groupnorm import group_norm
    from guided_diffusion_clip_tpu.ops.quant import conv_prequant

    rs = np.random.RandomState(10)
    x = jnp.asarray(rs.randn(1, 8, 8, 64).astype(np.float32))
    gamma = jnp.ones((64,), jnp.float32)
    beta = jnp.zeros((64,), jnp.float32)
    w = jnp.asarray((rs.randn(3, 3, 64, 32) * 0.1).astype(np.float32))
    b = jnp.zeros((32,), jnp.float32)

    def loss_q(xx):
        q, s = group_norm(xx, gamma, beta, groups=32, silu=True, impl="xla", quantize_out=True)
        return jnp.sum(conv_prequant(q, s, w, b) ** 2)

    def loss_f(xx):
        y = group_norm(xx, gamma, beta, groups=32, silu=True, impl="xla")
        return jnp.sum((_f32_conv(y, w) + b) ** 2)

    gq = jax.grad(loss_q)(x)
    gf = jax.grad(loss_f)(x)
    assert np.isfinite(np.asarray(gq)).all() and float(jnp.max(jnp.abs(gq))) > 0
    denom = float(jnp.max(jnp.abs(gf))) + 1e-6
    assert float(jnp.max(jnp.abs(gq - gf))) / denom < 0.1


def test_matmul_pertoken_int8_close_and_grads():
    from guided_diffusion_clip_tpu.ops.quant import matmul_pertoken_int8

    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(2, 17, 64).astype(np.float32))
    x = x.at[0, 3].mul(50.0)  # a loud token must not hurt the others
    w = jnp.asarray((rs.randn(64, 48) * 0.1).astype(np.float32))
    b = jnp.asarray(rs.randn(48).astype(np.float32) * 0.1)

    y_ref = jnp.dot(x, w) + b
    y_q = matmul_pertoken_int8(x, w, b)
    denom = float(jnp.max(jnp.abs(y_ref))) + 1e-6
    assert float(jnp.max(jnp.abs(y_q - y_ref))) / denom < 0.02

    gq = jax.grad(lambda xx: jnp.sum(matmul_pertoken_int8(xx, w, b) ** 2))(x)
    gf = jax.grad(lambda xx: jnp.sum((jnp.dot(xx, w) + b) ** 2))(x)
    gd = float(jnp.max(jnp.abs(gq - gf))) / (float(jnp.max(jnp.abs(gf))) + 1e-6)
    assert gd < 0.05, gd


def test_gn_quantize_s8_emission_matches_bf16_handshake():
    """emit="s8" produces the same integers/scales as the bf16 handshake, as
    real int8, on both the XLA composite and the Pallas(interpret) kernel."""
    from guided_diffusion_clip_tpu.ops.pallas_groupnorm import group_norm

    rs = np.random.RandomState(9)
    x = jnp.asarray(rs.randn(2, 8, 8, 64).astype(np.float32)) * 2.0
    gamma = jnp.asarray(rs.rand(64).astype(np.float32) + 0.5)
    beta = jnp.asarray(rs.randn(64).astype(np.float32) * 0.1)

    for impl in ("xla", "pallas_interpret"):
        q, s = group_norm(x, gamma, beta, groups=32, silu=True, impl=impl, quantize_out=True)
        q8, s8 = group_norm(
            x, gamma, beta, groups=32, silu=True, impl=impl, quantize_out=True, emit="s8"
        )
        assert q8.dtype == jnp.int8, impl
        np.testing.assert_allclose(np.asarray(s), np.asarray(s8), rtol=1e-6, err_msg=impl)
        np.testing.assert_array_equal(
            np.asarray(q).astype(np.int32), np.asarray(q8).astype(np.int32), err_msg=impl
        )


def test_unet_int8_s8_emission_matches_bf16_emission():
    """Full UNet int8 forward is identical under s8 vs bf16 emission (the
    emission dtype changes HBM format, never values)."""
    from guided_diffusion_clip_tpu.models.unet import UNetConfig, UNetModel
    from guided_diffusion_clip_tpu.ops.config import int8_emit

    cfg = UNetConfig(
        in_channels=3, model_channels=32, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
        image_size=16, resblock_updown=True, use_scale_shift_norm=True,
    )
    model = UNetModel(cfg)
    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(2, 16, 16, 3).astype(np.float32))
    t = jnp.asarray([3.0, 250.0])
    set_conv_impl("int8")
    try:
        params = model.init(jax.random.key(0), x, t)["params"]
        y_bf16 = model.apply({"params": params}, x, t)
        with int8_emit("s8"):
            y_s8 = model.apply({"params": params}, x, t)
    finally:
        set_conv_impl("auto")
    np.testing.assert_allclose(
        np.asarray(y_bf16), np.asarray(y_s8), atol=0.0, rtol=0.0
    )
