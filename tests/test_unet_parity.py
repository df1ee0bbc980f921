"""Checkpoint-level forward parity: reference torch UNet vs our flax UNet.

Builds the reference PyTorch models at tiny configs, exports their
state_dicts, imports them through the torch_import mapper, and compares
forward passes in f32 (tolerance covers conv-algorithm differences only).
This is the test that guards FID parity (SURVEY.md §7 hard part #1).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guided_diffusion_clip_tpu.models.unet import (
    EncoderUNetModel,
    UNetConfig,
    UNetModel,
)
from guided_diffusion_clip_tpu.utils.torch_import import (
    export_to_torch,
    import_torch_state_dict,
)
from reference_oracle import has_reference

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference not mounted")


def make_ref_unet(torch_kwargs):
    import sys

    sys.path.insert(0, "/root/reference")
    from guided_diffusion.unet import UNetModel as RefUNet

    return RefUNet(**torch_kwargs)


BASE = dict(
    image_size=32,
    in_channels=3,
    model_channels=32,
    out_channels=6,
    num_res_blocks=2,
    attention_resolutions=(2, 4),
    dropout=0.0,
    channel_mult=(1, 2, 4),
    num_heads=2,
)


def run_pair(torch_extra=None, flax_extra=None, y=None, in_channels=3, model="unet", pool=None):
    import torch

    torch.manual_seed(0)
    tkw = dict(BASE, in_channels=in_channels, **(torch_extra or {}))
    fkw = dict(BASE, in_channels=in_channels, **(flax_extra or {}))

    if model == "unet":
        ref = make_ref_unet(tkw)
    else:
        import sys

        sys.path.insert(0, "/root/reference")
        from guided_diffusion.unet import EncoderUNetModel as RefEnc

        ref = RefEnc(**tkw)
    ref.eval()
    sd = ref.state_dict()

    cfg = UNetConfig(**{k: (tuple(v) if isinstance(v, (list, tuple)) else v) for k, v in fkw.items() if k != "pool"})
    if model == "unet":
        fm = UNetModel(config=cfg)
    else:
        fm = EncoderUNetModel(config=cfg, pool=pool)

    rs = np.random.RandomState(0)
    x = rs.randn(2, 32, 32, in_channels).astype(np.float32)
    t = np.array([17.0, 333.0], dtype=np.float32)

    init_args = (jnp.array(x), jnp.array(t))
    init_kwargs = {}
    if y is not None:
        init_kwargs["y"] = jnp.array(y)
    params = fm.init(jax.random.key(0), *init_args, **init_kwargs)

    params = {"params": import_torch_state_dict(sd, params["params"], model=model, pool=pool)}
    ours = np.asarray(fm.apply(params, jnp.array(x), jnp.array(t), **init_kwargs))

    import torch as th

    with th.no_grad():
        xt = th.from_numpy(np.moveaxis(x, -1, 1).copy())
        tt = th.from_numpy(t)
        if model == "unet":
            if y is not None:
                theirs = ref(xt, tt, y=th.from_numpy(np.asarray(y)))
            else:
                theirs = ref(xt, tt)
            theirs = np.moveaxis(theirs.numpy(), 1, -1)
        else:
            theirs = ref(xt, tt).numpy()
    return ours, theirs


class TestUNetForwardParity:
    def test_basic(self):
        ours, theirs = run_pair()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    def test_scale_shift_resblock_updown(self):
        ours, theirs = run_pair(
            torch_extra=dict(use_scale_shift_norm=True, resblock_updown=True),
            flax_extra=dict(use_scale_shift_norm=True, resblock_updown=True),
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    def test_new_attention_order_head_channels(self):
        ours, theirs = run_pair(
            torch_extra=dict(use_new_attention_order=True, num_heads=1, num_head_channels=16),
            flax_extra=dict(use_new_attention_order=True, num_heads=1, num_head_channels=16),
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    def test_class_conditional(self):
        y = np.array([1, 7], dtype=np.int32)
        ours, theirs = run_pair(
            torch_extra=dict(num_classes=10),
            flax_extra=dict(num_classes=10),
            y=y,
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    def test_no_conv_resample(self):
        ours, theirs = run_pair(
            torch_extra=dict(conv_resample=False),
            flax_extra=dict(conv_resample=False),
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    def test_fractional_channel_mult(self):
        # 512px config uses channel_mult=(0.5, 1, ...) (script_util.py:149-159);
        # model_channels must keep 0.5x >= 32 for GroupNorm (as in real configs).
        ours, theirs = run_pair(
            torch_extra=dict(channel_mult=(0.5, 1, 2), model_channels=64),
            flax_extra=dict(channel_mult=(0.5, 1, 2), model_channels=64),
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


class TestEncoderParity:
    @pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial", "spatial_v2"])
    def test_pools(self, pool):
        extra = dict(pool=pool, out_channels=10)
        fextra = dict(out_channels=10)
        if pool == "attention":
            extra.update(num_heads=1, num_head_channels=16)
            fextra.update(num_heads=1, num_head_channels=16)
        ours, theirs = run_pair(
            torch_extra=extra, flax_extra=fextra, model="encoder", pool=pool
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


class TestRoundTrip:
    def test_export_import_roundtrip(self):
        cfg = UNetConfig(**BASE)
        fm = UNetModel(config=cfg)
        x = jnp.zeros((1, 32, 32, 3))
        params = fm.init(jax.random.key(1), x, jnp.array([0.0]))["params"]
        sd = export_to_torch(params)
        back = import_torch_state_dict(sd, params)
        for (p1, v1), (p2, v2) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(back)[0],
        ):
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))

    def test_import_rejects_missing_keys(self):
        cfg = UNetConfig(**BASE)
        fm = UNetModel(config=cfg)
        params = fm.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)), jnp.array([0.0]))["params"]
        sd = export_to_torch(params)
        sd.pop("out.2.weight")
        with pytest.raises(KeyError):
            import_torch_state_dict(sd, params)
