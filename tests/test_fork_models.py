"""Parity tests for the fork's CLIP-conditioned variants (unet_other.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guided_diffusion_clip_tpu.models.clip_models import (
    SRImageModel_Feat,
    SRImageModel_Feat_cont,
    SuperResModel,
    UNetModel_clip_feat,
    warmstart_from_plain_checkpoint,
)
from guided_diffusion_clip_tpu.models.unet import UNetConfig, UNetModel
from guided_diffusion_clip_tpu.utils.torch_import import import_torch_state_dict
from reference_oracle import has_reference

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference not mounted")

BASE = dict(
    image_size=32,
    in_channels=3,
    model_channels=32,
    out_channels=6,
    num_res_blocks=1,
    attention_resolutions=(4,),
    dropout=0.0,
    channel_mult=(1, 2, 4),
    num_heads=2,
    num_classes=512,
)


def _ref_module(cls_name, **kw):
    import sys

    sys.path.insert(0, "/root/reference")
    import torch

    torch.manual_seed(0)
    from guided_diffusion import unet_other

    return getattr(unet_other, cls_name)(**kw)


def _data(in_ch=3):
    rs = np.random.RandomState(0)
    x = rs.randn(2, 32, 32, in_ch).astype(np.float32)
    t = np.array([5.0, 100.0], dtype=np.float32)
    clip = rs.randn(2, 512).astype(np.float32)
    clip2 = rs.randn(2, 512).astype(np.float32)
    img2 = rs.randn(2, 32, 32, in_ch).astype(np.float32)
    return x, t, clip, clip2, img2


def _to_nchw(a):
    import torch

    return torch.from_numpy(np.moveaxis(a, -1, 1).copy())


@pytest.mark.slow
class TestClipFeatModel:
    def test_forward_parity(self):
        import torch

        x, t, clip, _, _ = _data()
        ref = _ref_module("UNetModel_clip_feat", **BASE)
        ref.eval()
        cfg = UNetConfig(**BASE)
        fm = UNetModel_clip_feat(cfg)
        params = fm.init(jax.random.key(0), jnp.array(x), jnp.array(t), clip_feat=jnp.array(clip))
        params = {"params": import_torch_state_dict(ref.state_dict(), params["params"])}
        ours = np.asarray(fm.apply(params, jnp.array(x), jnp.array(t), clip_feat=jnp.array(clip)))
        with torch.no_grad():
            theirs = ref(_to_nchw(x), torch.from_numpy(t), clip_feat=torch.from_numpy(clip))
        np.testing.assert_allclose(ours, np.moveaxis(theirs.numpy(), 1, -1), rtol=1e-4, atol=1e-4)


class TestSRImageFeat:
    def test_forward_parity(self):
        import torch

        x, t, clip, clip2, img2 = _data()
        ref = _ref_module("SRImageModel_Feat", **BASE)
        ref.eval()
        cfg = UNetConfig(**{**BASE, "in_channels": 6})  # reference doubles internally
        fm = SRImageModel_Feat(cfg)
        params = fm.init(
            jax.random.key(0), jnp.array(x), jnp.array(t),
            clip_feat=jnp.array(clip), clip_feat2=jnp.array(clip2), img2=jnp.array(img2),
        )
        params = {"params": import_torch_state_dict(ref.state_dict(), params["params"])}
        ours = np.asarray(
            fm.apply(
                params, jnp.array(x), jnp.array(t),
                clip_feat=jnp.array(clip), clip_feat2=jnp.array(clip2), img2=jnp.array(img2),
            )
        )
        with torch.no_grad():
            theirs = ref(
                _to_nchw(x), torch.from_numpy(t),
                clip_feat=torch.from_numpy(clip), clip_feat2=torch.from_numpy(clip2),
                img2=_to_nchw(img2),
            )
        np.testing.assert_allclose(ours, np.moveaxis(theirs.numpy(), 1, -1), rtol=1e-4, atol=1e-4)


class TestSuperRes:
    def test_forward_parity(self):
        import torch

        x, t, _, _, _ = _data()
        low = np.random.RandomState(3).randn(2, 16, 16, 3).astype(np.float32)
        import sys

        sys.path.insert(0, "/root/reference")
        from guided_diffusion.unet import SuperResModel as RefSR

        torch.manual_seed(0)
        kw = {k: v for k, v in BASE.items() if k != "num_classes"}
        ref = RefSR(**kw)
        ref.eval()
        cfg = UNetConfig(**{**kw, "in_channels": 6, "num_classes": None})
        fm = SuperResModel(cfg)
        params = fm.init(jax.random.key(0), jnp.array(x), jnp.array(t), low_res=jnp.array(low))
        params = {"params": import_torch_state_dict(ref.state_dict(), params["params"])}
        ours = np.asarray(fm.apply(params, jnp.array(x), jnp.array(t), low_res=jnp.array(low)))
        with torch.no_grad():
            theirs = ref(_to_nchw(x), torch.from_numpy(t), low_res=_to_nchw(low))
        np.testing.assert_allclose(ours, np.moveaxis(theirs.numpy(), 1, -1), rtol=1e-4, atol=2e-4)


class TestWarmStartSurgery:
    def test_widen_and_zero_label_mlp(self):
        # plain unconditional checkpoint (3-ch stem, no label MLP / bias_feat)
        plain_cfg = UNetConfig(**{**BASE, "num_classes": None})
        plain = UNetModel(config=plain_cfg)
        x3 = jnp.zeros((1, 32, 32, 3))
        plain_params = plain.init(jax.random.key(0), x3, jnp.array([0.0]))["params"]
        from guided_diffusion_clip_tpu.utils.torch_import import export_to_torch

        sd = export_to_torch(plain_params)

        cont_cfg = UNetConfig(**{**BASE, "in_channels": 6})
        fm = SRImageModel_Feat_cont(cont_cfg)
        x, t, clip, clip2, img2 = _data()
        tmpl = fm.init(
            jax.random.key(1), jnp.array(x), jnp.array(t),
            clip_feat=jnp.array(clip), clip_feat2=jnp.array(clip2), img2=jnp.array(img2),
        )["params"]
        loaded = warmstart_from_plain_checkpoint(sd, tmpl, base_in_channels=3)

        k = np.asarray(loaded["input_blocks_0_0"]["conv"]["kernel"])
        np.testing.assert_array_equal(k[:, :, :3, :], np.asarray(plain_params["input_blocks_0_0"]["conv"]["kernel"]))
        np.testing.assert_array_equal(k[:, :, 3:, :], 0.0)
        # label MLP keeps its zero init; bias_feat keeps its random template init
        np.testing.assert_array_equal(np.asarray(loaded["label_emb_0"]["dense"]["kernel"]), 0.0)
        assert np.abs(np.asarray(loaded["bias_feat"])).sum() > 0

        # forward equals the plain model when img2 half is zero and label MLP is zero
        out_cont = fm.apply(
            {"params": loaded}, jnp.array(x), jnp.array(t),
            clip_feat=jnp.array(clip), clip_feat2=jnp.array(clip2), img2=jnp.zeros_like(jnp.array(img2)),
        )
        out_plain = plain.apply({"params": plain_params}, jnp.array(x), jnp.array(t))
        np.testing.assert_allclose(np.asarray(out_cont), np.asarray(out_plain), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
class TestSpatFeature:
    def test_forward_parity(self):
        import torch

        from guided_diffusion_clip_tpu.models.clip_models import SpatFeatureModel

        # hard-coded 128px tiling (unet_other.py:19-22)
        kw = dict(BASE, image_size=128, num_classes=None, num_res_blocks=1,
                  attention_resolutions=(16,), channel_mult=(1, 2))
        ref = _ref_module("SpatFeatureModel", **kw)
        ref.eval()
        cfg = UNetConfig(**{**kw, "in_channels": 5})  # reference adds +2 internally
        fm = SpatFeatureModel(cfg)
        rs = np.random.RandomState(0)
        x = rs.randn(2, 128, 128, 3).astype(np.float32)
        t = np.array([5.0, 100.0], dtype=np.float32)
        clip = rs.randn(2, 512).astype(np.float32)
        params = fm.init(jax.random.key(0), jnp.array(x), jnp.array(t), clip_feat=jnp.array(clip))
        params = {"params": import_torch_state_dict(ref.state_dict(), params["params"])}
        ours = np.asarray(fm.apply(params, jnp.array(x), jnp.array(t), clip_feat=jnp.array(clip)))
        with torch.no_grad():
            theirs = ref(_to_nchw(x), torch.from_numpy(t), clip_feat=torch.from_numpy(clip))
        np.testing.assert_allclose(ours, np.moveaxis(theirs.numpy(), 1, -1), rtol=1e-4, atol=2e-4)
