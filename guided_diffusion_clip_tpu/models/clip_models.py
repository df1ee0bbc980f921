"""Fork model variants: CLIP-embedding-conditioned UNets and SR models.

Reference behavior: guided_diffusion/unet_other.py. All variants are thin
configs over the one `UNetModel` module (models/unet.py), which implements the
input preprocessing and conditioning paths directly; this file provides
reference-named factories plus the warm-start stem-widening surgery of
SRImageModel_Feat_cont (unet_other.py:116-136).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .unet import UNetConfig, UNetModel


def UNetModel_clip_feat(config: UNetConfig, dtype=jnp.float32) -> UNetModel:
    """UNet conditioned on a 512-d CLIP image embedding (unet_other.py:25-41).

    The class-label table is replaced by a 2-layer MLP on the embedding;
    `num_classes` is repurposed as the embedding dim (script_util.py:9).
    """
    cfg = dataclasses.replace(config, variant="clip_feat", label_emb_type="mlp")
    return UNetModel(config=cfg, dtype=dtype)


def SRImageModel_Feat(config: UNetConfig, dtype=jnp.float32) -> UNetModel:
    """Image-to-image model conditioned on the CLIP feature delta
    (unet_other.py:43-77): x = concat(x_t, img2), y = clip1 - clip2 + bias_feat.

    `config.in_channels` must already be doubled (the factory in script_util
    handles this, matching in_channels*2 at unet_other.py:45).
    """
    cfg = dataclasses.replace(config, variant="sr_img_feat", label_emb_type="mlp")
    return UNetModel(config=cfg, dtype=dtype)


def SRImageModel_Feat_cont(config: UNetConfig, dtype=jnp.float32) -> UNetModel:
    """Like SRImageModel_Feat but for warm-starting from a plain checkpoint:
    the label MLP is zero-initialized (unet_other.py:90-95) and the stem conv
    is widened on load (see `warmstart_from_plain_checkpoint`)."""
    cfg = dataclasses.replace(config, variant="sr_img_feat", label_emb_type="mlp_zero")
    return UNetModel(config=cfg, dtype=dtype)


def SpatFeatureModel(config: UNetConfig, dtype=jnp.float32) -> UNetModel:
    """UNet with the 512-d feature tiled into two 128x128 input planes
    (unet_other.py:6-22). `config.in_channels` must be base+2."""
    cfg = dataclasses.replace(config, variant="spat_feat")
    return UNetModel(config=cfg, dtype=dtype)


def SuperResModel(config: UNetConfig, dtype=jnp.float32) -> UNetModel:
    """Upstream SR model: concat bilinear-upsampled low_res (unet.py:667-681).
    `config.in_channels` must already be doubled."""
    cfg = dataclasses.replace(config, variant="super_res")
    return UNetModel(config=cfg, dtype=dtype)


def widen_stem_kernel(kernel: np.ndarray, new_in: int) -> np.ndarray:
    """Warm-start surgery (unet_other.py:121-136): widen the stem conv's input
    channels, copying old weights into the first half and zero-filling the rest.

    kernel is flax HWIO: (kh, kw, I_old, O) -> (kh, kw, new_in, O).
    """
    kh, kw, old_in, out = kernel.shape
    assert new_in >= old_in
    widened = np.zeros((kh, kw, new_in, out), dtype=np.asarray(kernel).dtype)
    widened[:, :, :old_in, :] = np.asarray(kernel)
    return widened


def warmstart_from_plain_checkpoint(state_dict, params_template, base_in_channels: int):
    """Load a plain (narrow-stem, no-label-MLP) torch checkpoint into an
    SRImageModel_Feat_cont template (unet_other.py:116-136 semantics).

    Missing keys (label_emb MLP, bias_feat) keep their template init
    (zero-init MLP / random bias); the stem kernel is widened in the input-
    channel dim with zeros for the img2 half.
    """
    from ..utils.torch_import import import_torch_state_dict

    params = import_torch_state_dict(
        state_dict, params_template, model="unet", strict=False, missing_ok=True,
        widen_stem_to=params_template["input_blocks_0_0"]["conv"]["kernel"].shape[2],
    )
    return params
