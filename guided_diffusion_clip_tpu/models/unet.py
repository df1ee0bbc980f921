"""The ADM UNet family as flax.linen modules in NHWC.

Reference behavior: guided_diffusion/unet.py (UNetModel :396, SuperResModel
:667, EncoderUNetModel :684, AttentionPool2d :22) and unet_other.py (fork
CLIP-conditioned variants). This is a fresh TPU-first design: one config-driven
module covers every variant (the reference's subclass zoo differs only in input
preprocessing, conditioning-vector computation, and label-embedding flavor),
NHWC layout, bf16 torso with f32 GroupNorm/softmax/embedding-MLPs (mirroring
fp16_util's convs-only fp16 policy), and jax.checkpoint rematerialization in
place of the custom autograd CheckpointFunction (nn.py:124-170).

Numerics contracts preserved for .pt checkpoint parity:
  - GroupNorm32 f32 compute (nn.py:17-19), 32 groups
  - zero-init output convs / proj_out (nn.py:68, unet.py:294, 616)
  - q/k pre-scaled by d^-1/4, f32 softmax, both head-split orders
    (unet.py:328-393)
  - scale-shift norm GN(h)*(1+s)+b (unet.py:248-251)
  - nearest-x2 upsample / stride-2 conv or 2x2 avgpool downsample
    (unet.py:81-140); ResBlock up/down applies resample to both h and x
    between in_rest and in_conv (unet.py:236-242)
  - timestep_embedding [cos,sin], max_period 1e4 (nn.py:103-122)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import attention as qkv_attention_dispatch
from ..parallel import sp, tp
from .nn import (
    Conv,
    Dense,
    GroupNorm32,
    avg_pool_2x,
    bilinear_resize,
    silu,
    timestep_embedding,
    upsample_nearest_2x,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Static architecture config (hashable; mirrors UNetModel kwargs, unet.py:427-448)."""

    image_size: int
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: tuple  # downsample factors, e.g. (8, 16, 32)
    dropout: float = 0.0
    channel_mult: tuple = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    use_checkpoint: bool = False
    num_heads: int = 1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    # "embedding" = nn.Embed class table (upstream, unet.py:479)
    # "mlp"       = 2-layer MLP on a float vector (fork, unet_other.py:29-33)
    # "mlp_zero"  = same MLP zero-initialized (SRImageModel_Feat_cont,
    #               unet_other.py:90-95)
    label_emb_type: str = "embedding"
    # Input/conditioning variant (replaces the reference subclass zoo):
    #   "unet"        plain UNetModel
    #   "super_res"   concat bilinear-upsampled low_res (unet.py:667-681)
    #   "clip_feat"   y = clip_feat (unet_other.py:25-41)
    #   "sr_img_feat" concat img2; y = clip_feat - clip_feat2 + bias_feat
    #                 (unet_other.py:43-77; "cont" differs only in init)
    #   "spat_feat"   concat two tiled 512-d feature planes (unet_other.py:6-22)
    variant: str = "unet"

    @property
    def time_embed_dim(self) -> int:
        return self.model_channels * 4

    def resolve_heads(self, ch: int, upsample: bool = False) -> int:
        if self.num_head_channels != -1:
            assert ch % self.num_head_channels == 0
            return ch // self.num_head_channels
        if upsample and self.num_heads_upsample != -1:
            return self.num_heads_upsample
        return self.num_heads


def build_plan(cfg: UNetConfig):
    """Statically unroll the UNet structure (mirrors unet.py:481-617).

    Returns (input_blocks, middle_block, output_blocks, feature_size) where
    each block is a list of layer-spec dicts. Layer kinds: "stem", "res",
    "attn", "down", "up". Block/layer indices match the reference's
    `input_blocks.{i}.{j}` torch state_dict keys, which the checkpoint
    importer relies on.
    """
    mc = cfg.model_channels
    ch = input_ch = int(cfg.channel_mult[0] * mc)
    input_blocks = [[dict(kind="stem", out=ch)]]
    feature_size = ch
    input_block_chans = [ch]
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            layers = [dict(kind="res", out=int(mult * mc))]
            ch = int(mult * mc)
            if ds in cfg.attention_resolutions:
                layers.append(dict(kind="attn", heads=cfg.resolve_heads(ch)))
            input_blocks.append(layers)
            feature_size += ch
            input_block_chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            if cfg.resblock_updown:
                input_blocks.append([dict(kind="res", out=ch, down=True)])
            else:
                input_blocks.append([dict(kind="down", out=ch)])
            input_block_chans.append(ch)
            ds *= 2
            feature_size += ch

    middle_block = [
        dict(kind="res", out=ch),
        dict(kind="attn", heads=cfg.resolve_heads(ch)),
        dict(kind="res", out=ch),
    ]
    feature_size += ch
    # feature_size is the encoder-path total (stem + each input block + middle),
    # consumed by the spatial pool heads (unet.py:843-854). The reference also
    # accumulates over output blocks but never uses that value.

    output_blocks = []
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            input_block_chans.pop()
            layers = [dict(kind="res", out=int(mc * mult))]
            ch = int(mc * mult)
            if ds in cfg.attention_resolutions:
                layers.append(dict(kind="attn", heads=cfg.resolve_heads(ch, upsample=True)))
            if level and i == cfg.num_res_blocks:
                if cfg.resblock_updown:
                    layers.append(dict(kind="res", out=ch, up=True))
                else:
                    layers.append(dict(kind="up", out=ch))
                ds //= 2
            output_blocks.append(layers)
    return input_blocks, middle_block, output_blocks, feature_size


class ResBlock(nn.Module):
    """Residual block with timestep-embedding conditioning (unet.py:143-256)."""

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    use_conv_skip: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb, train: bool = False):
        from ..ops.config import resolve_conv_impl

        C = x.shape[-1]
        out_ch = self.out_channels
        # int8 fast path: each GN+SiLU emits per-pixel int8 (q, s) consumed
        # directly by the following 3x3 conv on the int8 MXU datapath (2x
        # bf16 rate on v5e) with the dequant fused into the conv epilogue.
        # Up-blocks stay on the path too: nearest-x2 upsampling duplicates
        # values, so upsample(q) is still exactly integer-valued in [-127,
        # 127] with the same per-image scale. Down-blocks can't (a 2x2
        # avgpool of int8 values leaves the int8 grid), so their in_conv
        # stays bf16; their out_conv quantizes like any other (quant_out).
        quant = resolve_conv_impl() == "int8" and not self.down
        if quant:
            q, s = GroupNorm32(name="in_norm")(x, activation="silu", quantize=True)
            if self.up:
                q = upsample_nearest_2x(q)
                x = upsample_nearest_2x(x)
            h = Conv(out_ch, 3, dtype=self.dtype, name="in_conv")(q, prequant_scales=s)
        else:
            h = GroupNorm32(name="in_norm")(x, activation="silu")
            if self.up:
                h = upsample_nearest_2x(h)
                x = upsample_nearest_2x(x)
            elif self.down:
                h = avg_pool_2x(h)
                x = avg_pool_2x(x)
            h = Conv(out_ch, 3, dtype=self.dtype, name="in_conv")(h)

        # emb MLP stays f32 (fp16_util converts convs only), cast at the join
        # like the reference's .type(h.dtype) (unet.py:245).
        emb_width = 2 * out_ch if self.use_scale_shift_norm else out_ch
        emb_out = Dense(emb_width, dtype=jnp.float32, name="emb_proj")(silu(emb))
        emb_out = emb_out.astype(h.dtype)[:, None, None, :]

        # out_norm -> out_conv sits after any resampling, so it quantizes in
        # every ResBlock variant (incl. down) whenever dropout is inactive
        # (dropping q entries would break the q*s pairing).
        quant_out = resolve_conv_impl() == "int8" and (
            self.dropout == 0.0 or not train
        )
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_norm")(
                h, activation="silu", scale_shift=(scale, shift), quantize=quant_out
            )
        else:
            h = h + emb_out
            h = GroupNorm32(name="out_norm")(h, activation="silu", quantize=quant_out)
        if quant_out:
            q, s = h
            h = Conv(out_ch, 3, zero=True, dtype=self.dtype, name="out_conv")(
                q, prequant_scales=s
            )
        else:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = Conv(out_ch, 3, zero=True, dtype=self.dtype, name="out_conv")(h)

        if out_ch == C:
            skip = x
        elif self.use_conv_skip:
            skip = Conv(out_ch, 3, dtype=self.dtype, name="skip")(x)
        else:
            skip = Conv(out_ch, 1, dtype=self.dtype, name="skip")(x)
        return skip + h


class AttentionBlock(nn.Module):
    """Global self-attention over flattened spatial tokens (unet.py:259-305)."""

    num_heads: int
    use_new_attention_order: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = x.reshape(B, H * W, C)
        hn = GroupNorm32(name="norm")(h)
        # 1x1 conv1d == Dense over the channel axis (qkv, unet.py:286).
        # qkv/proj stay bf16 even under GDC_CONV_IMPL=int8: measured on v5e,
        # int8 here LOST 14ms of step time — the quant/dequant ops around the
        # Pallas attention call are fusion barriers that outweigh the small
        # MXU win at these contraction sizes.
        qkv = Dense(3 * C, dtype=self.dtype, name="qkv")(hn)
        a = qkv_attention_dispatch(qkv, self.num_heads, new_order=self.use_new_attention_order)
        a = Dense(C, zero=True, dtype=self.dtype, name="proj_out")(a)
        return (h + a).reshape(B, H, W, C)


class Downsample(nn.Module):
    """Stride-2 conv or 2x2 avgpool (unet.py:113-140)."""

    out_channels: int
    use_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return Conv(self.out_channels, 3, stride=2, dtype=self.dtype, name="op")(x)
        assert x.shape[-1] == self.out_channels
        return avg_pool_2x(x)


class Upsample(nn.Module):
    """Nearest-x2 + optional conv (unet.py:81-110)."""

    out_channels: int
    use_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = upsample_nearest_2x(x)
        if self.use_conv:
            x = Conv(self.out_channels, 3, dtype=self.dtype, name="conv")(x)
        return x


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling head (unet.py:22-51).

    Mean token prepended, learned positional embedding, QKVAttention (new
    order), output = projected token 0.
    """

    num_head_channels: int
    output_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        T = H * W
        h = x.reshape(B, T, C)
        h = jnp.concatenate([h.mean(axis=1, keepdims=True), h], axis=1)  # (B, T+1, C)
        pos = self.param(
            "positional_embedding",
            lambda key, shape: jax.random.normal(key, shape) / (C**0.5),
            (T + 1, C),
        )
        h = h + pos[None].astype(h.dtype)
        qkv = Dense(3 * C, dtype=self.dtype, name="qkv_proj")(h)
        a = qkv_attention_dispatch(qkv, C // self.num_head_channels, new_order=True)
        a = Dense(self.output_dim, dtype=self.dtype, name="c_proj")(a)
        return a[:, 0]


def _apply_layer(parent, spec, name, h, emb, train, cfg):
    """Instantiate + apply one planned layer inside a compact scope.

    Under spatial partitioning (parallel/sp.py) every layer output is pinned
    to (batch over 'data', H over 'space') so GSPMD keeps convs halo-exchanged
    and GN reductions cross-device; attention inputs are pinned batch-only
    (global spatial attention needs all tokens — one all-gather of a small
    low-res activation) and re-scattered on exit. All hooks are identity when
    SP is inactive.
    """
    kind = spec["kind"]
    if kind == "stem":
        out = Conv(spec["out"], 3, dtype=cfg.dtype_, name=name)(h)
    elif kind == "res":
        block_cls = ResBlock
        if cfg.use_checkpoint:
            block_cls = nn.remat(ResBlock, static_argnums=(3,))
        out = block_cls(
            out_channels=spec["out"],
            dropout=cfg.dropout,
            use_scale_shift_norm=cfg.use_scale_shift_norm,
            up=spec.get("up", False),
            down=spec.get("down", False),
            dtype=cfg.dtype_,
            name=name,
        )(h, emb, train)
    elif kind == "attn":
        block_cls = AttentionBlock
        if cfg.use_checkpoint:
            block_cls = nn.remat(AttentionBlock)
        out = block_cls(
            num_heads=spec["heads"],
            use_new_attention_order=cfg.use_new_attention_order,
            dtype=cfg.dtype_,
            name=name,
        )(sp.constrain_batch(h))
    elif kind == "down":
        out = Downsample(spec["out"], use_conv=cfg.conv_resample, dtype=cfg.dtype_, name=name)(h)
    elif kind == "up":
        out = Upsample(spec["out"], use_conv=cfg.conv_resample, dtype=cfg.dtype_, name=name)(h)
    else:
        raise ValueError(kind)
    return tp.constrain_channels(sp.constrain_spatial(out))


class _CfgView:
    """Adds the runtime compute dtype to the static config for layer building."""

    def __init__(self, cfg: UNetConfig, dtype):
        self._cfg = cfg
        self.dtype_ = dtype

    def __getattr__(self, k):
        return getattr(self._cfg, k)


class UNetModel(nn.Module):
    """The full ADM UNet (unet.py:396-664) + all input/conditioning variants.

    Call: model(x, timesteps, y=..., low_res=..., clip_feat=..., clip_feat2=...,
    img2=..., train=...) with NHWC x. Unused kwargs are ignored so one call
    signature serves every variant (the reference forwards accept **kwargs the
    same way).
    """

    config: UNetConfig
    dtype: Any = jnp.float32  # compute dtype for the torso (bf16 on TPU)

    @nn.compact
    def __call__(
        self,
        x,
        timesteps,
        y=None,
        low_res=None,
        clip_feat=None,
        clip_feat2=None,
        img2=None,
        train: bool = False,
        deep_cache=None,
        cache_mode: str = "off",
        cache_cut: int = 0,
    ):
        """cache_mode/cache_cut/deep_cache implement DeepCache-style block
        caching (Ma et al. 2023; see also Wimbauer et al., arXiv:2312.03209):
        low-resolution "deep" features evolve slowly across adjacent denoise
        steps, so the deep sub-UNet can be reused for several steps while the
        high-resolution shallow path is recomputed. Training-free and
        parameter-free — purely an evaluation-path choice.

          "off"      plain forward, returns the output (default)
          "full"     full forward; returns (out, deep_feature) where
                     deep_feature is the activation entering the first
                     SHALLOW output block (before its skip concat)
          "shallow"  recompute only input_blocks[:cut] and the last `cut`
                     output blocks, splicing `deep_cache` in for the deep
                     sub-UNet; returns (out, deep_cache)

        cache_cut = number of shallow input blocks; 0 picks the default cut
        below the full-resolution level (stem + num_res_blocks), where the
        bulk of per-step compute lives for large images.
        """
        cfg = self.config
        cfgv = _CfgView(cfg, self.dtype)
        ted = cfg.time_embed_dim

        # --- conditioning vector per variant -------------------------------
        if cfg.variant == "clip_feat":
            # Fix-forward: the reference's UNetModel_clip_feat crashes when
            # built unconditionally (clip_feat=None -> .squeeze() AttributeError,
            # unet_other.py:39); we fall back to plain-UNet behavior instead.
            if cfg.num_classes is not None:
                assert clip_feat is not None, "clip_feat-conditional model requires clip_feat"
                y = clip_feat.reshape(x.shape[0], -1).astype(jnp.float32)
        elif cfg.variant == "sr_img_feat":
            assert clip_feat is not None and clip_feat2 is not None and img2 is not None
            bias_feat = self.param(
                "bias_feat", nn.initializers.normal(1.0), (cfg.num_classes,), jnp.float32
            )
            y = (
                clip_feat.reshape(x.shape[0], -1).astype(jnp.float32)
                - clip_feat2.reshape(x.shape[0], -1).astype(jnp.float32)
                + bias_feat
            )
            x = jnp.concatenate([x, img2.astype(x.dtype)], axis=-1)
        elif cfg.variant == "super_res":
            assert low_res is not None
            upsampled = bilinear_resize(low_res.astype(x.dtype), (x.shape[1], x.shape[2]))
            x = jnp.concatenate([x, upsampled], axis=-1)
        elif cfg.variant == "spat_feat":
            # 512-d feature tiled x32 into two transposed 128x128 planes
            # (unet_other.py:19-22; hard-coded 128px like the reference).
            assert clip_feat is not None
            B = x.shape[0]
            plane = jnp.tile(clip_feat.reshape(B, 512).astype(x.dtype), (1, 32))
            plane = plane.reshape(B, 128, 128, 1)
            planeT = jnp.transpose(plane, (0, 2, 1, 3))
            x = jnp.concatenate([x, plane, planeT], axis=-1)

        assert x.shape[-1] == cfg.in_channels, (
            f"input channels {x.shape[-1]} != config {cfg.in_channels}"
        )

        # --- timestep + label embedding (f32, unet.py:470-479,649-653) -----
        # constrain_embedding pins after EACH stage: FSDP-sharded Dense
        # weights otherwise propagate their sharding into the tiny [B, ted]
        # activations and GSPMD falls back to involuntary rematerialization
        # on the in-between silu (tests/test_fsdp.py)
        emb = tp.constrain_embedding(
            Dense(ted, name="time_embed_0")(timestep_embedding(timesteps, cfg.model_channels))
        )
        emb = Dense(ted, name="time_embed_2")(silu(emb))
        if cfg.num_classes is not None:
            assert y is not None, "class-conditional model requires y"
            if cfg.label_emb_type == "embedding":
                emb = emb + nn.Embed(cfg.num_classes, ted, name="label_emb")(y)
            else:
                zero = cfg.label_emb_type == "mlp_zero"
                le = tp.constrain_embedding(
                    Dense(ted, zero=zero, name="label_emb_0")(y.astype(jnp.float32))
                )
                le = Dense(ted, zero=zero, name="label_emb_2")(silu(le))
                emb = emb + le
        else:
            assert y is None or cfg.variant == "unet", "y given to an unconditional model"
        emb = tp.constrain_embedding(emb)

        # --- UNet torso (bf16-capable) --------------------------------------
        input_blocks, middle_block, output_blocks, _ = build_plan(cfg)
        n_in = len(input_blocks)
        assert cache_mode in ("off", "full", "shallow"), cache_mode
        cut = cache_cut if cache_cut > 0 else cfg.num_res_blocks + 1
        if cache_mode != "off":
            assert 1 <= cut <= n_in, (cut, n_in)
            assert (cache_mode == "shallow") == (deep_cache is not None), (
                "deep_cache must be given exactly when cache_mode='shallow'"
            )
        h = tp.constrain_channels(sp.constrain_spatial(x.astype(self.dtype)))
        hs = []
        in_blocks = input_blocks[:cut] if cache_mode == "shallow" else input_blocks
        for i, block in enumerate(in_blocks):
            for j, spec in enumerate(block):
                h = _apply_layer(self, spec, f"input_blocks_{i}_{j}", h, emb, train, cfgv)
            hs.append(h)
        deep_out = None
        if cache_mode == "shallow":
            h = tp.constrain_channels(sp.constrain_spatial(deep_cache.astype(self.dtype)))
            out_start = n_in - cut
        else:
            for j, spec in enumerate(middle_block):
                h = _apply_layer(self, spec, f"middle_block_{j}", h, emb, train, cfgv)
            out_start = 0
        for i, block in enumerate(output_blocks[out_start:], start=out_start):
            if cache_mode == "full" and i == n_in - cut:
                deep_out = h
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            for j, spec in enumerate(block):
                h = _apply_layer(self, spec, f"output_blocks_{i}_{j}", h, emb, train, cfgv)
        # --- output head (f32, unet.py:613-617,663) -------------------------
        h = h.astype(x.dtype)
        h = GroupNorm32(name="out_norm")(h, activation="silu")
        out = Conv(cfg.out_channels, 3, zero=True, name="out_conv")(h)
        if cache_mode == "off":
            return out
        return out, (deep_out if cache_mode == "full" else deep_cache)


class EncoderUNetModel(nn.Module):
    """Half-UNet classifier/encoder with pooling head (unet.py:684-895)."""

    config: UNetConfig
    pool: str = "adaptive"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, train: bool = False):
        cfg = self.config
        cfgv = _CfgView(cfg, self.dtype)
        ted = cfg.time_embed_dim

        emb = tp.constrain_embedding(
            Dense(ted, name="time_embed_0")(timestep_embedding(timesteps, cfg.model_channels))
        )
        emb = Dense(ted, name="time_embed_2")(silu(emb))
        emb = tp.constrain_embedding(emb)

        input_blocks, middle_block, _, feature_size = build_plan(cfg)
        h = tp.constrain_channels(sp.constrain_spatial(x.astype(self.dtype)))
        results = []
        for i, block in enumerate(input_blocks):
            for j, spec in enumerate(block):
                h = _apply_layer(self, spec, f"input_blocks_{i}_{j}", h, emb, train, cfgv)
            if self.pool.startswith("spatial"):
                results.append(h.astype(x.dtype).mean(axis=(1, 2)))
        for j, spec in enumerate(middle_block):
            h = _apply_layer(self, spec, f"middle_block_{j}", h, emb, train, cfgv)

        if self.pool == "adaptive":
            h = h.astype(x.dtype)
            h = GroupNorm32(name="out_norm")(h, activation="silu")
            h = h.mean(axis=(1, 2), keepdims=True)
            h = Conv(cfg.out_channels, 1, zero=True, name="out_conv")(h)
            return h.reshape(h.shape[0], -1)
        elif self.pool == "attention":
            assert cfg.num_head_channels != -1
            h = h.astype(x.dtype)
            h = GroupNorm32(name="out_norm")(h, activation="silu")
            return AttentionPool2d(
                num_head_channels=cfg.num_head_channels,
                output_dim=cfg.out_channels,
                name="out_pool",
            )(h)
        elif self.pool in ("spatial", "spatial_v2"):
            results.append(h.astype(x.dtype).mean(axis=(1, 2)))
            h = jnp.concatenate(results, axis=-1)
            assert h.shape[-1] == feature_size
            h = Dense(2048, name="out_0")(h)
            if self.pool == "spatial_v2":
                h = silu(GroupNorm32(name="out_norm")(h[:, None, :]))[:, 0, :]
            else:
                h = jax.nn.relu(h)
            return Dense(cfg.out_channels, name="out_3")(h)
        raise NotImplementedError(f"unexpected pool: {self.pool}")
