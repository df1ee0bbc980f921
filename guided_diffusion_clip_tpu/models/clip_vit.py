"""CLIP ViT-B/32 image + text encoders in flax (for CLIP guidance).

The reference conditions on precomputed CLIP ViT-B/32 embeddings
(image_datasets.py:111) and its model card describes CLIP-guided sampling
(model-card.md:45-48). This module provides the encoders natively so that
  - datasets can be embedded without torch/OpenAI-CLIP at hand, and
  - a CLIP similarity gradient can ride the same cond_fn slot as the
    classifier (jax.grad through the image encoder inside the scanned loop).

Architecture matches openai/clip-vit-base-patch32 (HF `CLIPModel`):
pre-LN transformer, quickGELU, learned position embeddings, class token
(vision) / causal mask + EOT pooling (text), linear projections to the
512-d joint space. Weights import from an HF CLIPModel state_dict or the
original OpenAI CLIP .pt via `import_clip_torch_state_dict`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    # vision
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    # text
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    # joint
    embed_dim: int = 512


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class MHA(nn.Module):
    """Standard multi-head attention with combined projections (HF layout)."""

    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        B, T, C = x.shape
        d = C // self.heads
        q = nn.Dense(C, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(C, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(C, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(B, T, self.heads, d)
        k = k.reshape(B, T, self.heads, d)
        v = v.reshape(B, T, self.heads, d)
        logits = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(d).astype(x.dtype)
        if mask is not None:
            logits = logits + mask
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", w, v).reshape(B, T, C)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(out)


class TransformerBlock(nn.Module):
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
        x = x + MHA(self.heads, dtype=self.dtype, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        h = nn.Dense(4 * x.shape[-1], dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPVisionEncoder(nn.Module):
    config: CLIPConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels):
        """pixels: NHWC, already CLIP-normalized. Returns (B, embed_dim)."""
        cfg = self.config
        B = pixels.shape[0]
        W = cfg.vision_width
        n_patches = (cfg.image_size // cfg.patch_size) ** 2

        h = nn.Conv(
            W, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False, dtype=self.dtype, name="patch_embedding",
        )(pixels.astype(self.dtype))
        h = h.reshape(B, n_patches, W)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (W,))
        h = jnp.concatenate([jnp.broadcast_to(cls.astype(h.dtype), (B, 1, W)), h], axis=1)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (n_patches + 1, W)
        )
        h = h + pos.astype(h.dtype)
        h = nn.LayerNorm(epsilon=1e-5, name="pre_layernorm")(h)
        for i in range(cfg.vision_layers):
            h = TransformerBlock(cfg.vision_heads, dtype=self.dtype, name=f"layer_{i}")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="post_layernorm")(h[:, 0])
        return nn.Dense(cfg.embed_dim, use_bias=False, name="visual_projection")(
            h.astype(jnp.float32)
        )


class CLIPTextEncoder(nn.Module):
    config: CLIPConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, token_ids):
        """token_ids: (B, context_length) int32. Returns (B, embed_dim).

        Pooled at the argmax token id (the EOT token has the highest id),
        matching HF CLIPTextTransformer semantics.
        """
        cfg = self.config
        B, T = token_ids.shape
        h = nn.Embed(cfg.vocab_size, cfg.text_width, name="token_embedding")(token_ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01), (cfg.context_length, cfg.text_width)
        )
        h = h + pos[None, :T].astype(h.dtype)
        causal = jnp.triu(jnp.full((T, T), -jnp.inf, dtype=jnp.float32), k=1)[None, None]
        for i in range(cfg.text_layers):
            h = TransformerBlock(cfg.text_heads, dtype=self.dtype, name=f"layer_{i}")(h, causal)
        h = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(h)
        eot = jnp.argmax(token_ids, axis=-1)
        pooled = h[jnp.arange(B), eot]
        return nn.Dense(cfg.embed_dim, use_bias=False, name="text_projection")(
            pooled.astype(jnp.float32)
        )


def preprocess_for_clip(x, image_size: int = 224):
    """[-1,1] NHWC image -> CLIP-normalized pixels at the CLIP resolution.

    Differentiable (bilinear resize), so guidance gradients flow through it.
    """
    B, H, W, C = x.shape
    pixels = (x + 1.0) / 2.0
    if (H, W) != (image_size, image_size):
        pixels = jax.image.resize(pixels, (B, image_size, image_size, C), method="bilinear")
    return (pixels - IMAGE_MEAN) / IMAGE_STD


def clip_guidance_cond_fn(
    image_embed_fn,
    target_embed,
    scale: float = 1.0,
    *,
    clip_image_size: int = 224,
    sched=None,
    mean_type=None,
    var_type=None,
    model_fn=None,
    use_pred_xstart: bool = False,
):
    """Guidance gradient: d/dx [cosine(embed(x'), target)] * scale.

    x' is the noisy image by default (the classifier-guidance convention —
    works when CLIP was trained/finetuned on noised images); with
    use_pred_xstart=True the gradient flows through the model's x0 prediction
    instead (the public CLIP-guided-diffusion technique for a vanilla CLIP),
    which requires sched/mean_type/var_type/model_fn to rebuild pred_xstart.
    """
    target = target_embed / jnp.linalg.norm(target_embed, axis=-1, keepdims=True)

    def similarity(x_img):
        emb = image_embed_fn(preprocess_for_clip(x_img, clip_image_size))
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return jnp.sum(emb * target)

    if not use_pred_xstart:

        def cond_fn(x, t, **kwargs):
            return jax.grad(similarity)(x) * scale

        return cond_fn

    assert sched is not None and model_fn is not None

    from ..diffusion import gaussian as G

    def cond_fn(x, t, **kwargs):
        def obj(x_in):
            out = G.p_mean_variance(
                sched, model_fn, x_in, t,
                mean_type=mean_type, var_type=var_type,
                clip_denoised=False, model_kwargs=kwargs,
            )
            return similarity(out.pred_xstart)

        return jax.grad(obj)(x) * scale

    return cond_fn


# ---------------------------------------------------------------------------
# Weight import (HF CLIPModel + original OpenAI CLIP .pt)
# ---------------------------------------------------------------------------


def _ln(sd, prefix):
    return {"scale": np.asarray(sd[prefix + ".weight"]), "bias": np.asarray(sd[prefix + ".bias"])}


def _dense(sd, prefix, transpose=True, bias=True):
    w = np.asarray(sd[prefix + ".weight"])
    out = {"kernel": w.T if transpose else w}
    if bias:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _block_from_hf(sd, p):
    return {
        "layer_norm1": _ln(sd, f"{p}.layer_norm1"),
        "layer_norm2": _ln(sd, f"{p}.layer_norm2"),
        "self_attn": {
            "q_proj": _dense(sd, f"{p}.self_attn.q_proj"),
            "k_proj": _dense(sd, f"{p}.self_attn.k_proj"),
            "v_proj": _dense(sd, f"{p}.self_attn.v_proj"),
            "out_proj": _dense(sd, f"{p}.self_attn.out_proj"),
        },
        "fc1": _dense(sd, f"{p}.mlp.fc1"),
        "fc2": _dense(sd, f"{p}.mlp.fc2"),
    }


def import_clip_torch_state_dict(state_dict, cfg: CLIPConfig = CLIPConfig()):
    """HF `CLIPModel.state_dict()` -> (vision_params, text_params, logit_scale)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)) for k, v in state_dict.items()}
    vp = "vision_model"
    vision = {
        "patch_embedding": {
            # conv (W, 3, P, P) -> (P, P, 3, W)
            "kernel": np.transpose(sd[f"{vp}.embeddings.patch_embedding.weight"], (2, 3, 1, 0)),
        },
        "class_embedding": sd[f"{vp}.embeddings.class_embedding"],
        "position_embedding": sd[f"{vp}.embeddings.position_embedding.weight"],
        "pre_layernorm": _ln(sd, f"{vp}.pre_layrnorm")
        if f"{vp}.pre_layrnorm.weight" in sd
        else _ln(sd, f"{vp}.pre_layernorm"),
        "post_layernorm": _ln(sd, f"{vp}.post_layernorm"),
        "visual_projection": _dense(sd, "visual_projection", bias=False),
    }
    for i in range(cfg.vision_layers):
        vision[f"layer_{i}"] = _block_from_hf(sd, f"{vp}.encoder.layers.{i}")

    tp = "text_model"
    text = {
        "token_embedding": {"embedding": sd[f"{tp}.embeddings.token_embedding.weight"]},
        "position_embedding": sd[f"{tp}.embeddings.position_embedding.weight"],
        "final_layer_norm": _ln(sd, f"{tp}.final_layer_norm"),
        "text_projection": _dense(sd, "text_projection", bias=False),
    }
    for i in range(cfg.text_layers):
        text[f"layer_{i}"] = _block_from_hf(sd, f"{tp}.encoder.layers.{i}")

    logit_scale = float(sd["logit_scale"])
    return vision, text, logit_scale


def import_openai_clip_pt(state_dict, cfg: CLIPConfig = CLIPConfig()):
    """Original OpenAI CLIP .pt (the format the fork's precomputed dicts came
    from) -> (vision_params, text_params, logit_scale).

    The OpenAI layout packs qkv as in_proj_weight per block and names the
    towers `visual.transformer.resblocks.*` / `transformer.resblocks.*`.
    """
    sd = {k: (v.detach().cpu().float().numpy() if hasattr(v, "detach") else np.asarray(v)) for k, v in state_dict.items()}

    def block_from_openai(p, width):
        in_w = sd[f"{p}.attn.in_proj_weight"]
        in_b = sd[f"{p}.attn.in_proj_bias"]
        qw, kw, vw = np.split(in_w, 3, axis=0)
        qb, kb, vb = np.split(in_b, 3, axis=0)
        return {
            "layer_norm1": {"scale": sd[f"{p}.ln_1.weight"], "bias": sd[f"{p}.ln_1.bias"]},
            "layer_norm2": {"scale": sd[f"{p}.ln_2.weight"], "bias": sd[f"{p}.ln_2.bias"]},
            "self_attn": {
                "q_proj": {"kernel": qw.T, "bias": qb},
                "k_proj": {"kernel": kw.T, "bias": kb},
                "v_proj": {"kernel": vw.T, "bias": vb},
                "out_proj": {"kernel": sd[f"{p}.attn.out_proj.weight"].T, "bias": sd[f"{p}.attn.out_proj.bias"]},
            },
            "fc1": {"kernel": sd[f"{p}.mlp.c_fc.weight"].T, "bias": sd[f"{p}.mlp.c_fc.bias"]},
            "fc2": {"kernel": sd[f"{p}.mlp.c_proj.weight"].T, "bias": sd[f"{p}.mlp.c_proj.bias"]},
        }

    vision = {
        "patch_embedding": {"kernel": np.transpose(sd["visual.conv1.weight"], (2, 3, 1, 0))},
        "class_embedding": sd["visual.class_embedding"],
        "position_embedding": sd["visual.positional_embedding"],
        "pre_layernorm": {"scale": sd["visual.ln_pre.weight"], "bias": sd["visual.ln_pre.bias"]},
        "post_layernorm": {"scale": sd["visual.ln_post.weight"], "bias": sd["visual.ln_post.bias"]},
        "visual_projection": {"kernel": sd["visual.proj"]},  # stored (W, D) already
    }
    for i in range(cfg.vision_layers):
        vision[f"layer_{i}"] = block_from_openai(f"visual.transformer.resblocks.{i}", cfg.vision_width)

    text = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "position_embedding": sd["positional_embedding"],
        "final_layer_norm": {"scale": sd["ln_final.weight"], "bias": sd["ln_final.bias"]},
        "text_projection": {"kernel": sd["text_projection"]},  # (W, D)
    }
    for i in range(cfg.text_layers):
        text[f"layer_{i}"] = block_from_openai(f"transformer.resblocks.{i}", cfg.text_width)

    return vision, text, float(sd["logit_scale"])
