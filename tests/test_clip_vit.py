"""CLIP ViT-B/32 parity vs a randomly initialized HF transformers CLIPModel.

No pretrained weights are available offline; numerical parity is validated by
exporting a random-init torch CLIPModel's state_dict through the importer and
comparing forwards — this pins every layout/transpose/activation choice.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guided_diffusion_clip_tpu.models.clip_vit import (
    CLIPConfig,
    CLIPTextEncoder,
    CLIPVisionEncoder,
    clip_guidance_cond_fn,
    import_clip_torch_state_dict,
    preprocess_for_clip,
)

TINY = CLIPConfig(
    image_size=32, patch_size=16, vision_width=64, vision_layers=2, vision_heads=4,
    vocab_size=100, context_length=12, text_width=32, text_layers=2, text_heads=2,
    embed_dim=16,
)


def make_hf_model(cfg: CLIPConfig):
    import torch
    from transformers import CLIPConfig as HFConfig
    from transformers import CLIPModel
    from transformers import CLIPTextConfig, CLIPVisionConfig

    torch.manual_seed(0)
    hf_cfg = HFConfig.from_text_vision_configs(
        CLIPTextConfig(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.text_width,
            intermediate_size=4 * cfg.text_width,
            num_hidden_layers=cfg.text_layers,
            num_attention_heads=cfg.text_heads,
            max_position_embeddings=cfg.context_length,
            hidden_act="quick_gelu",
            # real CLIP's EOT (49407) is the highest id, so argmax == eos
            # pooling; mirror that relation in the tiny config.
            eos_token_id=cfg.vocab_size - 1,
        ),
        CLIPVisionConfig(
            hidden_size=cfg.vision_width,
            intermediate_size=4 * cfg.vision_width,
            num_hidden_layers=cfg.vision_layers,
            num_attention_heads=cfg.vision_heads,
            image_size=cfg.image_size,
            patch_size=cfg.patch_size,
            hidden_act="quick_gelu",
        ),
        projection_dim=cfg.embed_dim,
    )
    model = CLIPModel(hf_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def pair():
    model = make_hf_model(TINY)
    vision, text, logit_scale = import_clip_torch_state_dict(model.state_dict(), TINY)
    return model, vision, text


@pytest.mark.slow
class TestVisionParity:
    def test_image_embed_matches(self, pair):
        import torch

        hf, vision, _ = pair
        rs = np.random.RandomState(0)
        pixels = rs.randn(2, TINY.image_size, TINY.image_size, 3).astype(np.float32)

        enc = CLIPVisionEncoder(TINY)
        ours = np.asarray(enc.apply({"params": vision}, jnp.array(pixels)))
        with torch.no_grad():
            theirs = hf.get_image_features(
                pixel_values=torch.from_numpy(np.moveaxis(pixels, -1, 1).copy())
            ).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


class TestTextParity:
    def test_text_embed_matches(self, pair):
        import torch

        hf, _, text = pair
        rs = np.random.RandomState(1)
        # EOT = highest id, placed mid-sequence (argmax pooling check)
        ids = rs.randint(1, TINY.vocab_size - 1, (2, TINY.context_length)).astype(np.int32)
        ids[0, 5] = TINY.vocab_size - 1
        ids[1, 9] = TINY.vocab_size - 1

        enc = CLIPTextEncoder(TINY)
        ours = np.asarray(enc.apply({"params": text}, jnp.array(ids)))
        with torch.no_grad():
            theirs = hf.get_text_features(input_ids=torch.from_numpy(ids).long()).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
class TestGuidance:
    def test_clip_cond_fn_gradient(self, pair):
        _, vision, _ = pair
        enc = CLIPVisionEncoder(TINY)

        def embed(pixels):
            return enc.apply({"params": vision}, pixels)

        target = jnp.ones((TINY.embed_dim,)) / np.sqrt(TINY.embed_dim)
        cond_fn = clip_guidance_cond_fn(embed, target, scale=2.0, clip_image_size=TINY.image_size)
        x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
        g = cond_fn(x, jnp.array([3, 4]))
        assert g.shape == x.shape
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_preprocess_range(self):
        x = jnp.zeros((1, 64, 64, 3))  # mid-gray in [-1,1]
        p = preprocess_for_clip(x, image_size=32)
        assert p.shape == (1, 32, 32, 3)
        expected = (0.5 - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array(
            [0.26862954, 0.26130258, 0.27577711]
        )
        np.testing.assert_allclose(np.asarray(p[0, 0, 0]), expected, rtol=1e-5)
