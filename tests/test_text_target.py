"""Offline text-target path: vendored tiny BPE vocab -> tokenizer -> CLIP
text encoder -> guidance target embedding (VERDICT round-1 item 9)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from guided_diffusion_clip_tpu.models.clip_tokenizer import SimpleTokenizer
from guided_diffusion_clip_tpu.models.clip_vit import CLIPConfig, CLIPTextEncoder

VOCAB = os.path.join(os.path.dirname(__file__), "assets", "tiny_bpe_vocab.txt.gz")


def test_vendored_vocab_tokenizes():
    tok = SimpleTokenizer(bpe_path=VOCAB, context_length=12)
    ids = tok(["the cat and the dog", "a thing"])
    assert ids.shape == (2, 12) and ids.dtype == np.int32
    sot, eot = tok.encoder["<|startoftext|>"], tok.encoder["<|endoftext|>"]
    assert ids[0, 0] == sot and eot in ids[0]
    # merges fire: "the" uses the vendored th/the</w> merges -> single token
    assert tok.encoder["the</w>"] in ids[0]
    # roundtrip through decode
    assert "the cat and the dog" in tok.decode(ids[0][1:]).strip()


def test_text_encoder_produces_guidance_target():
    tok = SimpleTokenizer(bpe_path=VOCAB, context_length=12)
    cfg = CLIPConfig(
        image_size=32, patch_size=16, vision_width=64, vision_layers=2,
        vision_heads=4, vocab_size=len(tok.encoder), context_length=12,
        text_width=32, text_layers=2, text_heads=2, embed_dim=16,
    )
    enc = CLIPTextEncoder(cfg)
    ids = jnp.asarray(tok("a photo of a cat"))
    params = enc.init(jax.random.key(0), ids)["params"]
    target = enc.apply({"params": params}, ids)[0]
    assert target.shape == (16,)
    assert np.isfinite(np.asarray(target)).all()
    # different prompt -> different embedding (tokenizer actually matters)
    other = enc.apply({"params": params}, jnp.asarray(tok("the dog in the rain")))[0]
    assert not np.allclose(np.asarray(target), np.asarray(other))
