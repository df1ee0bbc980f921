"""CLIP BPE tokenizer behavior with a toy merges file."""

import gzip

import numpy as np
import pytest

from guided_diffusion_clip_tpu.models.clip_tokenizer import (
    SimpleTokenizer,
    bytes_to_unicode,
)


@pytest.fixture
def toy_bpe(tmp_path):
    # header line + a few merges (CLIP format: first line is a version comment)
    merges = [
        "#version: toy",
        "h e",
        "l l",
        "he ll",
        "o</w> x",   # unused
        "hell o</w>",
    ]
    p = tmp_path / "toy_vocab.txt.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges))
    return str(p)


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


class TestTokenizer:
    def test_encode_decode_roundtrip(self, toy_bpe):
        tok = SimpleTokenizer(toy_bpe, context_length=16)
        ids = tok.encode("hello world")
        assert tok.decode(ids).strip() == "hello world"

    def test_merges_apply(self, toy_bpe):
        tok = SimpleTokenizer(toy_bpe, context_length=16)
        # "hello" -> merges h+e, l+l, he+ll, hell+o</w> => one token
        assert tok.bpe("hello") == "hello</w>"

    def test_call_pads_and_wraps(self, toy_bpe):
        tok = SimpleTokenizer(toy_bpe, context_length=8)
        out = tok(["hello"])
        assert out.shape == (1, 8)
        sot = tok.encoder["<|startoftext|>"]
        eot = tok.encoder["<|endoftext|>"]
        assert out[0, 0] == sot
        assert eot in out[0]
        assert out[0, -1] == 0 or out[0, -1] == eot  # padded

    def test_truncation(self, toy_bpe):
        tok = SimpleTokenizer(toy_bpe, context_length=5)
        out = tok("a b c d e f g h i j")
        assert out.shape == (1, 5)
        assert out[0, -1] == tok.encoder["<|endoftext|>"]

    def test_missing_vocab_raises(self):
        with pytest.raises(FileNotFoundError):
            SimpleTokenizer("/nonexistent/vocab.gz")
