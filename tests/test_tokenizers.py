"""Tokenizer round-trip and normalization tests."""

import numpy as np
import pytest

from tensorflowasr_tpu.configs import DecoderConfig
from tensorflowasr_tpu import tokenizers
from tensorflowasr_tpu.tokenizers.base import Tokenizer


class FakeDataset:
    """Minimal AbstractDataset stand-in for vocab building."""

    name = "fake"

    def __init__(self, texts):
        self.texts = texts
        self.num_entries = len(texts)

    def read_entries(self):
        pass

    def vocab_generator(self):
        yield from self.texts


CORPUS = [
    "hello world",
    "the quick brown fox jumps over the lazy dog",
    "speech recognition on tensor processing units",
    "jax and xla compile everything",
    "hello there how are you doing today",
] * 20


def test_normalize_text():
    dc = DecoderConfig({})
    out = Tokenizer.normalize_text("  Hello\tWORLD⁇  x​y ", dc)
    assert out == "hello world x y"


def test_char_tokenizer_roundtrip():
    tok = tokenizers.get(DecoderConfig({"type": "characters"}))
    tok.make()
    assert tok.num_classes == 29
    assert tok.blank == 0
    ids = tok.tokenize("hello world")
    assert ids.dtype == np.int32
    assert tok.detokenize(ids) == "hello world"
    # prepand blank
    p = tok.prepand_blank(ids)
    assert p[0] == tok.blank and len(p) == len(ids) + 1
    # -1 normalization → blank → empty string
    assert tok.detokenize(np.asarray([-1, 9, 6, 13, 13, 16])) == "hello"


def test_char_tokenizer_upoints():
    tok = tokenizers.get(DecoderConfig({"type": "characters"}))
    tok.make()
    up = tok.upoints
    assert up.shape[0] == 29
    ids = tok.tokenize("ab c")
    pts = tok.detokenize_unicode_points(ids)
    chars = "".join(chr(c) for c in pts.reshape(-1) if c != 0)
    assert chars == "ab c"


def test_char_build_vocab(tmp_path):
    dc = DecoderConfig({"type": "characters", "vocabulary": str(tmp_path / "vocab.txt")})
    tok = tokenizers.get(dc)
    tok.build(FakeDataset(["abc xyz", "xyz"]))
    tok.make()
    assert tok.tokens[0] == ""  # blank
    ids = tok.tokenize("abc xyz")
    assert tok.detokenize(ids) == "abc xyz"


def test_sentencepiece_roundtrip(tmp_path):
    dc = DecoderConfig({"type": "sentencepiece", "vocab_size": 80, "vocabulary": str(tmp_path / "sp.model")})
    tok = tokenizers.get(dc)
    tok.build(FakeDataset(CORPUS))
    assert tok.blank == 0
    assert tok.tokens[0] == "<pad>"
    ids = tok.tokenize("hello world")
    assert len(ids) > 0
    assert 0 not in ids  # blank never emitted
    assert tok.detokenize(ids) == "hello world"
    # reload from file
    tok2 = tokenizers.get(dc)
    tok2.make()
    assert tok2.detokenize(tok2.tokenize("the quick brown fox")) == "the quick brown fox"


def test_sentencepiece_upoints(tmp_path):
    dc = DecoderConfig({"type": "sentencepiece", "vocab_size": 80, "vocabulary": str(tmp_path / "sp.model")})
    tok = tokenizers.get(dc)
    tok.build(FakeDataset(CORPUS))
    ids = tok.tokenize("hello world")
    pts = tok.detokenize_unicode_points(ids)
    text = "".join(chr(c) for c in pts.reshape(-1) if c != 0).strip()
    assert text == "hello world"


def test_wordpiece_roundtrip(tmp_path):
    dc = DecoderConfig({"type": "wordpiece", "vocab_size": 120, "vocabulary": str(tmp_path / "wp.json")})
    tok = tokenizers.get(dc)
    tok.build(FakeDataset(CORPUS))
    assert tok.blank == 0
    ids = tok.tokenize("hello world")
    assert tok.detokenize(ids) == "hello world"


def test_wordpiece_upoints(tmp_path):
    dc = DecoderConfig({"type": "wordpiece", "vocab_size": 120, "vocabulary": str(tmp_path / "wp.json")})
    tok = tokenizers.get(dc)
    tok.build(FakeDataset(CORPUS))
    ids = tok.tokenize("hello world")
    pts = tok.detokenize_unicode_points(ids)
    text = "".join(chr(c) for c in pts.reshape(-1) if c != 0).strip()
    assert text == "hello world"


def test_wordpiece_keep_whitespace_roundtrip(tmp_path):
    dc = DecoderConfig({"type": "wordpiece", "vocab_size": 150, "keep_whitespace": True, "vocabulary": str(tmp_path / "wpk.json")})
    tok = tokenizers.get(dc)
    tok.build(FakeDataset(CORPUS))
    ids = tok.tokenize("hello world")
    assert tok.detokenize(ids) == "hello world"
    pts = tok.detokenize_unicode_points(ids)
    assert "".join(chr(c) for c in pts.reshape(-1) if c != 0).strip() == "hello world"
