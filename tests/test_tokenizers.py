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


# ---------------------------------------------------------------- spm codec

REF_SP_DIR = "/root/reference/examples/datasets/librispeech/sentencepiece"


@pytest.mark.skipif(not __import__("os").path.isdir(REF_SP_DIR), reason="reference models not present")
def test_spm_parses_reference_model_and_matches_vocab_file():
    """The pure-Python ModelProto parser reads the reference's published
    .model files; pieces and scores match the sibling .vocab dump exactly."""
    import os

    from tensorflowasr_tpu.tokenizers.spm import SentencePieceModel, BPE, UNKNOWN

    m = SentencePieceModel.load(os.path.join(REF_SP_DIR, "train_bpe_1000.model"))
    assert len(m.pieces) == 1000
    assert m.model_type == BPE
    assert m.types[m.unk_id] == UNKNOWN and m.unk_id == 0
    assert m.unk_surface == ""  # reference trains with unk_surface=""
    with open(os.path.join(REF_SP_DIR, "train_bpe_1000.vocab"), encoding="utf-8") as f:
        for i, line in enumerate(f):
            piece, score = line.rstrip("\n").split("\t")
            assert m.pieces[i] == piece
            assert abs(m.scores[i] - float(score)) < 1e-6


@pytest.mark.skipif(not __import__("os").path.isdir(REF_SP_DIR), reason="reference models not present")
def test_spm_bpe_encode_roundtrip_on_reference_model():
    import os
    import random
    import string

    from tensorflowasr_tpu.tokenizers.spm import SentencePieceModel

    m = SentencePieceModel.load(os.path.join(REF_SP_DIR, "train_bpe_1000.model"))
    assert [m.pieces[i] for i in m.encode("the quick brown fox")] == ["▁the", "▁qu", "ick", "▁br", "own", "▁fo", "x"]
    rnd = random.Random(0)
    for _ in range(100):
        text = " ".join("".join(rnd.choices(string.ascii_lowercase + "'", k=rnd.randint(1, 12))) for _ in range(rnd.randint(1, 8)))
        assert m.decode(m.encode(text)) == text


def test_spm_unigram_viterbi_matches_hf_unigram():
    """Our Viterbi == HF tokenizers' Unigram (same (piece, score) vocab)."""
    import json
    import random

    from tokenizers import Tokenizer as HFTokenizer
    from tokenizers import models, pre_tokenizers, trainers

    from tensorflowasr_tpu.tokenizers.spm import CONTROL, NORMAL, UNKNOWN, UNIGRAM, SentencePieceModel

    hf = HFTokenizer(models.Unigram())
    trainer = trainers.UnigramTrainer(vocab_size=100, special_tokens=["<pad>", "<unk>"], unk_token="<unk>", show_progress=False)
    hf.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁", prepend_scheme="first")
    hf.train_from_iterator(CORPUS, trainer=trainer)
    vocab = json.loads(hf.to_str())["model"]["vocab"]
    pieces = [p for p, _ in vocab]
    types = [UNKNOWN if p == "<unk>" else CONTROL if p == "<pad>" else NORMAL for p in pieces]
    m = SentencePieceModel(pieces=pieces, scores=[s for _, s in vocab], types=types, model_type=UNIGRAM, unk_surface="")
    rnd = random.Random(7)
    words = ["hello", "world", "the", "quick", "brown", "recognition", "jax", "zzqx", "a"]
    for _ in range(200):
        text = " ".join(rnd.choices(words, k=rnd.randint(1, 8)))
        assert m.encode(text) == hf.encode(text).ids, text


def test_spm_serialize_parse_identity():
    from tensorflowasr_tpu.tokenizers.spm import NORMAL, UNKNOWN, UNIGRAM, SentencePieceModel

    m = SentencePieceModel(
        pieces=["<unk>", "▁a", "b", "▁ab"],
        scores=[0.0, -1.5, -2.25, -0.5],
        types=[UNKNOWN, NORMAL, NORMAL, NORMAL],
        model_type=UNIGRAM,
        unk_surface="",
    )
    m2 = SentencePieceModel.parse(m.serialize())
    assert m2.pieces == m.pieces and m2.types == m.types and m2.model_type == m.model_type
    assert all(abs(a - b) < 1e-7 for a, b in zip(m2.scores, m.scores))
    assert m2.unk_surface == "" and m2.add_dummy_prefix and m2.escape_whitespaces
    assert m2.encode("ab a") == m.encode("ab a")


def test_sentencepiece_build_writes_real_model_protobuf(tmp_path):
    """build() exports a genuine .model protobuf; make() loads it natively."""
    dc = DecoderConfig({"type": "sentencepiece", "vocab_size": 80, "vocabulary": str(tmp_path / "sp.model")})
    tok = tokenizers.get(dc)
    tok.build(FakeDataset(CORPUS))
    assert (tmp_path / "sp.model").exists()
    tok2 = tokenizers.get(dc)
    tok2.make()
    assert tok2._spm is not None  # native path, not the HF json fallback
    assert tok2.num_classes == tok.num_classes
    for text in ["hello world", "the quick brown fox", "jax and xla compile everything"]:
        ids, ids2 = tok.tokenize(text), tok2.tokenize(text)
        np.testing.assert_array_equal(ids, ids2)
        assert tok2.detokenize(ids2) == text
        assert 0 not in ids2


@pytest.mark.skipif(not __import__("os").path.isdir(REF_SP_DIR), reason="reference models not present")
def test_sentencepiece_loads_reference_vocabulary_unmodified():
    """A reference config pointing at a published .model works verbatim."""
    import os

    dc = DecoderConfig(
        {
            "type": "sentencepiece",
            "blank_index": 0,
            "unknown_index": 0,
            "model_type": "bpe",
            "vocabulary": os.path.join(REF_SP_DIR, "train_bpe_256.model"),
            "vocab_size": 256,
        }
    )
    tok = tokenizers.get(dc)
    tok.make()
    assert tok.num_classes == 256
    text = "the quick brown fox jumps over the lazy dog"
    ids = tok.tokenize(text)
    assert tok.detokenize(ids) == text
    pts = tok.detokenize_unicode_points(ids)
    assert "".join(chr(c) for c in pts.reshape(-1) if c != 0).strip() == text


REF_WP_DIR = "/root/reference/examples/datasets/librispeech/wordpiece"


@pytest.mark.skipif(not __import__("os").path.isdir(REF_WP_DIR), reason="reference models not present")
def test_wordpiece_loads_reference_plaintext_vocab():
    import os

    dc = DecoderConfig(
        {
            "type": "wordpiece",
            "blank_index": 0,
            "unknown_token": "<unk>",
            "unknown_index": 0,
            "vocabulary": os.path.join(REF_WP_DIR, "train_1000.vocab"),
            "keep_whitespace": False,
            "vocab_size": 1000,
        }
    )
    tok = tokenizers.get(dc)
    tok.make()
    assert tok.num_classes == 998  # the published vocab file's line count
    text = "the quick brown fox jumps over the lazy dog"
    ids = tok.tokenize(text)
    assert len(ids) > 0
    assert tok.detokenize(ids) == text


@pytest.mark.skipif(not __import__("os").path.isdir(REF_WP_DIR), reason="reference models not present")
def test_wordpiece_loads_reference_whitespace_vocab():
    import os

    dc = DecoderConfig(
        {
            "type": "wordpiece",
            "blank_index": 0,
            "unknown_token": "<unk>",
            "unknown_index": 0,
            "vocabulary": os.path.join(REF_WP_DIR, "train_1000_whitespace.vocab"),
            "keep_whitespace": True,
            "vocab_size": 1000,
        }
    )
    tok = tokenizers.get(dc)
    tok.make()
    text = "the quick brown fox"
    ids = tok.tokenize(text)
    assert tok.detokenize(ids) == text
