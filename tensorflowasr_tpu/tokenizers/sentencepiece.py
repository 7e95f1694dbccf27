"""SentencePiece-style subword tokenizer (unigram / BPE) via HF ``tokenizers``.

Reference parity: ``SentencePieceTokenizer`` (tensorflow_asr/tokenizers.py:267-341)
— a unigram (default) or BPE model trained on dataset transcripts with
metaspace (▁) whitespace handling, blank/pad at index 0, <unk> at index 1.
The Google ``sentencepiece`` binary lib is replaced by the HF Rust trainer,
which implements the same unigram-LM training algorithm.
"""

from __future__ import annotations

import os

import numpy as np
from tokenizers import Tokenizer as HFTokenizer
from tokenizers import decoders, models, pre_tokenizers, trainers

from tensorflowasr_tpu.configs import DecoderConfig
from tensorflowasr_tpu.tokenizers.base import Tokenizer
from tensorflowasr_tpu.utils import file_util

PAD = "<pad>"  # blank == pad == 0, as in the reference sentencepiece setup
UNK = "<unk>"


class SentencePieceTokenizer(Tokenizer):
    def __init__(self, decoder_config: DecoderConfig):
        super().__init__(decoder_config)
        self._hf: HFTokenizer | None = None

    def _vocab_path(self) -> str:
        path = self.decoder_config.vocabulary
        if path and path.endswith(".model"):
            # reference configs point at sentencepiece .model files; our
            # artifact is a tokenizers json alongside the same stem
            path = path[: -len(".model")] + ".json"
        return file_util.preprocess_paths(path)

    def make(self):
        path = self._vocab_path()
        if not path or not os.path.exists(path):
            raise FileNotFoundError(f"sentencepiece model not found: {path} — run build() first")
        self._hf = HFTokenizer.from_file(path)
        self._finish_init()

    def _finish_init(self):
        vocab = self._hf.get_vocab()
        self.num_classes = len(vocab)
        self.tokens = [""] * self.num_classes
        for tok, idx in vocab.items():
            self.tokens[idx] = tok
        self.blank = self.decoder_config.blank_index
        self.initialized = True

    def build(self, *datasets):
        model_type = (self.decoder_config.model_type or "unigram").lower()
        if model_type == "bpe":
            hf = HFTokenizer(models.BPE(unk_token=UNK))
            trainer = trainers.BpeTrainer(
                vocab_size=self.decoder_config.vocab_size,
                special_tokens=[PAD, UNK],
                show_progress=False,
            )
        else:
            hf = HFTokenizer(models.Unigram())
            trainer = trainers.UnigramTrainer(
                vocab_size=self.decoder_config.vocab_size,
                special_tokens=[PAD, UNK],
                unk_token=UNK,
                max_piece_length=self.decoder_config.max_sentencepiece_length,
                n_sub_iterations=max(2, self.decoder_config.num_iterations),
                show_progress=False,
            )
        hf.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁", prepend_scheme="first")
        hf.decoder = decoders.Metaspace(replacement="▁", prepend_scheme="first")
        hf.train_from_iterator(self.generator(*datasets), trainer=trainer)
        path = self._vocab_path()
        hf.save(path)
        self._hf = hf
        self._finish_init()

    def tokenize(self, text: str) -> np.ndarray:
        text = self.normalize_text(text, self.decoder_config)
        ids = self._hf.encode(text).ids
        return np.asarray(ids, np.int32)

    def detokenize(self, indices) -> str:
        indices = self.normalize_indices(indices)
        ids = [int(i) for i in np.asarray(indices).reshape(-1) if int(i) != self.blank]
        return self._hf.decode(ids, skip_special_tokens=True).strip()

    def _token_text_for_upoints(self, index: int) -> str:
        tok = self.tokens[index]
        if tok in (PAD, UNK):
            return ""
        return tok.replace("▁", " ")
