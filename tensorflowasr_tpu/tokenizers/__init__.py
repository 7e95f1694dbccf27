"""Tokenizers: characters / wordpiece / sentencepiece.

Same three families and config surface as the reference
(``tensorflow_asr/tokenizers.py:41-51``). Tokenization is a host-side
preprocessing op here (the accelerator consumes int32 token ids); in-graph
detokenization for export uses per-token unicode-codepoint tables
(``detokenize_unicode_points``, reference :251-264).
"""

from __future__ import annotations

import logging

from tensorflowasr_tpu.configs import Config, DecoderConfig
from tensorflowasr_tpu.tokenizers.base import Tokenizer
from tensorflowasr_tpu.tokenizers.char import ENGLISH_CHARACTERS, CharTokenizer
from tensorflowasr_tpu.tokenizers.sentencepiece import SentencePieceTokenizer
from tensorflowasr_tpu.tokenizers.wordpiece import WordPieceTokenizer

logger = logging.getLogger(__name__)

TOKENIZER_TYPES = ("characters", "wordpiece", "sentencepiece")


def get(config: Config | DecoderConfig) -> Tokenizer:
    decoder_config = config.decoder_config if isinstance(config, Config) else config
    t = decoder_config.type
    if t == "sentencepiece":
        return SentencePieceTokenizer(decoder_config)
    if t == "wordpiece":
        return WordPieceTokenizer(decoder_config)
    if t == "characters":
        return CharTokenizer(decoder_config)
    raise ValueError(f"decoder_config.type must be in {TOKENIZER_TYPES}, received {t}")
