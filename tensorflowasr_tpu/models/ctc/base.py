"""CTC model: encoder + dense vocab head.

Structure parity with the reference (``tensorflow_asr/models/ctc/base_ctc.py:22-149``):
forward = feature extraction → encoder → vocab Dense; greedy decode replaces
``tf.nn.ctc_greedy_decoder`` (:102-124) and beam replaces
``tf.nn.ctc_beam_search_decoder`` (:128-149) with the batched JAX decoders
in ``ops/ctc_decode.py``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tensorflowasr_tpu import schemas
from tensorflowasr_tpu.models.layers.feature_extraction import FeatureExtraction
from tensorflowasr_tpu.ops import ctc_decode


class CtcModel(nn.Module):
    """Generic CTC over any encoder; subclasses provide ``make_encoder``."""

    speech_config: dict
    encoder_config: dict
    blank: int = 0
    vocab_size: int = 29
    dtype: Any = jnp.float32

    def make_encoder(self) -> nn.Module:
        raise NotImplementedError

    def setup(self):
        self.feature_extraction = FeatureExtraction(**self.speech_config, dtype=self.dtype, name="feature_extraction")
        self.encoder = self.make_encoder()
        self.vocab_head = nn.Dense(self.vocab_size, dtype=self.dtype, param_dtype=jnp.float32, name="vocab")

    @property
    def time_reduction_factor(self) -> int:
        return self.make_encoder().time_reduction_factor

    def __call__(self, inputs: schemas.TrainInput, train: bool = False) -> schemas.TrainOutput:
        feats, flens = self.feature_extraction(inputs.inputs, inputs.inputs_length, train=train)
        enc, elens, _ = self.encoder(feats, flens, train=train)
        logits = self.vocab_head(enc)
        return schemas.TrainOutput(logits=logits, logits_length=elens)

    def encode(self, signals: jax.Array, signals_length: jax.Array, initial_state=None):
        feats, flens = self.feature_extraction(signals, signals_length, train=False)
        enc, elens, states = self.encoder(feats, flens, initial_state=initial_state, train=False)
        return self.vocab_head(enc), elens, states

    @nn.nowrap
    def init_encoder_states(self, batch: int):
        return self.make_encoder().init_state(batch)


def recognize(model: CtcModel, variables, inputs: schemas.PredictInput, beam_width: int = 0, lm=None, lm_weight: float = 0.5):
    """Greedy (or beam) CTC decode of raw audio, with streaming state carry.

    ``lm`` is an optional ``tensorflowasr_tpu.lm.NGramLM`` for shallow-fusion
    beam scoring (the ctc_decoders/KenLM replacement)."""
    logits, logits_length, next_encoder_states = model.apply(
        variables, inputs.inputs, inputs.inputs_length, initial_state=inputs.previous_encoder_states, method=model.encode
    )
    if beam_width and beam_width > 0:
        tokens, lengths = ctc_decode.ctc_beam_search_decode(
            logits,
            logits_length,
            beam_width=beam_width,
            blank=model.blank,
            lm_score_fn=lm.beam_score_fn() if lm is not None else None,
            lm_weight=lm_weight if lm is not None else 0.0,
        )
    else:
        tokens, lengths = ctc_decode.ctc_greedy_decode(logits, logits_length, blank=model.blank)
    batch = tokens.shape[0]
    return schemas.PredictOutput(
        tokens=tokens,
        next_tokens=jnp.full((batch,), model.blank, jnp.int32),
        next_encoder_states=next_encoder_states,
        next_decoder_states=None,
    )
