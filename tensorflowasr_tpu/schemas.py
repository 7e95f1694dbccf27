"""Typed IO contracts as JAX pytrees.

Mirrors the reference's NamedTuple schemas (``tensorflow_asr/schemas.py:20-62``)
— NamedTuples are natively pytrees in JAX so they flow through ``jit``,
``vmap``, and shardings unchanged.
"""

from __future__ import annotations

import typing

import jax

Array = jax.Array


class TrainInput(typing.NamedTuple):
    inputs: Array  # [B, nsamples] raw audio
    inputs_length: Array  # [B]
    predictions: Array  # [B, U+1] blank-prepended labels (transducer) or labels (ctc)
    predictions_length: Array  # [B]


class TrainOutput(typing.NamedTuple):
    logits: Array
    logits_length: Array


class TrainLabel(typing.NamedTuple):
    labels: Array  # [B, U]
    labels_length: Array  # [B]


class TrainData(typing.NamedTuple):
    inputs: TrainInput
    labels: TrainLabel


class PredictInput(typing.NamedTuple):
    inputs: Array
    inputs_length: Array
    previous_tokens: typing.Optional[Array] = None
    previous_encoder_states: typing.Optional[Array] = None
    previous_decoder_states: typing.Optional[Array] = None


class PredictOutput(typing.NamedTuple):
    tokens: Array
    next_tokens: Array
    next_encoder_states: typing.Optional[Array] = None
    next_decoder_states: typing.Optional[Array] = None


class PredictOutputWithTranscript(typing.NamedTuple):
    transcript: typing.Any
    tokens: Array
    next_tokens: Array
    next_encoder_states: typing.Optional[Array] = None
    next_decoder_states: typing.Optional[Array] = None


def _register_export_serialization():
    """Allow jax.export to serialize functions returning these pytrees."""
    try:
        from jax import export as jax_export

        for cls in (TrainInput, TrainOutput, TrainLabel, TrainData, PredictInput, PredictOutput, PredictOutputWithTranscript):
            try:
                jax_export.register_namedtuple_serialization(cls, serialized_name=f"tensorflowasr_tpu.schemas.{cls.__name__}")
            except ValueError:
                pass  # already registered
    except ImportError:
        pass


_register_export_serialization()
