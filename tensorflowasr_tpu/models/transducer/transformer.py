"""Transformer Transducer (reference ``models/transducer/transformer.py``)."""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from tensorflowasr_tpu import registry
from tensorflowasr_tpu.models.config_utils import filter_kwargs, parse_joint_config, parse_prediction_config, strip_prefix
from tensorflowasr_tpu.models.encoders.transformer import TransformerEncoder
from tensorflowasr_tpu.models.transducer.base import Transducer

_ENC_KEYS = {f.name for f in dataclasses.fields(TransformerEncoder)} - {"parent", "name"}


@registry.register(aliases=("TransformerTransducer", "tensorflow_asr.models.transducer.transformer>TransformerTransducer"))
class TransformerTransducer(Transducer):
    @nn.nowrap
    def make_encoder(self) -> nn.Module:
        return TransformerEncoder(dtype=self.dtype, **self.encoder_config)

    @classmethod
    def from_config(cls, config: dict, vocab_size: int | None = None, dtype=jnp.float32, **overrides) -> "TransformerTransducer":
        config = dict(config)
        enc = strip_prefix(config, "encoder_")
        enc = filter_kwargs(enc, _ENC_KEYS)
        return cls(
            speech_config=dict(config.get("speech_config", {})),
            encoder_config=enc,
            prediction_config=parse_prediction_config(config),
            joint_config=parse_joint_config(config),
            blank=config.get("blank", 0),
            vocab_size=vocab_size or config.get("vocab_size", 1000),
            dtype=dtype,
            **overrides,
        )
