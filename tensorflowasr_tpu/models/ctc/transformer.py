"""Transformer-CTC (reference ``models/ctc/transformer.py:22``)."""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from tensorflowasr_tpu import registry
from tensorflowasr_tpu.models.config_utils import filter_kwargs, strip_prefix
from tensorflowasr_tpu.models.ctc.base import CtcModel
from tensorflowasr_tpu.models.encoders.transformer import TransformerEncoder

_ENC_KEYS = {f.name for f in dataclasses.fields(TransformerEncoder)} - {"parent", "name"}


@registry.register(name="TransformerCtc", aliases=("tensorflow_asr.models.ctc.transformer>Transformer",))
class TransformerCtc(CtcModel):
    @nn.nowrap
    def make_encoder(self) -> nn.Module:
        return TransformerEncoder(dtype=self.dtype, **self.encoder_config)

    @classmethod
    def from_config(cls, config: dict, vocab_size: int | None = None, dtype=jnp.float32, **overrides) -> "TransformerCtc":
        config = dict(config)
        enc = filter_kwargs(strip_prefix(config, "encoder_"), _ENC_KEYS)
        return cls(
            speech_config=dict(config.get("speech_config", {})),
            encoder_config=enc,
            blank=config.get("blank", 0),
            vocab_size=vocab_size or config.get("vocab_size", 29),
            dtype=dtype,
            **overrides,
        )
