"""DeepSpeech2-CTC (reference ``models/ctc/deepspeech2.py:22``)."""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from tensorflowasr_tpu import registry
from tensorflowasr_tpu.models.config_utils import filter_kwargs
from tensorflowasr_tpu.models.ctc.base import CtcModel
from tensorflowasr_tpu.models.encoders.deepspeech2 import DeepSpeech2Encoder

_ENC_KEYS = {f.name for f in dataclasses.fields(DeepSpeech2Encoder)} - {"parent", "name"}


@registry.register(name="DeepSpeech2", aliases=("tensorflow_asr.models.ctc.deepspeech2>DeepSpeech2",))
class DeepSpeech2(CtcModel):
    @nn.nowrap
    def make_encoder(self) -> nn.Module:
        cfg = dict(self.encoder_config)
        for k in ("conv_kernels", "conv_strides", "conv_filters"):
            if k in cfg:
                cfg[k] = tuple(tuple(v) if isinstance(v, (list, tuple)) else v for v in cfg[k])
        return DeepSpeech2Encoder(dtype=self.dtype, **cfg)

    @classmethod
    def from_config(cls, config: dict, vocab_size: int | None = None, dtype=jnp.float32, **overrides) -> "DeepSpeech2":
        config = dict(config)
        enc = filter_kwargs(config, _ENC_KEYS)  # ds2 keys are unprefixed (conv_*, rnn_*, fc_*)
        return cls(
            speech_config=dict(config.get("speech_config", {})),
            encoder_config=enc,
            blank=config.get("blank", 0),
            vocab_size=vocab_size or config.get("vocab_size", 29),
            dtype=dtype,
            **overrides,
        )
