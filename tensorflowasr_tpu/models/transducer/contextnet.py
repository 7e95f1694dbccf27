"""ContextNet Transducer (reference ``models/transducer/contextnet.py:23``)."""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from tensorflowasr_tpu import registry
from tensorflowasr_tpu.models.config_utils import filter_kwargs, parse_joint_config, parse_prediction_config, strip_prefix
from tensorflowasr_tpu.models.encoders.contextnet import ContextNetEncoder
from tensorflowasr_tpu.models.transducer.base import Transducer

_ENC_KEYS = {f.name for f in dataclasses.fields(ContextNetEncoder)} - {"parent", "name"}


@registry.register(aliases=("ContextNet", "tensorflow_asr.models.transducer.contextnet>ContextNet"))
class ContextNet(Transducer):
    @nn.nowrap
    def make_encoder(self) -> nn.Module:
        cfg = dict(self.encoder_config)
        cfg["blocks"] = tuple(dict(b) for b in cfg.get("blocks", ()))
        return ContextNetEncoder(dtype=self.dtype, **cfg)

    @classmethod
    def from_config(cls, config: dict, vocab_size: int | None = None, dtype=jnp.float32, **overrides) -> "ContextNet":
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
