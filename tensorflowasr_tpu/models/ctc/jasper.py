"""Jasper-CTC (reference ``models/ctc/jasper.py:23``)."""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from tensorflowasr_tpu import registry
from tensorflowasr_tpu.models.config_utils import filter_kwargs
from tensorflowasr_tpu.models.ctc.base import CtcModel
from tensorflowasr_tpu.models.encoders.jasper import JasperEncoder

_ENC_KEYS = {f.name for f in dataclasses.fields(JasperEncoder)} - {"parent", "name"}


@registry.register(name="Jasper", aliases=("tensorflow_asr.models.ctc.jasper>Jasper",))
class Jasper(CtcModel):
    @nn.nowrap
    def make_encoder(self) -> nn.Module:
        cfg = dict(self.encoder_config)
        for k in ("block_channels", "block_kernels", "block_dropout"):
            if k in cfg:
                cfg[k] = tuple(cfg[k])
        return JasperEncoder(dtype=self.dtype, **cfg)

    @classmethod
    def from_config(cls, config: dict, vocab_size: int | None = None, dtype=jnp.float32, **overrides) -> "Jasper":
        config = dict(config)
        enc = filter_kwargs(config, _ENC_KEYS)  # jasper keys are unprefixed
        return cls(
            speech_config=dict(config.get("speech_config", {})),
            encoder_config=enc,
            blank=config.get("blank", 0),
            vocab_size=vocab_size or config.get("vocab_size", 29),
            dtype=dtype,
            **overrides,
        )
