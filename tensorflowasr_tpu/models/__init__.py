"""Model zoo + config-driven construction.

``build_model(model_config, vocab_size)`` mirrors the reference's
``keras_util.model_from_config`` (utils/keras_util.py:5): the config carries
``class_name: module>Class`` plus a flat ``config`` dict in the reference's
schema, and returns an (un-initialized) flax module.
"""

from __future__ import annotations

import jax.numpy as jnp

from tensorflowasr_tpu import registry


def build_model(model_config: dict, vocab_size: int | None = None, dtype=jnp.float32):
    cls = registry.get(model_config["class_name"])
    cfg = dict(model_config.get("config", {}))
    cfg.pop("name", None)
    cfg.pop("kernel_regularizer", None)  # weight decay lives in the optimizer
    cfg.pop("bias_regularizer", None)
    if hasattr(cls, "from_config"):
        return cls.from_config(cfg, vocab_size=vocab_size, dtype=dtype)
    return cls(**cfg)
