"""Polymorphic config-driven class registry.

The reference instantiates models/layers from YAML via
``class_name: module>Class`` strings and Keras deserialization
(``tensorflow_asr/utils/keras_util.py:5``, ``__init__.py:16-25``). Here the
same config surface maps onto an explicit registry: classes register under
both their bare name and a ``module>Class`` alias so reference configs load
unmodified (with ``tensorflow_asr`` accepted as an alias prefix).
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Type

_REGISTRY: dict[str, Any] = {}

# Submodules that register classes on import (mirrors the reference package
# auto-import loop so `module>Class` strings resolve lazily).
_AUTO_IMPORT = [
    "tensorflowasr_tpu.models.ctc.conformer",
    "tensorflowasr_tpu.models.ctc.deepspeech2",
    "tensorflowasr_tpu.models.ctc.jasper",
    "tensorflowasr_tpu.models.ctc.transformer",
    "tensorflowasr_tpu.models.transducer.conformer",
    "tensorflowasr_tpu.models.transducer.contextnet",
    "tensorflowasr_tpu.models.transducer.rnnt",
    "tensorflowasr_tpu.models.transducer.transformer",
]


def register(name: str | None = None, aliases: tuple[str, ...] = ()) -> Callable[[Type], Type]:
    def deco(cls: Type) -> Type:
        key = name or cls.__name__
        _REGISTRY[key] = cls
        modalias = f"{cls.__module__}>{cls.__name__}"
        _REGISTRY[modalias] = cls
        for a in aliases:
            _REGISTRY[a] = cls
        return cls

    return deco


def _normalize(class_name: str) -> list[str]:
    candidates = [class_name]
    if ">" in class_name:
        mod, cls = class_name.split(">", 1)
        candidates.append(cls)
        # Accept reference-style module paths: tensorflow_asr.models.x>Y
        mod2 = mod.replace("tensorflow_asr", "tensorflowasr_tpu")
        candidates.append(f"{mod2}>{cls}")
        candidates.append(f"{mod2.replace('.models.', '.models.')}>{cls}")
    return candidates


def get(class_name: str) -> Any:
    for cand in _normalize(class_name):
        if cand in _REGISTRY:
            return _REGISTRY[cand]
    # Lazy: import model modules then retry.
    for m in _AUTO_IMPORT:
        try:
            importlib.import_module(m)
        except ImportError:
            continue
    for cand in _normalize(class_name):
        if cand in _REGISTRY:
            return _REGISTRY[cand]
    raise KeyError(f"Unknown class_name {class_name!r}. Registered: {sorted(k for k in _REGISTRY if '>' not in k)}")


def from_config(config: dict, **extra) -> Any:
    """Instantiate ``{"class_name": ..., "config": {...}}`` (Keras-style)."""
    cls = get(config["class_name"])
    kwargs = dict(config.get("config", {}))
    kwargs.update(extra)
    return cls(**kwargs)
