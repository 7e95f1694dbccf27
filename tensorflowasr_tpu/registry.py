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


def _qualified(class_name: str) -> list[str]:
    """Module-qualified lookup keys (never ambiguous)."""
    candidates = [class_name]
    if ">" in class_name:
        mod, cls = class_name.split(">", 1)
        # Accept reference-style module paths: tensorflow_asr.models.x>Y
        candidates.append(f"{mod.replace('tensorflow_asr', 'tensorflowasr_tpu')}>{cls}")
    return candidates


def get(class_name: str) -> Any:
    """Resolve a class name, preferring module-qualified matches.

    Qualified `module>Class` strings must resolve exactly (the bare class
    name can be ambiguous — e.g. both ctc and transducer register a
    "Conformer"), so auto-import runs BEFORE any bare-name fallback.
    """
    for cand in _qualified(class_name):
        if cand in _REGISTRY:
            return _REGISTRY[cand]
    # Lazy: import model modules then retry the qualified names.
    for m in _AUTO_IMPORT:
        try:
            importlib.import_module(m)
        except ImportError:
            continue
    for cand in _qualified(class_name):
        if cand in _REGISTRY:
            return _REGISTRY[cand]
    # Bare class name fallback (unambiguous user-registered classes).
    bare = class_name.split(">")[-1]
    if bare in _REGISTRY:
        return _REGISTRY[bare]
    raise KeyError(f"Unknown class_name {class_name!r}. Registered: {sorted(k for k in _REGISTRY if '>' not in k)}")


def from_config(config: dict, **extra) -> Any:
    """Instantiate ``{"class_name": ..., "config": {...}}`` (Keras-style)."""
    cls = get(config["class_name"])
    kwargs = dict(config.get("config", {}))
    kwargs.update(extra)
    return cls(**kwargs)
