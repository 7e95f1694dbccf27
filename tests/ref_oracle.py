"""Import the reference TensorFlowASR package as a test oracle.

The reference (/root/reference) is TF/Keras; this environment has TF but not
librosa/tensorflow_text/sentencepiece/fire. Those are only touched at import
time (or in code paths we don't exercise), so light stub modules are
injected before import. Used for golden tests only — never for runtime.
"""

from __future__ import annotations

import sys
import types

REF_PATH = "/root/reference"

_STUBS = [
    "librosa",
    "fire",
    "jiwer",
    "kagglehub",
    "sentencepiece",
    "tensorflow_text",
    "tensorflow_text.tools",
    "tensorflow_text.tools.wordpiece_vocab",
    "tensorflow_text.tools.wordpiece_vocab.bert_vocab_from_dataset",
]


def import_reference():
    """Returns the tensorflow_asr module, or None if unavailable."""
    import os

    if not os.path.isdir(REF_PATH):
        return None
    try:
        import tensorflow  # noqa: F401
    except Exception:
        return None
    if "cached_property" not in sys.modules:
        try:
            import cached_property  # noqa: F401
        except ImportError:
            mod = types.ModuleType("cached_property")
            from functools import cached_property as _cp

            mod.cached_property = _cp
            sys.modules["cached_property"] = mod
    for name in _STUBS:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = []  # mark as package so submodule imports resolve
            sys.modules[name] = mod
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    try:
        import tensorflow_asr

        return tensorflow_asr
    except Exception:
        return None


TINY_CONFORMER_CONFIG = {
    "speech_config": {
        "sample_rate": 16000,
        "frame_ms": 25,
        "stride_ms": 10,
        "num_feature_bins": 20,
        "feature_type": "log_mel_spectrogram",
        "nfft": 256,
    },
    "encoder_subsampling": {
        "class_name": "tensorflow_asr.models.layers.subsampling>Conv2dSubsampling",
        "config": {
            "filters": [8, 8],
            "kernels": [3, 3],
            "strides": [2, 2],
            "paddings": ["causal", "causal"],
            "norms": ["batch", "batch"],
            "activations": ["swish", "swish"],
        },
    },
    "encoder_dmodel": 16,
    "encoder_num_blocks": 2,
    "encoder_head_size": 4,
    "encoder_num_heads": 2,
    "encoder_mha_type": "relmha",
    "encoder_kernel_size": 3,
    "encoder_dropout": 0.0,
    "encoder_padding": "causal",
    "prediction_label_encode_mode": "embedding",
    "prediction_embed_dim": 8,
    "prediction_num_rnns": 1,
    "prediction_rnn_units": 16,
    "prediction_rnn_type": "lstm",
    "prediction_layer_norm": True,
    "joint_dim": 16,
    "joint_activation": "tanh",
    "joint_mode": "add",
    "blank": 0,
    "vocab_size": 12,
}
