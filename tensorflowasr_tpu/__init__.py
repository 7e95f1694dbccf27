"""tensorflowasr_tpu — a TPU-native ASR framework built on JAX/XLA/Pallas.

A ground-up rebuild of the capabilities of TensorSpeech/TensorFlowASR
(reference: /root/reference) designed TPU-first:

- functional compute ops (``ops/``): STFT/log-mel frontend, CTC and RNN-T
  losses (pure-JAX forward-backward with Pallas kernels for the hot paths),
  batched ``lax.scan``/``lax.while_loop`` greedy + beam decoding
- flax.linen model zoo (``models/``): CTC (DeepSpeech2, Jasper, Conformer,
  Transformer) and Transducer (Conformer, Streaming Conformer, ContextNet,
  RNN-T, Transformer) families with explicit length masking and stateful
  streaming ``call_next`` paths
- data pipeline (``data/``): TSV manifests, static padded shapes for XLA,
  pure-Python WAV/FLAC decoding and TFRecord IO (no TensorFlow dependency)
- tokenizers (``tokenizers/``): characters, wordpiece, sentencepiece-style
  unigram/BPE via HF ``tokenizers``
- distributed training (``parallel/``, ``training/``): data-parallel
  ``jax.sharding.Mesh`` + ``jit`` with gradient all-reduce over ICI,
  gradient accumulation, bf16 policy, orbax checkpoints

Reference parity map lives in SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

import tensorflowasr_tpu.registry as registry  # noqa: F401 (registration side effects happen lazily)


def __getattr__(name):
    # Lazy submodule access: `tensorflowasr_tpu.models`, etc.
    import importlib

    if name in (
        "configs",
        "schemas",
        "tokenizers",
        "data",
        "augmentations",
        "ops",
        "models",
        "optimizers",
        "parallel",
        "training",
        "scripts",
        "utils",
    ):
        return importlib.import_module(f"tensorflowasr_tpu.{name}")
    raise AttributeError(f"module 'tensorflowasr_tpu' has no attribute {name!r}")
