"""Model export: single-function raw-audio → tokens/transcript inference.

Reference parity: ``BaseModel.make_tflite_function`` + ``app_util.convert_tflite``
(``models/base_model.py:335-364``, ``utils/app_util.py:85-111``) — a single
callable with a fixed input signature carrying streaming state
(previous_tokens / encoder_states / decoder_states) through, and in-graph
detokenization to unicode codepoints (tokenizers.py:251-264).

Export targets (TPU-first):
  - ``export_stablehlo``: jax.export serialized StableHLO artifact — the
    native portable format for XLA runtimes
  - ``convert_tflite``: optional jax2tf → TFLite when TensorFlow is present
    (SELECT_TF_OPS for the decode while_loop), matching the reference's
    deployment surface
  - orbax param checkpoints via the Trainer
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu import schemas

logger = logging.getLogger("tensorflowasr_tpu")


def make_inference_fn(model, variables, tokenizer=None, beam_width: int = 0):
    """Build ``fn(signals, signals_length, previous_tokens?, enc_states?,
    dec_states?) → PredictOutputWithTranscript`` (jit-compatible).

    When ``tokenizer`` is given, the transcript is returned as unicode
    codepoints [B, max_tokens, max_chars] gathered in-graph from the
    tokenizer's codepoint table — the exported artifact needs no Python
    tokenizer at inference time.
    """
    from tensorflowasr_tpu.models.ctc import base as ctc_base
    from tensorflowasr_tpu.models.transducer import base as transducer_base

    is_transducer = hasattr(model, "predict_net") or hasattr(model, "prediction_config")
    upoints = jnp.asarray(tokenizer.upoints, jnp.int32) if tokenizer is not None else None

    def fn(signals, signals_length, previous_tokens=None, previous_encoder_states=None, previous_decoder_states=None):
        pin = schemas.PredictInput(
            inputs=signals,
            inputs_length=signals_length,
            previous_tokens=previous_tokens,
            previous_encoder_states=previous_encoder_states,
            previous_decoder_states=previous_decoder_states,
        )
        if is_transducer:
            out = transducer_base.recognize(model, variables, pin, beam_width=beam_width)
        else:
            out = ctc_base.recognize(model, variables, pin, beam_width=beam_width)
        if upoints is None:
            transcript = out.tokens
        else:
            transcript = jnp.take(upoints, jnp.clip(out.tokens, 0, upoints.shape[0] - 1), axis=0)
        return schemas.PredictOutputWithTranscript(
            transcript=transcript,
            tokens=out.tokens,
            next_tokens=out.next_tokens,
            next_encoder_states=out.next_encoder_states,
            next_decoder_states=out.next_decoder_states,
        )

    return fn


def codepoints_to_text(pts: np.ndarray) -> str:
    """Host-side helper: codepoint tensor → string (0 = padding)."""
    return "".join(chr(c) for c in np.asarray(pts).reshape(-1) if c != 0).strip()


def export_stablehlo(fn, example_args, path: str) -> None:
    """Serialize a jittable inference fn to a StableHLO artifact."""
    from jax import export as jax_export

    exp = jax_export.export(jax.jit(fn))(*example_args)
    data = exp.serialize()
    with open(path, "wb") as f:
        f.write(data)
    logger.info("exported StableHLO artifact to %s (%d bytes)", path, len(data))


def load_stablehlo(path: str):
    from jax import export as jax_export

    with open(path, "rb") as f:
        exp = jax_export.deserialize(f.read())
    return exp.call


def convert_tflite(fn, example_args, output: str) -> bool:
    """jax2tf → TFLite (SELECT_TF_OPS); returns False if TF is unavailable.

    ``example_args`` may be an arbitrary pytree (streaming exports carry
    encoder/decoder state trees): leaves are flattened in ``jax.tree_util``
    order and exposed as TFLite inputs named ``args_{i}``, so consumers can
    recover the positional order by sorting input names (see
    ``examples/inferences/streaming_tflite_conformer.py``).
    """
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except ImportError:
        logger.warning("TensorFlow not available — skipping TFLite export")
        return False
    flat_example, treedef = jax.tree_util.tree_flatten(tuple(example_args))

    def flat_fn(*flat_args):
        return fn(*jax.tree_util.tree_unflatten(treedef, flat_args))

    tf_fn = tf.function(
        jax2tf.convert(flat_fn, with_gradient=False),
        input_signature=[
            tf.TensorSpec(np.shape(a), tf.as_dtype(np.asarray(a).dtype), name=f"args_{i}")
            for i, a in enumerate(flat_example)
        ],
        autograph=False,
    )
    converter = tf.lite.TFLiteConverter.from_concrete_functions([tf_fn.get_concrete_function()])
    converter.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS, tf.lite.OpsSet.SELECT_TF_OPS]
    converter.allow_custom_ops = True
    tflite_model = converter.convert()
    with open(output, "wb") as f:
        f.write(tflite_model)
    logger.info("exported TFLite model to %s (%d bytes)", output, len(tflite_model))
    return True
