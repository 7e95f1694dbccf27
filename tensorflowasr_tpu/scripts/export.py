"""``export`` / ``tflite`` subcommand (reference ``scripts/tflite.py:26-56``):
build the single-function raw-audio → transcript inference callable (with
streaming state pass-through) and serialize it — StableHLO natively, TFLite
via jax2tf when requested and TF is available.
"""

from __future__ import annotations

import logging

import jax
import numpy as np

from tensorflowasr_tpu.scripts import common
from tensorflowasr_tpu.scripts.test import _load_variables

logger = logging.getLogger("tensorflowasr_tpu")


def main(args):
    from tensorflowasr_tpu import export as export_mod

    config = common.load_config(args, training=False)
    tokenizer = common.build_tokenizer(config)
    model = common.build_model_from_config(config, tokenizer, mxp="none")
    variables = _load_variables(model, tokenizer, args)

    fn = export_mod.make_inference_fn(model, variables, tokenizer=tokenizer, beam_width=args.beam_width)
    nsamples = 16000  # 1s signature; exported fn is shape-polymorphic per re-export
    example = [np.zeros((args.bs, nsamples), np.float32), np.full((args.bs,), nsamples, np.int32)]
    if getattr(args, "streaming", False):
        import jax.numpy as jnp

        is_transducer = hasattr(model, "prediction_config")
        prev_tokens = np.zeros((args.bs,), np.int32)
        enc_states = model.init_encoder_states(args.bs)
        dec_states = model.init_decoder_states(args.bs) if is_transducer else None
        example = [example[0], example[1], prev_tokens, enc_states, dec_states]
    example = tuple(example)

    if args.format == "tflite":
        ok = export_mod.convert_tflite(fn, example, args.output)
        return 0 if ok else 1
    export_mod.export_stablehlo(fn, example, args.output)
    return 0
