"""Single-file recognition demo (reference ``examples/inferences/main.py``).

Usage:
  python examples/inferences/main.py --config-path CONFIG --audio FILE \
      [--checkpoint CKPT] [--beam-width N]
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-path", required=True)
    p.add_argument("--audio", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--beam-width", type=int, default=0)
    p.add_argument("--datadir", default=None)
    p.add_argument("--modeldir", default=None)
    args = p.parse_args()

    from tensorflowasr_tpu import schemas
    from tensorflowasr_tpu.data import audio as audio_lib
    from tensorflowasr_tpu.scripts import common
    from tensorflowasr_tpu.scripts.test import _load_variables

    config = common.load_config(args, training=False)
    tokenizer = common.build_tokenizer(config)
    model = common.build_model_from_config(config, tokenizer, mxp="none")
    variables = _load_variables(model, tokenizer, args)

    signal = audio_lib.read_audio(args.audio, sample_rate=16000)
    signals = np.asarray(signal, np.float32)[None, :]
    lengths = np.asarray([len(signal)], np.int32)

    from tensorflowasr_tpu.models.ctc import base as ctc_base
    from tensorflowasr_tpu.models.transducer import base as transducer_base

    rec = transducer_base.recognize if hasattr(model, "prediction_config") else ctc_base.recognize
    out = rec(model, variables, schemas.PredictInput(inputs=signals, inputs_length=lengths), beam_width=args.beam_width)
    print(tokenizer.detokenize(np.asarray(out.tokens[0])))


if __name__ == "__main__":
    main()
