"""Generate a serving artifact for a Conformer transducer checkpoint.

Counterpart of the reference
``examples/models/transducer/conformer/inference/gen_saved_model.py``
(file:1-56): build the model from the example config, restore trained
weights, and save a single-signature raw-audio → transcript serving
artifact. The reference emits a TF SavedModel with the
``recognize_from_signal`` concrete function; the TPU-native equivalents are
a serialized StableHLO program (portable across XLA runtimes, the default)
or a ``.tflite`` file when TensorFlow is installed (``--format tflite``).

Usage:
  python gen_saved_model.py --checkpoint /path/to/orbax_ckpt \
      --output conformer.stablehlo [--config-path small.yml.j2] [--streaming]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

DEFAULT_YAML = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "small.yml.j2")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-path", default=DEFAULT_YAML)
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint directory (random init if omitted)")
    p.add_argument("--output", required=True, help="output artifact path (.stablehlo or .tflite)")
    p.add_argument("--format", choices=["stablehlo", "tflite"], default="stablehlo")
    p.add_argument("--streaming", action="store_true", help="carry streaming states through the signature")
    p.add_argument("--beam-width", type=int, default=0)
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--datadir", default=None)
    p.add_argument("--modeldir", default=None)
    args = p.parse_args()

    from tensorflowasr_tpu import export as export_mod
    from tensorflowasr_tpu.scripts import common
    from tensorflowasr_tpu.scripts.test import _load_variables

    config = common.load_config(args, training=False)
    tokenizer = common.build_tokenizer(config)
    model = common.build_model_from_config(config, tokenizer, mxp="none")
    variables = _load_variables(model, tokenizer, args)

    fn = export_mod.make_inference_fn(model, variables, tokenizer=tokenizer, beam_width=args.beam_width)
    nsamples = 16000
    example = [np.zeros((args.bs, nsamples), np.float32), np.full((args.bs,), nsamples, np.int32)]
    if args.streaming:
        example += [
            np.zeros((args.bs,), np.int32),
            model.init_encoder_states(args.bs),
            model.init_decoder_states(args.bs),
        ]

    if args.format == "tflite":
        ok = export_mod.convert_tflite(fn, tuple(example), args.output)
        raise SystemExit(0 if ok else 1)
    export_mod.export_stablehlo(fn, tuple(example), args.output)
    print(f"saved {args.format} artifact to {args.output}")


if __name__ == "__main__":
    main()
