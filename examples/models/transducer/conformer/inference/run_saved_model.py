"""Drive a serving artifact produced by ``gen_saved_model.py`` on one file.

Counterpart of the reference
``examples/models/transducer/conformer/inference/run_saved_model.py``
(file:1-43): load the saved artifact, feed a raw audio file, print the
transcript decoded from the returned unicode codepoints.

Usage:
  python run_saved_model.py --saved-model conformer.stablehlo --filename x.flac
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--saved-model", required=True, help=".stablehlo artifact from gen_saved_model.py")
    p.add_argument("--filename", required=True, help="audio file to transcribe")
    p.add_argument("--sample-rate", type=int, default=16000)
    args = p.parse_args()

    from jax import export as jax_export

    from tensorflowasr_tpu import export as export_mod
    from tensorflowasr_tpu.data import audio as audio_lib

    with open(args.saved_model, "rb") as f:
        exp = jax_export.deserialize(f.read())
    signal = np.asarray(audio_lib.read_audio(args.filename, sample_rate=args.sample_rate), np.float32)
    # the artifact's signature is fixed-length: pad/trim to its window
    nsamples = exp.in_avals[0].shape[1]
    n = min(signal.shape[0], nsamples)
    padded = np.zeros((1, nsamples), np.float32)
    padded[0, :n] = signal[:n]
    out = exp.call(padded, np.asarray([n], np.int32))
    print("Transcript: ", export_mod.codepoints_to_text(np.asarray(out.transcript)[0]))


if __name__ == "__main__":
    main()
