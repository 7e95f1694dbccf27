"""Run an exported single-function inference artifact on one audio file.

Counterpart of the reference ``examples/inferences/tflite.py``: load the
artifact produced by ``tensorflowasr_tpu export`` (StableHLO natively; a
``.tflite`` file when TensorFlow is installed), feed raw audio plus blank
initial streaming states, and print the transcript, tokens and carried
states — the same input/output contract as the reference's TFLite demo
(``docs/tutorials/tflite.md`` streaming loop).

Usage:
  python examples/inferences/tflite.py --artifact model.stablehlo --audio x.flac
  python examples/inferences/tflite.py --artifact model.tflite --audio x.flac
"""

from __future__ import annotations

import argparse

import numpy as np


def run_stablehlo(path: str, signal: np.ndarray):
    from tensorflowasr_tpu import export as export_mod

    fn = export_mod.load_stablehlo(path)
    signals = signal[None, :].astype(np.float32)
    lengths = np.asarray([signal.shape[0]], np.int32)
    # non-streaming exports take (signals, lengths); streaming exports carry
    # (prev_tokens, enc_states, dec_states) — try the simple arity first
    try:
        out = fn(signals, lengths)
    except Exception:
        prev_tokens = np.zeros((1,), np.int32)
        out = fn(signals, lengths, prev_tokens)
    return out


def run_tflite(path: str, signal: np.ndarray):
    import tensorflow as tf  # demo only runs when TF is installed

    interp = tf.lite.Interpreter(model_path=path)
    inputs = interp.get_input_details()
    interp.resize_tensor_input(inputs[0]["index"], [1, signal.shape[0]], strict=True)
    interp.allocate_tensors()
    interp.set_tensor(inputs[0]["index"], signal[None, :].astype(np.float32))
    interp.set_tensor(inputs[1]["index"], np.asarray([signal.shape[0]], np.int32))
    for det in inputs[2:]:  # streaming states start blank/zero
        interp.set_tensor(det["index"], np.zeros(det["shape"], det["dtype"]))
    interp.invoke()
    return [interp.get_tensor(d["index"]) for d in interp.get_output_details()]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--artifact", required=True, help=".stablehlo (native) or .tflite export")
    p.add_argument("--audio", required=True)
    p.add_argument("--sample-rate", type=int, default=16000)
    args = p.parse_args()

    from tensorflowasr_tpu.data import audio as audio_lib
    from tensorflowasr_tpu.export import codepoints_to_text

    signal = np.asarray(audio_lib.read_audio(args.audio, sample_rate=args.sample_rate), np.float32)

    if args.artifact.endswith(".tflite"):
        out = run_tflite(args.artifact, signal)
        transcript, tokens = out[0], out[1]
    else:
        out = run_stablehlo(args.artifact, signal)
        transcript, tokens = out.transcript, out.tokens
        print("next_tokens:", np.asarray(out.next_tokens))

    print("tokens:", np.asarray(tokens)[0][:32], "...")
    print("transcript:", codepoints_to_text(np.asarray(transcript)[0]))


if __name__ == "__main__":
    main()
