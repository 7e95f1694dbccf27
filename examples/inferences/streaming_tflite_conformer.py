"""Streaming TFLite consumer demo: drive a *streaming* TFLite artifact
chunk-by-chunk, carrying decoder/encoder states between invocations.

Counterpart of the reference ``examples/inferences/streaming_tflite_conformer.py``
(file:1-172): the reference plays an audio file through ``sounddevice`` while a
second process feeds fixed-size blocks + carried RNN states into a TFLite
interpreter and prints the accumulating transcript. This version keeps the
same consume loop — audio chunk *i* + states *i−1* → transcript chunk +
states *i* — but reads blocks straight from the file (no audio-out dependency)
and discovers the state tensors from the artifact itself instead of taking
``--num_rnns/--nstates/--statesize`` flags.

Artifact contract (produced by ``tensorflowasr_tpu export --streaming
--format tflite``): inputs are named ``args_{i}`` in flattened order
(signals [1, chunk], signals_length [1], previous_tokens [1], then the
encoder/decoder state leaves); outputs are, in order, transcript codepoints,
tokens, next_tokens, then the next-state leaves matching the state inputs
one-to-one.

Usage:
  python examples/inferences/streaming_tflite_conformer.py \
      --tflite conformer_streaming.tflite audio.flac [--blocksize 4096]
"""

from __future__ import annotations

import argparse

import numpy as np


def _ordered_details(details):
    """Sort tensor details into signature order.

    Inputs carry the ``args_{i}`` names we set at conversion; outputs are in
    concrete-function order already, but sort defensively by the trailing
    index TFLite appends (``Identity``, ``Identity_1``, …).
    """

    def key(d):
        name = d["name"].split(":")[0]
        tail = name.rsplit("_", 1)[-1]
        return int(tail) if tail.isdigit() else -1

    return sorted(details, key=key)


class StreamingTFLiteRecognizer:
    """Chunk loop around a streaming TFLite artifact (states carried)."""

    def __init__(self, model_path: str, blocksize: int):
        import tensorflow as tf  # demo requires the TFLite runtime

        self.blocksize = blocksize
        self.interp = tf.lite.Interpreter(model_path=model_path)
        self.inputs = _ordered_details(self.interp.get_input_details())
        sig = self.inputs[0]
        if int(sig["shape"][-1]) != blocksize:
            self.interp.resize_tensor_input(sig["index"], [1, blocksize], strict=False)
        self.interp.allocate_tensors()
        # resize invalidates cached details
        self.inputs = _ordered_details(self.interp.get_input_details())
        self.outputs = _ordered_details(self.interp.get_output_details())
        # carried values: previous_tokens + every state leaf, zero-initialised
        self.carried = [np.zeros(d["shape"], d["dtype"]) for d in self.inputs[2:]]

    def step(self, block: np.ndarray) -> str:
        from tensorflowasr_tpu.export import codepoints_to_text

        if block.shape[0] < self.blocksize:
            block = np.pad(block, (0, self.blocksize - block.shape[0]))
        self.interp.set_tensor(self.inputs[0]["index"], block[None, :].astype(np.float32))
        self.interp.set_tensor(self.inputs[1]["index"], np.asarray([self.blocksize], np.int32))
        for det, val in zip(self.inputs[2:], self.carried):
            self.interp.set_tensor(det["index"], val)
        self.interp.invoke()
        out = [self.interp.get_tensor(d["index"]) for d in self.outputs]
        transcript, _tokens, next_tokens = out[0], out[1], out[2]
        self.carried = [np.asarray(next_tokens).reshape(self.inputs[2]["shape"])] + out[3:]
        return codepoints_to_text(transcript[0])


def main():
    p = argparse.ArgumentParser(prog="Conformer audio file streaming (TFLite)")
    p.add_argument("filename", metavar="FILENAME", help="audio file to stream")
    p.add_argument("--tflite", type=str, required=True, help="path to the streaming .tflite artifact")
    p.add_argument("-b", "--blocksize", type=int, default=4096, help="samples per block (default: %(default)s)")
    p.add_argument(
        "--blockstep",
        type=int,
        default=None,
        help="advance per block; set to the frontend's chunk_step when the "
        "artifact's chunk windows overlap by the STFT frame tail "
        "(FrontendConfig.get_signal_chunk_size_and_step); default: blocksize",
    )
    p.add_argument("--sample-rate", type=int, default=16000)
    args = p.parse_args()
    if args.blocksize <= 0:
        p.error("blocksize must be positive")
    step = args.blockstep or args.blocksize
    if step <= 0 or step > args.blocksize:
        p.error("blockstep must be in (0, blocksize]")

    from tensorflowasr_tpu.data import audio as audio_lib

    signal = np.asarray(audio_lib.read_audio(args.filename, sample_rate=args.sample_rate), np.float32)
    rec = StreamingTFLiteRecognizer(args.tflite, args.blocksize)

    transcript = ""
    for start in range(0, signal.shape[0], step):
        transcript += rec.step(signal[start : start + args.blocksize])
        print(transcript, flush=True)


if __name__ == "__main__":
    main()
