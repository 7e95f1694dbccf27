"""RNN-Transducer single-file recognition demo, with optional chunked
streaming that carries encoder/prediction states across chunks.

Counterpart of the reference ``examples/inferences/rnn_transducer.py``
(which ships commented out) — this one runs: build the model from an
RNN-T config, restore a checkpoint, and decode either the whole utterance
at once or chunk-by-chunk with the streaming state contract
(``PredictInput.previous_*`` → ``PredictOutput.next_*``).

Usage:
  python examples/inferences/rnn_transducer.py --config-path \
      examples/models/transducer/rnnt/small.yml.j2 --audio x.flac \
      [--checkpoint CKPT] [--beam-width N] [--chunk-secs 1.0]
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
    p.add_argument("--chunk-secs", type=float, default=0.0, help="> 0 enables chunked streaming decode")
    p.add_argument("--datadir", default=None)
    p.add_argument("--modeldir", default=None)
    args = p.parse_args()

    from tensorflowasr_tpu import schemas
    from tensorflowasr_tpu.data import audio as audio_lib
    from tensorflowasr_tpu.models.transducer import base as transducer_base
    from tensorflowasr_tpu.scripts import common
    from tensorflowasr_tpu.scripts.test import _load_variables

    config = common.load_config(args, training=False)
    tokenizer = common.build_tokenizer(config)
    model = common.build_model_from_config(config, tokenizer, mxp="none")
    variables = _load_variables(model, tokenizer, args)

    sr = config.speech_config.get("sample_rate", 16000) if hasattr(config, "speech_config") else 16000
    signal = np.asarray(audio_lib.read_audio(args.audio, sample_rate=sr), np.float32)

    rec = jax.jit(
        lambda v, pin: transducer_base.recognize(model, v, pin, beam_width=args.beam_width),
    )

    if args.chunk_secs <= 0:
        out = rec(
            variables,
            schemas.PredictInput(inputs=signal[None, :], inputs_length=np.asarray([len(signal)], np.int32)),
        )
        print(tokenizer.detokenize(np.asarray(out.tokens[0])))
        return

    # chunked streaming: fixed-size chunks (zero-padded tail), states carried
    chunk = int(args.chunk_secs * sr)
    prev_tokens = None
    enc_states = model.init_encoder_states(1)
    dec_states = None
    pieces = []
    for lo in range(0, len(signal), chunk):
        seg = signal[lo : lo + chunk]
        n = len(seg)
        if n < chunk:
            seg = np.pad(seg, (0, chunk - n))
        out = rec(
            variables,
            schemas.PredictInput(
                inputs=seg[None, :],
                inputs_length=np.asarray([n], np.int32),
                previous_tokens=prev_tokens,
                previous_encoder_states=enc_states,
                previous_decoder_states=dec_states,
            ),
        )
        prev_tokens = out.next_tokens
        enc_states = out.next_encoder_states
        dec_states = out.next_decoder_states
        pieces.append(tokenizer.detokenize(np.asarray(out.tokens[0])))
    print("".join(pieces) if getattr(tokenizer.decoder_config, "keep_whitespace", False) else " ".join(x for x in pieces if x))


if __name__ == "__main__":
    main()
