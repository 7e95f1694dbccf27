"""On-hardware end-to-end WER run: synthetic corpus → CLI train → CLI test.

VERDICT r3 #5: the round-1 hardware validation trained only 4 steps and the
overfit test is CPU-only and loss-based; nobody had driven the full
train→test CLI loop (the reference's tutorial flow,
/root/reference/docs/tutorials/training.md) to a *decreasing WER* on the
chip. This script does exactly that:

1. builds a ~200-utterance synthetic corpus where audio is trivially
   decodable (each character renders as a fixed-frequency 60 ms tone, so
   the audio→text mapping is learnable from scratch in a few hundred steps)
2. measures WER with the random-init model (should be ~1.0)
3. runs ``tensorflowasr_tpu train`` for a few hundred steps on the
   available accelerator (bf16 on TPU)
4. runs ``tensorflowasr_tpu test`` (greedy + beam columns in one pass) and
   asserts greedy WER on the seen data has collapsed (< 0.05 by default)
   and beam WER <= greedy WER + 0.02.

Usage: python scripts_dev/wer_e2e_tpu.py [--workdir DIR] [--steps N]
       [--epochs N] [--utts N] [--wer-target F]
Numbers land in STATUS.md (round 4).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 16000
CHAR_MS = 60  # per-character tone duration
WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]

CONFIG = """
decoder_config:
  type: characters
  blank_index: 0
  beam_width: 2

model_config:
  class_name: tensorflow_asr.models.transducer.conformer>Conformer
  config:
    name: conformer-e2e-tiny
    speech_config:
      sample_rate: 16000
      frame_ms: 25
      stride_ms: 10
      num_feature_bins: 40
      nfft: 512
      feature_type: log_mel_spectrogram
    encoder_subsampling:
      class_name: tensorflow_asr.models.layers.subsampling>Conv2dSubsampling
      config:
        filters: [64, 64]
        kernels: [3, 3]
        strides: [2, 2]
        paddings: [causal, causal]
        norms: [batch, batch]
        activations: [swish, swish]
    encoder_dmodel: 64
    encoder_num_blocks: 2
    encoder_head_size: 32
    encoder_num_heads: 2
    encoder_mha_type: relmha
    encoder_kernel_size: 15
    encoder_dropout: 0.05
    encoder_padding: causal
    prediction_label_encode_mode: embedding
    prediction_embed_dim: 64
    prediction_num_rnns: 1
    prediction_rnn_units: 128
    prediction_rnn_type: lstm
    prediction_layer_norm: True
    joint_dim: 128
    prejoint_encoder_linear: True
    prejoint_prediction_linear: True
    joint_activation: tanh
    joint_mode: add
    blank: 0

data_config:
  train_dataset_config:
    enabled: true
    data_paths:
      - {{datadir}}/train.tsv
    shuffle: true
    metadata: {{modeldir}}/metadata.json
    stage: train
  test_dataset_configs:
    - name: seen
      data_paths:
        - {{datadir}}/train.tsv
      stage: test

learning_config:
  optimizer_config:
    class_name: Adam
    config:
      learning_rate: 0.002
  batch_size: 8
  num_epochs: 1
  callbacks:
    - class_name: tensorflow_asr.callbacks>TerminateOnNaN
      config: {}
"""


def synth_utterance(text: str, rng) -> np.ndarray:
    """Each char = one tone: freq 220 + 35·index(char) Hz, 60 ms, with a
    small amplitude envelope + noise so the task isn't numerically sterile."""
    from tensorflowasr_tpu.tokenizers.char import ENGLISH_CHARACTERS

    idx = {c: i for i, c in enumerate(ENGLISH_CHARACTERS[1:])}  # skip <blank>
    n_char = int(SR * CHAR_MS / 1000)
    t = np.arange(n_char) / SR
    env = np.minimum(1.0, np.minimum(np.arange(n_char), n_char - np.arange(n_char)) / (0.005 * SR))
    chunks = []
    for ch in text:
        f = 220.0 + 35.0 * idx.get(ch, 0)
        phase = rng.uniform(0, 2 * np.pi)
        chunks.append(0.3 * np.sin(2 * np.pi * f * t + phase) * env)
    sig = np.concatenate(chunks) + 0.005 * rng.standard_normal(n_char * len(text))
    return sig.astype(np.float32)


def build_corpus(datadir: str, n_utts: int, seed: int = 0):
    from tensorflowasr_tpu.data import audio

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_utts):
        nwords = int(rng.integers(3, 6))
        text = " ".join(rng.choice(WORDS, nwords))
        sig = synth_utterance(text, rng)
        p = os.path.join(datadir, f"utt{i:04d}.wav")
        audio.write_wav(p, sig, SR)
        rows.append(f"{p}\t{len(sig) / SR:.3f}\t{text}")
    manifest = os.path.join(datadir, "train.tsv")
    with open(manifest, "w") as f:
        f.write("PATH\tDURATION\tTRANSCRIPT\n" + "\n".join(rows) + "\n")
    return manifest


def run_test(config_path, datadir, modeldir, out_name):
    from tensorflowasr_tpu.scripts import main
    from tensorflowasr_tpu.utils import app_util

    out = os.path.join(modeldir, out_name)
    rc = main(
        ["test", "--config-path", config_path, "--datadir", datadir, "--modeldir", modeldir,
         "--bs", "8", "--output", out]
    )
    assert rc == 0, f"test CLI rc={rc}"
    return app_util.evaluate_hypotheses(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/tfasr_wer_e2e")
    ap.add_argument("--utts", type=int, default=200)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--steps", type=int, default=100, help="steps per epoch")
    ap.add_argument("--wer-target", type=float, default=0.05)
    ap.add_argument("--skip-initial", action="store_true", help="skip the random-init WER measurement")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend (smoke-testing)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if os.path.isdir(args.workdir):
        shutil.rmtree(args.workdir)
    datadir = os.path.join(args.workdir, "data")
    modeldir = os.path.join(args.workdir, "model")
    os.makedirs(datadir)
    os.makedirs(modeldir)

    build_corpus(datadir, args.utts)
    config_path = os.path.join(args.workdir, "config.yml.j2")
    with open(config_path, "w") as f:
        f.write(CONFIG)

    import jax

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)

    record = {}
    if not args.skip_initial:
        t0 = time.time()
        rep0 = run_test(config_path, datadir, modeldir, "predictions_initial.tsv")
        record["initial"] = {k: round(v["wer"], 4) for k, v in rep0.items()}
        record["initial_secs"] = round(time.time() - t0, 1)
        print(json.dumps(record), flush=True)

    from tensorflowasr_tpu.scripts import main as cli_main

    t0 = time.time()
    rc = cli_main(
        ["train", "--config-path", config_path, "--datadir", datadir, "--modeldir", modeldir,
         "--epochs", str(args.epochs), "--steps-per-epoch", str(args.steps),
         "--mxp", "auto", "--jit"]
    )
    assert rc == 0, f"train CLI rc={rc}"
    record["train_steps"] = args.epochs * args.steps
    record["train_secs"] = round(time.time() - t0, 1)
    print(json.dumps(record), flush=True)

    t0 = time.time()
    rep1 = run_test(config_path, datadir, modeldir, "predictions_trained.tsv")
    record["trained"] = {k: {m: round(x, 4) for m, x in v.items()} for k, v in rep1.items()}
    record["test_secs"] = round(time.time() - t0, 1)
    print(json.dumps(record), flush=True)

    greedy_wer = rep1["greedy"]["wer"]
    beam_wer = rep1.get("beam", {}).get("wer", greedy_wer)
    assert greedy_wer < args.wer_target, f"greedy WER {greedy_wer} did not collapse (< {args.wer_target})"
    assert beam_wer <= greedy_wer + 0.02, f"beam WER {beam_wer} worse than greedy {greedy_wer}"
    record["ok"] = True
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
