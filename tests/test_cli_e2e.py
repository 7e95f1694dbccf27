"""End-to-end CLI test: synthetic dataset → train → test → export."""

import os

import numpy as np
import pytest

from tensorflowasr_tpu.data import audio


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    datadir = root / "data"
    modeldir = root / "model"
    datadir.mkdir()
    modeldir.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    texts = ["hello world", "speech test", "jax on tpu", "tiny data"]
    for i, text in enumerate(texts):
        n = 3200
        sig = (0.3 * np.sin(2 * np.pi * (300 + 50 * i) * np.arange(n) / 16000) + 0.01 * rng.standard_normal(n)).astype(np.float32)
        p = datadir / f"{i}.wav"
        audio.write_wav(str(p), sig, 16000)
        rows.append(f"{p}\t{n / 16000.0}\t{text}")
    manifest = datadir / "train.tsv"
    manifest.write_text("PATH\tDURATION\tTRANSCRIPT\n" + "\n".join(rows) + "\n")

    config = root / "config.yml.j2"
    config.write_text(
        """
decoder_config:
  type: characters
  blank_index: 0

model_config:
  class_name: tensorflow_asr.models.ctc.deepspeech2>DeepSpeech2
  config:
    name: ds2-tiny
    speech_config:
      sample_rate: 16000
      frame_ms: 25
      stride_ms: 10
      num_feature_bins: 40
      nfft: 512
      feature_type: log_mel_spectrogram
    conv_type: conv2d
    conv_kernels: [[3, 5]]
    conv_strides: [[2, 2]]
    conv_filters: [4]
    rnn_nlayers: 1
    rnn_type: lstm
    rnn_units: 16
    rnn_bidirectional: True
    fc_nlayers: 0
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
    - name: synthetic
      data_paths:
        - {{datadir}}/train.tsv
      stage: test

learning_config:
  optimizer_config:
    class_name: Adam
    config:
      learning_rate: 0.005
  batch_size: 2
  num_epochs: 1
  callbacks:
    - class_name: tensorflow_asr.callbacks>TerminateOnNaN
      config: {}
"""
    )
    return {"root": root, "config": str(config), "datadir": str(datadir), "modeldir": str(modeldir)}


def test_cli_train(workspace):
    from tensorflowasr_tpu.scripts import main

    rc = main(
        [
            "train",
            "--config-path", workspace["config"],
            "--datadir", workspace["datadir"],
            "--modeldir", workspace["modeldir"],
            "--epochs", "1",
            "--steps-per-epoch", "3",
            "--mxp", "none",
        ]
    )
    assert rc == 0
    ckpt_dir = os.path.join(workspace["modeldir"], "checkpoints")
    assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)


def test_cli_test(workspace):
    from tensorflowasr_tpu.scripts import main

    out = os.path.join(workspace["modeldir"], "predictions.tsv")
    rc = main(
        [
            "test",
            "--config-path", workspace["config"],
            "--datadir", workspace["datadir"],
            "--modeldir", workspace["modeldir"],
            "--bs", "2",
            "--output", out,
        ]
    )
    assert rc == 0
    lines = open(out).read().splitlines()
    assert lines[0].startswith("PATH")
    assert len(lines) == 5  # header + 4 utterances


def test_cli_export_stablehlo(workspace):
    from tensorflowasr_tpu.scripts import main

    out = os.path.join(workspace["modeldir"], "model.stablehlo")
    rc = main(
        [
            "export",
            "--config-path", workspace["config"],
            "--datadir", workspace["datadir"],
            "--modeldir", workspace["modeldir"],
            "--output", out,
        ]
    )
    assert rc == 0
    assert os.path.getsize(out) > 1000
    # reload + run the serialized artifact
    from tensorflowasr_tpu.export import load_stablehlo

    fn = load_stablehlo(out)
    tokens = fn(np.zeros((1, 16000), np.float32), np.asarray([16000], np.int32))
    assert tokens is not None


def test_cli_mls_trans(tmp_path):
    from tensorflowasr_tpu.data import audio as audio_lib
    from tensorflowasr_tpu.scripts.utils.create_mls_trans import convert_split

    split = tmp_path / "train"
    (split / "audio" / "1001" / "22").mkdir(parents=True)
    sig = np.zeros(1600, np.float32)
    audio_lib.write_flac(str(split / "audio" / "1001" / "22" / "1001_22_000000.flac"), sig, 16000)
    (split / "transcripts.txt").write_text("1001_22_000000\thello mls\n")
    out = convert_split(str(split))
    lines = open(out).read().splitlines()
    assert lines[0] == "PATH\tDURATION\tTRANSCRIPT"
    assert lines[1].endswith("hello mls")
    assert "0.100" in lines[1]


def test_cli_train_tfrecord_pipeline(workspace):
    """Train a couple of steps reading from self-created TFRecord shards."""
    from tensorflowasr_tpu.scripts import main

    # write shards first (utils create_tfrecords needs tfrecords_dir in config;
    # exercise the dataset-level API directly instead)
    from tensorflowasr_tpu.configs import Config
    from tensorflowasr_tpu import tokenizers as tok_mod
    from tensorflowasr_tpu.data import datasets

    cfg = Config(workspace["config"], training=True, datadir=workspace["datadir"], modeldir=workspace["modeldir"])
    tok = tok_mod.get(cfg)
    tok.make()
    dc = cfg.data_config.train_dataset_config
    ds = datasets.ASRTFRecordDataset(
        tokenizer=tok, stage="train", data_paths=dc.data_paths,
        tfrecords_dir=os.path.join(workspace["datadir"], "tfrecords"), tfrecords_shards=2, indefinite=True,
    )
    assert ds.create_tfrecords()
    ds.compute_metadata()
    it = ds.create(2, prefetch=0)
    b = next(it)
    assert b.inputs.inputs.shape[0] == 2
    # and a second batch cycles through shards fine
    b2 = next(it)
    assert b2.inputs.inputs.shape == b.inputs.inputs.shape


def test_cli_export_streaming_signature(workspace):
    from tensorflowasr_tpu.scripts import main

    out = os.path.join(workspace["modeldir"], "model_streaming.stablehlo")
    rc = main(
        [
            "export",
            "--config-path", workspace["config"],
            "--datadir", workspace["datadir"],
            "--modeldir", workspace["modeldir"],
            "--output", out,
            "--streaming",
        ]
    )
    assert rc == 0 and os.path.getsize(out) > 1000
