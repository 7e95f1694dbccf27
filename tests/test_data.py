"""Data pipeline tests: audio codecs, TFRecord IO, datasets."""

import os

import numpy as np
import pytest

from tensorflowasr_tpu import schemas
from tensorflowasr_tpu.configs import DecoderConfig
from tensorflowasr_tpu.data import audio, datasets, tfrecord
from tensorflowasr_tpu.tokenizers import CharTokenizer

REF_FLAC = "/root/reference/tests/test.flac"


# --------------------------------- audio IO ----------------------------------- #


def _sine(n=16000, freq=440, rate=16000):
    t = np.arange(n) / rate
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_wav_roundtrip(tmp_path):
    sig = _sine()
    p = str(tmp_path / "a.wav")
    audio.write_wav(p, sig, 16000)
    x, rate = audio.read_wav(p)
    assert rate == 16000
    np.testing.assert_allclose(x, sig, atol=1e-4)


def test_wav_stereo_and_readers(tmp_path):
    sig = np.stack([_sine(), _sine(freq=880)], axis=1)
    p = str(tmp_path / "st.wav")
    audio.write_wav(p, sig, 16000)
    x = audio.read_audio(p)  # mono-ized
    assert x.ndim == 1
    np.testing.assert_allclose(x, sig.mean(axis=1), atol=1e-4)


def test_flac_roundtrip_bit_exact(tmp_path):
    sig = _sine(8000)
    p = str(tmp_path / "a.flac")
    audio.write_flac(p, sig, 16000)
    x, rate = audio.read_flac(p)
    assert rate == 16000
    expected = np.clip(np.round(sig * 32768), -32768, 32767) / 32768.0
    np.testing.assert_array_equal(x, expected.astype(np.float32))


def test_flac_roundtrip_noise_and_multi_frame(tmp_path):
    rng = np.random.default_rng(0)
    sig = (rng.standard_normal(10000) * 0.3).clip(-1, 1).astype(np.float32)
    p = str(tmp_path / "n.flac")
    audio.write_flac(p, sig, 16000, block_size=2048)
    x, _ = audio.read_flac(p)
    expected = np.clip(np.round(sig * 32768), -32768, 32767) / 32768.0
    np.testing.assert_array_equal(x, expected.astype(np.float32))


@pytest.mark.skipif(not os.path.exists(REF_FLAC), reason="reference fixture unavailable")
def test_flac_decodes_real_libflac_file():
    x, rate = audio.read_flac(REF_FLAC)
    assert rate == 16000
    assert 8.0 < len(x) / rate < 10.0
    assert np.isfinite(x).all()
    assert 0.01 < np.sqrt((x**2).mean()) < 0.5  # plausible speech energy


def test_resample():
    sig = _sine(16000, rate=16000)
    y = audio.resample(sig, 16000, 8000)
    assert abs(len(y) - 8000) <= 1


# --------------------------------- tfrecord ----------------------------------- #


def test_tfrecord_framing_roundtrip(tmp_path):
    p = str(tmp_path / "x.tfrecord")
    recs = [b"hello", b"world", b"\x00" * 100]
    tfrecord.write_records(p, iter(recs))
    out = list(tfrecord.read_records(p, verify=True))
    assert out == recs


def test_tfrecord_gzip(tmp_path):
    p = str(tmp_path / "x.tfrecord.gz")
    tfrecord.write_records(p, iter([b"abc"] * 10), compression="GZIP")
    assert list(tfrecord.read_records(p, compression="GZIP", verify=True)) == [b"abc"] * 10


def test_example_proto_roundtrip():
    ex = tfrecord.encode_example({"path": "a/b.wav", "audio": b"\x01\x02", "ids": [1, 2, 300], "score": np.asarray([0.5, 1.5], np.float32)})
    dec = tfrecord.decode_example(ex)
    assert dec["path"] == b"a/b.wav"
    assert dec["audio"] == b"\x01\x02"
    np.testing.assert_array_equal(dec["ids"], [1, 2, 300])
    np.testing.assert_allclose(dec["score"], [0.5, 1.5])


def test_example_proto_matches_tensorflow():
    tf = pytest.importorskip("tensorflow")
    ours = tfrecord.encode_example({"transcript": "hello", "ids": [1, 2, 3]})
    theirs = tf.train.Example.FromString(ours)
    assert theirs.features.feature["transcript"].bytes_list.value[0] == b"hello"
    assert list(theirs.features.feature["ids"].int64_list.value) == [1, 2, 3]
    # and decode theirs
    ex = tf.train.Example()
    ex.features.feature["x"].bytes_list.value.append(b"yo")
    ex.features.feature["n"].int64_list.value.extend([7, 8])
    dec = tfrecord.decode_example(ex.SerializeToString())
    assert dec["x"] == b"yo"
    np.testing.assert_array_equal(dec["n"], [7, 8])


# --------------------------------- datasets ----------------------------------- #


@pytest.fixture()
def manifest(tmp_path):
    tok = CharTokenizer(DecoderConfig({"type": "characters"}))
    tok.make()
    rows = []
    for i, text in enumerate(["hello world", "test audio", "a b c"]):
        n = 1600 * (i + 2)
        sig = _sine(n)
        p = str(tmp_path / f"{i}.wav")
        audio.write_wav(p, sig, 16000)
        rows.append(f"{p}\t{n / 16000.0}\t{text}")
    mpath = tmp_path / "train.tsv"
    mpath.write_text("PATH\tDURATION\tTRANSCRIPT\n" + "\n".join(rows) + "\n")
    return tok, str(mpath), tmp_path


def test_dataset_entries_and_metadata(manifest, tmp_path):
    tok, mpath, _ = manifest
    ds = datasets.ASRSliceDataset(tokenizer=tok, stage="train", data_paths=[mpath], indefinite=False)
    ds.read_entries()
    assert ds.num_entries == 3
    meta = ds.compute_metadata()
    assert meta["max_input_length"] == 1600 * 4
    assert meta["max_label_length"] == len("hello world")
    meta_path = str(tmp_path / "meta.json")
    ds.save_metadata(meta_path)
    ds2 = datasets.ASRSliceDataset(tokenizer=tok, stage="train", data_paths=[mpath], metadata=meta_path)
    assert ds2.max_input_length == 6400


def test_dataset_batches_static_shapes(manifest):
    tok, mpath, _ = manifest
    ds = datasets.ASRSliceDataset(tokenizer=tok, stage="train", data_paths=[mpath], indefinite=False, drop_remainder=False)
    ds.compute_metadata()
    batches = list(ds.create(batch_size=2, prefetch=0))
    assert len(batches) == 2
    b = batches[0]
    assert isinstance(b, schemas.TrainData)
    assert b.inputs.inputs.shape == (2, 6400)
    assert b.inputs.predictions.shape[1] == b.labels.labels.shape[1] + 1
    assert int(b.labels.labels_length[0]) == len("hello world")
    # blank-prepended predictions
    assert b.inputs.predictions[0, 0] == tok.blank


def test_dataset_infinite_repeat(manifest):
    tok, mpath, _ = manifest
    ds = datasets.ASRSliceDataset(tokenizer=tok, stage="train", data_paths=[mpath], indefinite=True)
    ds.compute_metadata()
    it = ds.create(batch_size=2, prefetch=0)
    for _ in range(5):  # > num_entries/batch → repeats
        b = next(it)
        assert b.inputs.inputs.shape == (2, 6400)


def test_dataset_prefetch_thread(manifest):
    tok, mpath, _ = manifest
    ds = datasets.ASRSliceDataset(tokenizer=tok, stage="train", data_paths=[mpath], indefinite=False)
    ds.compute_metadata()
    batches = list(ds.create(batch_size=1, prefetch=2))
    assert len(batches) == 3


def test_tfrecord_dataset_roundtrip(manifest, tmp_path):
    tok, mpath, _ = manifest
    ds = datasets.ASRTFRecordDataset(
        tokenizer=tok, stage="train", data_paths=[mpath], tfrecords_dir=str(tmp_path / "recs"), tfrecords_shards=2, indefinite=False
    )
    assert ds.create_tfrecords()
    ds.compute_metadata()
    exs = []
    it = ds.examples()
    for _ in range(3):
        exs.append(next(it))
    texts = sorted(tok.detokenize(e["labels"]) for e in exs)
    assert texts == ["a b c", "hello world", "test audio"]


def test_get_global_shape(manifest):
    tok, mpath, _ = manifest
    from tensorflowasr_tpu.configs import Config

    ds = datasets.ASRSliceDataset(tokenizer=tok, stage="train", data_paths=[mpath], indefinite=False)
    ds.compute_metadata()
    cfg = Config({"learning_config": {"batch_size": 4}}, training=True)
    shapes = datasets.get_global_shape(cfg, ds, num_devices=2)
    assert shapes["batch_size"] == 8
    assert shapes["local_batch_size"] == 8
    assert shapes["padded_input_length"] == 6400
    # multi-host: each process feeds bs x local devices
    shapes = datasets.get_global_shape(cfg, ds, num_devices=8, num_local_devices=4)
    assert shapes["batch_size"] == 32
    assert shapes["local_batch_size"] == 16


def test_dataset_parallel_workers(manifest):
    tok, mpath, _ = manifest
    ds = datasets.ASRSliceDataset(tokenizer=tok, stage="train", data_paths=[mpath], indefinite=False)
    ds.compute_metadata()
    serial = [tok.detokenize(e["labels"]) for e in ds.examples(num_workers=0)]
    parallel = [tok.detokenize(e["labels"]) for e in ds.examples(num_workers=4)]
    assert serial == parallel  # order preserved


def test_audio_duration_header_only(tmp_path):
    """audio_duration reads container headers (FLAC STREAMINFO / WAV fmt)
    and must agree with the decoded sample count."""
    from tensorflowasr_tpu.data import audio as audio_lib

    rng = np.random.default_rng(0)
    sig = (rng.standard_normal(12345) * 0.1).astype(np.float32)
    fpath, wpath = str(tmp_path / "a.flac"), str(tmp_path / "a.wav")
    audio_lib.write_flac(fpath, sig, 16000)
    audio_lib.write_wav(wpath, sig, 16000)
    for path in (fpath, wpath):
        dur = audio_lib.audio_duration(path)
        decoded = audio_lib.read_audio(path, sample_rate=16000)
        np.testing.assert_allclose(dur, decoded.shape[0] / 16000, atol=1e-6)


def test_prepare_transcript_librispeech_layout(tmp_path):
    """examples/datasets/librispeech/prepare_transcript.py over a synthetic
    LibriSpeech tree produces the TSV manifest our datasets consume."""
    import subprocess
    import sys

    from tensorflowasr_tpu.data import audio as audio_lib

    rng = np.random.default_rng(1)
    spk = tmp_path / "LibriSpeech" / "19" / "198"
    spk.mkdir(parents=True)
    with open(spk / "19-198.trans.txt", "w") as f:
        for i in range(3):
            utt = f"19-198-{i:04d}"
            audio_lib.write_flac(str(spk / f"{utt}.flac"), (rng.standard_normal(1600 * (i + 1)) * 0.1).astype(np.float32), 16000)
            f.write(f"{utt} HELLO WORLD {i}\n")
    out = tmp_path / "train.tsv"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=root)  # examples import the package from the checkout
    subprocess.run(
        [sys.executable, "examples/datasets/librispeech/prepare_transcript.py", "--directory", str(tmp_path / "LibriSpeech"), "--output", str(out)],
        check=True,
        cwd=root,
        env=env,
    )
    lines = out.read_text().splitlines()
    assert lines[0] == "PATH\tDURATION\tTRANSCRIPT"
    assert len(lines) == 4
    path0, dur0, text0 = lines[1].split("\t")
    assert path0.endswith("19-198-0000.flac")
    np.testing.assert_allclose(float(dur0), 0.1, atol=1e-3)
    assert text0 == "hello world 0"
