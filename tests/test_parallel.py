"""Data-parallel sharding + multi-host (pod) pathway tests.

Runs on the 8-device virtual CPU mesh from conftest. True multi-process
execution can't happen inside one pytest process, so the pod paths are
validated piecewise: manifest partitioning across mocked process ranks,
zero-padding of indivisible batches, and masked-mean losses that make the
padding semantically invisible.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorflowasr_tpu.ops import losses as losses_mod
from tensorflowasr_tpu.parallel import sharding


def test_shard_batch_pads_indivisible_batches():
    from tensorflowasr_tpu import schemas

    mesh = sharding.make_data_parallel_mesh()
    n = mesh.shape["data"]
    b = n - 2  # indivisible
    batch = schemas.TrainData(
        inputs=schemas.TrainInput(
            inputs=np.ones((b, 100), np.float32),
            inputs_length=np.full((b,), 100, np.int32),
            predictions=np.ones((b, 5), np.int32),
            predictions_length=np.full((b,), 5, np.int32),
        ),
        labels=schemas.TrainLabel(
            labels=np.ones((b, 4), np.int32),
            labels_length=np.full((b,), 4, np.int32),
        ),
    )
    out = sharding.shard_batch(batch, mesh)
    assert out.inputs.inputs.shape[0] == n
    lens = np.asarray(out.inputs.inputs_length)
    assert (lens[:b] == 100).all() and (lens[b:] == 0).all()
    # actually sharded, not replicated
    assert not out.inputs.inputs.sharding.is_fully_replicated


@pytest.mark.parametrize("which", ["ctc", "rnnt"])
def test_masked_mean_loss_ignores_padded_rows(which):
    rng = np.random.default_rng(0)
    b, t, u, v = 2, 12, 4, 8
    labels = rng.integers(1, v, (b, u)).astype(np.int32)
    label_length = np.asarray([u, u - 1], np.int32)
    logit_length = np.asarray([t, t - 2], np.int32)
    if which == "ctc":
        logits = rng.standard_normal((b, t, v)).astype(np.float32)
        fn = losses_mod.masked_mean(losses_mod.ctc_loss)
    else:
        logits = rng.standard_normal((b, t, u + 1, v)).astype(np.float32)
        fn = losses_mod.masked_mean(losses_mod.rnnt_loss)

    base = float(fn(jnp.asarray(logits), logit_length, labels, label_length))

    # zero-pad two extra rows with zero lengths: mean must not move
    pad = [(0, 2)] + [(0, 0)] * (logits.ndim - 1)
    logits_p = np.pad(logits, pad)
    labels_p = np.pad(labels, [(0, 2), (0, 0)])
    padded = float(
        fn(
            jnp.asarray(logits_p),
            np.pad(logit_length, (0, 2)),
            labels_p,
            np.pad(label_length, (0, 2)),
        )
    )
    assert np.isfinite(base)
    np.testing.assert_allclose(padded, base, rtol=1e-6)


@pytest.mark.parametrize("which", ["ctc", "rnnt"])
def test_masked_mean_loss_gradients_finite_with_padding(which):
    rng = np.random.default_rng(1)
    b, t, u, v = 4, 10, 3, 6
    shape = (b, t, v) if which == "ctc" else (b, t, u + 1, v)
    logits = rng.standard_normal(shape).astype(np.float32)
    labels = rng.integers(1, v, (b, u)).astype(np.int32)
    logit_length = np.asarray([t, t, 0, 0], np.int32)  # last two are padding
    label_length = np.asarray([u, u, 0, 0], np.int32)
    loss_fn = losses_mod.masked_mean(losses_mod.ctc_loss if which == "ctc" else losses_mod.rnnt_loss)

    g = jax.grad(lambda lg: loss_fn(lg, logit_length, labels, label_length))(jnp.asarray(logits))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    # padded rows contribute nothing
    np.testing.assert_array_equal(g[2:], 0.0)
    assert np.abs(g[:2]).sum() > 0


def test_process_local_entries_partition(tmp_path, monkeypatch):
    from tensorflowasr_tpu.data import datasets as ds_mod
    from tensorflowasr_tpu.tokenizers.char import CharTokenizer
    from tensorflowasr_tpu.configs import DecoderConfig

    manifest = tmp_path / "transcripts.tsv"
    rows = [f"/audio/{i}.wav\t1.0\ttext {i}" for i in range(10)]
    manifest.write_text("PATH\tDURATION\tTRANSCRIPT\n" + "\n".join(rows) + "\n")

    tok = CharTokenizer(DecoderConfig({}))
    tok.make()

    def build():
        return ds_mod.ASRSliceDataset(
            tokenizer=tok, stage="train", data_paths=[str(manifest)], shuffle=False, indefinite=False
        )

    full = build()
    full.read_entries()
    assert full.num_entries == 10

    seen = []
    for pi in range(2):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda pi=pi: pi)
        d = build()
        d.read_entries()
        local = d._process_local_entries()
        assert len(local) == 5
        seen.extend(e[0] for e in local)
    # disjoint union covers the whole manifest
    assert sorted(seen) == sorted(e[0] for e in full.entries)

    # opt-out flag keeps the full manifest per process
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    d = build()
    d.shard_across_processes = False
    d.read_entries()
    assert len(d._process_local_entries()) == 10


def test_multihost_batch_assembly_math():
    """make_array_from_process_local_data on 1 process == device_put; the
    per-process local batch maths used by shard_batch hold."""
    mesh = sharding.make_data_parallel_mesh()
    n = mesh.shape["data"]
    x = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
    sh = sharding.batch_sharding(mesh)
    a = jax.make_array_from_process_local_data(sh, x)
    b = jax.device_put(x, sh)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert sharding.process_count() == 1
