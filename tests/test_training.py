"""Training machinery tests: schedules, optimizers, DP train step, metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu import schemas
from tensorflowasr_tpu.optimizers import build_optimizer, build_schedule
from tensorflowasr_tpu.optimizers.schedules import TransformerSchedule
from tensorflowasr_tpu.training import Trainer, TrainState, make_train_step
from tensorflowasr_tpu.training.metrics import ErrorRateAccumulator, cer, evaluate_hypotheses, wer


# ------------------------------- schedules ------------------------------------ #


def test_transformer_schedule_shape():
    sch = TransformerSchedule(dmodel=144, warmup_steps=100, scale=2.0, max_lr="0.05/(144**0.5)")
    lrs = [float(sch(s)) for s in [1, 50, 100, 200, 10000]]
    assert lrs[1] > lrs[0]  # warmup rising
    assert lrs[4] < lrs[3]  # decay
    assert max(lrs) <= 0.05 / (144**0.5) + 1e-9


def test_build_schedule_variants():
    assert build_schedule(1e-3) == 1e-3
    sch = build_schedule({"class_name": "tensorflow_asr.optimizers.schedules>TransformerSchedule", "config": {"dmodel": 64}})
    assert float(sch(10)) > 0


# ------------------------------- optimizers ----------------------------------- #


def test_build_optimizer_with_ga():
    import optax

    tx = build_optimizer({"class_name": "Adam", "config": {"learning_rate": 1e-3}}, ga_steps=4)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    g = {"w": jnp.ones((3,))}
    p = params
    # first 3 updates are zero (accumulating), 4th applies
    for i in range(4):
        updates, state = tx.update(g, state, p)
        p = optax.apply_updates(p, updates)
        if i < 3:
            np.testing.assert_allclose(np.asarray(p["w"]), 1.0)
    assert np.abs(np.asarray(p["w"]) - 1.0).max() > 1e-5


def test_gradient_noise_transform():
    from tensorflowasr_tpu.optimizers.optimizers import gradient_noise

    tx = gradient_noise(eta=1.0, start_step=0)
    params = {"w": jnp.zeros((100,))}
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.zeros((100,))}, state, params)
    assert np.abs(np.asarray(updates["w"])).max() > 0  # noise added


# ------------------------------ metrics --------------------------------------- #


def test_wer_cer():
    assert wer(["hello world"], ["hello world"]) == 0.0
    assert wer(["a b c d"], ["a x c"]) == pytest.approx(2 / 4)  # 1 sub + 1 del
    assert cer(["abc"], ["abc"]) == 0.0
    assert cer(["abcd"], ["abxd"]) == pytest.approx(1 / 4)


def test_error_rate_accumulator_streaming():
    acc = ErrorRateAccumulator()
    acc.update("a b c".split(), "a b c".split())
    acc.update("a b".split(), "a x".split())
    assert acc.error_rate == pytest.approx(1 / 5)


def test_evaluate_hypotheses_report():
    rep = evaluate_hypotheses([("the cat sat", "the cat sat"), ("a b", "a c")])
    assert rep["wer"] == pytest.approx(1 / 5)
    assert 0 <= rep["wip"] <= 1
    assert rep["wil"] == pytest.approx(1 - rep["wip"])


# ---------------------------- DP train step ----------------------------------- #


@pytest.fixture(scope="module")
def tiny_ctc_setup():
    from tensorflowasr_tpu.models.ctc.deepspeech2 import DeepSpeech2

    model = DeepSpeech2.from_config(
        {
            "speech_config": {"num_feature_bins": 20, "nfft": 256, "frame_ms": 25, "stride_ms": 10},
            "conv_type": "conv2d",
            "conv_kernels": [[3, 5]],
            "conv_strides": [[2, 2]],
            "conv_filters": [4],
            "rnn_nlayers": 1,
            "rnn_units": 8,
            "rnn_bidirectional": True,
            "vocab_size": 10,
        }
    )
    rng = np.random.default_rng(0)
    b = 8  # divisible by 8 devices
    batch = schemas.TrainData(
        inputs=schemas.TrainInput(
            inputs=jnp.asarray(rng.standard_normal((b, 3200)), jnp.float32),
            inputs_length=jnp.asarray([3200] * b),
            predictions=jnp.zeros((b, 6), jnp.int32),
            predictions_length=jnp.ones((b,), jnp.int32) * 6,
        ),
        labels=schemas.TrainLabel(
            labels=jnp.asarray(rng.integers(1, 10, (b, 5)), jnp.int32),
            labels_length=jnp.ones((b,), jnp.int32) * 5,
        ),
    )
    return model, batch


def test_trainer_dp_train_step_decreases_loss(tiny_ctc_setup):
    model, batch = tiny_ctc_setup
    tx = build_optimizer({"class_name": "Adam", "config": {"learning_rate": 5e-3}})
    trainer = Trainer(model, tx)
    assert trainer.mesh.shape["data"] == jax.device_count()
    state = trainer.init_state(batch)
    losses = []
    for _ in range(5):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


def test_trainer_gwn(tiny_ctc_setup):
    model, batch = tiny_ctc_setup
    tx = build_optimizer({"class_name": "Adam", "config": {"learning_rate": 1e-3}})
    trainer = Trainer(model, tx, gwn_config={"step": 0, "stddev": 0.01})
    state = trainer.init_state(batch)
    state, metrics = trainer.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_trainer_checkpoint_roundtrip(tiny_ctc_setup, tmp_path):
    model, batch = tiny_ctc_setup
    tx = build_optimizer({"class_name": "Adam", "config": {"learning_rate": 1e-3}})
    trainer = Trainer(model, tx, checkpoint_dir=str(tmp_path / "ckpt"))
    state = trainer.init_state(batch)
    state, _ = trainer.train_step(state, batch)
    trainer.save(state)

    trainer2 = Trainer(model, tx, checkpoint_dir=str(tmp_path / "ckpt"))
    state2 = trainer2.init_state(batch)
    state2 = trainer2.restore(state2)
    assert int(state2.step) == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state2.params)[0]),
    )


def test_trainer_fit_with_callbacks(tiny_ctc_setup):
    from tensorflowasr_tpu.training.callbacks import TerminateOnNaN, deserialize

    model, batch = tiny_ctc_setup
    tx = build_optimizer({"class_name": "Adam", "config": {"learning_rate": 1e-3}})
    cbs = deserialize([{"class_name": "tensorflow_asr.callbacks>TerminateOnNaN", "config": {}}])
    assert isinstance(cbs[0], TerminateOnNaN)
    trainer = Trainer(model, tx, callbacks=cbs)
    state = trainer.init_state(batch)
    state = trainer.fit(state, [batch, batch], epochs=1, eval_data=[batch])
    assert int(state.step) == 2


@pytest.mark.slow
def test_evaluate_dataset_wer(tmp_path):
    """End-to-end evaluation helper: overfit a tiny model then evaluate WER=0."""
    from tensorflowasr_tpu.configs import DecoderConfig
    from tensorflowasr_tpu.data import audio, datasets
    from tensorflowasr_tpu.models.ctc.deepspeech2 import DeepSpeech2
    from tensorflowasr_tpu.tokenizers import CharTokenizer
    from tensorflowasr_tpu.training.evaluation import evaluate_dataset

    tok = CharTokenizer(DecoderConfig({"type": "characters"}))
    tok.make()
    texts = ["ab cd", "ef gh"]
    rows = []
    for i, text in enumerate(texts):
        n = 6400
        sig = (0.4 * np.sin(2 * np.pi * (250 + 90 * i) * np.arange(n) / 16000)).astype(np.float32)
        p = str(tmp_path / f"{i}.wav")
        audio.write_wav(p, sig, 16000)
        rows.append(f"{p}\t{n / 16000.0}\t{text}")
    mpath = tmp_path / "train.tsv"
    mpath.write_text("PATH\tDURATION\tTRANSCRIPT\n" + "\n".join(rows) + "\n")

    ds = datasets.ASRSliceDataset(tokenizer=tok, stage="train", data_paths=[str(mpath)], indefinite=False)
    ds.compute_metadata()
    batch = next(ds.create(2, prefetch=0))

    model = DeepSpeech2.from_config(
        {
            "speech_config": {"num_feature_bins": 40, "nfft": 512},
            "conv_type": "conv2d",
            "conv_kernels": [[3, 5]],
            "conv_strides": [[2, 2]],
            "conv_filters": [8],
            "rnn_nlayers": 1,
            "rnn_units": 64,
            "rnn_bidirectional": True,
            "vocab_size": tok.num_classes,
        }
    )
    tx = build_optimizer({"class_name": "Adam", "config": {"learning_rate": 3e-3}})
    trainer = Trainer(model, tx)
    state = trainer.init_state(batch)
    for _ in range(250):
        state, _ = trainer.train_step(state, batch)

    report = evaluate_dataset(model, state.variables(), ds, tok, batch_size=2, collect_rows=True)
    assert report["greedy"]["wer"] == 0.0, report
    assert len(report["rows"]) == 2


def test_edit_distance_on_device():
    from tensorflowasr_tpu.ops.edit_distance import edit_distance, wer_on_device

    def brute(a, b):
        prev = list(range(len(a) + 1))
        for i, y in enumerate(b):
            cur = [i + 1]
            for j, x in enumerate(a):
                cur.append(min(prev[j + 1] + 1, cur[-1] + 1, prev[j] + (x != y)))
            prev = cur
        return prev[-1]

    rng = np.random.default_rng(0)
    refs = rng.integers(1, 5, (16, 8)).astype(np.int32)
    hyps = rng.integers(1, 5, (16, 9)).astype(np.int32)
    rl = rng.integers(0, 9, 16).astype(np.int32)
    hl = rng.integers(0, 10, 16).astype(np.int32)
    got = np.asarray(jax.jit(edit_distance)(jnp.asarray(refs), jnp.asarray(rl), jnp.asarray(hyps), jnp.asarray(hl)))
    for b in range(16):
        assert got[b] == brute(list(refs[b, : rl[b]]), list(hyps[b, : hl[b]]))
    num, den = wer_on_device(jnp.asarray(refs), jnp.asarray(rl), jnp.asarray(hyps), jnp.asarray(hl))
    assert int(den) == rl.sum()


# ------------------------------- warm start ----------------------------------- #


def test_pretrained_warm_start(tiny_ctc_setup, tmp_path):
    """By-name shape-checked weight loading (reference scripts/train.py:97-102
    Keras load_weights(by_name=True, skip_mismatch=True) parity): matching
    leaves restored, mismatched shapes skipped with init kept."""
    import orbax.checkpoint as ocp

    from tensorflowasr_tpu.training.pretrained import warm_start

    model, batch = tiny_ctc_setup
    tx = build_optimizer({"class_name": "Adam", "config": {"learning_rate": 1e-3}})
    trainer = Trainer(model, tx)
    state = trainer.init_state(batch, seed=0)

    # source checkpoint: a save.py-style variables artifact from DIFFERENT init
    donor = trainer.init_state(batch, seed=123)
    donor_vars = {"params": jax.device_get(donor.params)}
    path = tmp_path / "pretrained"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(str(path), donor_vars)

    state2 = warm_start(state, str(path))
    # every leaf equals the donor now
    for a, b in zip(jax.tree.leaves(state2.params), jax.tree.leaves(donor.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # shape-mismatched donor: smaller vocab head → those leaves keep init
    donor_small = jax.device_get(donor.params)
    import flax

    flat2 = flax.traverse_util.flatten_dict(donor_small)
    changed = 0
    for k in list(flat2):
        if k[0] == "vocab":  # the CTC head
            flat2[k] = flat2[k][..., :-1]
            changed += 1
    assert changed > 0
    donor2 = {"params": flax.traverse_util.unflatten_dict(flat2)}
    path2 = tmp_path / "pretrained2"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(str(path2), donor2)
    state3 = warm_start(state, str(path2))
    f_init = flax.traverse_util.flatten_dict(jax.device_get(state.params))
    f_new = flax.traverse_util.flatten_dict(jax.device_get(state3.params))
    f_donor = flax.traverse_util.flatten_dict(donor_small)
    for k in f_init:
        if k[0] == "vocab":
            np.testing.assert_allclose(f_new[k], f_init[k])  # kept init
        else:
            np.testing.assert_allclose(f_new[k], f_donor[k])  # loaded


def test_check_numerics_env(monkeypatch):
    from tensorflowasr_tpu.utils import env_util

    monkeypatch.delenv("TFASR_CHECK_NUMERICS", raising=False)
    assert env_util.setup_check_numerics() is False
    monkeypatch.setenv("TFASR_CHECK_NUMERICS", "1")
    try:
        assert env_util.setup_check_numerics() is True
        assert jax.config.jax_debug_nans
    finally:
        jax.config.update("jax_debug_nans", False)
        jax.config.update("jax_debug_infs", False)
