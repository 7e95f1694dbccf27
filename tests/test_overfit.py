"""Learning sanity: overfit tiny models on a few utterances to (near-)zero
error. This exercises the full stack — frontend, encoder, loss, grads,
optimizer, decode, detokenize — and catches masking/length bugs that unit
tests can miss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu import schemas
from tensorflowasr_tpu.configs import DecoderConfig
from tensorflowasr_tpu.optimizers import build_optimizer
from tensorflowasr_tpu.tokenizers import CharTokenizer
from tensorflowasr_tpu.training import Trainer


def _make_batch(tok, texts, nsamples=3200, seed=0):
    rng = np.random.default_rng(seed)
    b = len(texts)
    sigs = np.zeros((b, nsamples), np.float32)
    for i in range(b):
        freqs = 200 + 80 * i
        sigs[i] = 0.4 * np.sin(2 * np.pi * freqs * np.arange(nsamples) / 16000) + 0.01 * rng.standard_normal(nsamples)
    label_list = [tok.tokenize(t) for t in texts]
    u = max(len(l) for l in label_list)
    labels = np.zeros((b, u), np.int32)
    labels_length = np.zeros((b,), np.int32)
    preds = np.zeros((b, u + 1), np.int32)
    preds_length = np.zeros((b,), np.int32)
    for i, l in enumerate(label_list):
        labels[i, : len(l)] = l
        labels_length[i] = len(l)
        preds[i, : len(l) + 1] = tok.prepand_blank(l)
        preds_length[i] = len(l) + 1
    return schemas.TrainData(
        inputs=schemas.TrainInput(
            inputs=jnp.asarray(sigs),
            inputs_length=jnp.full((b,), nsamples, jnp.int32),
            predictions=jnp.asarray(preds),
            predictions_length=jnp.asarray(preds_length),
        ),
        labels=schemas.TrainLabel(labels=jnp.asarray(labels), labels_length=jnp.asarray(labels_length)),
    )


@pytest.fixture(scope="module")
def tok():
    t = CharTokenizer(DecoderConfig({"type": "characters"}))
    t.make()
    return t


@pytest.mark.slow
def test_overfit_ctc_greedy_decode(tok):
    from tensorflowasr_tpu.models.ctc import base as ctc_base
    from tensorflowasr_tpu.models.ctc.deepspeech2 import DeepSpeech2

    texts = ["abc def", "ghi jk"]
    batch = _make_batch(tok, texts, nsamples=9600)
    model = DeepSpeech2.from_config(
        {
            "speech_config": {"num_feature_bins": 40, "nfft": 512},
            "conv_type": "conv2d",
            "conv_kernels": [[3, 5]],
            "conv_strides": [[2, 2]],
            "conv_filters": [8],
            "rnn_nlayers": 1,
            "rnn_units": 96,  # 64 units can plateau in a no-space optimum on some trajectories
            "rnn_bidirectional": True,
            "vocab_size": tok.num_classes,
        }
    )
    tx = build_optimizer({"class_name": "Adam", "config": {"learning_rate": 3e-3}})
    trainer = Trainer(model, tx)
    state = trainer.init_state(batch)
    loss0 = loss = None
    for i in range(600):
        state, metrics = trainer.train_step(state, batch)
        if loss0 is None:
            loss0 = float(metrics["loss"])
        if i >= 50:
            loss = float(metrics["loss"])
            if loss < 0.02:  # decisively overfit → decode is unambiguous
                break
    assert loss < loss0 * 0.2, f"loss did not drop: {loss0} -> {loss}"

    pin = schemas.PredictInput(inputs=batch.inputs.inputs, inputs_length=batch.inputs.inputs_length)
    out = ctc_base.recognize(model, state.variables(), pin)
    hyps = [tok.detokenize(np.asarray(out.tokens[i])) for i in range(2)]
    assert hyps == texts, f"greedy decode mismatch: {hyps} vs {texts}"


@pytest.mark.slow
def test_overfit_transducer_greedy_decode(tok):
    from tensorflowasr_tpu.models.transducer import base as transducer_base
    from tensorflowasr_tpu.models.transducer.conformer import Conformer

    texts = ["ab cd", "ef gh"]
    batch = _make_batch(tok, texts, nsamples=3200)
    model = Conformer.from_config(
        {
            "speech_config": {"num_feature_bins": 40, "nfft": 512},
            "encoder_subsampling": {
                "class_name": "Conv2dSubsampling",
                "config": {"filters": [16, 16], "kernels": [3, 3], "strides": [2, 2], "paddings": ["causal", "causal"], "norms": ["batch", "batch"], "activations": ["swish", "swish"]},
            },
            "encoder_dmodel": 32,
            "encoder_num_blocks": 1,
            "encoder_head_size": 8,
            "encoder_num_heads": 4,
            "encoder_kernel_size": 7,
            "encoder_dropout": 0.0,
            "prediction_embed_dim": 16,
            "prediction_num_rnns": 1,
            "prediction_rnn_units": 32,
            "joint_dim": 32,
            "vocab_size": tok.num_classes,
        }
    )
    tx = build_optimizer({"class_name": "Adam", "config": {"learning_rate": 3e-3}})
    trainer = Trainer(model, tx)
    state = trainer.init_state(batch)
    loss0 = None
    for i in range(300):
        state, metrics = trainer.train_step(state, batch)
        if loss0 is None:
            loss0 = float(metrics["loss"])
    loss = float(metrics["loss"])
    assert loss < loss0 * 0.25, f"loss did not drop: {loss0} -> {loss}"

    pin = schemas.PredictInput(inputs=batch.inputs.inputs, inputs_length=batch.inputs.inputs_length)
    out = transducer_base.recognize(model, state.variables(), pin)
    hyps = [tok.detokenize(np.asarray(out.tokens[i])) for i in range(2)]
    assert hyps == texts, f"transducer greedy mismatch: {hyps} vs {texts}"
