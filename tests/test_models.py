"""End-to-end model tests: forward shapes, recognize, config-driven build."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu import schemas
from tensorflowasr_tpu.models import build_model
from tensorflowasr_tpu.models.ctc import base as ctc_base
from tensorflowasr_tpu.models.ctc.deepspeech2 import DeepSpeech2
from tensorflowasr_tpu.models.transducer import base as transducer_base
from tensorflowasr_tpu.models.transducer.conformer import Conformer

SPEECH = {"sample_rate": 16000, "frame_ms": 25, "stride_ms": 10, "num_feature_bins": 40, "nfft": 512}

CONFORMER_CFG = {
    "speech_config": SPEECH,
    "encoder_subsampling": {
        "class_name": "tensorflow_asr.models.layers.subsampling>Conv2dSubsampling",
        "config": {"filters": [16, 16], "kernels": [3, 3], "strides": [2, 2], "paddings": ["causal", "causal"], "norms": ["batch", "batch"], "activations": ["swish", "swish"]},
    },
    "encoder_dmodel": 16,
    "encoder_num_blocks": 1,
    "encoder_head_size": 4,
    "encoder_num_heads": 4,
    "encoder_mha_type": "relmha",
    "encoder_kernel_size": 7,
    "encoder_dropout": 0.0,
    "prediction_label_encode_mode": "embedding",
    "prediction_embed_dim": 8,
    "prediction_num_rnns": 1,
    "prediction_rnn_units": 16,
    "prediction_rnn_type": "lstm",
    "prediction_layer_norm": True,
    "prediction_projection_units": 0,
    "joint_dim": 16,
    "prejoint_encoder_linear": True,
    "prejoint_prediction_linear": True,
    "joint_activation": "tanh",
    "joint_mode": "add",
    "blank": 0,
    "vocab_size": 20,
}


def _train_input(b=2, n=3200, u=5, vocab=20):
    rng = np.random.default_rng(0)
    return schemas.TrainInput(
        inputs=jnp.asarray(rng.standard_normal((b, n)), jnp.float32),
        inputs_length=jnp.asarray([n, n // 2]),
        predictions=jnp.pad(rng.integers(1, vocab, (b, u)).astype(np.int32), ((0, 0), (1, 0))),  # blank-prepended
        predictions_length=jnp.asarray([u + 1, u]),
    )


@pytest.fixture(scope="module")
def conformer_and_vars():
    model = Conformer.from_config(CONFORMER_CFG)
    ti = _train_input()
    vars_ = model.init({"params": jax.random.PRNGKey(0)}, ti, train=False)
    return model, vars_, ti


def test_conformer_transducer_forward(conformer_and_vars):
    model, vars_, ti = conformer_and_vars
    out = model.apply(vars_, ti, train=False)
    # T: 3200 samples → 20 frames → /4 subsampling = 5; U+1 = 6
    assert out.logits.shape == (2, 5, 6, 20)
    np.testing.assert_array_equal(np.asarray(out.logits_length), [5, 3])


def test_conformer_transducer_train_step_loss(conformer_and_vars):
    from tensorflowasr_tpu.ops.rnnt_loss import rnnt_loss_mean

    model, vars_, ti = conformer_and_vars

    def loss_fn(params):
        out, _ = model.apply(
            {**vars_, "params": params}, ti, train=True,
            rngs={"dropout": jax.random.PRNGKey(1), "augment": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        labels = ti.predictions[:, 1:]
        labels_length = ti.predictions_length - 1
        return rnnt_loss_mean(out.logits, out.logits_length, labels, labels_length)

    loss, grads = jax.value_and_grad(loss_fn)(vars_["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)


def test_conformer_transducer_recognize(conformer_and_vars):
    model, vars_, ti = conformer_and_vars
    pin = schemas.PredictInput(inputs=ti.inputs, inputs_length=ti.inputs_length)
    out = transducer_base.recognize(model, vars_, pin)
    assert out.tokens.shape == (2, 11)  # 2*5+1
    assert out.next_tokens.shape == (2,)
    # beam path
    out_beam = transducer_base.recognize(model, vars_, pin, beam_width=2)
    assert out_beam.tokens.shape == (2, 11)


def test_ctc_model_forward_and_recognize():
    model = DeepSpeech2.from_config(
        {
            "speech_config": SPEECH,
            "conv_type": "conv2d",
            "conv_kernels": [[3, 5]],
            "conv_strides": [[2, 2]],
            "conv_filters": [4],
            "rnn_nlayers": 1,
            "rnn_units": 8,
            "rnn_bidirectional": True,
            "fc_nlayers": 1,
            "fc_units": 8,
            "vocab_size": 10,
        }
    )
    ti = _train_input(vocab=10)
    vars_ = model.init({"params": jax.random.PRNGKey(0)}, ti, train=False)
    out = model.apply(vars_, ti, train=False)
    assert out.logits.shape == (2, 10, 10)
    pin = schemas.PredictInput(inputs=ti.inputs, inputs_length=ti.inputs_length)
    pout = ctc_base.recognize(model, vars_, pin)
    assert pout.tokens.shape == (2, 10)
    pout_beam = ctc_base.recognize(model, vars_, pin, beam_width=4)
    assert pout_beam.tokens.shape == (2, 10)


def test_build_model_from_reference_style_config():
    mc = {"class_name": "tensorflow_asr.models.transducer.conformer>Conformer", "config": dict(CONFORMER_CFG, name="conformer")}
    model = build_model(mc, vocab_size=20)
    assert isinstance(model, Conformer)
    assert model.vocab_size == 20
    assert model.time_reduction_factor == 4


def test_conformer_ctc_from_config():
    from tensorflowasr_tpu.models.ctc.conformer import ConformerCtc

    cfg = {k: v for k, v in CONFORMER_CFG.items() if k.startswith("encoder_") or k == "speech_config"}
    cfg["vocab_size"] = 15
    model = ConformerCtc.from_config(cfg)
    ti = _train_input(vocab=15)
    vars_ = model.init({"params": jax.random.PRNGKey(0)}, ti, train=False)
    out = model.apply(vars_, ti, train=False)
    assert out.logits.shape == (2, 5, 15)


def test_wind_decode_matches_frame_synchronous(conformer_and_vars):
    from tensorflowasr_tpu.models.transducer import base as transducer_base

    model, vars_, ti = conformer_and_vars
    pin = schemas.PredictInput(inputs=ti.inputs, inputs_length=ti.inputs_length)
    out_sync = transducer_base.recognize(model, vars_, pin, decode_mode="sync")
    for window in (1, 4, 16):
        out_wind = transducer_base.recognize(model, vars_, pin, decode_mode="wind", window=window)
        np.testing.assert_array_equal(np.asarray(out_wind.tokens), np.asarray(out_sync.tokens))
        np.testing.assert_array_equal(np.asarray(out_wind.next_tokens), np.asarray(out_sync.next_tokens))
