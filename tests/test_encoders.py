"""Encoder smoke/shape/state tests for all six architectures."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu.models.encoders.conformer import ConformerEncoder
from tensorflowasr_tpu.models.encoders.contextnet import ContextNetEncoder
from tensorflowasr_tpu.models.encoders.deepspeech2 import DeepSpeech2Encoder
from tensorflowasr_tpu.models.encoders.jasper import JasperEncoder
from tensorflowasr_tpu.models.encoders.rnnt import RnnTransducerEncoder
from tensorflowasr_tpu.models.encoders.transformer import TransformerEncoder

SUB = {
    "class_name": "Conv2dSubsampling",
    "config": {"filters": [8, 8], "kernels": [3, 3], "strides": [2, 2], "paddings": ["causal", "causal"], "norms": ["batch", "batch"], "activations": ["swish", "swish"]},
}


def _feats(b=2, t=20, f=20):
    return jnp.asarray(np.random.default_rng(0).standard_normal((b, t, f)), jnp.float32), jnp.asarray([t, t // 2])


def _run(enc, feats, lens, initial_state=None):
    vars_ = enc.init({"params": jax.random.PRNGKey(0)}, feats, lens, initial_state=initial_state, train=False)
    out = enc.apply(vars_, feats, lens, initial_state=initial_state, train=False)
    return vars_, out


def test_conformer_encoder():
    enc = ConformerEncoder(subsampling=SUB, dmodel=16, num_blocks=2, head_size=4, num_heads=4, kernel_size=7)
    feats, lens = _feats()
    _, (out, olen, states) = _run(enc, feats, lens)
    assert out.shape == (2, 5, 16)
    np.testing.assert_array_equal(np.asarray(olen), [5, 3])
    assert states is None
    assert enc.time_reduction_factor == 4


def test_conformer_encoder_train_mode_mutates_bn():
    enc = ConformerEncoder(subsampling=SUB, dmodel=16, num_blocks=1, head_size=4, num_heads=2, kernel_size=7, dropout=0.1)
    feats, lens = _feats()
    vars_ = enc.init({"params": jax.random.PRNGKey(0)}, feats, lens, train=False)
    (out, olen, _), muts = enc.apply(
        vars_, feats, lens, train=True, rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"]
    )
    assert "batch_stats" in muts
    assert np.isfinite(np.asarray(out)).all()


def test_conformer_streaming_states():
    enc = ConformerEncoder(
        subsampling=SUB, dmodel=16, num_blocks=2, head_size=4, num_heads=2, kernel_size=7,
        memory_length=4, chunk_size=2, history_size=4, mhsam_causal=True,
    )
    feats, lens = _feats()
    st = enc.init_state(2)
    vars_, (out, olen, states) = _run(enc, feats, lens, initial_state=st)
    assert len(states) == 2
    assert states[0]["k"].shape == (2, 4, 16)


def test_contextnet_encoder():
    blocks = [
        {"nlayers": 1, "kernel_size": 3, "filters": 16, "strides": 1, "residual": False, "activation": "silu"},
        {"nlayers": 2, "kernel_size": 3, "filters": 16, "strides": 2, "residual": True, "activation": "silu"},
        {"nlayers": 2, "kernel_size": 3, "filters": 24, "strides": 1, "residual": True, "activation": "silu"},
    ]
    enc = ContextNetEncoder(blocks=blocks, alpha=0.5)
    assert enc.time_reduction_factor == 2
    assert enc.dmodel == 12
    feats, lens = _feats()
    _, (out, olen, states) = _run(enc, feats, lens)
    assert out.shape == (2, 10, 12)
    np.testing.assert_array_equal(np.asarray(olen), [10, 5])


def test_deepspeech2_encoder_bidirectional():
    enc = DeepSpeech2Encoder(
        conv_filters=(4, 4), conv_kernels=((3, 5), (3, 5)), conv_strides=((2, 2), (1, 2)),
        rnn_nlayers=2, rnn_units=8, rnn_bidirectional=True, fc_nlayers=1, fc_units=8,
    )
    feats, lens = _feats()
    _, (out, olen, states) = _run(enc, feats, lens)
    assert out.shape == (2, 10, 8)
    assert states is None


def test_deepspeech2_encoder_streaming_states():
    enc = DeepSpeech2Encoder(
        conv_filters=(4,), conv_kernels=((3, 5),), conv_strides=((2, 2),),
        rnn_nlayers=2, rnn_units=8, rnn_bidirectional=False, rnn_rowconv=2,
    )
    feats, lens = _feats()
    st = enc.init_state(2)
    vars_ = enc.init({"params": jax.random.PRNGKey(0)}, feats, lens, initial_state=st, train=False)
    out, olen, states = enc.apply(vars_, feats, lens, initial_state=st, train=False)
    assert len(states) == 2
    assert states[0][0].shape == (2, 8)


def test_jasper_encoder():
    enc = JasperEncoder(
        dense=True, nsubblocks=2, block_channels=(8, 12), block_kernels=(3, 5), block_dropout=(0.1, 0.1),
        first_additional_block_channels=8, second_additional_block_channels=12, third_additional_block_channels=16,
    )
    feats, lens = _feats()
    _, (out, olen, states) = _run(enc, feats, lens)
    assert out.shape == (2, 10, 16)
    np.testing.assert_array_equal(np.asarray(olen), [10, 5])


def test_rnnt_encoder():
    enc = RnnTransducerEncoder(
        reduction_positions=("pre", "post"), reduction_factors=(2, 2), nlayers=2, dmodel=8, rnn_units=8,
    )
    assert enc.time_reduction_factor == 4
    feats, lens = _feats()
    st = enc.init_state(2)
    vars_ = enc.init({"params": jax.random.PRNGKey(0)}, feats, lens, initial_state=st, train=False)
    out, olen, states = enc.apply(vars_, feats, lens, initial_state=st, train=False)
    # post-position reduction stacks features: dmodel 8 × factor 2 = 16
    assert out.shape == (2, 5, 16)
    np.testing.assert_array_equal(np.asarray(olen), [5, 3])
    assert len(states) == 2


def test_transformer_encoder():
    enc = TransformerEncoder(subsampling=SUB, num_blocks=2, dmodel=16, dff=32, num_heads=2, head_size=8, mha_type="relmha")
    feats, lens = _feats()
    _, (out, olen, states) = _run(enc, feats, lens)
    assert out.shape == (2, 5, 16)
    assert states is None


def test_transformer_encoder_absolute_pe():
    enc = TransformerEncoder(subsampling=SUB, num_blocks=1, dmodel=16, dff=32, num_heads=2, head_size=8, mha_type="mha")
    feats, lens = _feats()
    _, (out, olen, states) = _run(enc, feats, lens)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_conformer_remat_grads():
    """use_remat trades FLOPs for memory — must compile and differentiate."""
    enc = ConformerEncoder(subsampling=SUB, dmodel=16, num_blocks=2, head_size=4, num_heads=2, kernel_size=7, use_remat=True, dropout=0.0)
    feats, lens = _feats()
    vars_ = enc.init({"params": jax.random.PRNGKey(0)}, feats, lens, train=False)

    def loss(params):
        out, _, _ = enc.apply({**vars_, "params": params}, feats, lens, train=False)
        return jnp.sum(out**2)

    g = jax.grad(loss)(vars_["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))
