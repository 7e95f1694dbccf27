"""Fused single-kernel greedy decode vs the XLA WIND loop: exact parity.

The Pallas decode kernel (scripts_dev/decode_kernel.py — demoted from the
shipping package as a recorded negative result, see
docs/design/fused_decode_negative_result.md) must reproduce the XLA path
token-for-token, length-for-length, and state-for-state — including the
streaming carry (chunk boundaries) — across prediction-net configs
(1/2 LSTM layers, with/without LayerNorm and projection).

Run manually: `python -m pytest scripts_dev/decode_kernel_canary.py -q`
(not collected by the default suite).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decode_kernel import extract_decode_params, fused_greedy_decode

from tensorflowasr_tpu.models.transducer.base import TransducerJoint, TransducerPrediction
from tensorflowasr_tpu.ops import transducer_decode


def _build(vocab=16, embed=12, units=10, num_rnns=1, layer_norm=True, proj=0, joint_dim=14, enc_dim=9, seed=0):
    pc = dict(label_encoder_mode="embedding", embed_dim=embed, num_rnns=num_rnns, rnn_units=units, layer_norm=layer_norm, projection_units=proj)
    jc = dict(joint_dim=joint_dim, activation="tanh", prejoint_encoder_linear=True, prejoint_prediction_linear=True, joint_mode="add")
    pred_m = TransducerPrediction(blank=0, vocab_size=vocab, **pc)
    joint_m = TransducerJoint(vocab_size=vocab, **jc)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    pv = pred_m.init(k1, jnp.zeros((1, 2), jnp.int32))["params"]
    pdim = proj if proj > 0 else units
    jv = joint_m.init(k2, jnp.zeros((1, 3, enc_dim)), jnp.zeros((1, 2, pdim)))["params"]
    params = {"prediction": pv, "joint": jv}

    def pred_step_fn(tok, states):
        return pred_m.apply({"params": pv}, tok, states, method=pred_m.step)

    def joint_window_fn(enc_win, pred_out):
        return joint_m.apply({"params": jv}, enc_win, pred_out[:, None, :])[:, :, 0, :]

    def init_states(batch):
        cell = jnp.zeros((batch, units))
        return tuple((cell, cell) for _ in range(num_rnns))

    fused = extract_decode_params(pc, jc, params)
    assert fused is not None
    return pc, jc, params, pred_step_fn, joint_window_fn, init_states, fused


def _sharpen(enc, blank_bias=2.0):
    e = np.array(enc)
    e *= 3.0
    e[..., 0] += blank_bias
    return jnp.asarray(e, jnp.float32)


CONFIGS = [
    dict(num_rnns=1, layer_norm=True, proj=0),
    dict(num_rnns=1, layer_norm=False, proj=8),
    dict(num_rnns=2, layer_norm=True, proj=11),
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_fused_decode_matches_wind(cfg):
    vocab, enc_dim = 16, 9
    _, _, _, pred_step_fn, joint_window_fn, init_states, fused = _build(vocab=vocab, enc_dim=enc_dim, **cfg)
    b, t = 3, 12
    enc = _sharpen(np.random.default_rng(1).standard_normal((b, t, enc_dim)))
    lens = jnp.asarray([12, 7, 0])
    tok0 = jnp.zeros((b,), jnp.int32)
    st0 = init_states(b)

    # the XLA wind path consumes the already-projected joint inputs via the
    # model fns; the fused kernel takes raw encoded and projects internally
    wt, wl, wn, ws = transducer_decode.transducer_greedy_decode_wind(
        enc, lens, pred_step_fn, joint_window_fn, tok0, st0, window=4
    )
    ft, fl, fn_, fs = fused_greedy_decode(enc, lens, fused, tok0, st0, window=4)

    np.testing.assert_array_equal(np.asarray(fl), np.asarray(wl))
    for i in range(b):
        np.testing.assert_array_equal(np.asarray(ft[i, : int(fl[i])]), np.asarray(wt[i, : int(wl[i])]))
    np.testing.assert_array_equal(np.asarray(fn_), np.asarray(wn))
    for (fc, fh), (wc, wh) in zip(fs, ws):
        np.testing.assert_allclose(np.asarray(fc), np.asarray(wc), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(fh), np.asarray(wh), rtol=1e-5, atol=1e-6)


def test_fused_decode_streaming_chunks_match_wind_chunks():
    """Chunked fused decode == chunked XLA WIND decode, chunk by chunk,
    including the carried (token, states) at every boundary. (Chunked == full
    is a property of the WIND loop itself, tested with a self-suppressing toy
    net in test_decoding; a random-init model here emits to the budget cap.)"""
    vocab, enc_dim = 16, 9
    _, _, _, pred_step_fn, joint_window_fn, init_states, fused = _build(vocab=vocab, enc_dim=enc_dim, num_rnns=1, layer_norm=True, proj=0)
    enc = _sharpen(np.random.default_rng(2).standard_normal((1, 16, enc_dim)), blank_bias=3.0)

    ftok, fst = jnp.zeros((1,), jnp.int32), init_states(1)
    wtok, wst = jnp.zeros((1,), jnp.int32), init_states(1)
    for lo, hi in ((0, 6), (6, 16)):
        chunk, clen = enc[:, lo:hi], jnp.asarray([hi - lo])
        ft, fl, ftok, fst = fused_greedy_decode(chunk, clen, fused, ftok, fst, window=4)
        wt, wl, wtok, wst = transducer_decode.transducer_greedy_decode_wind(
            chunk, clen, pred_step_fn, joint_window_fn, wtok, wst, window=4
        )
        np.testing.assert_array_equal(np.asarray(fl), np.asarray(wl))
        np.testing.assert_array_equal(np.asarray(ft[0, : int(fl[0])]), np.asarray(wt[0, : int(wl[0])]))
        assert int(ftok[0]) == int(wtok[0])
        for (fc, fh), (wc, wh) in zip(fst, wst):
            np.testing.assert_allclose(np.asarray(fc), np.asarray(wc), rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(fh), np.asarray(wh), rtol=1e-5, atol=1e-6)


def test_fused_decode_unsupported_config_returns_none():
    pc = dict(label_encoder_mode="one_hot", num_rnns=1, rnn_units=8)
    jc = dict(joint_dim=8)
    assert extract_decode_params(pc, jc, {}) is None
    pc2 = dict(label_encoder_mode="embedding", rnn_type="gru")
    assert extract_decode_params(pc2, jc, {}) is None
    jc2 = dict(joint_dim=8, joint_mode="mul")
    assert extract_decode_params(dict(label_encoder_mode="embedding"), jc2, {}) is None


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
