"""TFLite export path (reference ``utils/app_util.py:85-111`` parity).

``export.convert_tflite`` is the jax2tf deployment surface. These tests
run the real conversion end-to-end on a tiny model when TensorFlow is
importable (skip-marked otherwise), so the path cannot rot write-only.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

tf = pytest.importorskip("tensorflow")

from tensorflowasr_tpu import export as export_mod  # noqa: E402
from tensorflowasr_tpu import schemas  # noqa: E402


def _tiny_transducer():
    from __graft_entry__ import _conformer_small

    model = _conformer_small(vocab_size=8, num_blocks=1, dmodel=16, dtype=jnp.float32)
    nsamples = 1600
    ti = schemas.TrainInput(
        inputs=jnp.zeros((1, nsamples), jnp.float32),
        inputs_length=jnp.asarray([nsamples], jnp.int32),
        predictions=jnp.zeros((1, 2), jnp.int32),
        predictions_length=jnp.asarray([2], jnp.int32),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, ti, train=False)
    return model, variables, nsamples


@pytest.mark.slow
def test_convert_tflite_end_to_end(tmp_path):
    model, variables, nsamples = _tiny_transducer()
    fn = export_mod.make_inference_fn(model, variables)
    example = (
        np.zeros((1, nsamples), np.float32),
        np.full((1,), nsamples, np.int32),
    )
    out_path = str(tmp_path / "model.tflite")
    ok = export_mod.convert_tflite(fn, example, out_path)
    assert ok, "conversion reported failure with TF available"

    # run the converted model and cross-check tokens vs the jax fn
    interp = tf.lite.Interpreter(model_path=out_path)
    interp.allocate_tensors()
    inputs = interp.get_input_details()
    rng = np.random.default_rng(0)
    signals = (rng.standard_normal((1, nsamples)) * 0.1).astype(np.float32)
    lengths = np.full((1,), nsamples, np.int32)
    feed = {inputs[i]["index"]: v for i, v in enumerate((signals, lengths))}
    # input ordering is not guaranteed — match by shape/dtype
    for det in inputs:
        if tuple(det["shape"]) == (1, nsamples):
            interp.set_tensor(det["index"], signals)
        else:
            interp.set_tensor(det["index"], lengths)
    interp.invoke()

    want = jax.jit(fn)(*example.__class__((signals, lengths)))
    want_tokens = np.asarray(want.tokens)

    got_tokens = None
    for det in interp.get_output_details():
        t = interp.get_tensor(det["index"])
        if t.shape == want_tokens.shape and t.dtype == want_tokens.dtype:
            got_tokens = t
            break
    assert got_tokens is not None, "no output matched the tokens tensor"
    np.testing.assert_array_equal(got_tokens, want_tokens)


def _streaming_rnnt():
    """Tiny truly-streaming RNN transducer (mirrors tests/test_streaming.py)."""
    import flax

    from tensorflowasr_tpu.models.transducer.rnnt import RnnTransducer

    model = RnnTransducer.from_config(
        {
            "speech_config": {"num_feature_bins": 20, "nfft": 256},
            "encoder_reduction_positions": ["pre", "pre"],
            "encoder_reduction_factors": [2, 0],
            "encoder_nlayers": 2,
            "encoder_dmodel": 16,
            "encoder_rnn_units": 16,
            "prediction_embed_dim": 8,
            "prediction_num_rnns": 1,
            "prediction_rnn_units": 16,
            "joint_dim": 16,
            "vocab_size": 12,
        }
    )
    n = 3200
    ti = schemas.TrainInput(
        inputs=jnp.zeros((1, n), jnp.float32),
        inputs_length=jnp.asarray([n]),
        predictions=jnp.zeros((1, 2), jnp.int32),
        predictions_length=jnp.asarray([2]),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, ti, train=False)
    # sharpen decode decisions so chunked comparisons aren't fp-noise-bound
    variables = flax.core.unfreeze(variables)
    joint = variables["params"]["joint"]["vocab"]
    joint["kernel"] = joint["kernel"] * 10.0
    joint["bias"] = joint["bias"].at[0].add(-3.0)
    return model, variables, n


def test_streaming_tflite_chunk_loop_matches_jax(tmp_path):
    """Convert a STREAMING inference fn (states in the signature) to TFLite,
    drive it chunk-by-chunk through the interpreter with carried states (the
    reference's ``examples/inferences/streaming_tflite_conformer.py`` loop),
    and check the token stream equals the JAX chunked decode exactly."""
    import sys

    from tensorflowasr_tpu.models.transducer import base as transducer_base
    from tensorflowasr_tpu.ops.frontend import FrontendConfig

    model, variables, n = _streaming_rnnt()
    fcfg = FrontendConfig(**dict(model.speech_config))
    # chunk windows overlap by the STFT frame tail (size > step): both loops
    # below read [pos, pos+chunk_size) and advance by chunk_step
    chunk_size, chunk_step = fcfg.get_signal_chunk_size_and_step(8)

    fn = export_mod.make_inference_fn(model, variables)
    example = (
        np.zeros((1, chunk_size), np.float32),
        np.full((1,), chunk_size, np.int32),
        np.zeros((1,), np.int32),
        model.init_encoder_states(1),
        model.init_decoder_states(1),
    )
    out_path = str(tmp_path / "streaming.tflite")
    assert export_mod.convert_tflite(fn, example, out_path)

    rng = np.random.default_rng(0)
    sig = (rng.standard_normal(n) * 0.3).astype(np.float32)

    # JAX chunked reference loop
    jax_tokens = []
    prev_tokens, enc_states, dec_states = None, model.init_encoder_states(1), None
    jfn = jax.jit(fn)
    pos = 0
    while pos + chunk_size <= n:
        out = jfn(
            sig[None, pos : pos + chunk_size],
            np.full((1,), chunk_size, np.int32),
            np.zeros((1,), np.int32) if prev_tokens is None else prev_tokens,
            enc_states,
            model.init_decoder_states(1) if dec_states is None else dec_states,
        )
        jax_tokens.extend(int(t) for t in np.asarray(out.tokens[0]) if t != 0)
        prev_tokens, enc_states, dec_states = out.next_tokens, out.next_encoder_states, out.next_decoder_states
        pos += chunk_step

    # TFLite consumer loop via the demo's recognizer class
    sys.path.insert(0, "examples/inferences")
    try:
        from streaming_tflite_conformer import StreamingTFLiteRecognizer
    finally:
        sys.path.pop(0)

    rec = StreamingTFLiteRecognizer(out_path, chunk_size)
    lite_tokens = []
    pos = 0
    while pos + chunk_size <= n:
        block = sig[pos : pos + chunk_size]
        if block.shape[0] < rec.blocksize:
            block = np.pad(block, (0, rec.blocksize - block.shape[0]))
        rec.interp.set_tensor(rec.inputs[0]["index"], block[None, :].astype(np.float32))
        rec.interp.set_tensor(rec.inputs[1]["index"], np.asarray([rec.blocksize], np.int32))
        for det, val in zip(rec.inputs[2:], rec.carried):
            rec.interp.set_tensor(det["index"], val)
        rec.interp.invoke()
        outs = [rec.interp.get_tensor(d["index"]) for d in rec.outputs]
        lite_tokens.extend(int(t) for t in np.asarray(outs[1][0]) if t != 0)
        rec.carried = [np.asarray(outs[2]).reshape(rec.inputs[2]["shape"])] + outs[3:]
        pos += chunk_step  # overlapping window advance (size > step)

    assert len(jax_tokens) > 0
    assert lite_tokens == jax_tokens
