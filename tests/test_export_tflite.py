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
