"""Streaming inference tests: chunk-wise processing with carried states.

Validates the reference's streaming contract (docs/tutorials/tflite.md +
feature_extraction.py:141-162 chunk math): feeding audio chunk-by-chunk with
state pass-through must match the full-utterance result for causal
architectures.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu.ops.frontend import FrontendConfig
from tensorflowasr_tpu.models.encoders.rnnt import RnnTransducerEncoder
from tensorflowasr_tpu.models.layers.rnn import RNN


def test_frontend_chunk_equivalence():
    """STFT on chunks selected by get_signal_chunk_size_and_step must equal
    the corresponding frames of the full-signal STFT."""
    from tensorflowasr_tpu.ops import frontend

    cfg = FrontendConfig(pad_end=False)
    rng = np.random.default_rng(0)
    sig = rng.standard_normal((1, 16000)).astype(np.float32)

    full = np.asarray(frontend.stft_magnitude_squared(jnp.asarray(sig), cfg))

    nframes = 16
    chunk_size, chunk_step = cfg.get_signal_chunk_size_and_step(nframes)
    n_chunks = (sig.shape[1] - chunk_size) // chunk_step + 1
    chunks = []
    for i in range(n_chunks):
        seg = sig[:, i * chunk_step : i * chunk_step + chunk_size]
        chunks.append(np.asarray(frontend.stft_magnitude_squared(jnp.asarray(seg), cfg)))
    stitched = np.concatenate(chunks, axis=1)
    np.testing.assert_allclose(stitched, full[:, : stitched.shape[1]], rtol=1e-4, atol=1e-4)


def test_rnn_encoder_streaming_equivalence():
    """Chunked RnnTransducerEncoder with carried states == full pass.

    TimeReduction factor divides the chunk so reduction boundaries align.
    """
    enc = RnnTransducerEncoder(
        reduction_positions=("pre", "pre"), reduction_factors=(2, 0), nlayers=2, dmodel=8, rnn_units=8, layer_norm=True
    )
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((1, 16, 6)), jnp.float32)
    st0 = enc.init_state(1)
    vars_ = enc.init({"params": jax.random.PRNGKey(0)}, feats, jnp.asarray([16]), initial_state=st0, train=False)

    full, full_len, _ = enc.apply(vars_, feats, jnp.asarray([16]), initial_state=st0, train=False)

    outs = []
    state = st0
    for i in range(4):
        chunk = feats[:, i * 4 : (i + 1) * 4]
        out, _, state = enc.apply(vars_, chunk, jnp.asarray([4]), initial_state=state, train=False)
        outs.append(out)
    stitched = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stitched), np.asarray(full), atol=1e-5)


def test_transducer_streaming_recognize_carries_state():
    """Full recognize() chunk loop: states thread through PredictOutput."""
    from tensorflowasr_tpu import schemas
    from tensorflowasr_tpu.models.transducer import base as transducer_base
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
    rng = np.random.default_rng(0)
    n = 3200
    sig = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
    ti = schemas.TrainInput(
        inputs=sig, inputs_length=jnp.asarray([n]), predictions=jnp.zeros((1, 2), jnp.int32), predictions_length=jnp.asarray([2])
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, ti, train=False)
    # Random-init joints are near-uniform, so argmax decisions flip on fp
    # noise between differently-shaped compilations. Sharpen the vocab
    # projection and penalize blank so decode decisions are decisive and the
    # chunked/full comparison is meaningful.
    import flax

    variables = flax.core.unfreeze(variables)
    joint = variables["params"]["joint"]["vocab"]
    joint["kernel"] = joint["kernel"] * 10.0
    joint["bias"] = joint["bias"].at[0].add(-3.0)

    # full-utterance decode
    out_full = transducer_base.recognize(model, variables, schemas.PredictInput(inputs=sig, inputs_length=jnp.asarray([n])))
    full_tokens = [t for t in np.asarray(out_full.tokens[0]) if t != 0]

    # chunked decode with carried encoder+decoder states; chunk honors the
    # frontend chunk math so STFT frames align exactly
    cfg = model.speech_config
    from tensorflowasr_tpu.ops.frontend import FrontendConfig

    fcfg = FrontendConfig(**{k: v for k, v in cfg.items()})
    nframes_per_chunk = 8
    chunk_size, chunk_step = fcfg.get_signal_chunk_size_and_step(nframes_per_chunk)

    tokens_all = []
    prev_tokens = None
    enc_states = model.init_encoder_states(1)
    dec_states = None
    pos = 0
    while pos + chunk_size <= n:
        seg = sig[:, pos : pos + chunk_size]
        pin = schemas.PredictInput(
            inputs=seg,
            inputs_length=jnp.asarray([chunk_size]),
            previous_tokens=prev_tokens,
            previous_encoder_states=enc_states,
            previous_decoder_states=dec_states,
        )
        out = transducer_base.recognize(model, variables, pin)
        tokens_all.extend(t for t in np.asarray(out.tokens[0]) if t != 0)
        prev_tokens = out.next_tokens
        enc_states = out.next_encoder_states
        dec_states = out.next_decoder_states
        pos += chunk_step

    # chunked greedy decode should produce a similar (ideally identical)
    # token stream; random-init models emit long runs, so require high overlap
    assert len(tokens_all) > 0
    m = min(len(tokens_all), len(full_tokens))
    agree = sum(a == b for a, b in zip(tokens_all[:m], full_tokens[:m])) / max(m, 1)
    assert agree > 0.9, f"chunked/full token agreement too low: {agree}"


def test_attention_memory_exactly_equals_chunked_mask():
    """Chunk-by-chunk MHA with KV memory == full pass with the streaming
    chunk mask (the core streaming-attention contract)."""
    from tensorflowasr_tpu.models.layers.attention import MultiHeadAttention

    T, D, CH, MEM = 16, 16, 4, 8
    m = MultiHeadAttention(num_heads=2, key_dim=8, output_dim=D, chunk_size=CH, history_size=MEM)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, T, D)), jnp.float32)
    mask = jnp.ones((1, T), bool)
    v = m.init(jax.random.PRNGKey(0), x, x, query_mask=mask, kv_mask=mask, use_causal_mask=True)
    full, _ = m.apply(v, x, x, query_mask=mask, kv_mask=mask, use_causal_mask=True)

    m2 = MultiHeadAttention(num_heads=2, key_dim=8, output_dim=D, memory_length=MEM)
    mem = m2.init_memory(1, D)
    outs = []
    for i in range(T // CH):
        chunk = x[:, i * CH : (i + 1) * CH]
        cm = jnp.ones((1, CH), bool)
        out, mem = m2.apply({"params": v["params"]}, chunk, chunk, query_mask=cm, kv_mask=cm, memory_state=mem, use_causal_mask=True)
        outs.append(out)
    stitched = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stitched), np.asarray(full), atol=1e-5)


def test_attention_memory_plus_chunk_mask_equals_chunked_full_pass():
    """Memory-carried chunk-by-chunk MHA *with the chunk mask active* (the
    configuration streaming Conformer uses) must equal the no-memory full
    pass under the chunked mask — the known-correct semantics. Regression
    test for the memory/chunk-mask coordinate bug: key columns must be
    shifted into frame coordinates when memory is prepended, else the first
    chunk is fully masked and later chunks attend to wrong columns."""
    from tensorflowasr_tpu.models.layers.attention import MultiHeadAttention

    T, D, CH, MEM = 16, 16, 4, 8
    # known-correct reference semantics: full pass, chunk mask, no memory
    m = MultiHeadAttention(num_heads=2, key_dim=8, output_dim=D, chunk_size=CH, history_size=MEM)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, T, D)), jnp.float32)
    mask = jnp.ones((1, T), bool)
    v = m.init(jax.random.PRNGKey(0), x, x, query_mask=mask, kv_mask=mask)
    full, _ = m.apply(v, x, x, query_mask=mask, kv_mask=mask)

    # streaming path: memory AND chunk mask both active, one chunk per call
    m2 = MultiHeadAttention(num_heads=2, key_dim=8, output_dim=D, memory_length=MEM, chunk_size=CH, history_size=MEM)
    mem = m2.init_memory(1, D)
    outs = []
    for i in range(T // CH):
        chunk = x[:, i * CH : (i + 1) * CH]
        cm = jnp.ones((1, CH), bool)
        out, mem = m2.apply({"params": v["params"]}, chunk, chunk, query_mask=cm, kv_mask=cm, memory_state=mem)
        outs.append(out)
    stitched = jnp.concatenate(outs, axis=1)
    # non-degeneracy: the first chunk must actually attend (bug zeroed it)
    assert float(jnp.abs(stitched[:, :CH]).max()) > 1e-3
    np.testing.assert_allclose(np.asarray(stitched), np.asarray(full), atol=1e-5)


def test_streaming_conformer_first_chunk_exact():
    """The first chunk of a memory-carried streaming Conformer matches a
    NO-memory full pass under the chunked attention mask (the known-correct
    semantics) exactly; later chunks are approximate at conv boundaries —
    inherent to the causal-conv streaming design (same as the reference's)."""
    from tensorflowasr_tpu.models.encoders.conformer import ConformerEncoder

    sub = {
        "class_name": "Conv2dSubsampling",
        "config": {"filters": [8, 8], "kernels": [3, 3], "strides": [2, 2], "paddings": ["causal", "causal"], "norms": ["none", "none"], "activations": ["swish", "swish"]},
    }
    enc = ConformerEncoder(
        subsampling=sub, dmodel=16, num_blocks=2, head_size=4, num_heads=2, kernel_size=3,
        memory_length=8, chunk_size=4, history_size=8, mhsam_causal=True, use_attention_causal_mask=True,
        convm_dw_norm_type="layer", dropout=0.0,
    )
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((1, 64, 20)), jnp.float32)
    st0 = enc.init_state(1)
    vars_ = enc.init({"params": jax.random.PRNGKey(0)}, feats, jnp.asarray([64]), initial_state=st0, train=False)
    # known-correct semantics: chunked mask, NO memory prepended
    full_nomem, _, _ = enc.apply(vars_, feats, jnp.asarray([64]), initial_state=None, train=False)
    # memory-carried full pass must agree with it (zero memory == no memory)
    full_mem, _, _ = enc.apply(vars_, feats, jnp.asarray([64]), initial_state=st0, train=False)
    np.testing.assert_allclose(np.asarray(full_mem), np.asarray(full_nomem), atol=1e-5)
    # first streaming chunk (16 raw frames → 4 encoder frames) is exact
    chunk0, _, _ = enc.apply(vars_, feats[:, :16], jnp.asarray([16]), initial_state=st0, train=False)
    assert float(np.abs(np.asarray(chunk0)).max()) > 1e-3
    np.testing.assert_allclose(np.asarray(chunk0), np.asarray(full_nomem[:, :4]), atol=1e-5)


def test_streaming_conformer_memory_carries_across_chunks():
    """Attention-only streaming Conformer (kernel_size=1 ⇒ no cross-chunk
    conv context) with carried KV memory equals the no-memory full pass with
    the chunked mask on EVERY chunk, not just the first."""
    from tensorflowasr_tpu.models.encoders.conformer import ConformerEncoder

    sub = {
        "class_name": "Conv2dSubsampling",
        "config": {"filters": [8], "kernels": [1], "strides": [4], "paddings": ["causal"], "norms": ["none"], "activations": ["swish"]},
    }
    # non-causal relpe (reference streaming default) + memory: queries see
    # their whole chunk including in-chunk future, plus MEM frames of history
    enc = ConformerEncoder(
        subsampling=sub, dmodel=16, num_blocks=2, head_size=4, num_heads=2, kernel_size=1,
        memory_length=8, chunk_size=4, history_size=8, mhsam_causal=False, convm_dw_norm_type="layer", dropout=0.0,
    )
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((1, 64, 20)), jnp.float32)
    st0 = enc.init_state(1)
    vars_ = enc.init({"params": jax.random.PRNGKey(0)}, feats, jnp.asarray([64]), initial_state=st0, train=False)
    full_nomem, _, _ = enc.apply(vars_, feats, jnp.asarray([64]), initial_state=None, train=False)

    outs, state = [], st0
    for i in range(4):
        chunk = feats[:, i * 16 : (i + 1) * 16]
        out, _, state = enc.apply(vars_, chunk, jnp.asarray([16]), initial_state=state, train=False)
        outs.append(out)
    stitched = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stitched), np.asarray(full_nomem), atol=1e-5)
