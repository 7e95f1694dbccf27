"""Benchmark: Conformer Transducer Small — decode RTF + train throughput/MFU.

Measures on the available accelerator and prints the result as ONE JSON line:

  {"metric": "rtf_per_chip", "value": N, "unit": "x_realtime", "vs_baseline": N/10,
   "streaming": {"ms_per_chunk": ..}, "train": {"bs16": {"step_ms": .., "mfu_pct": ..}, ...}}

**Incremental + time-boxed** (round-3 postmortem: the remote compile helper
has a documented 10x run-to-run latency variance, one slow compile chain
timed the whole process out and the round recorded zero perf data):

- The cumulative record is printed (and flushed) after EVERY completed
  stage — decode RTF first, then streaming, then each train batch size —
  so a hard kill still leaves the last fully-parseable JSON line on stdout.
- A wall-clock budget (env ``TFASR_BENCH_BUDGET_S``, default 2700 s) is
  checked before *starting* each additional stage; skipped stages are
  recorded as ``"skipped (budget)"``.
- Train batch sizes run in priority order (16 first — the flagship shape —
  then 64/32/8/4) so the headline numbers land even on a slow day.

Primary metric stays greedy-decode RTF (end-to-end raw audio → frontend →
encoder → frame-synchronous greedy decode). The "train" block records the
full jit train step (forward + RNN-T loss + grads + optax update) on 16 s
utterances, with model-FLOPs-utilization from an analytic FLOPs count
against the chip's peak bf16 FLOPs. The "streaming" block records the
deployment-path latency: one 16-frame chunk through frontend + chunked
encoder + greedy decode with carried states (reference chunk math:
feature_extraction.py:141-162, streaming_tflite_conformer.py consumer).

Baseline: the reference publishes no throughput numbers (SURVEY.md §6); the
north-star speed target from BASELINE.json is ≥10× real-time per chip on
Conformer-S, so vs_baseline = value / 10.
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

PEAK_BF16_FLOPS = {
    # per-chip peak dense bf16 FLOP/s (public spec sheets)
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5": 197e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
}

_T_START = time.monotonic()
# Soft budget: checked before STARTING each stage; every completed stage is
# emitted immediately, so a harder external kill still leaves the last
# fully-parseable record on stdout. Sized so the flagship bs16+bs64 train
# numbers land even on a slow remote-compile day (measured r4: decode 14 min
# + streaming 4 min + bs16 5 min cold).
_BUDGET_S = float(os.environ.get("TFASR_BENCH_BUDGET_S", "2700"))


def _remaining() -> float:
    return _BUDGET_S - (time.monotonic() - _T_START)


def _emit(record) -> None:
    """Print the cumulative record NOW and flush: a later timeout/kill must
    not erase the stages already measured."""
    print(json.dumps(record), flush=True)


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "") or ""
    for name, peak in PEAK_BF16_FLOPS.items():
        if kind.startswith(name):
            return peak
    return 197e12  # default to v5e


def analytic_train_flops(bs: int, audio_secs: float, u_len: int, vocab: int, dmodel: int = 144, num_blocks: int = 16, remat: bool = False) -> float:
    """Analytic Conformer-S transducer train-step FLOPs (fwd MACs × 2 × 3).

    Counts every matmul/conv in the model (subsampling convs, encoder
    blocks incl. attention score/PV GEMMs, LSTM prediction net, joint) and
    applies the standard bwd = 2× fwd rule (×4/3 more for remat'd encoder
    blocks, which recompute the fwd). Excludes the STFT frontend, the
    RNN-T DP (no matmuls), and all elementwise work — so this is a slight
    UNDERcount, making the reported MFU conservative. Round-2's
    cost-analysis basis divided by scan_steps while XLA counts a scan body
    once — a ~8× MFU undercount (VERDICT r2 weak #7); this replaces it.
    """
    t_frames = int(audio_secs * 100)  # 10 ms hop
    t = t_frames // 4  # two stride-2 subsampling convs
    u1 = u_len + 1
    d4, d2 = 4 * dmodel, 2 * dmodel
    feat = 80

    # Conv2dSubsampling: [T,F,1] -k3x3,s2-> [T/2,F/2,D] -k3x3,s2-> [T/4,F/4,D]
    sub = (t_frames // 2) * (feat // 2) * 9 * 1 * dmodel + (t_frames // 4) * (feat // 4) * 9 * dmodel * dmodel
    # post-subsampling linear: [T, F/4*D] @ [F/4*D, D]
    sub += t * (feat // 4 * dmodel) * dmodel

    # per encoder block, per output frame
    ff = 2 * (dmodel * d4 + d4 * dmodel)  # two half-step FF modules
    mhsa = 4 * dmodel * dmodel  # q,k,v,out projections
    mhsa += dmodel * dmodel  # relpe projection
    r = 2 * t - 1
    mhsa += (t + r + t) * dmodel  # content scores + positional scores + PV
    conv = dmodel * d2 + 31 * dmodel + dmodel * dmodel  # pw1, depthwise(31), pw2
    enc_blocks = num_blocks * t * (ff + mhsa + conv)

    # prediction net: embedding (gather) + 1-layer LSTM(320) + LN
    rnn = 320
    pred = u1 * 4 * (rnn * rnn + rnn * rnn)

    # joint: prejoint linears + vocab GEMM over the [T, U+1] grid
    joint = t * dmodel * 320 + u1 * rnn * 320 + t * u1 * 320 * vocab

    fwd_macs = bs * (sub + enc_blocks + pred + joint)
    mult = (3.0 + (1.0 if remat else 0.0) * (enc_blocks / (sub + enc_blocks + pred + joint)))
    return 2.0 * fwd_macs * mult


def _bench_train_one(bs, nsamples, audio_secs, u_len, vocab, model, peak, scan_steps=8):
    """One batch size: scan ``scan_steps`` full train steps inside ONE jit
    dispatch. The tunneled accelerator in this environment adds a variable
    ~40-120 ms of relay latency to every host→device call, which at real step
    times (~100 ms) would dominate a per-call measurement; scanning K steps
    on-device amortizes it to noise. Batches are generated ON device
    (jax.random) — host transfers of the stacked audio would crawl through
    the relay — and vary per step so runtime result-caching cannot fire.
    """
    import jax
    import jax.numpy as jnp

    from tensorflowasr_tpu import schemas
    from tensorflowasr_tpu.optimizers import build_optimizer
    from tensorflowasr_tpu.training import Trainer
    from tensorflowasr_tpu.training.trainer import make_train_step

    def make_batches(seed, k):
        """[K, ...]-stacked TrainData, generated on device."""
        kk = jax.random.split(jax.random.PRNGKey(seed), 3)
        return schemas.TrainData(
            inputs=schemas.TrainInput(
                inputs=jax.random.normal(kk[0], (k, bs, nsamples), jnp.float32) * 0.1,
                inputs_length=jnp.full((k, bs), nsamples, jnp.int32),
                predictions=jnp.pad(
                    jax.random.randint(kk[1], (k, bs, u_len), 1, vocab, jnp.int32), ((0, 0), (0, 0), (1, 0))
                ),
                predictions_length=jnp.full((k, bs), u_len + 1, jnp.int32),
            ),
            labels=schemas.TrainLabel(
                labels=jax.random.randint(kk[2], (k, bs, u_len), 1, vocab, jnp.int32),
                labels_length=jnp.full((k, bs), u_len, jnp.int32),
            ),
        )

    tx = build_optimizer({"class_name": "Adam", "config": {"learning_rate": 1e-4}}, ga_steps=1)
    trainer = Trainer(model, tx)
    step_fn = make_train_step(model, tx)

    one = jax.tree.map(lambda x: x[0], make_batches(0, 1))
    state = trainer.init_state(one)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(state, batches):
        def body(s, b):
            s2, metrics = step_fn(s, b)
            return s2, metrics["loss"]

        return jax.lax.scan(body, state, batches)

    # MFU basis: analytic model-FLOPs count (see analytic_train_flops).
    # XLA HLO cost analysis counts a scan/while body ONCE regardless of trip
    # count, so the round-2 cost-analysis basis under-reported MFU ~8×.
    flops = analytic_train_flops(bs, audio_secs, u_len, vocab)
    batches = make_batches(1, scan_steps)

    state, losses = multi(state, batches)  # compile + warmup
    float(np.asarray(losses)[-1])

    times = []
    for i in range(2, 5):
        b = make_batches(i, scan_steps)
        t0 = time.perf_counter()
        state, losses = multi(state, b)
        float(np.asarray(losses)[-1])  # device→host fetch forces completion
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / scan_steps
    return {
        "step_ms": round(dt * 1e3, 2),
        "utt_per_sec": round(bs / dt, 2),
        "train_x_realtime": round(bs * audio_secs / dt, 1),
        "mfu_pct": round(100.0 * flops / dt / peak, 2),
        "mfu_basis": "analytic_model_flops",
    }


def bench_streaming(model, variables, chunk_frames=16, n_chunks=16, batch=1):
    """Deployment-path streaming latency: ms per chunk, carried states.

    One chunk = ``chunk_frames`` feature frames of raw audio (reference
    chunk math feature_extraction.py:141-162). Each scan step runs the full
    consumer loop body — frontend + causal encoder with carried streaming
    state + WIND greedy decode with carried prev-token/decoder states —
    exactly what examples/inferences/streaming_tflite_conformer.py does per
    chunk. ``n_chunks`` chunks are scanned inside ONE jit dispatch to
    amortize the ~40-120 ms relay latency of this environment.
    """
    import jax
    import jax.numpy as jnp

    from tensorflowasr_tpu import schemas
    from tensorflowasr_tpu.models.transducer import base as transducer_base
    from tensorflowasr_tpu.ops import frontend

    cfg = frontend.FrontendConfig(**model.speech_config)
    chunk_size, chunk_step = cfg.get_signal_chunk_size_and_step(chunk_frames)

    def chunk_body(carry, signal_chunk):
        enc_states, prev_tokens, dec_states = carry
        pin = schemas.PredictInput(
            inputs=signal_chunk,
            inputs_length=jnp.full((batch,), chunk_size, jnp.int32),
            previous_tokens=prev_tokens,
            previous_encoder_states=enc_states,
            previous_decoder_states=dec_states,
        )
        out = transducer_base.recognize(model, variables, pin)
        return (out.next_encoder_states, out.next_tokens, out.next_decoder_states), out.tokens

    @jax.jit
    def run_chunks(variables, chunks):
        carry0 = (
            model.init_encoder_states(batch),
            jnp.full((batch,), model.blank, jnp.int32),
            model.init_decoder_states(batch),
        )
        (enc, tok, dec), tokens = jax.lax.scan(chunk_body, carry0, chunks)
        return tokens

    def make_chunks(seed):
        r = np.random.default_rng(seed)
        return jnp.asarray(r.standard_normal((n_chunks, batch, chunk_size)) * 0.1, jnp.float32)

    tokens = run_chunks(variables, make_chunks(0))  # compile + warmup
    np.asarray(tokens)

    times = []
    for i in range(1, 4):
        c = make_chunks(i)
        t0 = time.perf_counter()
        tokens = run_chunks(variables, c)
        np.asarray(tokens)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / n_chunks
    chunk_audio_s = chunk_step / cfg.sample_rate
    return {
        "ms_per_chunk": round(dt * 1e3, 3),
        "chunk_frames": chunk_frames,
        "chunk_audio_ms": round(chunk_audio_s * 1e3, 1),
        "rtf": round(chunk_audio_s / dt, 1),
    }


def main():
    import jax
    import jax.numpy as jnp

    from tensorflowasr_tpu import schemas
    from tensorflowasr_tpu.models.transducer import base as transducer_base

    from __graft_entry__ import _conformer_small

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    vocab = 256
    model = _conformer_small(vocab_size=vocab, num_blocks=16, dmodel=144, dtype=jnp.bfloat16 if on_tpu else jnp.float32)

    batch, audio_secs, sr = 8, 10.0, 16000
    nsamples = int(audio_secs * sr)
    rng = np.random.default_rng(0)
    signals = jnp.asarray(rng.standard_normal((batch, nsamples)) * 0.1, jnp.float32)
    lengths = jnp.full((batch,), nsamples, jnp.int32)

    ti = schemas.TrainInput(
        inputs=signals,
        inputs_length=lengths,
        predictions=jnp.zeros((batch, 2), jnp.int32),
        predictions_length=jnp.ones((batch,), jnp.int32),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, ti, train=False)

    # A random-init joint never emits blank, driving the decode loop toward
    # its worst-case token budget (2T+1). Bias the blank logit part-way so
    # emission density lands between all-blank and the hard cap — a
    # conservative (pessimistic) stand-in for a trained model's decode cost.
    params = variables["params"]
    joint_bias = params["joint"]["vocab"]["bias"]
    params["joint"]["vocab"]["bias"] = joint_bias.at[0].add(0.5)

    @jax.jit
    def recognize_fn(variables, pin):
        return transducer_base.recognize(model, variables, pin)

    # warmup/compile
    pin = schemas.PredictInput(inputs=signals, inputs_length=lengths)
    out = recognize_fn(variables, pin)
    np.asarray(out.tokens)  # real host fetch: block_until_ready can be a no-op on experimental platforms

    # distinct inputs per iteration: the runtime may cache identical
    # value-for-value repeat executions, which would fake the timing
    iters = 8
    pins = [
        schemas.PredictInput(inputs=jnp.asarray(rng.standard_normal((batch, nsamples)) * 0.1, jnp.float32), inputs_length=lengths)
        for _ in range(iters)
    ]
    times = []
    for p in pins:
        t0 = time.perf_counter()
        out = recognize_fn(variables, p)
        np.asarray(out.tokens)  # forces completion + transfer
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    rtf = (batch * audio_secs) / dt

    record = {"metric": "rtf_per_chip", "value": round(rtf, 3), "unit": "x_realtime", "vs_baseline": round(rtf / 10.0, 4)}
    _emit(record)

    # ---- streaming latency (deployment path) ----
    if os.environ.get("TFASR_BENCH_STREAMING", "1") != "0":
        if _remaining() > 120.0:
            try:
                record["streaming"] = bench_streaming(model, variables)
                record["streaming"]["t_elapsed_s"] = round(time.monotonic() - _T_START, 1)
            except Exception as e:
                record["streaming"] = {"error": f"{type(e).__name__}: {e}"}
        else:
            record["streaming"] = "skipped (budget)"
        _emit(record)

    # ---- train throughput / MFU, priority order, budget-gated ----
    if os.environ.get("TFASR_BENCH_TRAIN", "1") != "0":
        peak = _peak_flops(jax.devices()[0])
        u_len, tr_secs = 128, 16.0
        tr_nsamples = int(tr_secs * sr)
        record["train"] = {}
        # flagship bs16 first so the headline number lands even on a slow
        # compile-helper day; the rest in decreasing information value
        # (bs128: best measured MFU — flash-RNN-T keeps the logits out of
        # HBM so the large batch fits without remat)
        for bs in (16, 64, 128, 32, 8, 4):
            if _remaining() < 150.0:
                record["train"][f"bs{bs}"] = "skipped (budget)"
                continue
            try:
                entry = _bench_train_one(bs, tr_nsamples, tr_secs, u_len, vocab, model, peak)
                entry["t_elapsed_s"] = round(time.monotonic() - _T_START, 1)
                record["train"][f"bs{bs}"] = entry
            except Exception as e:  # one batch size must not sink the others
                record["train"][f"bs{bs}"] = {"error": f"{type(e).__name__}: {e}"}
            _emit(record)

    _emit(record)


if __name__ == "__main__":
    main()
