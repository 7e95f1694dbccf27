"""Benchmark: Conformer Transducer Small — train throughput/MFU + decode RTF.

Measures on the available accelerator and prints the result as ONE JSON line
(cumulative, re-emitted after every completed stage):

  {"metric": "rtf_per_chip", "value": N, "unit": "x_realtime", "vs_baseline": N/10,
   "train": {"bs16": {"step_ms": .., "mfu_pct": ..}, ...},
   "streaming": {"ms_per_chunk": ..}, "padded_eff": {...}}

**Stage order (round-5 restructure):** train (bs16 → bs64 → bs128 → bs32)
FIRST, then decode RTF, then streaming, then padded-batch efficiency.
Rationale (BENCH_r03/r04 postmortems): the remote compile helper has a
documented 10× run-to-run latency variance and the driver kills the bench
at ~1540-1800 s; rounds 3 and 4 spent 1100+ s compiling the decode program
before the first train number landed and got killed mid-sweep. Train MFU is
the contested metric — it lands first now. Decode RTF (the headline, which
has been ≥170× over its 10× target since round 1) is measured as TWO
smaller jit programs (encode, then the WIND loop) instead of one fused
program: the fused variant alone took ~14 min to compile remotely in r4.

- The cumulative record is printed (and flushed) after EVERY completed
  stage, so a hard kill still leaves the last fully-parseable JSON line
  on stdout. The headline `value` is null until the decode stage lands —
  earlier emissions carry the train numbers.
- A wall-clock budget (env ``TFASR_BENCH_BUDGET_S``, default 1500 s — kept
  BELOW the observed driver kill window) is checked before *starting* each
  stage; skipped stages are recorded as ``"skipped (budget)"``.
- A persistent JAX compilation cache is enabled at ``.jax_cache/`` when the
  backend supports serialization, so a bench run during the build round
  pre-warms the driver's end-of-round run.

The "train" block records the full jit train step (forward + RNN-T loss +
grads + optax update) on 16 s utterances, with model-FLOPs-utilization from
an analytic FLOPs count against the chip's peak bf16 FLOPs. The "streaming"
block records the deployment-path latency: one 16-frame chunk through
frontend + chunked encoder + greedy decode with carried states (reference
chunk math: feature_extraction.py:141-162). "padded_eff" measures that step
time is length-invariant under realistic (LibriSpeech-like) length
distributions and reports the padding-waste fraction with and without
length bucketing.

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
# fully-parseable record on stdout. Default sits BELOW the driver's observed
# ~1540-1800 s kill window (BENCH_r03/r04 both rc=124 with a 2700 s budget).
_BUDGET_S = float(os.environ.get("TFASR_BENCH_BUDGET_S", "1500"))


def _remaining() -> float:
    return _BUDGET_S - (time.monotonic() - _T_START)


def _emit(record) -> None:
    """Print the cumulative record NOW and flush: a later timeout/kill must
    not erase the stages already measured."""
    print(json.dumps(record), flush=True)


def _enable_compile_cache() -> None:
    """Persistent compilation cache: a bench run during the build round
    pre-warms the driver's end-of-round run (the remote compile helper is
    the dominant cost at 40 s-14 min per program). Silently unsupported
    backends just miss the cache."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


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


def _librispeech_like_lengths(rng, bs, max_secs, max_u, sr):
    """Sample a realistic utterance-length batch. LibriSpeech train-960 is
    281k utterances / 960.9 h → mean ~12.3 s, right-clipped near 16.7 s;
    modeled here as a left-skewed lognormal clipped to [1.5 s, max].
    Label lengths scale ~8 subword tokens/s (SP256 on read speech)."""
    secs = np.clip(rng.lognormal(mean=np.log(12.0), sigma=0.35, size=bs), 1.5, max_secs)
    samples = (secs * sr).astype(np.int64)
    u = np.clip((secs * 8.0).astype(np.int64), 1, max_u)
    return samples, u


def _bench_train_one(bs, nsamples, audio_secs, u_len, vocab, model, peak, scan_steps=8, padded_eff=False):
    """One batch size: scan ``scan_steps`` full train steps inside ONE jit
    dispatch. The tunneled accelerator in this environment adds a variable
    ~40-120 ms of relay latency to every host→device call, which at real step
    times (~100 ms) would dominate a per-call measurement; scanning K steps
    on-device amortizes it to noise. Batches are generated ON device
    (jax.random) — host transfers of the stacked audio would crawl through
    the relay — and vary per step so runtime result-caching cannot fire.

    ``padded_eff=True`` additionally re-times the SAME compiled program with
    a realistic (LibriSpeech-like) length distribution inside the fixed
    padded shapes, reporting the padding-waste fraction and effective audio
    throughput — the real-world term the fixed-16 s number hides.
    """
    import jax
    import jax.numpy as jnp

    from tensorflowasr_tpu import schemas
    from tensorflowasr_tpu.optimizers import build_optimizer
    from tensorflowasr_tpu.training import Trainer
    from tensorflowasr_tpu.training.trainer import make_train_step

    def make_batches(seed, k, in_lens=None, u_lens=None):
        """[K, ...]-stacked TrainData, generated on device."""
        kk = jax.random.split(jax.random.PRNGKey(seed), 3)
        if in_lens is None:
            in_lens = jnp.full((k, bs), nsamples, jnp.int32)
            u_lens = jnp.full((k, bs), u_len, jnp.int32)
        return schemas.TrainData(
            inputs=schemas.TrainInput(
                inputs=jax.random.normal(kk[0], (k, bs, nsamples), jnp.float32) * 0.1,
                inputs_length=in_lens,
                predictions=jnp.pad(
                    jax.random.randint(kk[1], (k, bs, u_len), 1, vocab, jnp.int32), ((0, 0), (0, 0), (1, 0))
                ),
                predictions_length=u_lens + 1,
            ),
            labels=schemas.TrainLabel(
                labels=jax.random.randint(kk[2], (k, bs, u_len), 1, vocab, jnp.int32),
                labels_length=u_lens,
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
    entry = {
        "step_ms": round(dt * 1e3, 2),
        "utt_per_sec": round(bs / dt, 2),
        "train_x_realtime": round(bs * audio_secs / dt, 1),
        "mfu_pct": round(100.0 * flops / dt / peak, 2),
        "mfu_basis": "analytic_model_flops",
    }

    if padded_eff:
        # Same compiled program, realistic lengths inside the static shapes.
        rng = np.random.default_rng(7)
        sr = int(nsamples / audio_secs)
        ptimes, mean_secs = [], []
        for i in range(5, 8):
            samples, u = _librispeech_like_lengths(rng, scan_steps * bs, audio_secs, u_len, sr)
            mean_secs.append(samples.mean() / sr)
            in_lens = jnp.asarray(samples.reshape(scan_steps, bs), jnp.int32)
            u_lens = jnp.asarray(u.reshape(scan_steps, bs), jnp.int32)
            b = make_batches(i, scan_steps, in_lens=in_lens, u_lens=u_lens)
            t0 = time.perf_counter()
            state, losses = multi(state, b)
            float(np.asarray(losses)[-1])
            ptimes.append(time.perf_counter() - t0)
        pdt = float(np.median(ptimes)) / scan_steps
        mean_s = float(np.mean(mean_secs))
        # bucketing estimate (host math): pad each utterance to its bucket
        # boundary instead of the global max; waste = padded/true - 1
        samples, _ = _librispeech_like_lengths(rng, 4096, audio_secs, u_len, sr)
        secs = samples / sr
        waste_flat = float(1.0 - secs.mean() / audio_secs)
        buckets = np.unique(np.clip(np.array([6.0, 9.0, 12.0, 14.0, audio_secs]), None, audio_secs))
        padded = buckets[np.searchsorted(buckets, secs)]
        waste_bucketed = float(1.0 - secs.mean() / padded.mean())
        entry["padded_eff"] = {
            "step_ms_realistic_lengths": round(pdt * 1e3, 2),
            "step_ms_full_lengths": entry["step_ms"],
            "mean_utt_secs": round(mean_s, 2),
            "effective_audio_x_realtime": round(bs * mean_s / pdt, 1),
            "pad_waste_frac": round(waste_flat, 4),
            "pad_waste_frac_bucketed_5": round(waste_bucketed, 4),
            "note": "static shapes: step time is length-invariant; waste is the padding fraction",
        }
    return entry


def bench_decode(model, variables, batch=8, audio_secs=10.0, sr=16000, scan_steps=8):
    """Greedy-decode RTF, measured as TWO jit programs (encode; WIND decode
    loop). The single fused recognize() program took ~14 min to compile on
    the remote helper (BENCH_r04); splitting compiles each half in a
    fraction of that. Each half scans ``scan_steps`` distinct batches inside
    ONE jit dispatch: the tunneled accelerator adds a variable ~40-300 ms of
    relay latency per host→device call, which dominated the per-call split
    timing in the first r5 run (encode "282 ms" for ~10 ms of compute,
    RTF 250× vs the fused program's 1806×). Inputs are generated on device
    and vary per scan step so runtime result-caching cannot fire."""
    import jax
    import jax.numpy as jnp

    from tensorflowasr_tpu.ops import transducer_decode

    nsamples = int(audio_secs * sr)
    lengths = jnp.full((batch,), nsamples, jnp.int32)

    @jax.jit
    def encode_multi(variables, signals_k):
        def body(c, signals):
            enc, elens, _ = model.apply(variables, signals, lengths, method=model.encode)
            return c, (enc, elens)

        return jax.lax.scan(body, 0, signals_k)[1]

    @jax.jit
    def decode_multi(variables, encs_k, elens_k):
        def body(c, args):
            encoded, encoded_length = args

            def pred_step_fn(tok, states):
                return model.apply(variables, tok, states, method=model.pred_step)

            def joint_window_fn(enc_win, pred_out):
                return model.apply(variables, enc_win, pred_out, method=model.joint_window)

            tokens, lens, _, _ = transducer_decode.transducer_greedy_decode_wind(
                encoded, encoded_length, pred_step_fn, joint_window_fn,
                model.init_tokens(batch), model.init_decoder_states(batch), blank=model.blank,
            )
            return c, (tokens, lens)

        return jax.lax.scan(body, 0, (encs_k, elens_k))[1]

    def make_signals(seed):
        return jax.random.normal(jax.random.PRNGKey(seed), (scan_steps, batch, nsamples), jnp.float32) * 0.1

    # warmup/compile both halves
    encs, elens = encode_multi(variables, make_signals(0))
    tokens, _ = decode_multi(variables, encs, elens)
    np.asarray(tokens)

    t_enc, t_dec = [], []
    for i in range(1, 4):
        s = make_signals(i)
        t0 = time.perf_counter()
        encs, elens = encode_multi(variables, s)
        np.asarray(elens)  # force completion (block_until_ready can no-op here)
        t1 = time.perf_counter()
        tokens, _ = decode_multi(variables, encs, elens)
        np.asarray(tokens)
        t2 = time.perf_counter()
        t_enc.append((t1 - t0) / scan_steps)
        t_dec.append((t2 - t1) / scan_steps)
    dt = float(np.median(t_enc)) + float(np.median(t_dec))
    return {
        "rtf": round(batch * audio_secs / dt, 3),
        "encode_ms": round(float(np.median(t_enc)) * 1e3, 2),
        "decode_ms": round(float(np.median(t_dec)) * 1e3, 2),
        "batch": batch,
        "audio_secs": audio_secs,
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
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from tensorflowasr_tpu import schemas

    from __graft_entry__ import _conformer_small

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    vocab = 256
    # TFASR_BENCH_SMOKE=1: tiny shapes for a CPU plumbing check (not a benchmark)
    smoke = os.environ.get("TFASR_BENCH_SMOKE", "0") == "1"
    num_blocks = 2 if smoke else 16
    model = _conformer_small(vocab_size=vocab, num_blocks=num_blocks, dmodel=144, dtype=jnp.bfloat16 if on_tpu else jnp.float32)

    batch, audio_secs, sr = (2, 2.0, 16000) if smoke else (8, 10.0, 16000)
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

    # headline value (decode RTF) lands AFTER the train sweep — null until
    # then; every emission before that carries the train numbers.
    record = {"metric": "rtf_per_chip", "value": None, "unit": "x_realtime", "vs_baseline": None}
    peak = _peak_flops(jax.devices()[0])

    # ---- train throughput / MFU FIRST (the contested metric) ----
    if os.environ.get("TFASR_BENCH_TRAIN", "1") != "0":
        u_len, tr_secs = (16, 2.0) if smoke else (128, 16.0)
        tr_nsamples = int(tr_secs * sr)
        record["train"] = {}
        # flagship bs16 first (with the padded-length efficiency rider on its
        # compiled program), then the scaling points bs64/bs128; bs32 runs
        # only if the later stages leave budget (see tail of main)
        for bs in ((2,) if smoke else (16, 64, 128)):
            if _remaining() < 150.0:
                record["train"][f"bs{bs}"] = "skipped (budget)"
                continue
            try:
                entry = _bench_train_one(bs, tr_nsamples, tr_secs, u_len, vocab, model, peak, padded_eff=(bs == (2 if smoke else 16)))
                entry["t_elapsed_s"] = round(time.monotonic() - _T_START, 1)
                record["train"][f"bs{bs}"] = entry
            except Exception as e:  # one batch size must not sink the others
                record["train"][f"bs{bs}"] = {"error": f"{type(e).__name__}: {e}"}
            _emit(record)

    # ---- decode RTF (headline; two split programs, cheap to compile) ----
    if _remaining() > 180.0:
        try:
            dec = bench_decode(model, variables, batch=batch, audio_secs=audio_secs, sr=sr)
            record["value"] = dec["rtf"]
            record["vs_baseline"] = round(dec["rtf"] / 10.0, 4)
            record["decode"] = dec
            record["decode"]["t_elapsed_s"] = round(time.monotonic() - _T_START, 1)
        except Exception as e:
            record["decode"] = {"error": f"{type(e).__name__}: {e}"}
    else:
        record["decode"] = "skipped (budget)"
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

    # ---- leftover budget: the remaining train scaling point ----
    if os.environ.get("TFASR_BENCH_TRAIN", "1") != "0" and not smoke and _remaining() > 200.0:
        try:
            entry = _bench_train_one(32, int(16.0 * sr), 16.0, 128, vocab, model, peak)
            entry["t_elapsed_s"] = round(time.monotonic() - _T_START, 1)
            record["train"]["bs32"] = entry
        except Exception as e:
            record["train"]["bs32"] = {"error": f"{type(e).__name__}: {e}"}

    _emit(record)


if __name__ == "__main__":
    main()
