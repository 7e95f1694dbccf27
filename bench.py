"""Benchmark: Conformer Transducer Small greedy-decode RTF per chip.

Measures end-to-end inference (raw audio → feature frontend → encoder →
frame-synchronous greedy decode) on the available accelerator and prints ONE
JSON line:

  {"metric": "rtf_per_chip", "value": N, "unit": "x_realtime", "vs_baseline": N/10}

Baseline: the reference publishes no throughput numbers (SURVEY.md §6); the
north-star speed target from BASELINE.json is ≥10× real-time per chip on
Conformer-S, so vs_baseline = value / 10.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tensorflowasr_tpu import schemas
    from tensorflowasr_tpu.models.transducer import base as transducer_base

    from __graft_entry__ import _conformer_small

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    model = _conformer_small(vocab_size=256, num_blocks=16, dmodel=144, dtype=jnp.bfloat16 if on_tpu else jnp.float32)

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
    print(json.dumps({"metric": "rtf_per_chip", "value": round(rtf, 3), "unit": "x_realtime", "vs_baseline": round(rtf / 10.0, 4)}))


if __name__ == "__main__":
    main()
