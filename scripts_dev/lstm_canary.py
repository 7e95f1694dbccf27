"""Fused-LSTM canary: compiled lstm kernel vs the XLA scan path ON TPU.

Interpret-mode goldens (tests/test_fused_lstm.py) prove the math; this
proves Mosaic compiles it to the same numbers on hardware and measures the
prediction-net stack (embed + LSTM320 + LN, fwd+bwd) both ways.

Usage: python scripts_dev/lstm_canary.py [small|bench|stack ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parity(name, b, t, e, h, dtype_name):
    import jax
    import jax.numpy as jnp

    from tensorflowasr_tpu.models.layers.rnn import RNN

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32).astype(dtype) * 0.5
    lens = jnp.asarray(rng.integers(t // 2, t + 1, size=(b,)), jnp.int32)
    mask = (jnp.arange(t)[None, :] < lens[:, None])[..., None].astype(jnp.float32)
    layer = RNN(units=h, rnn_type="lstm", dtype=dtype)
    os.environ["TFASR_RNN_IMPL"] = "xla"
    try:
        variables = layer.init(jax.random.PRNGKey(0), x, lens)
    finally:
        os.environ.pop("TFASR_RNN_IMPL", None)

    res = {}
    for impl in ("pallas", "xla"):
        os.environ["TFASR_RNN_IMPL"] = impl
        try:

            def loss(v):
                y, (c, hh) = layer.apply(v, x, lens)
                return jnp.sum(jnp.square(y.astype(jnp.float32) * mask)) + jnp.sum(
                    jnp.square(c.astype(jnp.float32))
                ) + jnp.sum(jnp.square(hh.astype(jnp.float32)))

            val, grads = jax.value_and_grad(loss)(variables)
        finally:
            os.environ.pop("TFASR_RNN_IMPL", None)
        gn = float(np.sqrt(sum(np.sum(np.square(np.asarray(g, np.float64))) for g in jax.tree_util.tree_leaves(grads))))
        res[impl] = {"val": float(np.asarray(val)), "gnorm": gn}
    rel = abs(res["pallas"]["val"] - res["xla"]["val"]) / max(abs(res["xla"]["val"]), 1e-9)
    grel = abs(res["pallas"]["gnorm"] - res["xla"]["gnorm"]) / max(res["xla"]["gnorm"], 1e-9)
    print(json.dumps({"canary": name, "val_rel": rel, "gnorm_rel": grel, **res}), flush=True)


def lstm_only(b=16, t=129, e=320, h=320, reps=2):
    """Time JUST the LSTM layer fwd+bwd both ways at the prednet shape,
    K-step-scanned per profile_components conventions."""
    import functools

    import jax
    import jax.numpy as jnp

    from scripts_dev.profile_components import K, _timeit, optax_global_norm
    from tensorflowasr_tpu.models.layers.rnn import RNN

    layer = RNN(units=h, rnn_type="lstm", dtype=jnp.bfloat16)
    x0 = jnp.zeros((b, t, e), jnp.bfloat16)
    lens = jnp.full((b,), t, jnp.int32)
    os.environ["TFASR_RNN_IMPL"] = "xla"
    try:
        variables = layer.init(jax.random.PRNGKey(0), x0, lens)
    finally:
        os.environ.pop("TFASR_RNN_IMPL", None)

    for _ in range(reps):
        for impl in ("xla", "pallas"):
            os.environ["TFASR_RNN_IMPL"] = impl
            try:

                @jax.jit
                def multi(params, xs):
                    def body(c, xb):
                        def loss_fn(p):
                            y, (cf, hf) = layer.apply(p, xb, lens)
                            return jnp.mean(y.astype(jnp.float32)) + jnp.mean(cf.astype(jnp.float32))

                        l, g = jax.value_and_grad(loss_fn)(params)
                        return c, l + optax_global_norm(g)

                    return jax.lax.scan(body, 0.0, xs)[1]

                def mk(seed):
                    return jax.random.normal(jax.random.PRNGKey(seed), (K, b, t, e), jnp.bfloat16) * 0.1

                secs = _timeit(functools.partial(multi, variables), mk)
            finally:
                os.environ.pop("TFASR_RNN_IMPL", None)
            print(json.dumps({"component": f"lstm_only_{impl}", "ms": round(secs * 1e3, 2)}), flush=True)


def stack():
    """Time the prediction net fwd+bwd both ways (profile_components.run_prednet)."""
    from scripts_dev.profile_components import run_prednet

    for impl in ("xla", "pallas"):
        os.environ["TFASR_RNN_IMPL"] = impl
        try:
            secs = run_prednet()
        finally:
            os.environ.pop("TFASR_RNN_IMPL", None)
        print(json.dumps({"component": f"prednet_{impl}", "ms": round(secs * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["small", "bench", "stack"]
    import jax
    import jax.numpy as jnp

    import scripts_dev.profile_components as pc

    pc.jax, pc.jnp = jax, jnp  # profile_components injects these in __main__ only

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    t0 = time.time()
    for n in names:
        if n == "small":
            parity("small_f32", 2, 40, 24, 24, "f32")
        elif n == "bench":
            parity("bench_bf16", 16, 129, 320, 320, "bf16")
        elif n == "stack":
            stack()
        elif n == "lstm":
            lstm_only()
        print(json.dumps({"done": n, "elapsed_s": round(time.time() - t0, 1)}), flush=True)
