"""Fused conv-module canary: compiled conv_front/conv_back vs the XLA
ConvModule path ON TPU (parity + 16-stack timing).

Usage: python scripts_dev/conv_canary.py [small|bench|stack ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B, T, D = 16, 400, 144


def parity(name, b, t, d, dtype_name):
    import jax
    import jax.numpy as jnp

    from tensorflowasr_tpu.models.encoders.conformer import ConvModule

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32).astype(dtype) * 0.5
    layer = ConvModule(input_dim=d, kernel_size=31, dropout=0.0, padding="causal", dtype=dtype)
    os.environ["TFASR_CONV_IMPL"] = "xla"
    try:
        variables = layer.init({"params": jax.random.PRNGKey(0)}, x)
    finally:
        os.environ.pop("TFASR_CONV_IMPL", None)

    res = {}
    for impl in ("pallas", "xla"):
        os.environ["TFASR_CONV_IMPL"] = impl
        try:
            def loss(p):
                out, _ = layer.apply(
                    {"params": p, "batch_stats": variables["batch_stats"]}, x, train=True, mutable=["batch_stats"]
                )
                return jnp.sum(jnp.square(out.astype(jnp.float32)))

            val, grads = jax.value_and_grad(loss)(variables["params"])
        finally:
            os.environ.pop("TFASR_CONV_IMPL", None)
        gn = float(np.sqrt(sum(np.sum(np.square(np.asarray(g, np.float64))) for g in jax.tree_util.tree_leaves(grads))))
        res[impl] = {"val": float(np.asarray(val)), "gnorm": gn}
    rel = abs(res["pallas"]["val"] - res["xla"]["val"]) / max(abs(res["xla"]["val"]), 1e-9)
    grel = abs(res["pallas"]["gnorm"] - res["xla"]["gnorm"]) / max(res["xla"]["gnorm"], 1e-9)
    print(json.dumps({"canary": name, "val_rel": rel, "gnorm_rel": grel, **res}), flush=True)


def stack():
    from scripts_dev.profile_components import run_conv16

    for impl in ("xla", "pallas"):
        os.environ["TFASR_CONV_IMPL"] = impl
        try:
            secs = run_conv16()
        finally:
            os.environ.pop("TFASR_CONV_IMPL", None)
        print(json.dumps({"component": f"conv16_{impl}", "ms": round(secs * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["small", "bench", "stack"]
    import jax
    import jax.numpy as jnp

    import scripts_dev.profile_components as pc

    pc.jax, pc.jnp = jax, jnp

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    for n in names:
        if n == "small":
            parity("small_f32", 2, 40, 24, "f32")
        elif n == "bench":
            parity("bench_bf16", B, T, D, "bf16")
        else:
            stack()
