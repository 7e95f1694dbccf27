"""Kernel-B canary: compiled fused_rel_attention vs the XLA path ON TPU.

Interpret-mode goldens (tests/test_fused_attention.py) prove the math; this
proves Mosaic compiles the barrel shifter / iota masks to the same numbers
on hardware, at a small shape first and then at bench shape.

Usage: python scripts_dev/attn_canary.py [small|bench ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(name, b, t, d, heads, hd, dtype_name):
    import jax
    import jax.numpy as jnp

    from tensorflowasr_tpu.models.layers.attention import MultiHeadRelativeAttention

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32).astype(dtype) * 0.5
    relpe = jnp.asarray(rng.standard_normal((b, 2 * t - 1, d)), jnp.float32).astype(dtype) * 0.5
    qmask = jnp.arange(t)[None, :] < jnp.full((b,), t, jnp.int32)[:, None]

    layer = MultiHeadRelativeAttention(num_heads=heads, key_dim=hd, output_dim=d, dtype=dtype)
    variables = layer.init({"params": jax.random.PRNGKey(0)}, x, x, relpe=relpe, query_mask=qmask)

    def loss(v, xx, impl):
        os.environ["TFASR_ATTN_IMPL"] = impl
        try:
            out, _ = layer.apply(v, xx, xx, relpe=relpe, query_mask=qmask)
        finally:
            os.environ.pop("TFASR_ATTN_IMPL", None)
        return jnp.sum((out.astype(jnp.float32)) ** 2)

    res = {}
    for impl in ("pallas", "xla"):
        t0 = time.perf_counter()
        val, grads = jax.value_and_grad(lambda v: loss(v, x, impl))(variables)
        gn = float(np.sqrt(sum(np.sum(np.square(np.asarray(g, np.float64))) for g in jax.tree_util.tree_leaves(grads))))
        res[impl] = {"val": float(np.asarray(val)), "gnorm": gn, "sec": round(time.perf_counter() - t0, 1)}
    rel = abs(res["pallas"]["val"] - res["xla"]["val"]) / max(abs(res["xla"]["val"]), 1e-9)
    grel = abs(res["pallas"]["gnorm"] - res["xla"]["gnorm"]) / max(res["xla"]["gnorm"], 1e-9)
    print(json.dumps({"canary": name, "val_rel": rel, "gnorm_rel": grel, **res}), flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["small", "bench"]
    import jax

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    for n in names:
        if n == "small":
            run("small_f32", 2, 40, 24, 2, 12, "f32")
        else:
            run("bench_bf16", 4, 400, 144, 4, 36, "bf16")
