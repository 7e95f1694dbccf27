"""Where do the 27.6 ms of the 16-block rel-MHSA stack go?

Times kernel-level variants at the bench shape (B=16, H=4, T=S=400, D=36,
R=799) by scanning K iterations inside one jit call with distinct on-device
inputs (per CLAUDE.md: per-call relay latency and result caching make naive
timing meaningless). Prints one JSON line per variant.

Usage: python scripts_dev/attn_ablation.py [name ...]
Names: kb_fwd kb_fwdbwd ka_fwdbwd kb_norel_fwdbwd module_block xla_block
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, T, D = 16, 4, 400, 36
S, R = T, 2 * T - 1
BH = B * H
K = 8


def _timeit(fn, make_xs, n_rep=3):
    out = fn(make_xs(0))
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    times = []
    for i in range(1, 1 + n_rep):
        xs = make_xs(i)
        t0 = time.perf_counter()
        out = fn(xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / K


def report(name, secs):
    print(json.dumps({"component": name, "ms": round(secs * 1e3, 3)}), flush=True)


def _mk(seed):
    kk = jax.random.split(jax.random.PRNGKey(seed), 5)
    f = lambda k, shape: jax.random.normal(k, (K,) + shape, jnp.bfloat16) * 0.1
    return (
        f(kk[0], (BH, T, D)),
        f(kk[1], (BH, T, D)),
        f(kk[2], (BH, S, D)),
        f(kk[3], (BH, S, D)),
        f(kk[4], (BH, R, D)),
    )


def _scan_over(one):
    @jax.jit
    def multi(xs):
        def body(c, x):
            return c, one(*x)

        return jax.lax.scan(body, 0.0, xs)[1]

    return lambda xs: multi(xs)


def run_kb(fwdbwd: bool, with_rel: bool = True):
    from tensorflowasr_tpu.ops.pallas.attention_kernel import fused_attention, fused_rel_attention

    seed = jnp.int32(17)

    if with_rel:
        core = lambda qc, qp, k, v, pos: fused_rel_attention(qc, qp, k, v, pos, None, None, seed, 0.1)
    else:
        bias = jnp.zeros((1, 1, S), jnp.float32)
        core = lambda qc, qp, k, v, pos: fused_attention(qc, k, v, bias, seed, 0.1)

    if fwdbwd:
        def one(qc, qp, k, v, pos):
            def loss(args):
                return jnp.sum(core(*args).astype(jnp.float32))

            l, g = jax.value_and_grad(loss)((qc, qp, k, v, pos))
            return l + sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in g)

    else:
        def one(qc, qp, k, v, pos):
            return jnp.sum(core(qc, qp, k, v, pos).astype(jnp.float32))

    return _timeit(_scan_over(one), _mk)


def run_module(n_blocks=1, impl=None):
    """MHSAModule (projections + kernel + residual/LN) fwd+bwd."""
    import flax.linen as nn

    from tensorflowasr_tpu.models.encoders.conformer import MHSAModule

    prev = os.environ.get("TFASR_ATTN_IMPL")
    if impl is not None:
        os.environ["TFASR_ATTN_IMPL"] = impl
    try:
        class Stack(nn.Module):
            @nn.compact
            def __call__(self, x, relpe, mask, train=False):
                cb = self.param("cb", nn.initializers.zeros, (H, D), jnp.float32)
                pb = self.param("pb", nn.initializers.zeros, (H, D), jnp.float32)
                for i in range(n_blocks):
                    x, _ = MHSAModule(
                        dmodel=144, head_size=D, num_heads=H, dropout=0.1, dtype=jnp.bfloat16, name=f"m{i}"
                    )(x, relpe, mask=mask, content_attention_bias=cb, positional_attention_bias=pb, train=train)
                return x

        module = Stack()
        relpe = jax.random.normal(jax.random.PRNGKey(7), (B, R, 144), jnp.bfloat16)
        mask = jnp.ones((B, T), bool)
        x0 = jnp.zeros((B, T, 144), jnp.bfloat16)
        params = module.init({"params": jax.random.PRNGKey(0)}, x0, relpe, mask, train=False)["params"]

        @jax.jit
        def multi(params, xs):
            def body(c, x):
                def loss_fn(p):
                    out = module.apply({"params": p}, x, relpe, mask, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
                    return jnp.mean(out.astype(jnp.float32))

                l, g = jax.value_and_grad(loss_fn)(params)
                return c, l + sum(jnp.sum(jnp.square(t.astype(jnp.float32))) for t in jax.tree_util.tree_leaves(g))

            return jax.lax.scan(body, 0.0, xs)[1]

        mk = lambda i: jax.random.normal(jax.random.PRNGKey(i), (K, B, T, 144), jnp.bfloat16) * 0.1
        return _timeit(lambda xs: multi(params, xs), mk)
    finally:
        if impl is not None:
            if prev is None:
                os.environ.pop("TFASR_ATTN_IMPL", None)
            else:
                os.environ["TFASR_ATTN_IMPL"] = prev


RUNNERS = {
    "kb_fwd": lambda: run_kb(False),
    "kb_fwdbwd": lambda: run_kb(True),
    "ka_fwdbwd": lambda: run_kb(True, with_rel=False),
    "module_block": lambda: run_module(1),
    "xla_block": lambda: run_module(1, impl="xla"),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(RUNNERS)
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    for name in names:
        try:
            secs = RUNNERS[name]()
            report(name, secs)
        except Exception as e:
            print(json.dumps({"component": name, "error": f"{type(e).__name__}: {e}"[:500]}), flush=True)
