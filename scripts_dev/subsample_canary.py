"""Subsampling ablation on TPU: where do the 11 ms go, and can conv_0 escape
XLA's small-channel conv lowering?

The Conv2dSubsampling profile (docs/design/step_profile_r4.md) splits as
convs+proj 8.7 ms vs ~1.7 ms analytic, BN+swish ~3 ms. conv_0 has C_in=1 —
MXU-hostile — and the straight im2col rewrite measured 6.9x WORSE because
its patch tensors have 9-lane minor dims (convolution.py docstring). This
canary times each piece separately and tries the banded-GEMM reformulation
of conv_0: 3 time-strided slices (lane dim stays 80, like the frontend
framing trick e193fa1) x one [240, F_out*D] GEMM whose matrix is built from
the conv params at trace time, exactly reproducing causal 3x3 stride-(2,2).

Usage: python scripts_dev/subsample_canary.py [parity|conv1_xla|conv1_gemm|
       conv2_xla|conv2_im2col|bnswish|stack ...]   (default: all)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B, TF, F, D = 16, 1601, 80, 144
K = 6


def _timeit(fn, make_xs, n_rep=3):
    import jax

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
    print(json.dumps({"component": name, "ms": round(secs * 1e3, 2)}), flush=True)


def _gnorm(tree):
    import jax
    import jax.numpy as jnp

    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in jax.tree_util.tree_leaves(tree)))


def conv1_gemm_apply(x, kernel, bias, dtype):
    """Exact causal 3x3 stride-(2,2) conv over [B, T, F, 1] as slices+GEMM.

    W1d[dt, fin, fo*D+c] = kernel[dt, df, 0, c] where fin == 2*fo + df - 2
    (F is causally left-padded by 2). Time handled by 3 stride-2 slices of
    the (left-padded) [B, T+2, F] view — minor dim stays F=80.
    """
    import jax
    import jax.numpy as jnp

    b, t, f, _ = x.shape
    kt, kf, _, d = kernel.shape
    st, sf = 2, 2
    f_out = (f + (kf - 1) - kf) // sf + 1
    t_out = (t + (kt - 1) - kt) // st + 1
    p = np.zeros((kf, f, f_out), np.float32)
    for df in range(kf):
        for fo in range(f_out):
            src = sf * fo + df - (kf - 1)
            if 0 <= src < f:
                p[df, src, fo] = 1.0
    pmat = jnp.asarray(p)
    # [kt, F, f_out, D] -> [kt*F, f_out*D]
    w1 = jnp.einsum("dsf,tdc->tsfc", pmat, kernel[:, :, 0, :].astype(jnp.float32))
    w1 = w1.reshape(kt * f, f_out * d).astype(dtype)
    xp = jnp.pad(x[..., 0], ((0, 0), (kt - 1, 0), (0, 0))).astype(dtype)  # [B, T+2, F]
    cols = [
        jax.lax.slice(xp, (0, dt, 0), (b, dt + st * (t_out - 1) + 1, f), (1, st, 1))
        for dt in range(kt)
    ]
    xcat = jnp.concatenate(cols, axis=-1)  # [B, t_out, kt*F]
    y = jax.lax.dot_general(xcat.reshape(b * t_out, kt * f), w1, (((1,), (0,)), ((), ())))
    y = y + jnp.tile(bias.astype(dtype), f_out)
    return y.reshape(b, t_out, f_out, d)


def conv1_rg_apply(x, kernel, bias, dtype):
    """conv_0 as pair-reshape + ONE dense GEMM — zero strided ops.

    Every earlier lowering (banded-GEMM, 9-FMA, im2col) paid for stride-2
    slices over minor dims (lane/sublane relayouts). Here the T stride-2
    is a contiguous reshape [B, 2*(t_out+1), F] -> [B, t_out+1, 2F] plus one
    unit-stride shifted view (rows (2to,2to+1 | 2to+2,2to+3)); the F
    stride-2 + causal pad live inside the [4F, f_out*D] weight matrix built
    from the conv params at trace time (row block r = kernel dt=r, r=3
    zero). Dense-F duplication costs ~35x analytic FLOPs but the GEMM
    (M=B*t_out, K=4F, N=f_out*D) is pure MXU work (~47 GFLOP fwd ~ 0.25 ms
    at peak), and fwd+bwd touch only contiguous pads/reshapes/slices."""
    import jax
    import jax.numpy as jnp

    b, t, f, _ = x.shape
    kt, kf, _, d = kernel.shape
    st, sf = 2, 2
    t_out = (t + (kt - 1) - kt) // st + 1
    f_out = (f + (kf - 1) - kf) // sf + 1
    pad_r = 2 * (t_out + 1) - (t + kt - 1)
    xpt = jnp.pad(x[..., 0], ((0, 0), (kt - 1, pad_r), (0, 0))).astype(dtype)  # [B, 2*(t_out+1), F]
    v = xpt.reshape(b, t_out + 1, 2 * f)
    xcat = jnp.concatenate([v[:, :-1], v[:, 1:]], axis=-1)  # [B, t_out, 4F]
    p = np.zeros((kf, f, f_out), np.float32)
    for df in range(kf):
        for fo in range(f_out):
            src = sf * fo + df - (kf - 1)
            if 0 <= src < f:
                p[df, src, fo] = 1.0
    w4 = jnp.einsum("dsf,tdc->tsfc", jnp.asarray(p), kernel[:, :, 0, :].astype(jnp.float32))  # [kt, F, f_out, D]
    n_rows = 2 * ((kt - 1) // 2 + 1)  # view rows consumed per output: 4 for kt=3
    w4 = jnp.concatenate([w4, jnp.zeros((n_rows - kt, f, f_out, d), w4.dtype)], 0)
    w = w4.reshape(n_rows * f, f_out * d)
    y = jax.lax.dot_general(xcat.reshape(b * t_out, n_rows * f), w.astype(dtype), (((1,), (0,)), ((), ())))
    y = y + jnp.tile(bias.astype(dtype), f_out)
    return y.reshape(b, t_out, f_out, d)


def parity_rg():
    import jax.numpy as jnp

    kernel, bias = _conv1_params()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 101, F, 1)), jnp.float32)
    ref = np.asarray(_conv1_xla_apply(x, kernel, bias, jnp.float32))
    got = np.asarray(conv1_rg_apply(x, kernel, bias, jnp.float32))
    err = float(np.max(np.abs(ref - got)) / max(1e-9, float(np.max(np.abs(ref)))))
    print(json.dumps({"component": "parity_conv1_rg_f32", "rel_err": err, "ok": err < 1e-5, "shapes": [list(ref.shape), list(got.shape)]}), flush=True)


def conv1_rg():
    import jax.numpy as jnp

    return _grad_runner(lambda x, k, b: conv1_rg_apply(x, k, b, jnp.bfloat16), (B, TF, F, 1), _conv1_params())


def _conv1_params(seed=0):
    import jax
    import jax.numpy as jnp

    k = jax.random.normal(jax.random.PRNGKey(seed), (3, 3, 1, D), jnp.float32) * 0.2
    bias = jax.random.normal(jax.random.PRNGKey(seed + 1), (D,), jnp.float32) * 0.1
    return k, bias


def _conv1_xla_apply(x, kernel, bias, dtype):
    import jax

    return jax.lax.conv_general_dilated(
        x.astype(dtype),
        kernel.astype(dtype),
        window_strides=(2, 2),
        padding=((2, 0), (2, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias.astype(dtype)


def parity():
    import jax.numpy as jnp

    kernel, bias = _conv1_params()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 101, F, 1)), jnp.float32)
    ref = np.asarray(_conv1_xla_apply(x, kernel, bias, jnp.float32))
    got = np.asarray(conv1_gemm_apply(x, kernel, bias, jnp.float32))
    err = float(np.max(np.abs(ref - got)) / max(1e-9, float(np.max(np.abs(ref)))))
    print(json.dumps({"component": "parity_conv1_gemm_f32", "rel_err": err, "ok": err < 1e-5, "shapes": [list(ref.shape), list(got.shape)]}), flush=True)


def _grad_runner(apply_fn, x_shape, params):
    """fwd+bwd wrt params, K-scan like profile_components._stack_runner."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def multi(params, xs):
        def body(c, x):
            def loss_fn(p):
                return jnp.mean(apply_fn(x, *p).astype(jnp.float32))

            l, g = jax.value_and_grad(loss_fn)(params)
            return c, l + _gnorm(g)

        return jax.lax.scan(body, 0.0, xs)[1]

    def mk(seed):
        import jax

        return jax.random.normal(jax.random.PRNGKey(seed), (K,) + x_shape, jnp.bfloat16) * 0.1

    return _timeit(functools.partial(multi, params), mk)


def conv1_xla():
    import jax.numpy as jnp

    return _grad_runner(lambda x, k, b: _conv1_xla_apply(x, k, b, jnp.bfloat16), (B, TF, F, 1), _conv1_params())


def conv1_gemm():
    import jax.numpy as jnp

    return _grad_runner(lambda x, k, b: conv1_gemm_apply(x, k, b, jnp.bfloat16), (B, TF, F, 1), _conv1_params())


def conv1_fma_apply(x, kernel, bias, dtype):
    """conv_0 as 9 shifted broadcast FMAs: with C_in=1 and a 3x3 kernel the
    conv is sum_{dt,df} x[2to+dt-2, 2fo+df-2] * k[dt,df,0,:] — nine
    [B,t_out,f_out,1]x[D] broadcast multiply-accumulates that XLA can fuse
    into ONE elementwise pass over the [B,t_out,f_out,D] output. No MXU at
    all: the op is HBM-bound on its own 147 MB output, which is the floor."""
    import jax
    import jax.numpy as jnp

    b, t, f, _ = x.shape
    kt, kf, _, d = kernel.shape
    st, sf = 2, 2
    t_out = (t + (kt - 1) - kt) // st + 1
    f_out = (f + (kf - 1) - kf) // sf + 1
    xp = jnp.pad(x[..., 0], ((0, 0), (kt - 1, 0), (kf - 1, 0))).astype(dtype)  # [B, T+2, F+2]
    k = kernel.astype(dtype)
    out = None
    for dt in range(kt):
        for df in range(kf):
            sl = jax.lax.slice(
                xp, (0, dt, df), (b, dt + st * (t_out - 1) + 1, df + sf * (f_out - 1) + 1), (1, st, sf)
            )  # [B, t_out, f_out]
            term = sl[..., None] * k[dt, df, 0, :]
            out = term if out is None else out + term
    return out + bias.astype(dtype)


def parity_fma():
    import jax.numpy as jnp

    kernel, bias = _conv1_params()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 101, F, 1)), jnp.float32)
    ref = np.asarray(_conv1_xla_apply(x, kernel, bias, jnp.float32))
    got = np.asarray(conv1_fma_apply(x, kernel, bias, jnp.float32))
    err = float(np.max(np.abs(ref - got)) / max(1e-9, float(np.max(np.abs(ref)))))
    print(json.dumps({"component": "parity_conv1_fma_f32", "rel_err": err, "ok": err < 1e-5}), flush=True)


def conv1_fma():
    import jax.numpy as jnp

    return _grad_runner(lambda x, k, b: conv1_fma_apply(x, k, b, jnp.bfloat16), (B, TF, F, 1), _conv1_params())


def _conv2_params(seed=2):
    import jax
    import jax.numpy as jnp

    k = jax.random.normal(jax.random.PRNGKey(seed), (3, 3, D, D), jnp.float32) * 0.05
    bias = jnp.zeros((D,), jnp.float32)
    return k, bias


T2, F2 = (TF + 1) // 2, F // 2  # conv_0 output grid


def conv2_xla():
    import jax
    import jax.numpy as jnp

    def apply(x, k, b):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (2, 2), ((2, 0), (2, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b.astype(jnp.bfloat16)

    return _grad_runner(apply, (B, T2, F2, D), _conv2_params())


def conv2_im2col():
    import jax.numpy as jnp

    from tensorflowasr_tpu.models.layers.convolution import _conv2d_im2col

    def apply(x, k, b):
        return _conv2d_im2col(x, k, b, (2, 2), ((2, 0), (2, 0)), jnp.bfloat16)

    return _grad_runner(apply, (B, T2, F2, D), _conv2_params())


def bnswish():
    """Two train-mode BNs + swish at the two conv output shapes (no convs)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            x = nn.BatchNorm(use_running_average=not train, dtype=jnp.bfloat16, name="bn0")(x)
            x = nn.swish(x)
            x = x[:, ::2, ::2, :]
            x = nn.BatchNorm(use_running_average=not train, dtype=jnp.bfloat16, name="bn1")(x)
            return nn.swish(x)

    m = M()
    x0 = jnp.zeros((B, T2, F2, D), jnp.bfloat16)
    variables = m.init({"params": jax.random.PRNGKey(0)}, x0)

    import functools as ft

    @jax.jit
    def multi(params, xs):
        def body(c, x):
            def loss_fn(p):
                y, _ = m.apply({"params": p, "batch_stats": variables["batch_stats"]}, x, mutable=["batch_stats"])
                return jnp.mean(y.astype(jnp.float32))

            l, g = jax.value_and_grad(loss_fn)(params)
            return c, l + _gnorm(g)

        return jax.lax.scan(body, 0.0, xs)[1]

    def mk(seed):
        return jax.random.normal(jax.random.PRNGKey(seed), (K, B, T2, F2, D), jnp.bfloat16) * 0.1

    return _timeit(ft.partial(multi, variables["params"]), mk)


RUNNERS = {
    "parity": parity,
    "parity_fma": parity_fma,
    "parity_rg": parity_rg,
    "conv1_rg": conv1_rg,
    "conv1_xla": conv1_xla,
    "conv1_gemm": conv1_gemm,
    "conv1_fma": conv1_fma,
    "conv2_xla": conv2_xla,
    "conv2_im2col": conv2_im2col,
    "bnswish": bnswish,
}


def main():
    names = sys.argv[1:] or list(RUNNERS)
    global jax, jnp  # noqa: PLW0603
    import jax  # noqa: F401
    import jax.numpy as jnp  # noqa: F401

    for n in names:
        fn = RUNNERS[n]
        if n.startswith("parity"):
            fn()
            continue
        try:
            report(n, fn())
        except Exception as e:  # keep later components useful
            print(json.dumps({"component": n, "error": f"{type(e).__name__}: {e}"[:300]}), flush=True)


if __name__ == "__main__":
    main()
