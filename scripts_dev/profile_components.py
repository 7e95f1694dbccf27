"""On-TPU component ablation: where do the 121 ms of the bs16 train step go?

Times each component fwd+bwd (train=True) by scanning K iterations inside
one jit call (per-call relay latency ~40-120 ms would otherwise dominate),
with distinct on-device inputs per step. Prints one JSON line per component
as it lands (compiles are slow and can wedge the remote worker — incremental
output keeps partial runs useful).

Usage: python scripts_dev/profile_components.py [name ...]
Names: train_auto train_fused backbone mhsa16 conv16 ff32 loss_unfused loss_fused
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B, T, D, H, DH = 16, 400, 144, 4, 36
U, V, J = 128, 256, 320
NSAMPLES = 16 * 16000
K = 6


def _timeit(fn, make_xs, n_rep=3):
    """fn(xs) -> scalar-ish; returns median seconds per scan element."""
    out = fn(make_xs(0))
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile+warm
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


def _x_batches(seed, shape, dtype):
    return jax.random.normal(jax.random.PRNGKey(seed), (K,) + shape, dtype) * 0.1


def run_train(fused: bool):
    from tensorflowasr_tpu import schemas
    from tensorflowasr_tpu.optimizers import build_optimizer
    from tensorflowasr_tpu.training import Trainer
    from tensorflowasr_tpu.training.trainer import make_train_step

    from __graft_entry__ import _conformer_small

    prev = os.environ.get("TFASR_LOSS_IMPL")
    os.environ["TFASR_LOSS_IMPL"] = "fused-joint" if fused else "auto"
    try:
        model = _conformer_small()
        tx = build_optimizer({"class_name": "Adam", "config": {"learning_rate": 1e-4}}, ga_steps=1)
        trainer = Trainer(model, tx)
        step_fn = make_train_step(model, tx)
    finally:
        if prev is None:
            os.environ.pop("TFASR_LOSS_IMPL", None)
        else:
            os.environ["TFASR_LOSS_IMPL"] = prev

    def make_batches(seed):
        kk = jax.random.split(jax.random.PRNGKey(seed), 3)
        return schemas.TrainData(
            inputs=schemas.TrainInput(
                inputs=jax.random.normal(kk[0], (K, B, NSAMPLES), jnp.float32) * 0.1,
                inputs_length=jnp.full((K, B), NSAMPLES, jnp.int32),
                predictions=jnp.pad(jax.random.randint(kk[1], (K, B, U), 1, V, jnp.int32), ((0, 0), (0, 0), (1, 0))),
                predictions_length=jnp.full((K, B), U + 1, jnp.int32),
            ),
            labels=schemas.TrainLabel(
                labels=jax.random.randint(kk[2], (K, B, U), 1, V, jnp.int32),
                labels_length=jnp.full((K, B), U, jnp.int32),
            ),
        )

    one = jax.tree.map(lambda x: x[0], make_batches(0))
    state = trainer.init_state(one)

    @jax.jit
    def multi(state, batches):
        def body(s, b):
            s2, m = step_fn(s, b)
            return s2, m["loss"]

        _, losses = jax.lax.scan(body, state, batches)
        return losses

    return _timeit(lambda xs: multi(state, xs), make_batches)


def run_backbone():
    """Frontend + encoder + prediction net + prejoint projections fwd+bwd
    (everything except the joint vocab GEMM and the loss)."""
    from tensorflowasr_tpu import schemas

    from __graft_entry__ import _conformer_small

    model = _conformer_small()

    def make_batches(seed):
        kk = jax.random.split(jax.random.PRNGKey(seed), 2)
        return schemas.TrainInput(
            inputs=jax.random.normal(kk[0], (K, B, NSAMPLES), jnp.float32) * 0.1,
            inputs_length=jnp.full((K, B), NSAMPLES, jnp.int32),
            predictions=jnp.pad(jax.random.randint(kk[1], (K, B, U), 1, V, jnp.int32), ((0, 0), (0, 0), (1, 0))),
            predictions_length=jnp.full((K, B), U + 1, jnp.int32),
        )

    one = jax.tree.map(lambda x: x[0], make_batches(0))
    variables = model.init({"params": jax.random.PRNGKey(0)}, one, train=False)
    params, bst = variables["params"], variables.get("batch_stats", {})

    @jax.jit
    def multi(params, bst, batches):
        def body(carry, ti):
            def loss_fn(p):
                (enc_p, pred_p, elens), mut = model.apply(
                    {"params": p, "batch_stats": bst},
                    ti,
                    train=True,
                    rngs={"dropout": jax.random.PRNGKey(1), "augment": jax.random.PRNGKey(2)},
                    mutable=["batch_stats"],
                    method=model.forward_joint_inputs,
                )
                return jnp.mean(enc_p.astype(jnp.float32)) + jnp.mean(pred_p.astype(jnp.float32))

            l, g = jax.value_and_grad(loss_fn)(params)
            gn = optax_global_norm(g)
            return carry, l + gn

        return jax.lax.scan(body, 0.0, batches)[1]

    return _timeit(lambda xs: multi(params, bst, xs), make_batches)


def optax_global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def _stack_runner(module, args_fn, mutable=(), shape=None):
    """Generic: module fwd+bwd on [B,T,D] inputs, K-scan."""
    shape = shape or (B, T, D)
    x0 = jnp.zeros(shape, jnp.bfloat16)
    variables = module.init({"params": jax.random.PRNGKey(0)}, *args_fn(x0), train=False)
    params = variables["params"]
    bst = variables.get("batch_stats", {})

    @jax.jit
    def multi(params, xs):
        def body(carry, x):
            def loss_fn(p):
                vs = {"params": p}
                if bst:
                    vs["batch_stats"] = bst
                out = module.apply(
                    vs, *args_fn(x), train=True, rngs={"dropout": jax.random.PRNGKey(1)}, mutable=list(mutable)
                )
                if mutable:
                    out = out[0]
                if isinstance(out, tuple):
                    out = out[0]
                return jnp.mean(out.astype(jnp.float32))

            l, g = jax.value_and_grad(loss_fn)(params)
            return carry, l + optax_global_norm(g)

        return jax.lax.scan(body, 0.0, xs)[1]

    return _timeit(functools.partial(multi, params), lambda i: _x_batches(i, shape, jnp.bfloat16))


def run_mhsa16():
    import flax.linen as nn

    from tensorflowasr_tpu.models.encoders.conformer import MHSAModule

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x, relpe, mask, train=False):
            cb = self.param("cb", nn.initializers.zeros, (H, DH), jnp.float32)
            pb = self.param("pb", nn.initializers.zeros, (H, DH), jnp.float32)
            for i in range(16):
                x, _ = MHSAModule(
                    dmodel=D, head_size=DH, num_heads=H, dropout=0.1, dtype=jnp.bfloat16, name=f"m{i}"
                )(x, relpe, mask=mask, content_attention_bias=cb, positional_attention_bias=pb, train=train)
            return x

    relpe = jax.random.normal(jax.random.PRNGKey(7), (B, 2 * T - 1, D), jnp.bfloat16)
    mask = jnp.ones((B, T), bool)
    return _stack_runner(Stack(), lambda x: (x, relpe, mask))


def run_conv16():
    import flax.linen as nn

    from tensorflowasr_tpu.models.encoders.conformer import ConvModule

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            for i in range(16):
                x = ConvModule(input_dim=D, kernel_size=31, dropout=0.1, dtype=jnp.bfloat16, name=f"c{i}")(x, train=train)
            return x

    return _stack_runner(Stack(), lambda x: (x,), mutable=("batch_stats",))


def run_ff32():
    import flax.linen as nn

    from tensorflowasr_tpu.models.encoders.conformer import FFModule

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            for i in range(32):
                x = FFModule(input_dim=D, dropout=0.1, dtype=jnp.bfloat16, name=f"f{i}")(x, train=train)
            return x

    return _stack_runner(Stack(), lambda x: (x,))


def run_frontend():
    """FeatureExtraction fwd+bwd on raw audio [B, NSAMPLES]."""
    from tensorflowasr_tpu.models.layers.feature_extraction import FeatureExtraction

    fe = FeatureExtraction(sample_rate=16000, frame_ms=25, stride_ms=10, nfft=512, num_feature_bins=80, dtype=jnp.bfloat16)
    x0 = jnp.zeros((B, NSAMPLES), jnp.float32)
    lens = jnp.full((B,), NSAMPLES, jnp.int32)
    variables = fe.init({"params": jax.random.PRNGKey(0)}, x0, lens)

    @jax.jit
    def multi(xs):
        def body(c, x):
            def loss_fn(x):
                feats, _ = fe.apply(variables, x, lens)
                return jnp.mean(feats.astype(jnp.float32))

            l, g = jax.value_and_grad(loss_fn)(x)
            return c, l + jnp.sum(jnp.square(g))

        return jax.lax.scan(body, 0.0, xs)[1]

    return _timeit(multi, lambda i: _x_batches(i, (B, NSAMPLES), jnp.float32))


def run_frontend_fwd(impl="xla"):
    """FeatureExtraction FORWARD only (as the train step pays it: no params
    upstream of the frontend, so autodiff never differentiates it)."""
    from tensorflowasr_tpu.models.layers.feature_extraction import FeatureExtraction

    prev = os.environ.get("TFASR_FRONTEND_IMPL")
    os.environ["TFASR_FRONTEND_IMPL"] = impl
    try:
        fe = FeatureExtraction(sample_rate=16000, frame_ms=25, stride_ms=10, nfft=512, num_feature_bins=80, dtype=jnp.bfloat16)
        x0 = jnp.zeros((B, NSAMPLES), jnp.float32)
        lens = jnp.full((B,), NSAMPLES, jnp.int32)
        variables = fe.init({"params": jax.random.PRNGKey(0)}, x0, lens)

        @jax.jit
        def multi(xs):
            def body(c, x):
                feats, _ = fe.apply(variables, x, lens)
                return c, jnp.mean(feats.astype(jnp.float32))

            return jax.lax.scan(body, 0.0, xs)[1]

        return _timeit(multi, lambda i: _x_batches(i, (B, NSAMPLES), jnp.float32))
    finally:
        if prev is None:
            os.environ.pop("TFASR_FRONTEND_IMPL", None)
        else:
            os.environ["TFASR_FRONTEND_IMPL"] = prev


def run_subsample(norm="batch", act="swish"):
    """Conv2dSubsampling (as in _conformer_small) + linear proj, fwd+bwd."""
    import flax.linen as nn

    from tensorflowasr_tpu.models.layers.subsampling import Conv2dSubsampling

    TF = NSAMPLES // 160 + 1  # frames

    class Sub(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x, _ = Conv2dSubsampling(
                filters=(D, D),
                kernels=((3, 3), (3, 3)),
                strides=((2, 2), (2, 2)),
                paddings=("causal", "causal"),
                norms=(norm, norm),
                activations=(act, act),
                dtype=jnp.bfloat16,
                name="sub",
            )(x, jnp.full((x.shape[0],), x.shape[1], jnp.int32), train=train)
            return nn.Dense(D, dtype=jnp.bfloat16, param_dtype=jnp.float32, name="linear")(x)

    return _stack_runner(Sub(), lambda x: (x,), mutable=("batch_stats",), shape=(B, TF, 80, 1))


def run_prednet():
    """Embedding + LSTM(320) + LN fwd+bwd over [B, U+1] tokens."""
    from tensorflowasr_tpu.models.transducer.base import TransducerPrediction

    pred = TransducerPrediction(
        blank=0, vocab_size=V, embed_dim=320, num_rnns=1, rnn_units=320, rnn_type="lstm", layer_norm=True, dtype=jnp.bfloat16
    )
    tok0 = jnp.zeros((B, U + 1), jnp.int32)
    lens = jnp.full((B,), U + 1, jnp.int32)
    variables = pred.init({"params": jax.random.PRNGKey(0)}, tok0, lens)
    params = variables["params"]

    @jax.jit
    def multi(params, xs):
        def body(c, tok):
            def loss_fn(p):
                y = pred.apply({"params": p}, tok, lens, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
                return jnp.mean(y.astype(jnp.float32))

            l, g = jax.value_and_grad(loss_fn)(params)
            return c, l + optax_global_norm(g)

        return jax.lax.scan(body, 0.0, xs)[1]

    def mk(seed):
        return jax.random.randint(jax.random.PRNGKey(seed), (K, B, U + 1), 0, V, jnp.int32)

    return _timeit(functools.partial(multi, params), mk)


def _loss_batches(seed):
    kk = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (
        jax.random.normal(kk[0], (K, B, T, J), jnp.bfloat16) * 0.5,
        jax.random.normal(kk[1], (K, B, U + 1, J), jnp.bfloat16) * 0.5,
        jax.random.randint(kk[2], (K, B, U), 1, V, jnp.int32),
    )


def run_loss(fused: bool):
    """Joint vocab GEMM + RNN-T loss fwd/bwd from prejoint features."""
    wv = jax.random.normal(jax.random.PRNGKey(3), (J, V), jnp.bfloat16) * 0.05
    bv = jnp.zeros((V,), jnp.float32)
    tl = jnp.full((B,), T, jnp.int32)
    ul = jnp.full((B,), U, jnp.int32)

    if fused:
        from tensorflowasr_tpu.ops.pallas.joint_loss_kernel import rnnt_loss_fused_joint

        def one(enc_p, pred_p, lab):
            def loss_fn(args):
                e, p, w, b = args
                per = rnnt_loss_fused_joint(e, p, w, b, tl, lab, ul)
                return jnp.mean(per)

            l, g = jax.value_and_grad(loss_fn)((enc_p, pred_p, wv, bv))
            return l + optax_global_norm(g)

    else:
        from tensorflowasr_tpu.ops.pallas.rnnt_kernel import rnnt_loss_pallas

        def one(enc_p, pred_p, lab):
            def loss_fn(args):
                e, p, w, b = args
                logits = jnp.tanh(e[:, :, None, :] + p[:, None, :, :])
                logits = (logits @ w).astype(jnp.float32) + b
                per = rnnt_loss_pallas(logits, tl, lab, ul)
                return jnp.mean(per)

            l, g = jax.value_and_grad(loss_fn)((enc_p, pred_p, wv, bv))
            return l + optax_global_norm(g)

    @jax.jit
    def multi(encs, preds, labs):
        def body(c, x):
            e, p, lab = x
            return c, one(e, p, lab)

        return jax.lax.scan(body, 0.0, (encs, preds, labs))[1]

    return _timeit(lambda xs: multi(*xs), _loss_batches)


def run_loss_split(which: str):
    """Split the fused loss leg: 'joint_fwd' = the tile kernel producing
    lpb/lpe/lse rows only; 'dp' = the RNN-T DP from precomputed rows
    (loss + occupancy grads in its one pass); 'fused_fwd' = full fused
    forward (joint kernel + DP), no backward."""
    wv = jax.random.normal(jax.random.PRNGKey(3), (J, V), jnp.bfloat16) * 0.05
    bv = jnp.zeros((V,), jnp.float32)
    tl = jnp.full((B,), T, jnp.int32)
    ul = jnp.full((B,), U, jnp.int32)

    from tensorflowasr_tpu.ops.pallas.joint_loss_kernel import _joint_logprobs, rnnt_loss_fused_joint
    from tensorflowasr_tpu.ops.pallas.rnnt_kernel import _rnnt_forward

    if which == "joint_fwd":
        def one(enc_p, pred_p, lab):
            lpb, lpe, lse = _joint_logprobs(enc_p, pred_p, wv, bv, lab, False)
            return jnp.sum(lpb) + jnp.sum(lpe) + jnp.sum(lse)

    elif which == "dp":
        def one(enc_p, pred_p, lab):
            # stand-in rows shaped like the joint kernel's output (values
            # don't affect the DP's control flow — static shapes)
            lpb = -jnp.abs(enc_p[..., :1]) * jnp.ones((1, 1, U + 1), jnp.float32)
            lpe = -jnp.abs(pred_p[:, None, :, 0]) * jnp.ones((1, T, 1), jnp.float32)
            loss, gbl, gem = _rnnt_forward(lpb.astype(jnp.float32), lpe.astype(jnp.float32), tl, ul, False)
            return jnp.sum(loss) + jnp.sum(gbl) + jnp.sum(gem)

    elif which == "fused_fwd":
        def one(enc_p, pred_p, lab):
            return jnp.sum(rnnt_loss_fused_joint(enc_p, pred_p, wv, bv, tl, lab, ul))

    else:
        raise ValueError(which)

    @jax.jit
    def multi(encs, preds, labs):
        def body(c, x):
            e, p, lab = x
            return c, one(e, p, lab)

        return jax.lax.scan(body, 0.0, (encs, preds, labs))[1]

    return _timeit(lambda xs: multi(*xs), _loss_batches)


RUNNERS = {
    "train_auto": lambda: run_train(False),
    "train_fused": lambda: run_train(True),
    "backbone": run_backbone,
    "frontend": run_frontend,
    "frontend_fwd": lambda: run_frontend_fwd("xla"),
    "frontend_fwd_pallas": lambda: run_frontend_fwd("pallas"),
    "subsample": run_subsample,
    "subsample_raw": lambda: run_subsample("none", "linear"),
    "prednet": run_prednet,
    "mhsa16": run_mhsa16,
    "conv16": run_conv16,
    "ff32": run_ff32,
    "loss_unfused": lambda: run_loss(False),
    "loss_fused": lambda: run_loss(True),
    "loss_joint_fwd": lambda: run_loss_split("joint_fwd"),
    "loss_dp": lambda: run_loss_split("dp"),
    "loss_fused_fwd": lambda: run_loss_split("fused_fwd"),
}

if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    globals()["jax"] = jax
    globals()["jnp"] = jnp
    names = sys.argv[1:] or list(RUNNERS)
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    for name in names:
        try:
            secs = RUNNERS[name]()
            report(name, secs)
        except Exception as e:
            print(json.dumps({"component": name, "error": f"{type(e).__name__}: {e}"[:500]}), flush=True)
