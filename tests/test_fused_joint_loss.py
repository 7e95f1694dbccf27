"""Fused joint+RNN-T-loss kernel vs the unfused composition: exact parity.

Reference semantics: logits = tanh(enc_p[:,t,None]+pred_p[:,None,u]) @ Wv
+ bv fed to the standard RNN-T loss. The fused path must match the loss
value and the gradients of all four differentiable inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu.ops.pallas.joint_loss_kernel import rnnt_loss_fused_joint
from tensorflowasr_tpu.ops.rnnt_loss import rnnt_loss


def _case(seed=0, B=2, T=6, U=3, J=5, V=7):
    r = np.random.default_rng(seed)
    enc_p = jnp.asarray(r.standard_normal((B, T, J)), jnp.float32)
    pred_p = jnp.asarray(r.standard_normal((B, U + 1, J)), jnp.float32)
    wv = jnp.asarray(r.standard_normal((J, V)) * 0.7, jnp.float32)
    bv = jnp.asarray(r.standard_normal((V,)) * 0.1, jnp.float32)
    labels = jnp.asarray(r.integers(1, V, (B, U)), jnp.int32)
    tl = jnp.asarray([max(1, T - (i % 3)) for i in range(B)], jnp.int32)
    ul = jnp.asarray([max(0, U - (i % 2)) for i in range(B)], jnp.int32)
    return enc_p, pred_p, wv, bv, labels, tl, ul


def _ref_loss(enc_p, pred_p, wv, bv, labels, tl, ul):
    logits = jnp.tanh(enc_p[:, :, None, :] + pred_p[:, None, :, :]) @ wv + bv
    return rnnt_loss(logits, tl, labels, ul)


@pytest.mark.parametrize("shape", [dict(), dict(B=3, T=9, U=5, J=8, V=12), dict(B=1, T=4, U=2, J=3, V=5)])
def test_fused_joint_loss_value(shape):
    enc_p, pred_p, wv, bv, labels, tl, ul = _case(**shape)
    ref = _ref_loss(enc_p, pred_p, wv, bv, labels, tl, ul)
    got = rnnt_loss_fused_joint(enc_p, pred_p, wv, bv, tl, labels, ul)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_joint_loss_grads():
    enc_p, pred_p, wv, bv, labels, tl, ul = _case(seed=1)

    def mean_ref(e, p, w, b):
        return jnp.mean(_ref_loss(e, p, w, b, labels, tl, ul))

    def mean_fused(e, p, w, b):
        return jnp.mean(rnnt_loss_fused_joint(e, p, w, b, tl, labels, ul))

    ref_grads = jax.grad(mean_ref, argnums=(0, 1, 2, 3))(enc_p, pred_p, wv, bv)
    got_grads = jax.grad(mean_fused, argnums=(0, 1, 2, 3))(enc_p, pred_p, wv, bv)
    for name, rg, gg in zip(("enc_p", "pred_p", "wv", "bv"), ref_grads, got_grads):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(rg), rtol=2e-4, atol=1e-6, err_msg=name)


def test_fused_joint_loss_bf16_parity():
    """bf16 branch golden (ADVICE r4): the kernel's add+tanh runs in bf16 for
    bf16 inputs — pin value+grad parity vs the unfused bf16 composition at
    loose tolerance (both sides share the same bf16 activation numerics)."""
    enc_p, pred_p, wv, bv, labels, tl, ul = _case(seed=3, B=2, T=6, U=3, J=8, V=8)
    e, p, w, b = (x.astype(jnp.bfloat16) for x in (enc_p, pred_p, wv, bv))

    def mean_ref(e, p, w, b):
        return jnp.mean(_ref_loss(e, p, w, b, labels, tl, ul))

    def mean_fused(e, p, w, b):
        return jnp.mean(rnnt_loss_fused_joint(e, p, w, b, tl, labels, ul))

    ref = mean_ref(e, p, w, b)
    got = mean_fused(e, p, w, b)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=0.05, atol=0.05)

    ref_grads = jax.grad(mean_ref, argnums=(0, 1, 2, 3))(e, p, w, b)
    got_grads = jax.grad(mean_fused, argnums=(0, 1, 2, 3))(e, p, w, b)
    for name, rg, gg in zip(("enc_p", "pred_p", "wv", "bv"), ref_grads, got_grads):
        np.testing.assert_allclose(
            np.asarray(gg, np.float32), np.asarray(rg, np.float32), rtol=0.1, atol=0.02, err_msg=name
        )


def test_fused_joint_loss_nonuniform_weighting():
    """Per-example upstream cotangents flow through the custom VJP."""
    enc_p, pred_p, wv, bv, labels, tl, ul = _case(seed=2)
    w = jnp.asarray([0.3, 1.7])

    def weighted_ref(e):
        return jnp.sum(_ref_loss(e, pred_p, wv, bv, labels, tl, ul) * w)

    def weighted_fused(e):
        return jnp.sum(rnnt_loss_fused_joint(e, pred_p, wv, bv, tl, labels, ul) * w)

    rg = jax.grad(weighted_ref)(enc_p)
    gg = jax.grad(weighted_fused)(enc_p)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(rg), rtol=2e-4, atol=1e-6)


@pytest.mark.slow
def test_train_step_fused_joint_matches_default(monkeypatch):
    """A full train step with TFASR_LOSS_IMPL=fused-joint == the default
    (unfused Pallas loss) step: same loss, same updated params."""
    import flax

    from tensorflowasr_tpu import schemas
    from tensorflowasr_tpu.optimizers import build_optimizer
    from tensorflowasr_tpu.training import Trainer
    from tests.test_parallel import _tiny_transducer, _tp_batch

    model = _tiny_transducer()
    batch = _tp_batch(8, identical_rows=False)
    tx = build_optimizer({"class_name": "SGD", "config": {"learning_rate": 1e-2}})

    monkeypatch.setenv("TFASR_LOSS_IMPL", "auto")
    trainer = Trainer(model, tx)
    state = trainer.init_state(batch, seed=11)
    p0 = jax.device_get(state.params)
    bs0 = jax.device_get(state.batch_stats)
    state2, metrics = trainer.train_step(state, batch)
    ref_loss = float(metrics["loss"])
    ref_params = flax.traverse_util.flatten_dict(jax.device_get(state2.params))

    monkeypatch.setenv("TFASR_LOSS_IMPL", "fused-joint")
    from tensorflowasr_tpu.training.trainer import TrainState

    trainer2 = Trainer(model, tx)
    st = TrainState.create({"params": p0, "batch_stats": bs0}, tx, jax.random.PRNGKey(11))
    st2, m2 = trainer2.train_step(st, batch)
    fused_loss = float(m2["loss"])

    np.testing.assert_allclose(fused_loss, ref_loss, rtol=1e-5, atol=1e-5)
    got_params = flax.traverse_util.flatten_dict(jax.device_get(st2.params))
    for k in ref_params:
        np.testing.assert_allclose(got_params[k], ref_params[k], rtol=2e-4, atol=1e-6, err_msg="/".join(k))
