"""Training loop: jit-compiled data-parallel train/eval steps + Trainer.

Replaces the reference's Keras trainer hybrid (``models/base_model.py:33-312``):
  - ``make_train_step``: value_and_grad over the model forward + CTC/RNN-T
    loss, gaussian weight noise (gwn, base_transducer.py:382-425) applied
    functionally (loss evaluated at params+noise, grads applied to params),
    BatchNorm batch_stats threading, optax update (incl. gradient
    accumulation via MultiSteps and gradient noise — base_model.py:185-209)
  - data parallelism: the step is jitted with parameters replicated and the
    batch sharded over the ``data`` mesh axis; XLA/GSPMD inserts the
    gradient all-reduce over ICI (strategy.run parity, base_model.py:252-276)
  - ``Trainer``: epoch/step loop with callbacks, orbax checkpointing and
    resume (BackupAndRestore parity, callbacks.py:243-263)
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Any, Callable, Iterable, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tensorflowasr_tpu import schemas
from tensorflowasr_tpu.ops.ctc_loss import ctc_loss_mean
from tensorflowasr_tpu.ops.rnnt_loss import rnnt_loss_mean
from tensorflowasr_tpu.parallel.sharding import batch_sharding, make_data_parallel_mesh, replicate, shard_batch

logger = logging.getLogger("tensorflowasr_tpu")


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, variables: dict, tx: optax.GradientTransformation, rng: jax.Array) -> "TrainState":
        params = variables["params"]
        return cls(
            step=jnp.zeros([], jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            rng=rng,
        )

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def _loss_for(model) -> Callable:
    """Pick the objective by model family (CTC vs Transducer) and
    implementation (XLA scan vs Pallas kernel, env TFASR_LOSS_IMPL)."""
    from tensorflowasr_tpu.models.transducer.base import Transducer
    from tensorflowasr_tpu.ops.losses import get_ctc_loss_fn, get_rnnt_loss_fn

    if isinstance(model, Transducer):
        return get_rnnt_loss_fn()
    return get_ctc_loss_fn()


def _apply_gwn(params, rng, gwn_config: Optional[dict]):
    """Gaussian weight noise: params + N(0, stddev) on selected top-level
    modules, gated by the caller on step (reference layer_util.py:41-58)."""
    if not gwn_config:
        return params
    stddev = float(gwn_config.get("stddev", 0.075))
    modules = gwn_config.get("modules")  # e.g. ["encoder", "prediction"]; None = all

    flat = flax.traverse_util.flatten_dict(params)
    keys = jax.random.split(rng, len(flat))
    out = {}
    for (path, leaf), k in zip(sorted(flat.items()), keys):
        if modules is None or path[0] in modules:
            out[path] = leaf + stddev * jax.random.normal(k, leaf.shape, leaf.dtype)
        else:
            out[path] = leaf
    return flax.traverse_util.unflatten_dict(out)


def _fused_joint_supported(model) -> bool:
    from tensorflowasr_tpu.models.transducer.base import Transducer

    if not isinstance(model, Transducer):
        return False
    jc = model.joint_config
    return (
        jc.get("joint_mode", "add") == "add"
        and jc.get("activation", "tanh") == "tanh"
        and not jc.get("postjoint_linear", False)
        and jc.get("prejoint_encoder_linear", True)
        and jc.get("prejoint_prediction_linear", True)
    )


def make_train_step(model, tx: optax.GradientTransformation, gwn_config: Optional[dict] = None) -> Callable:
    """Returns ``step_fn(state, batch: TrainData) -> (state, metrics)``.

    Loss dispatch (TFASR_LOSS_IMPL): "auto" (default) and "fused-joint" use
    the flash-RNN-T fused joint+loss kernel when the joint supports it —
    measured 21.0 ms vs 41.1 ms for the unfused joint+Pallas-DP block at
    Conformer-S bs16×16 s (round 3, after the U+1→16-multiple padding and
    TT=32 tiles) and it never materializes the [B,T,U+1,V] logits.
    "pallas" forces the unfused Pallas DP losses; "xla" the scan DPs.
    """
    use_fused_joint = (
        os.environ.get("TFASR_LOSS_IMPL", "auto").lower() in ("auto", "fused-joint")
        and _fused_joint_supported(model)
    )
    loss_fn_impl = None if use_fused_joint else _loss_for(model)
    gwn_step = int(gwn_config.get("step", 0)) if gwn_config else 0

    def step_fn(state: TrainState, batch: schemas.TrainData):
        rng = jax.random.fold_in(state.rng, state.step)
        k_drop, k_aug, k_gwn = jax.random.split(rng, 3)

        def loss_fn(params):
            if gwn_config:
                use_noise = state.step >= gwn_step
                noised = _apply_gwn(params, k_gwn, gwn_config)
                params_in = jax.tree_util.tree_map(lambda a, b: jnp.where(use_noise, b, a), params, noised)
            else:
                params_in = params
            variables = {"params": params_in}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            if use_fused_joint:
                # flash-RNN-T: forward stops at the prejoint features; the
                # fused kernel computes the joint + loss without ever
                # materializing the [B,T,U+1,V] logits in HBM
                from tensorflowasr_tpu.ops.pallas.joint_loss_kernel import rnnt_loss_fused_joint

                out = model.apply(
                    variables,
                    batch.inputs,
                    train=True,
                    rngs={"dropout": k_drop, "augment": k_aug},
                    mutable=mutable,
                    method=model.forward_joint_inputs,
                )
                if mutable:
                    (enc_p, pred_p, elens), mutated = out
                    new_batch_stats = mutated.get("batch_stats", {})
                else:
                    enc_p, pred_p, elens = out
                    new_batch_stats = state.batch_stats
                wv = params_in["joint"]["vocab"]["kernel"].astype(enc_p.dtype)
                bv = params_in["joint"]["vocab"]["bias"].astype(jnp.float32)
                elens = jnp.asarray(elens, jnp.int32)
                valid = elens > 0
                safe_t = jnp.maximum(elens, 1)
                safe_u = jnp.where(valid, jnp.asarray(batch.labels.labels_length, jnp.int32), 0)
                # reference base_loss.py:36 clamp, bounded by the array's T
                safe_t = jnp.minimum(jnp.maximum(safe_t, safe_u), enc_p.shape[1])
                per = rnnt_loss_fused_joint(enc_p, pred_p, wv, bv, safe_t, batch.labels.labels, safe_u)
                per = jnp.where(valid, per, 0.0)
                loss = jnp.sum(per) / jnp.maximum(jnp.sum(valid.astype(per.dtype)), 1.0)
                return loss, new_batch_stats
            out = model.apply(
                variables,
                batch.inputs,
                train=True,
                rngs={"dropout": k_drop, "augment": k_aug},
                mutable=mutable,
            )
            if mutable:
                out, mutated = out
                new_batch_stats = mutated.get("batch_stats", {})
            else:
                new_batch_stats = state.batch_stats
            loss = loss_fn_impl(out.logits, out.logits_length, batch.labels.labels, batch.labels.labels_length)
            return loss, new_batch_stats

        (loss, new_batch_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return step_fn


def make_eval_step(model) -> Callable:
    loss_fn_impl = _loss_for(model)

    def step_fn(state: TrainState, batch: schemas.TrainData):
        out = model.apply(state.variables(), batch.inputs, train=False)
        loss = loss_fn_impl(out.logits, out.logits_length, batch.labels.labels, batch.labels.labels_length)
        return {"loss": loss}

    return step_fn


class Trainer:
    """Epoch/step training orchestrator with DP sharding and checkpoints."""

    def __init__(
        self,
        model,
        optimizer: optax.GradientTransformation,
        mesh=None,
        gwn_config: Optional[dict] = None,
        checkpoint_dir: Optional[str] = None,
        keep_checkpoints: int = 5,
        callbacks: Optional[list] = None,
    ):
        self.model = model
        self.tx = optimizer
        self.mesh = mesh if mesh is not None else make_data_parallel_mesh()
        self.gwn_config = gwn_config
        self.callbacks = callbacks or []
        self.checkpoint_dir = checkpoint_dir
        self.keep_checkpoints = keep_checkpoints
        self._ckpt_mgr = None
        if checkpoint_dir:
            import orbax.checkpoint as ocp

            self._ckpt_mgr = ocp.CheckpointManager(
                os.path.abspath(checkpoint_dir),
                options=ocp.CheckpointManagerOptions(max_to_keep=keep_checkpoints, create=True),
            )

        self._train_step = jax.jit(
            make_train_step(model, self.tx, gwn_config),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(make_eval_step(model))
        self._rep = replicate(self.mesh)

    # ------------------------------ state mgmt ------------------------------ #

    def init_state(self, sample_batch: schemas.TrainData, seed: int = 42) -> TrainState:
        rng = jax.random.PRNGKey(seed)
        variables = self.model.init(
            {"params": rng, "dropout": rng, "augment": rng},
            sample_batch.inputs,
            train=False,
        )
        state = TrainState.create(variables, self.tx, rng)
        return jax.device_put(state, self._rep)

    def restore(self, state: TrainState) -> TrainState:
        if self._ckpt_mgr is None or self._ckpt_mgr.latest_step() is None:
            return state
        import orbax.checkpoint as ocp

        restored = self._ckpt_mgr.restore(self._ckpt_mgr.latest_step(), args=ocp.args.StandardRestore(jax.device_get(state)))
        logger.info("Restored checkpoint at step %s", self._ckpt_mgr.latest_step())
        return jax.device_put(restored, self._rep)

    def save(self, state: TrainState):
        if self._ckpt_mgr is None:
            return
        import orbax.checkpoint as ocp

        self._ckpt_mgr.save(int(state.step), args=ocp.args.StandardSave(jax.device_get(state)))
        self._ckpt_mgr.wait_until_finished()

    # -------------------------------- loops --------------------------------- #

    def train_step(self, state: TrainState, batch: schemas.TrainData):
        batch = shard_batch(batch, self.mesh)
        return self._train_step(state, batch)

    def eval_step(self, state: TrainState, batch: schemas.TrainData):
        batch = shard_batch(batch, self.mesh)
        return self._eval_step(state, batch)

    def fit(
        self,
        state: TrainState,
        train_data: Iterable,
        epochs: int = 1,
        steps_per_epoch: Optional[int] = None,
        eval_data: Optional[Iterable] = None,
        log_every: int = 100,
    ) -> TrainState:
        for cb in self.callbacks:
            cb.on_train_begin(self)
        stop = False
        for epoch in range(epochs):
            if stop:
                break
            for cb in self.callbacks:
                cb.on_epoch_begin(self, epoch)
            t0 = time.time()
            n = 0
            last_metrics = None
            for batch in train_data:
                state, metrics = self.train_step(state, batch)
                last_metrics = metrics  # device array; fetched lazily at epoch end
                n += 1
                if n % log_every == 0:
                    logger.info(
                        "epoch %d step %d loss %.4f (%.2f steps/s)",
                        epoch, n, float(metrics["loss"]), n / (time.time() - t0),
                    )
                for cb in self.callbacks:
                    cb.on_train_batch_end(self, state, metrics)
                    if getattr(cb, "stop_training", False):
                        stop = True
                if stop or (steps_per_epoch and n >= steps_per_epoch):
                    break
            logs = {"loss": float(last_metrics["loss"]) if last_metrics is not None else float("nan")}
            if eval_data is not None:
                losses = [float(self.eval_step(state, b)["loss"]) for b in eval_data]
                logs["val_loss"] = float(np.mean(losses)) if losses else float("nan")
                logger.info("epoch %d val_loss %.4f", epoch, logs["val_loss"])
            self.save(state)
            for cb in self.callbacks:
                cb.on_epoch_end(self, state, epoch, logs)
                if getattr(cb, "stop_training", False):
                    stop = True
        for cb in self.callbacks:
            cb.on_train_end(self, state)
        return state
