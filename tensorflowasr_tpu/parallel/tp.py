"""Tensor-parallel (vocab-sharded) transducer training over a 2-D mesh.

TPU-first extension beyond the reference's pure data parallelism
(``utils/env_util.py:57-98`` only offers Mirrored/TPUStrategy DP): the
transducer's dominant memory object is the joint logits ``[B, T, U+1, V]``
(gigabytes at production shapes — bs16x16s Conformer-S is 2.1 GB in bf16).
Sharding the joint's vocab projection column-wise over a ``model`` mesh
axis divides that tensor (and the vocab kernel + its gradient) across
chips: each device materializes only ``[B_local, T, U+1, V/m]``.

Everything is explicit ``shard_map`` SPMD:
  - per-shard logits → global log-sum-exp via pmax/psum (the softmax
    normalizer rides ICI, two small collectives on [B,T,U+1] tensors)
  - blank/label log-probs assembled from the owning shard via masked psum
  - the RNN-T DP (ops.rnnt_loss_from_logprobs / Pallas) runs replicated on
    the model axis — it is O(B·T·U) work on tensors 1/V-th the logits size
  - gradients: psum over ``data`` for all params, plus psum over ``model``
    for the replicated (non-vocab-sharded) params, whose per-shard grads
    are partial sums over the local vocab slice

``pp``/``sp``/``ep`` are intentionally absent: the reference family tops
out at ~30 M parameters (no pipeline pressure), long audio scales by
*streaming* chunk/memory attention (SURVEY §5 — true sequence parallelism
out of reference scope), and there are no MoE layers to expert-shard.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensorflowasr_tpu.utils.math_util import LOG_0

VOCAB_KERNEL_PATH = ("joint", "vocab", "kernel")
VOCAB_BIAS_PATH = ("joint", "vocab", "bias")


def make_dp_tp_mesh(n_model: int, devices: Optional[Sequence] = None) -> Mesh:
    """("data", "model") mesh: model axis innermost so vocab-shard collectives
    ride the fastest ICI links."""
    devices = np.array(devices if devices is not None else jax.devices())
    assert len(devices) % n_model == 0, f"{len(devices)} devices not divisible by model={n_model}"
    return Mesh(devices.reshape(len(devices) // n_model, n_model), ("data", "model"))


def _param_spec(path_leaf, mesh: Mesh):
    path = tuple(str(getattr(k, "key", k)) for k in path_leaf)
    if path[-3:] == VOCAB_KERNEL_PATH:
        return P(None, "model")
    if path[-3:] == VOCAB_BIAS_PATH:
        return P("model")
    return P()


def param_specs(params, mesh: Mesh):
    """PartitionSpec tree: vocab projection column-sharded, rest replicated."""
    return jax.tree_util.tree_map_with_path(lambda kp, x: _param_spec(kp, mesh), params)


def _spec_tree_for_state(state, mesh: Mesh):
    pspecs = param_specs(state.params, mesh)
    # optimizer state mirrors the param tree structure wherever it embeds
    # param-shaped leaves (Adam mu/nu); map by matching tree paths
    def opt_spec(path_leaf, leaf):
        path = tuple(str(getattr(k, "key", k)) for k in path_leaf)
        if path[-3:] == VOCAB_KERNEL_PATH and np.ndim(leaf) == 2:
            return P(None, "model")
        if path[-3:] == VOCAB_BIAS_PATH and np.ndim(leaf) == 1:
            return P("model")
        return P()

    ospecs = jax.tree_util.tree_map_with_path(opt_spec, state.opt_state)
    bspecs = jax.tree_util.tree_map(lambda x: P(), state.batch_stats)
    return state.replace(
        step=P(),
        params=pspecs,
        batch_stats=bspecs,
        opt_state=ospecs,
        rng=P(),
    )


def shard_tp_state(state, mesh: Mesh):
    """Place a TrainState on the mesh with the vocab projection sharded."""
    specs = _spec_tree_for_state(state, mesh)
    return jax.tree_util.tree_map(lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _psum_rep(x, axis: str):
    """All-reduce whose output is consumed identically on every rank of
    ``axis`` (the loss is counted once, not per rank). The mathematically
    correct VJP is then the IDENTITY — each rank keeps its own cotangent.
    JAX's default transpose under ``check_vma=False`` is psum-again, which
    multiplies cotangents by the axis size and breaks every gradient
    flowing through the collective."""
    return jax.lax.psum(x, axis)


def _psum_rep_fwd(x, axis):
    return jax.lax.psum(x, axis), None


def _psum_rep_bwd(axis, _, t):
    return (t,)


_psum_rep.defvjp(_psum_rep_fwd, _psum_rep_bwd)


def tp_rnnt_loss(local_logits, logit_length, labels, label_length, vocab_size: int, axis: str = "model"):
    """RNN-T loss over vocab-sharded logits ``[B, T, U+1, V/m]`` inside
    shard_map. Returns per-example loss (replicated across the model axis)."""
    from tensorflowasr_tpu.ops.pallas.rnnt_kernel import rnnt_loss_from_logprobs as lp_loss

    rank = jax.lax.axis_index(axis)
    v_local = local_logits.shape[-1]
    offset = rank * v_local
    x = local_logits.astype(jnp.float32)

    # global LSE: pmax for the max, psum for the exp-sum. The max is only a
    # numerical-stability shift (LSE value and gradient are invariant to
    # it), so stop_gradient both makes it exact and sidesteps pmax's
    # missing differentiation rule.
    local_max = jax.lax.stop_gradient(jnp.max(x, axis=-1))
    gmax = jax.lax.pmax(local_max, axis)
    sumexp = jnp.sum(jnp.exp(x - gmax[..., None]), axis=-1)
    lse = gmax + jnp.log(_psum_rep(sumexp, axis))  # [B,T,U1]

    # blank (global id 0) lives on shard 0
    blank_local = jnp.where(rank == 0, x[..., 0], 0.0)
    lp_blank = _psum_rep(blank_local, axis) - lse

    # label logits: each global id y ∈ [0, V) is owned by exactly one shard
    labels = labels.astype(jnp.int32)
    local_id = labels - offset  # [B, U]
    owned = (local_id >= 0) & (local_id < v_local)
    onehot = jax.nn.one_hot(jnp.where(owned, local_id, 0), v_local, dtype=x.dtype) * owned[..., None]
    max_u = x.shape[2] - 1
    # sel[b,t,u] = Σ_v x[b,t,u,v]·onehot[b,u,v] as a batched GEMM over (B,U)
    # contracting V (MXU) — NOT a [B,T,U,V] broadcast-multiply, which the
    # target TPU compiler handles pathologically at scale (see
    # ops/pallas/ctc_kernel._prep and CLAUDE.md platform notes)
    sel_local = jax.lax.dot_general(
        x[:, :, :max_u, :], onehot, (((3,), (2,)), ((0, 2), (0, 1)))
    )  # [B, U, T]
    sel_local = jnp.swapaxes(sel_local, 1, 2)  # [B, T, U]
    sel = _psum_rep(sel_local, axis)
    lp_emit = jnp.pad(sel - lse[:, :, :max_u], ((0, 0), (0, 0), (0, 1)), constant_values=LOG_0)

    return lp_loss(lp_blank, lp_emit, logit_length, label_length)


def make_tp_train_step(model, tx: optax.GradientTransformation, mesh: Mesh):
    """shard_map train step over ("data", "model"): batch data-sharded,
    joint vocab projection model-sharded, everything else replicated.

    Returns ``step_fn(state, batch) -> (state, metrics)`` (call with a
    host batch; it is placed and jitted internally).
    """
    from jax import shard_map  # jax.experimental.shard_map is deprecated in v0.8

    from tensorflowasr_tpu.training.trainer import TrainState  # noqa: F401 (type)

    vocab_size = model.vocab_size
    n_model = mesh.shape["model"]
    assert vocab_size % n_model == 0, f"vocab {vocab_size} not divisible by model axis {n_model}"
    # local model: joint output features = the vocab shard; embeddings and
    # everything else keep the GLOBAL vocab (labels are global ids)
    local_model = model.clone(joint_config={**model.joint_config, "vocab_size": vocab_size // n_model})

    def spmd_step(state, batch):
        model = local_model
        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            rng = jax.random.fold_in(state.rng, state.step)
            out = model.apply(
                variables,
                batch.inputs,
                train=True,
                rngs={"dropout": rng, "augment": rng},
                mutable=mutable,
            )
            if mutable:
                out, mutated = out
                new_bs = mutated.get("batch_stats", {})
            else:
                new_bs = state.batch_stats
            # reference base_loss.py:36 clamp (same as ops/losses.masked_mean)
            ul = jnp.asarray(batch.labels.labels_length, jnp.int32)
            tl = jnp.minimum(
                jnp.maximum(jnp.asarray(out.logits_length, jnp.int32), ul), out.logits.shape[1]
            )
            per = tp_rnnt_loss(out.logits, tl, batch.labels.labels, ul, vocab_size)
            valid = jnp.asarray(batch.inputs.inputs_length, jnp.int32) > 0
            per = jnp.where(valid, per, 0.0)
            loss = jnp.sum(per) / jnp.maximum(jnp.sum(valid.astype(per.dtype)), 1.0)
            # mean over the data axis (each data shard holds B/d rows)
            loss = jax.lax.pmean(loss, "data")
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        # all-reduce: data axis for everything; model axis only for params
        # whose gradient is a partial sum over the local vocab slice
        def reduce_grad(path_leaf, g):
            path = tuple(str(getattr(k, "key", k)) for k in path_leaf)
            g = jax.lax.pmean(g, "data")
            if path[-3:] in (VOCAB_KERNEL_PATH, VOCAB_BIAS_PATH):
                return g
            return jax.lax.psum(g, "model")

        grads = jax.tree_util.tree_map_with_path(reduce_grad, grads)
        new_bs = jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, "data"), new_bs)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # grad_norm must be identical on every rank: the vocab kernel/bias
        # grads are per-shard slices, so their squared norms are psum'd over
        # the model axis before combining with the replicated leaves
        def sq_norm(path_leaf, g):
            path = tuple(str(getattr(k, "key", k)) for k in path_leaf)
            s = jnp.sum(jnp.square(g.astype(jnp.float32)))
            if path[-3:] in (VOCAB_KERNEL_PATH, VOCAB_BIAS_PATH):
                return jax.lax.psum(s, "model")
            return s

        sq = jax.tree_util.tree_map_with_path(sq_norm, grads)
        grad_norm = jnp.sqrt(sum(jax.tree_util.tree_leaves(sq)))
        metrics = {"loss": loss, "grad_norm": grad_norm}
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs, opt_state=new_opt
        )
        return new_state, metrics

    def batch_specs(batch):
        return jax.tree_util.tree_map(lambda x: P("data"), batch)

    cache = {}

    def step(state, batch):
        key = (jax.tree_util.tree_structure(state), jax.tree_util.tree_structure(batch))
        if key not in cache:
            state_specs = _spec_tree_for_state(state, mesh)
            bspecs = batch_specs(batch)
            fn = shard_map(
                spmd_step,
                mesh=mesh,
                in_specs=(state_specs, bspecs),
                out_specs=(state_specs, {"loss": P(), "grad_norm": P()}),
                check_vma=False,
            )
            cache[key] = jax.jit(fn, donate_argnums=(0,))
        return cache[key](state, batch)

    return step
