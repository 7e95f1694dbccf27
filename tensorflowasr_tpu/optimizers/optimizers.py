"""Optimizer construction from reference-style configs, on optax.

Covers the reference's training machinery
(``tensorflow_asr/optimizers/``, ``models/base_model.py:102-209``):
  - optimizer_config {class_name: Adam/AdamW/SGD/..., config: {...}} with a
    schedule-valued learning_rate
  - gradient accumulation (``accumulation.py:10-70``) via optax.MultiSteps
  - gradient noise (gradn, ``utils/math_util.py:367`` + base_model.py:185)
    via optax.add_noise-style transform gated on a start step
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from tensorflowasr_tpu.optimizers.schedules import build_schedule


def _adam_like(cfg: dict, factory):
    lr = build_schedule(cfg.pop("learning_rate", 1e-3))
    kwargs = dict(
        b1=cfg.pop("beta_1", 0.9),
        b2=cfg.pop("beta_2", 0.999),
        eps=cfg.pop("epsilon", 1e-7),
    )
    weight_decay = cfg.pop("weight_decay", None)
    if weight_decay:
        return optax.adamw(lr, weight_decay=float(weight_decay), **kwargs)
    return factory(lr, **kwargs)


def build_base_optimizer(optimizer_config: dict) -> optax.GradientTransformation:
    cfg = dict(optimizer_config or {})
    name = cfg.pop("class_name", "Adam")
    conf = dict(cfg.pop("config", {}))
    name = name.split(">")[-1].lower()
    if name in ("adam", "adamw"):
        return _adam_like(conf, optax.adam)
    if name == "sgd":
        lr = build_schedule(conf.pop("learning_rate", 1e-2))
        return optax.sgd(lr, momentum=conf.pop("momentum", 0.0), nesterov=conf.pop("nesterov", False))
    if name == "rmsprop":
        lr = build_schedule(conf.pop("learning_rate", 1e-3))
        return optax.rmsprop(lr, decay=conf.pop("rho", 0.9), eps=conf.pop("epsilon", 1e-7), momentum=conf.pop("momentum", 0.0))
    if name == "adadelta":
        lr = build_schedule(conf.pop("learning_rate", 1.0))
        return optax.adadelta(lr, rho=conf.pop("rho", 0.95), eps=conf.pop("epsilon", 1e-7))
    raise KeyError(f"Unknown optimizer {name!r}")


def gradient_noise(gamma: float = 0.55, eta: float = 1.0, start_step: int = 0) -> optax.GradientTransformation:
    """Time-decaying gaussian gradient noise (Neelakantan et al. 2015).

    stddev² = eta / (1 + step)^gamma, applied only after ``start_step``
    (reference ``optimizers/regularizers.py:7-50`` + base_model.py:185-191).
    """

    def init_fn(params):
        del params
        return {"count": jnp.zeros([], jnp.int32), "key": jax.random.PRNGKey(42)}

    def update_fn(updates, state, params=None):
        del params
        count = state["count"]
        key, subkey = jax.random.split(state["key"])
        stddev = jnp.sqrt(eta / jnp.power(1.0 + count.astype(jnp.float32), gamma))
        leaves, treedef = jax.tree_util.tree_flatten(updates)
        keys = jax.random.split(subkey, len(leaves))
        active = (count >= start_step).astype(jnp.float32)

        noised = [l + active * stddev * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)]
        return jax.tree_util.tree_unflatten(treedef, noised), {"count": count + 1, "key": key}

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(
    optimizer_config: dict,
    ga_steps: Optional[int] = None,
    gradn_config: Optional[dict] = None,
    clip_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """Full training transformation: [clip] → [gradn] → optimizer → [GA]."""
    chain = []
    if clip_norm:
        chain.append(optax.clip_by_global_norm(clip_norm))
    if gradn_config:
        chain.append(
            gradient_noise(
                gamma=gradn_config.get("gamma", 0.55),
                eta=gradn_config.get("eta", 1.0),
                start_step=gradn_config.get("step_start", gradn_config.get("start_step", 0)),
            )
        )
    chain.append(build_base_optimizer(optimizer_config))
    tx = optax.chain(*chain) if len(chain) > 1 else chain[0]
    if ga_steps and ga_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=ga_steps)
    return tx
