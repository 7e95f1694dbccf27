"""Pretrained warm-start: by-name, shape-checked weight loading.

Reference parity: ``scripts/train.py:97-102`` loads
``learning_config.pretrained`` with Keras ``load_weights(...,
by_name=True, skip_mismatch=True)`` before training. Here the same
semantics over orbax artifacts: every leaf whose tree path exists in both
the checkpoint and the freshly-initialized params with an identical shape
is restored; everything else keeps its initialization (with a warning), so
a smaller/older checkpoint can seed a bigger model.

Accepted ``path`` layouts:
  - a ``scripts/save.py`` artifact (variables dict with "params"/...)
  - a Trainer checkpoint directory (numbered step subdirs of TrainState)
  - a bare params pytree checkpoint (e.g. the h5 converter's output)
"""

from __future__ import annotations

import logging
import os
from typing import Any, Tuple

import jax
import numpy as np

logger = logging.getLogger("tensorflowasr_tpu")


def _load_tree(path: str) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    # Trainer checkpoint dir: pick the latest numbered step
    if os.path.isdir(path):
        steps = [d for d in os.listdir(path) if d.isdigit()]
        if steps and not os.path.exists(os.path.join(path, "_METADATA")):
            candidate = os.path.join(path, str(max(int(s) for s in steps)))
            # orbax may nest the item under "default" or "state"
            if os.path.isdir(candidate):
                path = candidate
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path)


def _flatten(tree: Any) -> dict:
    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        flat[name] = leaf
    return flat


def merge_by_name(target: Any, source_flat: dict, scope: str = "") -> Tuple[Any, int, int]:
    """Return target with every same-named, same-shaped leaf replaced from
    ``source_flat``; (tree, n_loaded, n_skipped)."""
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(target)
    out, loaded, skipped = [], 0, 0
    for keypath, leaf in leaves_with_path:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        src = source_flat.get(scope + name)
        if src is not None and tuple(np.shape(src)) == tuple(np.shape(leaf)):
            out.append(jax.numpy.asarray(src, leaf.dtype))
            loaded += 1
        else:
            if src is not None:
                logger.warning("pretrained: shape mismatch at %s (%s vs %s) — skipped", name, np.shape(src), np.shape(leaf))
            skipped += 1
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out), loaded, skipped


def warm_start(state, path: str):
    """Load pretrained weights into a TrainState (params + batch_stats)."""
    tree = _load_tree(path)
    flat = _flatten(tree)
    # accept artifacts that nest the model weights under "params" (save.py
    # variables / TrainState) by trying that scope first
    scoped = {k[len("params/") :]: v for k, v in flat.items() if k.startswith("params/")}
    source = scoped or flat
    new_params, loaded, skipped = merge_by_name(state.params, source)
    if loaded == 0:
        raise ValueError(f"pretrained checkpoint at {path} shares no same-shaped weights with the model")
    new_bs = state.batch_stats
    bs_scoped = {k[len("batch_stats/") :]: v for k, v in flat.items() if k.startswith("batch_stats/")}
    if state.batch_stats and bs_scoped:
        new_bs, bl, _ = merge_by_name(state.batch_stats, bs_scoped)
        loaded += bl
    logger.info("pretrained warm start from %s: %d arrays loaded, %d kept from init", path, loaded, skipped)
    return state.replace(params=new_params, batch_stats=new_bs)
