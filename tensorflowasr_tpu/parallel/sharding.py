"""SPMD sharding helpers: data-parallel mesh + named shardings.

The TPU-native replacement for the reference's distribution strategies
(``utils/env_util.py:57-98``, MirroredStrategy/TPUStrategy): a 1-D ``data``
mesh, batches sharded along it, parameters replicated. Gradient all-reduce
over ICI is emitted by XLA from the jit-compiled training step (GSPMD) —
no explicit collectives needed for DP. Extra mesh axes ("model") are
accepted for tensor-parallel extensions.

Multi-host (pod) support: on a multi-process runtime (``jax.distributed``
initialized on Cloud TPU pods), each process feeds only its local share of
the global batch — ``shard_batch`` assembles the global ``jax.Array`` from
process-local data (``make_array_from_process_local_data``), and the
dataset layer splits manifests per process (datasets.py,
``shard_across_processes`` — the reference's tf.data auto-shard DATA
policy, reference ``datasets.py:498``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_count() -> int:
    """Number of participating host processes (1 unless jax.distributed)."""
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def make_data_parallel_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = np.array(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis_name,))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host pytree batch onto the mesh, sharded along axis 0.

    Single-process: plain ``device_put`` with the batch sharding.
    Multi-process (pod): ``batch`` is this process's LOCAL slice of the
    global batch; the global array is assembled across hosts without any
    data transfer beyond each host's own devices.

    Batches whose leading dim is not divisible by the local device count
    are zero-padded up to it (padded examples carry zero lengths, which the
    masked-mean losses exclude — see ops/losses.py).
    """
    sharding = batch_sharding(mesh, axis_name)
    n = mesh.shape[axis_name]
    n_local = max(1, n // jax.process_count()) if jax.process_count() > 1 else n
    leaves = [x for x in jax.tree_util.tree_leaves(batch) if x is not None and np.ndim(x) > 0]
    if any(x.shape[0] % n_local != 0 for x in leaves):
        global _WARNED_INDIVISIBLE
        if not _WARNED_INDIVISIBLE:
            import logging

            logging.getLogger("tensorflowasr_tpu").warning(
                "batch size not divisible by %d devices — zero-padding the batch (padded rows are masked out of the loss)",
                n_local,
            )
            _WARNED_INDIVISIBLE = True
        batch = pad_batch_to_devices(batch, n_local)

    multihost = jax.process_count() > 1

    def put(x):
        if x is None:
            return None
        if np.ndim(x) == 0:
            return jax.device_put(x, replicate(mesh))
        if multihost:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


_WARNED_INDIVISIBLE = False


def pad_batch_to_devices(batch, n_devices: int):
    """Pad the batch dim to a multiple of the mesh size (partial final batch)."""

    def pad(x):
        if x is None or np.ndim(x) == 0:
            return x
        b = x.shape[0]
        target = -(-b // n_devices) * n_devices
        if target == b:
            return x
        pads = [(0, target - b)] + [(0, 0)] * (np.ndim(x) - 1)
        return np.pad(np.asarray(x), pads)

    return jax.tree_util.tree_map(pad, batch)
