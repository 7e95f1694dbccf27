"""Runtime/environment bootstrap for TPU-native training.

JAX-native equivalent of the reference's ``tensorflow_asr/utils/env_util.py``:
device discovery and mesh construction replace ``setup_strategy``
(env_util.py:88), dtype policy selection replaces ``setup_mxp`` (:109), and
global seeding replaces ``setup_seed`` (:147).
"""

from __future__ import annotations

import logging
import os
import random
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("tensorflowasr_tpu")


def setup_logging(level: int = logging.INFO) -> logging.Logger:
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("%(asctime)s [%(levelname)s] %(name)s: %(message)s", datefmt="%Y-%m-%dT%H:%M:%S"))
        logger.addHandler(handler)
    logger.setLevel(level)
    return logger


def setup_seed(seed: int = 42) -> jax.Array:
    """Seed python/numpy RNGs and return the root jax PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def setup_check_numerics(env_var: str = "TFASR_CHECK_NUMERICS") -> bool:
    """Enable NaN/Inf trapping inside jitted code when ``TFASR_CHECK_NUMERICS``
    is truthy — the JAX-native equivalent of the reference's
    ``tf.debugging.enable_check_numerics`` gated on ``TF_ENABLE_CHECK_NUMERIC``
    (reference utils/env_util.py:25,48-49). Complements the TerminateOnNaN
    callback: this traps at the failing op, the callback at the step level."""
    if os.environ.get(env_var, "").lower() in ("1", "true", "yes"):
        jax.config.update("jax_debug_nans", True)
        jax.config.update("jax_debug_infs", True)
        logger.info("check-numerics enabled (jax_debug_nans + jax_debug_infs)")
        return True
    return False


def has_devices(kind: str = "tpu") -> bool:
    try:
        return any(d.platform.lower().startswith(kind.lower()) for d in jax.devices())
    except RuntimeError:
        return False


def num_devices() -> int:
    return jax.device_count()


def setup_mesh(axis_names: Sequence[str] = ("data",), shape: Sequence[int] | None = None) -> jax.sharding.Mesh:
    """Build a device mesh for SPMD training.

    Default is a 1-D data-parallel mesh over all devices — the parity point
    with the reference's MirroredStrategy/TPUStrategy (env_util.py:57-98):
    gradients all-reduce over ICI via XLA-inserted collectives. Extra axes
    (e.g. ("data", "model")) enable tensor-parallel extensions.
    """
    devices = np.array(jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    mesh_devices = devices.reshape(shape)
    return jax.sharding.Mesh(mesh_devices, axis_names)


def setup_mxp(policy: str = "strict") -> jnp.dtype:
    """Pick the compute dtype.

    Reference parity (env_util.py:109-144): "strict" = bfloat16 compute on
    TPU (mixed_bfloat16), "auto" = bfloat16 on TPU / float32 elsewhere,
    "none" = float32. Parameters always stay float32; this only selects the
    activation/compute dtype threaded through the models.
    """
    policy = (policy or "none").lower()
    if policy in ("strict", "mxp", "mixed_bfloat16"):
        return jnp.bfloat16
    if policy in ("auto", "strict_auto"):
        return jnp.bfloat16 if has_devices("tpu") else jnp.float32
    return jnp.float32


def cpu_offline_backend(n: int = 8) -> None:
    """Force a virtual n-device CPU backend (call before any jax use).

    Used by tests and ``dryrun_multichip`` to validate multi-chip sharding
    without TPU hardware.
    """
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + f" --xla_force_host_platform_device_count={n}"
