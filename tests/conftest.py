"""Test harness: run all tests on a virtual 8-device CPU backend.

This validates TPU sharding/collective code paths (same XLA code path)
without hardware, per the multi-chip dry-run contract.

Note: the environment may pre-register a TPU PJRT plugin at interpreter
start (sitecustomize importing jax), so plain env vars are too late — use
``jax.config.update`` which works post-import as long as no backend has
been initialized yet.
"""

import os

# CPU suite uses the XLA-scan losses (fast); the Pallas kernels have their
# own interpret-mode golden tests in test_pallas_kernels.py
os.environ.setdefault("TFASR_LOSS_IMPL", "xla")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("TFASR_TEST_PLATFORM", "cpu"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
