"""Loss implementation dispatch: XLA scan (default) vs Pallas kernels.

Selection (reference's env-toggle pattern, ``TFASR_USE_TF_CTC`` etc.):
  - env ``TFASR_LOSS_IMPL`` in {"xla", "pallas"} — default "xla"
  - the Pallas kernels are exact (golden-tested vs the XLA versions) and
    keep alpha/beta in VMEM; flip the env to benchmark/serve from them
"""

from __future__ import annotations

import os

from tensorflowasr_tpu.ops.ctc_loss import ctc_loss, ctc_loss_mean
from tensorflowasr_tpu.ops.rnnt_loss import rnnt_loss, rnnt_loss_mean


def _impl() -> str:
    return os.environ.get("TFASR_LOSS_IMPL", "xla").lower()


def get_ctc_loss_fn():
    if _impl() == "pallas":
        from tensorflowasr_tpu.ops.pallas.ctc_kernel import ctc_loss_pallas_mean

        return ctc_loss_pallas_mean
    return ctc_loss_mean


def get_rnnt_loss_fn():
    if _impl() == "pallas":
        from tensorflowasr_tpu.ops.pallas.rnnt_kernel import rnnt_loss_pallas_mean

        return rnnt_loss_pallas_mean
    return rnnt_loss_mean
