"""Loss implementation dispatch: Pallas kernels (default, shape-guarded) vs
XLA scan.

Selection via env ``TFASR_LOSS_IMPL`` (reference's env-toggle pattern,
``TFASR_USE_TF_CTC`` etc.):
  - "auto" (default): the Pallas fused forward-backward kernels — exact
    (golden-tested) and ~4× faster full train steps — except at the one
    shape region where the axon TPU stack crashes (B ≥ 3 with T+U ≥ 550 and
    U ≥ 128 simultaneously; see CLAUDE.md), which falls back to the XLA scan
  - "pallas": force the kernels everywhere
  - "xla": force the scan DPs everywhere
"""

from __future__ import annotations

import os

from tensorflowasr_tpu.ops.ctc_loss import ctc_loss, ctc_loss_mean
from tensorflowasr_tpu.ops.rnnt_loss import rnnt_loss, rnnt_loss_mean


def _impl() -> str:
    return os.environ.get("TFASR_LOSS_IMPL", "auto").lower()


def _rnnt_pallas_safe(logits) -> bool:
    """Static-shape guard for the known axon-platform crash region."""
    b, t, u1, _ = logits.shape
    u1p = -(-u1 // 128) * 128
    return not (b >= 3 and (t + u1) >= 550 and u1p > 128)


def get_ctc_loss_fn():
    impl = _impl()
    if impl in ("pallas", "auto"):
        from tensorflowasr_tpu.ops.pallas.ctc_kernel import ctc_loss_pallas_mean

        return ctc_loss_pallas_mean
    return ctc_loss_mean


def get_rnnt_loss_fn():
    impl = _impl()
    if impl == "xla":
        return rnnt_loss_mean
    from tensorflowasr_tpu.ops.pallas.rnnt_kernel import rnnt_loss_pallas_mean

    if impl == "pallas":
        return rnnt_loss_pallas_mean

    def auto(logits, logit_length, labels, label_length, blank=0):
        if _rnnt_pallas_safe(logits):
            return rnnt_loss_pallas_mean(logits, logit_length, labels, label_length, blank)
        return rnnt_loss_mean(logits, logit_length, labels, label_length, blank)

    auto.__name__ = "rnnt_loss_auto_mean"
    return auto
