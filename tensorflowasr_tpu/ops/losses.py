"""Loss implementation dispatch: Pallas kernels (default) vs XLA scan.

Selection via env ``TFASR_LOSS_IMPL`` (reference's env-toggle pattern,
``TFASR_USE_TF_CTC`` etc.):
  - "auto"/"pallas" (default): the Pallas fused forward-backward kernels —
    exact (golden-tested) and ~4× faster full train steps. The round-1
    axon-platform hang was bisected to 384-lane (3-tile) minor dims and is
    structurally avoided inside the kernel (rnnt_kernel._padded_lanes),
    so no shape guard remains.
  - "xla": force the scan DPs everywhere
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from tensorflowasr_tpu.ops.ctc_loss import ctc_loss, ctc_loss_mean
from tensorflowasr_tpu.ops.rnnt_loss import rnnt_loss, rnnt_loss_mean


def _impl() -> str:
    return os.environ.get("TFASR_LOSS_IMPL", "auto").lower()


# kept for backward compatibility in tests/tooling: with the 384-lane bucket
# padded away inside the kernel, every shape is safe
def _rnnt_pallas_safe(logits) -> bool:  # pragma: no cover - trivial
    return True


def masked_mean(loss_fn):
    """Batch-mean over VALID examples only: rows with ``logit_length <= 0``
    (zero-padding added by ``shard_batch`` for indivisible batches) are
    excluded from the mean, and their lengths are sanitized first so the
    per-example DP stays finite (keeps gradients NaN-free)."""

    def fn(logits, logit_length, labels, label_length, blank: int = 0):
        logit_length = jnp.asarray(logit_length, jnp.int32)
        valid = logit_length > 0
        safe_t = jnp.maximum(logit_length, 1)
        safe_u = jnp.where(valid, jnp.asarray(label_length, jnp.int32), 0)
        # reference semantics (base_loss.py:36): pad logit_length up to
        # label_length so short-utterance/long-label rows use the padded
        # frames instead of shrinking the lattice — bounded by the array's
        # actual T (the lattice physically cannot extend past it)
        safe_t = jnp.minimum(jnp.maximum(safe_t, safe_u), logits.shape[1])
        per = loss_fn(logits, safe_t, labels, safe_u, blank)
        per = jnp.where(valid, per, 0.0)
        return jnp.sum(per) / jnp.maximum(jnp.sum(valid.astype(per.dtype)), 1.0)

    fn.__name__ = f"{getattr(loss_fn, '__name__', 'loss')}_masked_mean"
    return fn


def get_ctc_loss_fn():
    impl = _impl()
    if impl in ("pallas", "auto"):
        from tensorflowasr_tpu.ops.pallas.ctc_kernel import ctc_loss_pallas

        return masked_mean(ctc_loss_pallas)
    return masked_mean(ctc_loss)


def get_rnnt_loss_fn():
    impl = _impl()
    if impl == "xla":
        return masked_mean(rnnt_loss)
    from tensorflowasr_tpu.ops.pallas.rnnt_kernel import rnnt_loss_pallas

    return masked_mean(rnnt_loss_pallas)
