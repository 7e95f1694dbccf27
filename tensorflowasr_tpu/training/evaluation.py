"""Dataset-level recognition evaluation (TestLogger parity).

The core loop behind ``scripts/test.py`` and usable standalone or as an
end-of-epoch hook: run greedy (+ optional beam) recognition over a dataset,
accumulate streaming WER/CER (reference ``callbacks.py:32-77``), and
optionally collect per-utterance rows for the prediction TSV.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np

from tensorflowasr_tpu import schemas
from tensorflowasr_tpu.training.metrics import ErrorRateAccumulator

logger = logging.getLogger("tensorflowasr_tpu")


def evaluate_dataset(
    model,
    variables,
    dataset,
    tokenizer,
    batch_size: int = 1,
    beam_width: int = 0,
    lm=None,
    collect_rows: bool = False,
) -> dict:
    """Returns {"greedy": {wer, cer}, ["beam": ...], ["rows": [...]]}.

    ``dataset`` is an ASRDataset (indefinite is forced off).
    """
    from tensorflowasr_tpu.models.ctc import base as ctc_base
    from tensorflowasr_tpu.models.transducer import base as transducer_base

    is_transducer = hasattr(model, "prediction_config")
    rec = transducer_base.recognize if is_transducer else ctc_base.recognize

    dataset.indefinite = False
    dataset.drop_remainder = False
    dataset.read_entries()

    greedy_fn = jax.jit(lambda v, p: rec(model, v, p))
    if beam_width:
        if is_transducer:
            beam_fn = jax.jit(lambda v, p: rec(model, v, p, beam_width=beam_width))
        else:
            beam_fn = jax.jit(lambda v, p: ctc_base.recognize(model, v, p, beam_width=beam_width, lm=lm))
    else:
        beam_fn = None

    wacc, cacc = ErrorRateAccumulator(), ErrorRateAccumulator()
    wacc_b, cacc_b = ErrorRateAccumulator(), ErrorRateAccumulator()
    rows = []
    i = 0
    for batch in dataset.create(batch_size, prefetch=2):
        pin = schemas.PredictInput(inputs=batch.inputs.inputs, inputs_length=batch.inputs.inputs_length)
        tokens = np.asarray(greedy_fn(variables, pin).tokens)
        beam_tokens = np.asarray(beam_fn(variables, pin).tokens) if beam_fn else None
        for b in range(tokens.shape[0]):
            if i >= len(dataset.entries):
                break
            path, _, transcript = dataset.entries[i]
            truth = tokenizer.normalize_text(transcript, tokenizer.decoder_config)
            greedy = tokenizer.detokenize(tokens[b])
            wacc.update(truth.split(), greedy.split())
            cacc.update(list(truth), list(greedy))
            beam = ""
            if beam_tokens is not None:
                beam = tokenizer.detokenize(beam_tokens[b])
                wacc_b.update(truth.split(), beam.split())
                cacc_b.update(list(truth), list(beam))
            if collect_rows:
                rows.append((path, truth, greedy, beam))
            i += 1
    report = {"greedy": {"wer": wacc.error_rate, "cer": cacc.error_rate}}
    if beam_fn:
        report["beam"] = {"wer": wacc_b.error_rate, "cer": cacc_b.error_rate}
    if collect_rows:
        report["rows"] = rows
    logger.info("evaluated %d utterances: %s", i, {k: v for k, v in report.items() if k != "rows"})
    return report
