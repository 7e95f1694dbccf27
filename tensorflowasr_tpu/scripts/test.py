"""``test`` subcommand (reference ``scripts/test.py:28-90`` parity).

Loads a checkpoint, runs greedy (+ optional beam) recognition over each test
dataset, writes the prediction TSV, and prints the WER/CER/MER/WIL/WIP
report.
"""

from __future__ import annotations

import logging

import jax
import numpy as np

from tensorflowasr_tpu.scripts import common

logger = logging.getLogger("tensorflowasr_tpu")


def main(args):
    from tensorflowasr_tpu import schemas
    from tensorflowasr_tpu.training.callbacks import PredictLogger
    from tensorflowasr_tpu.utils import app_util

    config = common.load_config(args, training=False)
    tokenizer = common.build_tokenizer(config)
    model = common.build_model_from_config(config, tokenizer, mxp="none")

    variables = _load_variables(model, tokenizer, args)

    from tensorflowasr_tpu.training.evaluation import evaluate_dataset

    # reference predict_step always produces greedy AND beam columns
    # (base_model.py:232-248); beam width comes from the decoder config
    # unless overridden on the CLI
    beam_width = args.beam_width or int(getattr(config.decoder_config, "beam_width", 0) or 0)

    data = common.build_datasets(config, tokenizer, args, stages=("test",))
    for ds in data["test"]:
        report = evaluate_dataset(
            model, variables, ds, tokenizer, batch_size=args.bs, beam_width=beam_width, collect_rows=True
        )
        plogger = PredictLogger(output=args.output)
        for row in report["rows"]:
            plogger.add(*row)
        plogger.flush()
        app_util.evaluate_hypotheses(args.output)
    return 0


def _load_variables(model, tokenizer, args):
    import numpy as np

    from tensorflowasr_tpu import schemas

    rng = jax.random.PRNGKey(0)
    dummy = schemas.TrainInput(
        inputs=np.zeros((1, 16000), np.float32),
        inputs_length=np.asarray([16000], np.int32),
        predictions=np.zeros((1, 2), np.int32),
        predictions_length=np.asarray([2], np.int32),
    )
    variables = model.init({"params": rng}, dummy, train=False)
    ckpt = getattr(args, "checkpoint", None)
    if ckpt:
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(ckpt, jax.device_get(variables))
        variables = restored
        logger.info("restored variables from %s", ckpt)
    else:
        # try modeldir/checkpoints latest (TrainState layout)
        import os

        ckpt_dir = os.path.join(os.environ.get("TFASR_MODELDIR", "models"), "checkpoints")
        if os.path.isdir(ckpt_dir):
            import orbax.checkpoint as ocp

            mgr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
            step = mgr.latest_step()
            if step is not None:
                restored = mgr.restore(step)
                variables = {"params": restored["params"]}
                if restored.get("batch_stats"):
                    variables["batch_stats"] = restored["batch_stats"]
                logger.info("restored checkpoint step %s from %s", step, ckpt_dir)
    return variables
