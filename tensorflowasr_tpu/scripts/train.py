"""``train`` subcommand (reference ``scripts/train.py:29-115`` parity).

Config → tokenizer → datasets (+ static global shapes from metadata) →
model → optimizer (schedule/GA/gradn/gwn) → DP Trainer.fit with callbacks,
checkpoint/resume under ``{{modeldir}}/checkpoints``.
"""

from __future__ import annotations

import logging
import os

import jax

from tensorflowasr_tpu.scripts import common

logger = logging.getLogger("tensorflowasr_tpu")


def main(args):
    from tensorflowasr_tpu.data import datasets as ds_mod
    from tensorflowasr_tpu.optimizers import build_optimizer
    from tensorflowasr_tpu.training import Trainer
    from tensorflowasr_tpu.training.callbacks import deserialize
    from tensorflowasr_tpu.utils import env_util

    env_util.setup_seed(42)
    env_util.setup_check_numerics()
    config = common.load_config(args, training=True)
    tokenizer = common.build_tokenizer(config)
    model = common.build_model_from_config(config, tokenizer, mxp=args.mxp)

    data = common.build_datasets(config, tokenizer, args, stages=("train", "eval"))
    train_ds, eval_ds = data["train"], data["eval"]
    train_ds.load_metadata()
    if not train_ds.max_input_length:
        logger.info("computing dataset metadata (max lengths) ...")
        train_ds.compute_metadata()

    lc = config.learning_config
    batch_size = args.bs or lc.batch_size
    num_devices = jax.device_count()
    shapes = ds_mod.get_global_shape(
        config, train_ds, batch_size=batch_size, num_devices=num_devices, num_local_devices=jax.local_device_count()
    )
    logger.info("global shapes: %s (%d devices, %d local)", shapes, num_devices, jax.local_device_count())

    tx = build_optimizer(lc.optimizer_config, ga_steps=lc.ga_steps, gradn_config=lc.gradn_config)
    ckpt_dir = os.path.join(os.environ.get("TFASR_MODELDIR", "models"), "checkpoints")
    trainer = Trainer(
        model,
        tx,
        gwn_config=lc.gwn_config,
        checkpoint_dir=ckpt_dir,
        callbacks=deserialize(lc.callbacks),
    )

    import itertools

    # each process feeds its LOCAL share; shard_batch assembles the global array
    train_iter = train_ds.create(shapes["local_batch_size"], shapes["padded_input_length"], shapes["padded_label_length"])
    sample = next(train_iter)
    train_iter = itertools.chain([sample], train_iter)  # don't drop the peeked batch
    state = trainer.init_state(sample)
    if lc.pretrained:
        # by-name, shape-checked warm start (reference scripts/train.py:97-102,
        # Keras load_weights(by_name=True, skip_mismatch=True)); a later
        # resume checkpoint still takes precedence below
        from tensorflowasr_tpu.training.pretrained import warm_start

        state = warm_start(state, lc.pretrained)
    state = trainer.restore(state)

    if getattr(args, "profile", None):
        # profile the steady-state steps right after compilation
        from jax import profiler as jax_profiler

        state, _ = trainer.train_step(state, sample)  # compile outside the trace
        jax_profiler.start_trace(args.profile)
        for _ in range(5):
            state, _ = trainer.train_step(state, sample)
        jax_profiler.stop_trace()
        logger.info("wrote profiler trace to %s", args.profile)

    epochs = args.epochs or lc.num_epochs
    steps_per_epoch = args.steps_per_epoch or (train_ds.num_entries // shapes["batch_size"] if train_ds.num_entries else None)
    eval_iter = None
    if eval_ds is not None:
        eval_ds.load_metadata()
        eval_ds.indefinite = False
        eval_iter = list(eval_ds.create(shapes["local_batch_size"], shapes["padded_input_length"], shapes["padded_label_length"], prefetch=0))

    trainer.fit(state, train_iter, epochs=epochs, steps_per_epoch=steps_per_epoch, eval_data=eval_iter)
    return 0
