"""``utils`` subcommands: create_tfrecords, create_datasets_metadata
(reference ``scripts/utils/``)."""

from __future__ import annotations

import logging

from tensorflowasr_tpu.scripts import common

logger = logging.getLogger("tensorflowasr_tpu")


def main(args):
    if args.util_command == "create_tfrecords":
        return create_tfrecords(args)
    if args.util_command == "create_datasets_metadata":
        return create_datasets_metadata(args)
    if args.util_command == "convert_checkpoint":
        return convert_checkpoint(args)
    if args.util_command == "create_mls_trans":
        from tensorflowasr_tpu.scripts.utils.create_mls_trans import convert_split

        print(convert_split(args.split_dir, args.output))
        return 0
    raise SystemExit(f"unknown utils command {args.util_command}")


def create_tfrecords(args):
    config = common.load_config(args, training=True)
    tokenizer = common.build_tokenizer(config)
    data = common.build_datasets(config, tokenizer, args, stages=("train", "eval", "test"))
    for name, ds in data.items():
        for d in ds if isinstance(ds, list) else ([ds] if ds else []):
            if hasattr(d, "create_tfrecords"):
                d.create_tfrecords()
    return 0


def create_datasets_metadata(args):
    """Build the tokenizer vocabulary then compute/save dataset metadata
    (reference ``scripts/utils/create_datasets_metadata.py``)."""
    config = common.load_config(args, training=True)
    from tensorflowasr_tpu import tokenizers as tok_mod
    from tensorflowasr_tpu.data import datasets as ds_mod

    tokenizer = tok_mod.get(config)
    train_cfg = config.data_config.train_dataset_config
    train_ds = ds_mod.get(tokenizer, train_cfg, args.dataset_type)
    try:
        tokenizer.make()
    except FileNotFoundError:
        logger.info("building tokenizer vocabulary ...")
        tokenizer.build(train_ds)
        tokenizer.make()
    if train_cfg.metadata:
        train_ds.save_metadata(train_cfg.metadata)
        eval_cfg = config.data_config.eval_dataset_config
        if eval_cfg.data_paths:
            ds_mod.get(tokenizer, eval_cfg, args.dataset_type).save_metadata(eval_cfg.metadata or train_cfg.metadata)
    return 0


def convert_checkpoint(args):
    """Reference Keras ``.weights.h5`` → orbax inference checkpoint.

    Builds the model from config (same config the reference checkpoint was
    trained with), maps the h5 weights onto the flax tree (convert.keras_h5),
    and saves a standalone orbax artifact loadable by ``test``/``save``/
    ``export`` via ``--checkpoint``.
    """
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tensorflowasr_tpu import schemas
    from tensorflowasr_tpu.convert import load_transducer_h5

    config = common.load_config(args, training=False)
    tokenizer = common.build_tokenizer(config)
    model = common.build_model_from_config(config, tokenizer, mxp="none")

    n = 16000
    ti = schemas.TrainInput(
        inputs=jnp.zeros((1, n), jnp.float32),
        inputs_length=jnp.asarray([n], jnp.int32),
        predictions=jnp.zeros((1, 2), jnp.int32),
        predictions_length=jnp.asarray([2], jnp.int32),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, ti, train=False)
    variables = load_transducer_h5(os.path.abspath(args.h5), variables)

    import orbax.checkpoint as ocp

    output = os.path.abspath(args.output)
    # hold + close the checkpointer: a bare temporary can be GC'd while its
    # async commit is still writing metadata ("futures after shutdown")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(output, jax.device_get(variables))
        restored = ckptr.restore(output, jax.device_get(variables))
    n_arrays = len(jax.tree_util.tree_leaves(restored))
    del np
    logger.info("converted %s -> %s (%d arrays)", args.h5, output, n_arrays)
    return 0
