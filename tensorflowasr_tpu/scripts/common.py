"""Shared script plumbing: config loading, tokenizer/model/dataset assembly."""

from __future__ import annotations

import logging
import os

import jax

from tensorflowasr_tpu.configs import Config
from tensorflowasr_tpu.utils import env_util

logger = env_util.setup_logging()


def load_config(args, training: bool) -> Config:
    custom_vars = {}
    if args.datadir:
        custom_vars["datadir"] = os.path.abspath(args.datadir)
        os.environ["TFASR_DATADIR"] = custom_vars["datadir"]
    if args.modeldir:
        custom_vars["modeldir"] = os.path.abspath(args.modeldir)
        os.environ["TFASR_MODELDIR"] = custom_vars["modeldir"]
    return Config(args.config_path, training=training, **custom_vars)


def build_tokenizer(config: Config):
    from tensorflowasr_tpu import tokenizers

    tokenizer = tokenizers.get(config)
    tokenizer.make()
    return tokenizer


def build_model_from_config(config: Config, tokenizer, mxp: str = "none"):
    from tensorflowasr_tpu.models import build_model

    dtype = env_util.setup_mxp(mxp)
    return build_model(config.model_config, vocab_size=tokenizer.num_classes, dtype=dtype)


def build_datasets(config: Config, tokenizer, args, stages=("train", "eval")):
    from tensorflowasr_tpu.data import datasets

    out = {}
    if "train" in stages:
        out["train"] = datasets.get(tokenizer, config.data_config.train_dataset_config, args.dataset_type)
    if "eval" in stages:
        dc = config.data_config.eval_dataset_config
        out["eval"] = datasets.get(tokenizer, dc, args.dataset_type) if dc.data_paths else None
    if "test" in stages:
        out["test"] = [datasets.get(tokenizer, dc, args.dataset_type) for dc in config.data_config.test_dataset_configs if dc.enabled]
    return out
