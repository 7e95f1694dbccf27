"""Command-line interface.

Reference parity: console entry ``tensorflow_asr`` exposing
``train/test/tflite/save`` + ``utils {create_tfrecords,
create_datasets_metadata}`` (``scripts/__init__.py:6-19``, ``setup.cfg:10-12``)
— here ``tflite`` becomes ``export`` (StableHLO native + optional TFLite)
with ``tflite`` kept as an alias.
"""

from __future__ import annotations

import argparse
import sys


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--config-path", required=True, help="path to the .yml(.j2) config")
    p.add_argument("--datadir", default=None, help="value for the {{datadir}} config var")
    p.add_argument("--modeldir", default=None, help="value for the {{modeldir}} config var")
    p.add_argument("--dataset-type", default="slice", choices=["slice", "generator", "tfrecord"])
    p.add_argument("--jit", action="store_true", default=True)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="tensorflowasr_tpu", description="TPU-native ASR framework")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="train a model from config")
    _add_common(p_train)
    p_train.add_argument("--bs", type=int, default=None, help="per-replica batch size override")
    p_train.add_argument("--epochs", type=int, default=None)
    p_train.add_argument("--steps-per-epoch", type=int, default=None)
    p_train.add_argument("--mxp", default="strict", choices=["strict", "auto", "none"])
    p_train.add_argument("--profile", default=None, help="write a jax.profiler trace of the first steps to this dir")

    p_test = sub.add_parser("test", help="evaluate WER/CER on test datasets")
    _add_common(p_test)
    p_test.add_argument("--bs", type=int, default=1)
    p_test.add_argument("--beam-width", type=int, default=0)
    p_test.add_argument("--output", default="test_outputs.tsv")
    p_test.add_argument("--checkpoint", default=None)

    p_save = sub.add_parser("save", help="save final model params from a checkpoint")
    _add_common(p_save)
    p_save.add_argument("--output", required=True)
    p_save.add_argument("--checkpoint", default=None)

    for name in ("export", "tflite"):
        p_exp = sub.add_parser(name, help="export single-function inference artifact")
        _add_common(p_exp)
        p_exp.add_argument("--output", required=True)
        p_exp.add_argument("--format", default="stablehlo", choices=["stablehlo", "tflite"])
        p_exp.add_argument("--bs", type=int, default=1)
        p_exp.add_argument("--beam-width", type=int, default=0)
        p_exp.add_argument("--checkpoint", default=None)
        p_exp.add_argument("--streaming", action="store_true", help="export with carried state inputs (chunked inference)")

    p_utils = sub.add_parser("utils", help="dataset utilities")
    usub = p_utils.add_subparsers(dest="util_command", required=True)
    p_tfr = usub.add_parser("create_tfrecords")
    _add_common(p_tfr)
    p_meta = usub.add_parser("create_datasets_metadata")
    _add_common(p_meta)
    p_mls = usub.add_parser("create_mls_trans")
    p_mls.add_argument("--split-dir", required=True)
    p_mls.add_argument("--output", default=None)
    p_conv = usub.add_parser("convert_checkpoint", help="reference Keras .weights.h5 → orbax checkpoint")
    _add_common(p_conv)
    p_conv.add_argument("--h5", required=True, help="reference .h5/.weights.h5 checkpoint")
    p_conv.add_argument("--output", required=True, help="orbax checkpoint output dir")

    args = parser.parse_args(argv)

    if args.command == "train":
        from tensorflowasr_tpu.scripts import train as mod

        return mod.main(args)
    if args.command == "test":
        from tensorflowasr_tpu.scripts import test as mod

        return mod.main(args)
    if args.command == "save":
        from tensorflowasr_tpu.scripts import save as mod

        return mod.main(args)
    if args.command in ("export", "tflite"):
        from tensorflowasr_tpu.scripts import export as mod

        return mod.main(args)
    if args.command == "utils":
        from tensorflowasr_tpu.scripts import utils as mod

        return mod.main(args)
    parser.error(f"unknown command {args.command}")


if __name__ == "__main__":
    sys.exit(main())
