"""Checkpoint conversion: reference Keras ``.weights.h5`` → flax/orbax."""

from tensorflowasr_tpu.convert.keras_h5 import (  # noqa: F401
    load_transducer_h5,
    read_h5_arrays,
)
