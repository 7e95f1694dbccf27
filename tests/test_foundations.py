"""Tests for utils, configs, schemas, registry."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu import configs, schemas
from tensorflowasr_tpu.utils import env_util, file_util, math_util


def test_eight_cpu_devices():
    assert jax.device_count() >= 8


# ------------------------------- math_util ---------------------------------- #


def test_get_nframes_pad_end():
    # 16kHz, 25ms frame (400), 10ms step (160), pad_end → ceil(n/step)
    assert math_util.get_nframes(16000, 400, 160, pad_end=True) == 100
    assert math_util.get_nframes(16001, 400, 160, pad_end=True) == 101
    assert math_util.get_nframes(159, 400, 160, pad_end=True) == 1


def test_get_nframes_no_pad():
    assert math_util.get_nframes(16000, 400, 160, pad_end=False) == 1 + (16000 - 400) // 160
    # librosa-style uses nfft as the window
    assert math_util.get_nframes(16000, 400, 160, pad_end=False, use_librosa_like_stft=True, nfft=512) == 1 + (16000 - 512) // 160


def test_get_nframes_traced():
    fn = jax.jit(lambda n: math_util.get_nframes(n, 400, 160, pad_end=True))
    assert int(fn(jnp.asarray(16000))) == 100


def test_conv_output_length():
    assert math_util.conv_output_length(100, 3, "same", 2) == 50
    assert math_util.conv_output_length(100, 3, "valid", 1) == 98
    assert math_util.conv_output_length(100, 3, "causal", 1) == 100
    assert math_util.conv_output_length(100, 3, "full", 1) == 102


def test_sequence_mask_and_masked_fill():
    m = math_util.sequence_mask(jnp.asarray([2, 4]), maxlen=5)
    np.testing.assert_array_equal(np.asarray(m), [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]])
    x = jnp.ones((2, 5))
    y = math_util.masked_fill(x, m, -1.0)
    assert float(y[0, 3]) == -1.0 and float(y[1, 3]) == 1.0


def test_merge_two_last_dims():
    x = jnp.zeros((2, 3, 4, 5))
    assert math_util.merge_two_last_dims(x).shape == (2, 3, 20)


def test_pad_to_multiple():
    x = jnp.ones((2, 100))
    assert math_util.pad_to_multiple(x, 1, 128).shape == (2, 128)
    assert math_util.pad_to_multiple(x, 0, 2).shape == (2, 100)


# ------------------------------- file_util ---------------------------------- #


def test_load_yaml_jinja(tmp_path):
    p = tmp_path / "config.yml.j2"
    p.write_text("model_config:\n  name: conformer\n  dmodel: {{ dmodel }}\n  lr: 1e-3\n")
    cfg = file_util.load_yaml(str(p), dmodel=144)
    assert cfg["model_config"]["dmodel"] == 144
    assert abs(cfg["model_config"]["lr"] - 1e-3) < 1e-12  # sci-notation parsed as float


def test_config_sections(tmp_path):
    p = tmp_path / "c.yml.j2"
    p.write_text(
        """
decoder_config:
  type: sentencepiece
  vocab_size: 256
model_config:
  class_name: tensorflow_asr.models.transducer.conformer>Conformer
  config: {dmodel: 144}
data_config:
  train_dataset_config: {data_paths: [a.tsv], shuffle: true}
learning_config:
  batch_size: 4
  ga_steps: 8
"""
    )
    cfg = configs.Config(str(p), training=True)
    assert cfg.decoder_config.type == "sentencepiece"
    assert cfg.decoder_config.vocab_size == 256
    assert cfg.decoder_config.blank_index == 0
    assert cfg.model_config["config"]["dmodel"] == 144
    assert cfg.data_config.train_dataset_config.shuffle is True
    assert cfg.learning_config.batch_size == 4
    cfg2 = configs.Config(str(p), training=False)
    assert cfg2.learning_config is None


def test_schemas_are_pytrees():
    ti = schemas.TrainInput(
        inputs=jnp.zeros((2, 16)),
        inputs_length=jnp.asarray([16, 8]),
        predictions=jnp.zeros((2, 4), jnp.int32),
        predictions_length=jnp.asarray([4, 2]),
    )
    leaves = jax.tree_util.tree_leaves(ti)
    assert len(leaves) == 4
    out = jax.jit(lambda t: t.inputs + 1)(ti)
    assert out.shape == (2, 16)


def test_env_util():
    key = env_util.setup_seed(7)
    assert key.shape == (2,) or key.dtype  # PRNGKey form varies by jax version
    mesh = env_util.setup_mesh(("data",))
    assert mesh.shape["data"] == jax.device_count()
    assert env_util.setup_mxp("strict") == jnp.bfloat16
    assert env_util.setup_mxp("none") == jnp.float32


def test_registry_module_class_aliases():
    from tensorflowasr_tpu import registry

    @registry.register(aliases=("MyAlias",))
    class Dummy:
        def __init__(self, a=1):
            self.a = a

    assert registry.get("Dummy") is Dummy
    assert registry.get("MyAlias") is Dummy
    obj = registry.from_config({"class_name": "Dummy", "config": {"a": 5}})
    assert obj.a == 5
