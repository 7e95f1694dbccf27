"""Every example config must parse and build an initializable model."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu import schemas
from tensorflowasr_tpu.configs import Config
from tensorflowasr_tpu.models import build_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "examples/models/**/*.yml.j2"), recursive=True))


@pytest.fixture(autouse=True)
def _clear_jax_caches():
    # each config compiles a distinct large program; keep process memory flat
    yield
    jax.clear_caches()


def test_found_all_families():
    names = "\n".join(CONFIGS)
    for frag in ["ctc/conformer", "ctc/deepspeech2", "ctc/jasper", "ctc/transformer", "transducer/conformer", "transducer/contextnet", "transducer/rnnt", "transducer/transformer"]:
        assert frag in names, f"missing example configs for {frag}"


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.relpath(p, REPO) for p in CONFIGS])
def test_config_builds_model(path, tmp_path):
    cfg = Config(path, training=True, datadir=str(tmp_path), modeldir=str(tmp_path))
    assert cfg.model_config.get("class_name")
    assert cfg.learning_config.batch_size > 0
    assert cfg.data_config.train_dataset_config.data_paths
    vocab = cfg.decoder_config.vocab_size if cfg.decoder_config.type != "characters" else 29
    model = build_model(cfg.model_config, vocab_size=vocab)

    # init with a tiny input to validate the whole config wiring
    b, n, u = 1, 3200, 4
    ti = schemas.TrainInput(
        inputs=jnp.zeros((b, n), jnp.float32),
        inputs_length=jnp.asarray([n], jnp.int32),
        predictions=jnp.zeros((b, u + 1), jnp.int32),
        predictions_length=jnp.asarray([u + 1], jnp.int32),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, ti, train=False)
    out = model.apply(variables, ti, train=False)
    assert np.isfinite(np.asarray(out.logits, np.float32)).all()
    assert out.logits.shape[-1] == vocab


# ------------------------- dataset/tokenizer configs ------------------------- #

DATASET_CONFIGS = sorted(
    p
    for p in glob.glob(os.path.join(REPO, "examples/datasets/**/*.yml.j2"), recursive=True)
    if not p.endswith(("config.yml.j2", "data.yml.j2"))  # data blocks are import-only
)

REF_DATASETS = "/root/reference/examples/datasets"


def test_found_all_dataset_families():
    names = "\n".join(DATASET_CONFIGS)
    for frag in [
        "librispeech/characters/char",
        "librispeech/sentencepiece/sp.yml",
        "librispeech/sentencepiece/sp.256",
        "librispeech/wordpiece/wp.yml",
        "librispeech/wordpiece/wp_whitespace",
        "vietbud500/sentencepiece/sp.yml",
        "vietbud500/sentencepiece/sp.256",
    ]:
        assert frag in names, f"missing dataset config {frag}"


@pytest.mark.parametrize("path", DATASET_CONFIGS, ids=[os.path.relpath(p, REPO) for p in DATASET_CONFIGS])
def test_dataset_config_parses_and_builds_tokenizer(path, tmp_path):
    from tensorflowasr_tpu import tokenizers

    cfg = Config(path, training=True, datadir=str(tmp_path))
    dc = cfg.decoder_config
    assert dc.type in ("characters", "wordpiece", "sentencepiece")
    assert cfg.data_config.train_dataset_config.data_paths
    assert cfg.data_config.test_dataset_configs

    # vocab artifacts ship with the reference checkout (published .model /
    # .vocab files our tokenizers read natively); swap the path when present
    rel = os.path.relpath(str(dc.vocabulary), os.path.join(REPO, "examples/datasets"))
    ref_vocab = os.path.join(REF_DATASETS, rel)
    if os.path.exists(str(dc.vocabulary)) or os.path.exists(ref_vocab):
        if not os.path.exists(str(dc.vocabulary)):
            dc.vocabulary = ref_vocab
        tok = tokenizers.get(cfg)
        tok.make()
        assert tok.num_classes > 0
        text = "hello world"
        ids = tok.tokenize(text)
        assert tok.detokenize(ids) == text
