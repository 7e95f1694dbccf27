"""File and config IO utilities.

Jinja2-templated YAML config loading with ``repodir``/``datadir``/``modeldir``
interpolation, matching the reference semantics of
``tensorflow_asr/utils/file_util.py:33-57`` (load_yaml) and the cloud-path
tempfile shims (:119-144) — local paths only here; remote filesystems can be
layered on via fsspec-style hooks later.
"""

from __future__ import annotations

import contextlib
import json
import os
import re
import tempfile
from typing import Any, Iterator, Union

import jinja2
import yaml

PathLike = Union[str, os.PathLike]


def preprocess_paths(path: PathLike | None, isdir: bool = False) -> str | None:
    """Expand ~ and env vars; create parent dirs so writes always succeed."""
    if path is None:
        return None
    path = os.path.abspath(os.path.expanduser(os.path.expandvars(str(path))))
    dirpath = path if isdir else os.path.dirname(path)
    if dirpath and not os.path.exists(dirpath):
        os.makedirs(dirpath, exist_ok=True)
    return path


def is_cloud_path(path: PathLike) -> bool:
    return bool(re.match(r"^[a-z0-9]+://", str(path)))


@contextlib.contextmanager
def read_file(path: PathLike) -> Iterator[str]:
    """Yield a local filesystem path for reading (cloud shim hook point)."""
    yield os.path.abspath(os.path.expanduser(str(path)))


@contextlib.contextmanager
def save_file(path: PathLike) -> Iterator[str]:
    """Yield a local path to write to; parent dirs are created."""
    p = preprocess_paths(path)
    yield p


def load_yaml(path: PathLike, custom_vars: dict | None = None, **kwargs) -> dict:
    """Load a YAML (optionally Jinja2 ``.j2``) config file.

    Template variables available (reference parity):
      - ``repodir``: repository root (dir containing this package's parent)
      - ``curdir``: directory containing the config file
      - ``datadir``, ``modeldir``: from env vars ``TFASR_DATADIR`` /
        ``TFASR_MODELDIR`` or ``custom_vars`` / kwargs.
    """
    path = os.path.abspath(os.path.expanduser(os.path.expandvars(str(path))))
    repodir = os.environ.get(
        "TFASR_REPODIR",
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    )
    template_vars: dict[str, Any] = {
        "repodir": repodir,
        "curdir": os.path.dirname(path),
        "datadir": os.environ.get("TFASR_DATADIR", os.path.join(repodir, "data")),
        "modeldir": os.environ.get("TFASR_MODELDIR", os.path.join(repodir, "models")),
    }
    if custom_vars:
        template_vars.update(custom_vars)
    template_vars.update(kwargs)

    with open(path, "r", encoding="utf-8") as f:
        raw = f.read()

    env = jinja2.Environment(undefined=jinja2.ChainableUndefined)
    # Jinja include/import support relative to the config dir and repo root
    # (honoring a caller-overridden repodir, e.g. a reference checkout).
    env.loader = jinja2.FileSystemLoader([os.path.dirname(path), str(template_vars["repodir"]), repodir, "/"])
    rendered = env.from_string(raw).render(**template_vars)

    loader = yaml.SafeLoader
    # Allow scientific notation like 1e-6 without decimal point (PyYAML quirk).
    loader.add_implicit_resolver(
        "tag:yaml.org,2002:float",
        re.compile(
            r"""^(?:[-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
            |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
            |\.[0-9_]+(?:[eE][-+][0-9]+)?
            |[-+]?[0-9][0-9_]*(?::[0-5]?[0-9])+\.[0-9_]*
            |[-+]?\.(?:inf|Inf|INF)
            |\.(?:nan|NaN|NAN))$""",
            re.X,
        ),
        list("-+0123456789."),
    )
    return yaml.load(rendered, Loader=loader) or {}


def save_json(path: PathLike, obj: Any) -> None:
    with save_file(path) as p:
        with open(p, "w", encoding="utf-8") as f:
            json.dump(obj, f, indent=2, sort_keys=True, default=str)


def load_json(path: PathLike) -> Any:
    with read_file(path) as p:
        with open(p, "r", encoding="utf-8") as f:
            return json.load(f)


@contextlib.contextmanager
def atomic_write(path: PathLike, mode: str = "w") -> Iterator[Any]:
    """Write to a temp file then atomically rename into place."""
    p = preprocess_paths(path)
    d = os.path.dirname(p)
    fd, tmp = tempfile.mkstemp(dir=d)
    try:
        with os.fdopen(fd, mode) as f:
            yield f
        os.replace(tmp, p)
    except BaseException:
        with contextlib.suppress(OSError):
            os.unlink(tmp)
        raise
