"""Reference Keras-3 ``.weights.h5`` → flax variables converter.

The reference saves checkpoints with Keras ``save_weights`` (reference
``models/base_model.py:51-61``, ``callbacks.py:190-239``): an HDF5 tree of
``<layer path>/vars/<n>`` datasets. This module maps those onto this
framework's flax param/batch_stats pytrees so published reference
checkpoints run here (WER parity check + drop-in migration).

Layout differences handled:
  - DepthwiseConv1D kernels: Keras ``[k, C, 1]`` → flax ``[k, 1, C]``
  - fused LSTM kernels: Keras ``[in, 4u]``/``[u, 4u]``/``[4u]`` with gate
    order (i, f, g, o) → flax LSTMCell's per-gate ``ii/if/ig/io`` (input,
    no bias) and ``hi/hf/hg/ho`` (recurrent, carries the bias)
  - BatchNorm: Keras vars (gamma, beta, moving_mean, moving_var) → params
    ``scale``/``bias`` + batch_stats ``mean``/``var``

Verified by forward-parity tests (tests/test_convert.py): logits from the
actual reference model equal this framework's logits on converted weights.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np

_BN_IDX = {"scale": 0, "bias": 1, "mean": 2, "var": 3}
_LN_IDX = {"scale": 0, "bias": 1}
_DENSE_IDX = {"kernel": 0, "bias": 1}
_GATE_OFFSET = {"i": 0, "f": 1, "g": 2, "o": 3}  # Keras fused gate order
_MHA_NAMES = {
    "query": "query_dense",
    "key": "key_dense",
    "value": "value_dense",
    "encoding": "_relpe_dense",
    "output": "output_dense",
}


def read_h5_arrays(path: str) -> dict[str, np.ndarray]:
    """Flatten a Keras .weights.h5 file into {"/layer/path/vars/0": array}."""
    import h5py

    out: dict[str, np.ndarray] = {}

    def walk(group, prefix=""):
        for k, v in group.items():
            p = f"{prefix}/{k}"
            if isinstance(v, h5py.Group):
                walk(v, p)
            else:
                out[p] = np.asarray(v)

    with h5py.File(path, "r") as f:
        walk(f)
    return out


def _sfx(i: int) -> str:
    return "" if i == 0 else f"_{i}"


class _Unmapped(Exception):
    pass


def _transducer_ref_entry(key: str) -> tuple[str, Optional[str]]:
    """Map one flax flat key → (h5 dataset path, special transform tag).

    ``key`` looks like "params/encoder/block_0/mhsa_module/mhsa/query/kernel".
    Returns transform tag in {None, "dwconv", "lstm_<gate>"}.
    """
    parts = key.split("/")
    coll, parts = parts[0], parts[1:]
    leaf = parts[-1]

    if parts[0] == "encoder":
        if parts[1] == "subsampling":
            m = re.fullmatch(r"(conv|norm)_(\d+)", parts[2])
            if not m:
                raise _Unmapped(key)
            i = int(m.group(2))
            seq = f"/encoder/conv_subsampling/convs/sequential{_sfx(i)}/layers"
            if m.group(1) == "conv":
                return f"{seq}/conv2d/vars/{_DENSE_IDX[leaf]}", None
            return f"{seq}/batch_normalization/vars/{_BN_IDX[leaf]}", None
        if parts[1] == "linear":
            return f"/encoder/layers/dense/vars/{_DENSE_IDX[leaf]}", None
        if parts[1] == "content_attention_bias":
            return "/encoder/vars/0", None
        if parts[1] == "positional_attention_bias":
            return "/encoder/vars/1", None
        m = re.fullmatch(r"block_(\d+)", parts[1])
        if m:
            base = f"/encoder/conformer_blocks/conformer_block{_sfx(int(m.group(1)))}"
            mod = parts[2]
            fm = re.fullmatch(r"ff_module_(\d)", mod)
            if fm:
                n = fm.group(1)
                if parts[3] == "ln":
                    return f"{base}/ffm{n}/layers/layer_normalization/vars/{_LN_IDX[leaf]}", None
                dm = re.fullmatch(r"dense_(\d)", parts[3])
                if dm:
                    return f"{base}/ffm{n}/ffn{dm.group(1)}/vars/{_DENSE_IDX[leaf]}", None
            if mod == "mhsa_module":
                if parts[3] == "ln":
                    return f"{base}/layers/mhsa_module/layers/layer_normalization/vars/{_LN_IDX[leaf]}", None
                if parts[3] == "mhsa":
                    name = _MHA_NAMES[parts[4]]
                    return (
                        f"{base}/layers/mhsa_module/layers/multi_head_relative_attention/{name}/vars/{_DENSE_IDX[leaf]}",
                        "relmha",
                    )
            if mod == "conv_module":
                if parts[3] == "ln":
                    return f"{base}/convm/layers/layer_normalization/vars/{_LN_IDX[leaf]}", None
                if parts[3] == "pw_conv_1":
                    return f"{base}/convm/layers/conv1d/vars/{_DENSE_IDX[leaf]}", None
                if parts[3] == "pw_conv_2":
                    return f"{base}/convm/layers/conv1d_1/vars/{_DENSE_IDX[leaf]}", None
                if parts[3] == "dw_conv":
                    return f"{base}/convm/dw_conv/vars/{_DENSE_IDX[leaf]}", ("dwconv" if leaf == "kernel" else None)
                if parts[3] == "dw_norm":
                    idx = _BN_IDX[leaf] if coll == "batch_stats" or leaf in ("mean", "var") else _BN_IDX[leaf]
                    return f"{base}/convm/dw_norm/vars/{idx}", None
            if mod == "ln_post":
                return f"{base}/layers/layer_normalization/vars/{_LN_IDX[leaf]}", None
        raise _Unmapped(key)

    if parts[0] == "prediction":
        base = "/layers/transducer_prediction"
        if parts[1] == "embedding":
            return f"{base}/label_encoder/vars/0", None
        m = re.fullmatch(r"ln_(\d+)", parts[1])
        if m:
            return f"{base}/lns/layer_normalization{_sfx(int(m.group(1)))}/vars/{_LN_IDX[leaf]}", None
        m = re.fullmatch(r"rnn_(\d+)", parts[1])
        if m:
            lstm = f"{base}/rnns/lstm{_sfx(int(m.group(1)))}/cell/vars"
            gate_name = parts[3]  # ii/if/ig/io or hi/hf/hg/ho
            gate = gate_name[1]
            if gate_name[0] == "i":  # input kernel, slice of fused vars/0
                return f"{lstm}/0", f"lstm_{gate}"
            if leaf == "kernel":  # recurrent kernel, slice of vars/1
                return f"{lstm}/1", f"lstm_{gate}"
            return f"{lstm}/2", f"lstm_{gate}"  # bias, slice of vars/2
        raise _Unmapped(key)

    if parts[0] == "joint":
        name = {"enc": "ffn_enc", "pred": "ffn_pred", "vocab": "ffn_out"}[parts[1]]
        return f"/joint_net/{name}/vars/{_DENSE_IDX[leaf]}", None

    raise _Unmapped(key)


def load_transducer_h5(h5_path: str, variables: dict, strict: bool = True) -> dict:
    """Load reference Conformer-Transducer h5 weights into ``variables``.

    ``variables`` is the flax pytree from ``model.init`` (params +
    batch_stats); returns a new pytree with every leaf replaced by the
    corresponding reference weight.
    """
    import flax

    weights = read_h5_arrays(h5_path)
    # plain-MHA checkpoints use multi_head_attention layer names
    if not any("multi_head_relative_attention" in k for k in weights):
        global_names = {k.replace("multi_head_relative_attention", "multi_head_attention"): v for k, v in weights.items()}
        weights = global_names

    flat = flax.traverse_util.flatten_dict(variables, sep="/")
    new = {}
    missing = []
    for key, value in flat.items():
        try:
            path, tag = _transducer_ref_entry(key)
        except (_Unmapped, KeyError):
            missing.append(key)
            new[key] = value
            continue
        if tag == "relmha" and path not in weights:
            path = path.replace("multi_head_relative_attention", "multi_head_attention")
        if path not in weights:
            missing.append(key)
            new[key] = value
            continue
        arr = weights[path]
        if tag == "dwconv":
            arr = np.transpose(arr, (0, 2, 1))  # [k, C, 1] → [k, 1, C]
        elif tag is not None and tag.startswith("lstm_"):
            gate = tag[len("lstm_"):]
            u = arr.shape[-1] // 4
            o = _GATE_OFFSET[gate] * u
            arr = arr[..., o : o + u]
        if arr.shape != value.shape:
            raise ValueError(f"shape mismatch for {key}: h5 {arr.shape} vs model {value.shape}")
        new[key] = np.asarray(arr, dtype=np.asarray(value).dtype)
    if strict and missing:
        raise ValueError(f"unmapped/missing weights for {len(missing)} params, e.g. {missing[:5]}")
    return flax.traverse_util.unflatten_dict(new, sep="/")
