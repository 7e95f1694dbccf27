"""Conformer encoder (Gulati et al. 2020) with streaming support.

Structure parity with the reference (``tensorflow_asr/models/encoders/conformer.py``):
  subsampling → linear → dropout → (rel)PE → N × ConformerBlock, where each
  block is FF(½) → rel-MHSA → GLU-conv module → FF(½) → LN
  (FFModule :30-111, MHSAModule :113-243, ConvModule :245-379,
  ConformerBlock :381-536, ConformerEncoder :539-721).

Streaming: chunked attention masks (chunk_size/history_size), optional
Transformer-XL KV memory carried across ``call_next`` chunks, causal convs.
Encoder-global content/positional attention biases (when blocks don't own
them, :647-663).

TPU notes: blocks can be rematerialized (``use_remat``) to trade FLOPs for
HBM; all matmuls run in ``dtype`` (bf16 under the mixed policy) with f32
params and f32 softmax.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tensorflowasr_tpu.models.layers.attention import MemoryState, MultiHeadAttention, MultiHeadRelativeAttention
from tensorflowasr_tpu.models.layers.convolution import Conv1D, DepthwiseConv1D
from tensorflowasr_tpu.models.layers.general import Norm, sequence_mask
from tensorflowasr_tpu.models.layers.glu import GLU
from tensorflowasr_tpu.models.layers.positional import RelativeSinusoidalPositionalEncoding, SinusoidalPositionalEncoding
from tensorflowasr_tpu.models.layers.residual import Residual
from tensorflowasr_tpu.models.layers.subsampling import Conv1dSubsampling, Conv2dSubsampling, VggSubsampling
from tensorflowasr_tpu.utils import math_util

L2_DEFAULT = None  # weight decay handled by the optimizer (optax adamw)


def _maybe_pair(v):
    return tuple(v) if isinstance(v, (list, tuple)) else (v, v)


def build_subsampling(config: dict, dtype=jnp.float32):
    """Instantiate a subsampling module from a reference-style config dict."""
    cls_name = config["class_name"].split(">")[-1]
    cfg = dict(config.get("config", {}))
    if cls_name == "Conv2dSubsampling":
        return Conv2dSubsampling(
            filters=tuple(cfg["filters"]),
            strides=tuple(_maybe_pair(s) for s in cfg.get("strides", [2, 2])),
            kernels=tuple(_maybe_pair(k) for k in cfg.get("kernels", [3, 3])),
            paddings=tuple(cfg.get("paddings", ["causal"] * len(cfg["filters"]))),
            norms=tuple(cfg.get("norms", ["none"] * len(cfg["filters"]))),
            activations=tuple(cfg.get("activations", ["relu"] * len(cfg["filters"]))),
            dtype=dtype,
            name="subsampling",
        )
    if cls_name == "Conv1dSubsampling":
        return Conv1dSubsampling(
            filters=tuple(cfg["filters"]),
            strides=tuple(cfg.get("strides", [2, 2])),
            kernels=tuple(cfg.get("kernels", [3, 3])),
            paddings=tuple(cfg.get("paddings", ["causal"] * len(cfg["filters"]))),
            norms=tuple(cfg.get("norms", ["none"] * len(cfg["filters"]))),
            activations=tuple(cfg.get("activations", ["relu"] * len(cfg["filters"]))),
            dtype=dtype,
            name="subsampling",
        )
    if cls_name == "VggSubsampling":
        return VggSubsampling(
            filters=tuple(cfg.get("filters", (32, 64))),
            kernel_size=cfg.get("kernel_size", 3),
            pool_size=cfg.get("pool_size", 2),
            strides=cfg.get("strides", 2),
            padding=cfg.get("padding", "same"),
            activation=cfg.get("activation", "relu"),
            dtype=dtype,
            name="subsampling",
        )
    raise KeyError(f"Unknown subsampling class {config['class_name']!r}")


class _DenseParams(nn.Module):
    """Parameter mirror of ``nn.Dense`` (same names/shapes/inits) so the
    fused-FF kernel path produces an identical checkpoint tree."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        return kernel, bias


class _LNParams(nn.Module):
    """Parameter mirror of ``nn.LayerNorm``."""

    @nn.compact
    def __call__(self, dim: int):
        scale = self.param("scale", nn.initializers.ones_init(), (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (dim,), jnp.float32)
        return scale, bias


class _InnerConvParams(nn.Module):
    """Parameter mirror of the ``nn.Conv`` inside Conv1D/DepthwiseConv1D."""

    kernel_shape: tuple

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(), self.kernel_shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (self.kernel_shape[-1],), jnp.float32)
        return kernel, bias


class _ConvParams(nn.Module):
    """Mirror of ``Conv1D``/``DepthwiseConv1D``'s tree: one unnamed
    ``nn.Conv`` child → scope ``Conv_0``."""

    kernel_shape: tuple

    @nn.compact
    def __call__(self):
        return _InnerConvParams(self.kernel_shape, name="Conv_0")()


class _BNParams(nn.Module):
    """Mirror of ``Norm(kind="batch")``'s tree (one unnamed ``nn.BatchNorm``
    child → ``BatchNorm_0``) including the running batch_stats, with the
    flax-compatible momentum update applied from externally computed batch
    statistics."""

    features: int
    momentum: float = 0.99

    @nn.compact
    def __call__(self, batch_mean=None, batch_var=None, train: bool = False):
        inner = _BNInner(self.features, self.momentum, name="BatchNorm_0")
        return inner(batch_mean, batch_var, train=train)


class _BNInner(nn.Module):
    features: int
    momentum: float

    @nn.compact
    def __call__(self, batch_mean, batch_var, train: bool = False):
        f = self.features
        scale = self.param("scale", nn.initializers.ones_init(), (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (f,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((f,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((f,), jnp.float32))
        if train:
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * jax.lax.stop_gradient(batch_mean)
                ra_var.value = m * ra_var.value + (1.0 - m) * jax.lax.stop_gradient(batch_var)
            return scale, bias, batch_mean, batch_var
        return scale, bias, ra_mean.value, ra_var.value


def _use_fused_conv(t: int, d: int, k: int, padding: str) -> bool:
    """Fused conv-module kernel dispatch (TFASR_CONV_IMPL=auto|pallas|xla)."""
    impl = os.environ.get("TFASR_CONV_IMPL", "auto").lower()
    if impl == "xla":
        return False
    from tensorflowasr_tpu.ops.pallas.conv_kernel import conv_shapes_supported

    return conv_shapes_supported(t, d, k, padding)


def _use_fused_ff(n: int, d: int, f: int) -> bool:
    """Fused FF-module kernel dispatch (TFASR_FF_IMPL=auto|pallas|xla).

    Measured motivation: the 32 FF modules cost 20.8 of the 85 ms bs16
    Conformer-S train step while their GEMMs are ~1 ms of MXU work — the
    rest is HBM round-trips of [B·T, 4D] activations."""
    impl = os.environ.get("TFASR_FF_IMPL", "auto").lower()
    if impl == "xla":
        return False
    from tensorflowasr_tpu.ops.pallas.ff_kernel import ff_shapes_supported

    return ff_shapes_supported(n, d, f)


class FFModule(nn.Module):
    """Half-step feed-forward module: LN → 4x dense+swish → dense → ½·residual."""

    input_dim: int
    dropout: float = 0.0
    scale_factor: int = 4
    residual_factor: float = 0.5
    norm_position: str = "pre"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        d, f = self.input_dim, self.scale_factor * self.input_dim
        n = x.shape[0] * x.shape[1] if x.ndim == 3 else x.shape[0]
        if self.norm_position == "pre" and not isinstance(self.residual_factor, str) and _use_fused_ff(n, d, f):
            # fused Pallas path: whole module in one VMEM pass per row tile
            # (ops/pallas/ff_kernel.py); params mirror the XLA submodules
            from tensorflowasr_tpu.ops.pallas.ff_kernel import fused_ff

            gamma, beta = _LNParams(name="ln")(d)
            w1, b1 = _DenseParams(f, name="dense_1")(d)
            w2, b2 = _DenseParams(d, name="dense_2")(f)
            rate = float(self.dropout) if train else 0.0
            if rate > 0:
                seed = jax.random.randint(self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
            else:
                seed = jnp.zeros((), jnp.int32)
            dt = self.dtype
            out2d = fused_ff(
                x.reshape(n, d),
                gamma,
                beta,
                w1.astype(dt),
                b1.astype(dt),
                w2.astype(dt),
                b2.astype(dt),
                seed,
                rate,
                float(self.residual_factor),
                1e-3,
            )
            return out2d.reshape(x.shape)
        out = x
        if self.norm_position == "pre":
            out = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32, name="ln")(out)
        out = nn.Dense(self.scale_factor * self.input_dim, dtype=self.dtype, param_dtype=jnp.float32, name="dense_1")(out)
        out = nn.swish(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = nn.Dense(self.input_dim, dtype=self.dtype, param_dtype=jnp.float32, name="dense_2")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        if self.norm_position == "post":
            out = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32, name="ln")(out)
        return Residual(factor=self.residual_factor, dtype=self.dtype, name="residual")(x, out)


class MHSAModule(nn.Module):
    """LN → (relative) MHSA → dropout → residual, with streaming mask/memory."""

    dmodel: int
    head_size: int
    num_heads: int
    residual_factor: float = 1.0
    dropout: float = 0.0
    mha_type: str = "relmha"
    relmha_causal: bool = False
    norm_position: str = "pre"
    memory_length: Optional[int] = None
    history_size: Optional[int] = None
    chunk_size: Optional[int] = None
    use_attention_bias: bool = False
    # Reference parity: Keras deletes key/value masks and masks query ROWS
    # only (multihead_attention.py:368-372), so padded keys participate in
    # the softmax. mask_kv=True additionally masks padded KV columns
    # (strictly more correct, but diverges from published checkpoints).
    mask_kv: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        relpe: jax.Array,
        *,
        mask: Optional[jax.Array] = None,
        content_attention_bias=None,
        positional_attention_bias=None,
        memory_state=None,
        use_causal_mask: bool = False,
        train: bool = False,
    ):
        kv_mask = mask if self.mask_kv else None
        out = x
        if self.norm_position == "pre":
            out = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32, name="ln")(out)
        common = dict(
            num_heads=self.num_heads,
            key_dim=self.head_size,
            output_dim=self.dmodel,
            dropout=self.dropout,
            memory_length=self.memory_length,
            chunk_size=self.chunk_size,
            history_size=self.history_size,
            dtype=self.dtype,
        )
        if self.mha_type == "relmha":
            out, new_memory = MultiHeadRelativeAttention(
                use_attention_bias=self.use_attention_bias, causal=self.relmha_causal, name="mhsa", **common
            )(
                out,
                out,
                relpe=relpe,
                content_attention_bias=content_attention_bias,
                positional_attention_bias=positional_attention_bias,
                query_mask=mask,
                kv_mask=kv_mask,
                use_causal_mask=use_causal_mask,
                memory_state=memory_state,
                train=train,
            )
        else:
            out, new_memory = MultiHeadAttention(name="mhsa", **common)(
                out, out, query_mask=mask, kv_mask=kv_mask, use_causal_mask=use_causal_mask, memory_state=memory_state, train=train
            )
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        if self.norm_position == "post":
            out = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32, name="ln")(out)
        out = Residual(factor=self.residual_factor, dtype=self.dtype, name="residual")(x, out)
        return out, new_memory


class ConvModule(nn.Module):
    """LN → pointwise 2x → GLU → depthwise causal conv → BN/LN → swish →
    pointwise → dropout → residual."""

    input_dim: int
    kernel_size: int = 32
    dropout: float = 0.0
    padding: str = "causal"
    scale_factor: int = 2
    residual_factor: float = 1.0
    norm_position: str = "pre"
    dw_norm_type: str = "batch"
    use_group_conv: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, pad_mask: Optional[jax.Array] = None, train: bool = False) -> jax.Array:
        d = self.input_dim
        if (
            self.norm_position == "pre"
            and self.dw_norm_type == "batch"
            and self.scale_factor == 2
            and not self.use_group_conv
            and pad_mask is None
            and not isinstance(self.residual_factor, str)
            and _use_fused_conv(x.shape[1], d, self.kernel_size, self.padding)
        ):
            # fused Pallas path (ops/pallas/conv_kernel.py): F1 kernel →
            # XLA depthwise conv + batch stats (exact flax-BatchNorm
            # semantics + running update) → F2 kernel; params mirror the
            # XLA submodules
            from tensorflowasr_tpu.ops.pallas.conv_kernel import conv_back, conv_front, depthwise_conv1d

            gamma, beta = _LNParams(name="ln")(d)
            k1, c1 = _ConvParams((1, d, 2 * d), name="pw_conv_1")()
            kd, cd = _ConvParams((self.kernel_size, 1, d), name="dw_conv")()
            k2, c2 = _ConvParams((1, d, d), name="pw_conv_2")()
            dt = self.dtype
            w1 = k1[0]
            glu = conv_front(
                x,
                gamma,
                beta,
                w1[:, :d].astype(dt),
                c1[:d].astype(dt),
                w1[:, d:].astype(dt),
                c1[d:].astype(dt),
            )
            y1 = depthwise_conv1d(glu, kd[:, 0, :].astype(dt), cd.astype(dt), self.padding)
            if train:
                y1f = y1.astype(jnp.float32)
                bm = jnp.mean(y1f, axis=(0, 1))
                bv = jnp.mean(jnp.square(y1f), axis=(0, 1)) - jnp.square(bm)  # flax use_fast_variance
            else:
                bm = bv = None
            scale, bias, mean, var = _BNParams(d, name="dw_norm")(bm, bv, train=train)
            rate = float(self.dropout) if train else 0.0
            if rate > 0:
                seed = jax.random.randint(self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
            else:
                seed = jnp.zeros((), jnp.int32)
            return conv_back(
                x, y1, mean, var, scale, bias, k2[0].astype(dt), c2.astype(dt), seed, rate, float(self.residual_factor)
            )
        out = x
        if self.norm_position == "pre":
            out = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32, name="ln")(out)
        out = Conv1D(filters=self.scale_factor * self.input_dim, kernel_size=1, padding="valid", dtype=self.dtype, name="pw_conv_1")(out)
        out = GLU(name="glu")(out)
        if pad_mask is not None:
            # zero padded frames so the depthwise conv window and batch norm
            # statistics never mix in garbage
            out = out * pad_mask[..., None].astype(out.dtype)
        if self.use_group_conv:
            out = Conv1D(
                filters=self.input_dim, kernel_size=self.kernel_size, padding=self.padding, groups=self.input_dim, dtype=self.dtype, name="dw_conv"
            )(out)
        else:
            out = DepthwiseConv1D(kernel_size=self.kernel_size, padding=self.padding, dtype=self.dtype, name="dw_conv")(out)
        out = Norm(kind=self.dw_norm_type, dtype=self.dtype, name="dw_norm")(out, train=train)
        out = nn.swish(out)
        out = Conv1D(filters=self.input_dim, kernel_size=1, padding="valid", dtype=self.dtype, name="pw_conv_2")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        if self.norm_position == "post":
            out = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32, name="ln")(out)
        return Residual(factor=self.residual_factor, dtype=self.dtype, name="residual")(x, out)


class ConformerBlock(nn.Module):
    input_dim: int
    dropout: float = 0.0
    ffm_scale_factor: int = 4
    ffm_residual_factor: float = 0.5
    head_size: int = 36
    num_heads: int = 4
    mha_type: str = "relmha"
    mhsam_residual_factor: float = 1.0
    mhsam_use_attention_bias: bool = False
    mhsam_causal: bool = False
    kernel_size: int = 32
    padding: str = "causal"
    convm_scale_factor: int = 2
    convm_residual_factor: float = 1.0
    convm_use_group_conv: bool = False
    convm_dw_norm_type: str = "batch"
    # Reference parity: the reference ConvModule receives no mask (Keras
    # masks are destroyed upstream), so padded frames flow through convs/BN.
    # convm_mask_pad=True zeroes them (cleaner BN stats; non-parity).
    convm_mask_pad: bool = False
    module_norm_position: str = "pre"
    block_norm_position: str = "post"
    memory_length: Optional[int] = None
    history_size: Optional[int] = None
    chunk_size: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        relpe: jax.Array,
        mask: Optional[jax.Array] = None,
        content_attention_bias=None,
        positional_attention_bias=None,
        memory_state=None,
        use_causal_mask: bool = False,
        train: bool = False,
    ):
        if self.block_norm_position == "pre":
            x = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32, name="ln_pre")(x)
        x = FFModule(
            input_dim=self.input_dim,
            dropout=self.dropout,
            scale_factor=self.ffm_scale_factor,
            residual_factor=self.ffm_residual_factor,
            norm_position=self.module_norm_position,
            dtype=self.dtype,
            name="ff_module_1",
        )(x, train=train)
        x, new_memory = MHSAModule(
            dmodel=self.input_dim,
            head_size=self.head_size,
            num_heads=self.num_heads,
            residual_factor=self.mhsam_residual_factor,
            dropout=self.dropout,
            mha_type=self.mha_type,
            relmha_causal=self.mhsam_causal,
            norm_position=self.module_norm_position,
            memory_length=self.memory_length,
            history_size=self.history_size,
            chunk_size=self.chunk_size,
            use_attention_bias=self.mhsam_use_attention_bias,
            dtype=self.dtype,
            name="mhsa_module",
        )(
            x,
            relpe,
            mask=mask,
            content_attention_bias=content_attention_bias,
            positional_attention_bias=positional_attention_bias,
            memory_state=memory_state,
            use_causal_mask=use_causal_mask,
            train=train,
        )
        x = ConvModule(
            input_dim=self.input_dim,
            kernel_size=self.kernel_size,
            dropout=self.dropout,
            padding=self.padding,
            scale_factor=self.convm_scale_factor,
            residual_factor=self.convm_residual_factor,
            norm_position=self.module_norm_position,
            dw_norm_type=self.convm_dw_norm_type,
            use_group_conv=self.convm_use_group_conv,
            dtype=self.dtype,
            name="conv_module",
        )(x, pad_mask=mask if self.convm_mask_pad else None, train=train)
        x = FFModule(
            input_dim=self.input_dim,
            dropout=self.dropout,
            scale_factor=self.ffm_scale_factor,
            residual_factor=self.ffm_residual_factor,
            norm_position=self.module_norm_position,
            dtype=self.dtype,
            name="ff_module_2",
        )(x, train=train)
        if self.block_norm_position == "post":
            x = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32, name="ln_post")(x)
        return x, new_memory


class ConformerEncoder(nn.Module):
    """Full Conformer encoder. ``__call__(features [B,T,F(,C)], lengths)``
    → ``(encoded [B,T',D], lengths', states)``."""

    subsampling: dict
    dmodel: int = 144
    num_blocks: int = 16
    mha_type: str = "relmha"
    head_size: int = 36
    num_heads: int = 4
    kernel_size: int = 32
    padding: str = "causal"
    interleave_relpe: bool = True
    use_attention_causal_mask: bool = False
    use_attention_auto_mask: bool = True
    ffm_scale_factor: int = 4
    ffm_residual_factor: float = 0.5
    mhsam_residual_factor: float = 1.0
    mhsam_use_attention_bias: bool = False
    mhsam_causal: bool = False
    convm_scale_factor: int = 2
    convm_residual_factor: float = 1.0
    convm_use_group_conv: bool = False
    convm_dw_norm_type: str = "batch"
    dropout: float = 0.1
    module_norm_position: str = "pre"
    block_norm_position: str = "post"
    memory_length: Optional[int] = None
    history_size: Optional[int] = None
    chunk_size: Optional[int] = None
    use_remat: bool = False
    dtype: Any = jnp.float32

    @property
    def time_reduction_factor(self) -> int:
        return build_subsampling(self.subsampling).time_reduction_factor

    @nn.nowrap
    def output_length(self, length):
        return build_subsampling(self.subsampling).output_length(length)

    @nn.nowrap
    def init_state(self, batch: int) -> Optional[list]:
        """Initial per-block KV memory states (None when memory disabled)."""
        if self.memory_length is None:
            return None
        return [MemoryState.init(batch, self.memory_length, self.dmodel) for _ in range(self.num_blocks)]

    @nn.compact
    def __call__(
        self,
        features: jax.Array,
        features_length: jax.Array,
        initial_state: Optional[list] = None,
        train: bool = False,
    ):
        if features.ndim == 3:
            features = features[..., None]  # [B, T, F, 1]
        x, out_length = build_subsampling(self.subsampling, dtype=self.dtype)(features, features_length, train=train)
        x = nn.Dense(self.dmodel, dtype=self.dtype, param_dtype=jnp.float32, name="linear")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        if self.mha_type == "relmha":
            x, relpe = RelativeSinusoidalPositionalEncoding(
                interleave=self.interleave_relpe, memory_length=self.memory_length, causal=self.mhsam_causal, dtype=self.dtype, name="relpe"
            )(x, out_length, train=train)
        else:
            x, relpe = SinusoidalPositionalEncoding(interleave=self.interleave_relpe, dtype=self.dtype, name="pe")(x, out_length, train=train)

        if self.mha_type == "relmha" and not self.mhsam_use_attention_bias:
            content_bias = self.param("content_attention_bias", nn.initializers.zeros, (self.num_heads, self.head_size), jnp.float32)
            positional_bias = self.param("positional_attention_bias", nn.initializers.zeros, (self.num_heads, self.head_size), jnp.float32)
        else:
            content_bias = positional_bias = None

        mask = sequence_mask(out_length, x.shape[1]) if self.use_attention_auto_mask else None

        block_cls = ConformerBlock
        if self.use_remat:
            # args: (self=0, x=1, relpe=2, mask=3, cbias=4, pbias=5,
            #        memory_state=6, use_causal_mask=7, train=8)
            block_cls = nn.remat(ConformerBlock, static_argnums=(7, 8), prevent_cse=False)

        new_states = []
        for i in range(self.num_blocks):
            mem = None if initial_state is None else initial_state[i]
            x, new_mem = block_cls(
                input_dim=self.dmodel,
                dropout=self.dropout,
                ffm_scale_factor=self.ffm_scale_factor,
                ffm_residual_factor=self.ffm_residual_factor,
                head_size=self.head_size,
                num_heads=self.num_heads,
                mha_type=self.mha_type,
                mhsam_residual_factor=self.mhsam_residual_factor,
                mhsam_use_attention_bias=self.mhsam_use_attention_bias,
                mhsam_causal=self.mhsam_causal,
                kernel_size=self.kernel_size,
                padding=self.padding,
                convm_scale_factor=self.convm_scale_factor,
                convm_residual_factor=self.convm_residual_factor,
                convm_use_group_conv=self.convm_use_group_conv,
                convm_dw_norm_type=self.convm_dw_norm_type,
                module_norm_position=self.module_norm_position,
                block_norm_position=self.block_norm_position,
                memory_length=self.memory_length,
                history_size=self.history_size,
                chunk_size=self.chunk_size,
                dtype=self.dtype,
                name=f"block_{i}",
            )(
                x,
                relpe,
                mask,
                content_bias,
                positional_bias,
                mem,
                self.use_attention_causal_mask,
                train,
            )
            if new_mem is not None:
                new_states.append(new_mem)

        return x, out_length, (new_states if new_states else None)
