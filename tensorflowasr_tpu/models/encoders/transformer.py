"""Transformer encoder: subsampling → linear → (rel)PE → N×(MHSA + FFN).

Structure parity with the reference
(``tensorflow_asr/models/encoders/transformer.py``): PointwiseFFN (:27),
TransformerBlock = MHSA module + pointwise FFN with configurable norm
position/residual factor (:64), TransformerEncoder (:196) sharing the same
streaming machinery (chunked masks, KV memory) as Conformer.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tensorflowasr_tpu.models.encoders.conformer import MHSAModule, build_subsampling
from tensorflowasr_tpu.models.layers.attention import MemoryState
from tensorflowasr_tpu.models.layers.general import get_activation, sequence_mask
from tensorflowasr_tpu.models.layers.positional import RelativeSinusoidalPositionalEncoding, SinusoidalPositionalEncoding
from tensorflowasr_tpu.models.layers.residual import Residual


class PointwiseFFN(nn.Module):
    dmodel: int
    dff: int
    activation: str = "relu"
    dropout: float = 0.1
    norm_position: str = "post"
    residual_factor: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out = x
        if self.norm_position == "pre":
            out = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32, name="ln")(out)
        out = nn.Dense(self.dff, dtype=self.dtype, param_dtype=jnp.float32, name="ffn_1")(out)
        out = get_activation(self.activation)(out)
        out = nn.Dense(self.dmodel, dtype=self.dtype, param_dtype=jnp.float32, name="ffn_2")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        if self.norm_position == "post":
            out = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32, name="ln")(out)
        return Residual(factor=self.residual_factor, dtype=self.dtype, name="residual")(x, out)


class TransformerBlock(nn.Module):
    dmodel: int
    dff: int
    num_heads: int
    head_size: int
    mha_type: str = "mha"
    relmha_causal: bool = False
    norm_position: str = "post"
    residual_factor: float = 1.0
    pwffn_activation: str = "relu"
    dropout: float = 0.1
    memory_length: Optional[int] = None
    history_size: Optional[int] = None
    chunk_size: Optional[int] = None
    use_attention_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        relpe: jax.Array,
        *,
        mask=None,
        content_attention_bias=None,
        positional_attention_bias=None,
        memory_state=None,
        use_causal_mask: bool = False,
        train: bool = False,
    ):
        x, new_memory = MHSAModule(
            dmodel=self.dmodel,
            head_size=self.head_size,
            num_heads=self.num_heads,
            residual_factor=self.residual_factor,
            dropout=self.dropout,
            mha_type=self.mha_type,
            relmha_causal=self.relmha_causal,
            norm_position=self.norm_position,
            memory_length=self.memory_length,
            history_size=self.history_size,
            chunk_size=self.chunk_size,
            use_attention_bias=self.use_attention_bias,
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
        x = PointwiseFFN(
            dmodel=self.dmodel,
            dff=self.dff,
            activation=self.pwffn_activation,
            dropout=self.dropout,
            norm_position=self.norm_position,
            residual_factor=self.residual_factor,
            dtype=self.dtype,
            name="pwffn",
        )(x, train=train)
        return x, new_memory


class TransformerEncoder(nn.Module):
    subsampling: dict
    num_blocks: int = 6
    dmodel: int = 512
    dff: int = 1024
    num_heads: int = 4
    head_size: int = 128
    dropout: float = 0.1
    mha_type: str = "mha"
    relmha_causal: bool = False
    norm_position: str = "post"
    residual_factor: float = 1.0
    interleave_relpe: bool = True
    use_attention_causal_mask: bool = False
    use_attention_auto_mask: bool = True
    use_attention_bias: bool = False
    pwffn_activation: str = "relu"
    memory_length: Optional[int] = None
    history_size: Optional[int] = None
    chunk_size: Optional[int] = None
    dtype: Any = jnp.float32

    @property
    def time_reduction_factor(self) -> int:
        return build_subsampling(self.subsampling).time_reduction_factor

    @nn.nowrap
    def output_length(self, length):
        return build_subsampling(self.subsampling).output_length(length)

    @nn.nowrap
    def init_state(self, batch: int):
        if self.memory_length is None:
            return None
        return [MemoryState.init(batch, self.memory_length, self.dmodel) for _ in range(self.num_blocks)]

    @nn.compact
    def __call__(self, features: jax.Array, features_length: jax.Array, initial_state: Optional[list] = None, train: bool = False):
        if features.ndim == 3:
            features = features[..., None]
        x, out_length = build_subsampling(self.subsampling, dtype=self.dtype)(features, features_length, train=train)
        x = nn.Dense(self.dmodel, dtype=self.dtype, param_dtype=jnp.float32, name="linear")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        if self.mha_type == "relmha":
            x, relpe = RelativeSinusoidalPositionalEncoding(
                interleave=self.interleave_relpe, memory_length=self.memory_length, causal=self.relmha_causal, dtype=self.dtype, name="relpe"
            )(x, out_length, train=train)
        else:
            # absolute PE scaled by sqrt(dmodel) (reference transformer.py)
            x, relpe = SinusoidalPositionalEncoding(
                interleave=self.interleave_relpe, scale=float(self.dmodel) ** 0.5, dtype=self.dtype, name="pe"
            )(x, out_length, train=train)

        mask = sequence_mask(out_length, x.shape[1]) if self.use_attention_auto_mask else None

        new_states = []
        for i in range(self.num_blocks):
            mem = None if initial_state is None else initial_state[i]
            x, new_mem = TransformerBlock(
                dmodel=self.dmodel,
                dff=self.dff,
                num_heads=self.num_heads,
                head_size=self.head_size,
                mha_type=self.mha_type,
                relmha_causal=self.relmha_causal,
                norm_position=self.norm_position,
                residual_factor=self.residual_factor,
                pwffn_activation=self.pwffn_activation,
                dropout=self.dropout,
                memory_length=self.memory_length,
                history_size=self.history_size,
                chunk_size=self.chunk_size,
                use_attention_bias=self.use_attention_bias,
                dtype=self.dtype,
                name=f"block_{i}",
            )(
                x,
                relpe,
                mask=mask,
                memory_state=mem,
                use_causal_mask=self.use_attention_causal_mask,
                train=train,
            )
            if new_mem is not None:
                new_states.append(new_mem)
        return x, out_length, (new_states if new_states else None)
