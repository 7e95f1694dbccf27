"""Multi-head attention: vanilla + Transformer-XL relative, with streaming
chunk masks and bounded KV memory.

Semantics ported from behavior of the reference
(``tensorflow_asr/models/layers/multihead_attention.py``):
  - ``rel_left_shift`` (:27-77): Transformer-XL relative-shift trick, causal
    (R = M+T) and non-causal (R = M+2T-1 → sliced to M+T) variants
  - ``compute_streaming_mask`` (:104-143): chunked visibility per
    http://arxiv.org/abs/2010.11395 — queries see their whole chunk plus
    ``history_size`` frames before the chunk start (-1 = unlimited)
  - ``Memory`` (layers/memory.py:32-85): fixed-length KV cache prepended to
    keys/values, new memory = last ``memory_length`` positions, gradients
    stopped in training
  - relative attention with content/positional bias vectors (:459-582),
    either per-layer parameters or encoder-global ones passed in

Unlike the reference (which only masks query rows), padded KV columns are
masked too — strictly more correct under padding.

Everything is jit-safe with static shapes; masks are boolean and merged with
logical AND. Scores softmax in float32 for bf16 stability.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tensorflowasr_tpu.utils import math_util


def _use_fused_attention(t: int, s: int) -> bool:
    """Fused Pallas softmax/PV kernel dispatch (TFASR_ATTN_IMPL=auto|pallas|xla).

    Measured motivation: the XLA score/softmax chain costs 48.5 ms of the
    121 ms bs16 Conformer-S train step (scripts_dev/profile_components.py),
    almost all of it HBM traffic on [B,H,T,S]-shaped f32 intermediates.
    """
    impl = os.environ.get("TFASR_ATTN_IMPL", "auto").lower()
    if impl == "xla":
        return False
    from tensorflowasr_tpu.ops.pallas.attention_kernel import attention_shapes_supported

    return attention_shapes_supported(t, s)


def _use_rel_fused_attention(t: int, s: int, r: int) -> bool:
    """Kernel-B dispatch: fully-fused relative attention (in-kernel rel
    shift) — preferred over the bias-as-input kernel, whose per-block
    [B,H,T,S] bias materialization measured roughly break-even with XLA."""
    impl = os.environ.get("TFASR_ATTN_IMPL", "auto").lower()
    if impl == "xla":
        return False
    from tensorflowasr_tpu.ops.pallas.attention_kernel import rel_attention_shapes_supported

    return rel_attention_shapes_supported(t, s, r)


def _fused_attend(q, k, v, bias_bhts, dropout_rate, dropout_key):
    """[B,T,N,H] q / [B,S,N,H] k,v + additive bias [B,N,T,S] → [B,T,N,H]."""
    from tensorflowasr_tpu.ops.pallas.attention_kernel import fused_attention

    b, t, n, h = q.shape
    s = k.shape[1]
    qf = q.transpose(0, 2, 1, 3).reshape(b * n, t, h)
    kf = k.transpose(0, 2, 1, 3).reshape(b * n, s, h)
    vf = v.transpose(0, 2, 1, 3).reshape(b * n, s, h)
    if bias_bhts.shape[0] == 1 and bias_bhts.shape[1] == 1:
        bias = bias_bhts.reshape(1, t, s)  # kernel broadcasts a leading-1 bias
    elif bias_bhts.shape[0] * bias_bhts.shape[1] == b * n:
        bias = bias_bhts.reshape(b * n, t, s)
    else:
        bias = jnp.broadcast_to(bias_bhts, (b, n, t, s)).reshape(b * n, t, s)
    if dropout_rate > 0.0 and dropout_key is not None:
        seed = jax.random.randint(dropout_key, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    else:
        seed = jnp.zeros((), jnp.int32)
        dropout_rate = 0.0
    out = fused_attention(qf, kf, vf, bias, seed, float(dropout_rate))
    return out.reshape(b, n, t, h).transpose(0, 2, 1, 3)


def rel_left_shift(x: jax.Array, causal: bool = False) -> jax.Array:
    """Relative shift [B, N, T, R] → [B, N, T, R(causal) | R(sliced later)].

    causal: R = M+T positions (0 is most distant past) → output [B,N,T,M+T]
    non-causal: R = M+2T-1 positions → output [B,N,T,M+T] after the caller
    slices the last S columns.
    """
    b, n, t, r = x.shape
    if causal:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
        x = x.reshape(b, n, -1)
        x = jnp.pad(x, ((0, 0), (0, 0), (r - t, 0)))
        x = x.reshape(b, n, 1 + t, r)
        x = x[:, :, 1:, :]
    else:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
        x = x.reshape(b, n, -1)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, r - t)))
        x = x.reshape(b, n, 1 + t, r)
        x = x[:, :, :t, (t - 1):]
    return x


def compute_causal_mask(t: int, s: int) -> jax.Array:
    """[T, S] lower-triangular (aligned at the end: query i sees keys ≤ i+(S-T))."""
    return jnp.tril(jnp.ones((t, s), bool), k=s - t)


def compute_streaming_mask(chunk_size: int, history_size: int, t: int, s: int) -> jax.Array:
    """[T, S] chunked-attention visibility (reference :104-143).

    Query i (chunk c = i // chunk_size) sees keys whose *frame* coordinate is
    in [c·chunk − history, c·chunk + chunk). When S > T the first S−T key
    columns are prepended memory: they sit at negative relative frames
    (column j ↦ frame j − (S−T), same end-alignment as the causal mask) and
    therefore count toward the history window. ``history_size < 0`` means
    unlimited history.
    """
    hist = s if history_size < 0 else history_size
    offset = s - t  # prepended memory columns
    chunk_start = (jnp.arange(t) // chunk_size) * chunk_size
    start = chunk_start - hist
    end = chunk_start + chunk_size
    cols = jnp.arange(s) - offset
    return (cols[None, :] >= start[:, None]) & (cols[None, :] < end[:, None])


def _merge_masks(
    batch: int,
    t: int,
    s: int,
    query_mask: Optional[jax.Array],
    kv_mask: Optional[jax.Array],
    attention_mask: Optional[jax.Array],
    use_causal_mask: bool,
    chunk_size: Optional[int],
    history_size: Optional[int],
) -> Optional[jax.Array]:
    """Combine all masks → [B, 1, T, S] bool or None."""
    mask = None

    def land(a, b):
        return b if a is None else (a & b)

    if query_mask is not None:
        mask = land(mask, query_mask[:, None, :, None])
    if kv_mask is not None:
        mask = land(mask, kv_mask[:, None, None, :])
    if use_causal_mask:
        mask = land(mask, compute_causal_mask(t, s)[None, None])
    if chunk_size is not None and history_size is not None:
        mask = land(mask, compute_streaming_mask(chunk_size, history_size, t, s)[None, None])
    if attention_mask is not None:
        am = attention_mask if attention_mask.ndim == 4 else attention_mask[:, None]
        mask = land(mask, am)
    return mask


def _masked_softmax(scores: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """Softmax over the last axis in f32 with an ADDITIVE −1e9 mask.

    Keras-Softmax parity: masked positions get −1e9 added (not replaced), so
    a fully-masked row degrades to a plain softmax of its raw scores rather
    than zeros/uniform — padded query rows then produce the same values the
    reference produces, which matters because later blocks consume them as
    (unmasked) attention keys.
    """
    dtype = scores.dtype
    scores = scores.astype(jnp.float32)
    if mask is not None:
        scores = scores + (1.0 - mask.astype(jnp.float32)) * jnp.float32(-1e9)
    probs = jax.nn.softmax(scores, axis=-1)
    return probs.astype(dtype)


class MemoryState:
    """Helpers for the KV memory pytree: {"k": [B,M,D], "v": [B,M,D], "mask": [B,M]}."""

    @staticmethod
    def init(batch: int, memory_length: int, dmodel: int, dtype=jnp.float32) -> dict:
        return {
            "k": jnp.zeros((batch, memory_length, dmodel), dtype),
            "v": jnp.zeros((batch, memory_length, dmodel), dtype),
            "mask": jnp.zeros((batch, memory_length), bool),
        }


class MultiHeadAttention(nn.Module):
    """MHA with optional causal/streaming masks and KV memory.

    Inputs are raw (unprojected) q/v/k of dim D; output is projected back to
    ``output_dim`` (defaults to D).
    """

    num_heads: int
    key_dim: int
    value_dim: Optional[int] = None
    output_dim: Optional[int] = None
    dropout: float = 0.0
    use_bias: bool = True
    memory_length: Optional[int] = None
    chunk_size: Optional[int] = None
    history_size: Optional[int] = None
    dtype: Any = jnp.float32

    def _proj(self, name: str, x: jax.Array, head_dim: int) -> jax.Array:
        return nn.DenseGeneral(
            features=(self.num_heads, head_dim),
            axis=-1,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )(x)

    def _out_proj(self, x: jax.Array, output_dim: int) -> jax.Array:
        return nn.DenseGeneral(
            features=output_dim,
            axis=(-2, -1),
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="output",
        )(x)

    def _apply_memory(self, key, value, kv_mask, memory_state, train: bool):
        """Prepend memory to k/v; emit new memory (last M positions)."""
        if self.memory_length is None or memory_state is None:
            return key, value, kv_mask, None
        m = memory_state
        mem_k, mem_v, mem_mask = m["k"].astype(key.dtype), m["v"].astype(value.dtype), m["mask"]
        if train:
            mem_k = jax.lax.stop_gradient(mem_k)
            mem_v = jax.lax.stop_gradient(mem_v)
        new_key = jnp.concatenate([mem_k, key], axis=1)
        new_value = jnp.concatenate([mem_v, value], axis=1)
        if kv_mask is None:
            kv_mask = jnp.ones(key.shape[:2], bool)
        new_mask = jnp.concatenate([mem_mask, kv_mask], axis=1)
        new_state = {
            "k": new_key[:, -self.memory_length:, :],
            "v": new_value[:, -self.memory_length:, :],
            "mask": new_mask[:, -self.memory_length:],
        }
        return new_key, new_value, new_mask, new_state

    def _attend(self, q, k, v, mask, train: bool):
        scale = jnp.asarray(1.0 / jnp.sqrt(self.key_dim), q.dtype)
        t, s = q.shape[1], k.shape[1]
        if _use_fused_attention(t, s):
            if mask is None:
                bias = jnp.zeros((1, 1, t, s), q.dtype)
            else:
                bias = (1.0 - mask.astype(jnp.float32)) * jnp.float32(-1e9)
                bias = jnp.broadcast_to(bias, bias.shape[:2] + (t, s)).astype(q.dtype)
            rate = self.dropout if train else 0.0
            key = self.make_rng("dropout") if rate > 0 else None
            return _fused_attend(q * scale, k, v, bias, rate, key)
        scores = jnp.einsum("BTNH,BSNH->BNTS", q * scale, k)
        probs = _masked_softmax(scores, mask)
        if self.dropout > 0:
            probs = nn.Dropout(self.dropout, deterministic=not train)(probs)
        return jnp.einsum("BNTS,BSNH->BTNH", probs, v)

    @nn.compact
    def __call__(
        self,
        query: jax.Array,
        value: jax.Array,
        key: Optional[jax.Array] = None,
        *,
        query_mask: Optional[jax.Array] = None,
        kv_mask: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        use_causal_mask: bool = False,
        memory_state: Optional[dict] = None,
        train: bool = False,
    ):
        if key is None:
            key = value
        key, value, kv_mask, new_memory = self._apply_memory(key, value, kv_mask, memory_state, train)

        q = self._proj("query", query, self.key_dim)
        k = self._proj("key", key, self.key_dim)
        v = self._proj("value", value, self.value_dim or self.key_dim)

        mask = _merge_masks(
            query.shape[0], query.shape[1], key.shape[1], query_mask, kv_mask, attention_mask, use_causal_mask, self.chunk_size, self.history_size
        )
        out = self._attend(q, k, v, mask, train)
        out = self._out_proj(out, self.output_dim or query.shape[-1])
        return out, new_memory

    def init_memory(self, batch: int, dmodel: int) -> Optional[dict]:
        if self.memory_length is None:
            return None
        return MemoryState.init(batch, self.memory_length, dmodel)


class MultiHeadRelativeAttention(MultiHeadAttention):
    """Transformer-XL relative-position MHA (reference :459-582).

    ``relpe`` is the relative positional encoding [B, R, D] produced by
    ``RelativeSinusoidalPositionalEncoding`` — R = M+2T-1 (non-causal) or
    M+T (causal). Content/positional biases [N, H] are per-layer parameters
    when ``use_attention_bias`` else passed in (encoder-global, Conformer
    style) or zero.
    """

    use_attention_bias: bool = False
    causal: bool = False

    @nn.compact
    def __call__(  # type: ignore[override]
        self,
        query: jax.Array,
        value: jax.Array,
        key: Optional[jax.Array] = None,
        *,
        relpe: jax.Array,
        content_attention_bias: Optional[jax.Array] = None,
        positional_attention_bias: Optional[jax.Array] = None,
        query_mask: Optional[jax.Array] = None,
        kv_mask: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        use_causal_mask: bool = False,
        memory_state: Optional[dict] = None,
        train: bool = False,
    ):
        if key is None:
            key = value
        key, value, kv_mask, new_memory = self._apply_memory(key, value, kv_mask, memory_state, train)

        q = self._proj("query", query, self.key_dim)
        k = self._proj("key", key, self.key_dim)
        v = self._proj("value", value, self.value_dim or self.key_dim)
        pos = self._proj("encoding", relpe.astype(self.dtype), self.key_dim)  # [B, R, N, H]

        if self.use_attention_bias:
            cbias = self.param("content_attention_bias", nn.initializers.zeros, (self.num_heads, self.key_dim), jnp.float32)
            pbias = self.param("positional_attention_bias", nn.initializers.zeros, (self.num_heads, self.key_dim), jnp.float32)
        else:
            cbias = content_attention_bias if content_attention_bias is not None else jnp.zeros((self.num_heads, self.key_dim), jnp.float32)
            pbias = positional_attention_bias if positional_attention_bias is not None else jnp.zeros((self.num_heads, self.key_dim), jnp.float32)

        scale = jnp.asarray(1.0 / jnp.sqrt(self.key_dim), q.dtype)
        content_q = (q + cbias.astype(q.dtype)) * scale
        positional_q = (q + pbias.astype(q.dtype)) * scale

        b, t = query.shape[0], query.shape[1]
        s, r = key.shape[1], relpe.shape[1]
        n, hd = self.num_heads, self.key_dim
        if _use_rel_fused_attention(t, s, r) and attention_mask is None:
            # kernel B: content scores + in-kernel rel-shifted positional
            # term + visibility + softmax(+dropout) + PV, one VMEM pass per
            # (b·h); no score-shaped tensor touches HBM. The Keras-parity
            # query-row mask adds −1e9 to every column of a padded row —
            # softmax-invariant — so only KV-column masks are passed.
            from tensorflowasr_tpu.ops.pallas.attention_kernel import fused_rel_attention

            fold = lambda x: x.transpose(0, 2, 1, 3).reshape(b * n, x.shape[1], hd)
            kv_bias = None
            if kv_mask is not None:
                kv_bias = ((1.0 - kv_mask.astype(jnp.float32)) * jnp.float32(-1e9))[:, None, :]
            # the query-row term must be applied even alone: −1e9 in f32
            # absorbs O(1) scores (ulp(1e9)=64), so reference masked rows
            # attend ~uniformly — reproduced by the same in-kernel add.
            # Framework masks are length-prefix masks (lengths threading),
            # so the row validity collapses to a per-batch LENGTH riding the
            # kernel's scalar-prefetch channel — a [B, T, 1] f32 operand
            # would lane-pad 128× on TPU (~99 MB HLO temp per block, bs128).
            q_len = jnp.sum(query_mask.astype(jnp.int32), axis=1) if query_mask is not None else None
            rate = float(self.dropout) if train else 0.0
            if rate > 0:
                seed = jax.random.randint(self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
            else:
                seed = jnp.zeros((), jnp.int32)
            out = fused_rel_attention(
                fold(content_q),
                fold(positional_q),
                fold(k),
                fold(v),
                fold(pos),
                kv_bias,
                q_len,
                seed,
                rate,
                bool(use_causal_mask),
                self.chunk_size,
                self.history_size,
                False,
                bool(self.causal),  # pe_causal: relpe length convention for the [..., -S:] slice
            )
            out = out.reshape(b, n, t, hd).transpose(0, 2, 1, 3)
        else:
            positional_scores = jnp.einsum("BTNH,BRNH->BNTR", positional_q, pos)
            positional_scores = rel_left_shift(positional_scores, causal=self.causal)
            positional_scores = positional_scores[..., positional_scores.shape[-1] - s:]
            mask = _merge_masks(
                b, t, s, query_mask, kv_mask, attention_mask, use_causal_mask, self.chunk_size, self.history_size
            )
            if _use_fused_attention(t, s):
                # kernel A fallback: positional term + mask as one additive
                # bias operand; fuses softmax(+dropout) + PV in VMEM
                bias = positional_scores
                if mask is not None:
                    bias = bias + ((1.0 - mask.astype(jnp.float32)) * jnp.float32(-1e9)).astype(bias.dtype)
                rate = self.dropout if train else 0.0
                key_rng = self.make_rng("dropout") if rate > 0 else None
                out = _fused_attend(content_q, k, v, bias, rate, key_rng)
            else:
                content_scores = jnp.einsum("BTNH,BSNH->BNTS", content_q, k)
                scores = content_scores + positional_scores
                probs = _masked_softmax(scores, mask)
                if self.dropout > 0:
                    probs = nn.Dropout(self.dropout, deterministic=not train)(probs)
                out = jnp.einsum("BNTS,BSNH->BTNH", probs, v)
        out = self._out_proj(out, self.output_dim or query.shape[-1])
        return out, new_memory
