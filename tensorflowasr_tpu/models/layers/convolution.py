"""Convolution layers with "causal" padding support.

Reference parity (``tensorflow_asr/models/layers/convolution.py:25-37``):
``causal`` padding left-pads EVERY spatial axis by ``dilation·(k−1)`` —
for Conv2D that includes the frequency axis (``width_pad`` in the
reference), not just time. Thin wrappers over ``flax.linen.Conv`` keeping
params f32 and compute in ``dtype``.

Strided Conv2D additionally has THREE opt-in GEMM lowerings — all recorded
NEGATIVE results on v5e; XLA's native conv lowering stays the default
(TFASR_CONV2D_IMPL=xla|auto). Motivation: XLA's TPU lowering of
small-channel strided convs runs ~5× over analytic on the subsampling
stack (8.7 ms for ~1.7 ms of math at bs16×16 s, where conv_0 has C_in=1).

- ``im2col`` (round 3): kt·kf strided SLICES + one MXU GEMM — the trick
  that cut the frontend's framing 13.3→6.0 ms (e193fa1). Measured 6.9×
  WORSE (subsample stack 68.7 vs 10.0 ms): unlike the frontend, whose
  slices keep a large lane dim, these patch tensors have tiny minor dims
  (9 for conv_0) that tile-pad to 128 lanes, and the sublane-strided
  slices/their pad-dilate VJPs become relayout copies.
- ``gemm`` (round 4): fixes im2col's diagnosed failure — conv_0 becomes kt
  time-strided slices (lane dim stays F=80) × ONE banded [kt·F, F', O]
  GEMM whose output lands in NHWC via dot_general (no patch tensors at
  all); conv_1 becomes kt·kf shifted slices each through a lane-dense
  [C, O] GEMM (true conv FLOPs). Components in isolation: conv_0
  5.75 vs 6.04 ms XLA (wins), conv_1 path dominated by the 9 slice
  VJPs. COMPOSED subsampling stack: 59.7 vs 11.0 ms — 5.4× WORSE.
- ``gemm1`` (round 4): banded GEMM for C_in=1 convs only, XLA conv
  elsewhere. Composed: 13.4 vs 11.0 ms — the isolated conv_0 win inverts
  at the layout boundary with the downstream BatchNorm/conv_1.
- ``rg``/``rg1`` (round 5): removes gemm's remaining strided ops
  entirely — the time stride-2 becomes a contiguous pair reshape
  [B, 2·(T'+1), F·C] → [B, T'+1, 2FC] plus ONE unit-stride shifted view,
  and the F stride + causal pads live inside a [n_rows·F·C, F'·O] weight
  built from the conv params at trace time. Isolated conv_0: parity with
  XLA (9.9 vs 9.3 ms, within that harness's run-to-run noise). COMPOSED:
  ``rg`` (both convs) 40.4 vs 9.4 ms — conv_1's dense-F weight
  materializes ~200 MB/step; ``rg1`` (conv_0 only) 14.8 vs 9.4 ms — the
  same layout-boundary inversion as gemm1.

Conclusion worth keeping: XLA's conv lowering composes (fuses BN/act,
plans layouts across ops) better than any hand lowering here; its ~5×
over-analytic cost at these shapes is the composed optimum of the
alternatives tried, not low-hanging fruit. Round-5 split measurement
(subsample 9.5 ms vs norm-free 8.0 ms) pins the two BatchNorms at
~1.5 ms — the convs dominate. The one untried structural win is a fully
fused two-conv VMEM-resident kernel (the conv_0 output is ~147 MB/step at
bs16; its HBM round-trips are the floor), which needs a two-pass design
for the BN batch stats. (scripts_dev/subsample_canary.py reproduces every
number above.)
"""

from __future__ import annotations

import os
from typing import Any, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp


def _conv2d_impl(padding) -> str:
    """Strided-Conv2D dispatch (TFASR_CONV2D_IMPL=auto|gemm|im2col|xla).

    ``im2col`` (patch concat + one GEMM) measured 6.9× SLOWER than XLA's
    native conv on v5e (see module docstring) and stays opt-in. ``gemm``
    is the round-4 second attempt: banded-GEMM lowering for C_in=1 convs
    (the MXU-hostile subsampling conv_0) and per-tap shifted block GEMMs
    for the rest — both keep every contraction lane-dense instead of the
    9-lane patches that sank im2col. String paddings other than "causal"
    always keep flax's conv."""
    impl = os.environ.get("TFASR_CONV2D_IMPL", "auto").lower()
    if impl not in ("gemm", "gemm1", "im2col", "rg", "rg1"):
        return "xla"
    if isinstance(padding, str) and padding.lower() not in ("causal",):
        return "xla"
    return impl


def _conv2d_im2col(x: jax.Array, kernel: jax.Array, bias, strides, pads, dtype) -> jax.Array:
    """[B, T, F, C] → [B, T', F', O] via kt·kf strided slices + one GEMM.

    ``pads``: explicit ((t0, t1), (f0, f1)); slice order (i-major, then j,
    then c) matches ``kernel.reshape(kt·kf·C, O)`` for flax's [kt, kf, C, O]
    kernel layout, so results equal ``nn.Conv`` up to float reassociation.
    """
    kt, kf, c, o = kernel.shape
    st, sf = strides
    xp = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
    b, tp, fp, _ = xp.shape
    t_out = (tp - kt) // st + 1
    f_out = (fp - kf) // sf + 1
    cols = [
        jax.lax.slice(xp, (0, i, j, 0), (b, i + st * (t_out - 1) + 1, j + sf * (f_out - 1) + 1, c), (1, st, sf, 1))
        for i in range(kt)
        for j in range(kf)
    ]
    patches = jnp.concatenate(cols, axis=-1).astype(dtype)  # [B, T', F', kt·kf·C]
    y = jax.lax.dot_general(
        patches.reshape(b * t_out * f_out, kt * kf * c),
        kernel.reshape(kt * kf * c, o).astype(dtype),
        (((1,), (0,)), ((), ())),
    )
    if bias is not None:
        y = y + bias.astype(dtype)
    return y.reshape(b, t_out, f_out, o)


def _conv2d_cin1_gemm(x: jax.Array, kernel: jax.Array, bias, strides, pads, dtype) -> jax.Array:
    """C_in=1 Conv2D as kt time-strided slices + ONE banded GEMM.

    The frequency axis is folded into the GEMM: W1[dt, fin, fo, c] =
    kernel[dt, df, 0, c] where ``fin == sf·fo + df − left_pad`` (zero
    elsewhere — the band also encodes the F padding). The input keeps its
    natural lane dim F (80 for the flagship frontend) through the slices
    and the contraction runs over kt·F lanes, so nothing tile-pads to a
    9-lane patch the way im2col did. ``dot_general``'s rhs keeps (fo, c)
    as separate output dims, so the result lands in NHWC layout directly.
    FLOPs grow kf·F/(kf·overlap) ≈ F/sf-fold vs the true conv, but the true
    conv is ~1 GFLOP here — the MXU eats the redundancy for free while the
    lowering stays copy-free.
    """
    kt, kf, cin, o = kernel.shape
    assert cin == 1
    st, sf = strides
    (t0, t1), (f0, f1) = pads
    b, t, f, _ = x.shape
    t_out = (t + t0 + t1 - kt) // st + 1
    f_out = (f + f0 + f1 - kf) // sf + 1
    # static band: P[df, fin, fo] = 1 iff fin == sf*fo + df - f0
    import numpy as _np

    p = _np.zeros((kf, f, f_out), _np.float32)
    for df in range(kf):
        for fo in range(f_out):
            src = sf * fo + df - f0
            if 0 <= src < f:
                p[df, src, fo] = 1.0
    w1 = jnp.einsum("dsf,tdc->tsfc", jnp.asarray(p), kernel[:, :, 0, :].astype(jnp.float32))
    w1 = w1.reshape(kt * f, f_out, o).astype(dtype)  # [kt·F, F', O]
    xp = jnp.pad(x[..., 0], ((0, 0), (t0, t1), (0, 0))).astype(dtype)  # [B, Tp, F]
    cols = [
        jax.lax.slice(xp, (0, dt, 0), (b, dt + st * (t_out - 1) + 1, f), (1, st, 1))
        for dt in range(kt)
    ]
    xcat = jnp.concatenate(cols, axis=-1)  # [B, T', kt·F]
    y = jax.lax.dot_general(xcat, w1, (((2,), (0,)), ((), ())))  # [B, T', F', O]
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def _conv2d_rg(x: jax.Array, kernel: jax.Array, bias, strides, pads, dtype) -> jax.Array:
    """Stride-2-in-time Conv2D with ZERO strided ops (round 5).

    Diagnosis behind it: every earlier lowering above — and XLA's own conv
    at these shapes — pays for stride-2 slices over minor dims (lane/
    sublane relayout copies dominate; the 9-FMA variant with no MXU at all
    still measured 6.3 ms vs a 0.4 ms HBM bound). Here the time stride-2
    is a contiguous pair reshape [B, 2·(T'+1), F·C] → [B, T'+1, 2FC] plus
    ONE unit-stride shifted view (concat → rows (2t', 2t'+1 | 2t'+2,
    2t'+3)), and the F stride + causal pads live inside a [n_rows·F·C,
    F'·O] weight matrix built from the conv params at trace time (time-row
    block r ↦ kernel tap dt=r; rows ≥ kt are zero). Dense-F duplication
    costs ~F/sf× the true conv FLOPs, but those are pure MXU work on one
    big GEMM (M=B·T', K=n_rows·F·C, N=F'·O) — ~47 GFLOP ≈ 0.25 ms at v5e
    peak for the flagship subsampling conv_0 — and fwd AND bwd touch only
    contiguous pads/reshapes/unit slices.
    """
    kt, kf, cin, o = kernel.shape
    st, sf = strides
    assert st == 2
    (t0, t1), (f0, f1) = pads
    b, t, f, _ = x.shape
    t_out = (t + t0 + t1 - kt) // st + 1
    f_out = (f + f0 + f1 - kf) // sf + 1
    n_rows = 2 * ((kt - 1) // 2 + 1)  # view rows spanning one output's taps
    import numpy as _np

    p = _np.zeros((kf, f, f_out), _np.float32)
    for df in range(kf):
        for fo in range(f_out):
            src = sf * fo + df - f0
            if 0 <= src < f:
                p[df, src, fo] = 1.0
    # [kt, F, C, F', O]; row order (tap, F, C) matches the pair-flattened input
    w = jnp.einsum("dsf,tdco->tscfo", jnp.asarray(p, dtype), kernel.astype(dtype))
    w = jnp.concatenate([w, jnp.zeros((n_rows - kt, f, cin, f_out, o), w.dtype)], 0)
    w = w.reshape(n_rows * f * cin, f_out * o)
    n_pairs = max(t_out + n_rows // 2 - 1, (t + t0 + 1) // 2)
    pad_r = 2 * n_pairs - (t + t0)
    xpt = jnp.pad(x, ((0, 0), (t0, pad_r), (0, 0), (0, 0))).astype(dtype)  # [B, 2·n_pairs, F, C]
    v = xpt.reshape(b, n_pairs, 2 * f * cin)
    xcat = jnp.concatenate([v[:, i : i + t_out] for i in range(n_rows // 2)], axis=-1)  # [B, T', n_rows·F·C]
    y = jax.lax.dot_general(xcat.reshape(b * t_out, n_rows * f * cin), w, (((1,), (0,)), ((), ())))
    if bias is not None:
        y = y + jnp.tile(bias.astype(dtype), f_out)
    return y.reshape(b, t_out, f_out, o)


def _conv2d_shifted_gemm(x: jax.Array, kernel: jax.Array, bias, strides, pads, dtype) -> jax.Array:
    """Conv2D as kt·kf shifted strided slices, each through a [C, O] GEMM.

    Every tap's contraction is the full lane-dense channel dim (144 for the
    flagship subsampling conv_1) — exactly the true conv FLOPs on the MXU,
    no patch concat. The slices stride the T (untiled) and F (sublane)
    dims; their VJPs are pad-dilates, which XLA handles per-tap.
    """
    kt, kf, cin, o = kernel.shape
    st, sf = strides
    (t0, t1), (f0, f1) = pads
    b, t, f, c = x.shape
    t_out = (t + t0 + t1 - kt) // st + 1
    f_out = (f + f0 + f1 - kf) // sf + 1
    xp = jnp.pad(x, ((0, 0), (t0, t1), (f0, f1), (0, 0))).astype(dtype)
    y = None
    for dt in range(kt):
        for df in range(kf):
            sl = jax.lax.slice(
                xp,
                (0, dt, df, 0),
                (b, dt + st * (t_out - 1) + 1, df + sf * (f_out - 1) + 1, c),
                (1, st, sf, 1),
            )  # [B, T', F', C]
            term = jax.lax.dot_general(sl, kernel[dt, df].astype(dtype), (((3,), (0,)), ((), ())))
            y = term if y is None else y + term
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def _norm_padding(padding: Union[str, Sequence], kernel_size: Sequence[int], dilation: Sequence[int], causal_axes: Sequence[int] = ()):
    """Map "causal" to explicit per-axis left pads; pass through others.

    Reference semantics (convolution.py:25-37): causal left-pads ALL
    spatial axes — time AND frequency for rank 2 (``causal_axes`` is kept
    for signature stability but every axis pads left).
    """
    if isinstance(padding, str) and padding.lower() == "causal":
        pads = []
        for i, k in enumerate(kernel_size):
            d = dilation[i] if i < len(dilation) else 1
            pads.append((d * (k - 1), 0))
        return pads
    return padding.upper() if isinstance(padding, str) else padding


class Conv1D(nn.Module):
    filters: int
    kernel_size: int
    strides: int = 1
    padding: Union[str, Sequence] = "same"
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, C]
        pad = _norm_padding(self.padding, (self.kernel_size,), (self.dilation,), causal_axes=(0,))
        return nn.Conv(
            features=self.filters,
            kernel_size=(self.kernel_size,),
            strides=(self.strides,),
            padding=pad,
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class Conv2D(nn.Module):
    filters: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Union[str, Sequence] = "same"
    dilation: Sequence[int] = (1, 1)
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, F, C]
        pad = _norm_padding(self.padding, tuple(self.kernel_size), tuple(self.dilation), causal_axes=(0,))
        conv = nn.Conv(
            features=self.filters,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=pad,
            kernel_dilation=tuple(self.dilation),
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        impl = _conv2d_impl(self.padding)
        if self.is_initializing() or tuple(self.dilation) != (1, 1) or impl == "xla":
            return conv(x)
        # GEMM fast paths on the SAME param tree (conv registered at init)
        params = self.get_variable("params", "Conv_0")
        kernel = params["kernel"]
        bias = params["bias"] if self.use_bias else None
        if impl in ("rg", "rg1"):
            if tuple(self.strides)[0] == 2 and (impl == "rg" or kernel.shape[2] == 1):
                return _conv2d_rg(x, kernel, bias, tuple(self.strides), tuple(pad), self.dtype)
            return conv(x)
        if impl in ("gemm", "gemm1"):
            if kernel.shape[2] == 1:
                return _conv2d_cin1_gemm(x, kernel, bias, tuple(self.strides), tuple(pad), self.dtype)
            if impl == "gemm1":  # C_in=1 convs only; the rest keep XLA's conv
                return conv(x)
            return _conv2d_shifted_gemm(x, kernel, bias, tuple(self.strides), tuple(pad), self.dtype)
        return _conv2d_im2col(
            x.astype(self.dtype),
            kernel,
            bias,
            tuple(self.strides),
            tuple(pad),
            self.dtype,
        )


class DepthwiseConv1D(nn.Module):
    kernel_size: int
    strides: int = 1
    padding: Union[str, Sequence] = "same"
    dilation: int = 1
    depth_multiplier: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, C]
        c = x.shape[-1]
        pad = _norm_padding(self.padding, (self.kernel_size,), (self.dilation,), causal_axes=(0,))
        return nn.Conv(
            features=c * self.depth_multiplier,
            kernel_size=(self.kernel_size,),
            strides=(self.strides,),
            padding=pad,
            kernel_dilation=(self.dilation,),
            feature_group_count=c,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class DepthwiseConv2D(nn.Module):
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Union[str, Sequence] = "same"
    dilation: Sequence[int] = (1, 1)
    depth_multiplier: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, F, C]
        c = x.shape[-1]
        pad = _norm_padding(self.padding, tuple(self.kernel_size), tuple(self.dilation), causal_axes=(0,))
        return nn.Conv(
            features=c * self.depth_multiplier,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=pad,
            kernel_dilation=tuple(self.dilation),
            feature_group_count=c,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class SeparableConv1D(nn.Module):
    filters: int
    kernel_size: int
    strides: int = 1
    padding: Union[str, Sequence] = "same"
    dilation: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = DepthwiseConv1D(
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            dilation=self.dilation,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        x = nn.Conv(
            features=self.filters,
            kernel_size=(1,),
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="pointwise",
        )(x)
        return x
