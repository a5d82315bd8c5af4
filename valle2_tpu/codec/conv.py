"""Causal 1-D convolutions for the SEANet stacks, channel-last (B, T, C) layout.

The reference delegates these to the pip ``encodec`` package's torch ``SConv1d`` /
``SConvTranspose1d`` (see /root/reference/valle/models/encodec_pip.py:15 and SURVEY
§2.2).  This is a native JAX implementation of the same math:

- causal conv: left-pad by ``(kernel-1)*dilation + 1 - stride``, plus right
  "extra padding" so strided convs see only full windows (ceil-division frame count);
  pad mode is reflect (encodec's SEANet default) with zero-pad fallback for short
  inputs.
- causal transposed conv: full ``lax.conv_general_dilated`` with input dilation, then
  trim ``kernel - stride`` samples from the right (trim_right_ratio = 1).

Channel-last keeps C on the TPU lane dimension so XLA tiles the implicit matmuls onto
the MXU.  Weight norm is a training-time reparametrization; converted checkpoints fold
``g * v/||v||`` into a plain kernel (see codec/convert.py), so inference math here uses
plain kernels.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

_DN = ('NWC', 'WIO', 'NWC')  # (batch, time, chan) x (width, in, out)


def _precision_for(dtype) -> jax.lax.Precision:
    """float32 weights → exact f32 math (token parity feeds an argmin; this
    backend's *default* matmul precision is low).  bfloat16 weights mean the caller
    chose the fast decode path — let the MXU run natively."""
    return (jax.lax.Precision.HIGHEST if jnp.dtype(dtype) == jnp.float32
            else jax.lax.Precision.DEFAULT)


def conv1d_init(key: jax.Array, in_ch: int, out_ch: int, kernel: int,
                dtype=jnp.float32) -> Params:
    """torch nn.Conv1d default init (kaiming uniform, fan_in = in_ch * kernel)."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_ch * kernel)
    return {'w': jax.random.uniform(wkey, (kernel, in_ch, out_ch), dtype, -bound, bound),
            'b': jax.random.uniform(bkey, (out_ch,), dtype, -bound, bound)}


def _pad_reflect_or_zero(x: jax.Array, left: int, right: int) -> jax.Array:
    """Reflect-pad along time; fall back to zero-pad when the signal is too short
    (encodec pad1d does the same: zero-extends before reflecting)."""
    t = x.shape[1]
    max_pad = max(left, right)
    if max_pad >= t:
        extra = max_pad - t + 1
        x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
    out = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode='reflect')
    if max_pad >= t:
        # Drop the zero-extension we inserted to make reflect legal.
        end = out.shape[1] - (max_pad - t + 1)
        out = out[:, :end]
    return out


def causal_conv1d(p: Params, x: jax.Array, stride: int = 1, dilation: int = 1,
                  pad_mode: str = 'reflect') -> jax.Array:
    """x: (B, T, Cin) → (B, ceil(T/stride), Cout)."""
    kernel = p['w'].shape[0]
    eff_kernel = (kernel - 1) * dilation + 1
    padding_total = eff_kernel - stride
    t = x.shape[1]
    # Extra right padding for a whole number of windows (ceil frame count).
    n_frames = (t - eff_kernel + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + eff_kernel - padding_total
    extra = max(ideal - t, 0)
    if pad_mode == 'reflect':
        x = _pad_reflect_or_zero(x, padding_total, extra)
    else:
        x = jnp.pad(x, ((0, 0), (padding_total, extra), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x, p['w'], window_strides=(stride,), padding='VALID',
        rhs_dilation=(dilation,), dimension_numbers=_DN,
        precision=_precision_for(p['w'].dtype))
    return y + p['b']


def causal_conv_transpose1d(p: Params, x: jax.Array, stride: int) -> jax.Array:
    """x: (B, T, Cin) → (B, T*stride, Cout).

    Weight layout (kernel, in, out) — matches torch ConvTranspose1d (in, out, k)
    transposed at conversion.  Implemented as input-dilated conv with flipped kernel
    (the standard transpose-conv equivalence), then right-trim of kernel - stride.
    """
    kernel = p['w'].shape[0]
    # y[j] = Σ_t x[t] W[j - t*s]  ==  input-dilated conv with the time-flipped kernel:
    # K[m] = W[k-1-m], full padding (k-1, k-1).
    w = jnp.flip(p['w'], axis=0)                       # (k, in_ch, out_ch)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(kernel - 1, kernel - 1)],
        lhs_dilation=(stride,), dimension_numbers=_DN,
        precision=_precision_for(w.dtype))
    y = y + p['b']
    padding_total = kernel - stride
    if padding_total > 0:
        y = y[:, :-padding_total]
    return y
