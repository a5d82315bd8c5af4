"""Pallas TPU kernel: fused AdaptiveLayerNorm.

One pass over (rows, d): mean/variance, normalize, inner learned affine, and the
conditioning scale/bias — all in VMEM (the jnp path materializes the normalized
intermediate between the LN and the conditioning affine; XLA usually fuses it, this
makes the fusion explicit and keeps statistics in f32 regardless of input dtype).

The conditioning projection ``w, b = split(proj(cond))`` is a (1, d) x (d, 2d)
matvec computed once per call outside the kernel (it does not scale with sequence
length).  Matches ops.nn.adaln bitwise in f32 (tests/test_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 256


def _adaln_kernel(x_ref, scale_ref, bias_ref, w_ref, b_ref, o_ref, *, eps: float):
    """x_ref: (BLOCK_ROWS, d); scale/bias: (1, d) inner LN affine; w/b: (1, d)
    conditioning affine; o_ref: (BLOCK_ROWS, d)."""
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[0] + bias_ref[0]                       # inner LN affine
    y = y * w_ref[0] + b_ref[0]                              # conditioning affine
    o_ref[:] = y.astype(o_ref.dtype)


def adaln_fused(p: dict, x: jax.Array, cond: jax.Array, eps: float = 1e-5,
                block_rows: int = BLOCK_ROWS) -> jax.Array:
    """Drop-in for ops.nn.adaln: p = {'proj': {w, b}, 'ln': {scale, bias}},
    x (b, t, d), cond (1, d) → (b, t, d)."""
    b, t, d = x.shape
    wb = cond @ p['proj']['w'] + p['proj']['b']              # (1, 2d)
    w, bias_c = jnp.split(wb, 2, axis=-1)

    rows = b * t
    rows_pad = -(-rows // block_rows) * block_rows
    flat = x.reshape(rows, d)
    if rows_pad != rows:
        flat = jnp.pad(flat, ((0, rows_pad - rows), (0, 0)))

    kernel = functools.partial(_adaln_kernel, eps=eps)
    interpret = jax.default_backend() != 'tpu'
    out = pl.pallas_call(
        kernel,
        grid=(rows_pad // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows_pad, d), x.dtype),
        interpret=interpret,
    )(flat, p['ln']['scale'][None].astype(jnp.float32),
      p['ln']['bias'][None].astype(jnp.float32),
      w.astype(jnp.float32), bias_c.astype(jnp.float32))
    return out[:rows].reshape(b, t, d)
