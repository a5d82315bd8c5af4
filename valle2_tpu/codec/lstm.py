"""Multi-layer LSTM matching torch nn.LSTM numerics, optimized for TPU.

The reference codec's SEANet stacks contain a 2-layer LSTM with residual skip
(encodec's ``SLSTM``; SURVEY §2.2).  TPU formulation: the input-to-hidden projection
for ALL timesteps is hoisted out of the recurrence as one big (B*T, C) @ (C, 4H)
matmul (MXU work), and only the hidden-to-hidden recurrence runs under ``lax.scan``
(unavoidably sequential, but now just one (B, H) @ (H, 4H) matmul + elementwise per
step).

Gate order follows torch: [i, f, g, o]; sigmoid on i/f/o, tanh on g.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def lstm_init(key: jax.Array, input_size: int, hidden_size: int, num_layers: int,
              dtype=jnp.float32) -> Params:
    """torch nn.LSTM default init: U(-1/sqrt(H), 1/sqrt(H)) for all weights/biases.

    Weights stored transposed, (in, 4H) / (H, 4H), for x @ w.
    """
    layers = []
    bound = 1.0 / math.sqrt(hidden_size)
    for i in range(num_layers):
        k1, k2, k3, k4, key = jax.random.split(key, 5)
        in_dim = input_size if i == 0 else hidden_size
        layers.append({
            'w_ih': jax.random.uniform(k1, (in_dim, 4 * hidden_size), dtype, -bound, bound),
            'w_hh': jax.random.uniform(k2, (hidden_size, 4 * hidden_size), dtype, -bound, bound),
            'b_ih': jax.random.uniform(k3, (4 * hidden_size,), dtype, -bound, bound),
            'b_hh': jax.random.uniform(k4, (4 * hidden_size,), dtype, -bound, bound),
        })
    return {'layers': layers}


def _lstm_layer(p: Params, x: jax.Array) -> jax.Array:
    """One LSTM layer over (B, T, C) → (B, T, H)."""
    b, t, _ = x.shape
    h_dim = p['w_hh'].shape[0]
    # Hoist the input projection: one MXU matmul for the whole sequence.  f32
    # weights get explicit 'highest' precision (codec numerics feed an argmin — bf16
    # matmul passes flip token ids, and this backend's *default* precision is low);
    # bf16 weights are the fast decode path and run natively.
    prec = 'highest' if p['w_ih'].dtype == jnp.float32 else 'default'
    gates_x = (jnp.matmul(x, p['w_ih'], precision=prec)
               + (p['b_ih'] + p['b_hh']))                      # (B, T, 4H)

    def step(carry, gx):
        h, c = carry
        gates = gx + jnp.matmul(h, p['w_hh'], precision=prec)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((b, h_dim), x.dtype), jnp.zeros((b, h_dim), x.dtype))
    # unroll=32: loop-iteration overhead dominates tiny recurrence bodies on TPU
    # (measured ~120 us/iter floor); unrolling packs 32 sequential steps into one
    # loop turn at negligible compile cost.
    _, hs = jax.lax.scan(step, init, gates_x.swapaxes(0, 1), unroll=32)
    return hs.swapaxes(0, 1)


def lstm(p: Params, x: jax.Array, skip: bool = True) -> jax.Array:
    """Stacked LSTM with residual skip (encodec SLSTM): y = lstm(x) + x."""
    y = x
    for layer_p in p['layers']:
        y = _lstm_layer(layer_p, y)
    return y + x if skip else y
