"""SEANet encoder/decoder (EnCodec-24kHz geometry) in native JAX.

Architecture per SURVEY §2.2 (facebookresearch/encodec v0.1.1, which the reference
consumes as the pip black box at /root/reference/valle/models/encodec_pip.py:15):
n_filters=32, dimension=128, ratios=[8,5,4,2] (encoder downsamples in reverse order
2,4,5,8), kernel 7, residual kernel 3, compress 2, 1 residual layer, 2 LSTM layers,
ELU activations, causal reflect padding.  Hop = 8*5*4*2 = 320 → 75 fps at 24 kHz.

Everything is channel-last (B, T, C); params are nested dicts so a converted torch
checkpoint drops straight in (codec/convert.py folds weight-norm).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .conv import causal_conv1d, causal_conv_transpose1d, conv1d_init
from .lstm import lstm, lstm_init

Params = dict[str, Any]

RATIOS = (8, 5, 4, 2)         # decoder upsampling order; encoder uses reversed
N_FILTERS = 32
DIMENSION = 128
KERNEL = 7
RES_KERNEL = 3
COMPRESS = 2
LSTM_LAYERS = 2
HOP = 320


def elu(x: jax.Array) -> jax.Array:
    return jax.nn.elu(x, alpha=1.0)


def _resblock_init(key: jax.Array, dim: int, dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = dim // COMPRESS
    return {
        'conv1': conv1d_init(k1, dim, hidden, RES_KERNEL, dtype),   # k=3, dilation 1
        'conv2': conv1d_init(k2, hidden, dim, 1, dtype),            # k=1
        'shortcut': conv1d_init(k3, dim, dim, 1, dtype),            # true_skip=False
    }


def _resblock(p: Params, x: jax.Array) -> jax.Array:
    h = causal_conv1d(p['conv1'], elu(x))
    h = causal_conv1d(p['conv2'], elu(h))
    return causal_conv1d(p['shortcut'], x) + h


def encoder_init(key: jax.Array, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 4 + 2 * len(RATIOS))
    mult = 1
    p: Params = {'stem': conv1d_init(keys[0], 1, N_FILTERS, KERNEL, dtype)}
    stages = []
    for i, ratio in enumerate(reversed(RATIOS)):                   # 2, 4, 5, 8
        ch = mult * N_FILTERS
        stages.append({
            'res': _resblock_init(keys[1 + 2 * i], ch, dtype),
            'down': conv1d_init(keys[2 + 2 * i], ch, ch * 2, ratio * 2, dtype),
        })
        mult *= 2
    p['stages'] = stages
    p['lstm'] = lstm_init(keys[-2], mult * N_FILTERS, mult * N_FILTERS, LSTM_LAYERS, dtype)
    p['head'] = conv1d_init(keys[-1], mult * N_FILTERS, DIMENSION, KERNEL, dtype)
    return p


def encode(p: Params, wav: jax.Array) -> jax.Array:
    """(B, T) waveform → (B, ceil(T/320), 128) latents."""
    x = wav[:, :, None]                                            # (B, T, 1)
    x = causal_conv1d(p['stem'], x)
    for stage, ratio in zip(p['stages'], reversed(RATIOS)):
        x = _resblock(stage['res'], x)
        x = causal_conv1d(stage['down'], elu(x), stride=ratio)
    x = lstm(p['lstm'], x)
    return causal_conv1d(p['head'], elu(x))


def decoder_init(key: jax.Array, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 4 + 2 * len(RATIOS))
    mult = 2 ** len(RATIOS)
    p: Params = {'stem': conv1d_init(keys[0], DIMENSION, mult * N_FILTERS, KERNEL, dtype),
                 'lstm': lstm_init(keys[1], mult * N_FILTERS, mult * N_FILTERS,
                                   LSTM_LAYERS, dtype)}
    stages = []
    for i, ratio in enumerate(RATIOS):
        ch = mult * N_FILTERS
        k_up, k_res = jax.random.split(keys[2 + i], 2)
        stages.append({
            'up': conv1d_init(k_up, ch, ch // 2, ratio * 2, dtype),
            'res': _resblock_init(k_res, ch // 2, dtype),
        })
        mult //= 2
    p['stages'] = stages
    p['head'] = conv1d_init(keys[-1], N_FILTERS, 1, KERNEL, dtype)
    return p


def decode(p: Params, latents: jax.Array) -> jax.Array:
    """(B, F, 128) latents → (B, F*320) waveform."""
    x = causal_conv1d(p['stem'], latents)
    x = lstm(p['lstm'], x)
    for stage, ratio in zip(p['stages'], RATIOS):
        x = causal_conv_transpose1d(stage['up'], elu(x), stride=ratio)
        x = _resblock(stage['res'], x)
    x = causal_conv1d(p['head'], elu(x))
    return x[:, :, 0]
