"""int8 weight quantization for the decode/serving path.

Why: at scale, AR decode is weight-streaming-bound.  A 204M-param stack reads
~400 MB of bf16 weights from HBM per token step (NOTES.md: weights stream at
>500 GB/s once they stop fitting VMEM → ~0.8 ms/step floor); int8 weights halve
those bytes, and the v5e MXU runs s8×s8→s32 dots natively at 2× the bf16 rate.
The reference has no quantization story at all (pure f32 torch,
/root/reference/valle/models/modules.py); this is a TPU-serving capability, not
a parity surface.

Both decode paths consume this layout: the XLA path through the
``ops.nn.linear`` dispatch, and the fused whole-stack kernel via in-kernel
s8×s8 dots with the same activation-quant rounding
(``kernels/fused_decode._q8_dot``).

Scheme (weight-only, dynamic activation quantization):

- **Weights**: per-output-channel symmetric int8 — ``scale[o] =
  max|w[:, o]| / 127``, stored alongside the int8 tensor.  Stacked layer
  pytrees ((L, in, out) leaves) quantize along the same axes, so per-layer
  slicing (``tree.map(a[li])``) yields a valid quantized linear.
- **Activations**: per-token symmetric int8 computed on the fly (one max-abs
  over the feature axis per token — negligible next to the matmul).
- The matmul runs ``s8 × s8 → s32`` (``preferred_element_type=int32``) and the
  result rescales by ``sx * scale`` in float32.

Applied to the transformer stack's four big linears (qkv, attn.out, ffn.lin1,
ffn.lin2) — ~99% of decode weight bytes at scale; embeddings, norms, and the
logit projection stay in the compute dtype (logits feed sampling and are kept
exact-path).  Enable with ``ConfigValle(weight_dtype='int8')``; outputs are
quantization-lossy by design (no greedy-parity claim — use bf16 for the parity
gate).  ``ops.nn.linear`` dispatches on the quantized param layout, so every
call site (qkv_proj, ffn, decode step, prefill) picks it up transparently.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def quantize_linear(p: Params) -> Params:
    """{'w': (..., in, out), 'b'?} → {'q': int8, 'scale': f32 (..., out), 'b'?}.

    Per-output-channel symmetric; leading stacked-layer axes pass through.
    """
    w = jnp.asarray(p['w'], jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2)                       # (..., out)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale[..., None, :]), -127, 127).astype(jnp.int8)
    out: Params = {'q': q, 'scale': scale}
    if 'b' in p:
        out['b'] = p['b']
    return out


def dequantize_linear(p: Params, dtype=jnp.float32) -> Params:
    """Inverse of ``quantize_linear`` (fake-quant float weights, for tests)."""
    w = p['q'].astype(jnp.float32) * p['scale'][..., None, :]
    out: Params = {'w': w.astype(dtype)}
    if 'b' in p:
        out['b'] = p['b']
    return out


def int8_matmul(x: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    """``x @ dequant(q)`` with dynamic per-token int8 activation quantization.

    x: (..., in) float; q: (in, out) int8; scale: (out,) f32.  Returns x.dtype.
    The dot itself is s8×s8→s32 — the native MXU int8 path on TPU.
    """
    x32 = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)         # (..., 1)
    sx = jnp.maximum(ax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, q, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sx * scale).astype(x.dtype)


def quantize_transformer(tp: Params) -> Params:
    """Quantize the four big linears of a (stacked) transformer layer pytree;
    norms pass through unchanged."""
    out = jax.tree.map(lambda a: a, tp)      # shallow-ish copy of the dict tree
    out['attn'] = {'qkv': quantize_linear(tp['attn']['qkv']),
                   'out': quantize_linear(tp['attn']['out'])}
    out['ffn'] = {'lin1': quantize_linear(tp['ffn']['lin1']),
                  'lin2': quantize_linear(tp['ffn']['lin2'])}
    return out


def quantize_decode_params(params: Params) -> Params:
    """AR/NAR model params → decode params with an int8 transformer stack.
    Embeddings and the logit projection stay full precision."""
    out = dict(params)
    out['transformer'] = quantize_transformer(params['transformer'])
    return out
