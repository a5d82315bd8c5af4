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


GROUP4 = 128   # int4 scale-group size along the input axis (AWQ/GPTQ-standard)


def group4_for(in_dim: int, group: int = GROUP4) -> int:
    """Largest usable int4 group ≤ ``group``: must divide in_dim/2 so scale
    groups never straddle the two nibble planes (see ``quantize_linear_int4``),
    which keeps the kernel's per-plane dequant a plain reshape."""
    g = min(group, max(in_dim // 2, 1))
    while g > 1 and (in_dim // 2) % g:
        g //= 2
    return g


def quantize_linear_int4(p: Params, group: int = GROUP4) -> Params:
    """{'w': (..., in, out), 'b'?} → {'q4': int8 (..., in/2, out),
    'scale4': f32 (..., in/group, out), 'b'?} — weight-only 4-bit (W4A16).

    - **Group-wise symmetric**: ``scale[g, o] = max|w[gG:(g+1)G, o]| / 7`` over
      input groups of G = ``group`` rows (clamped by ``group4_for``); values in
      [-7, 7].  Per-channel int4 is too coarse for transformer weights; G=128
      is the AWQ/GPTQ standard operating point.
    - **Half-split nibble packing**: byte k holds input row k in its LOW
      nibble and input row k + in/2 in its HIGH nibble.  Unpacking is then two
      plane-wise shifts + two dots — no row interleave — which is what the
      fused kernel's Mosaic lowering wants (kernels/fused_decode._q4_dot).
    - **No activation quantization** (unlike the int8 W8A8 path): the bytes
      saved are the point — decode is weight-streaming-bound — and fp
      activations keep the only lossy step the 4-bit weight rounding.

    Requires in % 2 == 0 (every transformer linear here is even-width).
    """
    w = jnp.asarray(p['w'], jnp.float32)
    in_dim = w.shape[-2]
    assert in_dim % 2 == 0, f'int4 packing needs an even input dim, got {in_dim}'
    g = group4_for(in_dim, group)
    groups = in_dim // g
    gshape = (*w.shape[:-2], groups, g, w.shape[-1])
    amax = jnp.max(jnp.abs(w.reshape(gshape)), axis=-2)        # (..., groups, out)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    qi = jnp.clip(jnp.round(w.reshape(gshape) / scale[..., None, :]), -7, 7)
    qi = qi.astype(jnp.int32).reshape(w.shape)                 # (..., in, out)
    half = in_dim // 2
    lo = jnp.take(qi, jnp.arange(half), axis=-2)
    hi = jnp.take(qi, jnp.arange(half, in_dim), axis=-2)
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0xF),
                            jnp.left_shift(hi, 4)).astype(jnp.int8)
    out: Params = {'q4': packed, 'scale4': scale}
    if 'b' in p:
        out['b'] = p['b']
    return out


def unpack_int4(q4: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Packed (..., in/2, out) int8 → (lo, hi) int32 nibble planes, each
    (..., in/2, out) in [-8, 7]: lo = input rows [0, in/2), hi = [in/2, in)."""
    p32 = q4.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)          # sign-extend low
    hi = jnp.right_shift(p32, 4)                               # arithmetic
    return lo, hi


def dequantize_linear_int4(p: Params, dtype=jnp.float32) -> Params:
    """Inverse of ``quantize_linear_int4`` (fake-quant floats, for tests)."""
    lo, hi = unpack_int4(p['q4'])
    qi = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)
    in_dim = qi.shape[-2]
    scale = p['scale4']
    g = in_dim // scale.shape[-2]
    w = qi.reshape(*qi.shape[:-2], in_dim // g, g, qi.shape[-1]) \
        * scale[..., None, :]
    out: Params = {'w': w.reshape(qi.shape).astype(dtype)}
    if 'b' in p:
        out['b'] = p['b']
    return out


def int4_matmul(x: jax.Array, q4: jax.Array, scale: jax.Array) -> jax.Array:
    """``x @ dequant(q4)`` — W4A16: fp activations, on-the-fly group-dequant.

    x: (..., in) float; q4: (in/2, out) packed int8; scale: (groups, out) f32.
    Two plane dots (no interleave): y = x_lo @ W_lo + x_hi @ W_hi, each plane
    dequantized (reshape → * group scale) in f32 and cast to x.dtype so the
    MXU runs its native bf16 dots under bf16 configs.
    """
    lo, hi = unpack_int4(q4)
    half = q4.shape[-2]
    groups = scale.shape[-2]
    gh = groups // 2                     # group4_for guarantees plane alignment
    g = half // gh

    def plane(q_plane, s_plane):
        w = q_plane.astype(jnp.float32).reshape(gh, g, q4.shape[-1]) \
            * s_plane[:, None, :]
        return w.reshape(half, q4.shape[-1]).astype(x.dtype)

    y = x[..., :half] @ plane(lo, scale[:gh]) \
        + x[..., half:] @ plane(hi, scale[gh:])
    return y.astype(x.dtype)


def quantize_linear_int4_ranked(p: Params, mp: int, group: int = GROUP4
                                ) -> Params:
    """``quantize_linear_int4`` with the input rows pre-split into ``mp``
    manual-TP rank slices, each quantized INDEPENDENTLY and re-stacked
    rank-major: q4 (..., mp·(in/mp/2), out), scale4 (..., mp·groups_r, out).

    Why: the global half-split packing interleaves input rows [0, in/2) with
    [in/2, in) inside each byte, so a contiguous row slice of a globally
    packed q4 does NOT correspond to a contiguous input-feature slice — a
    Megatron row-parallel split (out/lin2: rank r owns input features
    [r·in/mp, (r+1)·in/mp)) would hand each rank a meaningless byte block.
    Packing per rank makes the contiguous slice a complete, self-contained
    int4 layout for exactly that rank's features; a shard_map row split over
    axis -2 (``parallel.tp_decode_specs``) then needs no repacking.  When
    in/mp is a multiple of the group size the quantized VALUES equal the
    global quantization's (group boundaries align); otherwise groups restart
    per rank — a different but equally valid quantization.  Activations stay
    fp, so the row-parallel partial sums complete with a plain ``psum`` / ring
    all-reduce (no global activation scale — the reason int4 can ride manual
    TP where int8 W8A8 cannot keep the fused kernel).
    """
    w = jnp.asarray(p['w'], jnp.float32)
    in_dim = w.shape[-2]
    assert in_dim % mp == 0 and (in_dim // mp) % 2 == 0, \
        f'int4 ranked packing needs in % mp == 0 and even in/mp, got ' \
        f'{in_dim}/{mp}'
    in_r = in_dim // mp
    parts = [quantize_linear_int4(
        {'w': jax.lax.slice_in_dim(w, r * in_r, (r + 1) * in_r, axis=-2)},
        group) for r in range(mp)]
    out: Params = {
        'q4': jnp.concatenate([pt['q4'] for pt in parts], axis=-2),
        'scale4': jnp.concatenate([pt['scale4'] for pt in parts], axis=-2)}
    if 'b' in p:
        out['b'] = p['b']
    return out


def dequantize_linear_int4_ranked(p: Params, mp: int, dtype=jnp.float32
                                  ) -> Params:
    """Inverse of ``quantize_linear_int4_ranked`` (tests / solo references:
    the fp weights a manual-TP int4 decode effectively multiplies by)."""
    q4, s4 = p['q4'], p['scale4']
    half_r = q4.shape[-2] // mp
    groups_r = s4.shape[-2] // mp
    ws = [dequantize_linear_int4(
        {'q4': jax.lax.slice_in_dim(q4, r * half_r, (r + 1) * half_r, axis=-2),
         'scale4': jax.lax.slice_in_dim(s4, r * groups_r, (r + 1) * groups_r,
                                        axis=-2)})['w']
          for r in range(mp)]
    out: Params = {'w': jnp.concatenate(ws, axis=-2).astype(dtype)}
    if 'b' in p:
        out['b'] = p['b']
    return out


def quantize_transformer(tp: Params, bits: int = 8, tp_mp: int = 1) -> Params:
    """Quantize the four big linears of a (stacked) transformer layer pytree;
    norms pass through unchanged.  ``bits``: 8 (W8A8, per-channel) or 4
    (W4A16, group-wise).  ``tp_mp`` > 1 (int4 only): pack the row-parallel
    linears (attn.out, ffn.lin2) per manual-TP rank slice
    (``quantize_linear_int4_ranked``) so a shard_map row split hands every
    rank a self-contained int4 layout; column-parallel linears (qkv, lin1)
    keep the global packing — their input rows stay whole per rank."""
    quant = quantize_linear if bits == 8 else quantize_linear_int4
    if tp_mp > 1:
        assert bits == 4, 'ranked packing is an int4 (W4A16) layout'
        rquant = lambda p: quantize_linear_int4_ranked(p, tp_mp)
    else:
        rquant = quant
    out = jax.tree.map(lambda a: a, tp)      # shallow-ish copy of the dict tree
    out['attn'] = {'qkv': quant(tp['attn']['qkv']),
                   'out': rquant(tp['attn']['out'])}
    out['ffn'] = {'lin1': quant(tp['ffn']['lin1']),
                  'lin2': rquant(tp['ffn']['lin2'])}
    return out


def quantize_decode_params(params: Params, bits: int = 8) -> Params:
    """AR/NAR model params → decode params with a quantized transformer stack
    (int8 W8A8 or int4 W4A16).  Embeddings and the logit projection stay full
    precision."""
    out = dict(params)
    out['transformer'] = quantize_transformer(params['transformer'], bits=bits)
    return out
