"""Fused AR decode step: the whole L-layer token update as ONE Pallas kernel.

Why (measured, NOTES.md r2): a decode step on the target runtime costs ~170 µs
on-device, of which the useful work is tiny — weights matmuls ~7 µs (XLA keeps the
default-scale weights VMEM-resident across while_loop iterations) and attention
~27 µs.  The other ~135 µs is per-op overhead across the ~150 HLO ops the unrolled
8-layer step emits (reference equivalent: the per-token torch loop at
/root/reference/valle/models/valle_ar.py:141-171 + modules.py:336-352).  Fusing the
transformer stack into one kernel removes that overhead class entirely.

Design:
- grid = (num_layers,): sequential on TPU; Pallas pipelines layer l+1's weight and
  cache blocks into VMEM while layer l computes.
- The hidden state x lives in the output block (constant index map → stays resident
  in VMEM across grid steps; written back once at the end).
- The KV cache streams in per layer as full (rows, h, S, hd) blocks; the new
  token's k/v are merged IN REGISTER (scores/probs for slot ``index`` are patched
  via iota masks), and the kernel emits per-layer k_new/v_new which the caller
  writes into the cache with two ``dynamic_update_slice`` ops for the whole stack.
  The kernel itself is read-only on the cache (no aliasing, no manual DMA).
- The prefix-LM slot validity is computed in-kernel from per-row
  [tokens_len, prompt_len] scalars (SMEM prefetch) + the static [ttm, pm] layout,
  exactly mirroring ``ar._decode_fn``'s ``attend`` formula.

Numerics match ``ops.transformer.transformer_decode_step`` (f32 softmax and
accumulation); parity is tested in tests/test_kernels.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs error 1.5e-7 — below
    bf16 resolution).  This Pallas TPU lowering implements neither erf nor erfc,
    so jax.nn.gelu(approximate=False) / lax.erf cannot be used in-kernel."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """erf-form GELU (reference FeedForward numerics)."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _fake_quant(x2d, n_heads: int):
    """quantize→dequantize roundtrip per (row, head) slot — the int8 cache's view
    of a freshly written slot (ops.transformer.quantize_kv semantics: per-slot
    max-abs scale over the head dim, bf16 scale storage)."""
    d = x2d.shape[-1]
    hd = d // n_heads
    outs = []
    for hh in range(n_heads):
        xs = x2d[:, hh * hd:(hh + 1) * hd]
        amax = jnp.max(jnp.abs(xs), axis=1, keepdims=True)
        sc = (jnp.maximum(amax, 1e-8) / 127.0).astype(jnp.bfloat16).astype(jnp.float32)
        q = jnp.clip(jnp.round(xs / sc), -127, 127)
        outs.append(q * sc)
    return jnp.concatenate(outs, axis=1)


def _layernorm(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _kernel(meta_ref, x_ref, n1s_ref, n1b_ref, qkv_ref, outw_ref, outb_ref,
            n2s_ref, n2b_ref, f1w_ref, f1b_ref, f2w_ref, f2b_ref, ck_ref, cv_ref,
            *rest, n_heads: int, ttm: int, pm: int, rows: int, seq: int,
            quant: bool):
    if quant:
        cks_ref, cvs_ref, y_ref, knew_ref, vnew_ref = rest
    else:
        cks_ref = cvs_ref = None
        y_ref, knew_ref, vnew_ref = rest
    l = pl.program_id(0)
    idx = meta_ref[0]

    @pl.when(l == 0)
    def _seed():
        y_ref[...] = x_ref[...]

    x = y_ref[...].astype(jnp.float32)                       # (rows, d)
    d = x.shape[-1]
    hd = d // n_heads
    scale = 1.0 / math.sqrt(hd)

    # --- attention ---  (1-D per-layer params arrive as (1, 1, d) blocks)
    h1 = _layernorm(x, n1s_ref[0, 0].astype(jnp.float32),
                    n1b_ref[0, 0].astype(jnp.float32))
    qkv = jnp.dot(h1.astype(x_ref.dtype), qkv_ref[0],
                  preferred_element_type=jnp.float32)        # (rows, 3d)
    q2d, k_new2d, v_new2d = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
    knew_ref[0] = k_new2d.astype(knew_ref.dtype)
    vnew_ref[0] = v_new2d.astype(vnew_ref.dtype)
    if quant:
        # The caller quantizes the new slot into the cache; future steps will see
        # the quantize→dequantize roundtrip of k/v_new, so the self-attention
        # contribution must too (matches ops.transformer's int8 semantics).
        k_new2d = _fake_quant(k_new2d, n_heads)
        v_new2d = _fake_quant(v_new2d, n_heads)

    # All math stays 2-D: this runtime's Mosaic crashes on partial reductions of
    # >2-D values (sum/max over one axis of a (r, h, S, hd) tensor), so the
    # attention is unrolled into per-(row, head) 2-D matmuls + lane softmaxes.
    slot_row = jax.lax.broadcasted_iota(jnp.int32, (1, seq), 1)
    contract_last = (((1,), (1,)), ((), ()))                 # A @ Bᵀ
    contract_inner = (((1,), (0,)), ((), ()))                # A @ B
    out_rows = []
    for r in range(rows):
        tl_r = meta_ref[1 + r]
        pl_r = meta_ref[1 + rows + r]
        attend = ((slot_row < tl_r)
                  | ((slot_row >= ttm) & (slot_row < ttm + pl_r))
                  | ((slot_row >= ttm + pm) & (slot_row <= idx)))    # (1, S)
        is_idx = slot_row == idx
        head_outs = []
        for hh in range(n_heads):
            sl = slice(hh * hd, (hh + 1) * hd)
            q_rh = q2d[r:r + 1, sl] * scale                  # (1, hd)
            k2 = ck_ref[0, r, hh].astype(jnp.float32)        # (S, hd)
            v2 = cv_ref[0, r, hh].astype(jnp.float32)
            if quant:
                # int8 cache: dequantize in VMEM (per-slot scales) — this is the
                # fusion XLA would not do (it materialized the cache in HBM,
                # BENCHMARKS.md r1 negative result).
                k2 = k2 * cks_ref[0, r, hh].astype(jnp.float32)
                v2 = v2 * cvs_ref[0, r, hh].astype(jnp.float32)
            s = jax.lax.dot_general(q_rh, k2, contract_last,
                                    preferred_element_type=jnp.float32)  # (1, S)
            s_new = jnp.sum(q_rh * k_new2d[r:r + 1, sl])     # scalar
            # Slot ``idx`` holds a stale cache value — patch in-register.
            s = jnp.where(attend, jnp.where(is_idx, s_new, s), NEG_INF)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=1, keepdims=True)        # (1, S)
            p_idx = jnp.sum(jnp.where(is_idx, p, 0.0))       # scalar
            p_old = jnp.where(is_idx, 0.0, p)
            o = jax.lax.dot_general(p_old, v2, contract_inner,
                                    preferred_element_type=jnp.float32)  # (1, hd)
            head_outs.append(o + p_idx * v_new2d[r:r + 1, sl])
        out_rows.append(jnp.concatenate(head_outs, axis=1))  # (1, d)
    attn = jnp.concatenate(out_rows, axis=0)                 # (rows, d)
    x = x + (jnp.dot(attn.astype(x_ref.dtype), outw_ref[0],
                     preferred_element_type=jnp.float32) + outb_ref[0, 0])

    # --- FFN ---
    h2 = _layernorm(x, n2s_ref[0, 0].astype(jnp.float32),
                    n2b_ref[0, 0].astype(jnp.float32))
    hmid = jnp.dot(h2.astype(x_ref.dtype), f1w_ref[0],
                   preferred_element_type=jnp.float32) + f1b_ref[0, 0]
    hmid = _gelu_exact(hmid)
    x = x + (jnp.dot(hmid.astype(x_ref.dtype), f2w_ref[0],
                     preferred_element_type=jnp.float32) + f2b_ref[0, 0])

    y_ref[...] = x.astype(y_ref.dtype)


def fused_decode_step(p, x, n_heads: int, cache, index, tokens_lens, codes_lens,
                      ttm: int, pm: int):
    """One token step through the whole stacked-layer transformer as one kernel.

    p: stacked layer pytree (L, ...) (see ops.transformer.transformer_init);
    x: (rows, 1, d) current token embedding; cache: KVCache (float or int8 k/v —
    int8 dequantizes in-kernel, per-slot scales); index: scalar absolute slot;
    tokens_lens/codes_lens: (rows,) per-row true lengths (already repeated per
    beam); ttm/pm: static layout widths.
    Returns (y (rows, 1, d), new_cache) — matches transformer_decode_step under
    the same mask.
    """
    from ..ops.transformer import KVCache, quantize_kv

    num_layers, rows, h, seq, hd = cache.k.shape
    d = x.shape[-1]
    quant = cache.k_scale is not None
    x2 = x[:, 0, :]
    meta = jnp.concatenate([jnp.asarray(index, jnp.int32).reshape(1),
                            jnp.asarray(tokens_lens, jnp.int32).reshape(rows),
                            jnp.asarray(codes_lens, jnp.int32).reshape(rows)])

    kernel = functools.partial(_kernel, n_heads=n_heads, ttm=ttm, pm=pm,
                               rows=rows, seq=seq, quant=quant)
    interpret = jax.default_backend() != 'tpu'
    layer_spec = lambda *shape: pl.BlockSpec((1, *shape), lambda l, meta: (l,) + (0,) * len(shape))
    const_spec = pl.BlockSpec((rows, d), lambda l, meta: (0, 0))

    in_specs = [
        const_spec,                                   # x
        layer_spec(1, d), layer_spec(1, d),           # norm1 scale/bias
        layer_spec(d, 3 * d),                         # qkv w
        layer_spec(d, d), layer_spec(1, d),           # out w, b
        layer_spec(1, d), layer_spec(1, d),           # norm2 scale/bias
        layer_spec(d, p['ffn']['lin1']['w'].shape[-1]),  # ffn1 w
        layer_spec(1, p['ffn']['lin1']['w'].shape[-1]),  # ffn1 b
        layer_spec(p['ffn']['lin2']['w'].shape[-2], d),  # ffn2 w
        layer_spec(1, d),                             # ffn2 b
        layer_spec(rows, h, seq, hd),                 # cache k
        layer_spec(rows, h, seq, hd),                 # cache v
    ]
    inputs = [meta, x2,
              p['norm1']['scale'][:, None], p['norm1']['bias'][:, None],
              p['attn']['qkv']['w'],
              p['attn']['out']['w'], p['attn']['out']['b'][:, None],
              p['norm2']['scale'][:, None], p['norm2']['bias'][:, None],
              p['ffn']['lin1']['w'], p['ffn']['lin1']['b'][:, None],
              p['ffn']['lin2']['w'], p['ffn']['lin2']['b'][:, None],
              cache.k, cache.v]
    if quant:
        in_specs += [layer_spec(rows, h, seq, 1), layer_spec(rows, h, seq, 1)]
        inputs += [cache.k_scale, cache.v_scale]
    new_dtype = x.dtype if quant else cache.k.dtype

    y, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_layers,),
            in_specs=in_specs,
            out_specs=(
                const_spec,                                   # y (VMEM-resident)
                layer_spec(rows, d),                          # k_new per layer
                layer_spec(rows, d),                          # v_new per layer
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, d), x.dtype),
            jax.ShapeDtypeStruct((num_layers, rows, d), new_dtype),
            jax.ShapeDtypeStruct((num_layers, rows, d), new_dtype),
        ),
        interpret=interpret,
    )(*inputs)

    zero = jnp.int32(0)
    k_new = k_new.reshape(num_layers, rows, h, 1, hd)
    v_new = v_new.reshape(num_layers, rows, h, 1, hd)
    idx5 = (zero, zero, zero, index, zero)
    if quant:
        kq, ks = quantize_kv(k_new)
        vq, vs = quantize_kv(v_new)
        return y[:, None, :], KVCache(
            jax.lax.dynamic_update_slice(cache.k, kq, idx5),
            jax.lax.dynamic_update_slice(cache.v, vq, idx5),
            jax.lax.dynamic_update_slice(cache.k_scale, ks, idx5),
            jax.lax.dynamic_update_slice(cache.v_scale, vs, idx5))
    ck = jax.lax.dynamic_update_slice(cache.k, k_new, idx5)
    cv = jax.lax.dynamic_update_slice(cache.v, v_new, idx5)
    return y[:, None, :], KVCache(ck, cv)
