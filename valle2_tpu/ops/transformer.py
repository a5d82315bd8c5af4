"""Transformer stack: scanned pre-norm encoder layers with AdaLN support and a
preallocated-KV-cache decode path.

TPU-native equivalent of the reference EncoderLayer / Transformer
(``/root/reference/valle/models/modules.py:224-352``).  Architectural choices:

- **Stacked layer params + ``lax.scan``**: all L layers share one compiled body (one
  trace instead of L), the XLA-idiomatic formulation of a homogeneous stack.  Params are
  initialized per-layer (distinct keys) then ``jnp.stack``-ed leaf-wise.
- **Pre-norm residual blocks** exactly as the reference (modules.py:270-278):
  ``x + drop(attn(norm1(x)))``; ``x + drop(ffn(norm2(x)))``; norm is LayerNorm or
  AdaptiveLayerNorm conditioned on a stage embedding.
- **Decode**: the reference truncates the input to the last token and drops the mask
  when cached (modules.py:336-338).  Here prefill fills a static (L, b, h, max, hd)
  cache in one pass and `decode_step` advances one token with no host round-trips —
  both jit-compatible and used inside ``lax.while_loop`` / ``lax.scan`` by the models.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .attention import mha, mha_init, qkv_proj, sdpa, _merge_heads
from .masks import NEG_INF
from .nn import (adaln, adaln_init, dropout, ffn, ffn_init, layernorm,
                 layernorm_init, linear, linear_row_parallel)

Params = dict[str, Any]


class KVCache(NamedTuple):
    """Preallocated per-layer KV cache: k, v of shape (L, b, h, max_len, hd).

    With int8 storage, ``k_scale``/``v_scale`` hold per-slot max-abs scales of shape
    (L, b, h, max_len, 1); dequantized value = int8 * scale.  Decode attention is
    HBM-bandwidth-bound on cache reads, so int8 roughly halves its cost.
    """
    k: jax.Array
    v: jax.Array
    k_scale: jax.Array | None = None
    v_scale: jax.Array | None = None

    @classmethod
    def zeros(cls, num_layers: int, batch: int, n_heads: int, max_len: int,
              head_dim: int, dtype=jnp.float32) -> 'KVCache':
        shape = (num_layers, batch, n_heads, max_len, head_dim)
        if jnp.dtype(dtype) == jnp.int8:
            return cls(jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                       jnp.zeros((*shape[:-1], 1), jnp.bfloat16),
                       jnp.zeros((*shape[:-1], 1), jnp.bfloat16))
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-slot (last-axis) symmetric int8 quantization → (int8 values, scales).

    The scale/round arithmetic runs in f32 regardless of the activation dtype
    — the fused kernel's ``quantize_kv_rowmajor`` / in-kernel
    ``_fake_quant_row`` (kernels/fused_decode.py) quantize with an f32 scale,
    and prefill-written slots must round the SAME way or they drift ±1 int8
    step from what the kernel predicts/writes for its own slots."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


def encoder_layer_init(key: jax.Array, d_model: int, n_heads: int, d_ff: int,
                       adaptive_norm: bool, dtype=jnp.float32) -> Params:
    k_attn, k_ffn, k_n1, k_n2 = jax.random.split(key, 4)
    if adaptive_norm:
        norm1, norm2 = adaln_init(k_n1, d_model, dtype), adaln_init(k_n2, d_model, dtype)
    else:
        norm1, norm2 = layernorm_init(d_model, dtype), layernorm_init(d_model, dtype)
    return {'attn': mha_init(k_attn, d_model, n_heads, dtype),
            'ffn': ffn_init(k_ffn, d_model, d_ff, dtype),
            'norm1': norm1, 'norm2': norm2}


def transformer_init(key: jax.Array, num_layers: int, d_model: int, n_heads: int,
                     d_ff: int, adaptive_norm: bool, dtype=jnp.float32) -> Params:
    layers = [encoder_layer_init(k, d_model, n_heads, d_ff, adaptive_norm, dtype)
              for k in jax.random.split(key, num_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def _norm(p: Params, x: jax.Array, cond: jax.Array | None) -> jax.Array:
    if 'proj' in p:  # AdaptiveLayerNorm
        assert cond is not None, 'AdaptiveLayerNorm requires a conditioning embedding'
        return adaln(p, x, cond)
    return layernorm(p, x)


def encoder_layer(p: Params, x: jax.Array, n_heads: int, bias: jax.Array | None,
                  cond: jax.Array | None, *, dropout_rate: float = 0.0,
                  rng: jax.Array | None = None, return_kv: bool = False,
                  flash: dict | None = None, tp_axis: str | None = None,
                  sp_spec=None, ring: dict | None = None):
    """One pre-norm block (reference modules.py:240-280).

    ``tp_axis``: manual tensor parallelism inside a shard_map — ``p`` holds
    this shard's column/row-split attn/ffn weights, ``n_heads`` is the LOCAL
    head count, and the row-parallel projections psum over the axis (see
    ops.attention.mha / ops.nn.ffn).
    ``sp_spec``: Megatron sequence parallelism (GSPMD training path only) — a
    NamedSharding pinning the residual stream (b, s, d) sequence-sharded over
    the 'model' axis at each residual add, so XLA computes norm/dropout/
    residual on 1/mp of the sequence per chip and replaces the two row-
    parallel all-reduces with reduce-scatter + all-gather pairs."""
    rngs = jax.random.split(rng, 3) if rng is not None else (None, None, None)

    def sp(t):
        return jax.lax.with_sharding_constraint(t, sp_spec) \
            if sp_spec is not None else t

    x = sp(x)
    h = _norm(p['norm1'], x, cond)
    if return_kv:
        attn_out, k, v = mha(p['attn'], h, n_heads, bias, return_kv=True,
                             flash=flash, tp_axis=tp_axis)
    else:
        attn_out = mha(p['attn'], h, n_heads, bias, flash=flash,
                       tp_axis=tp_axis, ring=ring)
    x = sp(x + dropout(attn_out, dropout_rate, rngs[0]))
    h = ffn(p['ffn'], _norm(p['norm2'], x, cond), dropout_rate=dropout_rate,
            rng=rngs[1], tp_axis=tp_axis)
    x = sp(x + dropout(h, dropout_rate, rngs[2]))
    if return_kv:
        return x, k, v
    return x


def transformer(p: Params, x: jax.Array, n_heads: int, bias: jax.Array | None = None,
                cond: jax.Array | None = None, *, dropout_rate: float = 0.0,
                rng: jax.Array | None = None, remat: bool = False,
                flash: dict | None = None, unroll: int | bool = 1,
                tp_axis: str | None = None, sp_spec=None,
                pp: tuple | None = None, ring: dict | None = None) -> jax.Array:
    """Full-sequence forward over the scanned stack.

    ``unroll``: lax.scan unroll factor.  Inference paths pass True (full unroll) —
    loop-turn overhead (~120 us on v5e-via-axon) would otherwise dominate the small
    per-layer compute; training keeps the rolled scan for compile time + remat.
    ``tp_axis``: manual TP inside a shard_map (see encoder_layer) — ``n_heads``
    is then the LOCAL head count.
    ``sp_spec``: sequence-parallel residual sharding (see encoder_layer).
    ``pp``: pipeline parallelism — ``(axis_name, num_stages, microbatches)``
    or ``(axis_name, num_stages, microbatches, model_axis, mp)`` for PP x TP;
    the call must then run inside a shard_map over those axes with ``p``
    holding this stage's layer slice (parallel.pipeline.pipeline_transformer;
    ``n_heads`` stays the GLOBAL head count — the pipeline derives the local
    count from ``mp``)."""
    if pp is not None:
        from ..parallel.pipeline import pipeline_transformer
        pp_axis, n_stages, microbatches, *tp_part = pp
        return pipeline_transformer(
            p, x, n_heads, bias, cond, axis=pp_axis, num_stages=n_stages,
            microbatches=microbatches, dropout_rate=dropout_rate, rng=rng,
            remat=remat, tp=tuple(tp_part) if tp_part else None)
    num_layers = jax.tree.leaves(p)[0].shape[0]

    def body(carry, scan_in):
        layer_p, idx = scan_in
        layer_rng = jax.random.fold_in(rng, idx) if rng is not None else None
        y = encoder_layer(layer_p, carry, n_heads, bias, cond,
                          dropout_rate=dropout_rate, rng=layer_rng, flash=flash,
                          tp_axis=tp_axis, sp_spec=sp_spec, ring=ring)
        return y, None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, (p, jnp.arange(num_layers)), unroll=unroll)
    return x


def transformer_prefill(p: Params, x: jax.Array, n_heads: int, max_len: int,
                        bias: jax.Array | None = None,
                        cond: jax.Array | None = None,
                        cache_dtype=None, flash: dict | None = None,
                        tp_axis: str | None = None):
    """Forward pass that also fills a KV cache padded to ``max_len``.

    Returns (y, KVCache) where cache slots [0, seq_len) hold the prefix keys/values.
    Replaces the reference's first cached iteration (modules.py:340-351).
    ``cache_dtype``: None (activation dtype) | a float dtype | jnp.int8 (quantized).
    ``flash``: optional flash-attention meta (see ops.attention.mha) — avoids
    materializing the (b, 1, s, s) prefill bias.
    ``tp_axis``: manual TP inside a shard_map — ``n_heads`` is the LOCAL head
    count and the returned cache holds only this shard's heads.
    """
    seq_len = x.shape[1]
    pad = max_len - seq_len
    quant = cache_dtype is not None and jnp.dtype(cache_dtype) == jnp.int8

    def body(carry, layer_p):
        y, k, v = encoder_layer(layer_p, carry, n_heads, bias, cond, return_kv=True,
                                flash=flash, tp_axis=tp_axis)
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        if quant:
            kq, ks_ = quantize_kv(k)
            vq, vs_ = quantize_kv(v)
            return y, (kq, vq, ks_, vs_)
        if cache_dtype is not None:
            k, v = k.astype(cache_dtype), v.astype(cache_dtype)
        return y, (k, v)

    if quant:
        x, (ks, vs, kss, vss) = jax.lax.scan(body, x, p)
        return x, KVCache(ks, vs, kss, vss)
    x, (ks, vs) = jax.lax.scan(body, x, p)
    return x, KVCache(ks, vs)


def transformer_decode_step(p: Params, x: jax.Array, n_heads: int, cache: KVCache,
                            index: jax.Array, cond: jax.Array | None = None,
                            attend_mask: jax.Array | None = None,
                            attn_buckets: int = 1,
                            tp_axis: str | None = None):
    """Advance one token (or a q-token block): x is (b, q, d) at absolute
    positions ``index .. index + q - 1``.  The serving decode uses q = 1; the
    speculative verify pass (models/ar.py) feeds a q-token draft block through
    the SAME program shape — one pass scores every draft position while writing
    all q KV slots.

    Layers are **unrolled** (not scanned): a layer-scan forces XLA to slice and
    re-stack the whole (L, b, h, max, hd) cache every step — measured 2.3x slower on
    v5e than unrolled single-slot ``dynamic_update_slice`` writes, which XLA performs
    in place inside the enclosing while_loop.  Returns (y (b, q, d), new_cache).

    ``index`` may be a scalar (all rows at the same absolute position — the batched
    decode, where a shared prompt layout keeps positions in lockstep) or a (b,)
    vector of PER-ROW positions (continuous batching: sessions at different decode
    depths share one step program; models/continuous.py).  Per-row writes go
    through a vmapped single-row ``dynamic_update_slice`` (an XLA scatter over the
    batch axis — one (h, q, hd) slab per row per layer, negligible next to the
    cache-read bandwidth that dominates decode).

    ``attend_mask``: optional bool mask of cache slots the token(s) may attend —
    (b, max_len) shared across the block, or (b, q, max_len) per-query (the
    speculative block needs in-block causality: query i must not see slots
    index + i + 1 .. index + q - 1, whose K/V this same call wrote).  Defaults
    to slots [0, index + i] per query i.
    ``attn_buckets`` > 1: lax.switch over that many static cache prefixes, reading
    only ~the valid prefix each step — decode attention is cache-bandwidth-bound, so
    early steps touch a fraction of the bytes.  Outputs identical (slots past
    ``index`` are masked either way).
    ``tp_axis``: manual TP inside a shard_map — ``n_heads`` is the LOCAL head
    count, the cache holds only local heads, and out/lin2 partials psum.
    """
    num_layers = cache.k.shape[0]
    max_len = cache.k.shape[3]
    q_len = x.shape[1]
    quant = cache.k_scale is not None
    per_row = jnp.ndim(index) == 1
    ck, cv, cks, cvs = cache.k, cache.v, cache.k_scale, cache.v_scale
    if attend_mask is None:
        base = index[:, None, None] if per_row else index
        attend_mask = (jnp.arange(max_len)[None, None, :]
                       <= base + jnp.arange(q_len)[None, :, None])
        attend_mask = jnp.broadcast_to(attend_mask,
                                       (x.shape[0], q_len, max_len))
    if attend_mask.ndim == 3:
        bias = jnp.where(attend_mask, 0.0, NEG_INF)[:, None, :, :]
    else:
        bias = jnp.where(attend_mask, 0.0, NEG_INF)[:, None, None, :]

    if attn_buckets > 1:
        # Static prefix lengths (lane-aligned); smallest covering the deepest
        # written slot wins.  With per-row indices the deepest row picks the
        # bucket (conservative — shallower rows' extra slots are masked).
        idx_top = (jnp.max(index) if per_row else index) + (q_len - 1)
        lens = [min(-(-(max_len * (i + 1) // attn_buckets) // 128) * 128, max_len)
                for i in range(attn_buckets)]
        lens = sorted(set(lens))
        bucket_idx = sum((idx_top + 1 > jnp.int32(L)).astype(jnp.int32)
                         for L in lens[:-1])
    zero = jnp.int32(0)

    def _write(buf, new, li):
        """Write one (b, h, q, *) slab into layer ``li`` of a (L, b, h, S, *)
        buffer at ``index`` — scalar (one slice op) or per-row (vmapped)."""
        if per_row:
            def one_row(row_buf, row_new, i):
                # row_buf (L, h, S, w); row_new (h, q, w)
                return jax.lax.dynamic_update_slice(
                    row_buf, row_new[None], (jnp.int32(li), zero, i, zero))
            return jax.vmap(one_row, in_axes=(1, 0, 0), out_axes=1)(
                buf, new, index)
        return jax.lax.dynamic_update_slice(
            buf, new[None], (jnp.int32(li), zero, zero, index, zero))

    for li in range(num_layers):
        lp = jax.tree.map(lambda a: a[li], p)
        h = _norm(lp['norm1'], x, cond)
        q, k, v = qkv_proj(lp['attn'], h, n_heads)
        if quant:
            kq, ks_ = quantize_kv(k)
            vq, vs_ = quantize_kv(v)
            ck = _write(ck, kq, li)
            cv = _write(cv, vq, li)
            cks = _write(cks, ks_, li)
            cvs = _write(cvs, vs_, li)
        else:
            ck = _write(ck, k.astype(ck.dtype), li)
            cv = _write(cv, v.astype(cv.dtype), li)
        if attn_buckets > 1:
            # Dequant (int8 caches) happens INSIDE the bucketed branch so only
            # the selected prefix is read AND dequantized — int8 KV exists for
            # exactly the bandwidth-bound long caches where bucketing pays.
            def _bucket(L):
                def run(ck_l, cv_l, cks_l, cvs_l, qq, bb):
                    if quant:
                        kf = ck_l[:, :, :L].astype(x.dtype) \
                            * cks_l[:, :, :L].astype(x.dtype)
                        vf = cv_l[:, :, :L].astype(x.dtype) \
                            * cvs_l[:, :, :L].astype(x.dtype)
                    else:
                        kf, vf = ck_l[:, :, :L], cv_l[:, :, :L]
                    return sdpa(qq, kf, vf, bb[:, :, :, :L])
                return run
            attn = jax.lax.switch(
                bucket_idx, [_bucket(L) for L in lens],
                ck[li], cv[li],
                cks[li] if quant else ck[li],    # unused placeholders when
                cvs[li] if quant else cv[li],    # dense — branches ignore them
                q, bias)
        elif quant:
            k_full = ck[li].astype(x.dtype) * cks[li].astype(x.dtype)
            v_full = cv[li].astype(x.dtype) * cvs[li].astype(x.dtype)
            attn = sdpa(q, k_full, v_full, bias)
        else:
            attn = sdpa(q, ck[li], cv[li], bias)
        if tp_axis is not None:
            # Manual TP (shard_map): out/lin2 are row-split — psum the partial
            # before adding the replicated bias (nn.linear_row_parallel).
            x = x + linear_row_parallel(lp['attn']['out'], _merge_heads(attn),
                                        tp_axis)
            x = x + ffn(lp['ffn'], _norm(lp['norm2'], x, cond), tp_axis=tp_axis)
        else:
            x = x + linear(lp['attn']['out'], _merge_heads(attn))
            x = x + ffn(lp['ffn'], _norm(lp['norm2'], x, cond))
    new_cache = KVCache(ck, cv, cks, cvs) if quant else KVCache(ck, cv)
    return x, new_cache
