"""Multi-head attention: full-sequence (training/prefill) and KV-cached decode step.

TPU-native equivalent of the reference MultiHeadAttention
(``/root/reference/valle/models/modules.py:102-207``): fused QKV projection (no bias),
output projection (bias), scale 1/sqrt(head_dim), float32 softmax.

Differences by design (not translation):
- The reference grows its KV cache by ``torch.cat`` every step (modules.py:149-157) —
  a reallocation per token.  Here the cache is **preallocated at max length** and decode
  writes one slot with ``dynamic_update_slice``; validity is enforced by masking scores
  past the current position.  Static shapes → XLA compiles the decode step once.
- Masks arrive as additive float biases (see ``ops.masks``) so the same code path serves
  bool-mask training and maskless cached decode.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from .nn import linear, linear_init, linear_row_parallel
from .masks import NEG_INF

Params = dict[str, Any]


def mha_init(key: jax.Array, d_model: int, n_heads: int, dtype=jnp.float32) -> Params:
    del n_heads  # head count is a reshape, not a parameter
    k1, k2 = jax.random.split(key)
    return {'qkv': linear_init(k1, d_model, 3 * d_model, use_bias=False, dtype=dtype),
            'out': linear_init(k2, d_model, d_model, dtype=dtype)}


def _split_heads(x: jax.Array, n_heads: int) -> jax.Array:
    b, s, d = x.shape
    return x.reshape(b, s, n_heads, d // n_heads).transpose(0, 2, 1, 3)  # (b, h, s, hd)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, s, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * hd)


def qkv_proj(p: Params, x: jax.Array, n_heads: int):
    """Fused QKV → per-head (b, h, s, hd) triple."""
    qkv = linear(p['qkv'], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return (_split_heads(q, n_heads), _split_heads(k, n_heads), _split_heads(v, n_heads))


def sdpa(q: jax.Array, k: jax.Array, v: jax.Array,
         bias: jax.Array | None = None) -> jax.Array:
    """Scaled dot-product attention with float32 softmax.

    q: (b, h, sq, hd), k/v: (b, h, sk, hd), bias: broadcastable to (b, h, sq, sk).
    """
    hd = q.shape[-1]
    scale = 1.0 / math.sqrt(hd)
    scores = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum('bhqk,bhkd->bhqd', probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def flash_shard_mesh(mesh, batch: int, n_heads: int):
    """How the training-path flash kernel runs under a GSPMD mesh.

    A Mosaic kernel traced into a multi-device jit CANNOT be partitioned by
    GSPMD — jax raises 'Mosaic kernels cannot be automatically partitioned.
    Please wrap the call in a shard_map.' (jax/_src/tpu_custom_call.py) — so
    a train/eval step built over a mesh must either shard_map the kernel or
    not use it.  Returns ``(wrap_mesh, flash_ok)``:

    - ``(None, True)``   — no mesh (or one device): call the kernel directly.
    - ``(mesh, True)``   — embed ``mesh`` in the flash meta; ``mha`` wraps the
      kernel in a shard_map over ('data' on batch rows x 'model' on heads) —
      attention is independent across both, so per-shard results are exact.
    - ``(None, False)``  — batch rows / heads don't divide the mesh axes: the
      caller must build the bias and take the sdpa path (plain HLO ops that
      GSPMD partitions freely).
    """
    if mesh is None or mesh.size == 1:
        return None, True
    dp = mesh.shape.get('data', 1)
    mp = mesh.shape.get('model', 1)
    if batch % dp == 0 and n_heads % mp == 0:
        return mesh, True
    return None, False


def _flash_sharded(q, k, v, meta, tokens_total: int, causal: bool, mesh):
    """The flash kernel per-shard under ``shard_map``: batch rows over 'data',
    heads over 'model' (matching the Megatron activation layout, so GSPMD
    inserts no resharding collectives around the kernel)."""
    from jax.sharding import PartitionSpec as P

    from ..kernels.flash_attention import flash_attention
    bax = 'data' if mesh.shape.get('data', 1) > 1 else None
    hax = 'model' if mesh.shape.get('model', 1) > 1 else None
    spec = P(bax, hax)
    return jax.shard_map(
        lambda q_, k_, v_, m_: flash_attention(q_, k_, v_, m_, tokens_total,
                                               causal),
        mesh=mesh, in_specs=(spec, spec, spec, P(bax)), out_specs=spec,
        check_vma=False)(q, k, v, meta)


def mha(p: Params, x: jax.Array, n_heads: int, bias: jax.Array | None = None,
        return_kv: bool = False, flash: dict | None = None,
        tp_axis: str | None = None, ring: dict | None = None):
    """Full-sequence MHA.  Returns out, or (out, k, v) for cache prefill.

    ``flash``: optional {'meta': (b, 2) int32, 'tokens_total': int, 'causal': bool} —
    routes through the Pallas flash kernel instead of the materialized-bias sdpa.
    An optional ``'mesh'`` entry (see ``flash_shard_mesh``) shard_maps the
    kernel for multi-device train/eval steps, where GSPMD cannot partition a
    Mosaic custom call.
    ``tp_axis``: manual tensor parallelism inside a shard_map — ``n_heads`` is
    then this shard's LOCAL head count (qkv column-split along heads), and the
    row-split output projection psums the partial over ``tp_axis``
    (``nn.linear_row_parallel``); the qkv input gets the backward all-reduce
    (``nn.identity_psum_grad``) completing dx.  The returned k/v are the
    local heads'.
    ``ring``: context parallelism inside a shard_map — same meta keys as
    ``flash`` plus {'axis': mesh axis}; ``x`` is this device's SEQUENCE block
    and attention runs the exact ring schedule (parallel/ring.py).
    """
    if tp_axis is not None:
        from .nn import identity_psum_grad
        x = identity_psum_grad(x, tp_axis)
    q, k, v = qkv_proj(p, x, n_heads)
    if ring is not None:
        from ..parallel.ring import ring_attention
        attn = ring_attention(q, k, v, ring['meta'], ring['tokens_total'],
                              ring['axis'], ring.get('causal', True))
    elif flash is not None:
        wrap_mesh = flash.get('mesh')
        if wrap_mesh is not None:
            attn = _flash_sharded(q, k, v, flash['meta'], flash['tokens_total'],
                                  flash.get('causal', True), wrap_mesh)
        else:
            from ..kernels.flash_attention import flash_attention
            attn = flash_attention(q, k, v, flash['meta'], flash['tokens_total'],
                                   flash.get('causal', True))
    else:
        attn = sdpa(q, k, v, bias)
    if tp_axis is not None:
        out = linear_row_parallel(p['out'], _merge_heads(attn), tp_axis)
    else:
        out = linear(p['out'], _merge_heads(attn))
    if return_kv:
        return out, k, v
    return out


def mha_decode_step(p: Params, x: jax.Array, n_heads: int,
                    cache_k: jax.Array, cache_v: jax.Array, index: jax.Array):
    """Single-token cached attention.

    x: (b, 1, d) query token at absolute position ``index``.
    cache_k/cache_v: (b, h, max_len, hd) preallocated; slot ``index`` is written here.
    Returns (out (b, 1, d), cache_k, cache_v).
    """
    q, k, v = qkv_proj(p, x, n_heads)                    # k, v: (b, h, 1, hd)
    cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, k, index, axis=2)
    cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, v, index, axis=2)
    max_len = cache_k.shape[2]
    # Attend over cache slots [0, index]; later slots are masked out.
    valid = jnp.arange(max_len) <= index                 # (max_len,)
    bias = jnp.where(valid, 0.0, NEG_INF)[None, None, None, :]
    attn = sdpa(q, cache_k, cache_v, bias)
    out = linear(p['out'], _merge_heads(attn))
    return out, cache_k, cache_v
