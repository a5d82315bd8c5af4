"""Core NN primitives as pure functions over pytree parameters.

TPU-native equivalents of the reference's torch modules
(``/root/reference/valle/models/modules.py:11-221``): token embeddings, sinusoidal
positional encoding, LayerNorm / AdaptiveLayerNorm, and the GELU FFN.  Everything is a
plain ``dict`` pytree + a pure ``apply`` function so models can be stacked with
``jax.tree.map`` and scanned with ``lax.scan`` — the idiomatic XLA formulation (one
compiled layer body, L iterations) instead of torch's ModuleList of distinct kernels.

Initializers replicate torch defaults (kaiming-uniform linear, N(0,1) embedding) so
training dynamics match the reference.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers (torch-default-compatible)
# ---------------------------------------------------------------------------

def linear_init(key: jax.Array, in_dim: int, out_dim: int, use_bias: bool = True,
                dtype=jnp.float32) -> Params:
    """torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(in), 1/sqrt(in))
    for the weight, U(-1/sqrt(in), 1/sqrt(in)) for the bias.

    Weight stored as (in_dim, out_dim) — the XLA-friendly layout (x @ w, no transpose).
    """
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p: Params = {'w': jax.random.uniform(wkey, (in_dim, out_dim), dtype, -bound, bound)}
    if use_bias:
        p['b'] = jax.random.uniform(bkey, (out_dim,), dtype, -bound, bound)
    return p


def linear(p: Params, x: jax.Array) -> jax.Array:
    if 'q' in p:
        # int8 weight-quantized layout from quantize.quantize_linear — decode/
        # serving path (ConfigValle.weight_dtype='int8'); see quantize.py.
        from ..quantize import int8_matmul
        y = int8_matmul(x, p['q'], p['scale'])
    elif 'q4' in p:
        # int4 W4A16 layout from quantize.quantize_linear_int4
        # (ConfigValle.weight_dtype='int4').
        from ..quantize import int4_matmul
        y = int4_matmul(x, p['q4'], p['scale4'])
    else:
        y = x @ p['w']
    if 'b' in p:
        y = y + p['b']
    return y


def cast_to_compute(params: Params, config) -> Params:
    """Differentiable mixed-precision cast: every leaf stored in the master
    ``param_dtype`` casts to the compute ``dtype`` (bf16 training); other
    leaves (int8/int4 quantized, scalars) pass through.  Grads flow back in
    the master dtype via the cast's transpose.  The ONE shared definition —
    the solo losses, the pipeline schedules, and the context-parallel steps
    must all cast identically or the manual paths silently diverge."""
    cdtype = jnp.dtype(config.dtype)
    pdtype = jnp.dtype(config.param_dtype)
    if cdtype == pdtype:
        return params
    return jax.tree.map(
        lambda a: a.astype(cdtype) if a.dtype == pdtype else a, params)


def psum_replicated_grad(x: jax.Array, axis: str) -> jax.Array:
    """``jax.lax.psum`` whose TRANSPOSE is the identity.

    Inside a ``shard_map`` without replication tracking (``check_vma=False``,
    this codebase's convention), autodiff transposes psum to psum — so a
    row-parallel projection's cotangent (replicated: everything downstream of
    the reduction is computed identically on every rank) would get re-reduced
    and scale every upstream gradient by the axis size.  The mathematically
    correct transpose for a REPLICATED cotangent is the identity (same
    reasoning as pipeline_transformer's masked output broadcast).  ONLY valid
    when the consumer side is replicated over ``axis`` — e.g. the manual-TP
    training path, where residuals/norms/loss are computed in lockstep."""
    import functools

    @functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
    def _psum(v, ax):
        return jax.lax.psum(v, ax)

    def _fwd(v, ax):
        return jax.lax.psum(v, ax), None

    def _bwd(ax, _res, ct):
        return (ct,)

    _psum.defvjp(_fwd, _bwd)
    return _psum(x, axis)


def identity_psum_grad(x: jax.Array, axis: str) -> jax.Array:
    """Megatron's *g* operator: identity forward, all-reduce backward.

    Place at the INPUT of a column-parallel region (qkv, lin1): the forward
    needs nothing (x is replicated), but each rank's input cotangent carries
    only its local output columns' contribution — disjoint partial sums that
    must be psummed before the (replicated) upstream ops differentiate.  The
    dual of ``psum_replicated_grad``; training-path manual TP only."""
    import functools

    @functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
    def _ident(v, ax):
        return v

    def _fwd(v, ax):
        return v, None

    def _bwd(ax, _res, ct):
        return (jax.lax.psum(ct, ax),)

    _ident.defvjp(_fwd, _bwd)
    return _ident(x, axis)


def linear_row_parallel(p: Params, x: jax.Array, tp_axis: str) -> jax.Array:
    """Row-parallel linear under MANUAL tensor parallelism (inside a
    jax.shard_map): this shard's weight holds a contiguous slice of the INPUT
    features (Megatron row split), so ``x @ w`` is a partial sum — ``psum``
    over ``tp_axis`` completes it before the (replicated) bias is added once.
    The reduction differentiates as ``psum_replicated_grad`` (identity
    transpose), making this layer trainable inside the PP x TP shard_map.

    int8 leaves stay EXACTLY solo-equal: the dynamic activation scale must be
    the max over the FULL feature axis (``quantize.int8_matmul``), so the
    local amax is ``pmax``-ed over ``tp_axis`` before rounding, the s8×s8→s32
    partials ``psum`` in integers (associative — bit-exact vs the solo dot),
    and the (replicated) per-output-channel scale rescales once at the end."""
    if 'q' in p:
        x32 = x.astype(jnp.float32)
        ax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
        ax = jax.lax.pmax(ax, tp_axis)                     # global per-token amax
        sx = jnp.maximum(ax, 1e-8) / 127.0
        xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(xq, p['q'], (((x.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = jax.lax.psum(y, tp_axis)
        y = (y.astype(jnp.float32) * sx * p['scale']).astype(x.dtype)
    elif 'q4' in p:
        # int4 W4A16 (quantize.quantize_linear_int4_ranked): this rank's slice
        # is a self-contained packed layout over its LOCAL input features, and
        # activations stay fp — so the local dot dequants in place and the
        # partial sums complete with a plain fp psum (no global scale needed,
        # unlike the int8 W8A8 branch above).
        from ..quantize import int4_matmul
        y = jax.lax.psum(int4_matmul(x, p['q4'], p['scale4']), tp_axis)
    else:
        y = psum_replicated_grad(x @ p['w'], tp_axis)
    if 'b' in p:
        y = y + p['b']
    return y


def embedding_init(key: jax.Array, vocab_size: int, dim: int, dtype=jnp.float32) -> Params:
    """torch nn.Embedding default init: N(0, 1)."""
    return {'emb': jax.random.normal(key, (vocab_size, dim), dtype)}


def embedding(p: Params, ids: jax.Array) -> jax.Array:
    """Token embedding lookup (reference TokenEmbedding, modules.py:11-37; its dropout
    defaults to p=0.0 and is never configured, so it is omitted here)."""
    return jnp.take(p['emb'], ids, axis=0)


def layernorm_init(dim: int, dtype=jnp.float32) -> Params:
    return {'scale': jnp.ones((dim,), dtype), 'bias': jnp.zeros((dim,), dtype)}


def _layernorm_fwd_math(p: Params, x: jax.Array, eps: float):
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p['scale'] + p['bias']).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _layernorm_vjp(p: Params, x: jax.Array, eps: float):
    return _layernorm_fwd_math(p, x, eps)


def _layernorm_vjp_fwd(p, x, eps):
    # Save only the compute-dtype input (bf16 under mixed precision) and the
    # params; stats are recomputed in the backward.  Without this, jax's
    # autodiff of the f32-stats formula saves an f32 (b, s, d) intermediate per
    # LN — at 204M that is 2 x 40 MB of f32 residual traffic per layer per step
    # (measured in the r2 XLA memory dump) and was the marginal OOM at
    # train_scan_unroll=4.
    return _layernorm_fwd_math(p, x, eps), (p, x)


def _layernorm_vjp_bwd(eps, res, g):
    p, x = res
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = (x32 - mean) * rstd                                  # normalized
    dscale = jnp.sum(g32 * y, axis=tuple(range(x.ndim - 1)))
    dbias = jnp.sum(g32, axis=tuple(range(x.ndim - 1)))
    gy = g32 * p['scale'].astype(jnp.float32)
    # dx = rstd * (gy - mean(gy) - y * mean(gy * y))
    dx = rstd * (gy - jnp.mean(gy, axis=-1, keepdims=True)
                 - y * jnp.mean(gy * y, axis=-1, keepdims=True))
    dp = {'scale': dscale.astype(p['scale'].dtype),
          'bias': dbias.astype(p['bias'].dtype)}
    return dp, dx.astype(x.dtype)


_layernorm_vjp.defvjp(_layernorm_vjp_fwd, _layernorm_vjp_bwd)


def layernorm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm matching torch nn.LayerNorm (eps=1e-5, biased variance).

    Statistics in float32 regardless of activation dtype (TPU numerics
    hygiene); the custom VJP saves only the compute-dtype input and recomputes
    the stats in the backward (see _layernorm_vjp_fwd)."""
    return _layernorm_vjp(p, x, eps)


def adaln_init(key: jax.Array, dim: int, dtype=jnp.float32) -> Params:
    """AdaptiveLayerNorm (reference modules.py:83-99): a LayerNorm whose scale/bias come
    from a Linear(d, 2d) applied to a conditioning embedding."""
    return {'proj': linear_init(key, dim, 2 * dim, dtype=dtype), 'ln': layernorm_init(dim, dtype)}


def adaln(p: Params, x: jax.Array, cond: jax.Array, eps: float = 1e-5) -> jax.Array:
    """``weight * LN(x) + bias`` with (weight, bias) = split(proj(cond)).

    ``cond`` has shape (1, d) (a stage-embedding row) or (b, d); broadcasts over the
    sequence axis.  The inner LN carries its own learned affine exactly like the
    reference (``self.norm = nn.LayerNorm(d_model)``).

    There is deliberately no hand-fused kernel here: a Pallas fused-AdaLN
    variant was A/B'd inside the real NAR train step on v5e (r4, interleaved
    same-process arms) and measured 1.03x at the default scale / 0.99x at
    204M — within run-to-run drift; XLA already fuses this chain.  The
    kernel was removed rather than shipped dormant (BENCHMARKS.md r4).
    """
    wb = linear(p['proj'], cond)
    weight, bias = jnp.split(wb, 2, axis=-1)
    y = layernorm(p['ln'], x, eps)
    if cond.ndim == 2 and x.ndim == 3:
        weight = weight[:, None, :]
        bias = bias[:, None, :]
    return weight * y + bias


def ffn_init(key: jax.Array, d_model: int, d_ff: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {'lin1': linear_init(k1, d_model, d_ff, dtype=dtype),
            'lin2': linear_init(k2, d_ff, d_model, dtype=dtype)}


def ffn(p: Params, x: jax.Array, *, dropout_rate: float = 0.0,
        rng: jax.Array | None = None, tp_axis: str | None = None) -> jax.Array:
    """Linear → exact (erf) GELU → dropout → Linear (reference FeedForward,
    modules.py:210-221; torch nn.GELU defaults to the erf form, hence
    ``approximate=False``).

    ``tp_axis``: manual tensor parallelism inside a shard_map — lin1 is
    column-split (local hidden slice, local bias), lin2 row-split with a psum
    completing the output (``linear_row_parallel``); lin1's input gets the
    backward all-reduce (``identity_psum_grad``) that completes dx.  The
    HIDDEN dropout folds the TP rank into its rng: the mask covers this
    rank's dff/mp slice, so a shared rng would correlate hidden units
    dff/mp apart (Megatron keeps a per-TP-rank rng for exactly this
    region).  Only this inner mask may differ per rank — every full-width
    dropout must stay identical or the replicated residual stream
    diverges."""
    if tp_axis is not None:
        x = identity_psum_grad(x, tp_axis)
        if rng is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(tp_axis))
    h = jax.nn.gelu(linear(p['lin1'], x), approximate=False)
    h = dropout(h, dropout_rate, rng)
    if tp_axis is not None:
        return linear_row_parallel(p['lin2'], h, tp_axis)
    return linear(p['lin2'], h)


def dropout(x: jax.Array, rate: float, rng: jax.Array | None) -> jax.Array:
    """Inverted dropout; identity when rng is None (deterministic/eval mode)."""
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# Sinusoidal positional encoding (reference modules.py:40-80)
# ---------------------------------------------------------------------------

def sinusoidal_table(max_len: int, d_model: int, dtype=jnp.float32) -> jax.Array:
    """Fixed table: pe[pos, 2i] = sin(pos * exp(-2i ln(1e4)/d)), pe[pos, 2i+1] = cos(...)."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                       * (-math.log(10000.0) / d_model))
    angles = position * div_term
    pe = jnp.zeros((max_len, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles))
    return pe.astype(dtype)


def add_positional(pe: jax.Array, x: jax.Array, offset: int | jax.Array = 0,
                   *, dropout_rate: float = 0.0, rng: jax.Array | None = None) -> jax.Array:
    """x[..., t, :] += pe[offset + t].  ``offset`` supports KV-cached decode where the
    current token sits at an absolute stream position."""
    seq_len = x.shape[-2]
    if isinstance(offset, int) and offset == 0:
        p = pe[:seq_len]
    else:
        p = jax.lax.dynamic_slice_in_dim(pe, offset, seq_len, axis=0)
    return dropout(x + p.astype(x.dtype), dropout_rate, rng)
