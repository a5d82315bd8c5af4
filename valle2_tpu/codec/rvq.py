"""Residual vector quantization (8 × 1024 × 128 Euclidean codebooks) in native JAX.

The encodec pip package's ``ResidualVectorQuantizer`` equivalent (SURVEY §2.2):
encode = iterative nearest-codebook argmin on the residual; decode = sum of codebook
rows.  Distance uses the expanded form ``argmin(-2 x·c + |c|²)`` (the |x|² term is
constant per frame), matching encodec's EuclideanCodebook.quantize — and putting the
dominant cost in one (B*T, D) @ (D, V) MXU matmul per stage instead of a (B*T, V, D)
broadcast.  Ties resolve to the first index, like torch.

A fused Pallas kernel for the argmin lives in valle2_tpu.kernels.rvq (flag-gated).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def rvq_init(key: jax.Array, num_quantizers: int = 8, codebook_size: int = 1024,
             dim: int = 128, dtype=jnp.float32) -> Params:
    """Random (uniform) codebooks; pretrained checkpoints overwrite these."""
    return {'codebooks': jax.random.uniform(
        key, (num_quantizers, codebook_size, dim), dtype, -1.0, 1.0)}


def nearest_code(codebook: jax.Array, x: jax.Array) -> jax.Array:
    """codebook (V, D), x (..., D) → int32 indices (...,) of the nearest row."""
    scores = (2.0 * jnp.matmul(x, codebook.T, precision='highest')
              - jnp.sum(codebook * codebook, axis=-1))
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def rvq_encode(p: Params, latents: jax.Array, n_q: int | None = None) -> jax.Array:
    """(B, T, D) latents → (B, n_q, T) codes (layout matches the reference wrapper,
    encodec_pip.py:23-39)."""
    codebooks = p['codebooks'] if n_q is None else p['codebooks'][:n_q]

    def body(residual, codebook):
        idx = nearest_code(codebook, residual)
        quantized = codebook[idx]
        return residual - quantized, idx

    _, codes = jax.lax.scan(body, latents, codebooks, unroll=True)  # (n_q, B, T)
    return codes.transpose(1, 0, 2)


def rvq_decode(p: Params, codes: jax.Array) -> jax.Array:
    """(B, n_q, T) codes → (B, T, D) latents (sum of codebook lookups)."""
    n_q = codes.shape[1]
    gathered = jax.vmap(lambda cb, ids: cb[ids], in_axes=(0, 1), out_axes=1)(
        p['codebooks'][:n_q], codes)                                # (B, n_q, T, D)
    return gathered.sum(axis=1)
